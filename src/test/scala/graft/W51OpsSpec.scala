package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries, TimeseriesQueries, WindowQueries}
import graft.text.TextQueries

/** Wave-51 operators: grid-density clustering (q251), sequential
  * trigram rules (q252), CUSUM drift detection (q253), Benford audit
  * (q254), Good–Turing smoothing (q255), Shapley attribution (q256).
  * Each test recomputes from an INDEPENDENT formulation: union-find
  * vs the label-propagation rounds, the true max(0,·) recursion vs
  * the prefix-min window identity, the 4!-permutation Shapley
  * definition vs the closed-form weights, string-keyed grams vs the
  * 64-bit hash pairs.
  */
class W51OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q251: clusters equal a union-find ground truth (12 rounds converged)") {
    val rows = MlEvalQueries.q251GridDbscan(spark, sfDir).collect()
    val pts = Tables.orders(spark, sfDir)
      .select(expr(s"CAST(o_totalprice AS BIGINT) div ${MlEvalQueries.DbscanPriceCell}").as("x"),
        expr(s"(unix_micros(CAST(o_orderdate AS timestamp)) div 86400000000) div ${MlEvalQueries.DbscanDayCell}").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cells = pts.groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    // interpolated 75th percentile of cell counts
    val sorted = cells.values.map(_.toDouble).toIndexedSeq.sorted
    val pos = 0.75 * (sorted.length - 1)
    val thr = sorted(pos.toInt) +
      (pos - pos.toInt) * (sorted(math.ceil(pos).toInt) - sorted(pos.toInt))
    val dense = cells.filter(_._2.toDouble > thr).keySet
    assert(dense.nonEmpty && dense.size < cells.size, "quantile splits the cells")
    // union-find over 8-neighbor adjacency
    val parent = scala.collection.mutable.Map(dense.toSeq.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for (c <- dense; dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0) {
      val n = (c._1 + dx, c._2 + dy)
      if (dense(n)) {
        val (ra, rb) = (find(c), find(n))
        if (ra != rb) parent(ra) = rb
      }
    }
    val comps = dense.groupBy(find)
    val want = comps.map { case (_, cs0) =>
      val cs = cs0.toSeq
      val lbl = cs.map(c => c._1 * 1000000L + c._2).min
      lbl -> (cs.size.toLong, cs.map(cells).sum,
        cs.map(_._1).min, cs.map(_._1).max, cs.map(_._2).min, cs.map(_._2).max)
    }
    assert(rows.length === comps.size, "cluster count")
    rows.foreach { r =>
      val (nc, np, x0, x1, y0, y1) = want(r.getLong(0))
      assert(r.getLong(1) === nc && r.getLong(2) === np, s"cluster ${r.getLong(0)}")
      assert(r.getLong(3) === x0 && r.getLong(4) === x1 &&
        r.getLong(5) === y0 && r.getLong(6) === y1, "bounding box")
    }
    assert(rows.length > 1, "subcritical density must yield multiple clusters")
  }

  test("q252: trigram supports and confidences match a driver walk") {
    val rows = WindowQueries.q252SeqMining(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.sortBy(x => (x._4, x._2)).map(_._3).toSeq }
    val triOcc = scala.collection.mutable.Map.empty[(String, String, String), Long]
    val triUsers = scala.collection.mutable.Map.empty[(String, String, String), Set[Long]]
    val biUsers = scala.collection.mutable.Map.empty[(String, String), Set[Long]]
    byUser.foreach { case (u, seq) =>
      seq.sliding(3).foreach {
        case Seq(a, b, c) =>
          triOcc((a, b, c)) = triOcc.getOrElse((a, b, c), 0L) + 1
          triUsers((a, b, c)) = triUsers.getOrElse((a, b, c), Set.empty) + u
        case _ => ()
      }
      seq.sliding(2).foreach {
        case Seq(a, b) => biUsers((a, b)) = biUsers.getOrElse((a, b), Set.empty) + u
        case _ => ()
      }
    }
    val ranked = triUsers.toSeq
      .map { case (t, us) => (t, us.size.toLong) }
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }
      .take(WindowQueries.SeqMiningTopK)
    assert(rows.length === math.min(WindowQueries.SeqMiningTopK, triUsers.size))
    rows.zip(ranked).foreach { case (r, ((a, b, c), s)) =>
      assert((r.getString(0), r.getString(1), r.getString(2)) === ((a, b, c)))
      assert(r.getLong(3) === triOcc((a, b, c)), "n_occ")
      assert(r.getLong(4) === s, "support")
      val bi = biUsers((a, b)).size.toLong
      assert(r.getLong(5) === bi, "bi_support")
      assert(math.abs(r.getDouble(6) - s.toDouble / bi) < 1e-6, "confidence")
    }
  }

  test("q253: the window identity reproduces the true max(0,.) CUSUM recursion") {
    val rows = TimeseriesQueries.q253Cusum(spark, sfDir).collect()
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("h"),
        round(col("value"), 6).as("v"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .groupBy(_._1)
      .map { case ((t, h), xs) => (t, h, r6(xs.map(_._2).sum / xs.length)) }
      .toSeq
    val byType = hourly.groupBy(_._1)
    rows.foreach { r =>
      val series = byType(r.getString(0)).map(x => (x._2, x._3)).sortBy(_._1)
      val n = series.length
      assert(r.getLong(1) === n.toLong)
      val ms = series.map(_._2)
      val mu = r6(ms.sum / n)
      val sd = math.sqrt((n * ms.map(m => m * m).sum - ms.sum * ms.sum) /
        (n.toDouble * n))
      val k = r6(TimeseriesQueries.CusumSlackSigma * sd)
      val hthr = r6(TimeseriesQueries.CusumThreshSigma * sd)
      assert(math.abs(r.getDouble(5) - hthr) < 1e-4, "threshold")
      // the REAL sequential recursion — independent of the window identity
      var s = 0.0
      var alarms = 0L
      var maxS = 0.0
      var first = -1L
      series.foreach { case (h, m) =>
        s = math.max(0.0, s + r6(m - mu - k))
        maxS = math.max(maxS, s)
        if (s > hthr) { alarms += 1; if (first < 0) first = h }
      }
      assert(r.getLong(2) === alarms, s"alarms for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - maxS) < 1e-4, "max_s")
      assert(r.getLong(4) === first, "first alarm hour")
    }
    assert(rows.exists(_.getLong(2) > 0), "the fixture must trip at least one alarm")
  }

  test("q254: digit census and chi-square match; probabilities are a distribution") {
    val rows = RelationalQueries.q254Benford(spark, sfDir).collect()
    assert(math.abs(RelationalQueries.BenfordP.map(_._2).sum - 1.0) < 1e-4)
    val micros = Tables.events(spark, sfDir)
      .filter(col("value") > 0).select(col("value")).collect()
      .map(r => math.round(r.getDouble(0) * 1000000.0))
      .filter(_ > 0)
    val digitOf = micros.map(_.toString.charAt(0).asDigit.toLong)
    val obs = digitOf.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val n = digitOf.length.toLong
    val chi = RelationalQueries.BenfordP.map { case (d, p) =>
      val e = r6(n * p)
      val o = obs.getOrElse(d.toLong, 0L)
      r6((o - e) * (o - e) / e)
    }.sum
    assert(rows.length === 9)
    rows.foreach { r =>
      assert(r.getLong(1) === obs.getOrElse(r.getLong(0), 0L), s"digit ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - chi) < 1e-3, "chi2")
      assert(r.getBoolean(5) === (chi > RelationalQueries.BenfordChi2Crit))
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-3, "shares sum to 1")
  }

  test("q255: hash-pair grouping is collision-free vs string-keyed gram counts") {
    val rows = TextQueries.q255GoodTuring(spark, sfDir).collect()
    val grams = Tables.documents(spark, sfDir).select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1).sliding(4).filter(_.length == 4)
        .map(_.mkString(" ")))
    val cnt = grams.groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val fof = cnt.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val nGrams = grams.length.toLong
    val vocab = cnt.size.toLong
    val s1 = fof.getOrElse(1L, 0L)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rr = r.getLong(0)
      assert(r.getLong(1) === fof(rr), s"S($rr)")
      val rs = (rr + 1) * fof.getOrElse(rr + 1, 0L).toDouble / fof(rr)
      assert(math.abs(r.getDouble(2) - rs) < 1e-5, s"r*($rr)")
      assert(r.getLong(3) === nGrams && r.getLong(4) === vocab)
      assert(math.abs(r.getDouble(5) - s1.toDouble / nGrams) < 1e-5, "p_unseen")
    }
    // Good–Turing's home regime: most 4-grams are singletons
    assert(s1.toDouble / vocab > 0.5, "sparse-gram regime")
  }

  test("q256: closed-form weights equal the 4!-permutation Shapley definition") {
    val rows = MlEvalQueries.q256Shapley(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val bits = MlEvalQueries.ShapleyChannels.toMap
    val perUser = byUser.values.toSeq.map { xs =>
      val fp = xs.filter(_._2 == "purchase").map(_._3).sorted.headOption
      val mask = xs.filter(e => e._2 != "purchase" &&
        fp.forall(e._3 < _)).map(e => bits(e._2)).distinct.sum
      (mask, if (fp.isDefined) 1L else 0L)
    }
    val convByMask = perUser.groupBy(_._1)
      .map { case (m, xs) => m -> xs.map(_._2).sum }
    def v(s: Int): Long =
      convByMask.filter { case (m, _) => (m & ~s & 15) == 0 }.values.sum
    // Shapley BY DEFINITION: average marginal over all 4! orderings
    val chans = MlEvalQueries.ShapleyChannels
    val phi24 = scala.collection.mutable.Map(chans.map(_._1 -> 0L): _*)
    chans.permutations.foreach { perm =>
      var s = 0
      perm.foreach { case (c, b) =>
        phi24(c) += v(s | b) - v(s)
        s |= b
      }
    }
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getLong(1) === phi24(r.getString(0)), s"phi24 of ${r.getString(0)}")
      assert(r.getLong(4) === v(15) && r.getLong(5) === v(0), "v endpoints")
    }
    // efficiency: credits exactly exhaust v(C) - v(empty)
    assert(rows.map(_.getLong(1)).sum === 24L * (v(15) - v(0)))
  }
}
