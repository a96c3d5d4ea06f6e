package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, WindowQueries}
import graft.text.TextQueries

/** Wave-52 operators: two-sample KS test (q257), Benjamini–Hochberg
  * FDR (q258), Markov entropy rate (q259), reciprocal-rank fusion
  * (q260) — each cross-checked by an independent driver recompute.
  */
class W52OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** A&S 7.1.26 erf (the shared convention, pinned to the reference
    * gold numbers by LinkRankSpec). */
  private def erf(z: Double): Double = {
    val a = math.abs(z)
    val t = 1.0 / (1.0 + 0.3275911 * a)
    val poly = ((((1.061405429 * t - 1.453152027) * t
      + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
    val e = 1.0 - poly * math.exp(-(a * a))
    if (z < 0) -e else e
  }

  test("q257: D, its location and the significance call match a direct CDF walk") {
    val row = MlEvalQueries.q257KsTest(spark, sfDir).collect().head
    val pool = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), round(col("value"), 6).as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val xs1 = pool.filter(_._1 == "purchase").map(_._2).sorted
    val xs2 = pool.filter(_._1 == "click").map(_._2).sorted
    val (n1, n2) = (xs1.length.toLong, xs2.length.toLong)
    assert(row.getLong(0) === n1 && row.getLong(1) === n2)
    val support = (xs1 ++ xs2).distinct.sorted
    var best = 0L
    var bestV = Double.NaN
    support.foreach { v =>
      val c1 = xs1.count(_ <= v).toLong
      val c2 = xs2.count(_ <= v).toLong
      val dn = math.abs(c1 * n2 - c2 * n1)
      if (dn > best) { best = dn; bestV = v }
    }
    val d = best.toDouble / (n1 * n2)
    assert(math.abs(row.getDouble(2) - d) < 1e-6, "D")
    assert(math.abs(row.getDouble(3) - bestV) < 1e-9, "D location (min arg)")
    val scale = math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))
    assert(math.abs(row.getDouble(4) - d / scale) < 1e-5, "scaled KS stat")
    assert(row.getBoolean(5) === (d > MlEvalQueries.KsCrit * scale))
  }

  test("q258: the BH ladder is coherent and matches recomputed p-values") {
    val rows = MlEvalQueries.q258BhFdr(spark, sfDir).collect()
    assert(rows.length === MlEvalQueries.BhM)
    val ev = Tables.events(spark, sfDir)
      .select(expr("(ts div 3600000000000) % 24").as("hod"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byH = ev.groupBy(_._1).map { case (h, xs) =>
      h -> (xs.length.toLong, xs.map(_._2).sum) }
    val (nTot, kTot) = (ev.length.toLong, ev.map(_._2).sum)
    val p0 = kTot.toDouble / nTot
    val pv = byH.map { case (h, (nh, kh)) =>
      val z = (kh.toDouble / nh - p0) / math.sqrt(p0 * (1 - p0) / nh)
      h -> r6(2.0 * (1.0 - 0.5 * (1.0 + erf(math.abs(z) / math.sqrt(2.0)))))
    }
    // recomputed p per cell
    rows.foreach { r =>
      val (nh, kh) = byH(r.getLong(0))
      assert(r.getLong(1) === nh && r.getLong(2) === kh)
      assert(math.abs(r.getDouble(5) - pv(r.getLong(0))) < 1e-5, s"p of hod ${r.getLong(0)}")
      assert(math.abs(r.getDouble(7) - r.getInt(6) * MlEvalQueries.BhAlpha /
        MlEvalQueries.BhM) < 1e-6, "bh threshold")
    }
    // the rank column is a permutation ordered by (p, hod)
    val byRank = rows.sortBy(_.getInt(6))
    assert(byRank.map(_.getInt(6)).toSeq === (1 to MlEvalQueries.BhM))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(5) < b.getDouble(5) ||
          (a.getDouble(5) == b.getDouble(5) && a.getLong(0) < b.getLong(0)))
      case _ => ()
    }
    // BH cutoff recomputed from the ladder
    val kstar = byRank.filter(r => r.getDouble(5) <=
      r.getInt(6) * MlEvalQueries.BhAlpha / MlEvalQueries.BhM)
      .map(_.getInt(6)).sorted.lastOption.getOrElse(0)
    rows.foreach(r => assert(r.getBoolean(8) === (r.getInt(6) <= kstar)))
    // uniform-fixture null: the corrected test must NOT fire
    assert(kstar === 0, "BH must decline to fire on the uniform fixture")
  }

  test("q259: stationary distribution and entropy rate match a dense recompute") {
    val rows = WindowQueries.q259EntropyRate(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).values.foreach { xs =>
      val seq = xs.sortBy(x => (x._2, x._4))
      var prevTs = Long.MinValue
      var sess = scala.collection.mutable.ArrayBuffer.empty[String]
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      seq.foreach { x =>
        if (prevTs == Long.MinValue || x._2 - prevTs > 30L * 60 * 1000000) {
          if (sess.nonEmpty) sessions += sess.toSeq
          sess = scala.collection.mutable.ArrayBuffer.empty[String]
        }
        sess += x._3
        prevTs = x._2
      }
      if (sess.nonEmpty) sessions += sess.toSeq
      sessions.foreach(_.sliding(2).foreach {
        case Seq(a, b) => trans((a, b)) = trans.getOrElse((a, b), 0L) + 1
        case _ => ()
      })
    }
    val rowTot = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val pr = trans.map { case ((f, t), n) => (f, t) -> n.toDouble / rowTot(f) }
    val states = rowTot.keys.toSeq.sorted
    var pi = states.map(_ -> 0.2).toMap
    for (_ <- 1 to WindowQueries.EntropyRatePiRounds) {
      pi = pr.groupBy(_._1._2).map { case (t, m) =>
        t -> m.map { case ((f, _), p) => pi.getOrElse(f, 0.0) * p }.sum }
    }
    val hRow = pr.groupBy(_._1._1).map { case (f, m) =>
      f -> -m.values.map(p => p * math.log(p)).sum }
    val hRate = states.map(s => pi(s) * hRow(s)).sum
    assert(rows.length === states.length)
    rows.foreach { r =>
      val s = r.getString(0)
      assert(math.abs(r.getDouble(1) - pi(s)) < 1e-5, s"pi($s)")
      assert(math.abs(r.getDouble(2) - hRow(s)) < 1e-5, s"h_row($s)")
      assert(math.abs(r.getDouble(3) - hRate) < 1e-4, "entropy rate")
      assert(math.abs(r.getDouble(4) - math.exp(r.getDouble(3))) < 1e-4)
    }
    // a 5-state chain's entropy rate is bounded by ln 5
    assert(rows.head.getDouble(3) > 0 && rows.head.getDouble(3) <= math.log(5.0) + 1e-9)
    assert(math.abs(rows.map(_.getDouble(1)).sum - 1.0) < 0.01, "pi sums to ~1")
  }

  test("q260: fused ranking matches a driver BM25 + fusion recompute") {
    val rows = TextQueries.q260RrfFusion(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).split(" ", -1)))
    val nd = docs.length.toLong
    val avgdl = docs.map(_._3.length.toLong).sum.toDouble / nd
    val q = TextQueries.RrfQueryTerms.toSet
    val tf = docs.map { case (id, _, ws) =>
      id -> ws.filter(q).groupBy(identity).map { case (t, xs) => t -> xs.length } }
      .filter(_._2.nonEmpty).toMap
    val df = q.map(t => t -> tf.values.count(_.contains(t))).toMap
    val k1 = TextQueries.RrfBm25K1
    val b = TextQueries.RrfBm25B
    val bm = tf.map { case (id, tfs) =>
      val dlen = docs.find(_._1 == id).get._3.length.toDouble
      id -> r6(tfs.map { case (t, f) =>
        math.log((nd - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * f * (k1 + 1.0) /
          (f + k1 * (1.0 - b + b * dlen / avgdl))
      }.sum)
    }
    val ra = bm.toSeq.sortBy { case (id, s) => (-s, id) }
      .take(TextQueries.RrfCandidates).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val rb = docs.sortBy(d => (-d._2, d._1))
      .take(TextQueries.RrfCandidates).zipWithIndex
      .map { case (d, i) => d._1 -> (i + 1) }.toMap
    val fused = (ra.keySet ++ rb.keySet).toSeq.map { id =>
      val s = r6(ra.get(id).map(r => 1.0 / (TextQueries.RrfK + r)).getOrElse(0.0)
        + rb.get(id).map(r => 1.0 / (TextQueries.RrfK + r)).getOrElse(0.0))
      (id, ra.getOrElse(id, -1), rb.getOrElse(id, -1), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(TextQueries.RrfTopK)
    assert(rows.length === fused.length)
    rows.zip(fused).foreach { case (r, (id, wa, wb, s)) =>
      assert(r.getLong(0) === id, "fused order")
      assert(r.getInt(1) === wa && r.getInt(2) === wb, s"ranks of doc $id")
      assert(math.abs(r.getDouble(3) - s) < 1e-6, s"rrf of doc $id")
    }
    // fusion must actually mix the two systems
    assert(rows.exists(_.getInt(1) > 0) && rows.exists(_.getInt(2) > 0))
  }
}
