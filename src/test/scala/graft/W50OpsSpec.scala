package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, TimeseriesQueries}
import graft.text.TextQueries

/** Wave-50 operators: Kruskal–Wallis k-group rank test (q246), Heaps'
  * law vocabulary-growth fit (q247), Mann–Kendall trend + Sen's slope
  * (q248), TextRank keyword extraction (q249), Poisson-bootstrap CI
  * (q250) — each cross-checked by an independent driver-side
  * recompute (textbook formulations, not the query's plan).
  */
class W50OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16)
  }

  /** Linear-interpolated percentile (Spark `percentile` ≡ DuckDB
    * `quantile_cont` convention). */
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  test("q246: H, tie correction and per-group mean ranks match a textbook rank recompute") {
    val rows = MlEvalQueries.q246Kruskal(spark, sfDir).collect()
    val pool = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value"), 6).as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // textbook average ranks over the full pool
    val sorted = pool.map(_._2).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.length) }
    val byGrp = pool.groupBy(_._1)
    val n = pool.length.toDouble
    val rsum = byGrp.map { case (g, xs) => g -> xs.map(x => rankOf(x._2)).sum }
    val sterm = rsum.map { case (g, r) => r * r / byGrp(g).length }.sum
    val hRaw = 12.0 / (n * (n + 1)) * sterm - 3.0 * (n + 1)
    val ties = sorted.groupBy(identity).values
      .map(t => t.length.toDouble * t.length * t.length - t.length).sum
    val hCorr = hRaw / (1.0 - ties / (n * n * n - n))
    assert(rows.length === byGrp.size)
    rows.foreach { r =>
      val g = r.getString(0)
      assert(r.getLong(1) === byGrp(g).length.toLong)
      assert(math.abs(r.getDouble(2) - rsum(g) / byGrp(g).length) < 1e-4,
        s"mean rank of $g")
      assert(r.getLong(3) === n.toLong && r.getLong(4) === byGrp.size.toLong)
      assert(math.abs(r.getDouble(5) - hRaw) < 1e-3, s"H: ${r.getDouble(5)} vs $hRaw")
      assert(math.abs(r.getDouble(6) - hCorr) < 1e-3, "tie-corrected H")
      assert(r.getBoolean(7) === (hCorr > MlEvalQueries.KruskalChi2Crit))
    }
  }

  test("q247: totals, OLS fit and the saturation signal match a driver recompute") {
    val row = TextQueries.q247Heaps(spark, sfDir).collect().head
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    var cumTok = 0L
    val pts = docs.map { case (_, ws) =>
      cumTok += ws.length
      ws.foreach(seen += _)
      (math.log(cumTok.toDouble), math.log(seen.size.toDouble))
    }
    assert(row.getLong(0) === docs.length.toLong, "n_docs")
    assert(row.getLong(1) === cumTok, "n_tokens")
    assert(row.getLong(2) === seen.size.toLong, "vocab")
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val k = math.exp((sy - beta * sx) / n)
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(row.getDouble(3) - beta) < 1e-4, "beta")
    assert(math.abs(row.getDouble(4) - k) < 1e-3, "k_coef")
    assert(math.abs(row.getDouble(5) - r2) < 1e-4, "r2")
    // the fixture's closed vocabulary must SATURATE — that diagnosis
    // is what the operator exists to surface
    assert(seen.size < 100 && beta < 0.05, "closed-vocab saturation")
  }

  test("q248: S, variance, z and Sen's slope match a textbook pair recompute") {
    val rows = TimeseriesQueries.q248MannKendall(spark, sfDir).collect()
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), round(col("value"), 6).as("v"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1) / 3600000000000L), r.getDouble(2)))
      .groupBy(_._1)
      .map { case ((t, h), xs) => (t, h, r6(xs.map(_._2).sum)) }
      .toSeq
    val byType = hourly.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val series = byType(r.getString(0)).map(x => (x._2, x._3)).sortBy(_._1)
      val n = series.length
      assert(r.getLong(1) === n.toLong, "n_hours")
      assert(r.getLong(2) === n.toLong * (n - 1) / 2, "n_pairs")
      val pairs = for {
        i <- series.indices; j <- (i + 1) until n
      } yield (series(i), series(j))
      val s = pairs.map { case ((_, va), (_, vb)) =>
        if (vb > va) 1L else if (vb < va) -1L else 0L }.sum
      assert(r.getLong(3) === s, "S statistic")
      val ties = series.map(_._2).groupBy(identity).values
        .map(t => t.length.toDouble * (t.length - 1) * (2 * t.length + 5)).sum
      val varS = (n.toDouble * (n - 1) * (2 * n + 5) - ties) / 18.0
      assert(math.abs(r.getDouble(4) - varS) < 1e-3, "var_s")
      val z = (if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) / math.sqrt(varS)
      assert(math.abs(r.getDouble(5) - z) < 1e-5, "z")
      val slopes = pairs.map { case ((ha, va), (hb, vb)) =>
        (vb - va) / (hb - ha).toDouble }.sorted.toIndexedSeq
      assert(math.abs(r.getDouble(6) - pct(slopes, 0.5)) < 1e-5, "sen slope")
      val want = if (z > TimeseriesQueries.MannKendallZCrit) "increasing"
        else if (z < -TimeseriesQueries.MannKendallZCrit) "decreasing" else "none"
      assert(r.getString(7) === want, "trend call")
    }
  }

  test("q249: scores match a dense driver-side weighted power iteration") {
    val rows = TextQueries.q249TextRank(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select(col("text")).collect()
      .map(_.getString(0).split(" ", -1))
    val cnt = docs.flatten.groupBy(identity).map { case (w, xs) => w -> xs.length }
    val nodes = cnt.filter(_._2 >= TextQueries.TextRankMinCount).keySet
    val und = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { ws =>
      ws.sliding(2).foreach {
        case Array(a, b) if a != b && nodes(a) && nodes(b) =>
          val k = if (a < b) (a, b) else (b, a)
          und(k) = und.getOrElse(k, 0L) + 1
        case _ => ()
      }
    }
    val out = scala.collection.mutable.Map.empty[String, Double]
    und.foreach { case ((x, y), w) =>
      out(x) = out.getOrElse(x, 0.0) + w
      out(y) = out.getOrElse(y, 0.0) + w
    }
    var score = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to TextQueries.TextRankRounds) {
      val nxt = scala.collection.mutable.Map.empty[String, Double]
      und.foreach { case ((x, y), w) =>
        if (score.contains(x))
          nxt(y) = nxt.getOrElse(y, 0.0) + w / out(x) * score(x)
        if (score.contains(y))
          nxt(x) = nxt.getOrElse(x, 0.0) + w / out(y) * score(y)
      }
      score = nxt.map { case (k, v) =>
        k -> (TextQueries.TextRankRestart + TextQueries.TextRankDamping * v) }.toMap
    }
    assert(rows.nonEmpty && rows.length <= TextQueries.TextRankTopK)
    rows.foreach { r =>
      val w = r.getString(0)
      assert(cnt(w) >= TextQueries.TextRankMinCount, "node passed the count floor")
      assert(math.abs(r.getDouble(1) - score(w)) < 1e-6, s"score of $w")
      assert(r.getDouble(1) > TextQueries.TextRankRestart, "incoming mass present")
    }
    // ordering contract: scores non-increasing, ties broken by word
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(1) > b.getDouble(1) ||
          (a.getDouble(1) == b.getDouble(1) && a.getString(0) < b.getString(0)))
      case _ => ()
    }
  }

  test("q250: the bootstrap is an exact deterministic-hash replay") {
    val row = MlEvalQueries.q250Bootstrap(spark, sfDir).collect().head
    val pool = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), round(col("value"), 6).as("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(row.getLong(0) === pool.length.toLong, "n")
    assert(math.abs(row.getDouble(1) - r6(pool.map(_._2).sum / pool.length)) < 1e-9)
    val ladder = MlEvalQueries.BootLadder
    val ms = (1 to MlEvalQueries.BootReplicates).map { b =>
      var sw = 0L; var swv = 0.0
      pool.foreach { case (id, v) =>
        val u = h32(s"boot:$id:$b") % 1000000L
        val wt = ladder.find(u < _._1).map(_._2).getOrElse(6)
        sw += wt; swv += r6(wt * v)
      }
      r6(swv / sw)
    }
    val sortedMs = ms.sorted.toIndexedSeq
    assert(math.abs(row.getDouble(2) - r6(ms.sum / ms.length)) < 1e-6, "boot_mean")
    assert(math.abs(row.getDouble(3) - pct(sortedMs, 0.025)) < 1e-6, "ci_lo")
    assert(math.abs(row.getDouble(4) - pct(sortedMs, 0.975)) < 1e-6, "ci_hi")
    assert(row.getDouble(3) < row.getDouble(4), "CI is a real interval")
  }
}
