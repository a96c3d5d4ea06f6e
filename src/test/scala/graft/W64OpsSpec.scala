package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, StorageQueries, TimeseriesQueries}

/** Wave-64 operators: off-policy IPS/SNIPS/ESS (q294), Bloom FPR
  * calibration (q295), the forecast-eval suite (q296) — each
  * cross-checked by an INDEPENDENT driver-side formulation (a plain
  * per-event reweighting loop; an independent JVM-md5 bit-set replay;
  * the sequential two-smoother recursion with hand-built baselines).
  */
class W64OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("q294: estimators replay a per-event reweighting loop; SNIPS self-normalizes") {
    val out = MlEvalQueries.q294OffPolicy(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("(ts div 3600000000000) % 24").as("hod"),
        round(col("value"), 6).as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val nTypes = ev.map(_._1).distinct.length
    val nC = ev.groupBy(e => (e._1, e._2)).map { case (k, v) => k -> v.length }
    val nH = ev.groupBy(_._2).map { case (h, v) => h -> v.length }
    def wOf(t: String, h: Long): Double =
      (1.0 / nTypes) / ((nC((t, h)) + 1.0) / (nH(h) + nTypes))
    val n = ev.length
    val ws = ev.map(e => wOf(e._1, e._2))
    val wv = ev.zip(ws).map { case (e, w) => w * e._3 }
    val ips = wv.sum / n
    val snips = wv.sum / ws.sum
    val ess = ws.sum * ws.sum / ws.map(w => w * w).sum
    assert(out.getLong(0) == n && out.getLong(1) == nTypes)
    assert(closeRel(out.getDouble(2), ev.map(_._3).sum / n, 1e-5), "naive mean")
    assert(closeRel(out.getDouble(3), ips, 1e-5), "ips")
    assert(closeRel(out.getDouble(4), snips, 1e-5), "snips")
    assert(closeRel(out.getDouble(5), ess, 1e-4), "ess")
    assert(out.getDouble(3) != out.getDouble(4),
      "smoothed propensities: SNIPS genuinely differs from IPS")
    assert(out.getDouble(6) > 0.5 && out.getDouble(6) <= 1.0,
      "near-uniform logs keep most of the effective sample")
  }

  test("q295: measured FPR replays an independent-md5 bit-set; theory formula pinned") {
    val out = StorageQueries.q295BloomFpr(spark, sfDir).collect()
    assert(out.length == StorageQueries.BloomFprMs.length)
    val keys = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val P = graft.functions.MathFunctions.HashP
    def pos(s: String, j: Int, m: Long): Long = {
      val u = (graft.functions.MathFunctions.hashA(j) * h32(s) +
        graft.functions.MathFunctions.hashB(j)) % P
      ((u % m) + m) % m
    }
    out.foreach { r =>
      val m = r.getLong(0)
      val bits = (for (k <- keys; j <- 0 until StorageQueries.BloomFprK)
        yield pos(s"c:$k", j, m)).toSet
      val fps = keys.count { k =>
        (0 until StorageQueries.BloomFprK).forall(j => bits(pos(s"p:$k", j, m)))
      }
      assert(r.getLong(1) == keys.length, "member count")
      assert(r.getLong(2) == bits.size, s"bits_set at m=$m")
      assert(closeRel(r.getDouble(4), fps.toDouble / keys.length, 1e-6),
        s"measured FPR at m=$m")
      val theory = math.pow(1.0 - math.pow(1.0 - 1.0 / m,
        StorageQueries.BloomFprK * keys.length.toDouble), StorageQueries.BloomFprK)
      assert(closeRel(r.getDouble(5), theory, 1e-5), s"theory FPR at m=$m")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
    }
    // smaller filters have (weakly) more false positives
    val byM = out.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(byM.sliding(2).forall(p => p(0) >= p(1)), "FPR monotone in m")
  }

  test("q296: metrics replay the sequential smoother + hand-built baselines") {
    val out = TimeseriesQueries.q296ForecastEval(spark, sfDir).collect()
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hr")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val types = hourly.keys.map(_._1).toSeq.distinct.sorted
    types.foreach { et =>
      val days = hourly.keys.filter(_._1 == et).map(_._2).toSeq.distinct.sorted
      var aeM = 0.0; var seM = 0.0; var aeP = 0L; var aeS = 0L; var nEval = 0L
      days.foreach { d =>
        if (days.contains(d - 1)) {
          val cnt = (0L to 23L).map(h => hourly.getOrElse((et, d, h), 0L))
          val prev = (0L to 23L).map(h => hourly.getOrElse((et, d - 1, h), 0L))
          var s1 = cnt(0).toDouble; var s2 = s1
          for (h <- 0 to 22) {
            if (h > 0) { s1 = (cnt(h) + s1) / 2.0; s2 = (s1 + s2) / 2.0 }
            val fc = 3 * s1 - 2 * s2
            val actual = cnt(h + 1)
            aeM += math.abs(actual - fc); seM += (actual - fc) * (actual - fc)
            aeP += math.abs(actual - cnt(h)); aeS += math.abs(actual - prev(h + 1))
            nEval += 1
          }
        }
      }
      val row = out.find(_.getString(0) == et).get
      assert(row.getLong(1) == nEval, s"$et n_eval")
      assert(closeRel(row.getDouble(2), aeM / nEval, 1e-5), s"$et mae_model")
      assert(closeRel(row.getDouble(3), aeP.toDouble / nEval, 1e-5), s"$et mae_persist")
      assert(closeRel(row.getDouble(4), aeS.toDouble / nEval, 1e-5), s"$et mae_snaive")
      assert(closeRel(row.getDouble(5), math.sqrt(seM / nEval), 1e-5), s"$et rmse")
      assert(closeRel(row.getDouble(6), aeM / aeS, 1e-4), s"$et mase")
      assert(row.getDouble(6) > 0.0)
    }
    assert(out.length == types.length)
  }
}
