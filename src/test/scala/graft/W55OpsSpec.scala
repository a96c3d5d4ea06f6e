package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, TimeseriesQueries}
import graft.text.PipelineQueries

/** Wave-55 operators: deflated-power-iteration LSA (q268), sequential
  * probability ratio test (q269), A/B power analysis (q270) — each
  * cross-checked by an independent driver recompute (dense matrix
  * arithmetic for the LSA, the textbook Wald walk for the SPRT).
  */
class W55OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q268: loadings and singular values match a dense SVD-style recompute") {
    val rows = PipelineQueries.q268LsaTopics(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val tf = docs.flatMap { case (d, ws) =>
      ws.groupBy(identity).map { case (t, xs) => ((d, t), xs.length) } }.toMap
    val nd = docs.length.toDouble
    val df = tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size }
    val a = tf.map { case ((d, t), f) =>
      (d, t) -> f * math.log(nd / df(t) + 1.0) }
    val terms = df.keys.toSeq.sorted
    val docIds = docs.map(_._1)
    def av(v: Map[String, Double]): Map[Long, Double] =
      docIds.map(d => d -> terms.map(t =>
        a.getOrElse((d, t), 0.0) * v.getOrElse(t, 0.0)).sum).toMap
    def atu(u: Map[Long, Double]): Map[String, Double] =
      terms.map(t => t -> docIds.map(d =>
        a.getOrElse((d, t), 0.0) * u(d)).sum).toMap
    def powerLoop(deflate: Option[Map[String, Double]]): Map[String, Double] = {
      var v = terms.map(_ -> 1.0 / math.sqrt(terms.length)).toMap
      for (_ <- 1 to PipelineQueries.LsaRounds) {
        var w = atu(av(v))
        deflate.foreach { v1 =>
          val pr = terms.map(t => w(t) * v1(t)).sum
          w = w.map { case (t, x) => t -> (x - pr * v1(t)) }
        }
        val n = math.sqrt(w.values.map(x => x * x).sum)
        v = w.map { case (t, x) => t -> x / n }
      }
      v
    }
    val v1 = powerLoop(None)
    val v2 = powerLoop(Some(v1))
    def sigma(v: Map[String, Double]): Double =
      math.sqrt(av(v).values.map(x => x * x).sum)
    val want = Map(1 -> (v1, sigma(v1)), 2 -> (v2, sigma(v2)))
    assert(rows.length === 2 * PipelineQueries.LsaTopTerms)
    rows.foreach { r =>
      val (v, s) = want(r.getInt(0))
      assert(math.abs(r.getDouble(2) - v(r.getString(1))) < 1e-4,
        s"loading of ${r.getString(1)} in component ${r.getInt(0)}")
      assert(math.abs(r.getDouble(3) - s) < 0.01, s"sigma ${r.getInt(0)}")
    }
    // deflation must produce a genuinely orthogonal second axis
    val dot = terms.map(t => v1(t) * v2(t)).sum
    assert(math.abs(dot) < 1e-3, s"v1.v2 = $dot")
    assert(want(1)._2 > want(2)._2, "sigma1 > sigma2")
  }

  test("q269: the LLR walk matches a sequential Wald recompute") {
    val rows = TimeseriesQueries.q269Sprt(spark, sfDir).collect()
    val days = Tables.events(spark, sfDir)
      .select(expr("ts div 86400000000000").as("day"),
        (col("event_type") === "purchase").cast("long").as("isp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) =>
        (d, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val kTot = days.map(_._3).sum.toDouble
    val nTot = days.map(_._2).sum.toDouble
    val p0 = kTot / nTot
    val p1 = math.min(TimeseriesQueries.SprtLift * p0, 0.999)
    def r12(x: Double): Double =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    val c1 = r12(math.log(p1 / p0))
    val c2 = r12(math.log((1 - p1) / (1 - p0)))
    val aB = r12(math.log((1.0 - TimeseriesQueries.SprtBeta) /
      TimeseriesQueries.SprtAlpha))
    val bB = r12(math.log(TimeseriesQueries.SprtBeta /
      (1.0 - TimeseriesQueries.SprtAlpha)))
    var cum = 0.0
    var decision = -1L
    val want = days.map { case (d, n, k) =>
      val llr = r12(k * c1 + (n - k) * c2)
      cum += llr
      val st = if (r6(cum) >= aB) "accept_h1"
        else if (r6(cum) <= bB) "accept_h0" else "continue"
      if (st != "continue" && decision < 0) decision = d
      (d, n, k, r6(llr), r6(cum), st)
    }
    assert(rows.length === want.length)
    rows.zip(want).foreach { case (r, (d, n, k, llr, cumv, st)) =>
      assert(r.getLong(0) === d && r.getLong(1) === n && r.getLong(2) === k)
      assert(math.abs(r.getDouble(3) - llr) < 1e-5, s"llr at $d")
      assert(math.abs(r.getDouble(4) - cumv) < 1e-4, s"cum_llr at $d")
      assert(r.getString(5) === st, s"state at $d")
      assert(r.getLong(6) === decision, "decision day")
      assert(math.abs(r.getDouble(7) - r6(p0)) < 1e-6)
      assert(math.abs(r.getDouble(8) - r6(p1)) < 1e-6)
    }
  }

  test("q270: sample sizes match the closed form and scale sanely") {
    val rows = MlEvalQueries.q270PowerAnalysis(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = ev.length.toDouble
    val nDays = ev.map(_._2).distinct.length.toDouble
    val byT = ev.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    assert(rows.map(_.getString(0)).toSet === byT.keySet)
    rows.foreach { r =>
      val t = r.getString(0)
      val share = byT(t) / n
      val s6 = r6(share)
      val sl = math.min(share * MlEvalQueries.PowerLift, 0.999)
      val delta = r6((MlEvalQueries.PowerLift - 1.0) * share)
      val z = MlEvalQueries.PowerZAlpha + MlEvalQueries.PowerZBeta
      val nReq = math.ceil(z * z * (s6 * (1 - s6) + sl * (1 - sl)) /
        (delta * delta)).toLong
      assert(r.getLong(1) === byT(t))
      assert(math.abs(r.getDouble(2) - s6) < 1e-9)
      assert(r.getLong(4) === nReq, s"n_required for $t")
      assert(r.getLong(5) === math.ceil(nReq / (n / nDays)).toLong, s"days for $t")
      // a 10% lift on a ~20% share needs thousands of samples, not tens
      assert(r.getLong(4) > 1000L && r.getLong(4) < 100000L)
    }
  }
}
