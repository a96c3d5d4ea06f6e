package graft

import org.apache.spark.sql.functions._
import graft.queries.WindowQueries
import graft.text.PipelineQueries

/** Wave-59 operators: cross-shard quantile normalization (q279),
  * Neyman stratified allocation (q280), absorbing-chain conversion
  * probability (q281) — each cross-checked by an INDEPENDENT
  * driver-side formulation (per-doc midranks vs the value-level
  * frames; a raw allocation replay + the optimality inequality; the
  * plain-double chain recursion over rebuilt sessions).
  */
class W59OpsSpec extends GraftSpec {

  test("q279: value-level mapping equals the per-doc midrank recompute; reference is identity") {
    val out = PipelineQueries.q279QuantileNorm(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    val refSrc = bySrc.toSeq.sortBy { case (s, vs) => (-vs.length, s) }.head
    val a = refSrc._2
    val na = a.length
    def midrankP(vs: Array[Long], v: Long): Double = {
      val lo = vs.indexWhere(_ == v)
      val hi = vs.lastIndexWhere(_ == v)
      val mid = (lo + hi) / 2.0
      if (vs.length == 1) 0.5 else mid / (vs.length - 1)
    }
    def mapRef(p: Double): Double = {
      val i = p * (na - 1)
      val ilo = math.floor(i).toLong
      val ihi = math.min(math.ceil(i).toLong, na - 1L)
      a(ilo.toInt) + (i - ilo) * (a(ihi.toInt) - a(ilo.toInt))
    }
    val expect = docs.map { case (s, v) =>
      val p = midrankP(bySrc(s), v)
      (s, math.min(math.floor(p * 10).toLong, 9L), v, mapRef(p))
    }.groupBy(t => (t._1, t._2)).map { case ((s, d), rs) =>
      (s, d) -> (rs.length.toLong,
        rs.map(_._3).sum.toDouble / rs.length,
        rs.map(_._4).sum / rs.length)
    }
    assert(out.length == expect.size, "one row per populated (source, decile)")
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, mr, mm) = expect(k)
      assert(r.getLong(2) == n, s"$k n_docs")
      assert(math.abs(r.getDouble(3) - mr) < 1e-5, s"$k mean_raw")
      assert(math.abs(r.getDouble(4) - mm) < 1e-4, s"$k mean_mapped")
    }
    // the reference source must map to itself
    out.filter(_.getString(0) == refSrc._1).foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-6,
        s"reference decile ${r.getLong(1)} is not identity")
    }
    // and at least one non-reference source must actually move
    assert(out.exists(r => r.getString(0) != refSrc._1 &&
      math.abs(r.getDouble(3) - r.getDouble(4)) > 1e-3),
      "mapping must change some non-reference shard")
  }

  test("q280: allocation replays exactly, sums to the budget, and Neyman beats proportional") {
    val out = PipelineQueries.q280NeymanAllocation(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = docs.groupBy(_._1).toSeq.map { case (l, vs) =>
      val n = vs.length
      val mean = vs.map(_._2).sum.toDouble / n
      val sigma = math.sqrt(math.max(
        vs.map(v => v._2.toDouble * v._2).sum / n - mean * mean, 0.0))
      (l, n.toLong, sigma)
    }.sortBy(_._1)
    val nTot = strata.map(_._2).sum
    val wsum = strata.map(t => t._2 * t._3).sum
    val raw = strata.map { case (l, nh, s) =>
      (l, PipelineQueries.NeymanBudget * nh * s / wsum) }
    val floors = raw.map { case (l, r) => (l, math.floor(r).toLong, r - math.floor(r)) }
    val k = PipelineQueries.NeymanBudget - floors.map(_._2).sum
    val bump = floors.sortBy { case (l, _, rem) => (-rem, l) }
      .take(k.toInt).map(_._1).toSet
    val alloc = floors.map { case (l, f, _) => l -> (f + (if (bump(l)) 1L else 0L)) }.toMap
    assert(out.map(_.getLong(4)).sum == PipelineQueries.NeymanBudget,
      "integerized allocation exhausts the budget exactly")
    out.foreach { r =>
      val l = r.getString(0)
      val (_, nh, sigma) = strata.find(_._1 == l).get
      assert(r.getLong(1) == nh)
      assert(math.abs(r.getDouble(2) - sigma) < 1e-5, s"$l sigma")
      assert(r.getLong(4) == alloc(l), s"$l neyman_alloc")
      assert(math.abs(r.getDouble(3) -
        PipelineQueries.NeymanBudget * nh.toDouble / nTot) < 1e-5, s"$l prop")
    }
    val vNey = out.map(_.getDouble(5)).sum
    val vProp = out.map(_.getDouble(6)).sum
    assert(vNey <= vProp + 1e-9,
      s"Neyman variance $vNey must not exceed proportional $vProp")
  }

  test("q281: absorption probabilities replay the chain recursion over rebuilt sessions") {
    val out = WindowQueries.q281Absorption(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4))
      var sid = 0L
      var prev = Long.MinValue
      val withSess = sorted.map { r =>
        if (prev == Long.MinValue || r._2 - prev > 30L * 60 * 1000000) sid += 1
        prev = r._2
        (sid, r._3)
      }
      withSess.zipWithIndex.map { case ((s, t), i) =>
        val nxt = if (i + 1 < withSess.length && withSess(i + 1)._1 == s)
          withSess(i + 1)._2 else "__end"
        (t, nxt)
      }
    }
    val cnts = trans.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val states = cnts.keys.map(_._1).toSeq.distinct.sorted
    val outSum = states.map(s =>
      s -> cnts.filter(_._1._1 == s).values.sum).toMap
    def p(s: String, t: String): Double =
      cnts.getOrElse((s, t), 0L).toDouble / outSum(s)
    var ph = states.map(s => s -> (if (s == "purchase") 1.0 else 0.0)).toMap
    for (_ <- 1 to WindowQueries.AbsorbSteps) {
      ph = states.map { s =>
        s -> (if (s == "purchase") 1.0
        else cnts.keys.filter(_._1 == s)
          .map { case (_, t) => p(s, t) * (if (t == "__end") 0.0 else ph(t)) }
          .sum)
      }.toMap
    }
    assert(out.length == states.length)
    out.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == cnts.getOrElse((s, "purchase"), 0L), s"$s n_direct")
      assert(r.getLong(2) == outSum(s), s"$s n_out")
      assert(math.abs(r.getDouble(3) -
        cnts.getOrElse((s, "purchase"), 0L).toDouble / outSum(s)) < 1e-6)
      assert(math.abs(r.getDouble(4) - ph(s)) < 1e-5, s"$s p_hit")
      assert(r.getDouble(4) >= r.getDouble(3) - 1e-9,
        "K-step absorption dominates the direct step")
    }
    assert(out.find(_.getString(0) == "purchase").get.getDouble(4) == 1.0)
  }
}
