package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, MlEvalQueries, TimeseriesQueries}

/** Wave-58 operators: SALSA (q276), Brown's double exponential
  * smoothing (q277), delete-one-day jackknife for a ratio estimator
  * (q278) — each cross-checked by an INDEPENDENT driver-side
  * formulation (the plain-double degree-normalized recursion; the
  * sequential two-smoother recursion vs the nested closed form; the
  * raw leave-one-out loop).
  */
class W58OpsSpec extends GraftSpec {

  test("q276: scores replay the degree-normalized recursion; mass is conserved") {
    val out = GraphQueries.q276Salsa(spark, sfDir).collect()
    val edges = graph.WebGraph.cachedEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val dout = edges.groupBy(_._1).map { case (k, v) => k -> v.length }
    val din = edges.groupBy(_._2).map { case (k, v) => k -> v.length }
    var hub = verts.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 1 to GraphQueries.SalsaRounds) {
      auth = verts.map { v => v -> 0.0 }.toMap ++
        edges.groupBy(_._2).map { case (a, es) =>
          a -> es.map(e => hub(e._1) / dout(e._1)).sum
        }
      hub = verts.map { v => v -> 0.0 }.toMap ++
        edges.groupBy(_._1).map { case (s, es) =>
          s -> es.map(e => auth(e._2) / din(e._2)).sum
        }
    }
    val sa = auth.values.sum
    val sh = hub.values.sum
    assert(out.length == verts.length)
    out.foreach { r =>
      val id = r.getString(0)
      assert(math.abs(r.getDouble(1) - auth(id) / sa) < 1e-5,
        s"auth($id): ${r.getDouble(1)} vs ${auth(id) / sa}")
      assert(math.abs(r.getDouble(2) - hub(id) / sh) < 1e-5,
        s"hub($id): ${r.getDouble(2)} vs ${hub(id) / sh}")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0)
    }
    assert(math.abs(out.map(_.getDouble(1)).sum - 1.0) < 1e-4,
      "auth scores are L1-normalized")
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-4,
      "hub scores are L1-normalized")
  }

  test("q277: closed form equals the sequential two-smoother recursion") {
    val out = TimeseriesQueries.q277DoubleSmoothing(spark, sfDir).collect()
    assert(out.nonEmpty)
    val bySeries = out.groupBy(r => (r.getString(0), r.getLong(1)))
    bySeries.foreach { case ((et, day), rows0) =>
      val rows = rows0.sortBy(_.getLong(2))
      assert(rows.length == 24, s"($et,$day) grid has 24 hours")
      var s1 = rows.head.getLong(3).toDouble
      var s2 = s1
      rows.zipWithIndex.foreach { case (r, t) =>
        if (t > 0) {
          s1 = (r.getLong(3) + s1) / 2.0
          s2 = (s1 + s2) / 2.0
        }
        assert(math.abs(r.getDouble(4) - s1) < 1e-6, s"s1 at ($et,$day,$t)")
        assert(math.abs(r.getDouble(5) - s2) < 1e-6, s"s2 at ($et,$day,$t)")
        assert(math.abs(r.getDouble(6) - (2 * s1 - s2)) < 1e-6, "level")
        assert(math.abs(r.getDouble(7) - (s1 - s2)) < 1e-6, "trend")
        assert(math.abs(r.getDouble(8) - (3 * s1 - 2 * s2)) < 1e-6, "forecast")
        if (t < 23)
          assert(math.abs(r.getDouble(9) -
            (rows(t + 1).getLong(3) - (3 * s1 - 2 * s2))) < 1e-5,
            "fc_err is the realized one-step error")
        else assert(r.isNullAt(9), "no next hour at the day boundary")
      }
    }
  }

  test("q278: jackknife stats replay the raw leave-one-out loop") {
    val out = MlEvalQueries.q278JackknifeRatio(spark, sfDir).collect().head
    val daily = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value"), 6).cast("decimal(38,6)")).as("s"))
      .collect()
      .map(r => (r.getLong(1), r.getDecimal(2)))
    val n = daily.map(_._1).sum
    val s = daily.map(_._2.doubleValue()).sum
    val d = daily.length
    val ratio = s / n
    val loo = daily.map { case (nd, sd) => (s - sd.doubleValue()) / (n - nd) }
    val rbar = loo.sum / d
    val se = math.sqrt((d - 1.0) / d * loo.map(r => (r - rbar) * (r - rbar)).sum)
    assert(out.getLong(0) == d && out.getLong(1) == n)
    assert(math.abs(out.getDouble(2) - ratio) < 1e-5, "ratio")
    assert(math.abs(out.getDouble(3) - rbar) < 1e-5, "jackknife mean")
    assert(math.abs(out.getDouble(4) - (d - 1) * (rbar - ratio)) < 1e-4, "bias")
    assert(math.abs(out.getDouble(5) - se) < 1e-4, "jackknife SE")
    assert(out.getDouble(5) > 0.0, "day-to-day variation exists on the fixture")
  }
}
