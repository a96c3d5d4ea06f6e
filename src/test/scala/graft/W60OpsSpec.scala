package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, MlEvalQueries, TimeseriesQueries}

/** Wave-60 operators: Katz centrality (q282), fuzzy c-means (q283),
  * the diurnal DFT periodogram (q284) — each cross-checked by an
  * INDEPENDENT driver-side formulation (the plain-double attenuated
  * recursion; the plain-double Bezdek update loop; a literal
  * per-element Fourier projection).
  */
class W60OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("q282: scores replay the attenuated-walk recursion; floor is beta") {
    val out = GraphQueries.q282Katz(spark, sfDir).collect()
    val edges = graph.WebGraph.cachedHostEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var x = verts.map(_ -> 1.0).toMap
    for (_ <- 1 to GraphQueries.KatzRounds) {
      x = verts.map(v => v -> 1.0).toMap ++
        edges.groupBy(_._2).map { case (v, es) =>
          v -> (1.0 + GraphQueries.KatzAlpha * es.map(e => x(e._1)).sum)
        }
    }
    assert(out.length == verts.length)
    out.foreach { r =>
      val id = r.getString(0)
      assert(closeRel(r.getDouble(1), x(id)), s"katz($id): ${r.getDouble(1)} vs ${x(id)}")
      assert(r.getDouble(1) >= 1.0, "beta floor: every vertex scores >= 1")
    }
    // the recursion must actually spread: scores separate hosts
    assert(out.map(_.getDouble(1)).distinct.length > verts.length / 2)
  }

  test("q283: centers and masses replay the Bezdek m=2 update loop") {
    val out = MlEvalQueries.q283FuzzyCmeans(spark, sfDir).collect()
    assert(out.length == MlEvalQueries.FcmClusters)
    val lattice = Tables.orders(spark, sfDir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0) / 100.0, r.getLong(1).toDouble))
    val lo = lattice.map(_._1).min
    val hi = lattice.map(_._1).max
    val delta = MlEvalQueries.FcmDelta.toDouble
    var cs = (1 to MlEvalQueries.FcmClusters)
      .map(j => lo + (hi - lo) * j * 0.25).toArray
    def memberships(v: Double): Array[Double] = {
      val w = cs.map(c => 1.0 / ((v - c) * (v - c) + delta))
      val sw = w.sum
      w.map(_ / sw)
    }
    for (_ <- 1 to MlEvalQueries.FcmRounds) {
      val num = Array.fill(cs.length)(0.0)
      val den = Array.fill(cs.length)(0.0)
      lattice.foreach { case (v, cnt) =>
        val u = memberships(v)
        for (j <- cs.indices) {
          num(j) += cnt * u(j) * u(j) * v
          den(j) += cnt * u(j) * u(j)
        }
      }
      cs = cs.indices.map(j => num(j) / den(j)).toArray
    }
    val mass = Array.fill(cs.length)(0.0)
    lattice.foreach { case (v, cnt) =>
      val u = memberships(v)
      for (j <- cs.indices) mass(j) += cnt * u(j)
    }
    out.foreach { r =>
      val j = r.getInt(0) - 1
      assert(closeRel(r.getDouble(1), cs(j), 1e-5), s"center($j): ${r.getDouble(1)} vs ${cs(j)}")
      assert(closeRel(r.getDouble(2), mass(j), 1e-5), s"mass($j): ${r.getDouble(2)} vs ${mass(j)}")
    }
    // soft masses partition the corpus: they sum to the order count
    val nOrders = lattice.map(_._2).sum
    assert(math.abs(out.map(_.getDouble(2)).sum - nOrders) < 1e-3 * nOrders)
    // bands stay ordered (no center collapse on the fixture)
    val centers = out.sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(centers.sliding(2).forall(p => p(0) < p(1)), "centers strictly increasing")
  }

  test("q284: powers replay a literal Fourier projection; shares sum to 1") {
    val out = TimeseriesQueries.q284Periodogram(spark, sfDir).collect()
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    val expected = byType.flatMap { case (et, rows) =>
      val lo = rows.map(_._2).min
      val hi = rows.map(_._2).max
      val counts = rows.map(r => r._2 -> r._3).toMap
      val xs = (lo to hi).map(h => h -> counts.getOrElse(h, 0L).toDouble)
      val m = xs.map(_._2).sum / xs.length
      (1 to TimeseriesQueries.DftHarmonics).map { k =>
        val cos = xs.map { case (h, v) =>
          (v - m) * math.cos(2.0 * math.Pi * k * (h % 24) / 24.0) }.sum
        val sin = xs.map { case (h, v) =>
          (v - m) * math.sin(2.0 * math.Pi * k * (h % 24) / 24.0) }.sum
        (et, k) -> (cos * cos + sin * sin)
      }
    }
    assert(out.length == byType.size * TimeseriesQueries.DftHarmonics)
    out.foreach { r =>
      val key = (r.getString(0), r.getInt(1))
      assert(closeRel(r.getDouble(3), expected(key), 1e-5),
        s"power$key: ${r.getDouble(3)} vs ${expected(key)}")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(4) >= 0.0)
      assert(r.getInt(2) == 24 / r.getInt(1), "period is the k-th harmonic")
    }
    out.groupBy(_.getString(0)).foreach { case (et, rows) =>
      assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4,
        s"shares of $et sum to 1")
    }
  }
}
