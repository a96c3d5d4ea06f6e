package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, MlEvalQueries}

/** Wave-63 operators: directed triad census (q291), gradient-boosting
  * rounds (q292), Cliff's delta (q293) — each cross-checked by an
  * INDEPENDENT driver-side formulation (a brute-force triple scan
  * over the collected host graph; a sequential per-user boosting
  * replay; the O(n1·n2) direct pair comparison).
  */
class W63OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("q291: census replays a brute-force triple scan") {
    val out = GraphQueries.q291Triads(spark, sfDir).collect().head
    val edges = graph.WebGraph.cachedHostEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val verts = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    var cyc = 0L; var tr = 0L
    for (a <- verts; b <- verts if a != b && edges((a, b));
         c <- verts if c != a && c != b && edges((b, c))) {
      if (edges((c, a)) && a < b && a < c) cyc += 1
      if (edges((a, c))) tr += 1
    }
    assert(out.getLong(0) == cyc, s"cyclic: ${out.getLong(0)} vs $cyc")
    assert(out.getLong(1) == tr, s"transitive: ${out.getLong(1)} vs $tr")
    assert(closeRel(out.getDouble(2), cyc.toDouble / (cyc + tr), 1e-5))
  }

  test("q292: stages replay a sequential boosting loop; MSE monotone") {
    val out = MlEvalQueries.q292GbmRounds(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(out.length == MlEvalQueries.GbmStages + 1)
    val xy = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("x"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === MlEvalQueries.AbLastDay, 1.0)
          .otherwise(0.0)).as("y"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val n = xy.length
    var f = xy.map(p => p._1 -> (xy.map(_._2).sum / n)).toMap
    def mse = xy.map { case (x, y) => (y - f(x)) * (y - f(x)) }.sum / n
    assert(closeRel(out(0).getDouble(4), mse, 1e-5), "stage-0 mse")
    for (k <- 1 to MlEvalQueries.GbmStages) {
      val xs = xy.map(_._1).distinct.sorted
      val resid = xy.map { case (x, y) => (x, y - f(x)) }
      val (bestX, _, gl, gr) = xs.init.map { s =>
        val l = resid.filter(_._1 <= s).map(_._2)
        val r = resid.filter(_._1 > s).map(_._2)
        val gain = l.sum * l.sum / l.length + r.sum * r.sum / r.length
        (s, gain, l.sum / l.length, r.sum / r.length)
      }.maxBy(t => (t._2, -t._1))
      f = f.map { case (x, fx) =>
        x -> (fx + MlEvalQueries.GbmNu * (if (x <= bestX) gl else gr)) }
      val row = out(k)
      assert(row.getDouble(1) == bestX, s"stage-$k split")
      assert(closeRel(row.getDouble(2), gl, 1e-5), s"stage-$k gamma_left")
      assert(closeRel(row.getDouble(3), gr, 1e-5), s"stage-$k gamma_right")
      assert(closeRel(row.getDouble(4), mse, 1e-5), s"stage-$k mse")
      assert(row.getDouble(4) < out(k - 1).getDouble(4),
        s"boosting contract: stage-$k MSE decreases")
    }
  }

  test("q293: delta replays the direct pair comparison") {
    val out = MlEvalQueries.q293CliffsDelta(spark, sfDir).collect().head
    val pool = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .select(round(col("value"), 6).as("v"), col("event_type")).collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    val xs = pool.filter(_._2 == "purchase").map(_._1)
    val ys = pool.filter(_._2 == "click").map(_._1)
    var gt = 0L; var lt = 0L; var eq = 0L
    for (x <- xs; y <- ys) {
      if (x > y) gt += 1 else if (x < y) lt += 1 else eq += 1
    }
    assert(out.getLong(0) == xs.length && out.getLong(1) == ys.length)
    assert(out.getLong(2) == gt && out.getLong(3) == lt && out.getLong(4) == eq)
    val nn = xs.length.toDouble * ys.length
    assert(closeRel(out.getDouble(5), (gt - lt) / nn, 1e-5), "cliffs delta")
    assert(closeRel(out.getDouble(6), (gt + 0.5 * eq) / nn, 1e-5), "cles")
    assert(math.abs(out.getDouble(5)) <= 1.0)
  }
}
