package graft

import org.apache.spark.sql.functions._
import graft.graph.{LinkRank, WebGraph}
import graft.queries.GraphQueries

/** q97's gate argument made explicit: with damping 0.1 the iterate
  * reaches its double-precision fixed point strictly inside the round
  * budget, so the tolerance-halted result IS the full-budget result —
  * which is what the oracle unrolls.
  */
@SlowSuite
class RankTolSpec extends GraftSpec {

  private lazy val hedges = WebGraph.cachedHostEdges(spark, sfDir)

  test("tol halt triggers strictly inside the round budget") {
    val (_, rounds) = LinkRank.runCounted(spark, hedges,
      LinkRank.uniformInit(hedges),
      iters = GraphQueries.RankTolBudget, damping = GraphQueries.RankTolDamping,
      tol = Some(GraphQueries.RankTolEps), normalize = false)
    assert(rounds < GraphQueries.RankTolBudget,
      s"tol=1e-15 must halt before the $rounds/${GraphQueries.RankTolBudget} budget " +
        "— if not, the oracle's unrolled chain is a truncation gap, not a fixed point")
    assert(rounds > 5, "sanity: convergence should still take several rounds")
  }

  test("tol-halted result equals the full-budget (oracle-shaped) iterate") {
    val halted = LinkRank.runCounted(spark, hedges, LinkRank.uniformInit(hedges),
      iters = GraphQueries.RankTolBudget, damping = GraphQueries.RankTolDamping,
      tol = Some(GraphQueries.RankTolEps), normalize = false)._1
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = LinkRank.runCounted(spark, hedges, LinkRank.uniformInit(hedges),
      iters = GraphQueries.RankTolBudget, damping = GraphQueries.RankTolDamping,
      tol = None, normalize = false)._1
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(halted.keySet == full.keySet)
    halted.foreach { case (id, v) =>
      assert(math.abs(v - full(id)) < 1e-12, s"$id: $v vs ${full(id)}")
    }
  }

  test("q97 driver row: deterministic, one row per host, scores on the x1000 grid") {
    val rows = GraphQueries.q97RankTol(spark, sfDir).collect()
    val again = GraphQueries.q97RankTol(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.sameElements(again))
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }
}
