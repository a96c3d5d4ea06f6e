package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances over a directed edge frame — the
  * frontier/reachability primitive next to rank (how many hops is
  * every page from the trusted set?), and the distance twin of
  * [[ConnectedComponents]]' min-label loop.
  *
  * Scale shape (same audit as CC): each round is one
  * groupBy(dst).min(dist+1) over the edge frame joined to the current
  * distances — hash-partitioned equi-joins with partial aggregation,
  * one checkpointed snapshot live at a time (Checkpoints.rotate).
  * Early exit fires only at the fixed point, where further rounds are
  * the identity — so a budget-K run is result-identical to exactly-K
  * unrolled rounds whether or not the graph converged inside the
  * budget (the q66 equality argument; the q69 oracle leans on it).
  * Rounds needed = eccentricity of the seed set, so the budget is the
  * caller's radius bound, not a correctness knob.
  */
object Bfs {

  /** Hop distance from the nearest seed, over `edges(src, dst)`
    * following edge direction, for every vertex in `vertices(id)`.
    *
    * @param seeds (id) — distance-0 sources (ids not in `vertices`
    *              are ignored by construction of the init join).
    * @return (id, dist) — dist is NULL for vertices unreached within
    *         `maxIters` hops. */
  def run(edges: DataFrame, vertices: DataFrame, seeds: DataFrame,
          maxIters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = vertices.select(col("id"))
      .join(seeds.select(col("id"), lit(0L).as("dist")), Seq("id"), "left")
    var dist = init.localCheckpoint()
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val pulled = e.join(dist.filter(col("dist").isNotNull), col("src") === col("id"))
        .groupBy(col("dst")).agg((min(col("dist")) + 1L).as("md"))
      val next = dist.join(pulled, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("dist"), col("md")).as("dist"), // least skips nulls
          (coalesce(col("md") < col("dist"), lit(false)) ||
            (col("dist").isNull && col("md").isNotNull)).as("chg"))
      dist = graft.Checkpoints.rotate(next, dist)
      rounds += 1
      // one limit-1 job on the already-materialized checkpoint
      converged = dist.filter(col("chg")).isEmpty
    }
    e.unpersist()
    graft.Checkpoints.deferFree(dist)
    dist.select(col("id"), col("dist"))
  }
}
