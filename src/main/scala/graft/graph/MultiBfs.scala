package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-seed multi-source BFS: hop distances from EVERY seed separately
  * (state keyed (id, seed)), where [[Bfs]] collapses to the nearest
  * seed. This is the engine under sampled centrality measures
  * (closeness, harmonic, hop-histograms): one loop, K seeds, instead
  * of K loops.
  *
  * Scale shape: the state frame holds only REACHED (id, seed) pairs —
  * n·K worst case, frontier-sparse early — and each round is one
  * equi-join of the cached edge side to the current pairs, a partial-
  * agged min per (dst, seed), and a left-anti join against the pairs
  * already settled (first reach IS the min distance in an unweighted
  * graph, so settled pairs never change — the loop only APPENDS).
  * One checkpointed snapshot live at a time (Checkpoints.rotate), and
  * the early exit fires when a round settles nothing, which is the
  * fixed point (the q66 equality argument: a budget-K run equals K
  * unrolled rounds).
  */
object MultiBfs {

  /** @param edges (src, dst) directed edges, followed in direction.
    * @param seeds (id) — each row starts its own distance field.
    * @return (id, seed, dist) for reached pairs ONLY (dist 0 = the
    *         seed itself); unreached pairs are simply absent. */
  def run(edges: DataFrame, seeds: DataFrame, maxIters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var reached = seeds.select(col("id"), col("id").as("seed"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = reached
    var rounds = 0
    var done = false
    while (rounds < maxIters && !done) {
      // expand only the LAST round's new pairs: older pairs already
      // pushed their neighbors in the round they were settled
      val pulled = e.join(frontier, col("src") === col("id"))
        .groupBy(col("dst"), col("seed"))
        .agg((min(col("dist")) + 1L).as("dist"))
        .select(col("dst").as("id"), col("seed"), col("dist"))
      val fresh = pulled.join(reached.select(col("id"), col("seed")),
          Seq("id", "seed"), "left_anti")
        .localCheckpoint()
      if (frontier ne reached) graft.Checkpoints.free(frontier)
      if (fresh.isEmpty) {
        graft.Checkpoints.free(fresh)
        frontier = reached
        done = true
      } else {
        reached = graft.Checkpoints.rotate(reached.unionByName(fresh), reached)
        frontier = fresh
      }
      rounds += 1
    }
    if (frontier ne reached) graft.Checkpoints.free(frontier)
    e.unpersist()
    graft.Checkpoints.deferFree(reached)
    reached
  }
}
