package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling over an undirected edge
  * frame: repeatedly delete every vertex whose degree among SURVIVING
  * vertices is below k — what remains is the k-core, the standard
  * "dense backbone" extraction (spam farms cluster in high cores;
  * low-core pages are periphery).
  *
  * Scale shape (the [[Bfs]]/[[ConnectedComponents]] audit): each round
  * is two semi-joins of the edge frame against the surviving vertex
  * set plus one groupBy(a).count — hash-partitioned equi-joins with
  * partial aggregation, nothing vertex-level broadcast or collected,
  * one checkpointed snapshot live at a time. Peeling is monotone (the
  * surviving set only shrinks), so the fixed point is reached when a
  * round deletes nothing — and from there every further round is the
  * identity, making a budget-R run result-identical to exactly-R
  * unrolled rounds (the q66 equality argument the q89 oracle leans
  * on). Convergence needs at most "peeling depth" rounds — small on
  * real graphs (degrees collapse geometrically), bounded by the
  * budget for adversarial chains.
  */
object KCore {

  /** Survivors of k-core peeling over `und(a, b)` — an UNDIRECTED
    * symmetric edge frame (both orientations present, no self-loops).
    *
    * @return (id, in_core, core_deg) for every vertex of `und`:
    *         core_deg is the vertex's degree within the core
    *         (0 when peeled). */
  def run(und: DataFrame, k: Int, maxIters: Int): DataFrame = {
    val e = und.select(col("a"), col("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = e.select(col("a").as("id")).distinct()
    var alive = all.localCheckpoint()
    var aliveN = alive.count()
    var rounds = 0
    var converged = false
    while (rounds < maxIters && !converged) {
      val eAlive = e
        .join(alive.select(col("id").as("a")), "a", "left_semi")
        .join(alive.select(col("id").as("b")), "b", "left_semi")
      val next = eAlive.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a").as("id"))
      alive = graft.Checkpoints.rotate(next, alive)
      rounds += 1
      val n = alive.count() // one job on the materialized checkpoint
      converged = n == aliveN
      aliveN = n
    }
    // final in-core degrees off the converged survivor set
    val coreDeg = e
      .join(alive.select(col("id").as("a")), "a", "left_semi")
      .join(alive.select(col("id").as("b")), "b", "left_semi")
      .groupBy(col("a")).agg(count(lit(1)).as("core_deg"))
    val out = all
      .join(alive.withColumn("in_core", lit(true)), Seq("id"), "left")
      .join(coreDeg.withColumnRenamed("a", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"))
    e.unpersist()
    graft.Checkpoints.deferFree(alive)
    out
  }
}
