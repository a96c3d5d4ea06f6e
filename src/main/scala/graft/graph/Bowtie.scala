package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bow-tie decomposition of a directed graph (Broder et al., "Graph
  * structure in the Web", WWW 2000): classify every vertex as
  *
  *  - `core` — the giant SCC (largest; ties → min canonical label)
  *  - `in`   — reaches the core (but is not in it)
  *  - `out`  — reached from the core
  *  - `tube` — on an IN→OUT path that bypasses the core
  *  - `tendril` — hangs forward off IN or backward off OUT
  *  - `disconnected` — none of the above
  *
  * IN ∩ OUT = ∅ by construction: a vertex that both reaches and is
  * reached by the core is mutually reachable with it — i.e. inside it.
  * Tendril/tube vertices are never in fwd(core) ∪ bwd(core), so their
  * IN→…→OUT paths bypass the core by definition.
  *
  * Composes the already-audited engines: [[Scc]] for the core and four
  * multi-source [[Bfs]] sweeps (forward/backward from CORE, forward
  * from IN, backward from OUT). Scale inherits their audits; the
  * giant-SCC pick is a 1-row TakeOrdered broadcast back, and the final
  * classification is a chain of vertex-scale (id, flag) left joins.
  */
object Bowtie {

  /** @param edges    (src, dst) directed string-id edges
    * @param sccIters outer budget for the SCC peeling loop
    * @param maxRounds per-BFS hop budget (≥ graph radius; BFS
    *                 early-exits at its fixed point)
    * @return (id, cls) — cls ∈ {core,in,out,tube,tendril,disconnected}
    */
  /** @param sccFrame pre-computed SCC labeling (id, scc, scc_size) to
    *                  reuse (e.g. a session-cached q116 result); None
    *                  computes it here. */
  def run(spark: SparkSession, edges: DataFrame, sccIters: Int,
          maxRounds: Int, cacheKey: Option[String] = None,
          sccFrame: Option[DataFrame] = None): DataFrame = {
    val redges = edges.select(col("dst").as("src"), col("src").as("dst"))
    val verts = WebGraph.vertices(edges)
    val scc = sccFrame.getOrElse(Scc.run(spark, edges, sccIters, cacheKey))
    val coreLab = scc.select(col("scc"), col("scc_size")).distinct()
      .orderBy(col("scc_size").desc, col("scc")).limit(1)
      .select(col("scc").as("core_scc"))
    val core = scc.crossJoin(broadcast(coreLab))
      .filter(col("scc") === col("core_scc")).select(col("id"))
    def reached(e: DataFrame, seeds: DataFrame, flag: String): DataFrame =
      Bfs.run(e, verts, seeds, maxRounds)
        .filter(col("dist").isNotNull).select(col("id"), lit(1).as(flag))
    val fwd = reached(edges, core, "f_core") // core ∪ OUT
    val bwd = reached(redges, core, "b_core") // core ∪ IN
    val inSet = bwd.join(core.withColumn("c", lit(1)), Seq("id"), "left_anti")
      .select(col("id"))
    val outSet = fwd.join(core.withColumn("c", lit(1)), Seq("id"), "left_anti")
      .select(col("id"))
    val fIn = reached(edges, inSet, "f_in") // forward closure of IN
    val bOut = reached(redges, outSet, "b_out") // backward closure of OUT
    verts
      .join(core.withColumn("is_core", lit(1)), Seq("id"), "left")
      .join(fwd, Seq("id"), "left")
      .join(bwd, Seq("id"), "left")
      .join(fIn, Seq("id"), "left")
      .join(bOut, Seq("id"), "left")
      .select(col("id"),
        when(col("is_core") === 1, "core")
          .when(col("b_core") === 1, "in")
          .when(col("f_core") === 1, "out")
          .when(col("f_in") === 1 && col("b_out") === 1, "tube")
          .when(col("f_in") === 1 || col("b_out") === 1, "tendril")
          .otherwise("disconnected").as("cls"))
  }
}
