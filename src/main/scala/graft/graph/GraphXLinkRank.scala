package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.MathFunctions

/** GraphX backend for LinkRank — the BASELINE-named canonical approach
  * ("GraphX PageRank algorithm"), kept semantically identical to the
  * DataFrame engine (graft.graph.LinkRank): same 9-update damped rule
  * with dangling redistribution, same log-normal CDF normalization.
  * GraphXLinkRankSpec asserts both backends agree on the reference's
  * gold fixtures and on the derived sf graph.
  *
  * When to prefer which: the DataFrame engine integrates with Catalyst
  * (AQE, codegen, cache reuse with the rest of a query) and is the
  * driver-verified default; this backend demonstrates the Pregel-style
  * message-passing formulation (aggregateMessages + per-step dangling
  * scalar), which co-partitions messages with the edge RDD and avoids
  * per-iteration plan re-optimization — attractive when the rank loop
  * dominates and the graph fits GraphX's partitioning model.
  */
object GraphXLinkRank {

  /** @param edges (src, dst) cleaned string-id edges
    * @param cacheKey when set, the string→long vertex-id mapping is the
    *                 session-shared one (LinkRank.vmapFor) — a session
    *                 that already ranked the same graph through the
    *                 DataFrame engine contributes its id map for free
    * @return (id, score) normalized like LinkRank.run */
  def run(spark: SparkSession, edges: DataFrame,
          iters: Int = 9, damping: Double = 0.85,
          scale: Double = 10.0,
          cacheKey: Option[String] = None): DataFrame = {

    // string ids -> dense longs on the DataFrame side: two Catalyst
    // equi-joins against the checkpointed mapping (hash exchanges on
    // 8-byte-suffixed keys, broadcastable when small) replace the r3
    // string-keyed RDD joins, which shuffled the full string edge list
    // twice with no shared partitioner.
    val vmap = LinkRank.vmapFor(spark, WebGraph.vertices(edges), cacheKey)

    val edgeRdd: RDD[Edge[Unit]] = edges
      .join(vmap.withColumnRenamed("id", "src").withColumnRenamed("vid", "svid"), "src")
      .join(vmap.withColumnRenamed("id", "dst").withColumnRenamed("vid", "dvid"), "dst")
      .select(col("svid"), col("dvid")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))

    val n = vmap.count().toDouble
    // fromEdges only creates vertices that touch an edge; our vertex
    // set equals src ∪ dst, so that is exactly the id set.
    val graph = Graph.fromEdges(edgeRdd, 1.0,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val outDeg = graph.outDegrees // (id, deg>0) pairs only
    var g = graph.outerJoinVertices(outDeg) {
      (_, score, d) => (score, d.getOrElse(0))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // The predecessor graph is unpersisted one iteration LATE: the
    // step-k dangling fold is the first action touching graph k, so it
    // materializes it — only then can graph k-1's blocks go. This keeps
    // two live snapshots momentarily but saves a dedicated
    // materialize-count job per iteration (2 jobs/step instead of 3).
    var lagged: Option[Graph[(Double, Int), Unit]] = None
    for (_ <- 1 to iters) {
      val dangling = g.vertices.filter(_._2._2 == 0).map(_._2._1)
        .fold(0.0)(_ + _) // materializes g
      lagged.foreach(_.unpersist(blocking = false))
      val msgs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._2),
        _ + _)
      lagged = Some(g)
      g = g.outerJoinVertices(msgs) { (_, attr, m) =>
        ((1.0 - damping) / n + damping * (m.getOrElse(0.0) + dangling / n),
          attr._2)
      }.persist(StorageLevel.MEMORY_AND_DISK)
    }

    // log-normal CDF normalization — same two-pass arithmetic as the
    // DataFrame engine (LinkRankComputation.java:213-256).
    val logs = g.vertices.map { case (id, (score, _)) => (id, math.log(score)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mu = logs.map(_._2).fold(0.0)(_ + _) / n // materializes g + logs
    lagged.foreach(_.unpersist(blocking = false))
    val sig0 = math.sqrt(logs.map(l => (l._2 - mu) * (l._2 - mu)).fold(0.0)(_ + _) / n)
    val sigma = if (sig0 == 0.0) 1e-10 else sig0

    val back: RDD[(VertexId, String)] = vmap
      .select(col("vid"), col("id")).rdd
      .map(r => (r.getLong(0), r.getString(1)))
    import spark.implicits._
    val out = logs.join(back).map { case (_, (l, id)) => (id, l) }
      .toDF("id", "l")
      .select(col("id"),
        (MathFunctions.normalCdf(col("l"), lit(mu), lit(sigma)) * lit(scale)).as("score"))
    // logs is materialized (mu/sigma folds); the final graph can go now.
    g.unpersist(blocking = false)
    // `out` still reads logs AND vmap lazily — the checkpointed mapping
    // in particular must stay live until the caller's action completes:
    // a recomputed monotonically_increasing_id could reassign ids and
    // silently mis-join scores to urls. Freed at the harness drain
    // (session-cached vmaps are shared — SessionCache owns those).
    graft.Checkpoints.deferCleanup(spark) { () =>
      logs.unpersist(blocking = false)
      if (cacheKey.isEmpty) graft.Checkpoints.free(vmap)
    }
    out
  }
}
