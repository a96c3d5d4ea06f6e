package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
    * @return (id, score) normalized like LinkRank.run */
  def run(spark: SparkSession, edges: DataFrame,
          iters: Int = 9, damping: Double = 0.85,
          scale: Double = 10.0): DataFrame = {
    import spark.implicits._

    // string ids -> dense longs (kept for the way back)
    val idMap = WebGraph.vertices(edges)
      .select(col("id")).rdd.map(_.getString(0))
      .zipWithUniqueId()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val edgeRdd: RDD[Edge[Unit]] = edges
      .select(col("src"), col("dst")).rdd
      .map(r => (r.getString(0), r.getString(1)))
      .join(idMap) // src -> srcId
      .map { case (_, (dst, srcId)) => (dst, srcId) }
      .join(idMap) // dst -> dstId
      .map { case (_, (srcId, dstId)) => Edge(srcId, dstId, ()) }

    val n = idMap.count().toDouble
    val graph = Graph.fromEdges(edgeRdd, 1.0,
      StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
      // fromEdges only creates vertices that touch an edge; our vertex
      // set equals src ∪ dst, so that is exactly the id set.
      .outerJoinVertices(idMap.map(_.swap)) { (_, score, _) => score }
    val outDeg = graph.outDegrees // (id, deg>0) pairs only
    var g = graph.outerJoinVertices(outDeg) {
      (_, score, d) => (score, d.getOrElse(0))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    for (_ <- 1 to iters) {
      val dangling = g.vertices.filter(_._2._2 == 0).map(_._2._1)
        .fold(0.0)(_ + _)
      val msgs = g.aggregateMessages[Double](
        ctx => ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._2),
        _ + _)
      val prev = g
      g = g.outerJoinVertices(msgs) { (_, attr, m) =>
        ((1.0 - damping) / n + damping * (m.getOrElse(0.0) + dangling / n),
          attr._2)
      }.persist(StorageLevel.MEMORY_AND_DISK)
      g.vertices.count() // materialize before freeing the parent
      prev.unpersist(blocking = false)
    }

    // log-normal CDF normalization — same two-pass arithmetic as the
    // DataFrame engine (LinkRankComputation.java:213-256).
    val logs = g.vertices.map { case (id, (score, _)) => (id, math.log(score)) }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mu = logs.map(_._2).fold(0.0)(_ + _) / n
    val sig0 = math.sqrt(logs.map(l => (l._2 - mu) * (l._2 - mu)).fold(0.0)(_ + _) / n)
    val sigma = if (sig0 == 0.0) 1e-10 else sig0

    val back = idMap.map(_.swap) // longId -> string
    val out = logs.join(back).map { case (_, (l, id)) => (id, l) }
      .toDF("id", "l")
      .select(col("id"),
        (MathFunctions.normalCdf(col("l"), lit(mu), lit(sigma)) * lit(scale)).as("score"))
    // logs is materialized (mu/sigma folds); the final graph can go now.
    g.unpersist(blocking = false)
    // `out` still reads logs AND idMap lazily — idMap in particular must
    // stay persisted until the caller's action completes: recomputing
    // zipWithUniqueId over a reshuffled distinct() could reassign ids
    // and silently mis-join scores to urls. Freed at the harness drain.
    graft.Checkpoints.deferCleanup(spark) { () =>
      logs.unpersist(blocking = false)
      idMap.unpersist(blocking = false)
      ()
    }
    out
  }
}
