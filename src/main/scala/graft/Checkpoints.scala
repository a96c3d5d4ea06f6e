package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle management for `localCheckpoint` blocks and per-query
  * caches.
  *
  * `Dataset.localCheckpoint()` materializes the plan into block-manager
  * storage but never frees it — across an iterative loop (9 rank
  * updates, 8 label-propagation rounds) every iteration's blocks pile
  * up until the session dies, and a 32-query bench session drags ~40
  * orphaned block sets behind it (measured: q11 went 1.8s isolated →
  * 56s inside the r2 bench). Two remedies here:
  *
  *  - [[rotate]]: checkpoint the next iteration, then unpersist the
  *    predecessor's RDD — the loop holds exactly one live block set
  *    (same pattern as GraphXLinkRank's prev.unpersist).
  *  - [[deferFree]]/[[deferUnpersist]]: a returned lazy DataFrame may
  *    still read a checkpoint/cache, so its blocks can only be freed
  *    after the caller's action completes. Queries register the
  *    cleanup; the harness (Bench/Verify) calls [[drain]] between
  *    queries.
  */
object Checkpoints {

  private val pending =
    scala.collection.concurrent.TrieMap.empty[SparkSession, java.util.Queue[() => Unit]]

  /** Checkpoint `next` eagerly, then free the predecessor iteration's
    * checkpoint blocks. Returns the new checkpoint. */
  def rotate(next: DataFrame, prev: DataFrame): DataFrame = {
    val cp = next.localCheckpoint()
    free(prev)
    cp
  }

  /** Unpersist the RDD behind an eagerly localCheckpoint'ed frame
    * (no-op for plans that are not a materialized LogicalRDD). */
  def free(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }

  private def defer(spark: SparkSession)(f: () => Unit): Unit =
    pending.getOrElseUpdate(spark, new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]())
      .add(f)

  /** Free this checkpoint's blocks at the next [[drain]] (the caller's
    * pending action still reads them). Returns `df` for chaining. */
  def deferFree(df: DataFrame): DataFrame = { defer(df.sparkSession)(() => free(df)); df }

  /** Unpersist this cached frame at the next [[drain]]. */
  def deferUnpersist(df: DataFrame): DataFrame = {
    defer(df.sparkSession)(() => { df.unpersist(blocking = false); () }); df
  }

  /** Run an arbitrary cleanup at the next [[drain]] — for resources the
    * DataFrame helpers can't reach (persisted RDDs, GraphX graphs). */
  def deferCleanup(spark: SparkSession)(f: () => Unit): Unit = defer(spark)(f)

  /** Run every deferred cleanup registered for `spark`. Harness calls
    * this after each query's action completes. */
  def drain(spark: SparkSession): Unit =
    pending.remove(spark).foreach { q =>
      var f = q.poll()
      while (f != null) {
        try f() catch { case _: Throwable => () }
        f = q.poll()
      }
    }
}
