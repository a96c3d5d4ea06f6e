package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for expensive derived inputs shared by several
  * queries (cleaned edge set, minhash signatures, ...). One eager
  * materialization per (session, key).
  *
  * Entries are evicted when the session's SparkContext ends (listener
  * registered on first insert), and [[clear]] can be called explicitly
  * (tests, multi-session drivers) — so a long-lived driver that cycles
  * sessions does not accumulate dead entries.
  */
object SessionCache {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val hooked =
    scala.collection.concurrent.TrieMap.empty[SparkSession, Boolean]

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, key), {
      hooked.getOrElseUpdate(spark, {
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            clear(spark)
        })
        true
      })
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  /** Unpersist and drop every entry owned by `spark`, plus any deferred
    * per-query cleanups still pending for it. */
  def clear(spark: SparkSession): Unit = {
    memo.keys.filter(_._1 eq spark).foreach { k =>
      memo.remove(k).foreach { df =>
        try { df.unpersist(blocking = false); Checkpoints.free(df) }
        catch { case _: Throwable => () }
      }
    }
    hooked.remove(spark)
    try Checkpoints.drain(spark) catch { case _: Throwable => () }
  }
}
