package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for expensive derived inputs shared by several
  * queries (cleaned edge set, minhash signatures, ...). One eager
  * materialization per (session, key); entries live for the session
  * (the driver runs one session per round — bounded by design).
  */
object SessionCache {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def cached(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, key), {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })
}
