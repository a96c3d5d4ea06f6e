package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see TESTDATA.md). All readers are plain parquet scans so column
  * pruning + predicate pushdown reach the file level.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The event log, with `ts` ALWAYS a nanosecond-epoch bigint.
    *
    * The generator has shipped `ts` two ways: TIMESTAMP(NANOS) parquet
    * (read as a ns bigint via nanosAsLong — Spark's vectorized reader
    * has no nanos timestamp type) and, since r8, plain TIMESTAMP(µs)
    * (read as TIMESTAMP_NTZ). Normalizing the µs form to a ns bigint
    * here keeps every consumer and every DuckDB oracle identical
    * across both vintages: downstream `ts div 1000` yields epoch µs,
    * and DuckDB's `epoch_ns(ts)` (µs·1000 on TIMESTAMP input, exact ns
    * on TIMESTAMP_NS input) matches by construction. The cast runs
    * inside the scan projection — column pruning and pushdown on every
    * OTHER column are unaffected. Under the session's UTC time zone the
    * NTZ→LTZ cast is value-preserving. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn(
        "ts", (unix_micros(col("ts").cast(TimestampType)) * 1000L).cast(LongType))
    }
  }

  /** Raw, un-normalized events frame — the schema a file-stream source
    * over events.parquet must declare (q98/q111 readStream). */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
