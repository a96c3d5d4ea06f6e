package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing), shuffle partitions sized for the local
  * harness (on a real cluster this is overridden per-job), UTC
  * session time zone so timestamp arithmetic matches the DuckDB
  * oracle.
  */
object GraftSession {

  /** Apply graft defaults to an existing builder. */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    // native graft expressions (graft_erf, …) available from SQL
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    // parquet pushdown is on by default; pin it so a cluster-side
    // override can't silently disable the scan-level filters
    .config("spark.sql.parquet.filterPushdown", "true")
    // older testdata vintages carry TIMESTAMP(NANOS) in events.parquet,
    // which Spark's vectorized reader refuses; read those as a
    // nanosecond bigint (harmless no-op on the current µs TIMESTAMP
    // vintage — Tables.events normalizes both to a ns bigint)
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // saveAsTable (bucketed tables, q18) must never litter the repo cwd
    // with a spark-warehouse/ dir — keep catalog storage in tmp
    .config("spark.sql.warehouse.dir",
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft_warehouse").toString)

  def local(cores: Int = 4, shufflePartitions: Int = 32): SparkSession = {
    val spark = tune(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
