package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for hot aggregation keys: two-stage salted
  * aggregation. Stage 1 groups by (key, salt) so a hot key's rows
  * spread over `salts` reducers; stage 2 re-aggregates the partials by
  * key. Works for any algebraic aggregate (sum/count/min/max — here
  * sum+count, which also yields avg).
  *
  * AQE's skew-join splitting covers joins; this covers the groupBy
  * path where a single key would otherwise pin one reducer at 100 TB
  * (e.g. counting tokens per-language when 'en' is half the corpus).
  */
object Salting {

  /** Skew-safe sum+count of `value` per `key`. The salt hashes the
    * value TOGETHER WITH the source partition id: a hot key whose rows
    * all carry one repeated value (the common skew shape — counting a
    * constant token) would hash to a single salt bucket on value alone
    * and still pin one reducer; mixing in the partition id spreads such
    * rows across all `salts` buckets while staying deterministic within
    * a task attempt (re-executed partials re-aggregate identically in
    * stage 2 regardless of which bucket a row lands in). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(value, spark_partition_id()), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("psum"), count(lit(1)).as("pcnt"))
    partial.groupBy(col("key"))
      .agg(sum(col("psum")).as("sum"), sum(col("pcnt")).as("count"))
  }
}
