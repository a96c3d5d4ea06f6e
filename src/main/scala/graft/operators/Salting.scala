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

  /** Skew-safe sum+count of `value` per `key`. Salt is derived from a
    * hash of the value column so it needs no extra state and stays
    * deterministic for a given row. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(xxhash64(value), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("psum"), count(lit(1)).as("pcnt"))
    partial.groupBy(col("key"))
      .agg(sum(col("psum")).as("sum"), sum(col("pcnt")).as("count"))
  }
}
