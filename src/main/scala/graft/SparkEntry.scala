package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_linkrank")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ MlEvalQueries.queries ++
      TimeseriesQueries.queries ++ StreamBatchQueries.queries ++
      WindowQueries.queries ++ StorageQueries.queries ++
      TpchQueries.queries ++
      PartsuppQueries.queries ++ UrlQueries.queries ++
      GraphQueries.queries ++ SpectralQueries.queries ++
      graft.dedup.DedupQueries.queries ++ graft.ann.AnnQueries.queries ++
      graft.text.TextQueries.queries ++ graft.text.FeatureQueries.queries ++
      graft.text.PipelineQueries.queries ++
      graft.multimodal.MultimodalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MlEvalQueries.oracles ++
      TimeseriesQueries.oracles ++ StreamBatchQueries.oracles ++
      WindowQueries.oracles ++ StorageQueries.oracles ++
      TpchQueries.oracles ++
      PartsuppQueries.oracles ++ UrlQueries.oracles ++
      GraphQueries.oracles ++ SpectralQueries.oracles ++
      graft.dedup.DedupQueries.oracles ++ graft.ann.AnnQueries.oracles ++
      graft.text.TextQueries.oracles ++ graft.text.FeatureQueries.oracles ++
      graft.text.PipelineQueries.oracles ++
      graft.multimodal.MultimodalQueries.oracles
}
