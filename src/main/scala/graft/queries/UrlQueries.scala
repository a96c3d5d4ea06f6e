package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.WebGraph
import graft.functions.UrlFunctions._
import graft.oracle.Sql

/** URL layer (SURVEY §2.A q04–q06): removeDuplicateLinks, isValidURL
  * filters, and the NutchUtil reverse/unreverse family — all built-in
  * Column expressions (regexp/split/array ops, whole-stage codegen).
  */
object UrlQueries {

  // ---------------------------------------------------------------- q04
  /** Edge cleanup: trim, strip #fragment, drop self-links, distinct
    * (LinkRankComputation.java:304-340). Output = cleaned edge list. */
  def q04EdgeDedup(spark: SparkSession, sfDir: String): DataFrame =
    WebGraph.cachedEdges(spark, sfDir).orderBy(col("src"), col("dst"))

  val q04Sql: String =
    s"""WITH ${Sql.rawEdgesCte},
${Sql.edgesCte}
SELECT src, dst FROM edges ORDER BY src, dst"""

  // ---------------------------------------------------------------- q05
  /** isValidURL vertex/edge filter (NutchUtil.java:203-217,
    * LinkRankVertexFilter / LinkRankEdgeFilter): a deterministically
    * corrupted URL set — schemeless for pk%13=0, dotless host for
    * pk%17=0 — with the validity verdict per URL. */
  def q05UrlFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = col("p_partkey")
    val url = when(pmod(pk, lit(13)) === 0,
        concat(lit("part"), pmod(pk, lit(WebGraph.Hosts)).cast("string"),
          lit(".example.com/p"), pk.cast("string")))
      .when(pmod(pk, lit(17)) === 0,
        concat(lit("http://localhost/p"), pk.cast("string")))
      .otherwise(WebGraph.urlOf(pk))
    Tables.part(spark, sfDir)
      .select(url.as("url"))
      .withColumn("valid", isValidUrl(col("url")))
      .orderBy(col("url"))
  }

  val q05Sql: String =
    s"""WITH u AS (
       |  SELECT (CASE
       |    WHEN p_partkey % 13 = 0 THEN 'part' || (p_partkey % ${WebGraph.Hosts}) || '.example.com/p' || p_partkey
       |    WHEN p_partkey % 17 = 0 THEN 'http://localhost/p' || p_partkey
       |    ELSE ${Sql.urlOf("p_partkey")} END) AS url
       |  FROM part)
       |SELECT url, ${Sql.isValidUrl("url")} AS valid FROM u ORDER BY url""".stripMargin

  // ---------------------------------------------------------------- q06
  /** reverseUrl / reverseHost / getReversedHost / unreverse roundtrip
    * (NutchUtil.java:55-184) over URLs with port and query variants. */
  def q06UrlReverse(spark: SparkSession, sfDir: String): DataFrame = {
    val pk = col("p_partkey")
    val url = concat(
      lit("http://part"), pmod(pk, lit(WebGraph.Hosts)).cast("string"), lit(".example.com"),
      when(pmod(pk, lit(7)) === 0, lit(":8080")).otherwise(lit("")),
      lit("/p"), pk.cast("string"),
      when(pmod(pk, lit(11)) === 0, concat(lit("?ref="), pk.cast("string"))).otherwise(lit("")))
    Tables.part(spark, sfDir)
      .select(url.as("url"))
      .select(col("url"),
        reverseUrl(col("url")).as("rev"),
        reverseHost(urlHost(col("url"))).as("rhost"))
      .withColumn("grhost", getReversedHost(col("rev")))
      .withColumn("back", unreverseUrl(col("rev")))
      .withColumn("roundtrip_ok", col("back") === col("url"))
      .orderBy(col("url"))
  }

  val q06Sql: String =
    s"""WITH u AS (
       |  SELECT ('http://part' || (p_partkey % ${WebGraph.Hosts}) || '.example.com'
       |    || (CASE WHEN p_partkey % 7 = 0 THEN ':8080' ELSE '' END)
       |    || '/p' || p_partkey
       |    || (CASE WHEN p_partkey % 11 = 0 THEN '?ref=' || p_partkey ELSE '' END)) AS url
       |  FROM part),
       |r AS (
       |  SELECT url, ${Sql.reverseUrl("url")} AS rev,
       |    ${Sql.reverseHost(Sql.urlHost("url"))} AS rhost
       |  FROM u)
       |SELECT url, rev, rhost,
       |  ${Sql.getReversedHost("rev")} AS grhost,
       |  ${Sql.unreverseUrl("rev")} AS back,
       |  (${Sql.unreverseUrl("rev")} = url) AS roundtrip_ok
       |FROM r ORDER BY url""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q04_edge_dedup" -> q04EdgeDedup,
    "q05_url_filter" -> q05UrlFilter,
    "q06_url_reverse" -> q06UrlReverse)

  val oracles: Map[String, String] = Map(
    "q04_edge_dedup" -> q04Sql,
    "q05_url_filter" -> q05Sql,
    "q06_url_reverse" -> q06Sql)
}
