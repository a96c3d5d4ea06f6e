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

  // --------------------------------------------------------------- q141
  /** Crawl-hygiene report per source host — the operational profile of
    * what q04's removeDuplicateLinks actually cleans (the reference's
    * LinkRankComputation.java:304-340 effects, AGGREGATED): per host,
    * raw out-link volume, links carrying a '#fragment', links with
    * un-trimmed whitespace, case-insensitive self-links, duplicate
    * targets after cleaning, and the surviving cleaned count. The
    * numbers a crawl operator reads to decide which hosts emit dirty
    * markup — and an always-on reconciliation of raw vs cleaned edge
    * volume (kept + self + dups = raw, per host).
    *
    * Shape for 100 TB: two partial-agged aggregations over the raw
    * edge scan (defect flags are per-row codegen'd string predicates)
    * joined on the O(hosts) frame. */
  def q141LinkHygiene(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = WebGraph.rawEdges(spark, sfDir)
    val host = lower(urlHost(trim(col("src"))))
    val cleanedDst = substring_index(trim(col("dst")), "#", 1)
    val flags = raw.select(
      host.as("host"),
      col("dst"),
      when(col("dst").contains("#"), 1L).otherwise(0L).as("frag"),
      when(col("dst") =!= trim(col("dst")), 1L).otherwise(0L).as("ws"),
      when(lower(cleanedDst) === lower(trim(col("src"))), 1L).otherwise(0L)
        .as("self"),
      trim(col("src")).as("csrc"), cleanedDst.as("cdst"))
    val perHost = flags.groupBy(col("host"))
      .agg(count(lit(1)).as("n_raw"), sum(col("frag")).as("n_fragment"),
        sum(col("ws")).as("n_whitespace"), sum(col("self")).as("n_self"))
    val kept = flags.filter(col("self") === 0)
      .select(col("host"), col("csrc"), col("cdst")).distinct()
      .groupBy(col("host")).agg(count(lit(1)).as("n_kept"))
    perHost.join(kept, Seq("host"), "left")
      .select(col("host"), col("n_raw"), col("n_fragment"), col("n_whitespace"),
        col("n_self"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_raw") - col("n_self") - coalesce(col("n_kept"), lit(0L)))
          .as("n_dup_dropped"))
      .orderBy(col("host"))
  }

  val q141Sql: String =
    s"""WITH ${Sql.rawEdgesCte},
flags AS (
  SELECT lower(${Sql.urlHost("trim(src)")}) AS host, dst,
    (CASE WHEN contains(dst, '#') THEN 1 ELSE 0 END) AS frag,
    (CASE WHEN dst <> trim(dst) THEN 1 ELSE 0 END) AS ws,
    (CASE WHEN lower(split_part(trim(dst), '#', 1)) = lower(trim(src))
          THEN 1 ELSE 0 END) AS self,
    trim(src) AS csrc, split_part(trim(dst), '#', 1) AS cdst
  FROM raw_edges),
per_host AS (
  SELECT host, count(*) AS n_raw, CAST(sum(frag) AS BIGINT) AS n_fragment,
    CAST(sum(ws) AS BIGINT) AS n_whitespace, CAST(sum(self) AS BIGINT) AS n_self
  FROM flags GROUP BY host),
kept AS (
  SELECT host, count(*) AS n_kept FROM (
    SELECT DISTINCT host, csrc, cdst FROM flags WHERE self = 0)
  GROUP BY host)
SELECT p.host, n_raw, n_fragment, n_whitespace, n_self,
  coalesce(n_kept, 0) AS n_kept,
  (n_raw - n_self - coalesce(n_kept, 0)) AS n_dup_dropped
FROM per_host p LEFT JOIN kept ON p.host = kept.host
ORDER BY p.host"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_link_hygiene" -> q141LinkHygiene,
    "q04_edge_dedup" -> q04EdgeDedup,
    "q05_url_filter" -> q05UrlFilter,
    "q06_url_reverse" -> q06UrlReverse)

  val oracles: Map[String, String] = Map(
    "q141_link_hygiene" -> q141Sql,
    "q04_edge_dedup" -> q04Sql,
    "q05_url_filter" -> q05Sql,
    "q06_url_reverse" -> q06Sql)
}
