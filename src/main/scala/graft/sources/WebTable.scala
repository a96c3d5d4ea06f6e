package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions

/** Columnar model of the reference's Nutch2 webpage/host tables
  * (Nutch2WebpageInputFormat / Nutch2WebpageOutputFormat /
  * Nutch2HostInputFormat — HBase-backed there, parquet here with the
  * same logical schema):
  *
  *   key       string  — reversed url (`com.example.www:http/path`),
  *                       the reference's HBase row key, so range scans
  *                       within a domain stay contiguous
  *   url       string  — the plain url
  *   score     double  — rank score (written back by LinkRank)
  *   outlinks  array<string> — outgoing link targets
  *   inlinks   array<string> — incoming link sources
  *   metadata  map<string,string>
  *
  * Writing partitioned/sorted by `key` preserves the locality property
  * the reference gets from HBase (domain-contiguous storage) in
  * parquet's sorted row groups.
  */
object WebTable {

  /** Build a webpage table from an edge list and optional (id, score)
    * ranks. One groupBy per direction; scores joined in. */
  def fromEdges(edges: DataFrame, ranks: Option[DataFrame] = None): DataFrame = {
    val out = edges.groupBy(col("src").as("url"))
      .agg(collect_set(col("dst")).as("outlinks"))
    val in = edges.groupBy(col("dst").as("url"))
      .agg(collect_set(col("src")).as("inlinks"))
    val verts = graft.graph.WebGraph.vertices(edges)
      .withColumnRenamed("id", "url")
    val scored = ranks match {
      case Some(r) => verts.join(r.toDF("url", "score"), Seq("url"), "left")
        .select(col("url"), coalesce(col("score"), lit(0.0)).as("score"))
      case None => verts.withColumn("score", lit(0.0))
    }
    scored
      .join(out, Seq("url"), "left")
      .join(in, Seq("url"), "left")
      .select(
        UrlFunctions.reverseUrl(col("url")).as("key"),
        col("url"), col("score"),
        coalesce(col("outlinks"), array().cast("array<string>")).as("outlinks"),
        coalesce(col("inlinks"), array().cast("array<string>")).as("inlinks"),
        map(lit("fetchTime"), lit("0")).as("metadata"))
  }

  /** Edge list back out of a webpage table (outlinks exploded). */
  def toEdges(webTable: DataFrame): DataFrame =
    webTable.select(col("url").as("src"), explode(col("outlinks")).as("dst"))

  /** (id, score) vertex frame for rank input. */
  def toVertices(webTable: DataFrame): DataFrame =
    webTable.select(col("url").as("id"), col("score"))

  /** Parquet writer, domain-sorted like the reference's HBase layout. */
  def write(webTable: DataFrame, path: String): Unit =
    webTable.repartitionByRange(col("key")).sortWithinPartitions(col("key"))
      .write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
