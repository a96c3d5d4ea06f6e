package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text graph IO, modeling the reference's generic formats:
  *  - LinkRankVertexInputFormat: `id<tab|space>score`
  *  - LinkRankVertexUniformInputFormat: bare `id` → score 1.0 (NOT 1/N)
  *  - LinkRankEdgeInputFormat: `src<tab|space>dst`
  *  - LinkRankVertexOutputFormat: `id<tab>score`
  * Line-parallel text scans — each parses at the partition level with
  * codegen'd regex extraction, no driver involvement.
  */
object TextGraphIO {

  private val IdRe = "^([^\t ]+)"
  private val RestRe = "[\t ]+(.+)$"

  /** (id, score); missing score → uniform 1.0. */
  def readVertices(spark: SparkSession, path: String): DataFrame = {
    val sc = regexp_extract(col("value"), RestRe, 1)
    spark.read.text(path)
      .select(regexp_extract(col("value"), IdRe, 1).as("id"),
        when(sc === "", lit(1.0)).otherwise(sc.cast("double")).as("score"))
  }

  /** (src, dst). */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(regexp_extract(col("value"), IdRe, 1).as("src"),
        regexp_extract(col("value"), RestRe, 1).as("dst"))

  /** `id<tab>score` lines (LinkRankVertexOutputFormat). */
  def writeVertices(ranks: DataFrame, path: String): Unit =
    ranks.select(concat(col("id"), lit("\t"), col("score").cast("string")).as("value"))
      .write.mode("overwrite").text(path)
}
