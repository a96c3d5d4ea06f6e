package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{MathFunctions => MF}
import graft.oracle.Sql

/** Multimodal plumbing (SURVEY §2.F q60): treat assets as opaque
  * `binary` payloads with a typed metadata struct, and run a decode /
  * feature-extract stage over them.
  *
  * The real decode (image/audio libs) is STUBBED — `stubDecode` below
  * derives deterministic pseudo-features from the payload bytes. The
  * Spark-side plumbing is real: a BinaryType column, a metadata struct
  * column, per-format partitioning, and a per-row feature stage that
  * would become a Pandas UDF / mapInPandas batch stage in a Python
  * deployment (or an mapPartitions JNI decoder in Scala). Swapping
  * `stubDecode` for a real decoder changes no schema and no plan shape.
  */
object MultimodalQueries {

  /** Deterministic fake "decode": byte length, lead byte, a hash-based
    * feature, and a fake channel count. Placeholder for a real codec.
    * n_bytes counts UTF-8 BYTES of the binary payload (length() on
    * BinaryType) — the oracle twin uses octet_length(encode(text)) so
    * both engines count the same unit on non-ASCII documents too. */
  private def stubDecode(df: DataFrame): DataFrame = df
    .withColumn("n_bytes", length(col("payload")))
    .withColumn("lead_byte", ascii(substring(col("text"), 1, 1)))
    .withColumn("feature_hash", MF.hash32(col("text")))
    .withColumn("channels", (pmod(col("doc_id"), lit(2)) + 1).cast("int"))

  def q60Multimodal(spark: SparkSession, sfDir: String): DataFrame = {
    val assets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        col("text").cast("binary").as("payload"),
        struct(
          col("source").as("origin"),
          when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
            .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
            .otherwise(lit("video/mp4")).as("mime"),
          col("n_chars").as("raw_len")).as("meta"))
      // co-locate same-mime assets so a real batch decoder sees
      // homogeneous partitions (the shuffle a decode stage wants)
      .repartition(col("meta.mime"))
    stubDecode(assets)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.origin").as("origin"), col("n_bytes"),
        col("lead_byte"), col("channels"), col("feature_hash"))
      .orderBy(col("doc_id"))
  }

  val q60Sql: String =
    s"""SELECT doc_id,
  (CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        WHEN doc_id % 3 = 1 THEN 'audio/wav'
        ELSE 'video/mp4' END) AS mime,
  source AS origin,
  octet_length(encode(text)) AS n_bytes,
  ascii(substr(text, 1, 1)) AS lead_byte,
  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
  ${Sql.hash32("text")} AS feature_hash
FROM documents ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_multimodal" -> q60Multimodal)

  val oracles: Map[String, String] = Map(
    "q60_multimodal" -> q60Sql)
}
