package graft

import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline composition: the operators are
  * not just individually driver-verified — they chain. Dedup keeps
  * canonicals, repetition + quality gate the survivors, stratified
  * sampling mixes them; every stage shrinks the set and the whole
  * chain is deterministic.
  */
class PipelineSpec extends GraftSpec {

  test("dedup -> quality/repetition gate -> stratified sample composes deterministically") {
    import graft.dedup.DedupQueries
    import graft.text.TextQueries

    val canon = DedupQueries.q20DedupExact(spark, sfDir)
      .filter(!col("is_dup")).select(col("doc_id"))
    val clean = TextQueries.q46Repetition(spark, sfDir)
      .filter(!col("flagged")).select(col("doc_id"))
    val quality = TextQueries.q41Quality(spark, sfDir)
      .filter(col("quality") >= 0.3).select(col("doc_id"))
    val sampled = TextQueries.q47StratifiedSample(spark, sfDir)
      .select(col("doc_id"))

    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val kept = canon.join(clean, "doc_id").join(quality, "doc_id")
      .join(sampled, "doc_id")

    val n1 = kept.count()
    val n2 = kept.count() // deterministic: same plan, same answer
    assert(n1 === n2)
    assert(n1 > 0L, "pipeline should keep a non-trivial survivor set")
    assert(n1 < total, "every stage should prune something")

    // survivors carry coherent per-doc stats across operators
    val enriched = kept
      .join(TextQueries.q42Tokens(spark, sfDir), "doc_id")
      .join(TextQueries.q40LangId(spark, sfDir), "doc_id")
    assert(enriched.count() === n1) // 1:1 joins, nothing lost
    assert(enriched.filter(col("ws_tokens") <= 0).isEmpty)
  }
}
