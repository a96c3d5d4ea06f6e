package graft

import org.apache.spark.sql.functions._

/** Pins the compiled gram-hash kernel (plans/GramHash) bit-for-bit to
  * the composed formulation it replaced: ' '-joined word n-grams,
  * hlo = conv(substring(md5, 1, 8), 16, 10), hhi = hex chars 9-16.
  */
class GramHashSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._
  import graft.functions.{MathFunctions => MF}

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog again and again",
    "a b c d e",
    "short one",
    "", // splits to one empty word -> whole-text fallback
    "exactly five words right here now")

  test("kernel == composed md5 chain for every gram, every n") {
    for (n <- Seq(2, 5, 8)) {
      val df = docs.toDF("text")
      val kernel = df.select(
          explode(call_function("graft_gram_hashes", col("text"), lit(n))).as("gh"))
        .select(col("gh.hlo"), col("gh.hhi"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val toks = split(col("text"), " ")
      val composed = df.select(
          explode(when(size(toks) >= n,
            transform(sequence(lit(1), size(toks) - (n - 1)),
              i => array_join(slice(toks, i, lit(n)), " ")))
            .otherwise(array(col("text")))).as("g"))
        .select(MF.hash32(col("g")), MF.hash32b(col("g")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(kernel == composed, s"n=$n")
    }
  }

  test("gram count: m - n + 1 for long docs, 1 whole-text entry for short") {
    val df = Seq("one two three four five six").toDF("text")
    assert(df.select(size(call_function("graft_gram_hashes", col("text"), lit(4))))
      .first().getInt(0) == 3)
    assert(df.select(size(call_function("graft_gram_hashes", col("text"), lit(9))))
      .first().getInt(0) == 1)
  }
}
