package graft

import graft.text.TextQueries

/** Text-suite behavior at sf0.001: shapes, ranges, and internal
  * consistency (the value-level gate is the driver's DuckDB oracle).
  */
class TextSpec extends GraftSpec {

  test("q40 langid emits one verdict per doc with confidence in [0,1]") {
    val rows = TextQueries.q40LangId(spark, sfDir).collect()
    assert(rows.length === Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(Set("en", "es", "fr", "de", "und")(r.getAs[String]("detected")))
      val c = r.getAs[Double]("confidence")
      assert(c >= 0.0 && c <= 1.0)
    }
  }

  test("q41 quality is bounded and word stats are consistent") {
    val rows = TextQueries.q41Quality(spark, sfDir).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Int]("n_words") > 0)
      assert(r.getAs[Double]("avg_word_len") > 0)
    }
  }

  test("q42 token counts: regex tokens <= whitespace tokens on this corpus") {
    val rows = TextQueries.q42Tokens(spark, sfDir).collect()
    rows.foreach { r =>
      // the corpus is space-separated [a-z0-9]+ words, so the two agree
      assert(r.getAs[Int]("re_tokens") === r.getAs[Int]("ws_tokens"))
      assert(r.getAs[Long]("bpe_estimate") >= 1L)
    }
  }

  test("q43 winnowing: fingerprint count is positive and bounded by shingles") {
    val rows = TextQueries.q43Fingerprint(spark, sfDir).collect()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_fingerprints")
      assert(n >= 1)
      assert(r.getAs[Long]("min_fp") <= r.getAs[Long]("max_fp"))
    }
  }
}
