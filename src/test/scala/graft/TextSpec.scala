package graft

import graft.text.TextQueries
import org.apache.spark.sql.functions.col

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

  test("q46 repetition: a degenerate doc is flagged, ratios stay in [0,1]") {
    val rows = TextQueries.q46Repetition(spark, sfDir).collect()
    rows.foreach { r =>
      val d = r.getAs[Double]("dup_word_ratio")
      val t = r.getAs[Double]("top_bigram_frac")
      assert(d >= 0.0 && d <= 1.0 && t >= 0.0 && t <= 1.0, r)
      assert(r.getAs[Boolean]("flagged") ===
        (d > TextQueries.DupWordMax || t > TextQueries.TopBigramMax), r)
    }
    // a synthetic all-same-word doc must trip both rules
    import org.apache.spark.sql.functions._
    val sp2 = spark
    import sp2.implicits._
    val w = split(col("text"), " ")
    val deg = Seq((1L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
      .select(round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 6))
      .first().getDouble(0)
    assert(deg > TextQueries.DupWordMax)
  }

  test("q47 stratified sampling: en downsampled below others, deterministic") {
    val a = TextQueries.q47StratifiedSample(spark, sfDir).collect()
    val b = TextQueries.q47StratifiedSample(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq) // reproducible
    val total = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong).toMap
    val enRate = kept.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate < 0.25, s"en keep rate $enRate should be ~0.10")
    (total.keySet - "en").foreach { l =>
      val r = kept.getOrElse(l, 0L).toDouble / total(l)
      assert(r > 0.25 && r < 0.75, s"$l keep rate $r should be ~0.50")
    }
  }

  test("q48 tf-idf: contiguous ranks, non-increasing scores, rare terms outrank ubiquitous ones") {
    val rows = TextQueries.q48Tfidf(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size === nDocs) // every doc has at least one term
    byDoc.foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= TextQueries.TfidfTopK)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("tfidf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // a term in EVERY document has idf = ln((N+1)/(N+1)) = 0 — it can
    // never beat a term that skips even one doc; top terms are rarer
    val facade = Graft.tfidfTopTerms(
      spark.read.parquet(s"$sfDir/documents.parquet"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).sorted
    val fixture = rows
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3))).sorted
    assert(facade.toSeq === fixture.toSeq) // facade ≡ driver fixture
  }

  test("q67 histogram quantile sketch: error bounded by the bin width") {
    val rows = TextQueries.q67HistQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getString(0)
      Seq("err_p50", "err_p90", "err_p99").foreach { c =>
        val err = r.getAs[Double](c)
        // estimate and exact rank value sit in the same or adjacent
        // bins → |err| ≤ 2·HistBin by construction, any input
        assert(err >= 0.0 && err <= 2.0 * TextQueries.HistBin, s"$lang $c = $err")
      }
      // estimates are ordered like the percentiles they estimate
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90"))
      assert(r.getAs[Double]("est_p90") <= r.getAs[Double]("est_p99"))
    }
  }

  test("q83 HLL estimate lands within the sketch's error envelope") {
    val rows = TextQueries.q83Hll(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_est")
      val exact = r.getAs[Long]("n_exact")
      assert(est > 0.0)
      // p=9 ⇒ σ ≈ 1.04/√512 ≈ 4.6%; 0.2 is > 4σ, and the linear-
      // counting branch (small corpora) is tighter still
      assert(r.getAs[Double]("rel_err") <= 0.2, s"est $est vs exact $exact")
      assert(r.getAs[Long]("v_zero") >= 0 && r.getAs[Long]("v_zero") <= TextQueries.HllM)
    }
  }

  test("q84 split partitions the corpus near the 90/5/5 contract") {
    val rows = TextQueries.q84Split(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total, "splits partition")
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(Set("train") ++ bySplit.keySet subsetOf Set("train", "valid", "test"))
    // corpus-level train share: binomial(total, .9) stays inside
    // [0.75, 0.99] far beyond any plausible fixture size
    val trainFrac = bySplit("train").toDouble / total
    assert(trainFrac > 0.75 && trainFrac < 0.99, s"train frac $trainFrac")
    rows.foreach { r =>
      val f = r.getAs[Double]("lang_frac")
      assert(f > 0.0 && f <= 1.0)
    }
  }

  test("q90 PMI equals a driver-side recompute over the pinned vocab") {
    val rows = TextQueries.q90Pmi(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet).toMap
    val df = docs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .take(TextQueries.PmiVocab).toMap
    val n = docs.size
    val pairCounts = docs.values.toSeq.flatMap { ts =>
      val vs = ts.filter(vocab.contains).toSeq.sorted
      for (i <- vs.indices; j <- (i + 1) until vs.length) yield (vs(i), vs(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= TextQueries.PmiMinSupport).toMap
    val scored = pairCounts.toSeq.map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c.toDouble * n / (vocab(a).toDouble * vocab(b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, pmi)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(TextQueries.PmiTopK)
    assert(rows.length === scored.length)
    rows.zip(scored).foreach { case (r, (a, b, c, pmi)) =>
      assert((r.getString(1), r.getString(2), r.getLong(3)) === ((a, b, c.toLong)),
        s"rank ${r.getInt(0)}")
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-9, s"$a/$b pmi")
    }
  }

  test("q92 postings equal a driver-side inverted-index build") {
    val rows = text.TextQueries.q92Postings(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (term, xs) => (term, id, xs.length.toLong) }
    }
    val byTerm = tf.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byTerm.keySet)
    rows.foreach { r =>
      val (term, df, total, head) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
      val posts = byTerm(term)
      assert(df === posts.length.toLong, s"$term df")
      assert(total === posts.map(_._3).sum, s"$term total_tf")
      val wantHead = posts.sortBy(p => (-p._3, p._2))
        .take(text.TextQueries.PostTopK)
        .map(p => s"${p._2}:${p._3}").mkString(",")
      assert(head === wantHead, s"$term postings head")
    }
  }

  test("q94 MAD outlier screen survives contamination that poisons the z-score") {
    val rows = text.TextQueries.q94Mad(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLang = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    def quantileCont(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val idx = (s.length - 1) * q
      val lo = idx.toInt
      if (lo + 1 >= s.length) s(lo)
      else s(lo) + (idx - lo) * (s(lo + 1) - s(lo))
    }
    rows.foreach { r =>
      val lang = r.getString(0)
      val xs = byLang(lang).map(_._2.toDouble).toSeq
      val med = quantileCont(xs, 0.5)
      val mad = quantileCont(xs.map(x => math.abs(x - med)), 0.5)
      assert(math.abs(r.getDouble(2) - med) < 1e-6, s"$lang median")
      assert(math.abs(r.getDouble(3) - mad) < 1e-6, s"$lang mad")
      val n = xs.count(x => math.abs(x - med) > text.TextQueries.MadZ * 1.4826 * mad)
      assert(r.getLong(4) === n.toLong, s"$lang outliers")
    }
    // robustness: contaminate one language's lengths with 10x whales in
    // the driver — the median/MAD cutoff still isolates them, while the
    // mean/stdev z-score cutoff (q63's shape) lets them drag sigma up
    val base = byLang(rows.head.getString(0)).map(_._2.toDouble).toSeq
    val contaminated = base ++ Seq.fill(math.max(2, base.size / 20))(
      base.max * 10.0)
    val med = quantileCont(contaminated, 0.5)
    val mad = quantileCont(contaminated.map(x => math.abs(x - med)), 0.5)
    val robustCaught = contaminated.count(x =>
      math.abs(x - med) > text.TextQueries.MadZ * 1.4826 * mad)
    val mean = contaminated.sum / contaminated.size
    val sd = math.sqrt(contaminated.map(x => (x - mean) * (x - mean)).sum /
      contaminated.size)
    val zCaught = contaminated.count(x => math.abs(x - mean) > 3 * sd)
    assert(robustCaught >= contaminated.size / 20, "MAD catches the whales")
    assert(robustCaught >= zCaught, "robust screen >= z screen under contamination")
  }

  test("q88 mixture weights respect the epoch cap and shares sum to 1") {
    val rows = TextQueries.q88Mixture(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val mixSum = rows.map(_.getAs[Double]("mix_share")).sum
    assert(math.abs(mixSum - 1.0) < 1e-4, s"mix shares sum to $mixSum")
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val nat = r.getAs[Double]("nat_share")
      assert(w > 0.0 && w <= TextQueries.MixtureMaxWeight)
      // an under-represented source is up-weighted, never down
      if (nat < 1.0 / rows.length) assert(w >= 1.0, s"${r.getString(0)}: $w")
      assert(math.abs(r.getAs[Double]("eff_tokens") -
        r.getAs[Long]("n_tokens") * w) <= 0.5 + 1e-6 * r.getAs[Long]("n_tokens"))
    }
  }
}
