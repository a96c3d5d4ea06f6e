package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.text.FeatureQueries

/** Wave-38 operators (q199–q202): chi² feature selection, naive Bayes
  * language classification, hashing-trick featurizer census, n-gram
  * novelty scoring. Each is replayed independently on the driver.
  */
class W38OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private lazy val docs: Array[(Long, String, Array[String])] =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))

  test("q199 chi² matches a driver-side contingency replay") {
    val rows = FeatureQueries.q199Chi2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val langs = docs.map(_._2).distinct
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq === langs.sorted.toSeq)
    val n = docs.length.toLong
    val nLang = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val present = docs.flatMap { case (id, l, ts) => ts.distinct.map(t => (t, l, id)) }
    val byTermLang = present.groupBy(p => (p._1, p._2)).map { case (k, xs) => k -> xs.length.toLong }
    val byTerm = present.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    rows.foreach { r =>
      val (lang, term) = (r.getString(0), r.getString(2))
      val a = byTermLang((term, lang))
      assert(r.getLong(3) === a, s"df_in_class $lang/$term")
      assert(r.getLong(4) === byTerm(term), s"df_total $term")
      val b = byTerm(term) - a
      val c = nLang(lang) - a
      val d = n - nLang(lang) - b
      val diff = (a * d - b * c).toDouble
      val chi2 = n.toDouble * diff * diff /
        (((a + b) * (c + d)).toDouble * ((a + c) * (b + d)).toDouble)
      assert(math.abs(r.getDouble(5) - chi2) < 1e-5, s"chi2 $lang/$term")
    }
    // per-lang ranks are 1..K and chi2 is non-increasing within a lang
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).toSeq === (1 to rs.length))
      val vals = rs.sortBy(_.getInt(1)).map(_.getDouble(5))
      assert(vals.zip(vals.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q200 naive Bayes confusion matrix matches a driver-side train+score replay") {
    val rows = FeatureQueries.q200NbLangid(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tok = docs.flatMap { case (id, l, ts) => ts.map(t => (id, l, t)) }
    val counts = tok.groupBy(x => (x._2, x._3)).map { case (k, xs) => k -> xs.length.toLong }
    val classTotals = counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val vocab = tok.map(_._3).distinct
    val v = vocab.length.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val logLik = (for { t <- vocab; l <- classTotals.keys } yield
      (t, l) -> r6(math.log((counts.getOrElse((l, t), 0L) + 1).toDouble /
        (classTotals(l) + v).toDouble))).toMap
    val nDocs = docs.length
    val priors = docs.groupBy(_._2).map { case (l, xs) =>
      l -> r6(math.log(xs.length.toDouble / nDocs)) }
    val predicted = docs.map { case (_, trueLang, ts) =>
      val tf = ts.groupBy(identity).map { case (t, xs) => t -> xs.length }
      val scored = classTotals.keys.toSeq.map { l =>
        l -> (tf.map { case (t, f) => logLik((t, l)) * f }.sum + priors(l))
      }
      val best = scored.minBy { case (l, s) => (-s, l) }(
        Ordering.Tuple2(Ordering[BigDecimal], Ordering[String]))
      (trueLang, best._1)
    }
    val confusion = predicted.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet === confusion.keySet)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === confusion(key), s"confusion $key")
      val nLang = docs.count(_._2 == r.getString(0))
      assert(math.abs(r.getDouble(3) - confusion(key).toDouble / nLang) < 1e-6)
    }
    // shares per true class sum to 1
    rows.groupBy(_.getString(0)).foreach { case (l, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4, s"shares $l")
    }
  }

  test("q200 model and scoring joins broadcast the model side") {
    val plan = formatted(FeatureQueries.q200NbLangid(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "grid/priors broadcast")
    assert(!plan.contains("CartesianProduct"),
      "scalar attaches must broadcast, never cartesian")
  }

  test("q201 hashing-trick census is exact-integer and collision-consistent") {
    val rows = FeatureQueries.q201FeatureHash(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= FeatureQueries.HashDim)
    def h32(s: String, off: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(off - 1, off - 1 + 8), 16)
    }
    val tok = docs.flatMap { case (id, _, ts) => ts.map(t => (id, t)) }
    val hashed = tok.map { case (id, t) =>
      (id, t, h32(t, 1) % FeatureQueries.HashDim, 1L - 2L * (h32(t, 9) % 2L)) }
    val perDoc = hashed.groupBy(x => (x._1, x._3))
      .map { case (k, xs) => k -> (xs.map(_._4).sum, xs.length.toLong) }
    val census = perDoc.groupBy(_._1._2).map { case (b, m) =>
      b -> (m.size.toLong, m.values.map(_._2).sum, m.values.map(_._1).sum,
        m.values.map(v => v._1 * v._1).sum) }
    val termsPerBucket = hashed.map(x => (x._3, x._2)).distinct.groupBy(_._1)
      .map { case (b, xs) => b -> xs.length.toLong }
    assert(rows.map(_.getLong(0)).toSet === census.keySet)
    rows.foreach { r =>
      val b = r.getLong(0)
      val (nd, ntok, mass, energy) = census(b)
      assert(r.getLong(1) === termsPerBucket(b), s"n_terms bucket $b")
      assert(r.getLong(2) === nd && r.getLong(3) === ntok)
      assert(r.getLong(4) === mass && r.getLong(5) === energy)
    }
    // conservation: total tokens across buckets equals the corpus token count
    assert(rows.map(_.getLong(3)).sum === tok.length.toLong)
  }

  test("q202 novelty replays gram-wise and is monotone-sane") {
    val rows = FeatureQueries.q202Novelty(spark, sfDir).collect()
    assert(rows.length === docs.length, "one row per document")
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val grams = docs.flatMap { case (id, _, ts) =>
      val sh = if (ts.length >= 3) ts.sliding(3).map(_.mkString(" ")).toSeq
               else Seq(ts.mkString(" "))
      sh.map(h32).distinct.map(g => (id, g))
    }
    val firstSeen = grams.groupBy(_._2).map { case (g, xs) => g -> xs.map(_._1).min }
    val expect = grams.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.length.toLong, xs.count(x => firstSeen(x._2) == id).toLong) }
    rows.foreach { r =>
      val (ng, nn) = expect(r.getLong(0))
      assert(r.getLong(1) === ng, s"n_grams doc ${r.getLong(0)}")
      assert(r.getLong(2) === nn, s"n_novel doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - nn.toDouble / ng) < 1e-6)
    }
    // the first document is fully novel by construction
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) === 1.0)
  }

  test("q199/q201/q202 keep map-side partial aggregation and never cartesian-join") {
    Seq(
      FeatureQueries.q199Chi2(spark, sfDir),
      FeatureQueries.q201FeatureHash(spark, sfDir),
      FeatureQueries.q202Novelty(spark, sfDir)
    ).foreach { df =>
      val plan = formatted(df)
      assert(plan.contains("partial_"), "partial aggregation present")
      assert(!plan.contains("CartesianProduct"))
    }
  }
}
