package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupQueries
import graft.plans.JwMath

/** Wave-69: Jaro–Winkler fuzzy dictionary lookup (q308). The kernel is
  * pinned two ways: the published standard vectors, and a
  * formulation-independent recompute (matched-substring construction
  * instead of flag-array index walking) over every candidate pair the
  * fixture generates.
  */
class W69JwSpec extends GraftSpec {

  /** Independent JW: build the two matched-character STRINGS, count
    * positionwise mismatches — a different mechanism from the kernel's
    * boolean-flag walk. */
  private def jwRef(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val w = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val usedB = Array.fill(b.length)(false)
    val sbA = new StringBuilder
    for (i <- a.indices) {
      val hit = (math.max(0, i - w) to math.min(b.length - 1, i + w))
        .find(j => !usedB(j) && a(i) == b(j))
      hit.foreach { j => usedB(j) = true; sbA += a(i) }
    }
    val sbB = new StringBuilder
    for (j <- b.indices) if (usedB(j)) sbB += b(j)
    val m = sbA.length
    if (m == 0) return 0.0
    val mis = sbA.toString.zip(sbB.toString).count { case (x, y) => x != y }
    val j = (m.toDouble / a.length + m.toDouble / b.length +
      (m - mis / 2) / m.toDouble) / 3.0
    if (j > 0.7) {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j + l * 0.1 * (1.0 - j)
    } else j
  }

  test("JW kernel reproduces the published standard vectors") {
    def jw(a: String, b: String): Double = JwMath.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962963) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    // boost suppressed at jaro <= 0.7 (the DuckDB-probed threshold)
    assert(math.abs(jw("abcdefgh", "abzyxwvu") - 0.5) < 1e-12)
  }

  test("kernel equals the formulation-independent recompute on every fixture pair") {
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("v"))
      .filter(length(col("v")) >= 4).distinct().collect().map(_.getString(0))
    val noisy = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"),
        element_at(col("ts"), (pmod(col("doc_id"), size(col("ts"))) + 1).cast("int"))
          .as("tok"))
      .filter(length(col("tok")) >= 4)
      .collect().map { r =>
        val id = r.getLong(0); val t = r.getString(1)
        val p = (id % t.length).toInt
        t.substring(0, p) + (97 + (id * 7) % 26).toChar + t.substring(p + 1)
      }
    assert(vocab.nonEmpty && noisy.nonEmpty)
    var pairs = 0
    for (n <- noisy; v <- vocab if math.abs(n.length - v.length) <= DedupQueries.JwLenBand) {
      val k = JwMath.jaroWinkler(
        org.apache.spark.unsafe.types.UTF8String.fromString(n),
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      assert(k == jwRef(n, v), s"'$n' vs '$v'")
      pairs += 1
    }
    assert(pairs > 100, s"only $pairs candidate pairs — blocking too tight")
  }

  test("DL kernel: standard vectors, full-DL (not OSA), and metamorphic properties") {
    def dl(a: String, b: String): Long = graft.plans.DamerauMath.distance(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(dl("CA", "ABC") == 2, "full DL, not OSA (OSA would say 3)")
    assert(dl("kitten", "sitting") == 3)
    assert(dl("ab", "ba") == 1 && dl("teh", "the") == 1 && dl("abc", "acb") == 1)
    assert(dl("", "") == 0 && dl("abc", "") == 3 && dl("", "abcd") == 4)
    assert(dl("same", "same") == 0)
    // properties over the fixture vocabulary: symmetry, dl <= lev,
    // identity-of-indiscernibles, unit cost for one adjacent swap
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("v"))
      .filter(length(col("v")) >= 4).distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (a <- vocab; b <- vocab) {
      assert(dl(a, b) == dl(b, a))
      assert(dl(a, b) <= lev(a, b))
      assert((dl(a, b) == 0) == (a == b))
    }
    vocab.filter(_.length >= 5).take(10).foreach { v =>
      val sw = v.substring(0, 1) + v.charAt(2) + v.charAt(1) + v.substring(3)
      if (sw != v) assert(dl(v, sw) == 1, s"swap of '$v'")
    }
  }

  test("q309: argmin repair replay; swaps cost 1 under DL and 2 under Levenshtein") {
    val out = DedupQueries.q309DlLinkage(spark, sfDir).collect()
    assert(out.nonEmpty)
    // even doc_ids are adjacent-swap corruptions: when the swap changed
    // the token (dl>0), DL must beat Levenshtein (the flag is true)
    val evens = out.filter(r => r.getLong(0) % 2 == 0 && r.getLong(3) > 0)
    assert(evens.nonEmpty && evens.forall(r => r.getBoolean(5)),
      "every non-degenerate swap must be transposition-priced")
    // odd doc_ids are substitutions: dl == lev always
    out.filter(_.getLong(0) % 2 == 1).foreach { r =>
      assert(r.getLong(3) == r.getLong(4) && !r.getBoolean(5))
    }
    out.foreach(r => assert(r.getLong(3) <= DedupQueries.DlMax))
  }

  test("q308: every emitted repair is its doc's argmax over the candidate set") {
    val out = DedupQueries.q308JwLinkage(spark, sfDir).collect()
    assert(out.nonEmpty)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("v"))
      .filter(length(col("v")) >= 4).distinct().collect().map(_.getString(0))
    out.foreach { r =>
      val noisy = r.getString(1)
      val jw = r.getDouble(3)
      assert(jw >= DedupQueries.JwThreshold)
      val best = vocab
        .filter(v => math.abs(noisy.length - v.length) <= DedupQueries.JwLenBand)
        .map(v => (math.floor(jwRef(noisy, v) * 1e6 + 0.5) / 1e6, v))
        .filter(_._1 >= DedupQueries.JwThreshold)
        .sortBy { case (s, v) => (-s, v) }
      assert(best.nonEmpty && best.head._2 == r.getString(2) &&
        math.abs(best.head._1 - jw) < 1e-9,
        s"doc ${r.getLong(0)}: engine (${r.getString(2)}, $jw) vs ${best.headOption}")
    }
  }

  private def deletes(s: String, k: Int): Set[String] = {
    val arr = graft.plans.SymSpellMath.deletes(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), k)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString).toSet
  }

  test("SymSpell deletes kernel: exact small cases, sorted, self-inclusive") {
    assert(deletes("abc", 0) === Set("abc"))
    assert(deletes("abc", 1) === Set("abc", "ab", "ac", "bc"))
    assert(deletes("abc", 2) === Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    assert(deletes("aaa", 2) === Set("aaa", "aa", "a"), "duplicate variants collapse")
    assert(deletes("", 2) === Set(""))
    // deterministic ordering (the ArrayData is sorted)
    val a = graft.plans.SymSpellMath.deletes(
      org.apache.spark.unsafe.types.UTF8String.fromString("dcba"), 1)
    val seq = (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    assert(seq === seq.sorted)
  }

  test("SymSpell blocking covers EVERY unrestricted-DL<=2 pair (exhaustive, transpositions included)") {
    // exhaustive over a 2-letter alphabet, lengths 2..6 — transposition-
    // dense by construction, the adversarial regime for delete blocking
    def dl(a: String, b: String): Long = graft.plans.DamerauMath.distance(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val words = (2 to 6).flatMap { l =>
      (0 until (1 << l)).map(m =>
        (0 until l).map(i => if (((m >> i) & 1) == 1) 'b' else 'a').mkString)
    }
    var checked = 0
    for (x <- words; y <- words if x < y && math.abs(x.length - y.length) <= 1) {
      if (dl(x, y) <= DedupQueries.DlMax) {
        checked += 1
        assert((deletes(x, DedupQueries.DlMax) & deletes(y, DedupQueries.DlMax)).nonEmpty,
          s"blocking would miss ('$x','$y') at dl=${dl(x, y)}")
      }
    }
    assert(checked > 1000, s"exhaustive sweep too small: $checked pairs")
  }

  test("q308/q309 plans: equi-join blocking, zero BroadcastNestedLoopJoin") {
    Seq(DedupQueries.q308JwLinkage _, DedupQueries.q309DlLinkage _).foreach { q =>
      val df = q(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"linkage candidate generation must be an equi-join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"size-gated vocab should broadcast-hash-join at fixture scale:\n$plan")
    }
  }

  test("q309 blocked candidates equal the r10 full band scan (result replay)") {
    // the SymSpell rewrite must be RESULT-identical to the inequality-
    // join formulation it replaced — replay the r10 shape literally
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"),
        element_at(col("ts"), (pmod(col("doc_id"), size(col("ts"))) + 1).cast("int"))
          .as("tok"))
      .filter(length(col("tok")) >= 4)
    val noisy = toks.select(col("doc_id"), expr(
      """CASE WHEN doc_id % 2 = 0 THEN
        |  concat(substr(tok, 1, cast(doc_id % (length(tok)-1) as int)),
        |         substr(tok, cast(doc_id % (length(tok)-1) as int) + 2, 1),
        |         substr(tok, cast(doc_id % (length(tok)-1) as int) + 1, 1),
        |         substr(tok, cast(doc_id % (length(tok)-1) as int) + 3))
        |ELSE
        |  concat(substr(tok, 1, cast(doc_id % length(tok) as int)),
        |         chr(97 + cast((doc_id * 7) % 26 as int)),
        |         substr(tok, cast(doc_id % length(tok) as int) + 2))
        |END""".stripMargin).as("noisy"))
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), " ")).as("vtok"))
      .filter(length(col("vtok")) >= 4).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("dl"), col("vtok"))
    val full = noisy.join(broadcast(vocab),
        abs(length(col("noisy")) - length(col("vtok"))) <= 1)
      .withColumn("dl", expr("graft_damerau(noisy, vtok)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("dl") <= DedupQueries.DlMax)
      .select(col("doc_id"), col("noisy"), col("vtok"), col("dl"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val blocked = DedupQueries.q309DlLinkage(spark, sfDir)
      .select(col("doc_id"), col("noisy"), col("match_tok"), col("dl"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(blocked.sorted.toSeq === full.sorted.toSeq)
    assert(blocked.nonEmpty)
  }
}
