package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries
import graft.text.TextQueries

/** Wave-6 operators (q143–q145): CDC merge/upsert, class-balanced
  * sampling, RAKE keyword extraction.
  */
class W16OpsSpec extends GraftSpec {

  test("q143 merge: latest version wins, deletes tombstone, inserts land") {
    val rows = RelationalQueries.q143MergeUpsert(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val baseIds = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    baseIds.foreach { id =>
      if (id % 21 == 0) assert(!byId.contains(id), s"doc $id: delete must tombstone")
      else if (id % 9 == 0) {
        assert(byId(id).getString(2) === "U" && byId(id).getLong(1) === 1L,
          s"doc $id: update wins over base")
      } else assert(byId(id).getString(2) === "B" && byId(id).getLong(1) === 0L)
    }
    val inserts = rows.filter(_.getLong(0) >= RelationalQueries.MergeInsertOffset)
    assert(inserts.nonEmpty)
    inserts.foreach { r =>
      assert(r.getString(2) === "I")
      assert(baseIds.contains(r.getLong(0) - RelationalQueries.MergeInsertOffset))
    }
    // updated text gained the 7-char ' [rev2]' suffix
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.filter(_.getString(2) == "U").foreach { r =>
      assert(r.getInt(3) === lens(r.getLong(0)) + 7, s"doc ${r.getLong(0)} length")
    }
  }

  test("q144 balanced sample: every class downsamples to the smallest, by hash order") {
    val rows = TextQueries.q144BalancedSample(spark, sfDir).collect()
    val sizes = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = sizes.values.min
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet === sizes.keySet)
    byLang.foreach { case (lang, xs) =>
      assert(xs.length.toLong === cap, s"$lang kept != cap")
      assert(xs.map(_.getInt(1).toLong).sorted.toSeq === (1L to cap).toSeq)
      // kept rows are exactly the cap hash-smallest of the class
      val all = Tables.documents(spark, sfDir).filter(col("lang") === lang)
        .select(col("doc_id"),
          graft.functions.MathFunctions.hash32(col("doc_id").cast("string")).as("h"))
        .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(cap.toInt)
        .map(_._2).toSet
      assert(xs.map(_.getLong(2)).toSet === all, s"$lang selection")
    }
    // determinism
    val again = TextQueries.q144BalancedSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(again === rows.map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("q145 RAKE replays a driver-side extraction on sample documents") {
    val stops = Set("the", "and", "of", "to", "a", "in", "is")
    val rows = TextQueries.q145Rake(spark, sfDir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // corpus-wide word stats from ALL docs' phrases
    val allPhrases = texts.toSeq.flatMap { case (id, t) =>
      val toks = t.split(" ")
      val phrases = scala.collection.mutable.ListBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ListBuffer.empty[String]
      toks.foreach { w =>
        if (stops(w)) { if (cur.nonEmpty) { phrases += cur.toSeq; cur = scala.collection.mutable.ListBuffer.empty } }
        else cur += w
      }
      if (cur.nonEmpty) phrases += cur.toSeq
      phrases.map(id -> _)
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    allPhrases.foreach { case (_, p) =>
      p.foreach { w =>
        deg(w) = deg.getOrElse(w, 0L) + p.length
        freq(w) = freq.getOrElse(w, 0L) + 1L
      }
    }
    def score(p: Seq[String]): Double =
      p.map(w => BigDecimal(deg(w).toDouble / freq(w))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    byDoc.take(40).foreach { case (id, got) =>
      val mine = allPhrases.filter(_._1 == id).map(_._2)
        .map(p => (p.mkString(" "), p.length,
          BigDecimal(score(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (ph, _, s) => (-s, ph) }
        .take(TextQueries.RakeTopK)
      val gotSorted = got.sortBy(_.getInt(1))
        .map(r => (r.getString(2), r.getLong(3).toInt, r.getDouble(4)))
      assert(gotSorted.toSeq === mine, s"doc $id keyword ranking")
    }
  }
}
