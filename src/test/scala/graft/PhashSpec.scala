package graft

import org.apache.spark.sql.functions._
import graft.plans.PhashMath
import org.apache.spark.unsafe.types.UTF8String

/** Perceptual hash (aHash) kernel: pinned to the composed-builtins
  * twin, plus the two properties that define the operator — exact
  * duplicates collide, and a uniform "brightness" shift of every
  * intensity leaves the hash unchanged.
  */
class PhashSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def phashOf(s: String): (Long, Long) = {
    val arr = PhashMath.phash(UTF8String.fromString(s)).toLongArray()
    (arr(0), arr(1))
  }

  test("kernel equals the composed-builtins twin on corpus documents") {
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= PhashMath.Pixels).limit(50)
      .withColumn("codes",
        transform(sequence(lit(1), length(col("text"))),
          i => ascii(col("text").substr(i, lit(1)))))
    val rows = docs.select(col("doc_id"),
        call_function("graft_phash", col("text")).as("k"),
        graft.multimodal.MultimodalQueries.phashComposed(col("codes")).as("c"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("identical payloads collide; distinct payloads differ") {
    val s = "the quick brown fox jumps over the lazy dog again and again forever"
    assert(s.length >= PhashMath.Pixels)
    assert(phashOf(s) === phashOf(s))
    // flip the brightest region down: the hash must move
    val darkened = s.replace("quick", "     ")
    assert(phashOf(s) !== phashOf(darkened))
  }

  test("uniform brightness shift leaves the hash unchanged") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 5) {
      val s = Seq.fill(64 + rnd.nextInt(200))(('a' + rnd.nextInt(26)).toChar).mkString
      val shifted = s.map(c => (c + 3).toChar)
      assert(phashOf(s) === phashOf(shifted), s"trial $trial")
    }
  }

  test("short payloads (< 64 code points) yield the empty sentinel") {
    assert(PhashMath.phash(UTF8String.fromString("tiny")).numElements() === 0)
  }

  test("mean compare is exact beyond int64 (128-bit cross products)") {
    // Payloads past ~2e7 code points overflow sum·L in int64; the
    // compare must not wrap. Operands chosen so the 64-bit products
    // collide while the true 128-bit products differ.
    assert(PhashMath.gt128(1L << 62, 5L, 1L << 62, 4L))       // hi word decides
    assert(!PhashMath.gt128(1L << 62, 4L, 1L << 62, 5L))
    assert(PhashMath.gt128(3L, 3L, 2L, 4L))                   // small exact
    assert(!PhashMath.gt128(2L, 4L, 2L, 4L))                  // equality is not >
    // 64-bit wrap case: a·b = 2^64 ≡ 0 (mod 2^64) but truly > c·d = 1
    assert(PhashMath.gt128(1L << 32, 1L << 32, 1L, 1L))
  }

  test("q80 marks every synthetic exact duplicate as perceptual dup") {
    val rows = graft.multimodal.MultimodalQueries.q80Phash(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val exactIds = rows.keySet
      .filter(_ >= graft.dedup.DedupQueries.ExactDupOffset)
    assert(exactIds.nonEmpty)
    exactIds.foreach { id =>
      assert(rows(id), s"exact dup $id must be flagged")
      val base = id - graft.dedup.DedupQueries.ExactDupOffset
      assert(rows.get(base).forall(identity), s"its source $base must be flagged")
    }
  }
}
