package graft

import org.apache.spark.sql.functions._
import graft.text.TextQueries

/** Wave-31 operator (q183): BPE merge training. */
class W31OpsSpec extends GraftSpec {

  test("q183 BPE merges replay a driver-side training loop") {
    val rows = TextQueries.q183BpeMerges(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to TextQueries.BpeRounds))
    val words = Tables.documents(spark, sfDir)
      .select(col("text")).collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(0)))
    var vocab: Map[Seq[String], Long] = words.groupBy(identity)
      .map { case (w, xs) => w.split("").toSeq -> xs.length.toLong }
    rows.foreach { r =>
      // pair census over the current vocabulary
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, cnt) =>
        syms.zip(syms.tail).foreach(p => pairs(p) += cnt)
      }
      val (a, b) = pairs.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head._1
      assert(r.getString(1) === a, s"round ${r.getInt(0)} lhs")
      assert(r.getString(2) === b, s"round ${r.getInt(0)} rhs")
      assert(r.getString(3) === a + b)
      assert(r.getLong(4) === pairs((a, b)), s"round ${r.getInt(0)} count")
      // greedy left-to-right application
      vocab = vocab.map { case (syms, cnt) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b) {
            out.remove(out.length - 1); out += (a + b)
          } else out += x
        }
        out.toSeq -> cnt
      }
      val nSyms = vocab.keys.flatten.toSet.size
      assert(r.getLong(5) === nSyms.toLong, s"round ${r.getInt(0)} symbol census")
    }
    // merging strictly grows the symbol inventory by at most 1 per round
    // and pair counts are non-increasing (the greedy invariant)
    val counts = rows.map(_.getLong(4))
    counts.zip(counts.tail).foreach { case (x, y) => assert(y <= x) }
  }

  test("bpeApplyMerge survives quote- and backslash-bearing symbols") {
    val sp = spark
    import sp.implicits._
    // symbols a quote-hostile tokenizer could emit: ' and \ — the
    // interpolated expression must treat them as literals, not syntax
    val df = Seq(Seq("'", "\\", "'", "x")).toDF("syms")
    val merged = df.select(TextQueries.bpeApplyMerge("'", "\\").as("syms"))
      .first().getSeq[String](0)
    assert(merged === Seq("'\\", "'", "x"))
    val merged2 = df.select(TextQueries.bpeApplyMerge("\\", "'").as("syms"))
      .first().getSeq[String](0)
    assert(merged2 === Seq("'", "\\'", "x"))
  }
}
