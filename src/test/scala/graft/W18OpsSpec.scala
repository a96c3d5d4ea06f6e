package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupQueries

/** Wave-8 operator (q149): exact threshold set-similarity join. The
  * test proves the COMPLETENESS claim — prefix filtering must find
  * exactly the pairs a brute-force all-pairs scan finds.
  */
class W18OpsSpec extends GraftSpec {

  test("q149 prefix-filtered join equals brute-force all-pairs at the threshold") {
    val got = DedupQueries.q149SetSimJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getDouble(5)))
      .toMap
    // brute force over the same augmented corpus on the driver
    val sets = DedupQueries.q20DedupExact(spark, sfDir) // corpus ids
      .select(col("doc_id")).collect().map(_.getLong(0)) // just the id list
    val setOf = {
      val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      val withTwins = d.unionByName(
          d.filter(pmod(col("doc_id"), lit(10)) === 0)
            .select((col("doc_id") + 1000000000L).as("doc_id"),
              concat(col("text"), lit(" graft dup marker tokens")).as("text")))
        .unionByName(
          d.filter(pmod(col("doc_id"), lit(15)) === 0)
            .select((col("doc_id") + 2000000000L).as("doc_id"), col("text")))
      withTwins.select(col("doc_id"),
          call_function("graft_shingle_set", col("text")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    }
    assert(setOf.keySet === sets.toSet)
    def inter(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var j = 0; var c = 0L
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }
    val ids = setOf.keys.toArray.sorted
    val want = scala.collection.mutable.Map.empty[(Long, Long), Long]
    var x = 0
    while (x < ids.length) {
      var y = x + 1
      val sa = setOf(ids(x))
      while (y < ids.length) {
        val sb = setOf(ids(y))
        // length filter is only a shortcut here; apply threshold exactly
        val c = inter(sa, sb)
        if (DedupQueries.SetSimDen * c >=
          DedupQueries.SetSimNum * (sa.length + sb.length - c))
          want((ids(x), ids(y))) = c
        y += 1
      }
      x += 1
    }
    assert(got.keySet === want.keySet,
      s"missing=${(want.keySet -- got.keySet).take(5)} extra=${(got.keySet -- want.keySet).take(5)}")
    want.foreach { case (k, c) =>
      assert(got(k)._1 === c, s"pair $k intersection")
      assert(got(k)._2 >= 0.6 - 1e-9)
    }
    assert(want.nonEmpty, "the dup corpus must contain over-threshold pairs")
  }
}
