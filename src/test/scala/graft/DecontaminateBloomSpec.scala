package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, StorageQueries}

/** Bloom-sketch decontamination pinned against the exact broadcast-set
  * path, and the q52 JSON extraction's parse contract.
  */
class DecontaminateBloomSpec extends GraftSpec {

  test("bloom decontamination never misses a contaminated doc (no false negatives)") {
    val docs = Tables.documents(spark, sfDir)
    val isBench = pmod(col("doc_id"), lit(dedup.DedupQueries.BenchMod)) === 0
    val train = docs.filter(!isBench)
    val bench = docs.filter(isBench)

    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getAs[Number](1).longValue, r.getAs[Number](2).longValue,
          r.getBoolean(4))).toMap

    val exact = keyed(Graft.decontaminate(
      train, col("doc_id"), col("text"), bench, col("text")))
    val bloom = keyed(Graft.decontaminateBloom(
      train, col("doc_id"), col("text"), bench, col("text")))

    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (id, (nSh, nOv, contaminated)) =>
      val (bSh, bOv, bContaminated) = bloom(id)
      assert(bSh === nSh, s"doc $id shingle count")
      // one-sided error: the sketch can only ADD overlaps
      assert(bOv >= nOv, s"doc $id: bloom overlap $bOv < exact $nOv")
      if (contaminated) assert(bContaminated, s"doc $id: false negative")
    }
    // and at this sketch size the false-positive inflation is tiny:
    // flagged sets actually coincide on the fixture corpus
    assert(exact.count(_._2._3) === bloom.count(_._2._3))
  }

  test("graft_bloom_count_contains kernel == composed aggregate/might_contain twin") {
    // same sketch, same probes: the compiled whole-array count must be
    // bitwise identical to the interpreted per-element fold it replaced
    val docs = Tables.documents(spark, sfDir)
    val isBench = pmod(col("doc_id"), lit(dedup.DedupQueries.BenchMod)) === 0
    val sets = docs.select(col("doc_id"),
      call_function("graft_shingle_set", col("text")).as("s"))
    val bf = sets.filter(isBench).select(explode(col("s")).as("h"))
      .agg(call_function("graft_bloom_agg", col("h"), lit(1L << 17), lit(8L << 20)))
      .first().getAs[Array[Byte]](0)
    val both = sets.filter(!isBench).select(col("doc_id"),
        call_function("graft_bloom_count_contains", lit(bf), col("s")).as("kernel"),
        aggregate(col("s"), lit(0L),
          (acc, x) => acc + when(
            call_function("graft_might_contain", lit(bf), x), 1L).otherwise(0L))
          .as("twin"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("portable-Bloom q28 path: no false negatives, overlap superset of exact") {
    // the r10 driver-gated path: positions are the universal-hash
    // family, so the oracle replays decisions — but the Bloom
    // guarantees themselves still hold and are pinned here
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getBoolean(4))).toMap
    val exact = keyed(dedup.DedupQueries.q26Decontaminate(spark, sfDir))
    val pb = keyed(dedup.DedupQueries.q28DecontaminateBloom(spark, sfDir))
    assert(pb.keySet === exact.keySet)
    exact.foreach { case (id, (nSh, nOv, contaminated)) =>
      val (bSh, bOv, bCont) = pb(id)
      assert(bSh === nSh, s"doc $id shingle count")
      assert(bOv >= nOv, s"doc $id: portable-bloom overlap $bOv < exact $nOv")
      if (contaminated) assert(bCont, s"doc $id: false negative")
    }
  }

  test("pbloom kernel: every inserted element hits; blob is size-bounded") {
    import graft.plans.BloomKernelMath._
    val elems = Array.tabulate(5000)(i => (i.toLong * 2654435761L) & 0xffffffffL)
    val blob = pbloomBuild(elems, numBits = 1L << 16, k = 5)
    assert(blob.length === 16 + (1 << 16) / 8, "header + bitset words")
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(elems)
    assert(pbloomHits(blob, arr) === elems.length.toLong,
      "a Bloom filter never false-negatives its own elements")
    // absent probes mostly miss at this load (5000*5/65536 bits)
    val absent = Array.tabulate(5000)(i => 4294967295L - i)
    val hits = pbloomHits(blob, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(absent))
    assert(hits < 2500, s"fpp should be well under 0.5 at ~2.6 bits/elem, got $hits/5000")
  }

  test("q52 JSON extraction parses every well-formed props payload") {
    val rows = StorageQueries.q52Json(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"${r.getString(0)}: every synthetic props row carries k")
      assert(r.getLong(5) <= r.getLong(6), "min <= max")
    }
    // malformed payloads null out instead of crashing
    val sp = spark
    import sp.implicits._
    val bad = Seq("""{"k": 7}""", "not json", """{"j": 1}""").toDF("props")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType))))("k").as("k"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(bad.toSeq === Seq(Some(7L), None, None))
  }
}
