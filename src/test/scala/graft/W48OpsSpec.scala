package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, StorageQueries}

/** Wave-48 operators: range-partition balance audit (q238), walk-PMI
  * training pairs (q240) and shared long-n-gram pairs (q242), each
  * cross-checked by driver-side recomputes.
  */
class W48OpsSpec extends GraftSpec {

  test("q238: bucket census partitions the corpus and skew is the stated ratio") {
    val rows = StorageQueries.q238PartitionBalance(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nEvents, "buckets partition every row")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= StorageQueries.RangeBuckets))
    rows.foreach { r =>
      val expect = r.getLong(1).toDouble * StorageQueries.RangeBuckets / nEvents
      assert(math.abs(r.getDouble(2) - expect) < 1e-5, "skew_ratio = n·B/N")
    }
    // the audit must show REAL sampling error, not a flat profile
    val skews = rows.map(_.getDouble(2))
    assert(skews.max > 1.2 && skews.min < 0.8,
      s"event-time key is non-uniform under a 1% sample, got [${skews.min}, ${skews.max}]")
  }

  test("q240: PMI rows recompute from the walk corpus' own counts") {
    val rows = GraphQueries.q240WalkPmi(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= GraphQueries.PmiTopK)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical a < b ordering")
      assert(r.getLong(2) >= GraphQueries.PmiMinPair)
    }
    // recompute N (total pairs) from one emitted row's identity:
    // pmi = ln(n_pair * N / (occ_a * occ_b)) -> N consistent across rows
    val ns = rows.map { r =>
      math.exp(r.getDouble(5)) * r.getLong(3) * r.getLong(4) / r.getLong(2)
    }
    assert(ns.max / ns.min < 1.001,
      "every row must share the same implied corpus pair total")
  }

  test("q242: injected exact duplicates surface with containment 1.0") {
    val rows = graft.dedup.DedupQueries.q242SharedNgrams(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        "shared grams bounded by either doc's gram count")
    }
    // any emitted (d, d + ExactDupOffset) pair is a literal copy
    val exact = rows.filter(r => r.getLong(1) - r.getLong(0) == 2000000000L)
    assert(exact.nonEmpty, "top pairs must include injected exact copies")
    exact.foreach(r => assert(r.getDouble(5) == 1.0))
  }
}
