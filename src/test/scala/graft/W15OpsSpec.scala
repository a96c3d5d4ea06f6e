package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, StreamBatchQueries, UrlQueries}
import graft.dedup.DedupQueries
import graft.functions.{MathFunctions => MF}

/** Wave-5 operators (q139–q142): record-linkage scoring, AMS join-size
  * estimation, link-hygiene profiling, stream-stream join equivalence.
  */
class W15OpsSpec extends GraftSpec {

  test("q139 linkage: exact-dup twins class as match, scores sum their parts") {
    val rows = DedupQueries.q139Linkage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(6) === r.getInt(2) + r.getInt(3) + r.getInt(4) + r.getInt(5),
        s"pair (${r.getLong(0)},${r.getLong(1)}) score arithmetic")
      val want =
        if (r.getInt(6) >= DedupQueries.LkMatchMin) "match"
        else if (r.getInt(6) >= DedupQueries.LkPossibleMin) "possible"
        else "non_match"
      assert(r.getString(7) === want)
    }
    // a bit-identical copy (da + ExactDupOffset = db) agrees on every
    // field: all four weights positive, class = match
    val exactTwins = rows.filter(r =>
      r.getLong(1) - r.getLong(0) === DedupQueries.ExactDupOffset)
    assert(exactTwins.nonEmpty, "LSH must block the exact twins together")
    exactTwins.foreach { r =>
      assert(r.getString(7) === "match", s"exact twin pair ${r.getLong(0)}")
      assert(r.getInt(2) > 0 && r.getInt(3) > 0 && r.getInt(4) > 0 && r.getInt(5) > 0)
    }
  }

  test("q140 AMS sketch: signed sums replay on the driver and the estimate brackets F2") {
    val rows = RelationalQueries.q140JoinSize(spark, sfDir).collect()
    assert(rows.length === RelationalQueries.AmsM)
    val keys = Tables.lineitem(spark, sfDir)
      .select(MF.hash32(col("l_partkey").cast("string")).as("h"))
      .collect().map(_.getLong(0))
    val p = MF.HashP
    rows.foreach { r =>
      val j = r.getInt(0)
      val sj = keys.map { h =>
        val uh = ((1103515245L + 12345L * j) * h +
          ((1013904223L + 2654435761L * j) % p)) % p
        1L - 2L * (uh % 2L)
      }.sum
      assert(r.getLong(1) === sj, s"estimator $j signed sum")
      assert(r.getLong(2) === sj * sj)
    }
    val f2 = rows.head.getLong(3)
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).count()
      .agg(sum(col("count") * col("count"))).first().getLong(0)
    assert(f2 === exact)
    // mean-of-64 is within 3 sigma (sigma ~= F2 * sqrt(2/M))
    val sigma = f2 * math.sqrt(2.0 / RelationalQueries.AmsM)
    assert(math.abs(rows.head.getDouble(4) - f2) < 3 * sigma,
      s"estimate ${rows.head.getDouble(4)} vs exact $f2")
  }

  test("q141 hygiene: per-host ledger reconciles and totals match the cleaned graph") {
    val rows = UrlQueries.q141LinkHygiene(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(4) + r.getLong(5) + r.getLong(6),
        s"host ${r.getString(0)}: raw = self + kept + dup_dropped")
      assert(r.getLong(6) >= 0L, "dedup can only drop")
    }
    val totalRaw = graft.graph.WebGraph.rawEdges(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === totalRaw)
    val totalKept = graft.graph.WebGraph.cachedEdges(spark, sfDir).count()
    assert(rows.map(_.getLong(5)).sum === totalKept,
      "per-host kept counts must tile q04's cleaned edge list")
    // the fixture plants fragments and whitespace — the profile must see them
    assert(rows.map(_.getLong(2)).sum > 0L)
    assert(rows.map(_.getLong(3)).sum > 0L)
  }

  test("q142 streaming interval join equals the batch interval join") {
    val got = StreamBatchQueries.q142StreamJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("t"),
        col("event_id"), col("event_type"))
    val er = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("t").as("ets"), col("event_id").as("eid"))
    val cl = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("t").as("cts"), col("event_id").as("cid"))
    val want = er.join(cl, col("user_id") === col("cu") &&
        col("cts") >= col("ets") - expr("INTERVAL 10 MINUTES") &&
        col("cts") <= col("ets"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("eid")).as("ne"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty, "the fixture has matching error-click pairs")
  }
}
