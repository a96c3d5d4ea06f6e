package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupQueries
import graft.multimodal.MultimodalQueries
import graft.queries.{RelationalQueries, TimeseriesQueries}

/** Wave-28 operators (q173–q175): forecast backtest, SemDeDup,
  * shot↔chunk alignment (and the graft_cdc_cuts kernel).
  */
class W28OpsSpec extends GraftSpec {

  test("q173 forecast backtest replays the seasonal-mean math") {
    val rows = TimeseriesQueries.q173ForecastBacktest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hod")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lastDay = ev.map(_._2).max
    val trainDays = ev.map(_._2).filter(_ < lastDay).distinct.length
    val train = ev.filter(_._2 < lastDay)
      .groupBy(x => (x._1, x._3)).map { case (k, xs) => k -> xs.length.toLong }
    val actual = ev.filter(_._2 == lastDay)
      .groupBy(x => (x._1, x._3)).map { case (k, xs) => k -> xs.length.toLong }
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) === trainDays.toLong)
      val fc = train.getOrElse(key, 0L).toDouble / trainDays
      val act = actual.getOrElse(key, 0L)
      assert(math.abs(r.getDouble(3) - fc) < 1e-6, s"$key forecast")
      assert(r.getLong(4) === act, s"$key actual")
      assert(math.abs(r.getDouble(5) - math.abs(act - fc)) < 1e-6, s"$key abs_err")
    }
    // per-type MAPE equals the mean APE over non-zero-actual cells
    rows.groupBy(_.getString(0)).foreach { case (ty, rs) =>
      val apes = rs.filter(_.getLong(4) > 0)
        .map(r => r.getDouble(5) / r.getLong(4))
      // abs_err is rounded; recompute from raw cells for the tight check
      val raw = rs.filter(_.getLong(4) > 0).map { r =>
        val fc = train.getOrElse((ty, r.getLong(1)), 0L).toDouble / trainDays
        math.abs(r.getLong(4) - fc) / r.getLong(4)
      }
      assert(apes.nonEmpty)
      assert(math.abs(rs.head.getDouble(6) - raw.sum / raw.length) < 1e-5,
        s"$ty mape")
    }
  }

  test("q174 SemDeDup finds every injected near-dup with its planted source") {
    val rows = DedupQueries.q174SemDedup(spark, sfDir).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getBoolean(3))).toMap
    val base = Tables.embeddings(spark, sfDir).select("vec_id").collect()
      .map(_.getLong(0))
    assert(byId.size === base.length + base.count(_ % 10 == 0))
    // every planted near-dup is flagged, with its source as survivor
    base.filter(_ % 10 == 0).foreach { id =>
      val dup = byId(id + DedupQueries.NearDupOffset)
      assert(dup._3, s"planted dup of $id not flagged")
      assert(dup._2 === Some(id), s"planted dup of $id survivor")
      // and the planted pair landed in the same cluster
      assert(dup._1 === byId(id)._1, s"planted pair of $id split across clusters")
    }
    // nothing else is flagged (the base corpus has no 0.99-cosine pairs)
    base.foreach { id =>
      assert(!byId(id)._3, s"base vector $id wrongly flagged")
    }
  }

  test("graft_cdc_cuts agrees with the chunk-hash kernel and composed form") {
    val docs = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0).limit(20)
      .select(col("doc_id"), col("text"),
        call_function("graft_cdc_cuts", col("text"), lit(MultimodalQueries.CdcMaskBits)).as("ends"),
        call_function("graft_cdc_chunks", col("text"), lit(MultimodalQueries.CdcMaskBits)).as("hashes"))
      .collect()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    docs.foreach { r =>
      val text = r.getString(1)
      val ends = r.getSeq[Long](2)
      val hashes = r.getSeq[Long](3)
      assert(ends.length === hashes.length, "one end per chunk")
      assert(ends.last === text.length.toLong, "final chunk closes the text")
      assert(ends === ends.sorted, "ends ascend")
      // re-slice by the cut positions and re-hash: must equal the hashes
      val starts = 1L +: ends.dropRight(1).map(_ + 1)
      starts.zip(ends).zip(hashes).foreach { case ((s, e), h) =>
        assert(h32(text.substring(s.toInt - 1, e.toInt)) === h)
      }
    }
  }

  test("q175 every shot maps to a contiguous chunk range covering it") {
    val rows = MultimodalQueries.q175ShotChunks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val chunkEnds = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(3)) === 2 && length(col("text")) > 0)
      .select(col("doc_id"),
        call_function("graft_cdc_cuts", col("text"), lit(MultimodalQueries.CdcMaskBits)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val ends = chunkEnds(doc)
      val starts = 1L +: ends.dropRight(1).map(_ + 1)
      rs.foreach { r =>
        val (ss, se) = (r.getLong(2), r.getLong(3))
        val (nc, fc, lc) = (r.getLong(4), r.getInt(5), r.getInt(6))
        assert(lc - fc + 1 === nc.toInt, "chunks contiguous")
        // chunk indices are exactly those overlapping [ss, se]
        val want = starts.zip(ends).zipWithIndex.collect {
          case (((cs, ce)), j) if cs <= se && ce >= ss => j + 1
        }
        assert(want.head === fc && want.last === lc,
          s"doc $doc shot ${r.getLong(1)}")
        // the covered chunk range spans the whole shot
        assert(starts(fc - 1) <= ss && ends(lc - 1) >= se)
      }
      // shots tile the asset: starts at 1, consecutive, ends at L
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(2) === 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) === a.getLong(3) + 1)
        case _ =>
      }
    }
  }
}
