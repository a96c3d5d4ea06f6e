package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingWindows
import graft.streaming.StreamingWindows.Event

/** Structured Streaming twins (SURVEY §2.G): drive the streaming
  * transforms with MemoryStream and assert they agree with the batch
  * plan over the same data.
  */
@SlowSuite
class StreamingSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("watermark bounds stateful state: eviction MEASURED via stateOperators") {
    // The 100 TB streaming claim ("watermark-bounded state") as a
    // measurement, not an argument: drive the q98-shaped windowed agg
    // and the q132-shaped dedup through controlled event-time batches
    // and read the engine's own state metrics (numRowsTotal,
    // memoryUsedBytes) from the progress reports.
    implicit val sqlCtx = sp.sqlContext
    val base = 1700000000000L

    // --- windowed aggregation state (q98's shape)
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = mem.toDF.toDF("ts", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("state_bound_agg")
      .outputMode("append").start()
    // batch 1: 360 events over 6 hours, 2 types -> state is keyed by
    // (window, type): <= 7 windows x 2 types, NOT 360 event rows
    mem.addData((0 until 360).map(i =>
      (new Timestamp(base + i * 60000L), s"t${i % 2}", 1.0)): _*)
    q.processAllAvailable()
    val afterLoad = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).max
    // batches 2+3: jump 100 hours -> watermark passes the old windows,
    // which must be EVICTED (emitted downstream), not retained
    mem.addData((0 until 60).map(i =>
      (new Timestamp(base + 100L * 3600000 + i * 60000L), s"t${i % 2}", 1.0)): _*)
    q.processAllAvailable()
    mem.addData((new Timestamp(base + 101L * 3600000), "t0", 1.0))
    q.processAllAvailable()
    val aggStates = q.recentProgress.flatMap(_.stateOperators)
    q.stop()
    assert(afterLoad <= 16, s"agg state must scale with live windows, got $afterLoad")
    assert(aggStates.last.numRowsTotal <= 8,
      s"watermark-passed windows must leave state, got ${aggStates.last.numRowsTotal}")
    assert(aggStates.exists(_.memoryUsedBytes > 0), "state memory must be reported")

    // --- dedup-within-watermark state (q132's shape)
    val dmem = MemoryStream[(Timestamp, String)]
    val dq = StreamingWindows.dedupStream(
        dmem.toDF.toDF("ts", "fp"), watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("state_bound_dedup")
      .outputMode("append").start()
    // 300 events but only 10 distinct fingerprints -> <= 10 state rows
    dmem.addData((0 until 300).map(i =>
      (new Timestamp(base + i * 1000L), s"fp${i % 10}")): _*)
    dq.processAllAvailable()
    val dedupLoad = dq.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).max
    // jump 50 hours: every old fingerprint ages out of the watermark
    dmem.addData((new Timestamp(base + 50L * 3600000), "fresh1"))
    dq.processAllAvailable()
    dmem.addData((new Timestamp(base + 50L * 3600000 + 1000L), "fresh2"))
    dq.processAllAvailable()
    val dedupStates = dq.recentProgress.flatMap(_.stateOperators)
    dq.stop()
    assert(dedupLoad <= 12, s"dedup state must be keyed by fingerprint, got $dedupLoad")
    assert(dedupStates.last.numRowsTotal <= 3,
      s"aged-out fingerprints must leave state, got ${dedupStates.last.numRowsTotal}")
    assert(dedupStates.exists(_.memoryUsedBytes > 0))
  }

  test("streaming tumbling window agg equals batch agg on the same events") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value")

    val query = StreamingWindows.tumblingHourly(streamDf)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()

    val base = 1700000000000L // fixed epoch ms
    val events = (0 until 500).map { i =>
      (new Timestamp(base + i * 97000L), s"type${i % 3}", i * 0.5)
    }
    mem.addData(events: _*)
    query.processAllAvailable()

    val got = sp.table("tumbling_test")
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet

    val want = StreamingWindows.tumblingHourly(
        events.toDF("ts", "event_type", "value"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet

    query.stop()
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("file-source readStream: windowed agg over incrementally arriving parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val base = 1700000000000L
    def batch(offset: Int) = (0 until 200).map { i =>
      (new Timestamp(base + (offset + i) * 60000L), s"type${i % 2}", i * 1.0)
    }
    // first file arrives before the query starts; second mid-stream
    batch(0).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)

    val schema = sp.read.parquet(dir).schema
    val stream = sp.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val query = StreamingWindows.tumblingHourly(stream)
      .writeStream.format("memory").queryName("file_tumbling")
      .outputMode("complete").start()
    query.processAllAvailable()

    batch(200).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    query.processAllAvailable()

    val got = sp.table("file_tumbling")
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet
    val want = StreamingWindows.tumblingHourly(
        (batch(0) ++ batch(200)).toDF("ts", "event_type", "value"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet
    query.stop()
    assert(got === want)
    assert(got.size >= 2)
  }

  test("end-to-end file pipeline: readStream -> windowed agg -> writeStream parquet sink") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_sink_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    val base = 1700000000000L
    val events = (0 until 300).map { i =>
      (new Timestamp(base + i * 60000L), s"type${i % 2}", i * 1.0)
    }
    events.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val schema = sp.read.parquet(srcDir).schema
    val stream = sp.readStream.schema(schema).parquet(srcDir)
    // append mode requires the watermark to close windows; a final
    // far-future event pushes the watermark past all real windows
    val closer = Seq((new Timestamp(base + 100L * 3600000L), "type0", 0.0))
    val query = StreamingWindows.tumblingHourly(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    query.processAllAvailable()
    closer.toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    query.processAllAvailable()
    query.stop()

    val got = sp.read.parquet(outDir)
      .filter(col("window_start") < new Timestamp(base + 99L * 3600000L))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet
    val want = StreamingWindows.tumblingHourly(events.toDF("ts", "event_type", "value"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.size >= 4)
  }

  test("checkpoint recovery: file-sink query restarted from its checkpoint is exactly-once") {
    // The claim a 100 TB pipeline actually relies on: a query that dies
    // mid-stream and restarts from its checkpoint neither re-emits a
    // window already in the sink nor loses one that hadn't flushed yet.
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rec_src").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rec_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rec_ckpt").toString
    val base = 1700000000000L
    def mkEvents(r: Range) =
      r.map(i => (new Timestamp(base + i * 60000L), s"type${i % 2}", i * 1.0))
    val all = mkEvents(0 until 300) // 5 hours of minute-spaced events

    // phase 1: 4 hours of events -> watermark reaches 2h, so the first
    // two windows EMIT before the stop (a broken recovery would re-emit
    // exactly these)
    mkEvents(0 until 240).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = sp.read.parquet(srcDir).schema
    def startQuery() = {
      val stream = sp.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      StreamingWindows.tumblingHourly(stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // dies after batch 0; offsets/commits survive in ckpt
    val preRestart = sp.read.parquet(outDir).count()
    assert(preRestart > 0, "phase 1 must flush some windows for the test to bite")

    // data keeps landing while the query is down; the far-future closer
    // pushes the watermark past every real window after the restart
    mkEvents(240 until 300).toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)
    Seq((new Timestamp(base + 100L * 3600000L), "type0", 0.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val q2 = startQuery()
    q2.processAllAvailable()
    // resumed from the checkpoint (batch ids continue), not from zero
    assert(q2.recentProgress.nonEmpty && q2.recentProgress.map(_.batchId).min >= 1,
      q2.recentProgress.map(_.batchId).mkString(","))
    q2.stop()

    // MULTISET compare against the batch twin: toSet would hide a
    // duplicated window, the whole point of the exactly-once claim
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.toList).sortBy(_.toString).toList
    val got = canon(sp.read.parquet(outDir)
      .filter(col("window_start") < new Timestamp(base + 99L * 3600000L))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect())
    val want = canon(StreamingWindows.tumblingHourly(
        all.toDF("ts", "event_type", "value"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 6).as("total_value"))
      .collect())
    assert(got.length === want.length, s"sink rows ${got.length} vs batch ${want.length}")
    assert(got === want)
    assert(got.length >= 10) // 5 hours x 2 event types
  }

  test("streaming sessionization emits gap-closed sessions (flatMapGroupsWithState)") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Event]
    val query = StreamingWindows.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()

    val us = 1000000L
    // epoch-0 would coincide with the initial watermark and be dropped
    // as late — anchor at a realistic epoch instead
    val t0 = 1700000000L * us
    // user 1: two events 10 min apart (one session), then a 40-min gap
    // opens a second session — the FIRST session is emitted at that
    // moment. user 2: single event; user 1's last event then pushes the
    // watermark past user 2's idle horizon, so user 2's session is
    // flushed by the event-time timeout in the follow-up batch.
    mem.addData(
      Event(1L, t0, 1.0), Event(1L, t0 + 600L * us, 2.0),
      Event(1L, t0 + 3000L * us, 4.0), Event(2L, t0, 9.0))
    query.processAllAvailable()

    val rows = sp.table("session_test").as[StreamingWindows.SessionOut]
      .collect().map(r => r.userId -> r).toMap
    query.stop()

    // user 1's LIVE post-gap session is not emitted
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L).nEvents === 2L) // the gap-closed first session
    assert(rows(1L).startUs === t0)
    assert(rows(1L).endUs === t0 + 600L * us)
    assert(rows(1L).total === 3.0)
    assert(rows(2L).nEvents === 1L) // idle-flushed via timeout
    assert(rows(2L).total === 9.0)
  }

  test("streaming sessionization flushes idle sessions on event-time timeout") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[Event]
    val query = StreamingWindows.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("session_timeout_test")
      .outputMode("append").start()

    val us = 1000000L
    val t0 = 1700000000L * us
    mem.addData(Event(1L, t0, 1.0), Event(1L, t0 + 600L * us, 2.0), Event(2L, t0, 9.0))
    query.processAllAvailable()
    // nothing closed yet: both sessions live, no gap crossed
    assert(sp.table("session_timeout_test").isEmpty)

    // a far-future event (other user) advances the watermark way past
    // lastUs + gap for users 1 and 2 → their idle sessions must be
    // flushed by EventTimeTimeout and their state evicted.
    mem.addData(Event(99L, t0 + 100000L * us, 0.0))
    query.processAllAvailable()

    val rows = sp.table("session_timeout_test").as[StreamingWindows.SessionOut]
      .collect().map(r => r.userId -> r).toMap
    query.stop()

    assert(rows.keySet === Set(1L, 2L)) // user 99's session is still live
    assert(rows(1L).nEvents === 2L)
    assert(rows(1L).total === 3.0)
    assert(rows(1L).endUs === t0 + 600L * us)
    assert(rows(2L).nEvents === 1L)
    assert(rows(2L).total === 9.0)
  }

  test("rate-micro-batch source drives the tumbling window agg") {
    val base = 1700000000000L
    val stream = sp.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "120")
      .option("startTimestamp", base.toString)
      .option("advanceMillisPerBatch", "60000")
      .load() // (timestamp, value)
    val events = stream.select(col("timestamp").as("ts"),
      concat(lit("type"), pmod(col("value"), lit(2))).as("event_type"),
      col("value").cast("double").as("value"))
    val query = StreamingWindows.tumblingHourly(events)
      .writeStream.format("memory").queryName("rate_tumbling")
      .outputMode("complete").start()
    // rate-micro-batch always has a next batch, so processAllAvailable
    // would never return; wait for a few deterministic batches instead.
    val deadline = System.currentTimeMillis() + 30000
    while (query.recentProgress.length < 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    query.stop() // stop between triggers; committed batches are whole
    val got = sp.table("rate_tumbling")
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(got > 0 && got % 120 === 0) // whole deterministic batches only
  }

  test("stream-stream interval join equals the batch join on the same events") {
    implicit val sqlCtx = sp.sqlContext
    val errMem = MemoryStream[(Long, Timestamp, String)]
    val clkMem = MemoryStream[(Long, Timestamp, String)]
    val errors = errMem.toDF.toDF("user_id", "ets", "code")
    val clicks = clkMem.toDF.toDF("c_user_id", "cts", "page")
    val query = StreamingWindows.recentClickJoin(errors, clicks)
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()

    val base = 1700000000000L
    def ts(min: Long) = new Timestamp(base + min * 60000L)
    // user 1: clicks at 0, 5, 30 min; errors at 8 (catches 0,5) and
    // 35 (catches 30; 0 and 5 are outside the 10-min lookback).
    // user 2: click at 3; error at 20 → no match (outside lookback).
    val clkRows = Seq((1L, ts(0), "a"), (1L, ts(5), "b"), (1L, ts(30), "c"),
      (2L, ts(3), "d"))
    val errRows = Seq((1L, ts(8), "E1"), (1L, ts(35), "E2"), (2L, ts(20), "E3"))
    clkMem.addData(clkRows: _*)
    errMem.addData(errRows: _*)
    query.processAllAvailable()

    val got = sp.table("interval_join")
      .select(col("user_id"), col("ets"), col("code"), col("cts"), col("page"))
      .collect().map(_.toSeq).toSet
    val want = StreamingWindows.recentClickJoin(
        errRows.toDF("user_id", "ets", "code"),
        clkRows.toDF("c_user_id", "cts", "page"))
      .select(col("user_id"), col("ets"), col("code"), col("cts"), col("page"))
      .collect().map(_.toSeq).toSet
    query.stop()
    assert(got === want)
    // the documented matches, exactly
    val pages = got.toSeq.groupBy(r => r(2)).view
      .mapValues(_.map(_(4)).toSet).toMap
    assert(pages === Map("E1" -> Set("a", "b"), "E2" -> Set("c")))
  }

  test("stream-static enrichment joins the dim snapshot, then aggregates") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val events = mem.toDF.toDF("ts", "user_id", "value")
    val dim = Seq((0L, "free"), (1L, "pro"), (2L, "pro"))
      .toDF("user_id", "segment") // user 3 is absent → left-join null
    val enriched = StreamingWindows.enrichWithDim(events, dim, "user_id")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("segment"), col("n"), col("total"))
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_test").outputMode("complete").start()

    val base = 1700000000000L
    val rows = (0 until 400).map { i =>
      (new Timestamp(base + i * 53000L), (i % 4).toLong, i * 0.25)
    }
    mem.addData(rows: _*)
    query.processAllAvailable()
    val got = sp.table("enrich_test")
      .select(col("ws"), col("segment"), col("n"), round(col("total"), 6).as("t"))
      .collect().map(_.toSeq).toSet
    query.stop()

    val want = rows.toDF("ts", "user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("segment"), col("n"),
        round(col("total"), 6).as("t"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    // the unmatched user flowed through as a null segment
    assert(got.exists(_(1) == null))
  }

  test("streaming exact dedup: duplicate fingerprints within the watermark are dropped") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val docs = mem.toDF.toDF("ts", "doc_id", "fp")
    val query = StreamingWindows.dedupStream(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    val base = 1700000000000L
    // 30 distinct fingerprints, each arriving 3 times within minutes
    val events = (0 until 90).map { i =>
      (new Timestamp(base + i * 10000L), i.toLong, s"fp${i % 30}")
    }
    mem.addData(events: _*)
    query.processAllAvailable()
    // advance the watermark far past the first burst (watermark moves at
    // batch END, so the advance and the replay need separate batches),
    // then replay one fingerprint: beyond the horizon it counts as new
    mem.addData((new Timestamp(base + 10L * 3600 * 1000), 800L, "fp_advance"))
    query.processAllAvailable()
    mem.addData((new Timestamp(base + 10L * 3600 * 1000 + 1000), 900L, "fp0"))
    query.processAllAvailable()
    query.stop()

    val out = sp.table("dedup_stream").select(col("fp"), col("doc_id")).collect()
    val firstBurst = out.filter(_.getLong(1) < 800L)
    assert(firstBurst.length === 30) // one survivor per distinct fp
    // each survivor is the FIRST arrival of its fingerprint
    firstBurst.foreach(r => assert(r.getLong(1) < 30L, r))
    assert(out.count(_.getLong(1) === 900L) === 1) // re-admitted after horizon
  }

  test("composed pipeline: streaming dedup -> windowed agg equals the batch twin") {
    implicit val sqlCtx = sp.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val docs = mem.toDF.toDF("ts", "doc_id", "fp", "value")
    // dedupStream feeds a downstream watermarked tumbling aggregation —
    // the ingest shape of a real corpus pipeline (dedup AT ingest, stats
    // over the survivors), two stateful operators in ONE query
    val query = StreamingWindows.dedupStream(docs, "2 hours")
      .groupBy(window(col("ts"), "1 hour"), substring(col("fp"), 1, 3).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("grp"), col("n"), col("total"))
      .writeStream.format("memory").queryName("dedup_agg_stream")
      .outputMode("append").start()

    val base = 1700000000000L
    val events = (0 until 120).map { i =>
      (new Timestamp(base + (i % 40) * 90000L), i.toLong, s"fp${i % 40}", (i % 40).toDouble)
    }
    // survivors: first arrival of each of the 40 fingerprints
    mem.addData(events.take(60): _*)
    query.processAllAvailable()
    mem.addData(events.drop(60): _*)
    query.processAllAvailable()
    // closing event: watermark passes every open window so it emits
    mem.addData((new Timestamp(base + 12L * 3600 * 1000), 999L, "fp_close", 0.0))
    query.processAllAvailable()
    query.stop()

    val got = sp.table("dedup_agg_stream")
      .filter(col("grp") =!= "fp_")
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // batch twin over the SAME logical input: distinct-by-fp (first
    // arrival) then the same aggregation
    val sp2 = sp
    import sp2.implicits._
    val firstOfFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("ts"), col("doc_id"))
    val batch = events.toDF("ts", "doc_id", "fp", "value")
      .withColumn("rn", row_number().over(firstOfFp))
      .filter(col("rn") === 1)
      .groupBy(window(col("ts"), "1 hour"), substring(col("fp"), 1, 3).as("grp"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("grp"), col("n"), col("total"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === batch)
  }
}
