package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.G): the streaming twins of
  * the batch event queries. The same transform runs on any readStream
  * source or a batch DataFrame — tests drive it with MemoryStream, the
  * file source, and rate-micro-batch, asserting equality with the
  * batch plan (a Kafka source would plug in identically; the connector
  * isn't present in this environment).
  */
object StreamingWindows {

  /** Tumbling 1-hour window aggregation over an event stream with
    * event-time watermarking — streaming twin of q16_tumbling_window.
    * Late events beyond 2 hours are dropped by the watermark; state for
    * closed windows is evicted (bounded state at any input rate). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  case class Event(userId: Long, tsUs: Long, value: Double)
  /** Internal: Event plus the watermark timestamp column (must be
    * public — Spark's generated encoder accesses the members). */
  case class EventTs(userId: Long, tsUs: Long, value: Double,
                     ts: java.sql.Timestamp)
  case class SessionState(nEvents: Long, startUs: Long, lastUs: Long, total: Double)
  case class SessionOut(userId: Long, nEvents: Long, startUs: Long,
                        endUs: Long, total: Double)

  /** Streaming exact dedup — the streaming twin of q20_dedup_exact:
    * drop rows whose `fp` (content fingerprint, e.g. md5(text)) was
    * already seen within the event-time watermark horizon.
    * `dropDuplicatesWithinWatermark` keeps one state row per DISTINCT
    * key and evicts keys once the watermark passes them — so an
    * unending 100 TB document stream holds O(distinct keys inside the
    * watermark window) state, never O(history). (Plain
    * `dropDuplicates` on a stream would retain every key forever.) */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static enrichment — the dimension-join every streaming
    * pipeline runs before its stateful stages: each micro-batch of the
    * stream joins a broadcast SNAPSHOT of the static dim frame. No
    * stream state, no watermark requirement (the static side never
    * ages); left join keeps unmatched events flowing with null dim
    * attributes. At 100 TB the dim must be broadcast-sized (else
    * pre-bucket the dim and let the batch-side join plan pick a
    * shuffle) — the streaming plan re-resolves the static side per
    * micro-batch, so a slowly-refreshed dim table is picked up on
    * rewrite of the underlying source. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream interval join — the streaming shape of q17's as-of
    * enrichment: every error event joins the clicks of the same user
    * from the preceding `lookbackMin` minutes. True ASOF (only the
    * single most recent row) needs a global per-key order and is not
    * expressible in a streaming join; the bounded time-range join IS,
    * and both watermarks + the range condition let Spark evict click
    * state once it can no longer match any future error — state is
    * O(events inside the lookback+delay horizon), never O(history).
    * Expects `errors(user_id, ets, ...)` and `clicks(c_user_id, cts,
    * ...)`; emits the inner join. */
  def recentClickJoin(errors: DataFrame, clicks: DataFrame,
                      lookbackMin: Int = 10,
                      watermarkDelay: String = "20 minutes"): DataFrame =
    errors.withWatermark("ets", watermarkDelay)
      .join(clicks.withWatermark("cts", watermarkDelay),
        expr(s"user_id = c_user_id AND " +
          s"cts BETWEEN ets - INTERVAL $lookbackMin MINUTES AND ets"))

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * streaming twin of q15_sessionize (gap > 30 min closes a session).
    * Emits CLOSED sessions only: a session is emitted when a later
    * event opens the next one (gap closure) or when the event-time
    * watermark passes last-event + gap (EventTimeTimeout flushes idle
    * users). Timed-out state is removed, so per-user state is bounded
    * by the one live session — an unending 100 TB event stream holds
    * O(active users) state, never O(history). */
  def sessionize(events: Dataset[Event], gapMin: Int = 30,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val sp = events.sparkSession
    import sp.implicits._
    val gapUs = gapMin * 60L * 1000000L
    events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermarkDelay)
      .as[EventTs]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[EventTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove() // evict: idle session flushed, state freed
            Iterator.single(SessionOut(userId, s.nEvents, s.startUs, s.lastUs, s.total))
          } else {
            val sorted = batch.toSeq.sortBy(_.tsUs)
            val closed = Seq.newBuilder[SessionOut]
            var s = state.getOption.orNull
            sorted.foreach { e =>
              s =
                if (s == null) SessionState(1L, e.tsUs, e.tsUs, e.value)
                else if (e.tsUs - s.lastUs > gapUs) {
                  closed += SessionOut(userId, s.nEvents, s.startUs, s.lastUs, s.total)
                  SessionState(1L, e.tsUs, e.tsUs, e.value) // gap: new session
                } else
                  SessionState(s.nEvents + 1, s.startUs, e.tsUs, s.total + e.value)
            }
            state.update(s)
            // flush when the watermark passes the live session's gap
            // horizon (must stay above the current watermark)
            state.setTimeoutTimestamp(math.max(
              s.lastUs / 1000L + gapMin * 60L * 1000L,
              state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }
}
