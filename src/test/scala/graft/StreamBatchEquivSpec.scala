package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, StreamBatchQueries, WindowQueries}

/** q98's contract: the availableNow streaming run emits exactly the
  * windows a batch plan computes once the watermark cutoff is applied —
  * the equivalence that lets a DuckDB oracle gate the streaming engine.
  */
class StreamBatchEquivSpec extends GraftSpec {

  test("q98 streaming result == batch tumbling agg restricted to watermark-closed windows") {
    val got = StreamBatchQueries.q98StreamWindow(spark, sfDir).collect()

    val ev = Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))
    val wmUs = {
      val mx = ev.agg(max(col("ts_us"))).first().getLong(0)
      (mx / 1000 - StreamBatchQueries.StreamDelayMs) * 1000
    }
    val want = ev
      .groupBy(expr("(ts_us div 3600000000) * 3600000000").as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 6).as("total_value"))
      .filter(col("window_start_us") + 3600000000L <= wmUs)
      .orderBy(col("window_start_us"), col("event_type"))
      .collect()

    assert(got.nonEmpty, "no windows emitted — watermark cutoff swallowed everything")
    assert(got.length == want.length,
      s"row count ${got.length} vs batch ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
  }

  test("q98 withholds only the windows inside the delay horizon (vs full q16)") {
    val full = WindowQueries.q16TumblingWindow(spark, sfDir).count()
    val emitted = StreamBatchQueries.q98StreamWindow(spark, sfDir).count()
    // 30 days of hourly windows; a 2 h delay withholds at most the last
    // few windows, never a material share
    assert(emitted < full && emitted >= full - 4,
      s"emitted $emitted of $full — cutoff should only trim the horizon tail")
  }
}
