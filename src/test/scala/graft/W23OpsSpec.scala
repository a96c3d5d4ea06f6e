package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, TimeseriesQueries}

/** Wave-13 operators (q158–q159): time-to-event distribution and
  * seasonally-adjusted anomalies.
  */
class W23OpsSpec extends GraftSpec {

  test("q158 time-to-event replays a driver-side first-view→first-purchase walk") {
    val rows = TimeseriesQueries.q158TimeToEvent(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val lags = byUser.values.flatMap { evs =>
      val v = evs.filter(_._3 == "view").map(_._2).minOption
      v.flatMap { vt =>
        evs.filter(e => e._3 == "purchase" && e._2 > vt).map(_._2).minOption
          .map(pt => (pt - vt) / 86400000000L)
      }
    }.toSeq
    val nViewers = byUser.values.count(_.exists(_._3 == "view")).toLong
    val hist = lags.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    assert(rows.map(_.getLong(0)).toSet === hist.keySet)
    var cum = 0L
    rows.sortBy(_.getLong(0)).foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === hist(d), s"lag $d count")
      cum += hist(d)
      assert(r.getLong(2) === cum, s"lag $d cumulative")
      assert(r.getLong(3) === nViewers)
      assert(r.getLong(4) === lags.length.toLong)
      assert(math.abs(r.getDouble(5) - cum.toDouble / lags.length) < 1e-6)
    }
    // the CDF ends at exactly 1
    assert(math.abs(rows.map(_.getDouble(5)).max - 1.0) < 1e-9)
  }

  test("q159 flags the injected surge cells and nothing violates its own gate") {
    val rows = TimeseriesQueries.q159SeasonalAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the surge window (hods 6-8 of the injection day) must be flagged
    val surgeDay = TimeseriesQueries.BurstHourStart / 24
    assert(rows.exists(r => r.getLong(1) === surgeDay &&
      r.getLong(2) >= 6L && r.getLong(2) <= 8L), "injected surge not flagged")
    rows.foreach { r =>
      val (cnt, ssum, nDays) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(cnt * nDays >= TimeseriesQueries.SeasonalFactor * ssum,
        "emitted cell fails its own gate")
      assert(cnt >= TimeseriesQueries.SeasonalMin)
      assert(math.abs(r.getDouble(6) - cnt.toDouble * nDays / ssum) < 1e-6)
      assert(r.getDouble(6) >= TimeseriesQueries.SeasonalFactor.toDouble)
    }
  }
}
