package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries, WindowQueries}

/** Wave-7 operators (q146–q148): time-boxed funnel, per-user lag
  * features, item-item co-engagement similarity.
  */
class W17OpsSpec extends GraftSpec {

  private def events(): Array[(Long, Long, String)] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("q146 window funnel replays the greedy time-boxed chain and never beats q53") {
    val got = WindowQueries.q146WindowFunnel(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val W = WindowQueries.FunnelWindowUs
    val ev = events()
    val byUser = ev.groupBy(_._1)
    var nv = 0L; var nc = 0L; var np = 0L
    byUser.values.foreach { evs =>
      val v = evs.filter(_._3 == "view").map(_._2).minOption
      v.foreach { vt =>
        nv += 1
        val c = evs.filter(e => e._3 == "click" && e._2 > vt && e._2 <= vt + W)
          .map(_._2).minOption
        c.foreach { ct =>
          nc += 1
          if (evs.exists(e => e._3 == "purchase" && e._2 > ct && e._2 <= ct + W))
            np += 1
        }
      }
    }
    assert(got("all_users") === byUser.size.toLong)
    assert(got("view") === nv)
    assert(got("click") === nc)
    assert(got("purchase") === np)
    // the time box can only LOSE users relative to q53's unbounded chain
    val unbounded = WindowQueries.q53Funnel(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("click") <= unbounded("click"))
    assert(got("purchase") <= unbounded("purchase"))
  }

  test("q147 lag features replay a driver-side per-user walk") {
    val rows = MlEvalQueries.q147LagFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = events().map { case (u, ts, _) => (u, ts / 86400000L / 1000L) }
    val counts = ev.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(rows.keySet === counts.keySet.map(identity))
    counts.foreach { case ((u, d), n) =>
      val (gn, g1, g7, gs) = rows((u, d))
      assert(gn === n)
      assert(g1 === counts.getOrElse((u, d - 1), 0L), s"user $u day $d prev_1d")
      assert(g7 === (1 to MlEvalQueries.LagFeatDays)
        .map(k => counts.getOrElse((u, d - k), 0L)).sum, s"user $u day $d prev_7d")
      val prevActive = counts.keys.filter { case (uu, dd) => uu == u && dd < d }
        .map(_._2).maxOption
      assert(gs === prevActive.map(d - _).getOrElse(-1L),
        s"user $u day $d days_since_prev")
    }
  }

  test("q148 item similarity recomputes from the distinct bipartite pairs") {
    val rows = MlEvalQueries.q148ItemSimilarity(spark, sfDir).collect()
    val pairs = events().map(e => (e._1, e._3)).distinct
    val marg = pairs.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val co = pairs.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ts = xs.map(_._2).toSeq
        for (a <- ts; b <- ts if a < b) yield (a, b)
      }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(rows.length === co.size)
    rows.foreach { r =>
      val (ia, ib) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === co((ia, ib)), s"co($ia,$ib)")
      assert(r.getLong(3) === marg(ia) && r.getLong(4) === marg(ib))
      val cos = co((ia, ib)).toDouble / math.sqrt(marg(ia).toDouble * marg(ib))
      assert(math.abs(r.getDouble(5) - cos) < 1e-6)
      val jac = co((ia, ib)).toDouble / (marg(ia) + marg(ib) - co((ia, ib)))
      assert(math.abs(r.getDouble(6) - jac) < 1e-6)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
