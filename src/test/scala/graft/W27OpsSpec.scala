package graft

import org.apache.spark.sql.functions._
import graft.graph.WebGraph
import graft.queries.{GraphQueries, RelationalQueries, StreamBatchQueries}

/** Wave-27 operators (q170–q172): near-mirror hosts, rank convergence
  * trace, streaming trending detector.
  */
class W27OpsSpec extends GraftSpec {

  test("q170 mirror census replays exact pairwise Jaccard on the driver") {
    val rows = GraphQueries.q170MirrorHosts(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= GraphQueries.MirrorTopK)
    val edges = WebGraph.cachedHostEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val out = edges.groupBy(_._1).map { case (h, es) => h -> es.map(_._2).toSet }
    val hosts = out.keys.toSeq.sorted
    val all = for {
      i <- hosts.indices; j <- (i + 1) until hosts.length
      a = hosts(i); b = hosts(j)
      inter = (out(a) & out(b)).size if inter > 0
    } yield (a, b, out(a).size, out(b).size, inter,
      inter.toDouble / (out(a).size + out(b).size - inter))
    val want = all.sortBy { case (a, b, _, _, _, j) => (-j, a, b) }
      .take(GraphQueries.MirrorTopK)
    rows.zip(want).foreach { case (r, (a, b, na, nb, inter, jac)) =>
      assert(r.getString(0) === a && r.getString(1) === b)
      assert(r.getLong(2) === na.toLong && r.getLong(3) === nb.toLong)
      assert(r.getLong(4) === inter.toLong)
      assert(math.abs(r.getDouble(5) - jac) < 1e-6)
    }
  }

  test("q171 trace matches a driver-side replay of the damped loop") {
    val rows = GraphQueries.q171RankTrace(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 9))
    val edges = WebGraph.cachedEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = verts.length.toDouble
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    val inEdges = edges.groupBy(_._2)
    var score = verts.map(_ -> 1.0).toMap
    rows.foreach { r =>
      val ds = score.collect { case (v, s) if !outdeg.contains(v) => s }.sum
      val next = verts.map { v =>
        val contrib = inEdges.getOrElse(v, Array.empty[(String, String)])
          .map { case (s, _) => score(s) / outdeg(s) }.sum
        v -> (0.15 / n + 0.85 * (contrib + ds / n))
      }.toMap
      val l1 = verts.map(v => math.abs(next(v) - score(v))).sum
      val mass = next.values.sum
      assert(math.abs(r.getDouble(1) - ds) < 1e-5, s"round ${r.getInt(0)} ds")
      assert(math.abs(r.getDouble(2) - l1) < 1e-5, s"round ${r.getInt(0)} l1")
      assert(math.abs(r.getDouble(3) - mass) < 1e-5, s"round ${r.getInt(0)} mass")
      score = next
    }
    // the L1 step shrinks monotonically on this graph (geometric decay)
    val l1s = rows.map(_.getDouble(2))
    assert(l1s.zip(l1s.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("q172 trending equals the batch replay of the emitted-window set") {
    val rows = StreamBatchQueries.q172StreamTrending(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("ts_us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val W = StreamBatchQueries.TrendWindowUs
    val wm = (ev.map(_._1).max / 1000 - StreamBatchQueries.StreamDelayMs) * 1000
    val counts = ev.groupBy { case (ts, ty) => (ts / W * W, ty) }
      .map { case (k, xs) => k -> xs.length.toLong }
      .filter { case ((ws, _), _) => ws + W <= wm }
    val byW = counts.groupBy(_._1._1)
    val want = byW.toSeq.flatMap { case (ws, m) =>
      m.toSeq.map { case ((_, ty), cnt) =>
        val prev = counts.getOrElse((ws - W, ty), 0L)
        (ws, ty, cnt, cnt - prev)
      }.sortBy { case (_, ty, _, g) => (-g, ty) }
        .take(StreamBatchQueries.TrendTopK).zipWithIndex
        .map { case ((w, ty, cnt, g), i) => (w, i + 1, ty, cnt, g) }
    }.sortBy(x => (x._1, x._2))
    assert(rows.length === want.length)
    rows.zip(want).foreach { case (r, (ws, rank, ty, cnt, g)) =>
      assert(r.getLong(0) === ws)
      assert(r.getInt(1) === rank)
      assert(r.getString(2) === ty)
      assert(r.getLong(3) === cnt)
      assert(r.getLong(4) === g)
    }
  }
}
