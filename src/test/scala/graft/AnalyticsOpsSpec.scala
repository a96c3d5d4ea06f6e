package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, StorageQueries, TimeseriesQueries, WindowQueries}
import graft.text.TextQueries

/** r5 breadth operators: binned range join, rollup, KMV distinct
  * sketch, exact percentiles, pivot.
  */
class AnalyticsOpsSpec extends GraftSpec {

  test("q19 binned range join equals the naive BETWEEN join and stays off BNL") {
    val binned = RelationalQueries.q19RangeJoin(spark, sfDir)
    // naive twin: raw range predicate (BroadcastNestedLoopJoin shape) —
    // correct at toy scale, the thing q19 exists to avoid at 100 TB
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"))
    val hr = ev.filter(col("event_type") === "error")
      .groupBy(expr(s"ts_us div ${RelationalQueries.RjBinUs}").as("h"))
      .agg(count(lit(1)).as("c"))
    val thr = hr.agg(avg(col("c")).as("avg_c"))
    val iv = hr.crossJoin(broadcast(thr))
      .filter(col("c").cast("double") > lit(1.5) * col("avg_c"))
      .select((col("h") * RelationalQueries.RjBinUs).as("wstart_us"),
        (col("h") * RelationalQueries.RjBinUs - RelationalQueries.RjLoPadUs).as("lo_us"),
        (col("h") * RelationalQueries.RjBinUs + RelationalQueries.RjHiPadUs).as("hi_us"))
    val naive = iv.join(ev.filter(col("event_type") === "click"),
        col("ts_us").between(col("lo_us"), col("hi_us")))
      .groupBy(col("wstart_us"))
      .agg(count(lit(1)).as("n_clicks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val got = binned.collect()
    assert(got.nonEmpty, "derived alert intervals should match some clicks")
    val gotMap = got.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(gotMap === naive)
    got.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0) && r.getLong(0) <= r.getLong(2),
        "wstart inside [lo, hi]")
    }
    // the binned join itself must be an equi-join (hash join on `bin`);
    // the ONLY nested-loop join allowed is the 1-row threshold scalar
    // (AQE's toString prints the initial plan too — inspect only the final)
    val plan = binned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("HashJoin"),
      s"binned range join should hash-join on the bin:\n$plan")
    val bnls = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnls <= 1, s"only the 1-row scalar may nested-loop, saw $bnls:\n$plan")
  }

  test("q38 rollup levels are consistent: details sum to subtotals sum to total") {
    val rows = RelationalQueries.q38Rollup(spark, sfDir).collect()
    val byGid = rows.groupBy(_.getInt(0))
    assert(byGid.keySet === Set(0, 1, 3), "detail, per-year, grand total")
    val details = byGid(0)
    val years = byGid(1)
    val Array(total) = byGid(3)
    assert(total.getInt(1) === -1 && total.getString(2) === "ALL")
    // n_orders adds up exactly across every level
    assert(details.map(_.getLong(3)).sum === total.getLong(3))
    assert(years.map(_.getLong(3)).sum === total.getLong(3))
    // revenue adds up to the 6-dp grid
    assert(math.abs(details.map(_.getDouble(4)).sum - total.getDouble(4)) < 1e-4)
    // each per-year subtotal covers its detail rows
    years.foreach { y =>
      val d = details.filter(_.getInt(1) == y.getInt(1))
      assert(d.map(_.getLong(3)).sum === y.getLong(3), s"year ${y.getInt(1)}")
    }
  }

  test("q49 KMV estimate tracks the exact distinct count") {
    val rows = TextQueries.q49KmvDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nExact, est, relErr) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      if (nExact < TextQueries.KmvK)
        assert(est === nExact.toDouble, s"${r.getString(0)}: degenerate case is exact")
      else
        // KMV standard error is ~1/sqrt(K-1) ≈ 12.6% at K=64; 3σ bound
        assert(relErr < 0.38, s"${r.getString(0)}: rel_err $relErr est $est vs $nExact")
    }
  }

  test("q50 percentiles are ordered and p50 matches a driver-side median") {
    val rows = TextQueries.q50Quantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, p25, p50, p90, p99, mx) =
        (r.getLong(2).toDouble, r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getLong(7).toDouble)
      assert(mn <= p25 && p25 <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
    // independent median for one language
    val lang = rows.head.getString(0)
    val vals = Tables.documents(spark, sfDir).filter(col("lang") === lang)
      .select(col("n_chars")).collect().map(_.getLong(0).toDouble).sorted
    val pos = 0.5 * (vals.length - 1)
    val (lo, hi) = (vals(pos.toInt), vals(math.ceil(pos).toInt))
    val expected = lo * (1 - (pos - pos.toInt)) + hi * (pos - pos.toInt)
    assert(math.abs(rows.head.getDouble(4) - expected) < 1e-6)
  }

  test("q53 funnel stages match an independent driver-side event walk") {
    val rows = WindowQueries.q53Funnel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val counts = rows.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p(1) <= p(0)), "funnel only narrows")
    rows.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    // independent recompute: per-user ordered scan of the raw events
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    var (nV, nC, nP) = (0L, 0L, 0L)
    byUser.values.foreach { es =>
      val vTs = es.filter(_._2 == "view").map(_._3).minOption
      val cTs = vTs.flatMap(v => es.filter(e => e._2 == "click" && e._3 > v).map(_._3).minOption)
      val pTs = cTs.flatMap(c => es.filter(e => e._2 == "purchase" && e._3 > c).map(_._3).minOption)
      if (vTs.isDefined) nV += 1
      if (cTs.isDefined) nC += 1
      if (pTs.isDefined) nP += 1
    }
    assert(counts.toSeq === Seq(byUser.size.toLong, nV, nC, nP))
  }

  test("q54 edit distance: shared-prefix duplicate pairs score 0, all pairs bounded") {
    val rows = graft.dedup.DedupQueries.q54EditDistance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dist, sim) = (r.getInt(2), r.getDouble(3))
      assert(dist >= 0 && dist <= graft.dedup.DedupQueries.EditPrefix)
      assert(sim >= 0.0 && sim <= 1.0)
      // exact dups are identical → prefix distance 0; near-dups append
      // a suffix, so the distance is bounded by the marker's length
      // (visible only when the base text is shorter than the prefix)
      val (da, db) = (r.getLong(0), r.getLong(1))
      if (db - da == graft.dedup.DedupQueries.ExactDupOffset)
        assert(dist === 0, s"pair ($da,$db) identical")
      if (db - da == graft.dedup.DedupQueries.NearDupOffset)
        assert(dist <= graft.dedup.DedupQueries.NearDupSuffix.length,
          s"pair ($da,$db) differs only by the marker suffix")
    }
  }

  test("q55 triangle counts match an independent set-based recount") {
    val rows = graft.queries.GraphQueries.q55Triangles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // independent recount on the collected (small) host graph
    val hedges = graph.WebGraph.hostEdges(graph.WebGraph.cachedEdges(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val und = hedges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .filter(p => p._1 != p._2).toSet
    val adj = (und.toSeq.flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = adj.map { case (v, ns) =>
      v -> ns.toSeq.combinations(2).count(p => und.contains(
        if (p(0) < p(1)) (p(0), p(1)) else (p(1), p(0)))).toLong
    }
    rows.foreach { r =>
      assert(r.getLong(2) === expected.getOrElse(r.getString(0), 0L),
        s"host ${r.getString(0)}")
      assert(r.getLong(1) === adj(r.getString(0)).size.toLong)
    }
  }

  test("q55 agrees with the GraphX TriangleCount backend") {
    val rows = graft.queries.GraphQueries.q55Triangles(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val hedges = graph.WebGraph.hostEdges(graph.WebGraph.cachedEdges(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val ids = hedges.flatMap(e => Seq(e._1, e._2)).distinct.sorted.zipWithIndex.toMap
    val g = org.apache.spark.graphx.Graph.fromEdges(
      spark.sparkContext.parallelize(hedges.toSeq.map { case (a, b) =>
        org.apache.spark.graphx.Edge(ids(a).toLong, ids(b).toLong, ())
      }), ())
    val tc = org.apache.spark.graphx.lib.TriangleCount.run(g)
      .vertices.collect().toMap
    assert(rows.size === ids.size)
    rows.foreach { case (host, n) =>
      assert(tc(ids(host).toLong).toLong === n, s"host $host")
    }
  }

  test("q56 Count-Min estimates only overcount and track exact frequencies") {
    val rows = TextQueries.q56Countmin(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"${r.getString(0)}: CMS must never undercount")
      assert(r.getLong(2) === r.getLong(1) + r.getLong(3))
    }
    // exact count of the top token cross-checked on the driver
    val top = rows.head
    val n = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === top.getString(0)).count()
    assert(top.getLong(1) === n)
  }

  test("q57 Pearson r and OLS match a mean-centered driver recompute") {
    val rows = TextQueries.q57Corr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
    val lang = rows.head.getString(0)
    val xy = Tables.documents(spark, sfDir).filter(col("lang") === lang)
      .select(col("n_chars"), size(split(col("text"), " ")))
      .collect().map(r => (r.getLong(0).toDouble, r.getInt(1).toDouble))
    val n = xy.length.toDouble
    val (mx, my) = (xy.map(_._1).sum / n, xy.map(_._2).sum / n)
    val cov = xy.map(p => (p._1 - mx) * (p._2 - my)).sum
    val (vx, vy) = (xy.map(p => (p._1 - mx) * (p._1 - mx)).sum,
      xy.map(p => (p._2 - my) * (p._2 - my)).sum)
    assert(math.abs(rows.head.getDouble(2) - cov / math.sqrt(vx * vy)) < 1e-6)
    assert(math.abs(rows.head.getDouble(3) - cov / vx) < 1e-6)
    assert(math.abs(rows.head.getDouble(4) - (my - (cov / vx) * mx)) < 1e-5)
  }

  test("q62 chunk dedup: exact duplicates are fully shared, near-dups mostly") {
    val rows = graft.multimodal.MultimodalQueries.q62ChunkDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    byId.foreach { case (id, (n, s, ratio, full)) =>
      assert(s <= n && ratio >= 0.0 && ratio <= 1.0 && full == (s == n), s"doc $id")
    }
    val nearOff = graft.dedup.DedupQueries.NearDupOffset
    val exactOff = graft.dedup.DedupQueries.ExactDupOffset
    val exactDups = byId.keys.filter(_ >= exactOff)
    assert(exactDups.nonEmpty)
    exactDups.foreach { id =>
      assert(byId(id)._4, s"exact dup $id must be fully shared")
      assert(byId(id - exactOff)._4, s"its base ${id - exactOff} too")
    }
    // near-dups (suffix append) share everything but the altered tail
    val nearDups = byId.keys.filter(id => id >= nearOff && id < exactOff)
    assert(nearDups.nonEmpty)
    // suffix append alters at most the tail chunk and adds one: with
    // n chunks, at least n-2 stay shared
    nearDups.filter(id => byId(id)._1 >= 4).foreach { id =>
      val (n, s, _, _) = byId(id)
      assert(s >= n - 2, s"near-dup $id shares all but the tail: $s of $n")
    }
  }

  test("q63 anomaly z-scores match a driver-side recompute of the worst hour") {
    val rows = TimeseriesQueries.q63Anomaly(spark, sfDir).collect()
    assert(rows.nonEmpty, "the toy SF has low-count hours beyond 2.5 sigma")
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > TimeseriesQueries.AnomalyZ))
    // recompute the flagged hour's z from scratch for one event type
    val t = rows.head.getString(0)
    val counts = Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(expr(s"(ts div 1000) div ${RelationalQueries.RjBinUs}").as("h"))
      .groupBy(col("h")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = counts.size.toDouble
    val mean = counts.values.sum / n
    val std = math.sqrt(counts.values.map(c => (c - mean) * (c - mean)).sum / n)
    val h = rows.head.getLong(1) / RelationalQueries.RjBinUs
    val z = (counts(h) - mean) / std
    assert(math.abs(rows.head.getDouble(3) - z) < 1e-6)
    assert(rows.head.getLong(2) === counts(h))
  }

  test("q51 pivot counts match the plain group-by and fill absent cells with 0") {
    val rows = TextQueries.q51Pivot(spark, sfDir).collect()
    val plain = Tables.documents(spark, sfDir)
      .groupBy(col("source"), col("lang")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(_.getString(0)).toSet ===
      plain.keySet.map(_._1), "every source present exactly once")
    rows.foreach { r =>
      val src = r.getString(0)
      TextQueries.PivotLangs.zipWithIndex.foreach { case (l, i) =>
        assert(r.getLong(i + 1) === plain.getOrElse((src, l), 0L), s"$src/$l")
      }
      assert(r.getLong(6) === TextQueries.PivotLangs.indices.map(i => r.getLong(i + 1)).sum)
    }
  }

  test("q85 ewma equals the literal α=1/2 recursion, spikes agree") {
    val rows = TimeseriesQueries.q85Ewma(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (key, series) =>
      val sorted = series.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq === (0L to 23L), s"$key full 24h grid")
      var s = 0.0
      sorted.zipWithIndex.foreach { case (r, t) =>
        val x = r.getLong(3).toDouble
        s = if (t == 0) x else (x + s) / 2.0 // the recursion, literally
        assert(math.abs(r.getAs[Double]("ewma") - s) < 1e-6, s"$key h$t")
        val expectSpike = t >= TimeseriesQueries.EwmaWarmupHours &&
          x > TimeseriesQueries.EwmaSpikeFactor * (if (t == 0) 0.0 else 2 * s - x)
        assert(r.getAs[Boolean]("spike") === expectSpike, s"$key h$t spike")
      }
    }
  }

  test("q93 retention matrix equals a driver-side cohort walk") {
    val rows = RelationalQueries.q93Retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = uw.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (c, xs) => c -> xs.size }
    val cells = uw.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .map { case (k, xs) => k -> xs.map(_._1).distinct.size }
    assert(rows.length === cells.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === sizes(key._1).toLong, s"$key cohort size")
      assert(r.getLong(3) === cells(key).toLong, s"$key active")
      assert(r.getLong(3) <= r.getLong(2), s"$key active <= cohort")
      if (key._2 == 0L)
        assert(r.getDouble(4) === 1.0, s"$key diagonal retention")
    }
  }

  test("q96 transition matrix rows are distributions and counts match a walk") {
    val rows = WindowQueries.q96Transitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // each from_type's p column is a probability distribution
    rows.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-4, s"$ft sums to $total")
    }
    // driver-side walk: same session rule, same pairing
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(_._2)
      val sessions = sorted.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, (_, ts, et)) =>
          acc match {
            case (h @ ((pts, _) :: _)) :: t if ts - pts <= 30L * 60 * 1000000 =>
              ((ts, et) :: h) :: t
            case _ => List((ts, et)) :: acc
          }
      }
      sessions.flatMap(s => s.reverse.map(_._2).sliding(2).collect {
        case Seq(a, b) => (a, b)
      })
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val got = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
  }

  test("q86 z-order buckets are tight rectangles, not full-range stripes") {
    val rows = StorageQueries.q86Zorder(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_orders")).sum === orders.count(), "buckets partition")
    assert(rows.length >= 2, "fixture spans multiple z-buckets")
    val custRange = orders.agg(max(col("o_custkey")) - min(col("o_custkey")))
      .head.getLong(0).toDouble
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cust") <= r.getAs[Long]("max_cust"))
      assert(r.getAs[Long]("day_span") >= 0)
    }
    // locality: the MEAN per-bucket customer span is well under the
    // full range (a date-sorted layout would leave it at ~the range)
    val meanSpan = rows.map(r =>
      (r.getAs[Long]("max_cust") - r.getAs[Long]("min_cust")).toDouble).sum / rows.length
    assert(meanSpan < 0.8 * custRange, s"mean cust span $meanSpan vs range $custRange")
  }
}
