package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries
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
}
