package graft

import graft.queries.{RelationalQueries, WindowQueries}

class RelationalSpec extends GraftSpec {

  test("q11 pricing summary groups by flag+status and sums exactly") {
    val rows = RelationalQueries.q11PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 1000, s"expected a large share of ~6000 lineitems, got $total")
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("avg_price") > 0)
    }
  }

  test("q12 top customers returns 10 descending revenues") {
    val rows = RelationalQueries.q12TopCustomers(spark, sfDir).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q13 market shares sum to 1 per year") {
    val rows = RelationalQueries.q13MarketShare(spark, sfDir).collect()
    rows.groupBy(_.getAs[Int]("o_year")).foreach { case (_, g) =>
      val s = g.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares sum to $s")
    }
  }

  test("q14 window rank keeps at most 5 per nation; running total is the prefix sum") {
    val rows = WindowQueries.q14WindowRank(spark, sfDir).collect()
    rows.groupBy(_.getAs[Int]("c_nationkey")).foreach { case (_, g) =>
      assert(g.length <= 5)
      val sorted = g.sortBy(_.getAs[Int]("bal_rank"))
      // running_bal must equal the cumulative sum of acctbal exactly
      // (to rounding) — acctbal can be negative, so recompute directly
      // instead of asserting monotonicity.
      val prefix = sorted.map(_.getAs[Double]("acctbal")).scanLeft(0.0)(_ + _).tail
      sorted.map(_.getAs[Double]("running_bal")).zip(prefix).foreach {
        case (got, want) => assert(math.abs(got - want) < 1e-4, s"$got vs $want")
      }
    }
  }

  test("q15 sessionization covers every event exactly once") {
    val sessions = WindowQueries.q15Sessionize(spark, sfDir).collect()
    val nEvents = sessions.map(_.getAs[Long]("n_events")).sum
    val total = Tables.events(spark, sfDir).count()
    assert(nEvents == total)
    sessions.foreach { r =>
      assert(r.getAs[Long]("session_end_us") >= r.getAs[Long]("session_start_us"))
    }
  }

  test("q16 tumbling window partitions all events") {
    val rows = WindowQueries.q16TumblingWindow(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n_events")).sum
    assert(n == Tables.events(spark, sfDir).count())
    assert(rows.forall(_.getAs[Long]("window_start_us") % 3600000000L == 0))
  }

  test("q17 as-of join: one row per error, attributed click strictly precedes it") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val nErrors = ev.filter(col("event_type") === "error").count()
    val rows = RelationalQueries.q17AsofJoin(spark, sfDir).collect()
    assert(rows.length.toLong === nErrors)
    val matched = rows.filter(!_.isNullAt(2))
    assert(matched.nonEmpty)
    matched.foreach(r => assert(r.getAs[Long]("gap_us") > 0L, r))
    // brute-force check on one user: the attribution is the max click
    // ts strictly below the error ts
    val uid = matched.head.getAs[Long]("user_id")
    val evU = ev.filter(col("user_id") === uid)
      .select(col("event_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
      .collect()
    val clicks = evU.filter(_.getString(1) == "click").map(r => (r.getLong(2), r.getLong(0)))
    rows.filter(_.getAs[Long]("user_id") == uid).foreach { r =>
      val errTs = evU.find(_.getLong(0) == r.getAs[Long]("event_id")).get.getLong(2)
      val want = clicks.filter(_._1 < errTs).sortBy(c => (c._1, c._2)).lastOption
      (want, Option(r.getAs[java.lang.Long]("click_id"))) match {
        case (Some((cts, cid)), Some(got)) =>
          assert(got.longValue === cid, s"error at $errTs")
          assert(r.getAs[Long]("gap_us") === errTs - cts)
        case (None, None) => ()
        case other => fail(s"attribution mismatch for error at $errTs: $other")
      }
    }
  }
}
