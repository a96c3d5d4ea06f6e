package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.queries.{MlEvalQueries, RelationalQueries, StreamBatchQueries, TimeseriesQueries, WindowQueries}
import graft.ann.AnnQueries
import graft.dedup.DedupQueries

/** The twelve operators of the r8 breadth wave (q123–q134). Each test
  * recomputes the semantics a second, independent way (driver-side
  * walk, batch twin, closed form, or a differently-shaped plan) so the
  * DuckDB hash gate isn't the only line of defense.
  */
class W13OpsSpec extends GraftSpec {

  test("q123 unpivot totals equal four direct single-measure aggregations") {
    val got = RelationalQueries.q123Unpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val li = Tables.lineitem(spark, sfDir)
    for (m <- Seq("quantity", "extendedprice", "discount", "tax")) {
      val want = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col(s"l_$m").cast("decimal(38,6)")).cast("double"), 6).as("t"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      want.foreach { case (flag, (n, t)) =>
        assert(got((flag, m)) === ((n, t)), s"measure $m flag $flag")
      }
    }
  }

  test("q124 SCD2 intervals replay a driver-side walk of each user's stream") {
    val rows = RelationalQueries.q124Scd2(spark, sfDir).collect()
    val byUser = rows.groupBy(_.getLong(0))
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    assert(byUser.keySet === events.keySet)
    byUser.foreach { case (uid, ivs) =>
      val sorted = ivs.sortBy(_.getLong(1))
      // versions are contiguous from 1 and exactly one interval is open
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.count(_.getBoolean(6)) === 1)
      assert(sorted.last.isNullAt(5) && sorted.last.getBoolean(6))
      // valid_to chains to the next island's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) === b.getLong(4), s"user $uid chain")
        case _ => ()
      }
      // driver-side walk: collapse the type sequence into runs
      val walk = events(uid).sortBy(e => (e._2, e._3)).map(_._4)
        .foldLeft(List.empty[(String, Long)]) {
          case ((t, n) :: rest, e) if t == e => (t, n + 1) :: rest
          case (acc, e) => (e, 1L) :: acc
        }.reverse
      assert(sorted.map(r => (r.getString(2), r.getLong(3))).toSeq === walk,
        s"user $uid run-length walk")
    }
  }

  test("q125 attribution replays a driver-side last-touch walk") {
    val got = WindowQueries.q125Attribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val attributed = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      var lastTouch: String = null
      evs.sortBy(e => (e._2, e._3)).flatMap { e =>
        val out = if (e._4 == "purchase") Some((if (lastTouch == null) "none" else lastTouch, e._5)) else None
        if (e._4 != "purchase") lastTouch = e._4
        out
      }
    }
    val want = attributed.groupBy(_._1).map { case (t, xs) =>
      t -> (xs.size.toLong,
        (BigDecimal(0) /: xs.map(x => BigDecimal(x._2)))(_ + _))
    }
    assert(got.keySet === want.keySet)
    want.foreach { case (t, (n, rev)) =>
      assert(got(t)._1 === n, s"touch $t count")
      assert(math.abs(got(t)._2 - rev.toDouble) < 1e-4, s"touch $t revenue")
    }
    val shareSum = WindowQueries.q125Attribution(spark, sfDir)
      .agg(sum(col("rev_share"))).first().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-5, "shares sum to 1")
  }

  test("q126 Bloom semijoin equals the plain (sketch-free) join") {
    val got = RelationalQueries.q126BloomSemijoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val want = Tables.lineitem(spark, sfDir)
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice").cast("decimal(38,6)")).cast("double"), 6))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q127 Spearman matches a driver-side average-tie-rank computation") {
    val got = MlEvalQueries.q127Spearman(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (flag, xs) =>
      def avgRanks(vs: Array[Double]): Array[Double] = {
        val byVal = vs.zipWithIndex.sortBy(_._1)
        val out = new Array[Double](vs.length)
        var i = 0
        while (i < byVal.length) {
          var j = i
          while (j < byVal.length && byVal(j)._1 == byVal(i)._1) j += 1
          val r = (i + 1 + j) / 2.0 // mean of ranks i+1..j
          (i until j).foreach(k => out(byVal(k)._2) = r)
          i = j
        }
        out
      }
      val rx = avgRanks(xs.map(_._2))
      val ry = avgRanks(xs.map(_._3))
      val n = rx.length.toDouble
      val mx = rx.sum / n
      val my = ry.sum / n
      val num = rx.indices.map(i => (rx(i) - mx) * (ry(i) - my)).sum
      val den = math.sqrt(rx.map(v => (v - mx) * (v - mx)).sum *
        ry.map(v => (v - my) * (v - my)).sum)
      val rho = num / den
      assert(got(flag)._1 === xs.length.toLong)
      assert(math.abs(got(flag)._2 - rho) < 1e-6, s"flag $flag rho")
    }
  }

  test("q128 Gini matches the driver-side sorted closed form per segment") {
    val got = MlEvalQueries.q128Gini(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val spend = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(38,6)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    spend.groupBy(_._1).foreach { case (seg, xs) =>
      val v = xs.map(_._2).sorted
      val n = v.length
      val sx = v.sum
      val sxr = v.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val gini = (2 * sxr - (n + 1) * sx) / (n * sx)
      assert(got(seg)._1 === n.toLong)
      assert(math.abs(got(seg)._2 - gini) < 1e-6, s"segment $seg")
      assert(got(seg)._2 >= 0.0 && got(seg)._2 < 1.0)
    }
  }

  test("q129 profile agrees with direct per-column aggregates") {
    val got = RelationalQueries.q129Profile(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val o = Tables.orders(spark, sfDir)
    val nRows = o.count()
    assert(got.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    got.values.foreach { r =>
      assert(r.getLong(1) === nRows)
      assert(r.getLong(2) === 0L, s"${r.getString(0)} nulls")
    }
    assert(got("o_orderkey").getLong(3) === nRows, "orderkey is unique")
    val nd = o.select(countDistinct(col("o_orderstatus"))).first().getLong(0)
    assert(got("o_orderstatus").getLong(3) === nd)
    assert(got("o_orderstatus").isNullAt(4) && got("o_orderstatus").isNullAt(5))
    val (mn, mx) = {
      val r = o.agg(min(col("o_totalprice")), max(col("o_totalprice"))).first()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(math.abs(got("o_totalprice").getDouble(4) - mn) < 1e-6)
    assert(math.abs(got("o_totalprice").getDouble(5) - mx) < 1e-6)
  }

  test("q130 normalization catches the mangled twins raw md5 misses, and only adds groups") {
    val rows = DedupQueries.q130NormDedup(spark, sfDir).collect()
    val mangled = rows.filter(_.getLong(0) >= 3000000000L)
    assert(mangled.nonEmpty)
    mangled.foreach { r =>
      assert(r.getBoolean(2), s"doc ${r.getLong(0)} must be a norm-dup")
      assert(!r.getBoolean(3), s"doc ${r.getLong(0)} must NOT be a raw-dup")
      // canonical is the unmangled original
      assert(r.getLong(1) === r.getLong(0) - 3000000000L)
    }
    // normalization only merges: every raw dup is also a norm dup
    rows.foreach { r =>
      if (r.getBoolean(3)) assert(r.getBoolean(2),
        s"doc ${r.getLong(0)}: raw dup must stay a dup under normalization")
    }
  }

  test("q131 triplets: labels partition correctly and margins are consistent") {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = AnnQueries.q131Triplets(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (qid, ts) =>
      assert(ts.map(_.getInt(1)).sorted.toSeq === (1 to ts.length),
        s"qid $qid contiguous ranks")
      assert(ts.length <= AnnQueries.NegK)
      ts.foreach { t =>
        assert(labels(t.getLong(2)) === labels(qid), s"qid $qid positive label")
        assert(labels(t.getLong(3)) !== labels(qid), s"qid $qid negative label")
        assert(math.abs(t.getDouble(6) - BigDecimal(t.getDouble(4) - t.getDouble(5))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"qid $qid margin arithmetic")
        assert(t.getDouble(4) <= 1.000001 && t.getDouble(5) <= 1.000001)
      }
      // negatives are ranked by descending cosine
      assert(ts.sortBy(_.getInt(1)).map(_.getDouble(5)).toSeq
        === ts.map(_.getDouble(5)).sorted.reverse.toSeq)
    }
  }

  test("q132 streaming dedup equals the batch DISTINCT") {
    val got = StreamBatchQueries.q132StreamDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val want = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (expr("ts div 3600000000000") * 3600000000000L).as("hour"))
      .distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // the dedup must actually collapse something, or the gate is vacuous
    val raw = Tables.events(spark, sfDir).count()
    assert(got.map(_._2).sum < raw, "duplicate (user,type,hour) keys exist")
  }

  test("q133 incremental merge equals the single-pass full aggregate") {
    val got = RelationalQueries.q133IncrAgg(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(5))).toSet
    val want = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 6).as("t"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double") / count(lit(1)), 6).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === want)
  }

  test("q134 cross-correlation: lag 0 equals the direct Pearson numerator ratio") {
    val rows = TimeseriesQueries.q134CrossCorr(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === (-TimeseriesQueries.CcfMaxLag.toLong
      to TimeseriesQueries.CcfMaxLag.toLong).toSet)
    // driver-side zero-filled series
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("ts div 86400000000000").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val days = ev.map(_._1).distinct.sorted
    def series(t: String): Array[Long] = {
      val m = ev.filter(_._2 == t).groupBy(_._1).map { case (d, xs) => d -> xs.length.toLong }
      days.map(d => m.getOrElse(d, 0L))
    }
    val a = series("click")
    val b = series("purchase")
    val n = days.length.toLong
    val ca = a.map(x => n * x - a.sum)
    val cb = b.map(x => n * x - b.sum)
    def dot(u: Array[Long], v: Array[Long]): Double =
      u.indices.map(i => u(i).toDouble * v(i)).sum
    val r0 = dot(ca, cb) / math.sqrt(dot(ca, ca) * dot(cb, cb))
    assert(rows(0L)._1 === n)
    assert(math.abs(rows(0L)._2 - r0) < 1e-6)
    rows.values.foreach { case (_, c) => assert(c >= -1.0001 && c <= 1.0001) }
  }
}
