package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, RelationalQueries}
import graft.text.TextQueries

/** Wave-26 operators (q167–q169): per-source heavy hitters, TPC-H
  * Q21-shape waiting suppliers, rank-driven crawl-frontier schedule.
  */
class W26OpsSpec extends GraftSpec {

  test("q167 heavy hitters replay an exact driver-side count") {
    val rows = TextQueries.q167HeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(1))
        .map(t => (r.getString(0), t)))
    val cnt = toks.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val tot = toks.groupBy(_._1).map { case (s, xs) => s -> xs.length.toLong }
    val want = cnt.filter { case ((s, _), c) =>
      c * TextQueries.HhDen >= tot(s) && c >= TextQueries.HhMinCount }
    assert(rows.length === want.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(want(key) === r.getLong(2), s"count for $key")
      assert(r.getLong(3) === tot(r.getString(0)))
      assert(math.abs(r.getDouble(4) - r.getLong(2).toDouble / r.getLong(3)) < 1e-6)
    }
  }

  test("q168 waiting suppliers: every counted order has the sole-late property") {
    val rows = RelationalQueries.q168WaitingSuppliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver-side replay of the whole correlate
    val fo = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp"))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lateDays = RelationalQueries.WaitLateDays * 86400L * 1000000L
    val late = li.collect {
      case (ok, sk, ship) if fo.contains(ok) && ship > fo(ok) + lateDays => (ok, sk)
    }.distinct
    val pairs = li.map(x => (x._1, x._2)).distinct
    val byOrder = pairs.groupBy(_._1)
    val lateByOrder = late.groupBy(_._1)
    val cand = late.filter { case (ok, sk) =>
      byOrder(ok).exists(_._2 != sk) && !lateByOrder(ok).exists(_._2 != sk)
    }
    val names = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = cand.groupBy(x => names(x._2))
      .map { case (n, xs) => n -> xs.length.toLong }
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === want)
  }

  test("q169 frontier interleaves hosts and ranks slots by host score") {
    val rows = GraphQueries.q169CrawlFrontier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.length <= GraphQueries.FrontierN)
    // positions are 1..n and ordered by (slot, score desc, host, url)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    val keyed = rows.map(r => (r.getInt(3), -r.getDouble(4), r.getString(2),
      r.getString(1)))
    assert(keyed.toSeq === keyed.sortBy(identity).toSeq, "schedule order")
    // within a host, slots are 1..k over lexicographically sorted urls
    rows.groupBy(_.getString(2)).foreach { case (h, hs) =>
      val sorted = hs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to hs.length),
        s"host $h slots (frontier may truncate tails, but prefixes are dense)")
      assert(sorted.map(_.getString(1)).toSeq ===
        sorted.map(_.getString(1)).sorted.toSeq, s"host $h url order")
    }
    // the first wave (slot=1) is host-score-descending
    val wave1 = rows.filter(_.getInt(3) == 1).map(_.getDouble(4))
    assert(wave1.toSeq === wave1.sortBy(-_).toSeq)
    // every page of the cleaned graph appears at most once
    assert(rows.map(_.getString(1)).distinct.length === rows.length)
  }
}
