package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.queries.TpchQueries

/** Wave-43 operators (q219–q222): the TPC-H outer-join distribution
  * (Q13), dormant-accounts anti-join (Q22 shape), argmax-supplier
  * (Q15), and correlated per-part average (Q17).
  */
class W43OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def us(s: String): Long =
    java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L

  test("q219 Q13 matches a driver-side distribution replay, zeros included") {
    val rows = TpchQueries.q219CustDist(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir).select(col("o_custkey")).collect()
      .groupBy(_.getLong(0)).map { case (k, xs) => k -> xs.length.toLong }
    val custs = Tables.customer(spark, sfDir).select(col("c_custkey")).collect()
      .map(_.getLong(0))
    val dist = custs.map(c => orders.getOrElse(c, 0L))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(rows.map(_.getLong(0)).toSet === dist.keySet)
    rows.foreach(r => assert(r.getLong(1) === dist(r.getLong(0))))
    // conservation: the distribution covers every customer
    assert(rows.map(_.getLong(1)).sum === custs.length.toLong)
  }

  test("q220 dormant accounts: anti-join replay, every row beats the mean") {
    val rows = TpchQueries.q220Dormant(spark, sfDir).collect()
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val abar = {
      val pos = cust.filter(_._2 > 0)
      (pos.map(c => BigDecimal(c._2)).sum / pos.length).toDouble
    }
    val active = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .filter(_.getLong(1) >= us(TpchQueries.Q22Cutoff))
      .map(_.getLong(0)).toSet
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val dormant = cust.filter(c => c._2 > abar && !active(c._1))
    val byNation = dormant.groupBy(c => nation(c._3))
      .map { case (n, xs) => n -> (xs.length.toLong, xs.map(c => BigDecimal(c._2)).sum) }
    assert(rows.map(_.getString(0)).toSet === byNation.keySet)
    rows.foreach { r =>
      val (n, bal) = byNation(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - bal.toDouble) < 1e-4)
    }
    assert(dormant.nonEmpty, "fixture must have dormant accounts")
  }

  test("q221 Q15 finds exactly the argmax supplier(s)") {
    val rows = TpchQueries.q221TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), unix_micros(col("l_shipdate").cast("timestamp")),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .filter { r =>
        val d = r.getLong(1)
        d >= us(TpchQueries.Q15From) && d < us(TpchQueries.Q15Until)
      }
    val bySupp = li.groupBy(_.getLong(0)).map { case (k, xs) =>
      k -> xs.map(r => BigDecimal(r.getDouble(2)) * (BigDecimal(1) - BigDecimal(r.getDouble(3)))).sum
    }
    val rmax = bySupp.values.max
    val winners = bySupp.filter(_._2 == rmax).keys.toSeq.sorted
    assert(rows.map(_.getLong(0)).toSeq === winners)
    rows.foreach(r => assert(math.abs(r.getDouble(2) - rmax.toDouble) < 1e-4))
  }

  test("q222 Q17 matches a driver-side correlated-average replay") {
    val row = TpchQueries.q222SmallQty(spark, sfDir).collect().head
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val qbar = li.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(x => BigDecimal(x._2)).sum / xs.length).toDouble }
    val small = li.filter(x => x._2 < TpchQueries.Q17Frac * qbar(x._1))
    assert(row.getLong(1) === small.length.toLong)
    assert(math.abs(row.getDouble(0) - small.map(x => BigDecimal(x._3)).sum.toDouble) < 1e-4)
  }

  test("wave-43 plans: outer join aggregates pre-join, anti join for NOT EXISTS, single scans") {
    val p219 = formatted(TpchQueries.q219CustDist(spark, sfDir))
    assert(!p219.contains("CartesianProduct"))
    val p220 = formatted(TpchQueries.q220Dormant(spark, sfDir))
    assert(p220.contains("LeftAnti"), "NOT EXISTS compiles to anti join")
    assert(p220.contains("GreaterThanOrEqual(o_orderdate"), "cutoff pushed")
    val p221 = formatted(TpchQueries.q221TopSupplier(spark, sfDir))
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p221).length <= 1,
      "the checkpointed aggregate leaves only the supplier dim scan")
    Checkpoints.drain(spark)
    val p222 = formatted(TpchQueries.q222SmallQty(spark, sfDir))
    assert(p222.contains("partial_"), "per-part average partial-aggs")
  }
}
