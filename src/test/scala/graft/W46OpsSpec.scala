package graft

import org.apache.spark.sql.functions._
import graft.queries.PartsuppQueries

/** Wave-46 operators: the partsupp-dependent TPC-H shapes (q228–q232)
  * over the derived fixture, cross-checked by driver-side recomputes
  * independent of the Spark plans.
  */
class W46OpsSpec extends GraftSpec {

  /** The derived partsupp rows replayed with plain Scala arithmetic. */
  private lazy val psRows: Seq[(Long, Long, Long, Double)] = {
    val s = Tables.supplier(spark, sfDir).count()
    val parts = Tables.part(spark, sfDir).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSeq
    for (pk <- parts; i <- 0L to 3L) yield {
      val sk = (pk + i * (s / 4)) % s
      (pk, sk, (pk * 31 + sk * 17) % 9991 + 1,
        ((pk * 131 + sk * 1009) % 99900 + 100).toDouble / 100.0)
    }
  }

  test("Tables.partsupp matches the driver-side derivation exactly") {
    val got = Tables.partsupp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === psRows.sortBy(t => (t._1, t._2)))
    // 4 distinct suppliers per part (the TPC-H cardinality contract)
    assert(psRows.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 4))
  }

  test("q228 emits exactly the region min-cost suppliers (all ties)") {
    val rows = PartsuppQueries.q228MinCostSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver-side recompute of the min cost per part over ASIA suppliers
    val nat = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === PartsuppQueries.Q2Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val regionSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey").isin(nat.toSeq: _*))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val minCost = psRows.filter(t => regionSupp(t._2))
      .groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    rows.foreach { r =>
      val (pk, cost) = (r.getLong(3), r.getDouble(6))
      assert(math.abs(cost - minCost(pk)) < 1e-9,
        s"part $pk emitted cost $cost != region min ${minCost(pk)}")
    }
  }

  test("q229 profit recomputes from raw lines for one nation-year") {
    val rows = PartsuppQueries.q229ProductProfit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val (nation, yr) = (rows.head.getString(0), rows.head.getInt(1))
    val ps = psRows.map(t => (t._1, t._2) -> t._4).toMap
    val suppNat = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val redPk = Tables.part(spark, sfDir)
      .filter(col("p_name").contains(PartsuppQueries.Q9Color))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val orderYear = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), year(col("o_orderdate").cast("timestamp")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .filter(r => redPk(r.getLong(1)) && suppNat(r.getLong(2)) &&
        ps.contains((r.getLong(1), r.getLong(2))) &&
        orderYear(r.getLong(0)) == yr)
      .map(r => BigDecimal(
        r.getDouble(4) * (1.0 - r.getDouble(5)) -
          ps((r.getLong(1), r.getLong(2))) * r.getDouble(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val got = rows.head
    assert(got.getLong(3) === expected.length.toLong, "n_lines")
    assert(math.abs(got.getDouble(2) - expected.sum.toDouble) < 1e-5, "profit")
  }

  test("q231 census excludes complained-about suppliers and q232 threshold holds") {
    val complainers = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    // q231: recompute one census cell
    val census = PartsuppQueries.q231SupplierCensus(spark, sfDir).collect()
    assert(census.nonEmpty)
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getInt(3)))
      .toMap
    census.take(5).foreach { c =>
      val key = (c.getString(0), c.getString(1), c.getInt(2))
      val expect = psRows.filter { t =>
        parts.get(t._1).contains(key) && !complainers(t._2)
      }.map(_._2).distinct.size
      assert(c.getLong(3) === expect.toLong, s"census cell $key")
    }
    // q232: every emitted supplier really holds excess stock of a red part
    val q232 = PartsuppQueries.q232PartPromotion(spark, sfDir).collect()
    assert(q232.nonEmpty)
    val redPk = Tables.part(spark, sfDir)
      .filter(col("p_name").startsWith(PartsuppQueries.Q20Color))
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val shipped = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(PartsuppQueries.Q20From).cast("timestamp") &&
        col("l_shipdate") < lit(PartsuppQueries.Q20Until).cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.map(_.getDouble(2)).sum).toMap
    val expectSupp = psRows.filter { t =>
      redPk(t._1) && shipped.get((t._1, t._2)).exists(q => t._3 * 2 > q)
    }.map(_._2).distinct.sorted
    assert(q232.map(_.getLong(0)).toSeq.sorted === expectSupp)
  }

  test("q230 emits the heavy tail against the 2x-mean threshold") {
    val rows = PartsuppQueries.q230ImportantStock(spark, sfDir).collect()
    assert(rows.nonEmpty, "q230 must be non-degenerate at every SF")
    val natKeys = Tables.nation(spark, sfDir)
      .filter(col("n_name").isin(PartsuppQueries.Q11Nations: _*))
      .select(col("n_nationkey")).collect().map(_.getInt(0)).toSet
    val natSupp = Tables.supplier(spark, sfDir)
      .filter(col("s_nationkey").isin(natKeys.toSeq: _*))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val byPart = psRows.filter(t => natSupp(t._2))
      .groupBy(_._1).view.mapValues(_.map(t =>
        BigDecimal(t._4 * t._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum)
      .toMap
    val total = byPart.values.sum
    val expect = byPart.filter { case (_, v) => v * byPart.size > total * 2 }
      .keySet
    assert(rows.map(_.getLong(0)).toSet === expect)
  }
}
