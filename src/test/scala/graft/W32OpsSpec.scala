package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries, StorageQueries}

/** Wave-32 operators (q184–q185): ORC round trip, distributed OLS. */
class W32OpsSpec extends GraftSpec {

  test("q184 ORC round trip preserves the per-type census exactly") {
    val rows = StorageQueries.q184OrcIo(spark, sfDir).collect()
    val want = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)), sum(expr("ts % 1000000007")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.map(_.getString(0)).toSet === want.keySet)
    rows.foreach { r =>
      val (n, tsum) = want(r.getString(0))
      assert(r.getLong(1) === n, s"${r.getString(0)} rows")
      assert(r.getLong(2) === tsum, s"${r.getString(0)} ts fingerprint")
    }
  }

  test("q185 OLS matches a driver-side normal-equations solve") {
    val row = MlEvalQueries.q185Ols(spark, sfDir).collect().head
    val data = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity"), col("l_discount"), col("l_extendedprice"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val n = data.length.toDouble
    val sx1 = data.map(d => r6(d._1)).sum
    val sx2 = data.map(d => r6(d._2)).sum
    val sy = data.map(d => r6(d._3)).sum
    val sx11 = data.map(d => r6(d._1 * d._1)).sum
    val sx12 = data.map(d => r6(d._1 * d._2)).sum
    val sx22 = data.map(d => r6(d._2 * d._2)).sum
    val sx1y = data.map(d => r6(d._1 * d._3)).sum
    val sx2y = data.map(d => r6(d._2 * d._3)).sum
    val syy = data.map(d => r6(d._3 * d._3)).sum
    val det = n * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx12 - sx11 * sx2)
    val b0 = (sy * (sx11 * sx22 - sx12 * sx12) - sx1 * (sx1y * sx22 - sx12 * sx2y) +
      sx2 * (sx1y * sx12 - sx11 * sx2y)) / det
    val b1 = (n * (sx1y * sx22 - sx12 * sx2y) - sy * (sx1 * sx22 - sx12 * sx2) +
      sx2 * (sx1 * sx2y - sx1y * sx2)) / det
    val b2 = (n * (sx11 * sx2y - sx1y * sx12) - sx1 * (sx1 * sx2y - sx1y * sx2) +
      sy * (sx1 * sx12 - sx11 * sx2)) / det
    assert(row.getLong(0) === data.length.toLong)
    assert(math.abs(row.getDouble(1) - b0) < 1e-3, "intercept")
    assert(math.abs(row.getDouble(2) - b1) < 1e-4, "b_quantity")
    assert(math.abs(row.getDouble(3) - b2) < 1e-2, "b_discount")
    // residual invariants on the fitted model
    val sse = syy - b0 * sy - b1 * sx1y - b2 * sx2y
    val sst = syy - sy * sy / n
    assert(math.abs(row.getDouble(4) - (1.0 - sse / sst)) < 1e-4, "r2")
    // the synthetic generator draws price INDEPENDENTLY of quantity and
    // discount — the honest fit is R² ≈ 0, and the regression reporting
    // that is the diagnostic working; only the range is invariant
    assert(row.getDouble(4) >= -1e-9 && row.getDouble(4) <= 1.0)
    assert(math.abs(row.getDouble(5) - math.sqrt(sse / n)) < 1e-1, "rmse")
  }
}
