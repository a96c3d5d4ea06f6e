package graft

import org.apache.spark.sql.functions._
import graft.ann.AnnQueries
import graft.queries.{MlEvalQueries, RelationalQueries, TimeseriesQueries}

/** Wave-34 operators (q189–q191): ALS sweep, class separability,
  * STL-lite decomposition.
  */
class W34OpsSpec extends GraftSpec {

  test("q189 ALS sweep improves the fit and the math replays on the driver") {
    val row = MlEvalQueries.q189AlsSweep(spark, sfDir).collect().head
    val inter = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(row.getLong(0) === inter.length.toLong)
    assert(row.getLong(1) === inter.map(_._1).distinct.length.toLong)
    assert(row.getLong(2) === inter.map(_._2).distinct.length.toLong)
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    import graft.functions.{MathFunctions => M}
    def uh(id: Long, k: Int): Long = {
      val x = (M.hashA(k) * id + M.hashB(k)) % M.HashP
      (if (x < 0) x + M.HashP else x) % 1000L
    }
    val vi = inter.map(_._2).distinct.map(i =>
      i -> (0.5 + uh(i, MlEvalQueries.AlsSeedA) / 2000.0,
        0.5 + uh(i, MlEvalQueries.AlsSeedB) / 2000.0)).toMap
    val lam = MlEvalQueries.AlsLambda
    def solveSide(rows: Seq[(Long, Double, (Double, Double))]) =
      rows.groupBy(_._1).map { case (k, xs) =>
        var (a11, a12, a22, b1, b2) = (0.0, 0.0, 0.0, 0.0, 0.0)
        xs.foreach { case (_, r, (f1, f2)) =>
          a11 += r6(f1 * f1); a12 += r6(f1 * f2); a22 += r6(f2 * f2)
          b1 += r6(r * f1); b2 += r6(r * f2)
        }
        val det = (lam + a11) * (lam + a22) - a12 * a12
        k -> (((lam + a22) * b1 - a12 * b2) / det,
          ((lam + a11) * b2 - a12 * b1) / det)
      }
    val uf = solveSide(inter.map { case (u, i, r) => (u, r, vi(i)) }.toSeq)
    val vf = solveSide(inter.map { case (u, i, r) => (i, r, uf(u)) }.toSeq)
    def rmse(items: Map[Long, (Double, Double)]) = {
      val se = inter.map { case (u, i, r) =>
        val (u1, u2) = uf(u); val (v1, v2) = items(i)
        r6((r - (u1 * v1 + u2 * v2)) * (r - (u1 * v1 + u2 * v2)))
      }.sum
      math.sqrt(se / inter.length)
    }
    assert(math.abs(row.getDouble(3) - rmse(vi)) < 1e-4, "rmse after half-step")
    assert(math.abs(row.getDouble(4) - rmse(vf)) < 1e-4, "rmse after full sweep")
    // the item half-step must not worsen the fit it optimizes
    assert(row.getDouble(4) <= row.getDouble(3) + 1e-6)
  }

  test("q190 separability: cohesion beats confusion on labeled clusters") {
    val rows = AnnQueries.q190ClassSeparability(spark, sfDir).collect()
    val nLabels = Tables.embeddings(spark, sfDir)
      .select("label").distinct().count()
    assert(rows.length === nLabels.toInt)
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) === rows.head.getDouble(3), "shared inter_cos")
      assert(math.abs(r.getDouble(4) - (r.getDouble(2) - r.getDouble(3))) < 1e-6)
      // members resemble their own centroid more than centroids resemble
      // each other — labels are real clusters in the fixture
      assert(r.getDouble(4) > 0.0, s"label ${r.getInt(0)} margin")
    }
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sfDir).count())
  }

  test("q191 STL-lite: decomposition replays and seasonal terms center near 0") {
    val rows = TimeseriesQueries.q191StlLite(spark, sfDir).collect()
    assert(rows.length === 24)
    val series = Tables.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).cast("double").as("y"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    val H = TimeseriesQueries.StlHalf
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    val det = series.indices.collect {
      case i if i >= H && i < series.length - H =>
        val win = series.slice(i - H, i + H + 1).map(_._2)
        (series(i)._1 % 24, series(i)._2 - r6(win.sum / win.length))
    }
    val seasonal = det.groupBy(_._1).map { case (hod, xs) =>
      hod -> r6(xs.map(_._2).sum / xs.length) }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - seasonal(r.getLong(0))) < 1e-5,
        s"hod ${r.getLong(0)} seasonal")
    }
    // variance split: residual cannot exceed detrended; strength in [0, 1]
    val r0 = rows.head
    assert(r0.getDouble(4) <= r0.getDouble(3) + 1e-9)
    assert(r0.getDouble(5) >= 0.0 && r0.getDouble(5) <= 1.0)
    // seasonal means sum to ~0 (they are residuals of a mean)
    assert(math.abs(rows.map(_.getDouble(2)).sum) < 1.0)
  }
}
