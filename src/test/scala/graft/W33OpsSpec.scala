package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries}

/** Wave-33 operators (q186–q188): logistic regression, decision stump,
  * precision-recall sweep — all over the shared (activity, converted)
  * training frame.
  */
class W33OpsSpec extends GraftSpec {

  private def labeled(): Array[(Double, Double)] =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("x"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === MlEvalQueries.AbLastDay, 1.0)
          .otherwise(0.0)).as("y"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))

  test("q186 IRLS replays a driver-side Newton loop") {
    val row = MlEvalQueries.q186Logreg(spark, sfDir).collect().head
    val data = labeled()
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    var (b0, b1) = (0.0, 0.0)
    for (_ <- 1 to MlEvalQueries.LogregIters) {
      var (sw, swx, swxx, swz, swxz) = (0.0, 0.0, 0.0, 0.0, 0.0)
      data.foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        val w = p * (1.0 - p)
        val z = (b0 + b1 * x) + (y - p) / w
        sw += r6(w); swx += r6(w * x); swxx += r6(w * x * x)
        swz += r6(w * z); swxz += r6(w * x * z)
      }
      val nb1 = (sw * swxz - swx * swz) / (sw * swxx - swx * swx)
      val nb0 = (swz - nb1 * swx) / sw
      b0 = nb0; b1 = nb1
    }
    assert(row.getLong(0) === data.length.toLong)
    assert(math.abs(row.getDouble(1) - b0) < 1e-4, "intercept")
    assert(math.abs(row.getDouble(2) - b1) < 1e-5, "slope")
    val ll = data.map { case (x, y) =>
      val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
      r6(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)))
    }.sum / data.length
    assert(math.abs(row.getDouble(3) - ll) < 1e-4, "log-loss")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
    // log-loss beats the coin-flip bound only if the fit is sane
    assert(row.getDouble(3) < 0.70, "worse than ln 2 + slack means divergence")
  }

  test("q187 stump picks the maximal-gain split of the exact histogram") {
    val row = MlEvalQueries.q187Stump(spark, sfDir).collect().head
    val data = labeled()
    val hist = data.groupBy(_._1).map { case (x, xs) =>
      (x, xs.map(_._2).sum.toLong, xs.length.toLong) }.toSeq.sortBy(_._1)
    val nt = hist.map(_._3).sum
    val pt = hist.map(_._2).sum
    def gini(p: Long, n: Long) =
      2.0 * (p.toDouble / n) * (1.0 - p.toDouble / n)
    var (nl, pl) = (0L, 0L)
    val splits = hist.dropRight(1).map { case (x, pos, n) =>
      nl += n; pl += pos
      val gain = gini(pt, nt) - (nl.toDouble / nt) * gini(pl, nl) -
        ((nt - nl).toDouble / nt) * gini(pt - pl, nt - nl)
      (x, nl, pl, gain)
    }
    val best = splits.maxBy { case (x, _, _, g) => (g, -x) }
    assert(row.getDouble(0) === best._1)
    assert(row.getLong(1) === best._2 && row.getLong(3) === best._3)
    assert(math.abs(row.getDouble(5) - best._4) < 1e-6)
    assert(row.getDouble(5) >= 0.0, "gini gain of the best split is non-negative")
    assert(row.getLong(1) + row.getLong(2) === nt)
    assert(row.getLong(3) + row.getLong(4) === pt)
  }

  test("q188 PR curve is exact and recall decreases with the threshold") {
    val rows = MlEvalQueries.q188PrCurve(spark, sfDir).collect()
    val data = labeled()
    val pt = data.map(_._2).sum.toLong
    rows.foreach { r =>
      val t = r.getDouble(0)
      val tp = data.count { case (x, y) => x > t && y == 1.0 }.toLong
      val pp = data.count { case (x, _) => x > t }.toLong
      assert(r.getLong(1) === tp, s"t=$t tp")
      assert(r.getLong(2) === pp - tp, s"t=$t fp")
      assert(r.getLong(3) === pt - tp, s"t=$t fn")
      assert(math.abs(r.getDouble(5) - tp.toDouble / pt) < 1e-6)
    }
    val recalls = rows.sortBy(_.getDouble(0)).map(_.getDouble(5))
    recalls.zip(recalls.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
    // the curve contains a usable operating point
    assert(rows.map(_.getDouble(6)).max > 0.0, "some threshold has F1 > 0")
  }
}
