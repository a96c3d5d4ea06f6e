package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries}
import graft.text.TextQueries

/** Wave-11 operators (q154–q156): the evaluation family —
  * classification report, A/B significance, calibration curve.
  */
class W21OpsSpec extends GraftSpec {

  test("q154 report recomputes from the detector's confusion counts") {
    val rows = TextQueries.q154ClsReport(spark, sfDir).collect()
    val scored = TextQueries.q40LangId(spark, sfDir)
      .select(col("lang"), col("detected")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val langs = scored.map(_._1).distinct.sorted
    assert(rows.map(_.getString(0)).toSeq === langs.toSeq)
    val hits = scored.count { case (a, d) => a == d }.toLong
    rows.foreach { r =>
      val c = r.getString(0)
      val support = scored.count(_._1 == c).toLong
      val tp = scored.count { case (a, d) => a == c && d == c }.toLong
      val fp = scored.count { case (a, d) => a != c && d == c }.toLong
      assert(r.getLong(1) === support)
      assert(r.getLong(2) === tp)
      assert(r.getLong(3) === fp)
      assert(r.getLong(4) === support - tp, "tp + fn = support")
      if (tp + fp > 0)
        assert(math.abs(r.getDouble(5) - tp.toDouble / (tp + fp)) < 1e-6)
      assert(math.abs(r.getDouble(6) - tp.toDouble / support) < 1e-6)
      assert(math.abs(r.getDouble(8) - hits.toDouble / scored.length) < 1e-6)
    }
  }

  test("q155 A/B: arms tile the users and the hash assignment is not significant") {
    val r = MlEvalQueries.q155AbTest(spark, sfDir).first()
    val nUsers = Tables.events(spark, sfDir)
      .select(countDistinct(col("user_id"))).first().getLong(0)
    assert(r.getLong(0) + r.getLong(1) === nUsers, "arms tile the population")
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
    // the assignment is independent of behavior — a firing detector is broken
    assert(!r.getBoolean(7), s"hash split must not be significant (z=${r.getDouble(6)})")
    // z recompute
    val (na, nb, xa, xb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val pa = xa.toDouble / na; val pb = xb.toDouble / nb
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(6) - z) < 1e-5)
  }

  test("q156 calibration bins tile users and replay the share-of-max predictor") {
    val rows = MlEvalQueries.q156Calibration(spark, sfDir).collect()
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === MlEvalQueries.AbLastDay, 1L)
          .otherwise(0L)).as("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val mx = perUser.map(_._1).max
    val binned = perUser.groupBy { case (n, _) => math.min(n * 10 / mx, 9L) }
    assert(rows.map(_.getLong(1)).sum === perUser.length.toLong)
    rows.foreach { r =>
      val b = r.getLong(0)
      val xs = binned(b)
      assert(r.getLong(1) === xs.length.toLong, s"bin $b size")
      assert(math.abs(r.getDouble(2) -
        xs.map(_._1).sum.toDouble / (mx * xs.length)) < 1e-6, s"bin $b predicted")
      assert(math.abs(r.getDouble(3) -
        xs.map(_._2).sum.toDouble / xs.length) < 1e-6, s"bin $b observed")
      assert(math.abs(r.getDouble(4) - (r.getDouble(3) - r.getDouble(2))) < 1e-5)
    }
  }
}
