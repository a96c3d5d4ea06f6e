package graft

import org.apache.spark.sql.functions._
import graft.queries.MlEvalQueries

/** Wave-56 operators: split-conformal prediction intervals (q271) and
  * CUPED variance reduction (q272), each cross-checked by a driver
  * recompute of the textbook formulation.
  */
class W56OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16)
  }

  test("q271: q-hat is the exact order statistic and coverage is replayed") {
    val row = MlEvalQueries.q271Conformal(spark, sfDir).collect().head
    val pool0 = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), expr("ts div 1000000000").as("x0"),
        round(col("value"), 6).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val xmin = pool0.map(_._2).min
    val pool = pool0.map { case (id, x0, y) =>
      (id, x0 - xmin, y, h32(s"conf:$id") % 4) }
    val train = pool.filter(_._4 <= 1)
    val n = train.length.toDouble
    val sx = train.map(_._2.toDouble).sum
    val sy = train.map(_._3).sum
    val sxx = train.map(t => t._2.toDouble * t._2).sum
    val sxy = train.map(t => r6(t._2 * t._3)).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val a = (sy - b * sx) / n
    assert(row.getLong(0) === train.length.toLong)
    assert(math.abs(row.getDouble(3) - b * 3600.0) < 1e-4, "slope")
    assert(math.abs(row.getDouble(4) - a) < 1e-3, "intercept")
    val cal = pool.filter(_._4 == 2)
      .map(t => r6(math.abs(t._3 - (a + b * t._2)))).sorted
    val k = math.min(math.ceil((cal.length + 1) *
      (1.0 - MlEvalQueries.ConformalAlpha)).toLong, cal.length.toLong).toInt
    val qhat = cal(k - 1)
    assert(row.getLong(1) === cal.length.toLong)
    assert(math.abs(row.getDouble(5) - qhat) < 1e-5, "q-hat order statistic")
    val test = pool.filter(_._4 == 3)
    val covered = test.count(t => r6(math.abs(t._3 - (a + b * t._2))) <= qhat)
    assert(row.getLong(2) === test.length.toLong)
    assert(math.abs(row.getDouble(6) - covered.toDouble / test.length) < 1e-6)
    // the finite-sample guarantee: coverage within binomial noise of 1-alpha
    val se = 3.0 * math.sqrt(0.1 * 0.9 / test.length)
    assert(row.getDouble(6) > 0.9 - se - 0.02, s"coverage ${row.getDouble(6)}")
  }

  test("q272: theta and the variance reduction equal a per-user recompute") {
    val row = MlEvalQueries.q272Cuped(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        round(col("value"), 6).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val perUser = ev.groupBy(_._1).map { case (_, xs) =>
      (r6(xs.filter(_._2 < mid).map(x => BigDecimal(x._3)).sum.toDouble),
        r6(xs.filter(_._2 >= mid).map(x => BigDecimal(x._3)).sum.toDouble))
    }.toSeq
    val n = perUser.length.toDouble
    val sx = perUser.map(_._1).sum
    val sy = perUser.map(_._2).sum
    val sxx = perUser.map(p => r6(p._1 * p._1)).sum
    val sxy = perUser.map(p => r6(p._1 * p._2)).sum
    val syy = perUser.map(p => r6(p._2 * p._2)).sum
    val covN = n * sxy - sx * sy
    val varXN = n * sxx - sx * sx
    val varYN = n * syy - sy * sy
    assert(row.getLong(0) === perUser.length.toLong)
    assert(math.abs(row.getDouble(1) - covN / varXN) < 1e-4, "theta")
    assert(math.abs(row.getDouble(2) - varYN / (n * n)) < 1e-2, "var_post")
    val rho2 = covN * covN / (varXN * varYN)
    assert(math.abs(row.getDouble(4) - rho2) < 1e-4, "var_reduction")
    assert(math.abs(row.getDouble(3) -
      varYN / (n * n) * (1.0 - rho2)) < 1e-2, "var_adjusted")
    // identity: var_adjusted = var_post * (1 - reduction); the 6-dp
    // rounding of `reduction` scales by var_post in this check
    assert(math.abs(row.getDouble(3) -
      row.getDouble(2) * (1.0 - row.getDouble(4))) <
      1e-6 * row.getDouble(2) + 1e-3)
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) < 1.0)
  }
}
