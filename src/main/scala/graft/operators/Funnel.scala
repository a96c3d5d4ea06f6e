package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ordered event-funnel analysis over an arbitrary event frame: how
  * many users reach each named step IN ORDER — step k counts only
  * strictly after the user's first qualifying step k−1.
  *
  * Shape: one `min` aggregate per step, each conditioned on the
  * previous step's timestamp through an equi-join on the user key —
  * the chain stays hash-partitioned on the user the whole way and each
  * step's frame only SHRINKS; nothing event-level rides more than the
  * first groupBy. No full-history window, no per-user sort.
  */
object Funnel {

  /** Per-step frames of (user, first-reach ts), in step order. */
  def stageFrames(events: DataFrame, user: Column, step: Column, ts: Column,
                  steps: Seq[String]): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(user.as("__u"), step.as("__s"), ts.as("__t"))
    steps.zipWithIndex.foldLeft(Vector.empty[DataFrame]) { case (acc, (s, i)) =>
      val base = ev.filter(col("__s") === s)
      val frame = acc.lastOption match {
        case None =>
          base.groupBy(col("__u")).agg(min(col("__t")).as(s"__ts$i"))
        case Some(prev) =>
          base.join(prev, "__u")
            .filter(col("__t") > col(s"__ts${i - 1}"))
            .groupBy(col("__u")).agg(min(col("__t")).as(s"__ts$i"))
      }
      acc :+ frame.select(col("__u"), col(s"__ts$i"))
    }
  }

  /** (stage, step, n_users, conversion): stage 0 = all users, then one
    * row per funnel step; conversion = fraction of the previous stage. */
  def stageCounts(events: DataFrame, user: Column, step: Column, ts: Column,
                  steps: Seq[String]): DataFrame = {
    val ev = events.select(user.as("__u"))
    val frames = stageFrames(events, user, step, ts, steps)
    val stages = frames.zip(steps).zipWithIndex.foldLeft(
      ev.agg(countDistinct(col("__u")).as("n_users"))
        .select(lit(0).as("stage"), lit("all_users").as("step"), col("n_users"))) {
      case (acc, ((f, s), i)) =>
        acc.unionAll(f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage"), lit(s).as("step"), col("n_users")))
    }
    // tiny frame (|steps|+1 rows): the unpartitioned lag window is fine
    val w = Window.orderBy(col("stage"))
    stages.withColumn("conversion",
        coalesce(round(col("n_users").cast("double")
          / lag(col("n_users"), 1).over(w).cast("double"), 6), lit(1.0)))
      .orderBy(col("stage"))
  }
}
