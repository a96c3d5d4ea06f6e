package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

/** The 100 TB toolbox operators: salted aggregation correctness +
  * plan shape, and bucketed co-located joins eliminating the shuffle.
  */
class ScaleOpsSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("salted aggregation equals plain groupBy and spreads the hot key") {
    val ev = Tables.events(spark, sfDir)
    val plain = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("sum"), count(lit(1)).as("count"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Salting.saltedSumCount(ev, col("user_id"), col("value"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (s, c)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 === c, s"key $k")
    }
    // plan shape: two aggregation exchanges — (key, salt) then (key)
    val plan = Salting.saltedSumCount(ev, col("user_id"), col("value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    sp.sql("DROP TABLE IF EXISTS graft_b_orders")
    sp.sql("DROP TABLE IF EXISTS graft_b_customer")
    Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/orders").saveAsTable("graft_b_orders")
    Tables.customer(spark, sfDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/customer").saveAsTable("graft_b_customer")

    val prevThreshold = sp.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = sp.table("graft_b_orders")
        .join(sp.table("graft_b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(sum(col("o_totalprice")).as("rev"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself reads pre-bucketed sides: the only exchange is
      // the post-join groupBy on a different key
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join should not reshuffle its inputs:\n$joinSection")
      assert(j.collect().nonEmpty)
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      sp.sql("DROP TABLE IF EXISTS graft_b_orders")
      sp.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
