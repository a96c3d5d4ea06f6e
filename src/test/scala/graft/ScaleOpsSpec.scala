package graft

import graft.queries.StorageQueries

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

  test("q75 salted join equals the plain join and keys the shuffle on salt") {
    import graft.queries.RelationalQueries
    val salted = RelationalQueries.q75SkewJoin(spark, sfDir)
    // value-identical to the unsalted join (the semantics-preservation
    // claim the oracle also gates)
    val plain = Tables.events(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("user_id") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === plain)
    // the join condition must include the salt column — the hot key is
    // spread across SkewSalts hash partitions, not one reducer
    val joins = salted.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.condition.exists(_.toString.contains("salt"))),
      "salted join must key on (user_id, salt)")
  }

  test("date-partitioned table prunes to the queried window at planning time") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_partitions").toString
    sp.sql("DROP TABLE IF EXISTS graft_p_orders")
    Tables.orders(spark, sfDir)
      .withColumn("o_date", to_date(col("o_orderdate")))
      .write.partitionBy("o_date")
      .option("path", s"$tmp/orders").saveAsTable("graft_p_orders")
    try {
      val q = sp.table("graft_p_orders")
        .filter(col("o_date") >= lit("1995-03-01") && col("o_date") < lit("1995-03-08"))
        .groupBy(col("o_date")).agg(count(lit(1)).as("n"))
      // sparkPlan (pre-AQE): the file scan is a visible leaf there
      val scan = q.queryExecution.sparkPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
      assert(scan.partitionFilters.nonEmpty, "date predicate must prune partitions")
      // the scan touches only the ≤7 in-window partition DIRECTORIES,
      // not all days (directory count, not file count: write
      // parallelism may emit several files per partition dir)
      val total = sp.table("graft_p_orders").select(col("o_date")).distinct().count()
      assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
        .size <= 7, s"pruned scan reads a bounded partition set (of $total days)")
      assert(q.collect().map(_.getLong(1)).sum > 0)
    } finally {
      sp.sql("DROP TABLE IF EXISTS graft_p_orders")
    }
  }

  test("q72 join prunes fact partitions at runtime (dynamic partition pruning)") {
    val q = graft.queries.StorageQueries.q72DynamicPruning(spark, sfDir)
    // the fact scan must carry a DynamicPruningSubquery on o_date —
    // runtime pruning from the dim side's Monday filter, not a static
    // predicate (sparkPlan: the file scan is a visible leaf pre-AQE)
    val scan = q.queryExecution.sparkPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
    }.get
    assert(scan.partitionFilters.mkString.toLowerCase.contains("dynamicpruning"),
      s"expected runtime pruning, got: ${scan.partitionFilters.mkString("; ")}")
    // and the answer is right: every counted order is a Monday order
    val viaRaw = Tables.orders(spark, sfDir)
      .filter(dayofweek(to_date(col("o_orderdate"))) === 2)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === viaRaw)
  }

  test("set operations compile to aggregations + semi/anti joins, not sorts") {
    val rows = graft.queries.RelationalQueries.q59SetOps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    // a customer cannot be both retained and churned: cohorts partition b95
    assert(byCohort.keySet.subsetOf(Set("retained", "churned")))
    val plan = graft.queries.RelationalQueries.q59SetOps(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("SemiJoin") || plan.contains("LeftSemi"))
    assert(plan.contains("AntiJoin") || plan.contains("LeftAnti"))
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
