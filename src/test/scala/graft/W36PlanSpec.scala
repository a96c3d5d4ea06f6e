package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.queries.{GraphQueries, MlEvalQueries, RelationalQueries, StorageQueries}
import graft.text.TextQueries

/** Physical-plan assertions for the r8 wave operators — the 100 TB
  * posture checked against the OPTIMIZER'S OUTPUT, not the code's
  * intent: pushed filters reach the parquet scans, small dimensions
  * broadcast, aggregations keep their map-side partial step, and no
  * operator regresses into a cartesian product.
  */
class W36PlanSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q193 pushes all three filters to the scans and broadcasts the dim") {
    val plan = formatted(
      RelationalQueries.q193ShippingPriority(spark, sfDir))
    assert(plan.contains("GreaterThan(l_shipdate"), "lineitem date filter pushed")
    assert(plan.contains("LessThan(o_orderdate"), "orders date filter pushed")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), "segment pushed")
    assert(plan.contains("BroadcastHashJoin"), "dim join broadcasts")
    assert(!plan.contains("CartesianProduct"), "no cartesian product")
  }

  test("histogram operators keep map-side partial aggregation") {
    Seq(
      RelationalQueries.q180SaltPlan(spark, sfDir),
      StorageQueries.q181Zonemaps(spark, sfDir),
      TextQueries.q167HeavyHitters(spark, sfDir)
    ).foreach { df =>
      val plan = formatted(df)
      assert(plan.contains("partial_count") || plan.contains("partial_sum"),
        "aggregation must have a partial (map-side) step")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("q185 OLS is one scan into one global aggregate") {
    val plan = formatted(MlEvalQueries.q185Ols(spark, sfDir))
    assert("Scan parquet".r.findAllIn(plan).length <= 2,
      "a single lineitem scan feeds the moment aggregate")
    assert(plan.contains("partial_"), "moments partial-aggregate map-side")
    assert(!plan.contains("Exchange hashpartitioning"),
      "a global 1-row aggregate needs no hash exchange, only the final single partition")
  }

  test("partsupp TPC-H shapes: pushed filters, broadcasts, no cartesians") {
    import graft.queries.PartsuppQueries
    val q228 = formatted(PartsuppQueries.q228MinCostSupplier(spark, sfDir))
    assert(q228.contains("EqualTo(p_type,ECONOMY)"), "Q2 part type pushed")
    assert(q228.contains("GreaterThanOrEqual(p_size"), "Q2 size band pushed")
    assert(q228.contains("BroadcastHashJoin"), "Q2 region suppliers broadcast")
    val q229 = formatted(PartsuppQueries.q229ProductProfit(spark, sfDir))
    assert(q229.contains("StringContains(p_name,red)"), "Q9 color filter pushed")
    assert(q229.contains("BroadcastHashJoin"), "Q9 supplier-nation broadcast")
    val q232 = formatted(PartsuppQueries.q232PartPromotion(spark, sfDir))
    assert(q232.contains("GreaterThanOrEqual(l_shipdate"), "Q20 date pushed")
    assert(q232.contains("StringStartsWith(p_name,red)"), "Q20 prefix pushed")
    Seq(q228, q229, q232,
      formatted(PartsuppQueries.q230ImportantStock(spark, sfDir)),
      formatted(PartsuppQueries.q231SupplierCensus(spark, sfDir))).foreach { p =>
      assert(!p.contains("CartesianProduct"), "no cartesian product")
    }
  }

  test("q233 Q19-shape: both sides' OR-disjunctions reach PushedFilters") {
    val plan = formatted(graft.queries.TpchQueries.q233BracketScan(spark, sfDir))
    withClue(plan) {
      // the optimizer must FACTOR the cross-table OR: each scan's
      // PushedFilters carries the disjunction of ITS columns' brackets
      assert(plan.contains("Or(Or(And(EqualTo(p_brand,Brand#12)"),
        "part scan: OR of brand∧size brackets pushed")
      assert(plan.contains("Or(Or(And(GreaterThanOrEqual(l_quantity"),
        "lineitem scan: OR of quantity bands pushed")
      assert(!plan.contains("CartesianProduct"))
    }
  }

  test("q164/q169 graph composites never regress to a cartesian product") {
    Seq(
      GraphQueries.q164Bowtie(spark, sfDir),
      GraphQueries.q169CrawlFrontier(spark, sfDir)
    ).foreach { df =>
      val plan = formatted(df)
      assert(!plan.contains("CartesianProduct"), "no unbounded cartesian")
    }
  }

  test("q299 has no global ntile; its windows run on the decile census only") {
    // the r9 scale-killer was ntile(10) OVER (ORDER BY ...) on the
    // per-user frame — a single-partition sort of every user. The r10
    // shape bins map-side against a broadcast percentile row; the only
    // window left must take an AGGREGATE (≤10-row census) as input.
    val df = MlEvalQueries.q299Qini(spark, sfDir)
    val plan = formatted(df)
    assert("""(?i)\bntile\(""".r.findFirstIn(plan).isEmpty, "global ntile is banned")
    assert(plan.contains("percentile"), "decile thresholds come from percentile")
    val exec = df.queryExecution.executedPlan match {
      // the AQE wrapper is a leaf to TreeNode.collect — unwrap it
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "the cumulative-decile window still exists")
    windows.foreach { w =>
      val aggBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
            if a.groupingExpressions.exists(_.name == "decile") => a
      }
      assert(aggBelow.nonEmpty,
        "every WindowExec input must be the decile census aggregate, not a per-row frame")
    }
  }
}
