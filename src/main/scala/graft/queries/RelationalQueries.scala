package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{MathFunctions => MF}

/** Relational / analytics core (SURVEY §2.B).
  *
  * Oracle-fidelity rules (see SURVEY §4):
  *  - money sums go through DECIMAL(38,6) so they are exact and
  *    independent of Spark's parallel summation order, then are cast
  *    back to double and rounded to 6 dp — the DuckDB SQL does the
  *    identical decimal cast;
  *  - event timestamps are nanosecond parquet; Spark truncates to
  *    microseconds on read, so the SQL casts ts to microsecond
  *    TIMESTAMP before any arithmetic;
  *  - every result has a total order (ORDER BY on output columns).
  */
object RelationalQueries {

  /** Exact, order-independent sum of a 2-dp money double. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6)))
  private def asD(c: Column): Column = round(c.cast("double"), 6)

  // ---------------------------------------------------------------- q11
  /** TPC-H Q1-style pricing summary. Filter reaches the parquet scan
    * (PushedFilters), aggregation is partial (map-side combine). */
  def q11PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asD(dsum(col("l_quantity"))).as("sum_qty"),
        asD(dsum(col("l_extendedprice"))).as("sum_base_price"),
        asD(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        round(dsum(col("l_quantity")).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(dsum(col("l_extendedprice")).cast("double") / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q11Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_base_price,
      |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Top-10 customers by order revenue. Dims (customer, nation) are
    * broadcast; the only shuffle is the groupBy on o_custkey. */
  def q12TopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("order_count"))
    // customer is O(rows·SF) — not a bounded dim, so no forced broadcast
    // (AQE/autoBroadcastJoinThreshold decides); nation is bounded (25).
    rev
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(10)
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        asD(col("rev")).as("revenue"), col("order_count"))
  }

  val q12Sql: String =
    """SELECT c_custkey, c_name, n_name AS nation,
      |  round(CAST(rev AS DOUBLE), 6) AS revenue, order_count
      |FROM (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev,
      |         count(*) AS order_count
      |  FROM orders GROUP BY o_custkey) r
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY rev DESC, c_custkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Revenue share of each region per order year (join + conditional
    * agg + window share). Share division happens in double on both
    * sides after exact decimal sums. */
  def q13MarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val joined = o
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("o_year"), col("r_name"), col("o_totalprice"),
        when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0)).as("filled_price"))
    val byRegion = joined.groupBy(col("o_year"), col("r_name"))
      .agg(dsum(col("o_totalprice")).as("rev"), dsum(col("filled_price")).as("filled_rev"))
    val w = Window.partitionBy(col("o_year"))
    byRegion
      .withColumn("year_rev", sum(col("rev")).over(w))
      .select(col("o_year"), col("r_name"),
        asD(col("rev")).as("revenue"),
        asD(col("filled_rev")).as("filled_revenue"),
        round(col("rev").cast("double") / col("year_rev").cast("double"), 6).as("share"))
      .orderBy(col("o_year"), col("r_name"))
  }

  val q13Sql: String =
    """WITH by_region AS (
      |  SELECT year(o_orderdate) AS o_year, r_name,
      |    sum(CAST(o_totalprice AS DECIMAL(38,6))) AS rev,
      |    sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(38,6))) AS filled_rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2)
      |SELECT o_year, r_name,
      |  round(CAST(rev AS DOUBLE), 6) AS revenue,
      |  round(CAST(filled_rev AS DOUBLE), 6) AS filled_revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER (PARTITION BY o_year) AS DOUBLE), 6) AS share
      |FROM by_region
      |ORDER BY o_year, r_name""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Window functions: top-5 customers per nation by account balance
    * with running balance total (rank + cumulative sum). */
  def q14WindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val order = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    // rank first, filter, THEN the running total: the rank-only window
    // gets Spark's WindowGroupLimit pushdown (per-partition top-5 before
    // the shuffle), and the cumulative sum runs over <=5 rows per nation
    // instead of the whole table. The prefix sum of a prefix is
    // unchanged, so the result is identical.
    c.select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("bal_rank", row_number().over(order))
      .filter(col("bal_rank") <= 5)
      .withColumn("running_bal",
        asD(sum(col("c_acctbal").cast(DecimalType(38, 6))).over(order)))
      .select(col("c_nationkey"), col("c_custkey"),
        round(col("c_acctbal"), 6).as("acctbal"), col("bal_rank"), col("running_bal"))
      .orderBy(col("c_nationkey"), col("bal_rank"))
  }

  val q14Sql: String =
    """SELECT * FROM (
      |  SELECT c_nationkey, c_custkey,
      |    round(c_acctbal, 6) AS acctbal,
      |    row_number() OVER w AS bal_rank,
      |    round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) OVER w AS DOUBLE), 6) AS running_bal
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
      |WHERE bal_rank <= 5
      |ORDER BY c_nationkey, bal_rank""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Event sessionization: a session breaks after a >30-minute gap.
    * lag + cumulative-flag-sum inside a per-user window — one shuffle
    * on user_id, everything else stays in the sorted partition. */
  def q15Sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    // ts is a nanosecond bigint (see GraftSession nanosAsLong); floor
    // to µs exactly as DuckDB's CAST(ts AS TIMESTAMP) truncates.
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val flagged = ev
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        asD(dsum(col("value"))).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q15Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, value,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > 30*60*1000000 THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sessions AS (
      |  SELECT user_id, ts_us, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Tumbling 1-hour window aggregation over the event stream (batch
    * twin of the Structured Streaming pipeline in graft.streaming). */
  def q16TumblingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    ev.select(expr("(ts div 3600000000000) * 3600000000").as("window_start_us"),
        col("event_type"), col("value"))
      .groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), asD(dsum(col("value"))).as("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))
  }

  val q16Sql: String =
    """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS window_start_us,
      |  event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Watermark delay of the streaming twin (and the oracle's emission
    * cutoff): windows whose end is at most max(event time) − this many
    * ms are finalized and emitted by the availableNow run. */
  val StreamDelayMs = 7200000L

  /** Streaming batch-equivalence — q16's tumbling aggregation run
    * through the REAL Structured Streaming engine (file source →
    * event-time watermark → windowed agg → file sink, availableNow
    * trigger), read back as the result frame. This puts the streaming
    * path under the same DuckDB oracle regime as every batch operator
    * instead of ScalaTest-only equality.
    *
    * Determinism: with no per-trigger file limits configured,
    * availableNow drains the source in a single micro-batch (nothing
    * is ever late), then the no-data finalize batch advances the
    * watermark to max(event time) − 2 h and flushes every window whose
    * end the watermark has passed. The emitted set is therefore exactly
    * "windows with end ≤ max(ts) − 2 h" — a pure function of the data
    * that the oracle computes with a HAVING clause (Spark tracks the
    * watermark in whole milliseconds, hence the ms floor in both
    * engines). Windows still inside the delay horizon are withheld by
    * design — that is the streaming semantic being verified.
    *
    * Scale shape: identical to the production streaming pipeline —
    * bounded state (closed windows evicted), partial aggregation per
    * micro-batch, file-sink append with exactly-once manifest. The
    * batch read-back + sort is on the aggregated (window, type) frame,
    * never the events. */
  def q98StreamWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // The stream source must declare the FILE's schema (Tables.events
    // normalizes ts to a ns bigint, which no longer matches the
    // on-disk type since the r8 regeneration switched ts to µs
    // TIMESTAMP); event time is derived per-vintage below.
    val raw = Tables.eventsRaw(spark, sfDir)
    val tsEventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q98_")
    val outDir = tmp.resolve("out").toString
    val cpDir = tmp.resolve("cp").toString
    // events.parquet is a single FILE; the file stream source requires a
    // directory base path, so glob one character — the base becomes the
    // sf directory while the pattern still matches only this file.
    val agg = spark.readStream.schema(raw.schema).parquet(s"$sfDir/[e]vents.parquet")
      .select(tsEventTime.as("ts"),
        col("event_type"), col("value"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("tv"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), asD(col("tv")).as("total_value"))
    agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    // Materialize eagerly so the temp sink files can be deleted before
    // the caller consumes the frame.
    val res = spark.read.parquet(outDir)
      .orderBy(col("window_start_us"), col("event_type"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try { // best-effort temp cleanup; the result no longer reads it
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q98Sql: String =
    s"""WITH ev AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value FROM events),
      |wm AS (SELECT (max(ts_us) // 1000 - $StreamDelayMs) * 1000 AS w FROM ev)
      |SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
      |  event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
      |FROM ev
      |GROUP BY 1, 2
      |HAVING window_start_us + 3600000000 <= (SELECT w FROM wm)
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q17
  /** As-of join — the temporal operator Spark has no native node for
    * (DuckDB does: the oracle IS an ASOF LEFT JOIN): attribute every
    * `error` event to the same user's most recent strictly-preceding
    * `click`. Implemented by composition (preference (a) of the custom-
    * operator ladder): tag both sides, one window over (user, time),
    * `last(click, ignoreNulls)` over the strictly-preceding frame.
    * Scale shape: ONE hash shuffle on user_id + an in-partition sort —
    * no range-join candidate explosion, no per-key driver loop; at
    * 100 TB this is the as-of plan you want (the sort is the same one
    * any per-key temporal semantics needs). (user_id, ts) collisions
    * are absent in the data, so the strictly-preceding frame and
    * DuckDB's `>` comparator agree exactly. */
  def q17AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"))
      .filter(col("event_type").isin("click", "error"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isClick = col("event_type") === "click"
    ev
      .withColumn("click_id",
        last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_ts_us",
        last(when(isClick, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("click_id"),
        (col("ts_us") - col("click_ts_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  val q17Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events WHERE event_type IN ('click', 'error')),
      |errors AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'error'),
      |clicks AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts_us
      |           FROM ev WHERE event_type = 'click')
      |SELECT e.event_id, e.user_id, c.click_id, e.ts_us - c.click_ts_us AS gap_us
      |FROM errors e ASOF LEFT JOIN clicks c
      |  ON e.user_id = c.user_id AND e.ts_us > c.click_ts_us
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Bucketed co-located join — the storage-layout variant of the
    * headline join: orders and customer are written ONCE per session as
    * bucketed+sorted tables on the join key (16 buckets), and the join
    * reads them back through the catalog. With matching bucketing on
    * both sides Spark's sort-merge join consumes the buckets in place —
    * no Exchange on either input (plan-asserted in ScaleOpsSpec with
    * broadcast disabled); at 100 TB this is how a fact table joined
    * daily on the same key amortizes its shuffle to zero. This driver
    * row hash-verifies the whole bucketed write→catalog→read→join path
    * against the plain-parquet oracle. */
  /** Session-table / tmpdir suffix for the layout queries (q18/q58):
    * the sanitized FULL source path, not its hashCode — two distinct
    * sfDirs can never silently reuse each other's cached table (a
    * hashCode collision would). Mutating the data under an sfDir
    * mid-session still reuses the session's table, like every other
    * session memo. */
  private def pathKey(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_")

  def q18BucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = pathKey(sfDir)
    val (to, tc) = (s"graft_bko_$sfx", s"graft_bkc_$sfx")
    if (!spark.catalog.tableExists(to) || !spark.catalog.tableExists(tc)) {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_buckets_${sfx}_${java.lang.ProcessHandle.current().pid()}").toString
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(16, "o_custkey").sortBy("o_custkey")
        .option("path", s"$tmp/orders").saveAsTable(to)
      Tables.customer(spark, sfDir).write.mode("overwrite")
        .bucketBy(16, "c_custkey").sortBy("c_custkey")
        .option("path", s"$tmp/customer").saveAsTable(tc)
    }
    spark.table(to)
      .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), asD(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val q18Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Bin granularity and interval padding for the range join: alert
    * intervals are [hour − 15 min, hour + 75 min] around busy hours. */
  val RjBinUs = 3600000000L
  val RjLoPadUs = 900000000L
  val RjHiPadUs = 4500000000L

  /** UNKEYED point-in-interval range join, bin-bucketed — the join
    * class Spark has no shuffle strategy for (a bare `ts BETWEEN lo
    * AND hi` predicate compiles to BroadcastNestedLoopJoin: every
    * point × every interval). The scale-safe shape: quantize both
    * sides to fixed time bins — an interval explodes to the bins it
    * overlaps (≤3 here, bounded by interval span / bin), a point maps
    * to exactly ONE bin — equi-join on the bin, then the residual
    * range filter. Each (point, interval) pair meets in exactly one
    * bin, so no post-join dedup is needed. The join is a plain hash
    * shuffle on `bin` that scales to any number of intervals; at
    * 100 TB the bin width tunes fan-out vs bucket size exactly like
    * an LSH band. Intervals here are derived from the data (hours
    * whose error count exceeds 1.5× the hourly average — SF-relative
    * by construction), points are the click events.
    * Oracle: DuckDB's native IEJoin on the raw BETWEEN predicate —
    * same pairs, different physical strategy on each engine. */
  def q19RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"))
    val hr = ev.filter(col("event_type") === "error")
      .groupBy(expr(s"ts_us div $RjBinUs").as("h"))
      .agg(count(lit(1)).as("c"))
    val thr = hr.agg(avg(col("c")).as("avg_c")) // 1 row, broadcast below
    val iv = hr.crossJoin(broadcast(thr))
      .filter(col("c").cast("double") > lit(1.5) * col("avg_c"))
      .select((col("h") * RjBinUs).as("wstart_us"),
        (col("h") * RjBinUs - RjLoPadUs).as("lo_us"),
        (col("h") * RjBinUs + RjHiPadUs).as("hi_us"))
    val ivBinned = iv.withColumn("bin",
      explode(sequence(expr(s"lo_us div $RjBinUs"), expr(s"hi_us div $RjBinUs"))))
    val clicks = ev.filter(col("event_type") === "click")
      .withColumn("bin", expr(s"ts_us div $RjBinUs"))
    ivBinned.join(clicks, Seq("bin"))
      .filter(col("ts_us").between(col("lo_us"), col("hi_us")))
      .groupBy(col("wstart_us"), col("lo_us"), col("hi_us"))
      .agg(count(lit(1)).as("n_clicks"),
        countDistinct(col("user_id")).as("n_users"),
        asD(dsum(col("value"))).as("click_value"))
      .orderBy(col("wstart_us"))
  }

  val q19Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, value,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |hr AS (
      |  SELECT ts_us // $RjBinUs AS h, count(*) AS c
      |  FROM ev WHERE event_type = 'error' GROUP BY 1),
      |iv AS (
      |  SELECT h * $RjBinUs AS wstart_us,
      |         h * $RjBinUs - $RjLoPadUs AS lo_us,
      |         h * $RjBinUs + $RjHiPadUs AS hi_us
      |  FROM hr WHERE CAST(c AS DOUBLE) > 1.5 * (SELECT avg(c) FROM hr))
      |SELECT wstart_us, lo_us, hi_us, count(*) AS n_clicks,
      |  count(DISTINCT user_id) AS n_users,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS click_value
      |FROM iv JOIN ev ON event_type = 'click' AND ts_us BETWEEN lo_us AND hi_us
      |GROUP BY wstart_us, lo_us, hi_us
      |ORDER BY wstart_us""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Multi-level aggregate: ROLLUP over (year, region) — detail rows,
    * per-year subtotals, and the grand total in one pass. Spark
    * expands the grouping sets BEFORE the exchange, so partial
    * aggregation still combines map-side and the extra levels cost one
    * ~3× row expansion of the AGGREGATED frame, not a second scan —
    * the same plan holds at 100 TB. Grouping-null markers are
    * projected to sentinel values (-1 / 'ALL') on both engines so the
    * hash compare never depends on engine null conventions. */
  def q38Rollup(spark: SparkSession, sfDir: String): DataFrame = {
    val joined = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .select(year(col("o_orderdate")).as("o_year"), col("r_name"), col("o_totalprice"))
    joined.rollup(col("o_year"), col("r_name"))
      .agg(count(lit(1)).as("n_orders"), asD(dsum(col("o_totalprice"))).as("revenue"))
      .select(
        (when(col("o_year").isNull, 2).otherwise(0) +
          when(col("r_name").isNull, 1).otherwise(0)).as("gid"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        coalesce(col("r_name"), lit("ALL")).as("region"),
        col("n_orders"), col("revenue"))
      .orderBy(col("gid"), col("o_year"), col("region"))
  }

  val q38Sql: String =
    """WITH j AS (
      |  SELECT year(o_orderdate) AS o_year, r_name, o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey),
      |r AS (
      |  SELECT o_year, r_name, count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |  FROM j GROUP BY ROLLUP (o_year, r_name))
      |SELECT
      |  (CASE WHEN o_year IS NULL THEN 2 ELSE 0 END)
      |    + (CASE WHEN r_name IS NULL THEN 1 ELSE 0 END) AS gid,
      |  coalesce(o_year, -1) AS o_year,
      |  coalesce(r_name, 'ALL') AS region,
      |  n_orders, revenue
      |FROM r
      |ORDER BY gid, o_year, region""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Semi-structured extraction — schema-on-read over the events'
    * JSON `props` payload: `from_json` with an explicit struct schema
    * (typed, null-safe, codegen'd JSON parse — one pass per row, no
    * regex), then a plain typed aggregation. At 100 TB the parse cost
    * dominates, so it runs exactly once per row inside the scan
    * projection and only the two extracted longs reach the exchange;
    * a malformed payload yields null (counted, not crashed). Oracle:
    * DuckDB's native `->>` JSON extraction.
    *
    * CONTRACT (cross-engine parity): the fixture's `props.k` is always
    * a JSON INTEGER. On a string-encoded ("7") or fractional (7.5) k
    * the engines diverge by design — Spark's `from_json` with LongType
    * yields null for both, while DuckDB's `CAST(->> AS BIGINT)` coerces
    * '7' to 7 and errors on '7.5'. A fixture change that emits k as
    * text or a fraction must also normalize one side (e.g. DuckDB
    * `json_extract(props, 'k')` with an explicit type check). */
  def q52Json(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    Tables.events(spark, sfDir)
      .select(col("event_type"), from_json(col("props"), schema)("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val q52Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
      |  round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Ordered event-funnel analysis (view → click → purchase): how many
    * users reach each stage IN ORDER — a click counts only after the
    * user's first view, a purchase only after that first qualifying
    * click. The product-analytics sequential-pattern operator.
    *
    * Shape: one `min` aggregate per stage, each conditioned on the
    * previous stage's timestamp through an equi-join on user_id — the
    * chain stays hash-partitioned on user_id the whole way (with
    * co-partitioned inputs no stage reshuffles), and each stage's
    * frame only SHRINKS. No window over the full event history, no
    * per-user sort: at 100 TB this is ~3 partial-aggregated
    * shuffles of user-level rows, nothing event-level rides more than
    * the first groupBy. */
  def q53Funnel(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Funnel.stageCounts(
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us")),
      col("user_id"), col("event_type"), col("ts_us"),
      Seq("view", "click", "purchase"))

  val q53Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |v AS (SELECT user_id, min(ts_us) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_us) AS c_ts FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_us) AS p_ts FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY e.user_id),
      |s AS (
      |  SELECT 0 AS stage, 'all_users' AS step, count(DISTINCT user_id) AS n_users FROM ev
      |  UNION ALL SELECT 1, 'view', count(*) FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p)
      |SELECT stage, step, n_users,
      |  coalesce(round(CAST(n_users AS DOUBLE)
      |    / CAST(lag(n_users) OVER (ORDER BY stage) AS DOUBLE), 6), 1.0) AS conversion
      |FROM s ORDER BY stage""".stripMargin

  // ---------------------------------------------------------------- q58
  /** First day of the window the partition-pruned scan reads. */
  val PruneFrom = "1995-03-01"
  val PruneTo = "1995-03-08"

  /** Partitioned layout + partition-pruned scan — the directory-level
    * twin of q18's bucketed layout, and the single biggest 100 TB
    * lever: orders are written ONCE per session as a
    * `partitionBy(o_orderdate)`-style date-partitioned table, and the
    * window query reads ONLY the matching directories (the date
    * predicate resolves against partition VALUES at planning time —
    * `PartitionFilters` in the scan, zero data files opened outside
    * the window; plan-asserted in ScaleOpsSpec). The driver row
    * hash-verifies the write→partitioned-read→aggregate path against
    * the plain-parquet oracle. */
  /** Date-partitioned orders as a session catalog table, written once
    * per (session, sfDir) — q58's static-pruning scan and q72's
    * dynamic-pruning join share the layout. */
  private def partOrdersTable(spark: SparkSession, sfDir: String): String = {
    val sfx = pathKey(sfDir)
    val tbl = s"graft_part_orders_$sfx"
    if (!spark.catalog.tableExists(tbl)) {
      // per-process path: two graft JVMs on one host (a test run beside
      // a verify run) must not overwrite each other's layout mid-scan —
      // a shared path left this session's cached file listing pointing
      // at files another JVM had just replaced (FILE_NOT_EXIST)
      val pid = java.lang.ProcessHandle.current().pid()
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_partitions_${sfx}_$pid").toString
      Tables.orders(spark, sfDir)
        .withColumn("o_date", to_date(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_date")
        .option("path", s"$tmp/orders").saveAsTable(tbl)
    }
    tbl
  }

  def q58PartitionedScan(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = partOrdersTable(spark, sfDir)
    spark.table(tbl)
      .filter(col("o_date") >= lit(PruneFrom) && col("o_date") < lit(PruneTo))
      .groupBy(col("o_date").cast("string").as("day"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        asD(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("day"), col("o_orderpriority"))
  }

  val q58Sql: String =
    s"""SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, o_orderpriority,
      |  count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '$PruneFrom'
      |  AND CAST(o_orderdate AS DATE) < DATE '$PruneTo'
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Hopping (sliding) window aggregation — 1-hour windows every
    * 15 minutes over the event stream, the overlapping-window twin of
    * q16's tumbling agg and the batch shape of a streaming
    * `window(ts, "1 hour", "15 minutes")`. Spark's native `window()`
    * generator expands each event into its length/slide = 4 covering
    * windows BEFORE the partial aggregation, so the exchange carries
    * (window, type) partial rows — 4× the tumbling agg's aggregate
    * state, never 4× the event stream. Windows are epoch-aligned in
    * the UTC session, so the oracle replays them as integer floor
    * arithmetic on microseconds. */
  def q71SlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(window(timestamp_micros(expr("ts div 1000")),
          "1 hour", "15 minutes").as("w"),
        col("event_type"), col("value"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), asD(dsum(col("value"))).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("window_start_us"), col("event_type"))

  val q71Sql: String =
    """WITH exp AS (
      |  SELECT ((epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) - j) * 900000000 AS ws,
      |    event_type, value
      |  FROM events, range(0, 4) t(j))
      |SELECT ws AS window_start_us, event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
      |FROM exp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Dynamic partition pruning — the RUNTIME twin of q58's
    * planning-time pruning, and the lever that matters when the date
    * set is data-dependent: the fact side (the q58 date-partitioned
    * orders table) joins a dim frame whose filter — "Mondays only" —
    * selects the dates, and Spark prunes the fact scan's partitions
    * with a DynamicPruningSubquery fed by the dim's broadcast (the
    * fact directories for other weekdays are never opened; ScaleOpsSpec
    * plan-asserts `dynamicpruning` in the scan's PartitionFilters).
    * The dim derives from the RAW parquet (a separate source), so the
    * optimizer cannot constant-fold the date set at planning time. */
  def q72DynamicPruning(spark: SparkSession, sfDir: String): DataFrame = {
    val tbl = partOrdersTable(spark, sfDir)
    val mondays = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("d")).distinct()
      .filter(dayofweek(col("d")) === 2)
    spark.table(tbl)
      .join(broadcast(mondays), col("o_date") === col("d"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        asD(dsum(col("o_totalprice"))).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q72Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |FROM orders
      |WHERE isodow(CAST(o_orderdate AS DATE)) = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Relational set operations — INTERSECT / EXCEPT as first-class
    * distributed operators (Spark compiles both to hash aggregations +
    * a left-semi/anti join — partial-agged, no sort): which customers
    * placed filled orders in BOTH 1995 and 1996 (retention), and which
    * churned (1995 EXCEPT 1996), summarized per nation. */
  def q59SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    def buyers(yr: Int) = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === yr && col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val retained = buyers(1995).intersect(buyers(1996))
      .withColumn("cohort", lit("retained"))
    val churned = buyers(1995).except(buyers(1996))
      .withColumn("cohort", lit("churned"))
    retained.unionAll(churned)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("cohort"), col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("cohort"), col("nationkey"))
  }

  val q59Sql: String =
    """WITH b95 AS (SELECT o_custkey FROM orders
      |             WHERE year(o_orderdate) = 1995 AND o_orderstatus = 'F'),
      |b96 AS (SELECT o_custkey FROM orders
      |        WHERE year(o_orderdate) = 1996 AND o_orderstatus = 'F'),
      |cohorts AS (
      |  SELECT o_custkey, 'retained' AS cohort FROM (SELECT * FROM b95 INTERSECT SELECT * FROM b96)
      |  UNION ALL
      |  SELECT o_custkey, 'churned' AS cohort FROM (SELECT * FROM b95 EXCEPT SELECT * FROM b96))
      |SELECT cohort, c_nationkey AS nationkey, count(*) AS n_customers
      |FROM cohorts JOIN customer ON o_custkey = c_custkey
      |GROUP BY cohort, nationkey
      |ORDER BY cohort, nationkey""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Z-score threshold for flagging an hour as anomalous. */
  val AnomalyZ = 2.5

  /** Volume-anomaly detection — the ingest-monitoring operator: flag
    * hours whose event count sits more than [[AnomalyZ]] population
    * standard deviations from that event type's hourly mean (over
    * observed hours). The statistics are ALGEBRAIC (n, Σc, Σc² exact
    * int64 sums, map-side combined, merged by addition across
    * executors — the same sufficient-statistics shape as q57), and
    * the per-type scalar frame joins back broadcast, so the event
    * stream is scanned once and only (type, hour) rows ride
    * exchanges. Variance numerator n·Σc²−(Σc)² stays in exact integer
    * arithmetic; the double math is structurally identical on both
    * engines. */
  def q63Anomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr(s"(ts div 1000) div $RjBinUs").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
    val mean = col("sc").cast("double") / col("n")
    val std =
      sqrt((col("n") * col("scc") - col("sc") * col("sc")).cast("double")) / col("n")
    hourly.join(broadcast(stats), "event_type")
      .withColumn("z", (col("c").cast("double") - mean) / std)
      .filter(abs(col("z")) > AnomalyZ)
      .select(col("event_type"), (col("h") * RjBinUs).as("wstart_us"),
        col("c").as("n_events"), round(col("z"), 6).as("z"))
      .orderBy(col("event_type"), col("wstart_us"))
  }

  val q63Sql: String =
    s"""WITH hourly AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // $RjBinUs AS h,
      |    count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sc,
      |    CAST(sum(c * c) AS BIGINT) AS scc
      |  FROM hourly GROUP BY event_type),
      |z AS (
      |  SELECT hourly.event_type, h, c,
      |    (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / n)
      |      / (sqrt(CAST(n * scc - sc * sc AS DOUBLE)) / n) AS z
      |  FROM hourly JOIN stats ON hourly.event_type = stats.event_type)
      |SELECT event_type, h * $RjBinUs AS wstart_us, c AS n_events, round(z, 6) AS z
      |FROM z WHERE abs(z) > $AnomalyZ
      |ORDER BY event_type, wstart_us""".stripMargin

  // ---------------------------------------------------------------- q75
  /** Salt fan-out for the skew-join demonstration. */
  val SkewSalts = 8

  /** Skew-mitigated fact⋈dim join — the manual twin of AQE's skew-join
    * split, as a first-class operator: the fact side (events) tags each
    * row with salt = hash(event_id) mod [[SkewSalts]], the dim side
    * (customer⋈nation, small) replicates [[SkewSalts]] ways via an
    * in-row `explode(sequence(...))`, and the equi-join runs on
    * (key, salt) — so ONE hot key spreads over [[SkewSalts]] shuffle
    * partitions instead of hot-spotting one reducer. The salted join is
    * value-identical to the plain join (each fact row still meets
    * exactly one dim copy), so the oracle replays the UNSALTED join —
    * the gate itself proves salting is semantics-preserving. Post-join
    * the per-nation rollup is a partial-agged groupBy.
    *
    * At 100 TB: this is the shape for whale keys that AQE can't split
    * (e.g. a sort-merge join forced by a non-shuffle-joinable plan, or
    * pre-AQE engines); the dim-side replication cost is |dim|×salts
    * rows — bounded, broadcast-sized — while the fact side stays
    * map-only. With AQE on, `spark.sql.adaptive.skewJoin` does this
    * split adaptively; the operator documents the explicit form. */
  def q75SkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val fact = Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"),
        pmod(MF.hash32(col("event_id").cast("string")), lit(SkewSalts)).as("salt"))
    val dim = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"),
        explode(sequence(lit(0), lit(SkewSalts - 1))).as("salt"))
    fact.join(dim,
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"), asD(dsum(col("value"))).as("total_value"))
      .orderBy(col("n_name"))
  }

  val q75Sql: String =
    """SELECT n_name, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q76
  /** CUBE over (order year, priority) — all four grouping sets
    * (detail, per-year, per-priority, grand total) in one pass,
    * completing the grouping-sets family q38's ROLLUP opened. Same
    * scale shape: Spark expands grouping sets BEFORE the exchange, so
    * partial aggregation combines map-side and the exchange carries
    * the ~4× AGGREGATED frame, never a re-scan per level. Sentinel
    * projection (-1 / 'ALL') keeps the hash gate independent of
    * engine grouping-null conventions (the q38 convention). */
  def q76Cube(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"),
        col("o_totalprice"))
      .cube(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), asD(dsum(col("o_totalprice"))).as("revenue"))
      .select(
        (when(col("o_year").isNull, 2).otherwise(0) +
          when(col("o_orderpriority").isNull, 1).otherwise(0)).as("gid"),
        coalesce(col("o_year"), lit(-1)).as("o_year"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("gid"), col("o_year"), col("priority"))
  }

  val q76Sql: String =
    """WITH r AS (
      |  SELECT year(o_orderdate) AS o_year, o_orderpriority, count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |  FROM orders GROUP BY CUBE (o_year, o_orderpriority))
      |SELECT
      |  (CASE WHEN o_year IS NULL THEN 2 ELSE 0 END)
      |    + (CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS gid,
      |  coalesce(o_year, -1) AS o_year,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  n_orders, revenue
      |FROM r
      |ORDER BY gid, o_year, priority""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Jump size that counts as a change point. */
  val JumpMin = 200.0

  /** Per-user change-point detection over the event stream: a change
    * point is a |value − lag(value)| jump above [[JumpMin]] in event-
    * time order. lag/lead breadth over the q15 window shape — ONE hash
    * shuffle on user_id, then everything (lag, jump, flags) stays
    * inside the sorted partition; the output is one aggregated row per
    * user. (user_id, ts) is collision-free in the data, so Spark's
    * window order and DuckDB's agree exactly. */
  def q77Changepoints(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .withColumn("jump", abs(col("value") - lag(col("value"), 1).over(byUser)))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("jump") > JumpMin, 1L).otherwise(0L)).as("n_jumps"),
        asD(max(col("jump"))).as("max_jump"))
      .orderBy(col("user_id"))
  }

  val q77Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
      |j AS (
      |  SELECT user_id,
      |    abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts_us)) AS jump
      |  FROM ev)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CASE WHEN jump > $JumpMin THEN 1 ELSE 0 END) AS BIGINT) AS n_jumps,
      |  round(max(jump), 6) AS max_jump
      |FROM j GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q85
  /** Spike rule: an hour whose count exceeds 4× the smoothed history,
    * evaluated from hour 3 on (the smoother needs a short warm-up). */
  val EwmaSpikeFactor = 4L
  val EwmaWarmupHours = 3

  /** Exponentially-weighted moving average over hourly event volume,
    * α = 1/2 — the trend smoother between q63's global z-score and
    * q77's per-user jumps: s_t = (x_t + s_{t−1})/2, s_0 = x_0, per
    * (event_type, day), plus a spike flag when an hour's raw count
    * exceeds [[EwmaSpikeFactor]]× the smoothed history. The dyadic α
    * makes the whole recursion EXACT INTEGER arithmetic via the closed
    * form s_t = (x_0 + Σ_{i=1..t} 2^{i−1}·x_i) / 2^t: one cumulative
    * window sum of scaled counts, one final division — no libm, no
    * association sensitivity, and the spike test cross-multiplies to
    * stay integral (u_t > 4·(S_t − u_t) ⟺ x_t > 4·s_{t−1}·…). Missing
    * hours enter as true zeros via a (type,day)×24 grid (tiny dim
    * frames; the only full-data pass is the hourly count partial-agg).
    * Hour index is pure integer division on the nanosecond ts — no
    * calendar functions, no timezone surface. */
  def q85Ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hr"))
      .groupBy(col("event_type"), col("day"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val grid = hourly.select(col("event_type"), col("day")).distinct()
      .select(col("event_type"), col("day"),
        explode(sequence(lit(0L), lit(23L))).as("hr"))
    val x = grid.join(hourly, Seq("event_type", "day", "hr"), "left")
      .select(col("event_type"), col("day"), col("hr"),
        coalesce(col("c"), lit(0L)).as("cnt"))
    val u = when(col("hr") === 0, col("cnt"))
      .otherwise(col("cnt") * expr("shiftleft(1L, cast(hr - 1 as int))"))
    val byDay = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("hr")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x.withColumn("u", u)
      .withColumn("s", sum(col("u")).over(byDay))
      .select(col("event_type"), col("day"), col("hr"), col("cnt"),
        round(col("s").cast("double") / expr("shiftleft(1L, cast(hr as int))"), 6)
          .as("ewma"),
        (col("hr") >= EwmaWarmupHours &&
          col("u") > lit(EwmaSpikeFactor) * (col("s") - col("u"))).as("spike"))
      .orderBy(col("event_type"), col("day"), col("hr"))
  }

  val q85Sql: String =
    s"""WITH hourly AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hr, count(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT event_type, day, CAST(h AS BIGINT) AS hr
      |  FROM (SELECT DISTINCT event_type, day FROM hourly)
      |  CROSS JOIN (SELECT unnest(range(0, 24)) AS h)),
      |x AS (
      |  SELECT g.event_type, g.day, g.hr, coalesce(h.c, 0) AS cnt
      |  FROM grid g LEFT JOIN hourly h
      |    ON g.event_type = h.event_type AND g.day = h.day AND g.hr = h.hr),
      |scaled AS (
      |  SELECT event_type, day, hr, cnt,
      |    (CASE WHEN hr = 0 THEN cnt ELSE cnt * (1::BIGINT << CAST(hr - 1 AS INT)) END) AS u
      |  FROM x),
      |summed AS (
      |  SELECT event_type, day, hr, cnt, u,
      |    sum(u) OVER (PARTITION BY event_type, day ORDER BY hr
      |                 ROWS UNBOUNDED PRECEDING) AS s
      |  FROM scaled)
      |SELECT event_type, day, hr, cnt,
      |  round(CAST(s AS DOUBLE) / (1::BIGINT << CAST(hr AS INT)), 6) AS ewma,
      |  (hr >= $EwmaWarmupHours AND u > $EwmaSpikeFactor * (s - u)) AS spike
      |FROM summed ORDER BY event_type, day, hr""".stripMargin

  // ---------------------------------------------------------------- q86
  /** Z-value bit budget: each dimension range-normalized to 8 bits,
    * top 8 of the 16-bit interleave as the bucket id — so a bucket is
    * a 16-cell × 16-cell rectangle of the normalized grid at ANY scale
    * factor (absolute-value interleaving would let whichever dimension
    * has fewer active bits degenerate to full-range stripes). */
  val ZDimBits = 8
  val ZBucketShift = 8

  /** Z-order (Morton) multi-dimensional clustering over orders — the
    * data-layout operator behind OPTIMIZE ZORDER-style file skipping
    * at 100 TB: range-bucket each dimension (customer, order-day) to
    * [[ZDimBits]] bits off its global min/max, interleave the bits,
    * and the z-value prefix buckets are tight RECTANGLES in both
    * dimensions — min/max footer stats then prune scans filtered on
    * EITHER column, where a single-column sort only ever prunes one.
    * The emitted per-bucket stats ARE the skipping audit: every
    * bucket's customer span and day span stay bounded instead of one
    * dimension degenerating to the full range (AnalyticsOpsSpec holds
    * the mean span under the range). Interleave = 3 shift-or-mask
    * steps per dimension (the classic magic-number spread), all exact
    * int64 bit ops on both engines; the min/max normalizers are one
    * O(1)-row broadcast scalar, then map-only until the per-bucket
    * partial agg. All-integer pipeline ⇒ exact cross-engine hash. */
  def q86Zorder(spark: SparkSession, sfDir: String): DataFrame = {
    def spread(v: Column): Column = { // 8-bit input → even bit positions
      val s1 = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0FL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x3333L))
      (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x5555L))
    }
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .cast("long").as("day"))
    val bounds = o.agg(
      min(col("o_custkey")).as("c_lo"), max(col("o_custkey")).as("c_hi"),
      min(col("day")).as("d_lo"), max(col("day")).as("d_hi"))
    // custkey arithmetic forced to 64-bit: in the column's native 32-bit
    // type (custkey > ~8.4M at large SF) Spark would silently wrap where
    // DuckDB raises, breaking the cross-engine gate.
    val xb = expr(s"((CAST(o_custkey AS BIGINT) - c_lo) * ${1L << ZDimBits})" +
      s" div (CAST(c_hi AS BIGINT) - c_lo + 1)")
    val yb = expr(s"((day - d_lo) * ${1L << ZDimBits}) div (d_hi - d_lo + 1)")
    val z = spread(col("xb")).bitwiseOR(shiftleft(spread(col("yb")), 1))
    o.crossJoin(broadcast(bounds))
      .select(col("o_custkey"), col("day"), xb.as("xb"), yb.as("yb"))
      .select(col("o_custkey"), col("day"),
        shiftrightunsigned(z, ZBucketShift).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"),
        (max(col("day")) - min(col("day"))).as("day_span"))
      .orderBy(col("bucket"))
  }

  val q86Sql: String = {
    def spread(v: String): String = {
      val s1 = s"(($v | ($v << 4)) & 3855)"
      val s2 = s"(($s1 | ($s1 << 2)) & 13107)"
      s"(($s2 | ($s2 << 1)) & 21845)"
    }
    val cells = 1L << ZDimBits
    s"""WITH o AS (
      |  SELECT o_custkey,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day
      |  FROM orders),
      |bounds AS (
      |  SELECT min(o_custkey) AS c_lo, max(o_custkey) AS c_hi,
      |    min(day) AS d_lo, max(day) AS d_hi FROM o),
      |nb AS (
      |  SELECT o_custkey, day,
      |    ((CAST(o_custkey AS BIGINT) - c_lo) * $cells)
      |      // (CAST(c_hi AS BIGINT) - c_lo + 1) AS xb,
      |    ((day - d_lo) * $cells) // (d_hi - d_lo + 1) AS yb
      |  FROM o CROSS JOIN bounds),
      |zed AS (
      |  SELECT o_custkey, day,
      |    (${spread("xb")} | (${spread("yb")} << 1)) >> $ZBucketShift AS bucket
      |  FROM nb)
      |SELECT bucket, count(*) AS n_orders,
      |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
      |  max(day) - min(day) AS day_span
      |FROM zed GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // ---------------------------------------------------------------- q93
  /** Nanoseconds per day — cohort/offset days are pure integer
    * division on the nanosecond ts (q85's no-calendar convention). */
  private val DayNs = 86400L * 1000000000L

  /** Daily cohort retention matrix — the product-analytics staple
    * beside q53's funnel: users are cohorted by first-activity day,
    * and cell (cohort, offset) counts how many of them were active
    * `offset` days later, with retention = the share of the cohort.
    * Offset 0 is the cohort size itself (retention 1.0 by definition —
    * kept, it's the matrix diagonal readers expect). Daily grain keeps
    * the fixture non-trivial (at ~2 events/user/day a user skips a
    * given day ~10% of the time, so off-diagonal cells are genuinely
    * < 1.0; weekly grain saturates to all-1.0 on this log).
    *
    * Shape for 100 TB: the event stream collapses to DISTINCT
    * (user, day) pairs in one partial-agged pass (the exchange
    * carries user-day rows, never events); first-day is a min-agg
    * re-aggregation of that frame on the same user_id partitioning;
    * the matrix is days² cells — O(1)-sized output however large the
    * log. All-integer counts; one float share per cell. */
  def q93Retention(spark: SparkSession, sfDir: String): DataFrame = {
    val uw = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div $DayNs").as("day"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    uw.join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("offset_days"))
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("offset_days"), col("cohort_users"),
        col("active_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 6)
          .as("retention"))
      .orderBy(col("cohort"), col("offset_days"))
  }

  val q93Sql: String =
    s"""WITH uw AS (
  SELECT DISTINCT user_id, epoch_ns(ts) // $DayNs AS day FROM events),
first AS (
  SELECT user_id, min(day) AS cohort FROM uw GROUP BY user_id),
sizes AS (
  SELECT cohort, count(*) AS cohort_users FROM first GROUP BY cohort),
cells AS (
  SELECT f.cohort, uw.day - f.cohort AS offset_days, count(*) AS active_users
  FROM uw JOIN first f ON uw.user_id = f.user_id
  GROUP BY f.cohort, uw.day - f.cohort)
SELECT c.cohort, c.offset_days, s.cohort_users, c.active_users,
  round(CAST(c.active_users AS DOUBLE) / s.cohort_users, 6) AS retention
FROM cells c JOIN sizes s ON c.cohort = s.cohort
ORDER BY c.cohort, c.offset_days"""

  // ---------------------------------------------------------------- q96
  /** In-session event-type transition matrix (first-order Markov
    * chain) — the path-analysis operator over q15's sessions: within
    * each session (same >30-min gap rule), consecutive events form
    * (from_type → to_type) transitions; the matrix gives each source
    * type's empirical next-step distribution (Σ p per from_type = 1),
    * the model behind next-action prediction and anomalous-flow
    * detection.
    *
    * Shape for 100 TB: ONE hash shuffle on user_id; the session flags,
    * cumulative session ids, and the lead() pairing all run inside the
    * same sorted partition (q15's plan — no second exchange for the
    * pairing); transitions partial-agg to a types² frame before the
    * final tiny aggregation. */
  def q96Transitions(spark: SparkSession, sfDir: String): DataFrame = {
    // event_id tiebreaker (r9): µs-truncated timestamps CAN tie within
    // a user at corpus scale, and lag/lead over a tied order is
    // engine-nondeterministic; (ts_us, event_id) is total on both sides
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"),
        col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .withColumn("to_type", lead(col("event_type"), 1).over(bySess))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("from_type"))
    trans
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(totals), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q96Sql: String =
    """WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type, event_id FROM events),
flagged AS (
  SELECT user_id, ts_us, event_type, event_id,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
sess AS (
  SELECT user_id, ts_us, event_type, event_id,
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
  FROM flagged),
trans AS (
  SELECT event_type AS from_type,
    lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS to_type
  FROM sess),
cnt AS (
  SELECT from_type, to_type, count(*) AS n FROM trans
  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, n,
  round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
FROM cnt ORDER BY from_type, to_type"""

  // --------------------------------------------------------------- q223
  /** Behavioral path perplexity — q81's language-model idea applied to
    * SESSIONS: every user's event-transition sequence is scored under
    * the global first-order Markov model (q96's sessionized
    * transitions, add-1-smoothed over the observed type set), and the
    * per-user perplexity flags atypical behavior — the bot/fraud/
    * broken-client screen that complements q63's volume anomalies with
    * a SEQUENCE anomaly signal.
    *
    * Shape for 100 TB: the model is O(types²) — built from ONE
    * sessionized pass and broadcast into the scoring join; per-user
    * scores are 1e-6-gridded log terms decimal-summed (q81's
    * discipline); output is one row per user with ≥1 transition. */
  def q223PathPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    // (ts_us, event_id) total order — the q96 tiebreaker discipline
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"),
        col("event_id"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .withColumn("to_type", lead(col("event_type"), 1).over(bySess))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"), col("to_type"))
    val counts = trans.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
    val nTypes = counts.select(col("to_type")).distinct()
      .agg(count(lit(1)).as("t"))
    val model = counts.join(fromTotals, "from_type")
      .crossJoin(broadcast(nTypes))
      .select(col("from_type"), col("to_type"),
        round(log((col("n") + 1L).cast("double") / (col("tot") + col("t")).cast("double")), 6)
          .cast(DecimalType(38, 6)).as("logp"))
    trans.join(broadcast(model), Seq("from_type", "to_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("logp")).as("ll"))
      .select(col("user_id"), col("n_trans"),
        round(-col("ll").cast("double") / col("n_trans"), 6).as("avg_nll"))
      .withColumn("perplexity", round(exp(col("avg_nll")), 6))
      .orderBy(col("user_id"))
  }

  val q223Sql: String =
    """WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type, event_id FROM events),
flagged AS (
  SELECT user_id, ts_us, event_type, event_id,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
sess AS (
  SELECT user_id, ts_us, event_type, event_id,
    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_id
  FROM flagged),
trans AS MATERIALIZED (
  SELECT user_id, from_type, to_type FROM (
    SELECT user_id, event_type AS from_type,
      lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts_us, event_id) AS to_type
    FROM sess) WHERE to_type IS NOT NULL),
cnt AS (
  SELECT from_type, to_type, count(*) AS n FROM trans GROUP BY 1, 2),
ft AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
t AS (SELECT count(DISTINCT to_type) AS t FROM cnt),
model AS (
  SELECT from_type, to_type,
    CAST(round(ln(CAST(n + 1 AS DOUBLE) / CAST(tot + t AS DOUBLE)), 6) AS DECIMAL(38,6)) AS logp
  FROM cnt JOIN ft USING (from_type) CROSS JOIN t),
scored AS (
  SELECT user_id, count(*) AS n_trans, sum(logp) AS ll
  FROM trans JOIN model USING (from_type, to_type)
  GROUP BY user_id)
SELECT user_id, n_trans,
  round(-CAST(ll AS DOUBLE) / n_trans, 6) AS avg_nll,
  round(exp(round(-CAST(ll AS DOUBLE) / n_trans, 6)), 6) AS perplexity
FROM scored ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- q226
  /** Decile lift / cumulative-gain table — the campaign-targeting view
    * of a propensity score (q156 asks calibrated?, q161 discriminates?,
    * q188 where to cut?; this answers "how much better than random is
    * targeting the top k deciles?"): users ranked by activity (the
    * q186 predictor — the fitted logistic is monotone in it, so the
    * ranking is the model's), binned by frozen activity deciles
    * (q192's percentile identity), and read TOP-DOWN with cumulative
    * conversion rate, lift over the base rate, and capture share.
    *
    * Shape for 100 TB: ONE partial-agged per-user pass, a 9-value
    * percentile broadcast, an O(bins) census; the cumulative window
    * runs on ≤10 rows. Integer counts until the final divisions. */
  def q226LiftTable(spark: SparkSession, sfDir: String): DataFrame = {
    val lu = labeledUsers(spark, sfDir)
    val qs = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val th = lu.agg(percentile(col("x"), qs).as("t"))
    val binned = lu.crossJoin(broadcast(th))
      .withColumn("bin",
        (1 to 9).map(i => when(col("x") > round(col("t")(i - 1), 6), 1)
          .otherwise(0)).reduce(_ + _) + 1)
    val census = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y").cast("long")).as("n_conv"))
    val tot = census.agg(sum(col("n_users")).as("tu"), sum(col("n_conv")).as("tc"))
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census.crossJoin(broadcast(tot))
      .withColumn("cum_users", sum(col("n_users")).over(w))
      .withColumn("cum_conv", sum(col("n_conv")).over(w))
      .select(col("bin"), col("n_users"), col("n_conv"),
        round(col("n_conv").cast("double") / col("n_users"), 6).as("conv_rate"),
        col("cum_users"), col("cum_conv"),
        round((col("cum_conv") * col("tu")).cast("double")
          / (col("cum_users") * col("tc")).cast("double"), 6).as("lift"),
        round(col("cum_conv").cast("double") / col("tc"), 6).as("capture"))
      .orderBy(col("bin").desc)
  }

  def q226Sql: String = {
    val bins = (1 to 9).map(i =>
      s"(CASE WHEN x > round(t[$i], 6) THEN 1 ELSE 0 END)").mkString("\n      + ")
    s"""WITH $labeledUsersSql,
      |th AS (
      |  SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
      |  FROM per_user),
      |binned AS (
      |  SELECT y, 1 + $bins AS bin
      |  FROM per_user CROSS JOIN th),
      |census AS (
      |  SELECT bin, count(*) AS n_users,
      |    CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_conv
      |  FROM binned GROUP BY bin),
      |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS tu,
      |  CAST(sum(n_conv) AS BIGINT) AS tc FROM census),
      |cum AS (
      |  SELECT bin, n_users, n_conv,
      |    CAST(sum(n_users) OVER (ORDER BY bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users,
      |    CAST(sum(n_conv) OVER (ORDER BY bin DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_conv
      |  FROM census)
      |SELECT bin, n_users, n_conv,
      |  round(CAST(n_conv AS DOUBLE) / n_users, 6) AS conv_rate,
      |  cum_users, cum_conv,
      |  round(CAST(cum_conv * tu AS DOUBLE) / CAST(cum_users * tc AS DOUBLE), 6) AS lift,
      |  round(CAST(cum_conv AS DOUBLE) / tc, 6) AS capture
      |FROM cum CROSS JOIN tot ORDER BY bin DESC""".stripMargin
  }

  // ---------------------------------------------------------------- q101
  /** Buckets for the local-skyline prune phase. */
  val SkyBuckets = 32

  /** 2-D skyline (Pareto front) of orders on (totalprice ↑, orderdate ↑):
    * the orders no other order beats on both price and recency — the
    * dominance query (multi-criteria "best" set) OLAP engines ship as a
    * first-class operator and Spark has no node for. Composed from
    * windows (custom-operator ladder preference (a)):
    *
    * Phase 1 prunes LOCALLY: points are hash-bucketed, and each
    * bucket's skyline is computed with a partitioned window (sort by
    * price DESC, date DESC; a point survives iff its date beats the
    * running max over strictly-preceding rows). Dominance is transitive
    * and global skyline points can never be dominated, so the union of
    * local skylines contains exactly the global skyline plus a small
    * residue — the scale trick: the UNPARTITIONED phase-2 window runs
    * on ~|skyline|·buckets survivors, never the corpus (a naive global
    * window would funnel 100 TB through one partition).
    *
    * Points are first made DISTINCT (identical (price, date) pairs
    * carry an n_orders count), which makes the running-max strictness
    * test exactly the ≥/≥-with-one-strict dominance definition. */
  def q101Skyline(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.orders(spark, sfDir)
      .select(col("o_totalprice").as("price"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("date_us"))
      .groupBy(col("price"), col("date_us")).agg(count(lit(1)).as("n_orders"))
    def survivors(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec) =
      df.withColumn("mp", max(col("date_us")).over(
          w.orderBy(col("price").desc, col("date_us").desc)
            .rowsBetween(Window.unboundedPreceding, -1)))
        .filter(col("mp").isNull || col("date_us") > col("mp"))
        .drop("mp")
    val local = survivors(
      pts.withColumn("b", pmod(hash(col("price"), col("date_us")), lit(SkyBuckets))),
      Window.partitionBy(col("b"))).drop("b")
    survivors(local, Window.partitionBy())
      .orderBy(col("price").desc, col("date_us"))
  }

  val q101Sql: String =
    """WITH pts AS (
      |  SELECT o_totalprice AS price, epoch_us(o_orderdate) AS date_us,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2),
      |sky AS (
      |  SELECT price, date_us, n_orders,
      |    max(date_us) OVER (ORDER BY price DESC, date_us DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |  FROM pts)
      |SELECT price, date_us, n_orders FROM sky
      |WHERE mp IS NULL OR date_us > mp
      |ORDER BY price DESC, date_us""".stripMargin

  // ---------------------------------------------------------------- q102
  val BasketMinSupport = 5
  val BasketTopK = 50

  /** Market-basket association mining over order baskets: which part
    * BRAND pairs co-occur in an order far beyond chance? Per-order
    * distinct brands (lineitem joined to the broadcast part dim), pair
    * counts c_ab, per-brand counts c_a, and
    * lift = c_ab·N / (c_a·c_b) — the recommender/affinity primitive.
    * Pairs under [[BasketMinSupport]] orders are dropped; top
    * [[BasketTopK]] by round(6)-gridded lift (rank-after-grid, q48
    * convention).
    *
    * Shape for 100 TB: the dim join is broadcast; the pair self-join
    * runs WITHIN an order key (bounded basket size ⇒ bounded fan-out,
    * never corpus×corpus); everything downstream of the per-order
    * distinct is counts of (brand) and (brand, brand) rows — a
    * vocabulary-sized frame. Lift's integer cross-multiplication stays
    * in int64 inside the one double division. */
  def q102Basket(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val pt = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand"))
    val ob = li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
    val n = ob.select(col("ok")).distinct().agg(count(lit(1)).as("n"))
    val ca = ob.groupBy(col("brand")).agg(count(lit(1)).as("c"))
    val pairs = ob.as("x").join(ob.as("y"),
        col("x.ok") === col("y.ok") && col("x.brand") < col("y.brand"))
      .select(col("x.brand").as("a"), col("y.brand").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= BasketMinSupport)
    val lift = round((col("c_ab") * col("n")).cast("double")
      / (col("c_a") * col("c_b")).cast("double"), 6)
    val top = pairs
      .join(broadcast(ca.select(col("brand").as("a"), col("c").as("c_a"))), "a")
      .join(broadcast(ca.select(col("brand").as("b"), col("c").as("c_b"))), "b")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"), lift.as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b")).limit(BasketTopK)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("lift").desc, col("a"), col("b"))))
      .select(col("rank"), col("a"), col("b"), col("c_ab"), col("lift"))
      .orderBy(col("rank"))
  }

  val q102Sql: String =
    s"""WITH ob AS (
      |  SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |nn AS (SELECT count(DISTINCT ok) AS n FROM ob),
      |ca AS (SELECT brand, count(*) AS c FROM ob GROUP BY brand),
      |pairs AS (
      |  SELECT x.brand AS a, y.brand AS b, count(*) AS c_ab
      |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.brand < y.brand
      |  GROUP BY 1, 2 HAVING count(*) >= $BasketMinSupport),
      |scored AS (
      |  SELECT p.a, p.b, p.c_ab,
      |    round(CAST(p.c_ab * nn.n AS DOUBLE) / CAST(x.c * y.c AS DOUBLE), 6) AS lift
      |  FROM pairs p
      |  JOIN ca x ON x.brand = p.a JOIN ca y ON y.brand = p.b
      |  CROSS JOIN nn),
      |ranked AS (
      |  SELECT a, b, c_ab, lift,
      |    row_number() OVER (ORDER BY lift DESC, a, b) AS rank
      |  FROM scored)
      |SELECT rank, a, b, c_ab, lift FROM ranked
      |WHERE rank <= $BasketTopK ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- q103
  val AcfMaxLag = 7

  /** Autocorrelation function of the daily event-count series at
    * calendar-day lags 0..[[AcfMaxLag]] — the seasonality probe run
    * before any forecasting/anomaly model (q63/q77/q85's sibling:
    * "does this series repeat weekly?"). Sample ACF with the global
    * mean: r_k = Σ_t (x_t−x̄)(x_{t+k}−x̄) / Σ_t (x_t−x̄)².
    *
    * Exactness: with S = Σx and n the day count, n·x_t − S is an
    * integer, and r_k = Σ(n·x_t−S)(n·x_{t+k}−S) / Σ(n·x_t−S)² — the
    * 1/n² factors cancel — so BOTH sums run in exact int64 (association-
    * free like q79's gridded terms) and the single double division is
    * the only float op, identical on both engines. Lag alignment is by
    * CALENDAR day (a join on day+k), so a missing day shortens the
    * overlap instead of silently misaligning rows.
    *
    * Shape for 100 TB: the corpus-wide work is one partial-agged
    * groupBy(day); everything after runs on the |days|-row series with
    * broadcast scalars. */
  def q103Acf(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val tot = daily.agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val cent = daily.crossJoin(broadcast(tot))
      .select(col("day"), (col("n") * col("x") - col("s")).as("c"))
    val joined = cent.as("a").join(cent.as("b"),
        col("b.day") >= col("a.day") && col("b.day") <= col("a.day") + AcfMaxLag)
      .select((col("b.day") - col("a.day")).as("lag"),
        (col("a.c") * col("b.c")).as("p"))
      .groupBy(col("lag")).agg(count(lit(1)).as("n_pairs"), sum(col("p")).as("num"))
    val den = joined.filter(col("lag") === 0).select(col("num").as("den"))
    joined.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("acf"))
      .orderBy(col("lag"))
  }

  val q103Sql: String =
    s"""WITH daily AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, count(*) AS x
      |  FROM events GROUP BY 1),
      |tot AS (SELECT sum(x) AS s, count(*) AS n FROM daily),
      |cent AS (SELECT day, (tot.n * x - tot.s) AS c FROM daily CROSS JOIN tot),
      |lagp AS (
      |  SELECT b.day - a.day AS lag, count(*) AS n_pairs, sum(a.c * b.c) AS num
      |  FROM cent a JOIN cent b
      |    ON b.day >= a.day AND b.day <= a.day + $AcfMaxLag
      |  GROUP BY 1),
      |den AS (SELECT num AS den FROM lagp WHERE lag = 0)
      |SELECT lag, n_pairs,
      |  round(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE), 6) AS acf
      |FROM lagp CROSS JOIN den
      |ORDER BY lag""".stripMargin

  // ---------------------------------------------------------------- q105
  val ConcSessionUs = 300000000L // each event opens a 5-minute session
  val DayUs = 86400000000L

  /** Peak concurrency per calendar day — the interval/sweep-line
    * operator (capacity planning's "how many sessions were open at
    * once?"): each event opens a [ts, ts+5 min) session; per day, the
    * maximum number of simultaneously open sessions. Classic sweep
    * line: ±1 boundary deltas, running sum, max.
    *
    * Scale shape: intervals are CLIPPED to day windows first (a 5-min
    * session spans ≤2 days, so the clip emits ≤2 pieces per event),
    * which lets the sweep window partition BY DAY — the corpus never
    * funnels through a single global sort partition, and each day's
    * sweep is an in-partition sort of that day's boundaries. End
    * deltas sort before starts at the same instant ([start, end)
    * semantics); tie groups are monotone runs, so the running max is
    * permutation-invariant under equal keys — deterministic on both
    * engines. */
  def q105Concurrency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(expr("ts div 1000").as("s"))
      .withColumn("e", col("s") + ConcSessionUs)
      .select(col("s"), col("e"),
        expr(s"s div $DayUs").as("d1"), expr(s"(e - 1) div $DayUs").as("d2"))
    val arm1 = ev.select(col("d1").as("day"), col("s").as("t"), lit(1).as("delta"))
    val arm2 = ev.select(col("d1").as("day"),
      least(col("e"), (col("d1") + 1) * DayUs).as("t"), lit(-1).as("delta"))
    val cross = ev.filter(col("d2") > col("d1"))
    val arm3 = cross.select(col("d2").as("day"), (col("d2") * DayUs).as("t"), lit(1).as("delta"))
    val arm4 = cross.select(col("d2").as("day"), col("e").as("t"), lit(-1).as("delta"))
    val deltas = arm1.unionAll(arm2).unionAll(arm3).unionAll(arm4)
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("cur", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg(max(col("cur")).as("max_concurrency"),
        expr("count(1) div 2").as("n_sessions"))
      .orderBy(col("day"))
  }

  val q105Sql: String =
    s"""WITH ev0 AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |    epoch_us(CAST(ts AS TIMESTAMP)) + $ConcSessionUs AS e
      |  FROM events),
      |ev AS (SELECT s, e, s // $DayUs AS d1, (e - 1) // $DayUs AS d2 FROM ev0),
      |deltas AS (
      |  SELECT d1 AS day, s AS t, 1 AS delta FROM ev
      |  UNION ALL
      |  SELECT d1, least(e, (d1 + 1) * $DayUs), -1 FROM ev
      |  UNION ALL
      |  SELECT d2, d2 * $DayUs, 1 FROM ev WHERE d2 > d1
      |  UNION ALL
      |  SELECT d2, e, -1 FROM ev WHERE d2 > d1),
      |run AS (
      |  SELECT day,
      |    sum(delta) OVER (PARTITION BY day ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
      |  FROM deltas)
      |SELECT day, CAST(max(cur) AS BIGINT) AS max_concurrency,
      |  count(*) // 2 AS n_sessions
      |FROM run GROUP BY day ORDER BY day""".stripMargin

  // --------------------------------------------------------------- q111
  /** Session gap for the streaming session-window (µs twin below). */
  val SessGap = "30 minutes"
  val SessGapUs = 30L * 60 * 1000000

  /** Stateful-streaming batch equivalence — q15's sessionization run
    * through the REAL streaming engine's `session_window` (gap-merged
    * event-time sessions, the stateful operator `window()` can't
    * express), availableNow trigger, file sink, read back as the
    * result. q98 put the stateless windowed path under the oracle
    * regime; this row does the same for the session-STATE path: merge
    * of adjacent gap-windows, watermark-driven finalization, append
    * emission of only closed sessions.
    *
    * Determinism (q98's argument, session form): one micro-batch
    * drains the source, then the finalize batch advances the watermark
    * to max(event time) − 2 h (ms floor) and emits exactly the
    * sessions whose window end — LAST event + 30-min gap — the
    * watermark has passed. The oracle replays q15's gap-rule sessions
    * and keeps the same closed set with a HAVING.
    *
    * Scale shape: the production streaming plan — state keyed by
    * (user, session), bounded by the watermark horizon (closed
    * sessions are evicted on emission), partial agg per micro-batch.
    * Nothing downstream touches the event grain except the one
    * stateful shuffle on user_id. */
  def q111StreamSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = Tables.eventsRaw(spark, sfDir)
    val tsEventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q111_")
    val outDir = tmp.resolve("out").toString
    val cpDir = tmp.resolve("cp").toString
    val agg = spark.readStream.schema(raw.schema).parquet(s"$sfDir/[e]vents.parquet")
      .select(tsEventTime.as("ts"), col("user_id"), col("value"))
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), SessGap))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("tv"),
        max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("last_ts")).as("session_end_us"),
        col("n_events"), asD(col("tv")).as("session_value"))
    agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val res = spark.read.parquet(outDir)
      .orderBy(col("user_id"), col("session_start_us"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q111Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, value,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > $SessGapUs THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sessions AS (
      |  SELECT user_id, ts_us, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS session_id
      |  FROM flagged),
      |wm AS (SELECT (max(ts_us) // 1000 - $StreamDelayMs) * 1000 AS w FROM ev)
      |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
      |  count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS session_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |HAVING max(ts_us) + $SessGapUs <= (SELECT w FROM wm)
      |ORDER BY user_id, session_start_us""".stripMargin

  // --------------------------------------------------------------- q112
  /** Compaction bin capacity (bytes of text per planned output file). */
  val CompactTargetBytes = 65536L

  /** Small-file compaction planner — the table-maintenance operator a
    * 100 TB lakehouse runs continuously: given per-file sizes (each
    * document plays a file, n_chars its bytes), plan per-source output
    * bins of ~[[CompactTargetBytes]] by next-fit over a
    * largest-first ordering: files sort by (size DESC, id), and a
    * file's bin is its running-total START offset divided by the
    * capacity. Emits the plan summary per (source, bin): file count,
    * bytes, largest member, fill ratio — what a compaction executor
    * would consume as its work list.
    *
    * Shape for 100 TB: the frame is file METADATA (one row per file,
    * never file contents), one hash shuffle on source; the prefix sum
    * runs inside each source's sorted partition; output is
    * O(total bytes / capacity) rows. A source whose listing alone
    * exceeds a partition gets range-split by the same rule applied per
    * directory shard. */
  def q112Compaction(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("bin", expr(s"(cum - n_chars) div $CompactTargetBytes"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
        max(col("n_chars")).as("largest_file"),
        round(sum(col("n_chars")).cast("double") / CompactTargetBytes, 6)
          .as("fill_ratio"))
      .orderBy(col("source"), col("bin"))
  }

  val q112Sql: String =
    s"""WITH f AS (
      |  SELECT source, doc_id, n_chars,
      |    sum(n_chars) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents)
      |SELECT source, CAST((cum - n_chars) // $CompactTargetBytes AS BIGINT) AS bin,
      |  count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  max(n_chars) AS largest_file,
      |  round(CAST(sum(n_chars) AS DOUBLE) / $CompactTargetBytes, 6) AS fill_ratio
      |FROM f GROUP BY source, bin
      |ORDER BY source, bin""".stripMargin

  // --------------------------------------------------------------- q114
  /** Winsorized (clipped) robust statistics per part brand — the
    * outlier-tolerant aggregation feature pipelines use where a raw
    * mean is skew-dominated: exact nearest-rank P05/P95 bounds per
    * brand via integer rank arithmetic (lo = ⌈n/20⌉, hi = ⌈19n/20⌉ —
    * no float percentile, so both engines pick the identical element),
    * then every price clips into [p05, p95] before the mean.
    *
    * Shape for 100 TB: ONE hash shuffle on brand; rank, bounds (a
    * conditional window agg — the bound value rides the same sorted
    * partition, no second pass), clip, and the final partial-agged
    * mean all stay in that partition. Decimal sums keep the means
    * order-independent. */
  def q114Winsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val byBrand = Window.partitionBy(col("p_brand"))
    val ordered = byBrand.orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("rn", row_number().over(ordered))
      .withColumn("n", count(lit(1)).over(byBrand))
      .withColumn("p05", max(when(col("rn") === expr("(n + 19) div 20"),
        col("p_retailprice"))).over(byBrand))
      .withColumn("p95", max(when(col("rn") === expr("(19 * n + 19) div 20"),
        col("p_retailprice"))).over(byBrand))
      .withColumn("clipped",
        least(greatest(col("p_retailprice"), col("p05")), col("p95")))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        max(col("p05")).as("p05"), max(col("p95")).as("p95"),
        round(dsum(col("p_retailprice")).cast("double") / count(lit(1)), 6)
          .as("mean_raw"),
        round(dsum(col("clipped")).cast("double") / count(lit(1)), 6)
          .as("mean_winsor"))
      .orderBy(col("p_brand"))
  }

  val q114Sql: String =
    """WITH r AS (
      |  SELECT p_brand, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS rn,
      |    count(*) OVER (PARTITION BY p_brand) AS n
      |  FROM part),
      |b AS (
      |  SELECT p_brand, p_retailprice, n,
      |    max(CASE WHEN rn = (n + 19) // 20 THEN p_retailprice END)
      |      OVER (PARTITION BY p_brand) AS p05,
      |    max(CASE WHEN rn = (19 * n + 19) // 20 THEN p_retailprice END)
      |      OVER (PARTITION BY p_brand) AS p95
      |  FROM r)
      |SELECT p_brand, count(*) AS n_parts, max(p05) AS p05, max(p95) AS p95,
      |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_raw,
      |  round(CAST(sum(CAST(least(greatest(p_retailprice, p05), p95) AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS mean_winsor
      |FROM b GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // --------------------------------------------------------------- q115
  val PathPrefixLen = 5
  val PathTopK = 20

  /** Top session paths — the navigation-mining companion to q96's
    * transition matrix: each session's first [[PathPrefixLen]]
    * event types joined into a `a>b>c` path string, counted across
    * sessions, top [[PathTopK]] by (count DESC, path) with the rank
    * emitted. Transitions give the one-step model; paths surface the
    * actual dominant journeys.
    *
    * Shape for 100 TB: q15's single user_id shuffle builds sessions;
    * the prefix rows partial-agg into one path string per session
    * (collect_list is bounded at [[PathPrefixLen]] elements by the rn
    * filter — never an unbounded per-group array); the path frame is
    * ≤ |event types|^len rows, so the final unpartitioned top-k
    * window is O(vocabulary), the q101-phase-2 argument. */
  def q115SessionPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val bySess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts_us"))
    val prefix = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessGapUs, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .withColumn("rn", row_number().over(bySess))
      .filter(col("rn") <= PathPrefixLen)
    val paths = prefix.groupBy(col("user_id"), col("session_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"),
        count(lit(1)).as("n_steps"))
    val agg = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        round(sum(col("n_steps")).cast("double") / count(lit(1)), 6).as("avg_len"))
    agg.withColumn("rank",
        row_number().over(Window.orderBy(col("n_sessions").desc, col("path"))))
      .filter(col("rank") <= PathTopK)
      .select(col("rank"), col("path"), col("n_sessions"), col("avg_len"))
      .orderBy(col("rank"))
  }

  val q115Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, event_type,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |              OR ts_us - lag(ts_us) OVER w > $SessGapUs THEN 1 ELSE 0 END AS new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |sess AS (
      |  SELECT user_id, ts_us, event_type,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS session_id
      |  FROM flagged),
      |pref AS (
      |  SELECT user_id, session_id, event_type,
      |    row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts_us) AS rn
      |  FROM sess QUALIFY rn <= $PathPrefixLen),
      |paths AS (
      |  SELECT user_id, session_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path, count(*) AS n_steps
      |  FROM pref GROUP BY user_id, session_id),
      |agg AS (
      |  SELECT path, count(*) AS n_sessions,
      |    round(CAST(sum(n_steps) AS DOUBLE) / count(*), 6) AS avg_len
      |  FROM paths GROUP BY path)
      |SELECT row_number() OVER (ORDER BY n_sessions DESC, path) AS rank,
      |  path, n_sessions, avg_len
      |FROM agg QUALIFY rank <= $PathTopK
      |ORDER BY rank""".stripMargin

  // --------------------------------------------------------------- q118
  /** Price width of the phase-1 range buckets for the global rank. */
  val RankBucketWidth = 1000.0

  /** Equal-frequency decile binning of orders by total price — the
    * discretization primitive behind feature bucketing and monotone
    * calibration — computed with an EXACT global rank that never
    * funnels the corpus through one partition: phase 1 buckets prices
    * into fixed [[RankBucketWidth]] ranges and counts each bucket;
    * phase 2 turns the tiny bucket-count frame into cumulative start
    * offsets (window over O(price range / width) rows); phase 3
    * broadcast-joins the offsets back and ranks WITHIN each bucket
    * (row_number partitioned by bucket), so global_rank = bucket
    * offset + local rank — a total order with no global window. The
    * decile is then pure rank arithmetic, identical in the oracle's
    * single-window formulation.
    *
    * This is the scale-out answer to `ntile()`: same exactness, but
    * the only unpartitioned state is the bucket histogram. */
  def q118RankBins(spark: SparkSession, sfDir: String): DataFrame = {
    val priced = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"),
        expr(s"cast(floor(o_totalprice / $RankBucketWidth) as bigint)").as("bucket"))
    val counts = priced.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val offsets = counts
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
    val ranked = priced.join(broadcast(offsets.select(col("bucket"), col("off"), col("total"))), "bucket")
      .withColumn("rnk", col("off") + row_number().over(
        Window.partitionBy(col("bucket"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))))
      .withColumn("decile", expr("1 + ((rnk - 1) * 10) div total"))
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        asD(dsum(col("o_totalprice"))).as("sum_price"),
        round(dsum(col("o_totalprice")).cast("double") / count(lit(1)), 6)
          .as("avg_price"))
      .orderBy(col("decile"))
  }

  val q118Sql: String =
    """WITH r AS (
      |  SELECT o_totalprice,
      |    row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
      |    count(*) OVER () AS total
      |  FROM orders)
      |SELECT 1 + ((rnk - 1) * 10) // total AS decile,
      |  count(*) AS n_orders, min(o_totalprice) AS min_price,
      |  max(o_totalprice) AS max_price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_price,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_price
      |FROM r GROUP BY decile
      |ORDER BY decile""".stripMargin

  // --------------------------------------------------------------- q121
  /** Hour-of-day seasonality strength per event type — ANOVA η² (the
    * between-hour share of total variance of hourly counts): the
    * signal that decides whether a pipeline's load model, anomaly
    * baseline (q63), or trend smoother (q85) needs an hour-of-day
    * term. Cells are hourly counts on the PRESENT (type, day)×24 grid
    * (q85's zero-fill convention), so quiet hours count as real zeros.
    *
    * Exactness: with a constant D days per type, both sums of squares
    * reduce to INTEGER forms — n·SS_hour = 24·Σ_h S_h² − S² and
    * n·SS_tot = n·Q − S² (n = 24D, S_h per-hour sums, Q = Σc²) — so
    * η² is a ratio of int64s with ONE double division at the end: no
    * float summation order anywhere, the q103 centering trick in ANOVA
    * form. Peak hour is an integer argmax (max S_h, ties → min h).
    *
    * Shape for 100 TB: one partial-agged groupBy to hourly cells
    * (the only corpus-scale exchange), then per-type frames of 24·D
    * rows; output is |types| rows. */
  def q121Seasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hr"))
      .groupBy(col("event_type"), col("day"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val grid = hourly.select(col("event_type"), col("day")).distinct()
      .select(col("event_type"), col("day"),
        explode(sequence(lit(0L), lit(23L))).as("hr"))
    val cells = grid.join(hourly, Seq("event_type", "day", "hr"), "left")
      .select(col("event_type"), col("day"), col("hr"),
        coalesce(col("c"), lit(0L)).as("c"))
    val byHour = cells.groupBy(col("event_type"), col("hr"))
      .agg(sum(col("c")).as("sh"), count(lit(1)).as("d"),
        sum(col("c") * col("c")).as("qh"))
    byHour.groupBy(col("event_type"))
      .agg(max(col("d")).as("n_days"), // constant across hours by grid construction
        sum(col("sh")).as("s"), sum(col("qh")).as("q"),
        sum(col("sh") * col("sh")).as("ssh"),
        max(struct(col("sh"), (-col("hr")).as("nh"))).as("peak"))
      .select(col("event_type"), col("n_days"),
        round(when(lit(24L) * col("n_days") * col("q") - col("s") * col("s") === 0, lit(0.0))
          .otherwise((lit(24L) * col("ssh") - col("s") * col("s")).cast("double")
            / (lit(24L) * col("n_days") * col("q") - col("s") * col("s")).cast("double")), 6)
          .as("eta2"),
        (-col("peak.nh")).as("peak_hour"),
        round(col("peak.sh").cast("double") / col("s"), 6).as("peak_share"))
      .orderBy(col("event_type"))
  }

  val q121Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hr, count(*) AS c
      |  FROM events GROUP BY 1, 2, 3),
      |grid AS (
      |  SELECT d.event_type, d.day, h.hr
      |  FROM (SELECT DISTINCT event_type, day FROM hourly) d
      |  CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h),
      |cells AS (
      |  SELECT g.event_type, g.day, g.hr, coalesce(hourly.c, 0) AS c
      |  FROM grid g LEFT JOIN hourly
      |    ON hourly.event_type = g.event_type AND hourly.day = g.day AND hourly.hr = g.hr),
      |byhour AS (
      |  SELECT event_type, hr, CAST(sum(c) AS BIGINT) AS sh,
      |    count(*) AS d, CAST(sum(c * c) AS BIGINT) AS qh
      |  FROM cells GROUP BY event_type, hr),
      |agg AS (
      |  SELECT event_type, max(d) AS n_days,
      |    CAST(sum(sh) AS BIGINT) AS s, CAST(sum(qh) AS BIGINT) AS q,
      |    CAST(sum(sh * sh) AS BIGINT) AS ssh
      |  FROM byhour GROUP BY event_type),
      |peak AS (
      |  SELECT event_type, sh AS peak_sh, hr AS peak_hour FROM (
      |    SELECT event_type, sh, hr,
      |      row_number() OVER (PARTITION BY event_type ORDER BY sh DESC, hr) AS rn
      |    FROM byhour) WHERE rn = 1)
      |SELECT a.event_type, a.n_days,
      |  round(CASE WHEN 24 * a.n_days * a.q - a.s * a.s = 0 THEN 0.0
      |    ELSE CAST(24 * a.ssh - a.s * a.s AS DOUBLE) / CAST(24 * a.n_days * a.q - a.s * a.s AS DOUBLE) END, 6) AS eta2,
      |  p.peak_hour, round(CAST(p.peak_sh AS DOUBLE) / a.s, 6) AS peak_share
      |FROM agg a JOIN peak p ON p.event_type = a.event_type
      |ORDER BY a.event_type""".stripMargin

  // --------------------------------------------------------------- q122
  /** CSV source/sink round-trip under the oracle gate — q106's
    * fidelity contract for the OTHER interchange format pipelines
    * still ingest: the normalized event log (bigint ts, JSON-bearing
    * `props` full of commas, quotes, and braces — a real quoting
    * stress) is written as quoted/escaped CSV, read back through the
    * CSV source with an explicit schema, and aggregated per type with
    * a content checksum (Σ hash32(props)) beside exact decimal value
    * sums. A hash match proves the writer/reader round-trips every
    * row bit-exactly (quoting, escaping, null-vs-empty, double
    * formatting); the oracle computes the same aggregates from the
    * original parquet. Scale shape: write and read are parallel per
    * split; the aggregate is one partial-agged groupBy. */
  def q122CsvIo(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_q122_")
    val dir = tmp.resolve("events_csv").toString
    // \N null sentinel: CSV can't otherwise distinguish null from ""
    ev.write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .csv(dir)
    val res = spark.read.schema(ev.schema)
      .option("header", "true").option("nullValue", "\\N")
      .csv(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // Σ(ts mod p): int64-safe per-row timestamp fingerprint (a raw
        // Σts over ~1e18 ns values would overflow the bigint)
        sum(expr("ts % 1000000007")).as("ts_mod_sum"),
        asD(dsum(col("value"))).as("total_value"),
        sum(MF.hash32(col("props"))).as("props_checksum"))
      .orderBy(col("event_type"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q122Sql: String =
    s"""SELECT event_type, count(*) AS n_events,
      |  CAST(sum(epoch_ns(ts) % 1000000007) AS BIGINT) AS ts_mod_sum,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value,
      |  CAST(sum(${graft.oracle.Sql.hash32OfHex("md5(props)")}) AS BIGINT) AS props_checksum
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q123
  /** Unpivot (melt) — q51's pivot run in reverse, the wide→long
    * reshape feature stores need before a union or a generic
    * per-measure pipeline: lineitem's four numeric measures unpivot
    * into (measure, value) rows via `stack`, then aggregate per
    * (returnflag, measure).
    *
    * Shape for 100 TB: `stack` is a map-side constant-factor (4×)
    * row generator feeding a partial aggregation — the exchange
    * carries flags × measures rows, never the melted corpus. The
    * wrong plan here (unioning four full scans) reads the table four
    * times; the unpivot reads it once. */
  def q123Unpivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag",
        """stack(4,
          |  'quantity', l_quantity,
          |  'extendedprice', l_extendedprice,
          |  'discount', l_discount,
          |  'tax', l_tax) AS (measure, value)""".stripMargin)
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), asD(dsum(col("value"))).as("total"))
      .orderBy(col("l_returnflag"), col("measure"))

  val q123Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
      |SELECT l_returnflag, measure, count(*) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total
      |FROM m GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  // --------------------------------------------------------------- q124
  /** SCD type-2 dimension build — the lakehouse history-table op: each
    * user's event stream collapses into versioned state intervals
    * (consecutive runs of the same event_type), with `valid_from` /
    * `valid_to` (next version's start, NULL while current) and a
    * version number. The gaps-and-islands change-flag + running-sum
    * idiom; `valid_to` rides a lead() over the per-user version frame.
    *
    * Shape for 100 TB: ONE hash shuffle on user_id — change flags,
    * version ids, the island aggregation, and the lead() all stay in
    * that sorted partition (the island frame re-partitions by the
    * same key, so AQE coalesces it into the same exchange); output is
    * O(state changes), the natural size of an SCD2 dimension. */
  def q124Scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byVersion = Window.partitionBy(col("user_id")).orderBy(col("version"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byUser).isNull ||
          lag(col("event_type"), 1).over(byUser) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("version", sum(col("chg")).over(byUser))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("event_type")).as("state"), // constant within the island
        count(lit(1)).as("n_events"),
        expr("min(ts) div 1000").as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVersion))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col("user_id"), col("version"), col("state"), col("n_events"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q124Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id, event_type
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts_us, event_id, event_type,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |              OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |versioned AS (
      |  SELECT user_id, ts_us, event_type,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version
      |  FROM flagged),
      |islands AS (
      |  SELECT user_id, version, min(event_type) AS state, count(*) AS n_events,
      |    min(ts_us) AS valid_from_us
      |  FROM versioned GROUP BY user_id, version)
      |SELECT user_id, version, state, n_events, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) AS valid_to_us,
      |  (lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version) IS NULL) AS is_current
      |FROM islands
      |ORDER BY user_id, version""".stripMargin

  // --------------------------------------------------------------- q125
  /** Last-touch attribution — the marketing/product staple: each
    * `purchase` event's value is attributed to the SAME user's most
    * recent preceding non-purchase event type (the "touch"); revenue
    * and purchase counts aggregate per touch channel with an exact
    * decimal share-of-total. Purchases with no preceding touch land in
    * 'none'.
    *
    * Shape for 100 TB: ONE hash shuffle on user_id; the running
    * last-non-purchase state is an ignoreNulls last() over the same
    * sorted partition (no self-join, no as-of re-sort), and the share
    * divides two decimal sums on a |event types|-row frame. */
  def q125Attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val attributed = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("rev_dec"))
    attributed
      .withColumn("total_dec", sum(col("rev_dec")).over(Window.partitionBy()))
      .select(col("touch"), col("n_purchases"),
        asD(col("rev_dec")).as("revenue"),
        round(col("rev_dec").cast("double") / col("total_dec").cast("double"), 6)
          .as("rev_share"))
      .orderBy(col("touch"))
  }

  val q125Sql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
      |    event_type, value
      |  FROM events),
      |touched AS (
      |  SELECT event_type, value,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM ev),
      |agg AS (
      |  SELECT coalesce(touch, 'none') AS touch, count(*) AS n_purchases,
      |    sum(CAST(value AS DECIMAL(38,6))) AS rev_dec
      |  FROM touched WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT touch, n_purchases,
      |  round(CAST(rev_dec AS DOUBLE), 6) AS revenue,
      |  round(CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE), 6) AS rev_share
      |FROM agg
      |ORDER BY touch""".stripMargin

  // --------------------------------------------------------------- q126
  /** Bloom-filter bits for the semijoin sketch: fixed 1 Mbit ⇒ a
    * ~128 KB broadcast no matter how large the filtered dim grows. */
  val SemijoinBloomBits: Long = 1L << 20

  /** Bloom semijoin reduction — the classic distributed-join
    * optimization (and what Spark's own runtime row-level filtering
    * does when stats allow): revenue of lineitems belonging to URGENT
    * orders, computed by folding the qualifying orderkeys into a
    * FIXED-SIZE Bloom sketch ([[SemijoinBloomBits]]), prefiltering the
    * fact table map-only against it, and only then running the exact
    * semi join that removes the ~fpp false positives. No false
    * negatives ⇒ bit-identical to the plain join (the oracle replays
    * the plain join), but the exchange carries only survivors.
    *
    * Shape for 100 TB: the sketch is O(1)-sized by construction
    * (q28's argument) and built by one partial-agged pass over the
    * dim; the fact-side probe is a compiled whole-stage filter AT THE
    * SCAN (no join machinery for the ~99% of rows a selective dim
    * rejects); the residual semi join shuffles only what survived.
    * This is the join-strategy piece a 1000-executor plan wants when
    * the dim is too big to broadcast whole but its KEY SET fits a
    * sketch. */
  def q126BloomSemijoin(spark: SparkSession, sfDir: String): DataFrame = {
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    // one O(1)-row driver scalar (the q28 pattern): might_contain
    // requires a CONSTANT sketch, so it is embedded as a literal
    val bf: Array[Byte] = urgent
      .agg(call_function("graft_bloom_agg", col("o_orderkey"),
        lit(math.max(1L, SemijoinBloomBits / 8)), lit(SemijoinBloomBits)).as("bf"))
      .first().getAs[Array[Byte]](0)
    val pre = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .filter(call_function("graft_bloom_count_contains",
        lit(bf), array(col("l_orderkey"))) > 0)
    pre.join(urgent, pre("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        asD(dsum(col("l_extendedprice"))).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  val q126Sql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q127
  /** Spearman rank correlation between l_quantity and l_discount per
    * return flag — the monotone-association screen (feature vs label)
    * run before model fitting. Both variables are LOW-CARDINALITY, so
    * the whole computation runs on the joint contingency table: one
    * partial-agged groupBy(flag, qty, disc) collapses the corpus to
    * |flags|·|qty|·|disc| cells; average tie-ranks come from the value
    * MARGINALS (avg rank of value v = #less + (#eq+1)/2 — doubled to
    * stay integer), and the Pearson-on-ranks moments are
    * count-weighted sums over the cell frame in DECIMAL(38) (n·rᵪ·rᵧ
    * products overflow int64 at corpus scale; decimals keep both
    * engines exact), with one double division + sqrt at the end.
    *
    * Shape for 100 TB: the ONLY corpus-sized operation is the first
    * partial-agged groupBy; ranks never touch a per-row window (the
    * q118 concern does not even arise — the marginal frames are
    * O(distinct values)). */
  def q127Spearman(spark: SparkSession, sfDir: String): DataFrame = {
    val joint = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").as("x"), col("l_discount").as("y"))
      .agg(count(lit(1)).as("n"))
    def ranks(v: String): DataFrame = {
      val m = joint.groupBy(col("flag"), col(v)).agg(sum(col("n")).as("cnt"))
      val w = Window.partitionBy(col("flag")).orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, -1)
      // doubled average tie-rank: 2·rank(v) = 2·#less + #eq + 1
      m.withColumn("r2", lit(2) * coalesce(sum(col("cnt")).over(w), lit(0L))
          + col("cnt") + lit(1))
        .select(col("flag"), col(v), col("r2").as(s"r2$v"))
    }
    val cells = joint
      .join(ranks("x"), Seq("flag", "x"))
      .join(ranks("y"), Seq("flag", "y"))
    val dec = (c: Column) => c.cast(DecimalType(38, 0))
    val mom = cells.groupBy(col("flag"))
      .agg(sum(col("n")).as("nn"),
        sum(dec(col("n") * col("r2x"))).as("sx"),
        sum(dec(col("n") * col("r2y"))).as("sy"),
        sum(dec(col("n")) * dec(col("r2x")) * dec(col("r2x"))).as("sxx"),
        sum(dec(col("n")) * dec(col("r2y")) * dec(col("r2y"))).as("syy"),
        sum(dec(col("n")) * dec(col("r2x")) * dec(col("r2y"))).as("sxy"))
    mom.select(col("flag"), col("nn").as("n"),
        round((dec(col("nn")) * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((dec(col("nn")) * col("sxx") - col("sx") * col("sx")).cast("double")
            * (dec(col("nn")) * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("spearman_rho"))
      .orderBy(col("flag"))
  }

  val q127Sql: String =
    """WITH joint AS (
      |  SELECT l_returnflag AS flag, l_quantity AS x, l_discount AS y, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2, 3),
      |rx AS (
      |  SELECT flag, x,
      |    2 * coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS r2x
      |  FROM (SELECT flag, x, sum(n) AS cnt FROM joint GROUP BY flag, x)),
      |ry AS (
      |  SELECT flag, y,
      |    2 * coalesce(sum(cnt) OVER (PARTITION BY flag ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 AS r2y
      |  FROM (SELECT flag, y, sum(n) AS cnt FROM joint GROUP BY flag, y)),
      |cells AS (
      |  SELECT j.flag, j.n, rx.r2x, ry.r2y
      |  FROM joint j JOIN rx ON j.flag = rx.flag AND j.x = rx.x
      |               JOIN ry ON j.flag = ry.flag AND j.y = ry.y),
      |mom AS (
      |  SELECT flag, sum(n) AS nn,
      |    sum(CAST(n * r2x AS DECIMAL(38,0))) AS sx,
      |    sum(CAST(n * r2y AS DECIMAL(38,0))) AS sy,
      |    sum(CAST(n AS DECIMAL(38,0)) * CAST(r2x AS DECIMAL(38,0)) * CAST(r2x AS DECIMAL(38,0))) AS sxx,
      |    sum(CAST(n AS DECIMAL(38,0)) * CAST(r2y AS DECIMAL(38,0)) * CAST(r2y AS DECIMAL(38,0))) AS syy,
      |    sum(CAST(n AS DECIMAL(38,0)) * CAST(r2x AS DECIMAL(38,0)) * CAST(r2y AS DECIMAL(38,0))) AS sxy
      |  FROM cells GROUP BY flag)
      |SELECT flag, CAST(nn AS BIGINT) AS n,
      |  round(CAST(CAST(nn AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |    / sqrt(CAST(CAST(nn AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
      |         * CAST(CAST(nn AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
      |FROM mom
      |ORDER BY flag""".stripMargin

  // --------------------------------------------------------------- q128
  /** Spend width of the Gini rank buckets (q118's pattern). */
  val GiniBucketWidth = 10000.0

  /** Gini coefficient of customer-spend concentration per market
    * segment — the inequality/skew diagnostic (is 1% of customers 90%
    * of revenue?) that also sizes skew-mitigation choices. Formula
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over spend sorted ascending
    * with rank i — but the rank comes from q118's scale-out machinery
    * (fixed spend-range buckets → tiny cumulative-offset frame →
    * within-bucket row_number), NEVER a corpus-height window. All
    * moments are exact decimals; one double division at the end.
    *
    * Covers customers WITH orders (spend > 0 support; the zero-spend
    * tail would need the customer dim's complement — a different
    * question). */
  def q128Gini(spark: SparkSession, sfDir: String): DataFrame = {
    val spend = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(dsum(col("o_totalprice")).as("spend"))
      .withColumn("bucket",
        expr(s"cast(floor(spend / $GiniBucketWidth) as bigint)"))
    val counts = spend.groupBy(col("c_mktsegment"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val offsets = counts.withColumn("off",
      coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("c_mktsegment")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val ranked = spend
      .join(broadcast(offsets.select(col("c_mktsegment"), col("bucket"), col("off"))),
        Seq("c_mktsegment", "bucket"))
      .withColumn("rnk", col("off") + row_number().over(
        Window.partitionBy(col("c_mktsegment"), col("bucket"))
          .orderBy(col("spend"), col("o_custkey"))))
    ranked.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("sx"),
        sum(col("spend") * col("rnk").cast(DecimalType(38, 6))).as("sxr"))
      .select(col("c_mktsegment"), col("n_customers"),
        asD(col("sx")).as("total_spend"),
        round((lit(2) * col("sxr") - (col("n_customers") + 1) * col("sx"))
          .cast("double")
          / (col("n_customers") * col("sx")).cast("double"), 6).as("gini"))
      .orderBy(col("c_mktsegment"))
  }

  val q128Sql: String =
    """WITH spend AS (
      |  SELECT c_mktsegment, o_custkey,
      |    sum(CAST(o_totalprice AS DECIMAL(38,6))) AS spend
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, o_custkey),
      |ranked AS (
      |  SELECT c_mktsegment, spend,
      |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY spend, o_custkey) AS rnk
      |  FROM spend)
      |SELECT c_mktsegment, count(*) AS n_customers,
      |  round(CAST(sum(spend) AS DOUBLE), 6) AS total_spend,
      |  round(CAST(2 * sum(spend * CAST(rnk AS DECIMAL(38,6))) - (count(*) + 1) * sum(spend) AS DOUBLE)
      |      / CAST(count(*) * sum(spend) AS DOUBLE), 6) AS gini
      |FROM ranked GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------- q129
  /** Single-pass column profiler over `orders` — the data-quality
    * sweep (null ratios, cardinalities, ranges) every ingest gate runs
    * before a table enters a pipeline: one aggregation computes
    * per-column null counts, exact distinct counts, and numeric
    * min/max (timestamps as epoch-µs), then the 1×N stats row unpivots
    * to one row per column.
    *
    * Shape for 100 TB: one pass; the multi-column count(DISTINCT)
    * plans as Catalyst's expand (×|columns| rows into a partial agg) —
    * the standard exact plan; at extreme scale each count_distinct
    * swaps for q83's HLL sketch with the same shape. The unpivot is on
    * a 1-row frame. */
  def q129Profile(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    def nulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nu_$c")
    val stats = o.agg(
      count(lit(1)).as("n_rows"),
      nulls("o_orderkey"), nulls("o_custkey"), nulls("o_orderstatus"),
      nulls("o_totalprice"), nulls("o_orderdate"), nulls("o_orderpriority"),
      countDistinct(col("o_orderkey")).as("nd_o_orderkey"),
      countDistinct(col("o_custkey")).as("nd_o_custkey"),
      countDistinct(col("o_orderstatus")).as("nd_o_orderstatus"),
      countDistinct(col("o_totalprice")).as("nd_o_totalprice"),
      countDistinct(col("o_orderdate")).as("nd_o_orderdate"),
      countDistinct(col("o_orderpriority")).as("nd_o_orderpriority"),
      min(col("o_orderkey")).cast("double").as("mn_o_orderkey"),
      max(col("o_orderkey")).cast("double").as("mx_o_orderkey"),
      min(col("o_custkey")).cast("double").as("mn_o_custkey"),
      max(col("o_custkey")).cast("double").as("mx_o_custkey"),
      round(min(col("o_totalprice")), 6).as("mn_o_totalprice"),
      round(max(col("o_totalprice")), 6).as("mx_o_totalprice"),
      // o_orderdate is TIMESTAMP_NTZ on disk; under the session's UTC
      // zone the NTZ→LTZ cast is value-preserving (Tables.events doc)
      unix_micros(min(col("o_orderdate")).cast("timestamp")).cast("double")
        .as("mn_o_orderdate"),
      unix_micros(max(col("o_orderdate")).cast("timestamp")).cast("double")
        .as("mx_o_orderdate"))
    stats.selectExpr("n_rows",
      """stack(6,
        |  'o_orderkey',      nu_o_orderkey,      nd_o_orderkey,      mn_o_orderkey,      mx_o_orderkey,
        |  'o_custkey',       nu_o_custkey,       nd_o_custkey,       mn_o_custkey,       mx_o_custkey,
        |  'o_orderstatus',   nu_o_orderstatus,   nd_o_orderstatus,   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |  'o_totalprice',    nu_o_totalprice,    nd_o_totalprice,    mn_o_totalprice,    mx_o_totalprice,
        |  'o_orderdate',     nu_o_orderdate,     nd_o_orderdate,     mn_o_orderdate,     mx_o_orderdate,
        |  'o_orderpriority', nu_o_orderpriority, nd_o_orderpriority, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |) AS (column_name, n_nulls, n_distinct, min_num, max_num)""".stripMargin)
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_num"), col("max_num"))
      .orderBy(col("column_name"))
  }

  val q129Sql: String =
    """WITH s AS (
      |  SELECT count(*) AS n_rows,
      |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS nu1,
      |    sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS nu2,
      |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS nu3,
      |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS nu4,
      |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nu5,
      |    sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS nu6,
      |    count(DISTINCT o_orderkey) AS nd1, count(DISTINCT o_custkey) AS nd2,
      |    count(DISTINCT o_orderstatus) AS nd3, count(DISTINCT o_totalprice) AS nd4,
      |    count(DISTINCT o_orderdate) AS nd5, count(DISTINCT o_orderpriority) AS nd6,
      |    CAST(min(o_orderkey) AS DOUBLE) AS mn1, CAST(max(o_orderkey) AS DOUBLE) AS mx1,
      |    CAST(min(o_custkey) AS DOUBLE) AS mn2, CAST(max(o_custkey) AS DOUBLE) AS mx2,
      |    round(min(o_totalprice), 6) AS mn4, round(max(o_totalprice), 6) AS mx4,
      |    CAST(epoch_us(min(o_orderdate)) AS DOUBLE) AS mn5,
      |    CAST(epoch_us(max(o_orderdate)) AS DOUBLE) AS mx5
      |  FROM orders)
      |SELECT 'o_orderkey' AS column_name, n_rows, CAST(nu1 AS BIGINT) AS n_nulls,
      |  nd1 AS n_distinct, mn1 AS min_num, mx1 AS max_num FROM s
      |UNION ALL SELECT 'o_custkey', n_rows, CAST(nu2 AS BIGINT), nd2, mn2, mx2 FROM s
      |UNION ALL SELECT 'o_orderstatus', n_rows, CAST(nu3 AS BIGINT), nd3, NULL, NULL FROM s
      |UNION ALL SELECT 'o_totalprice', n_rows, CAST(nu4 AS BIGINT), nd4, mn4, mx4 FROM s
      |UNION ALL SELECT 'o_orderdate', n_rows, CAST(nu5 AS BIGINT), nd5, mn5, mx5 FROM s
      |UNION ALL SELECT 'o_orderpriority', n_rows, CAST(nu6 AS BIGINT), nd6, NULL, NULL FROM s
      |ORDER BY column_name""".stripMargin

  // --------------------------------------------------------------- q132
  /** Streaming exact dedup as a DRIVER row — the at-least-once
    * delivery collapse every event pipeline runs first: the event file
    * streams through the REAL engine's `dropDuplicates` on the
    * (user_id, event_type, event-time hour) key under a 2 h
    * watermark, survivors append to a file sink, and the read-back
    * aggregates per type. `dropDuplicates` EMITS rows immediately
    * (state discards late duplicates; no output suppression), so —
    * unlike q98/q111 — no watermark-cutoff arithmetic appears in the
    * oracle: the emitted set is exactly the batch DISTINCT, which is
    * what the oracle states. q98 gated stateless windows, q111 the
    * session-merge state, this gates the dedup state store.
    *
    * Shape for 100 TB: dedup state is bounded by the watermark
    * horizon (keys older than the event-time watermark are evicted);
    * the sink carries unique keys only. */
  def q132StreamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = Tables.eventsRaw(spark, sfDir)
    val tsEventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q132_")
    val outDir = tmp.resolve("out").toString
    val cpDir = tmp.resolve("cp").toString
    val deduped = spark.readStream.schema(raw.schema)
      .parquet(s"$sfDir/[e]vents.parquet")
      .select(date_trunc("hour", tsEventTime).as("hour"),
        col("user_id"), col("event_type"))
      .withWatermark("hour", "2 hours")
      .dropDuplicates("user_id", "event_type", "hour")
    deduped.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val res = spark.read.parquet(outDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q132Sql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour
      |  FROM events)
      |SELECT event_type, count(*) AS n_unique, count(DISTINCT user_id) AS n_users
      |FROM d GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q133
  /** Calendar day (2024-01) splitting base from delta — the last ~6
    * days of the fixture arrive as the "new partition". */
  val IncrSplitDay = 24

  /** Incremental aggregate maintenance — the materialized-view update
    * path: yesterday's aggregate state (events BEFORE day
    * [[IncrSplitDay]]) merges with the fresh partition's partial
    * aggregate via pure ALGEBRAIC combination (counts add, decimal
    * sums add, min/min, max/max; the mean derives after the merge) —
    * the full-recompute oracle proves merge ≡ recompute. At 100 TB
    * this is the difference between re-reading the corpus daily and
    * reading one day: the exchange carries |types| merged rows, and
    * each side's partial agg is map-side combined. */
  def q133IncrAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        expr("ts div 86400000000000").as("day"))
    def part(p: Column => Column): DataFrame =
      ev.filter(p(col("day")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"),
          min(col("value")).as("mn"), max(col("value")).as("mx"))
    val cut = lit(19723 + IncrSplitDay) // epoch day of 2024-01-01 + split offset
    part(_ < cut).unionByName(part(_ >= cut))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("sv")).as("sv"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .select(col("event_type"), col("n_events"),
        asD(col("sv")).as("total_value"),
        round(col("mn"), 6).as("min_value"), round(col("mx"), 6).as("max_value"),
        round(col("sv").cast("double") / col("n_events"), 6).as("avg_value"))
      .orderBy(col("event_type"))
  }

  val q133Sql: String =
    """SELECT event_type, count(*) AS n_events,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value,
      |  round(min(value), 6) AS min_value, round(max(value), 6) AS max_value,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6) AS avg_value
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q134
  val CcfMaxLag = 5

  /** Lead–lag cross-correlation between the daily 'click' and
    * 'purchase' series (does activity in one channel PREDICT the
    * other, and at what offset?) — q103's autocorrelation machinery
    * generalized to two series: both series zero-fill onto the common
    * day grid, center via the integer n·x−S trick (no float sums), and
    * ccf(lag) = Σ cₐ[t]·c_b[t+lag] / √(Σcₐ²·Σc_b²) with every sum exact
    * int64 and ONE double division at the end. Negative lags = clicks
    * trailing purchases.
    *
    * Shape for 100 TB: corpus work is one partial-agged
    * groupBy(day, type); everything after lives on O(days) frames. */
  def q134CrossCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("ts div 86400000000000").as("day"), col("event_type"))
    val grid = ev.select(col("day")).distinct()
    def series(t: String): DataFrame = {
      val cnt = ev.filter(col("event_type") === t)
        .groupBy(col("day")).agg(count(lit(1)).as("x"))
      val filled = grid.join(cnt, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      val tot = filled.agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      filled.crossJoin(broadcast(tot))
        .select(col("day"), (col("n") * col("x") - col("s")).as("c"))
    }
    val a = series("click").select(col("day"), col("c").as("ca"))
    val b = series("purchase").select(col("day").as("dayb"), col("c").as("cb"))
    val den = a.agg(sum(col("ca") * col("ca")).as("saa"))
      .crossJoin(b.agg(sum(col("cb") * col("cb")).as("sbb")))
    val pairs = a.join(b,
        col("dayb") >= col("day") - CcfMaxLag &&
          col("dayb") <= col("day") + CcfMaxLag)
      .select((col("dayb") - col("day")).as("lag"),
        (col("ca") * col("cb")).as("p"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("p")).as("num"))
    pairs.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        round(col("num").cast("double")
          / sqrt(col("saa").cast("double") * col("sbb").cast("double")), 6)
          .as("ccf"))
      .orderBy(col("lag"))
  }

  val q134Sql: String =
    s"""WITH ev AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day, event_type
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |grid AS (SELECT DISTINCT day FROM ev),
      |sa AS (
      |  SELECT g.day, coalesce(c.x, 0) AS x FROM grid g LEFT JOIN
      |    (SELECT day, count(*) AS x FROM ev WHERE event_type = 'click' GROUP BY day) c
      |    ON g.day = c.day),
      |sb AS (
      |  SELECT g.day, coalesce(c.x, 0) AS x FROM grid g LEFT JOIN
      |    (SELECT day, count(*) AS x FROM ev WHERE event_type = 'purchase' GROUP BY day) c
      |    ON g.day = c.day),
      |ta AS (SELECT sum(x) AS s, count(*) AS n FROM sa),
      |tb AS (SELECT sum(x) AS s, count(*) AS n FROM sb),
      |ca AS (SELECT day, (ta.n * x - ta.s) AS c FROM sa CROSS JOIN ta),
      |cb AS (SELECT day, (tb.n * x - tb.s) AS c FROM sb CROSS JOIN tb),
      |den AS (
      |  SELECT (SELECT sum(c * c) FROM ca) AS saa, (SELECT sum(c * c) FROM cb) AS sbb),
      |pairs AS (
      |  SELECT b.day - a.day AS lag, count(*) AS n_pairs, sum(a.c * b.c) AS num
      |  FROM ca a JOIN cb b ON b.day >= a.day - $CcfMaxLag AND b.day <= a.day + $CcfMaxLag
      |  GROUP BY 1)
      |SELECT lag, n_pairs,
      |  round(CAST(num AS DOUBLE) / sqrt(CAST(den.saa AS DOUBLE) * CAST(den.sbb AS DOUBLE)), 6) AS ccf
      |FROM pairs CROSS JOIN den
      |ORDER BY lag""".stripMargin

  // --------------------------------------------------------------- q137
  /** Burst window: a full trailing day of hourly history. */
  val BurstBaselineHours = 24
  /** Burst threshold: rate ≥ 3× the trailing-day mean, and ≥ 5
    * absolute (a 0→2 blip on an empty baseline is not a burst). */
  val BurstFactor = 3
  val BurstMinCount = 5L
  /** The injected incident: every event inside this 3-hour span
    * (2024-01-16 06:00–09:00 UTC, epoch-hours) is replicated
    * [[BurstAmp]]× — the synthetic stream is deliberately uniform, so
    * the fixture overlays a deterministic surge the same way the dedup
    * corpus overlays deterministic twins; the detector must light up
    * exactly there and nowhere else, at every SF (amplification is
    * relative, so the contrast survives any scale-up). */
  val BurstHourStart = 473718L
  val BurstHourEnd = 473720L
  val BurstAmp = 6

  /** Burst-episode detection per event type — the incident/trend
    * detector next to q63's z-score point anomalies: the hourly series
    * ZERO-FILLS onto the full hour grid (a silent hour is a 0, not a
    * missing row — else the trailing baseline silently shortens), an
    * hour bursts when its count is ≥ [[BurstFactor]]× the mean of the
    * preceding [[BurstBaselineHours]] hours (integer
    * cross-multiplication — cnt·24 ≥ 3·Σ₂₄ — no float baseline, full
    * history required), CONSECUTIVE bursting hours merge into episodes
    * (gaps-and-islands), and each episode reports span, peak, volume.
    *
    * Shape for 100 TB: corpus work is one partial-agged
    * groupBy(type, hour) over the amplified stream (the overlay is a
    * map-side constant-factor explode of a 3-hour slice); the grid,
    * rolling window, flags, and islands live on the O(types × hours)
    * hourly frame, partitioned by type. */
  def q137Bursts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
    val surge = ev
      .filter(col("hour").between(BurstHourStart, BurstHourEnd))
      .select(col("event_type"), col("hour"),
        explode(sequence(lit(1), lit(BurstAmp - 1))).as("copy"))
      .drop("copy")
    val amped = ev.unionByName(surge)
    val hourly = amped.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("cnt"))
    val span = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = Tables.events(spark, sfDir).select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"))).as("hour"))
    val series = grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val byTypeHour = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val trail = byTypeHour.rowsBetween(-BurstBaselineHours, -1)
    val flagged = series
      .withColumn("base_sum", sum(col("cnt")).over(trail))
      .withColumn("base_n", count(lit(1)).over(trail))
      .withColumn("burst",
        col("base_n") === BurstBaselineHours &&
          col("cnt") * BurstBaselineHours >= lit(BurstFactor) * col("base_sum") &&
          col("cnt") >= BurstMinCount)
    val islands = flagged.filter(col("burst"))
      .withColumn("prev_hour", lag(col("hour"), 1).over(byTypeHour))
      .withColumn("brk",
        when(col("prev_hour").isNull || col("hour") - col("prev_hour") > 1, 1)
          .otherwise(0))
      .withColumn("episode", sum(col("brk")).over(byTypeHour))
    islands.groupBy(col("event_type"), col("episode"))
      .agg(min(col("hour")).as("start_hour"), max(col("hour")).as("end_hour"),
        count(lit(1)).as("n_hours"), max(col("cnt")).as("peak"),
        sum(col("cnt")).as("volume"))
      .orderBy(col("event_type"), col("episode"))
  }

  val q137Sql: String =
    s"""WITH ev AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour
      |  FROM events),
      |amped AS (
      |  SELECT event_type, hour FROM ev
      |  UNION ALL
      |  SELECT event_type, hour FROM ev, generate_series(1, ${BurstAmp - 1})
      |  WHERE hour BETWEEN $BurstHourStart AND $BurstHourEnd),
      |hourly AS (SELECT event_type, hour, count(*) AS cnt FROM amped GROUP BY 1, 2),
      |span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
      |grid AS (
      |  SELECT t.event_type, g.hour
      |  FROM (SELECT DISTINCT event_type FROM ev) t,
      |    (SELECT unnest(generate_series(h0, h1)) AS hour FROM span) g),
      |series AS (
      |  SELECT grid.event_type, grid.hour, coalesce(hourly.cnt, 0) AS cnt
      |  FROM grid LEFT JOIN hourly
      |    ON grid.event_type = hourly.event_type AND grid.hour = hourly.hour),
      |flagged AS (
      |  SELECT event_type, hour, cnt,
      |    sum(cnt) OVER w AS base_sum, count(*) OVER w AS base_n
      |  FROM series
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |    ROWS BETWEEN $BurstBaselineHours PRECEDING AND 1 PRECEDING)),
      |bursting AS (
      |  SELECT event_type, hour, cnt FROM flagged
      |  WHERE base_n = $BurstBaselineHours
      |    AND cnt * $BurstBaselineHours >= $BurstFactor * base_sum
      |    AND cnt >= $BurstMinCount),
      |islands AS (
      |  SELECT event_type, hour, cnt,
      |    CAST(sum(CASE WHEN prev_hour IS NULL OR hour - prev_hour > 1 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS episode
      |  FROM (SELECT event_type, hour, cnt,
      |          lag(hour) OVER (PARTITION BY event_type ORDER BY hour) AS prev_hour
      |        FROM bursting))
      |SELECT event_type, episode, min(hour) AS start_hour, max(hour) AS end_hour,
      |  count(*) AS n_hours, max(cnt) AS peak, CAST(sum(cnt) AS BIGINT) AS volume
      |FROM islands GROUP BY event_type, episode
      |ORDER BY event_type, episode""".stripMargin

  // --------------------------------------------------------------- q140
  /** Number of independent AMS tug-of-war estimators. */
  val AmsM = 64

  /** Self-join size (second frequency moment F₂) estimation by the
    * AMS tug-of-war sketch — the query-optimizer diagnostic that
    * prices a join BEFORE running it: each of [[AmsM]] estimators keeps
    * one running signed sum Sⱼ = Σ_rows sign_j(key) (±1 signs from the
    * j-th universal hash of the portable key hash), and Sⱼ² is an
    * unbiased estimate of F₂ = Σ_k f(k)² = |R ⋈ R| on the join key.
    * The output carries every estimator (j, s_j, est_j), the mean
    * estimate, the EXACT F₂, and the relative error — the sketch is
    * deterministic (pure hash signs), so DuckDB replays it bit-for-bit.
    *
    * Shape for 100 TB: sketch state is O(M) longs per partition (the
    * explode is map-side, partial-agged per j before the exchange — the
    * shuffle carries M×partitions rows); the exact F₂ (gate-only, the
    * thing the sketch replaces at scale) is one count-then-sum
    * aggregation. */
  def q140JoinSize(spark: SparkSession, sfDir: String): DataFrame = {
    val p = MF.HashP
    val keyed = Tables.lineitem(spark, sfDir)
      .select(MF.hash32(col("l_partkey").cast("string")).as("h"))
    val signs = keyed
      .select(col("h"), explode(sequence(lit(1), lit(AmsM))).as("j"))
      .withColumn("uh", pmod((lit(1103515245L) + lit(12345L) * col("j")) * col("h")
        + pmod(lit(1013904223L) + lit(2654435761L) * col("j"), lit(p)), lit(p)))
      .withColumn("sign", lit(1L) - lit(2L) * pmod(col("uh"), lit(2)))
    val sj = signs.groupBy(col("j")).agg(sum(col("sign")).as("s_j"))
      .withColumn("est_j", col("s_j") * col("s_j"))
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("f2_exact"))
    val meanEst = sj.agg(sum(col("est_j")).as("est_sum"))
    sj.crossJoin(broadcast(exact)).crossJoin(broadcast(meanEst))
      .select(col("j"), col("s_j"), col("est_j"), col("f2_exact"),
        round(col("est_sum").cast("double") / AmsM, 6).as("mean_est"),
        round(abs(col("est_sum").cast("double") / AmsM - col("f2_exact"))
          / col("f2_exact"), 6).as("rel_err"))
      .orderBy(col("j"))
  }

  val q140Sql: String = {
    val p = MF.HashP
    val a0 = 1103515245L
    val b0 = 1013904223L
    s"""WITH keyed AS (
      |  SELECT ${graft.oracle.Sql.hash32OfHex("md5(CAST(l_partkey AS VARCHAR))")} AS h
      |  FROM lineitem),
      |signs AS (
      |  SELECT j, (1 - 2 * ((((($a0 + 12345 * j) * h
      |    + (($b0 + 2654435761 * j) % $p)) % $p) % 2))) AS sign
      |  FROM keyed, generate_series(1, $AmsM) AS t(j)),
      |sj AS (
      |  SELECT j, CAST(sum(sign) AS BIGINT) AS s_j FROM signs GROUP BY j),
      |exact AS (
      |  SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM
      |    (SELECT count(*) AS f FROM lineitem GROUP BY l_partkey)),
      |msum AS (SELECT sum(s_j * s_j) AS est_sum FROM sj)
      |SELECT j, s_j, s_j * s_j AS est_j, f2_exact,
      |  round(CAST(est_sum AS DOUBLE) / $AmsM, 6) AS mean_est,
      |  round(abs(CAST(est_sum AS DOUBLE) / $AmsM - f2_exact) / f2_exact, 6) AS rel_err
      |FROM sj CROSS JOIN exact CROSS JOIN msum
      |ORDER BY j""".stripMargin
  }

  // --------------------------------------------------------------- q142
  /** Stream-stream interval join as a DRIVER row — the fourth and last
    * stateful-operator family under the oracle gate (q98 windows, q111
    * session state, q132 dedup state, this one JOIN state): every
    * error event joins the same user's clicks from the preceding 10
    * minutes through the REAL streaming engine
    * ([[graft.streaming.StreamingWindows.recentClickJoin]] — both
    * sides watermarked so click state evicts at the horizon), sink to
    * files, read back, aggregated per user. An INNER join emits each
    * match the moment both sides are present — in the availableNow
    * single-batch drain nothing is watermark-suppressed, so the oracle
    * is the plain batch interval join with no cutoff arithmetic. */
  def q142StreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = Tables.eventsRaw(spark, sfDir)
    def ts(c: Column): Column =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else c.cast("timestamp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q142_")
    val outDir = tmp.resolve("out").toString
    val cpDir = tmp.resolve("cp").toString
    def src(): DataFrame =
      spark.readStream.schema(raw.schema).parquet(s"$sfDir/[e]vents.parquet")
    val errors = src().filter(col("event_type") === "error")
      .select(col("user_id"), ts(col("ts")).as("ets"), col("event_id").as("eid"))
    val clicks = src().filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), ts(col("ts")).as("cts"),
        col("event_id").as("cid"))
    graft.streaming.StreamingWindows.recentClickJoin(errors, clicks)
      .select(col("user_id"), col("eid"), col("cid"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val res = spark.read.parquet(outDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("eid")).as("n_errors_with_click"))
      .orderBy(col("user_id"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q142Sql: String =
    """WITH er AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ets, event_id AS eid
      |  FROM events WHERE event_type = 'error'),
      |cl AS (
      |  SELECT user_id AS c_user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS cid
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT er.user_id, eid, cid
      |  FROM er JOIN cl ON user_id = c_user_id
      |    AND cts BETWEEN ets - INTERVAL 10 MINUTE AND ets)
      |SELECT user_id, count(*) AS n_pairs,
      |  count(DISTINCT eid) AS n_errors_with_click
      |FROM j GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------- q143
  /** Insert-row id offset — above the dedup corpus offsets (1e9–3e9),
    * same single-owner rationale (DedupQueries doc). */
  val MergeInsertOffset = 4000000000L

  /** CDC merge/upsert — MERGE INTO semantics (the lakehouse apply-
    * changes op Spark SQL itself lacks without a table format): a
    * deterministic change feed (updates for doc_id%9=0, deletes for
    * %21=0, inserts at +[[MergeInsertOffset]] for %13=0) applies onto
    * the documents snapshot by latest-version-wins per key, delete
    * rows tombstoning the key. Emits the merged snapshot with an
    * audit `op` column.
    *
    * Shape for 100 TB: ONE hash shuffle on the key; the latest-wins
    * row_number and the tombstone filter ride that partition — the
    * standard shuffle-merge plan every table format (Delta/Iceberg/
    * Hudi) executes under MERGE. The feed is usually ≪ base, so AQE
    * can also broadcast it; semantics are identical. */
  def q143MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val base = d.select(col("doc_id"), lit(0L).as("version"), lit("B").as("op"),
      col("text"))
    val updates = d.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select(col("doc_id"), lit(1L).as("version"), lit("U").as("op"),
        concat(col("text"), lit(" [rev2]")).as("text"))
    val deletes = d.filter(pmod(col("doc_id"), lit(21)) === 0)
      .select(col("doc_id"), lit(2L).as("version"), lit("D").as("op"),
        lit(null).cast("string").as("text"))
    val inserts = d.filter(pmod(col("doc_id"), lit(13)) === 0)
      .select((col("doc_id") + MergeInsertOffset).as("doc_id"),
        lit(1L).as("version"), lit("I").as("op"),
        concat(lit("new "), col("text")).as("text"))
    val all = base.unionByName(updates).unionByName(deletes).unionByName(inserts)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("version").desc, col("op"))
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("doc_id"), col("version"), col("op"),
        length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))
  }

  val q143Sql: String =
    s"""WITH base AS (
      |  SELECT doc_id, 0 AS version, 'B' AS op, text FROM documents),
      |feed AS (
      |  SELECT doc_id, 1 AS version, 'U' AS op, text || ' [rev2]' AS text
      |  FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'D', NULL FROM documents WHERE doc_id % 21 = 0
      |  UNION ALL
      |  SELECT doc_id + $MergeInsertOffset, 1, 'I', 'new ' || text
      |  FROM documents WHERE doc_id % 13 = 0),
      |merged AS (
      |  SELECT doc_id, version, op, text,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC, op) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM feed))
      |SELECT doc_id, CAST(version AS BIGINT) AS version, op,
      |  length(text) AS n_chars
      |FROM merged WHERE rn = 1 AND op <> 'D'
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q146
  /** Step-to-step conversion window (µs): 48 h. */
  val FunnelWindowUs = 48L * 3600L * 1000000L

  /** Time-boxed funnel (ClickHouse's windowFunnel semantics beside
    * q53's unbounded chain): view → click → purchase where each step
    * must land within [[FunnelWindowUs]] of the PREVIOUS step —
    * first-touch greedy (the earliest qualifying event per step, q53's
    * convention), so a user who converts slowly counts at the stage
    * where the clock ran out. Emits per-stage user counts, conversion
    * vs previous stage, and the exact average step latency (integer µs
    * sums, one division).
    *
    * Shape for 100 TB: three partial-agged min-aggregations keyed on
    * user (each joined back broadcast-or-hash) — no per-user event
    * arrays, no window over the event stream. */
  def q146WindowFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_us") > col("v_ts") &&
        col("ts_us") <= col("v_ts") + FunnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("c_ts"),
        min(col("v_ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_us") > col("c_ts") &&
        col("ts_us") <= col("c_ts") + FunnelWindowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_ts"),
        min(col("c_ts")).as("c_ts"))
    val all = ev.agg(countDistinct(col("user_id")).as("n"))
      .select(lit(0).as("stage"), lit("all_users").as("step"), col("n"),
        lit(null).cast("double").as("avg_step_latency_s"))
    val sv = v.agg(count(lit(1)).as("n"))
      .select(lit(1).as("stage"), lit("view").as("step"), col("n"),
        lit(null).cast("double").as("avg_step_latency_s"))
    val sc = c.agg(count(lit(1)).as("n"),
        sum(col("c_ts") - col("v_ts")).as("lat"))
      .select(lit(2).as("stage"), lit("click").as("step"), col("n"),
        round(col("lat").cast("double") / col("n") / 1000000.0, 6)
          .as("avg_step_latency_s"))
    val sp = p.agg(count(lit(1)).as("n"),
        sum(col("p_ts") - col("c_ts")).as("lat"))
      .select(lit(3).as("stage"), lit("purchase").as("step"), col("n"),
        round(col("lat").cast("double") / col("n") / 1000000.0, 6)
          .as("avg_step_latency_s"))
    val s = all.unionByName(sv).unionByName(sc).unionByName(sp)
    s.withColumn("conversion",
        coalesce(round(col("n").cast("double")
          / lag(col("n"), 1).over(Window.orderBy(col("stage"))), 6), lit(1.0)))
      .select(col("stage"), col("step"), col("n").as("n_users"),
        col("conversion"), col("avg_step_latency_s"))
      .orderBy(col("stage"))
  }

  val q146Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |v AS (SELECT user_id, min(ts_us) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_us) AS c_ts, min(v_ts) AS v_ts
      |      FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE event_type = 'click' AND ts_us > v_ts
      |        AND ts_us <= v_ts + $FunnelWindowUs
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_us) AS p_ts, min(c_ts) AS c_ts
      |      FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND ts_us > c_ts
      |        AND ts_us <= c_ts + $FunnelWindowUs
      |      GROUP BY e.user_id),
      |s AS (
      |  SELECT 0 AS stage, 'all_users' AS step, count(DISTINCT user_id) AS n,
      |    CAST(NULL AS DOUBLE) AS lat FROM ev
      |  UNION ALL SELECT 1, 'view', count(*), NULL FROM v
      |  UNION ALL SELECT 2, 'click', count(*),
      |    round(CAST(sum(c_ts - v_ts) AS DOUBLE) / count(*) / 1000000.0, 6) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*),
      |    round(CAST(sum(p_ts - c_ts) AS DOUBLE) / count(*) / 1000000.0, 6) FROM p)
      |SELECT stage, step, n AS n_users,
      |  coalesce(round(CAST(n AS DOUBLE)
      |    / CAST(lag(n) OVER (ORDER BY stage) AS DOUBLE), 6), 1.0) AS conversion,
      |  lat AS avg_step_latency_s
      |FROM s ORDER BY stage""".stripMargin

  // --------------------------------------------------------------- q147
  /** Rolling-feature lookback (days). */
  val LagFeatDays = 7

  /** Per-user daily lag features — the feature-engineering pass a
    * daily model trains on: for every user-day with activity, the
    * previous day's count, the trailing-[[LagFeatDays]]-day sum, and
    * days since the previous active day. Features compute on the
    * ZERO-FILLED user×day grid (a silent day is a 0, not a missing
    * row — else lag(1) reads the wrong day), but only observed
    * (active) rows emit.
    *
    * Shape for 100 TB: corpus → one partial-agged groupBy(user, day);
    * the grid is users × span (the natural feature-matrix size), all
    * windows partition by user over O(span) rows. */
  def q147LagFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("cnt"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("user_id")).distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val feat = filled
      .withColumn("prev_1d", coalesce(lag(col("cnt"), 1).over(byUser), lit(0L)))
      .withColumn("prev_7d", coalesce(sum(col("cnt")).over(
        byUser.rowsBetween(-LagFeatDays, -1)), lit(0L)))
      .withColumn("prev_active_day",
        last(when(col("cnt") > 0, col("day")), ignoreNulls = true)
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("days_since_prev",
        coalesce(col("day") - col("prev_active_day"), lit(-1L)))
    feat.filter(col("cnt") > 0)
      .select(col("user_id"), col("day"), col("cnt").as("n_events"),
        col("prev_1d"), col("prev_7d"), col("days_since_prev"))
      .orderBy(col("user_id"), col("day"))
  }

  val q147Sql: String =
    s"""WITH daily AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |grid AS (
      |  SELECT u.user_id, g.day
      |  FROM (SELECT DISTINCT user_id FROM daily) u,
      |    (SELECT unnest(generate_series(d0, d1)) AS day FROM span) g),
      |filled AS (
      |  SELECT grid.user_id, grid.day, coalesce(daily.cnt, 0) AS cnt
      |  FROM grid LEFT JOIN daily
      |    ON grid.user_id = daily.user_id AND grid.day = daily.day),
      |feat AS (
      |  SELECT user_id, day, cnt,
      |    coalesce(lag(cnt) OVER w, 0) AS prev_1d,
      |    coalesce(sum(cnt) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN $LagFeatDays PRECEDING AND 1 PRECEDING), 0) AS prev_7d,
      |    last_value(CASE WHEN cnt > 0 THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_active_day
      |  FROM filled WINDOW w AS (PARTITION BY user_id ORDER BY day))
      |SELECT user_id, day, cnt AS n_events,
      |  CAST(prev_1d AS BIGINT) AS prev_1d, CAST(prev_7d AS BIGINT) AS prev_7d,
      |  coalesce(day - prev_active_day, -1) AS days_since_prev
      |FROM feat WHERE cnt > 0
      |ORDER BY user_id, day""".stripMargin

  // --------------------------------------------------------------- q148
  /** Item-item co-engagement similarity — the bipartite-projection /
    * collaborative-filtering primitive ("users who did X also did Y"):
    * the user×event-type bipartite graph projects onto item pairs via
    * a self-join on user over DISTINCT (user, item) rows; cosine =
    * co/√(nₐ·n_b) and Jaccard = co/(nₐ+n_b−co) from exact integer
    * counts, one double op each at the end.
    *
    * Shape for 100 TB: the distinct pass is one partial-agged
    * shuffle on user; the projection joins within user partitions
    * (per-user item fan-out is bounded by the catalog, not the event
    * count — the recsys-standard plan); item marginals are a tiny
    * broadcast frame. */
  def q148ItemSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    val ui = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct()
    val marg = ui.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val co = ui.select(col("user_id"), col("event_type").as("ia"))
      .join(ui.select(col("user_id"), col("event_type").as("ib")), "user_id")
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("co"))
    co.join(broadcast(marg.select(col("event_type").as("ia"), col("n").as("na"))), "ia")
      .join(broadcast(marg.select(col("event_type").as("ib"), col("n").as("nb"))), "ib")
      .select(col("ia"), col("ib"), col("co"), col("na"), col("nb"),
        round(col("co").cast("double")
          / sqrt(col("na").cast("double") * col("nb")), 6).as("cosine"),
        round(col("co").cast("double") / (col("na") + col("nb") - col("co")), 6)
          .as("jaccard"))
      .orderBy(col("ia"), col("ib"))
  }

  val q148Sql: String =
    """WITH ui AS (SELECT DISTINCT user_id, event_type FROM events),
      |marg AS (SELECT event_type, count(*) AS n FROM ui GROUP BY event_type),
      |co AS (
      |  SELECT a.event_type AS ia, b.event_type AS ib, count(*) AS co
      |  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT ia, ib, co, na.n AS na, nb.n AS nb,
      |  round(CAST(co AS DOUBLE) / sqrt(CAST(na.n AS DOUBLE) * nb.n), 6) AS cosine,
      |  round(CAST(co AS DOUBLE) / (na.n + nb.n - co), 6) AS jaccard
      |FROM co JOIN marg na ON ia = na.event_type JOIN marg nb ON ib = nb.event_type
      |ORDER BY ia, ib""".stripMargin

  // --------------------------------------------------------------- q150
  /** Snapshot diff / reconciliation — the audit that runs AFTER q143's
    * merge (did the apply do exactly what the feed said?): a full
    * outer join of the base snapshot against the merged snapshot on
    * the key classifies every row as added / deleted / changed /
    * unchanged, and the per-class summary carries row counts plus an
    * order-independent Σkey checksum on each side — the table-diff
    * every CDC pipeline closes its loop with.
    *
    * Shape for 100 TB: ONE full-outer hash join on the key (both
    * sides partition the same way) into a partial-agged 4-row
    * summary — the standard reconciliation plan. */
  def q150TableDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("bid"), length(col("text")).as("blen"))
    val merged = q143MergeUpsert(spark, sfDir)
      .select(col("doc_id").as("mid"), col("n_chars").as("mlen"))
    base.join(merged, col("bid") === col("mid"), "full_outer")
      .select(
        when(col("bid").isNull, lit("added"))
          .when(col("mid").isNull, lit("deleted"))
          .when(col("blen") =!= col("mlen"), lit("changed"))
          .otherwise(lit("unchanged")).as("change_class"),
        coalesce(col("bid"), lit(0L)).as("bk"),
        coalesce(col("mid"), lit(0L)).as("mk"))
      .groupBy(col("change_class"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("bk")).as("base_key_sum"), sum(col("mk")).as("merged_key_sum"))
      .orderBy(col("change_class"))
  }

  val q150Sql: String =
    s"""WITH base AS (SELECT doc_id AS bid, length(text) AS blen FROM documents),
      |feed AS (
      |  SELECT doc_id, 1 AS version, 'U' AS op, text || ' [rev2]' AS text
      |  FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT doc_id, 2, 'D', NULL FROM documents WHERE doc_id % 21 = 0
      |  UNION ALL
      |  SELECT doc_id + $MergeInsertOffset, 1, 'I', 'new ' || text
      |  FROM documents WHERE doc_id % 13 = 0),
      |merged0 AS (
      |  SELECT doc_id, op, text,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC, op) AS rn
      |  FROM (SELECT doc_id, 0 AS version, 'B' AS op, text FROM documents
      |        UNION ALL SELECT * FROM feed)),
      |merged AS (
      |  SELECT doc_id AS mid, length(text) AS mlen FROM merged0
      |  WHERE rn = 1 AND op <> 'D'),
      |classified AS (
      |  SELECT (CASE WHEN bid IS NULL THEN 'added'
      |               WHEN mid IS NULL THEN 'deleted'
      |               WHEN blen <> mlen THEN 'changed'
      |               ELSE 'unchanged' END) AS change_class,
      |    coalesce(bid, 0) AS bk, coalesce(mid, 0) AS mk
      |  FROM base FULL OUTER JOIN merged ON bid = mid)
      |SELECT change_class, count(*) AS n_rows,
      |  CAST(sum(bk) AS BIGINT) AS base_key_sum,
      |  CAST(sum(mk) AS BIGINT) AS merged_key_sum
      |FROM classified GROUP BY change_class
      |ORDER BY change_class""".stripMargin

  // --------------------------------------------------------------- q155
  /** Two-proportion A/B significance test — the experimentation
    * primitive that closes the loop on every split/mixture operator:
    * users hash into arms A/B (q47's no-RNG determinism), the metric
    * is LAST-DAY purchase conversion (≥1 purchase on the fixture's
    * final calendar day — the raw any-purchase flag saturates at 100%
    * on this event volume, and a saturated metric has zero variance
    * to test), and the two-sided
    * two-proportion z-test scores the difference with the pooled
    * standard error. The synthetic assignment is independent of
    * behavior, so the expected verdict is NOT significant — a
    * detector that fires here is broken (the spec asserts it).
    *
    * Shape for 100 TB: one partial-agged pass to per-user conversion
    * flags (the exchange carries users, not events), then a 2-row
    * aggregate; z is a handful of IEEE double ops off exact integer
    * counts — deterministic across engines. */
  /** Last fixture day (2024-01-30) as an epoch day — the conversion
    * window. */
  val AbLastDay = 19752L

  def q155AbTest(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === AbLastDay, 1L).otherwise(0L))
        .as("converted"))
      .withColumn("arm",
        when(pmod(MF.hash32(concat(lit("ab:"), col("user_id").cast("string"))),
          lit(2)) === 0, "A").otherwise("B"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("na"), col("x").as("xa"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("nb"), col("x").as("xb"))
    a.crossJoin(b)
      .withColumn("pa", col("xa").cast("double") / col("na"))
      .withColumn("pb", col("xb").cast("double") / col("nb"))
      .withColumn("pp", (col("xa") + col("xb")).cast("double")
        / (col("na") + col("nb")))
      .withColumn("z",
        (col("pa") - col("pb")) / sqrt(col("pp") * (lit(1.0) - col("pp"))
          * (lit(1.0) / col("na") + lit(1.0) / col("nb"))))
      .select(col("na"), col("nb"), col("xa"), col("xb"),
        round(col("pa"), 6).as("pa"), round(col("pb"), 6).as("pb"),
        round(col("z"), 6).as("z"),
        (abs(col("z")) > 1.959964).as("significant"))
  }

  val q155Sql: String = {
    val h = graft.oracle.Sql.hash32OfHex("md5('ab:' || CAST(user_id AS VARCHAR))")
    s"""WITH per_user AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase'
      |             AND epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = $AbLastDay
      |             THEN 1 ELSE 0 END) AS converted,
      |    (CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END) AS arm
      |  FROM events GROUP BY user_id),
      |arms AS (
      |  SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS x
      |  FROM per_user GROUP BY arm),
      |ab AS (
      |  SELECT a.n AS na, b.n AS nb, a.x AS xa, b.x AS xb
      |  FROM (SELECT * FROM arms WHERE arm = 'A') a,
      |       (SELECT * FROM arms WHERE arm = 'B') b),
      |calc AS (
      |  SELECT na, nb, xa, xb,
      |    CAST(xa AS DOUBLE) / na AS pa, CAST(xb AS DOUBLE) / nb AS pb,
      |    CAST(xa + xb AS DOUBLE) / (na + nb) AS pp
      |  FROM ab)
      |SELECT na, nb, xa, xb, round(pa, 6) AS pa, round(pb, 6) AS pb,
      |  round((pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)), 6) AS z,
      |  (abs((pa - pb) / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))) > 1.959964) AS significant
      |FROM calc""".stripMargin
  }

  // --------------------------------------------------------------- q156
  /** Calibration / reliability curve — the audit run on any score a
    * pipeline thresholds: the predictor is each user's activity SHARE
    * OF THE MOST ACTIVE user (p̂ = n_ev / max_ev — scale-invariant,
    * so the decile bins populate at every SF, and a RATIONAL with
    * denominator max_ev, so bin means are exact), the outcome is
    * q155's last-day conversion, and each decile bin reports
    * predicted vs observed with the calibration gap — what a
    * Platt/isotonic fix would consume.
    *
    * Shape for 100 TB: one partial-agged pass to per-user rows, a
    * 1-row broadcast max, one tiny groupBy(bin); nothing event-level
    * crosses twice. */
  def q156Calibration(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === AbLastDay, 1L).otherwise(0L))
          .as("converted"))
    val mx = perUser.agg(max(col("n_ev")).as("max_ev"))
    perUser.crossJoin(broadcast(mx))
      .withColumn("bin", expr("least((n_ev * 10) div max_ev, 9)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("n_ev")).cast("double") / (max(col("max_ev")) * count(lit(1))), 6)
          .as("mean_predicted"),
        round(sum(col("converted")).cast("double") / count(lit(1)), 6)
          .as("observed_rate"))
      .withColumn("calib_gap",
        round(col("observed_rate") - col("mean_predicted"), 6))
      .orderBy(col("bin"))
  }

  val q156Sql: String =
    s"""WITH per_user AS (
      |  SELECT user_id, count(*) AS n_ev,
      |    max(CASE WHEN event_type = 'purchase'
      |             AND epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = $AbLastDay
      |             THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY user_id),
      |mx AS (SELECT max(n_ev) AS max_ev FROM per_user),
      |binned AS (
      |  SELECT n_ev, converted, max_ev,
      |    least((n_ev * 10) // max_ev, 9) AS bin
      |  FROM per_user CROSS JOIN mx)
      |SELECT bin, count(*) AS n_users,
      |  round(CAST(sum(n_ev) AS DOUBLE) / (max(max_ev) * count(*)), 6) AS mean_predicted,
      |  round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS observed_rate,
      |  round(round(CAST(sum(converted) AS DOUBLE) / count(*), 6)
      |      - round(CAST(sum(n_ev) AS DOUBLE) / (max(max_ev) * count(*)), 6), 6) AS calib_gap
      |FROM binned GROUP BY bin
      |ORDER BY bin""".stripMargin

  // --------------------------------------------------------------- q158
  /** Time-to-event (survival) distribution — days from a user's first
    * 'view' to their first subsequent 'purchase', the
    * conversion-latency analysis product teams run beside q53's
    * funnel: per-day-lag histogram of converters plus exact quartiles
    * computed ON the day histogram (q138's value-histogram machinery —
    * the lag domain is O(days), so percentiles never touch a per-user
    * window), with the never-converted population reported as the
    * censored remainder.
    *
    * Shape for 100 TB: two partial-agged min-aggregations per user
    * (view, then qualifying purchase), one tiny groupBy(day lag),
    * cumulative window over O(days) rows. */
  def q158TimeToEvent(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_ts"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("ts_us") > col("v_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("p_ts"),
        min(col("v_ts")).as("v_ts"))
    val lags = firstBuy
      .select(expr("(p_ts - v_ts) div 86400000000").as("tte_days"))
      .groupBy(col("tte_days")).agg(count(lit(1)).as("n"))
    val tot = firstView.agg(count(lit(1)).as("n_viewers"))
      .crossJoin(lags.agg(sum(col("n")).as("n_converted")))
    val cum = lags
      .withColumn("cumn", sum(col("n")).over(Window.orderBy(col("tte_days"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    cum.select(col("tte_days"), col("n"), col("cumn"),
        col("n_viewers"), col("n_converted"),
        round(col("cumn").cast("double") / col("n_converted"), 6)
          .as("cdf_converted"),
        round(col("n_converted").cast("double") / col("n_viewers"), 6)
          .as("conversion_rate"))
      .orderBy(col("tte_days"))
  }

  val q158Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
      |fv AS (SELECT user_id, min(ts_us) AS v_ts FROM ev
      |       WHERE event_type = 'view' GROUP BY user_id),
      |fb AS (SELECT e.user_id, min(ts_us) AS p_ts, min(v_ts) AS v_ts
      |       FROM ev e JOIN fv ON e.user_id = fv.user_id
      |       WHERE event_type = 'purchase' AND ts_us > v_ts
      |       GROUP BY e.user_id),
      |lags AS (
      |  SELECT (p_ts - v_ts) // 86400000000 AS tte_days, count(*) AS n
      |  FROM fb GROUP BY 1),
      |tot AS (
      |  SELECT (SELECT count(*) FROM fv) AS n_viewers,
      |    (SELECT CAST(sum(n) AS BIGINT) FROM lags) AS n_converted),
      |cum AS (
      |  SELECT tte_days, n,
      |    CAST(sum(n) OVER (ORDER BY tte_days
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn
      |  FROM lags)
      |SELECT tte_days, n, cumn, n_viewers, n_converted,
      |  round(CAST(cumn AS DOUBLE) / n_converted, 6) AS cdf_converted,
      |  round(CAST(n_converted AS DOUBLE) / n_viewers, 6) AS conversion_rate
      |FROM cum CROSS JOIN tot
      |ORDER BY tte_days""".stripMargin

  // --------------------------------------------------------------- q159
  /** Seasonal anomaly gate: count·denom ≥ 3·seasonal_sum·1 and ≥ 5. */
  val SeasonalFactor = 3
  val SeasonalMin = 5L

  /** Seasonally-adjusted anomaly detection — q63's z-score flags
    * anything busy, q121 proved the hour term matters; this one flags
    * (type, day, hour) cells that are ≥ [[SeasonalFactor]]× their OWN
    * hour-of-day seasonal mean (integer cross-multiplication:
    * cnt·n_days ≥ 3·Σ_same-hour — no float baseline), so the 9 am
    * spike that happens every day stays quiet and a 3 am surge
    * lights up. Each cell's baseline excludes nothing (the mean
    * includes the cell — a conservative gate that needs a stronger
    * surge to fire, and keeps both engines' arithmetic identical).
    * The stream carries q137's deterministic surge overlay (same
    * [[BurstHourStart]]/[[BurstAmp]] constants — one incident, two
    * detectors: q137 finds the episode in time, this one proves it is
    * seasonally abnormal), because the uniform fixture otherwise has
    * nothing ≥3× its own hour profile at most SFs.
    *
    * Shape for 100 TB: one partial-agged groupBy(type, day, hour);
    * the seasonal profile is a tiny re-aggregation broadcast back. */
  def q159SeasonalAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
    val surge = ev.filter(col("hour").between(BurstHourStart, BurstHourEnd))
      .select(col("event_type"), col("hour"),
        explode(sequence(lit(1), lit(BurstAmp - 1))).as("copy"))
      .drop("copy")
    val cells = ev.unionByName(surge)
      .select(col("event_type"), expr("hour div 24").as("day"),
        expr("hour % 24").as("hod"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
    val seasonal = cells.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("cnt")).as("ssum"), count(lit(1)).as("n_days"))
    cells.join(broadcast(seasonal), Seq("event_type", "hod"))
      .filter(col("cnt") * col("n_days") >= lit(SeasonalFactor) * col("ssum") &&
        col("cnt") >= SeasonalMin)
      .select(col("event_type"), col("day"), col("hod"), col("cnt"),
        col("ssum"), col("n_days"),
        round(col("cnt").cast("double") * col("n_days") / col("ssum"), 6)
          .as("lift"))
      .orderBy(col("event_type"), col("day"), col("hod"))
  }

  val q159Sql: String =
    s"""WITH ev AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour
      |  FROM events),
      |amped AS (
      |  SELECT event_type, hour FROM ev
      |  UNION ALL
      |  SELECT event_type, hour FROM ev, generate_series(1, ${BurstAmp - 1})
      |  WHERE hour BETWEEN $BurstHourStart AND $BurstHourEnd),
      |cells AS (
      |  SELECT event_type, hour // 24 AS day, hour % 24 AS hod, count(*) AS cnt
      |  FROM amped GROUP BY 1, 2, 3),
      |seasonal AS (
      |  SELECT event_type, hod, CAST(sum(cnt) AS BIGINT) AS ssum,
      |    count(*) AS n_days
      |  FROM cells GROUP BY event_type, hod)
      |SELECT c.event_type, c.day, c.hod, c.cnt, s.ssum, s.n_days,
      |  round(CAST(c.cnt AS DOUBLE) * s.n_days / s.ssum, 6) AS lift
      |FROM cells c JOIN seasonal s
      |  ON c.event_type = s.event_type AND c.hod = s.hod
      |WHERE c.cnt * s.n_days >= $SeasonalFactor * s.ssum AND c.cnt >= $SeasonalMin
      |ORDER BY c.event_type, c.day, c.hod""".stripMargin

  // --------------------------------------------------------------- q161
  /** ROC AUC of the activity predictor — completes the evaluation
    * family: q155 tests whether arms differ, q156 asks whether the
    * score is CALIBRATED, this asks whether it DISCRIMINATES (does a
    * more-active user convert more often, regardless of scale?). Same
    * predictor (per-user event count) and outcome (q155's last-day
    * purchase flag) as q156, so the three rows read as one report.
    *
    * AUC is computed by the tie-aware Mann-Whitney identity on the
    * SCORE HISTOGRAM, never on per-user ranks: a global rank() over
    * all users is a single-partition sort at 100 TB, but
    * AUC = Σ_s pos_s·(cum_neg_<s + neg_s/2) / (P·N) needs only
    * groupBy(score) counts plus a cumulative window over the O(distinct
    * scores) histogram — and halves are exact in binary floating point,
    * so both engines agree bit-for-bit before the final division.
    *
    * Shape for 100 TB: one partial-agged groupBy(user), one
    * groupBy(score) re-aggregation, a window over O(scores) rows. */
  def q161Auc(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === AbLastDay, 1L).otherwise(0L))
          .as("converted"))
    val hist = perUser.groupBy(col("n_ev"))
      .agg(sum(col("converted")).as("pos"),
        sum(lit(1L) - col("converted")).as("neg"))
    val w = Window.orderBy(col("n_ev"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cneg", coalesce(sum(col("neg")).over(w), lit(0L)))
    cum.agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        sum(col("pos") * (col("cneg") + col("neg") / lit(2.0))).as("u"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"),
        round(col("u") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  val q161Sql: String =
    s"""WITH per_user AS (
      |  SELECT user_id, count(*) AS n_ev,
      |    max(CASE WHEN event_type = 'purchase'
      |             AND epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = $AbLastDay
      |             THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY user_id),
      |hist AS (
      |  SELECT n_ev, CAST(sum(converted) AS BIGINT) AS pos,
      |    CAST(sum(1 - converted) AS BIGINT) AS neg
      |  FROM per_user GROUP BY n_ev),
      |cum AS (
      |  SELECT pos, neg, CAST(coalesce(sum(neg) OVER (ORDER BY n_ev
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cneg
      |  FROM hist)
      |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
      |  count(*) AS n_scores,
      |  round(sum(pos * (cneg + neg / 2.0)) / (sum(pos) * sum(neg)), 6) AS auc
      |FROM cum""".stripMargin

  // --------------------------------------------------------------- q163
  /** One relationship row of the referential-integrity audit: per-key
    * child counts left-joined against the parent's key set. Orphans are
    * NON-NULL child keys with no parent (SQL FK semantics: a null FK is
    * absent, not broken — reported separately as null_rows). */
  def fkAudit(rel: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String,
              broadcastParent: Boolean): DataFrame = {
    val ck = child.groupBy(col(fk).as("k")).agg(count(lit(1)).as("nrows"))
    val pk0 = parent.select(col(pk).as("k")).distinct()
      .withColumn("hit", lit(1))
    val pside = if (broadcastParent) broadcast(pk0) else pk0
    ck.join(pside, Seq("k"), "left")
      .agg(sum(col("nrows")).as("child_rows"),
        count(lit(1)).as("child_keys"),
        coalesce(sum(when(col("k").isNull, col("nrows"))), lit(0L)).as("null_rows"),
        coalesce(sum(when(col("hit").isNull && col("k").isNotNull, 1L)), lit(0L))
          .as("orphan_keys"),
        coalesce(sum(when(col("hit").isNull && col("k").isNotNull, col("nrows"))),
          lit(0L)).as("orphan_rows"))
      .select(lit(rel).as("relationship"), col("child_rows"), col("child_keys"),
        col("null_rows"), col("orphan_keys"), col("orphan_rows"),
        round(col("orphan_rows").cast("double") / col("child_rows"), 6)
          .as("orphan_rate"))
  }

  /** Referential-integrity audit across the star schema — the data
    * contract check a warehouse runs after every load: for each FK
    * relationship, how many child rows/keys exist, how many are null,
    * and how many point at a parent that is not there. Seven
    * relationships, one 7-row report.
    *
    * Shape for 100 TB: each relationship aggregates the child side to
    * DISTINCT keys first (partial-agged map-side combine — the join
    * never sees child rows), then left-joins the parent key set:
    * broadcast for the O(1) dims (nation, region), shuffle-on-key for
    * the SF-scaled parents where AQE picks the strategy. The union is
    * of 1-row aggregates. */
  def q163FkIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    Seq(
      fkAudit("customer.c_nationkey->nation", cust, "c_nationkey",
        nat, "n_nationkey", broadcastParent = true),
      fkAudit("lineitem.l_orderkey->orders", li, "l_orderkey",
        ord, "o_orderkey", broadcastParent = false),
      fkAudit("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, sfDir), "p_partkey", broadcastParent = false),
      fkAudit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        supp, "s_suppkey", broadcastParent = false),
      fkAudit("nation.n_regionkey->region", nat, "n_regionkey",
        Tables.region(spark, sfDir), "r_regionkey", broadcastParent = true),
      fkAudit("orders.o_custkey->customer", ord, "o_custkey",
        cust, "c_custkey", broadcastParent = false),
      fkAudit("supplier.s_nationkey->nation", supp, "s_nationkey",
        nat, "n_nationkey", broadcastParent = true)
    ).reduce(_ unionByName _).orderBy(col("relationship"))
  }

  private def fkAuditSql(rel: String, child: String, fk: String,
                         parent: String, pk: String): String =
    s"""SELECT '$rel' AS relationship,
       |  CAST(sum(nrows) AS BIGINT) AS child_rows,
       |  count(*) AS child_keys,
       |  CAST(coalesce(sum(CASE WHEN k IS NULL THEN nrows END), 0) AS BIGINT) AS null_rows,
       |  CAST(coalesce(sum(CASE WHEN hit IS NULL AND k IS NOT NULL THEN 1 END), 0) AS BIGINT) AS orphan_keys,
       |  CAST(coalesce(sum(CASE WHEN hit IS NULL AND k IS NOT NULL THEN nrows END), 0) AS BIGINT) AS orphan_rows,
       |  round(CAST(coalesce(sum(CASE WHEN hit IS NULL AND k IS NOT NULL THEN nrows END), 0) AS DOUBLE)
       |    / sum(nrows), 6) AS orphan_rate
       |FROM (SELECT $fk AS k, count(*) AS nrows FROM $child GROUP BY $fk) c
       |LEFT JOIN (SELECT DISTINCT $pk AS pk2, 1 AS hit FROM $parent) p ON c.k = p.pk2""".stripMargin

  val q163Sql: String =
    Seq(
      fkAuditSql("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fkAuditSql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkAuditSql("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
      fkAuditSql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      fkAuditSql("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
      fkAuditSql("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
      fkAuditSql("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
    ).mkString("", "\nUNION ALL\n", "\nORDER BY relationship")

  // --------------------------------------------------------------- q168
  /** A lineitem is "late" when it shipped this many days past the
    * order date. */
  val WaitLateDays = 60

  /** Suppliers who kept orders waiting — the TPC-H Q21 shape adapted
    * to this schema (shipdate vs orderdate + [[WaitLateDays]], final
    * 'F' orders): for each finished multi-supplier order, find the
    * supplier who was the SOLE late shipper (everyone else delivered
    * on time), and count such orders per supplier. The classic
    * EXISTS / NOT-EXISTS correlated-subquery composition, expressed as
    * one left-semi and one left-anti join.
    *
    * Shape for 100 TB: every join — lineitem⋈orders, the semi (some
    * other supplier exists) and the anti (no other LATE supplier) —
    * keys on l_orderkey, so all four frames shuffle once onto the same
    * partitioning and AQE can chain them without re-exchange; the
    * late/pair frames are pre-aggregated to DISTINCT (orderkey,
    * suppkey) before the correlates, and the supplier name join is a
    * broadcast-scale dimension lookup. */
  def q168WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val fo = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = li.join(fo, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $WaitLateDays DAYS"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val pairs = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val cand = late.as("w")
      .join(pairs.as("o"), expr("w.ok = o.ok AND w.sk <> o.sk"), "left_semi")
      .as("w")
      .join(late.as("l"), expr("w.ok = l.ok AND w.sk <> l.sk"), "left_anti")
    cand.groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(spark, sfDir)
        .select(col("s_suppkey"), col("s_name")), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q168Sql: String =
    s"""WITH fo AS (
      |  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
      |late AS (
      |  SELECT DISTINCT l.l_orderkey AS ok, l.l_suppkey AS sk
      |  FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
      |  WHERE l.l_shipdate > fo.o_orderdate + INTERVAL $WaitLateDays DAY),
      |pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
      |cand AS (
      |  SELECT w.ok, w.sk FROM late w
      |  WHERE EXISTS (SELECT 1 FROM pairs o WHERE o.ok = w.ok AND o.sk <> w.sk)
      |    AND NOT EXISTS (SELECT 1 FROM late l2 WHERE l2.ok = w.ok AND l2.sk <> w.sk))
      |SELECT s.s_name, count(*) AS numwait
      |FROM cand JOIN supplier s ON cand.sk = s.s_suppkey
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin

  // --------------------------------------------------------------- q172
  /** Trending geometry: 30-minute windows, top-3 risers per window. */
  val TrendWindowUs = 1800000000L
  val TrendTopK = 3

  /** Streaming trending detector — the "what is rising RIGHT NOW"
    * product (trending topics/SKUs/errors): the STREAM maintains
    * 30-minute windowed counts per event type under the q98 watermark
    * regime (bounded state, append-only finalized windows through the
    * real Structured Streaming engine); the serving-side read-back
    * then scores each finalized window's types by GROWTH vs their own
    * previous window and keeps the top [[TrendTopK]] risers. The
    * split is the production architecture: monotone windowed counts
    * are the only thing streaming state must hold — ranking is a
    * view-time concern on the O(windows × types) sink.
    *
    * Determinism: identical availableNow/watermark argument as q98 —
    * emitted set = windows with end ≤ max(ts) − 2 h, a pure function
    * of the data replayed by the oracle's HAVING; growth/rank run on
    * that closed set with (growth desc, type) tiebreak.
    *
    * Shape for 100 TB: streaming side is partial-agged windowed
    * counts with watermark-evicted state; batch side self-joins the
    * tiny aggregate on (type, prev window) and ranks inside each
    * window partition. */
  def q172StreamTrending(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = Tables.eventsRaw(spark, sfDir)
    val tsEventTime =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        timestamp_micros(expr("ts div 1000"))
      else col("ts").cast("timestamp")
    val tmp = java.nio.file.Files.createTempDirectory("graft_q172_")
    val outDir = tmp.resolve("out").toString
    val cpDir = tmp.resolve("cp").toString
    val agg = spark.readStream.schema(raw.schema).parquet(s"$sfDir/[e]vents.parquet")
      .select(tsEventTime.as("ts"), col("event_type"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("window.start")).as("ws"),
        col("event_type"), col("n_events"))
    agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val sink = spark.read.parquet(outDir).localCheckpoint()
    graft.Checkpoints.deferFree(sink)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    val prev = sink.select((col("ws") + TrendWindowUs).as("ws"),
      col("event_type"), col("n_events").as("prev_n"))
    val w = Window.partitionBy(col("ws"))
      .orderBy(col("growth").desc, col("event_type"))
    sink.join(prev, Seq("ws", "event_type"), "left")
      .withColumn("growth", col("n_events") - coalesce(col("prev_n"), lit(0L)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TrendTopK)
      .select(col("ws").as("window_start_us"), col("rank"), col("event_type"),
        col("n_events"), col("growth"))
      .orderBy(col("window_start_us"), col("rank"))
  }

  val q172Sql: String =
    s"""WITH ev AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type FROM events),
      |wm AS (SELECT (max(ts_us) // 1000 - $StreamDelayMs) * 1000 AS w FROM ev),
      |sink AS (
      |  SELECT (ts_us // $TrendWindowUs) * $TrendWindowUs AS ws,
      |    event_type, count(*) AS n_events
      |  FROM ev GROUP BY 1, 2
      |  HAVING ws + $TrendWindowUs <= (SELECT w FROM wm)),
      |scored AS (
      |  SELECT s.ws, s.event_type, s.n_events,
      |    s.n_events - coalesce(p.n_events, 0) AS growth
      |  FROM sink s LEFT JOIN sink p
      |    ON s.event_type = p.event_type AND p.ws = s.ws - $TrendWindowUs),
      |ranked AS (
      |  SELECT ws, event_type, n_events, growth,
      |    row_number() OVER (PARTITION BY ws ORDER BY growth DESC, event_type) AS rank
      |  FROM scored)
      |SELECT ws AS window_start_us, rank, event_type, n_events, growth
      |FROM ranked WHERE rank <= $TrendTopK
      |ORDER BY ws, rank""".stripMargin

  // --------------------------------------------------------------- q173
  /** Seasonal-mean forecast backtest — the capacity-planning loop run
    * on event streams (will tomorrow's 9 am load fit?): forecast the
    * LAST day's hourly counts per event type as the mean of the same
    * hour over all training days (the seasonal-naive baseline every
    * forecasting system must beat), then score against the actual last
    * day: per-cell absolute error plus the per-type MAPE over cells
    * with non-zero actuals (the standard MAPE domain — zero-actual
    * cells would divide by zero; they still appear as rows with their
    * absolute error). Exact integer inputs throughout: forecast =
    * Σcell / n_train_days as one rational per cell.
    *
    * Shape for 100 TB: one partial-agged groupBy(type, day, hod) over
    * the events; training sums re-aggregate the O(cells) frame; the
    * last-day join, day census and per-type MAPE are all tiny
    * broadcast-scale frames. */
  def q173ForecastBacktest(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hod"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("cnt"))
    val lastDay = cells.agg(max(col("day")).as("last_day"))
    val withLast = cells.crossJoin(broadcast(lastDay))
    val nTrain = withLast.filter(col("day") < col("last_day"))
      .agg(countDistinct(col("day")).as("n_train"))
    val train = withLast.filter(col("day") < col("last_day"))
      .groupBy(col("event_type"), col("hod")).agg(sum(col("cnt")).as("s"))
    val actual = withLast.filter(col("day") === col("last_day"))
      .select(col("event_type"), col("hod"), col("cnt").as("actual"))
    val grid = train.join(actual, Seq("event_type", "hod"), "full_outer")
      .select(col("event_type"), col("hod"),
        coalesce(col("s"), lit(0L)).as("s"),
        coalesce(col("actual"), lit(0L)).as("actual"))
      .crossJoin(broadcast(nTrain))
      .withColumn("fc", col("s").cast("double") / col("n_train"))
    val mape = grid.filter(col("actual") > 0)
      .groupBy(col("event_type"))
      .agg(avg(abs(col("actual") - col("fc")) / col("actual")).as("m"))
    grid.join(broadcast(mape), Seq("event_type"))
      .select(col("event_type"), col("hod"), col("n_train"),
        round(col("fc"), 6).as("forecast"), col("actual"),
        round(abs(col("actual") - col("fc")), 6).as("abs_err"),
        round(col("m"), 6).as("type_mape"))
      .orderBy(col("event_type"), col("hod"))
  }

  val q173Sql: String =
    s"""WITH cells AS (
      |  SELECT event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2, 3),
      |ld AS (SELECT max(day) AS last_day FROM cells),
      |nt AS (SELECT count(DISTINCT day) AS n_train FROM cells
      |       WHERE day < (SELECT last_day FROM ld)),
      |train AS (
      |  SELECT event_type, hod, CAST(sum(cnt) AS BIGINT) AS s FROM cells
      |  WHERE day < (SELECT last_day FROM ld) GROUP BY event_type, hod),
      |actual AS (
      |  SELECT event_type, hod, cnt AS actual FROM cells
      |  WHERE day = (SELECT last_day FROM ld)),
      |grid AS (
      |  SELECT coalesce(t.event_type, a.event_type) AS event_type,
      |    coalesce(t.hod, a.hod) AS hod,
      |    CAST(coalesce(t.s, 0) AS DOUBLE) / (SELECT n_train FROM nt) AS fc,
      |    coalesce(a.actual, 0) AS actual
      |  FROM train t FULL OUTER JOIN actual a
      |    ON t.event_type = a.event_type AND t.hod = a.hod),
      |mape AS (
      |  SELECT event_type, avg(abs(actual - fc) / actual) AS m
      |  FROM grid WHERE actual > 0 GROUP BY event_type)
      |SELECT g.event_type, g.hod, (SELECT n_train FROM nt) AS n_train,
      |  round(g.fc, 6) AS forecast, g.actual,
      |  round(abs(g.actual - g.fc), 6) AS abs_err,
      |  round(m.m, 6) AS type_mape
      |FROM grid g JOIN mape m ON g.event_type = m.event_type
      |ORDER BY g.event_type, g.hod""".stripMargin

  // --------------------------------------------------------------- q178
  /** RFM segmentation — the classic customer-base census (recency /
    * frequency / monetary quintile scores): per user, days since last
    * event, event count, and rounded value sum; each dimension scored
    * 1–5 against its own exact quintile thresholds; the report is the
    * (r, f, m) segment census with per-segment means. Dimensions are
    * put on the 1e-6 grid BEFORE thresholding and thresholds rounded
    * too, so the boundary comparisons are exact-grid equality in both
    * engines (q50's percentile ≡ quantile_cont identity).
    *
    * Shape for 100 TB: one partial-agged groupBy(user); thresholds
    * are ONE 12-value percentile aggregate broadcast back; the census
    * groupBy runs on ≤125 segment keys. */
  def q178Rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(max(expr("ts div 86400000000000")).as("last_day"),
        count(lit(1)).as("freq"),
        asD(dsum(col("value"))).as("mon"))
    val maxDay = perUser.agg(max(col("last_day")).as("max_day"))
    val rfm = perUser.crossJoin(broadcast(maxDay))
      .select(col("user_id"), (col("max_day") - col("last_day")).as("rec"),
        col("freq"), col("mon"))
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val th = rfm.agg(percentile(col("rec"), qs).as("tr"),
      percentile(col("freq"), qs).as("tf"), percentile(col("mon"), qs).as("tm"))
    def score(x: Column, t: Column): Column =
      (1 to 4).map(i => when(x > round(t(i - 1), 6), 1).otherwise(0))
        .reduce(_ + _) + 1
    rfm.crossJoin(broadcast(th))
      .select(col("user_id"), col("rec"), col("freq"), col("mon"),
        score(col("rec").cast("double"), col("tr")).as("r_score"),
        score(col("freq").cast("double"), col("tf")).as("f_score"),
        score(col("mon"), col("tm")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("rec")), 6).as("avg_recency"),
        round(avg(col("freq")), 6).as("avg_freq"),
        round(avg(col("mon")), 6).as("avg_monetary"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q178Sql: String =
    s"""WITH per_user AS (
      |  SELECT user_id,
      |    max(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS last_day,
      |    count(*) AS freq,
      |    round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS mon
      |  FROM events GROUP BY user_id),
      |rfm AS (
      |  SELECT user_id,
      |    (SELECT max(last_day) FROM per_user) - last_day AS rec, freq, mon
      |  FROM per_user),
      |th AS (
      |  SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS tr,
      |    quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS tf,
      |    quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS tm
      |  FROM rfm),
      |scored AS (
      |  SELECT user_id, rec, freq, mon,
      |    1 + (CASE WHEN rec > round(tr[1], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN rec > round(tr[2], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN rec > round(tr[3], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN rec > round(tr[4], 6) THEN 1 ELSE 0 END) AS r_score,
      |    1 + (CASE WHEN freq > round(tf[1], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > round(tf[2], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > round(tf[3], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN freq > round(tf[4], 6) THEN 1 ELSE 0 END) AS f_score,
      |    1 + (CASE WHEN mon > round(tm[1], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN mon > round(tm[2], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN mon > round(tm[3], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN mon > round(tm[4], 6) THEN 1 ELSE 0 END) AS m_score
      |  FROM rfm CROSS JOIN th)
      |SELECT r_score, f_score, m_score, count(*) AS n_users,
      |  round(avg(rec), 6) AS avg_recency,
      |  round(avg(freq), 6) AS avg_freq,
      |  round(avg(mon), 6) AS avg_monetary
      |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- q179
  /** Schema-evolution merge read — the lakehouse behavior every
    * long-lived dataset hits (a column added mid-history): the engine
    * WRITES two deterministic parquet batches with different schemas
    * (v1: orders without priority; v2: adds o_orderpriority) under one
    * dataset root partitioned by batch, then reads the root back with
    * `mergeSchema` — old files surface the new column as NULL — and
    * reports the per-batch census (rows, priority nulls, value sum).
    * The oracle never sees the temp files: it recomputes the merged
    * RESULT from the source table directly (union-by-name with NULL
    * fill), which is exactly the contract schema merge must satisfy.
    *
    * Shape for 100 TB: the split/write is a one-pass partitioned
    * append; the merged scan prunes on the partition column and pays
    * one footer-merge planning step; the census is a 2-group
    * aggregate. */
  def q179SchemaMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_q179_").toString
    ord.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    ord.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    val merged = spark.read.option("mergeSchema", "true")
      .option("basePath", tmp).parquet(s"$tmp/batch=1", s"$tmp/batch=2")
    val res = merged.groupBy(col("batch"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
          .as("null_priority"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        asD(dsum(col("o_totalprice"))).as("total_value"))
      .orderBy(col("batch"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(tmp)).iterator()
        .asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q179Sql: String =
    """WITH merged AS (
      |  SELECT 1 AS batch, o_orderkey, o_totalprice,
      |    CAST(NULL AS VARCHAR) AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL BY NAME
      |  SELECT 2 AS batch, o_orderkey, o_totalprice, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |SELECT batch, count(*) AS n_rows,
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS null_priority,
      |  count(DISTINCT o_orderpriority) AS n_priorities,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value
      |FROM merged GROUP BY batch ORDER BY batch""".stripMargin

  // --------------------------------------------------------------- q180
  /** Per-reducer row cap the salting plan targets. */
  val SaltCap = 1000L

  /** Skew salting plan — the PLANNING step ahead of q75's salted
    * execution: from the key histogram, which keys overflow a
    * [[SaltCap]]-row reducer and what salt fan-out each needs
    * (factor = ⌈n/cap⌉, the per-salt load after splitting). Emitting
    * the plan as data is how a pipeline framework decides
    * per-key strategy (broadcast / salt-k / leave alone) instead of
    * hardcoding one global knob.
    *
    * Shape for 100 TB: ONE partial-agged groupBy(key) histogram; the
    * plan math is per-row arithmetic on the O(keys) aggregate. */
  def q180SaltPlan(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_rows"))
      .select(col("event_type"), col("n_rows"),
        expr(s"(n_rows + $SaltCap - 1) div $SaltCap").as("salt_factor"))
      .withColumn("rows_per_salt",
        expr("(n_rows + salt_factor - 1) div salt_factor"))
      .withColumn("needs_salt", col("salt_factor") > 1)
      .orderBy(col("event_type"))

  val q180Sql: String =
    s"""SELECT event_type, count(*) AS n_rows,
      |  (count(*) + $SaltCap - 1) // $SaltCap AS salt_factor,
      |  (count(*) + ((count(*) + $SaltCap - 1) // $SaltCap) - 1)
      |    // ((count(*) + $SaltCap - 1) // $SaltCap) AS rows_per_salt,
      |  ((count(*) + $SaltCap - 1) // $SaltCap) > 1 AS needs_salt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q181
  /** Zone-map block width (rows of the clustered key per block) and
    * the audited predicate range. */
  val ZoneRows = 256L
  val ZonePredLo = 50000.0
  val ZonePredHi = 100000.0

  /** Zone-map skipping audit — the storage-layout math behind q58's
    * partition pruning and q86's Z-order, made explicit: blocks of
    * [[ZoneRows]] consecutive order keys carry (min, max) of
    * o_totalprice; a range predicate can SKIP every block whose
    * [min, max] misses it. Emits the per-block zone map with its hit
    * flag — the spec and any reader can compute the skip ratio and
    * compare layouts (price is uncorrelated with key order here, so
    * hit rates are near 1: the measured argument FOR re-clustering
    * by the predicate column).
    *
    * Shape for 100 TB: one partial-agged groupBy(block) over the
    * scan — the same pass a writer makes when it collects footer
    * statistics. */
  def q181Zonemaps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(expr(s"o_orderkey div $ZoneRows").as("block"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("o_totalprice")), 6).as("min_price"),
        round(max(col("o_totalprice")), 6).as("max_price"))
      .withColumn("hit",
        col("max_price") >= ZonePredLo && col("min_price") <= ZonePredHi)
      .orderBy(col("block"))

  val q181Sql: String =
    s"""SELECT o_orderkey // $ZoneRows AS block, count(*) AS n_rows,
      |  round(min(o_totalprice), 6) AS min_price,
      |  round(max(o_totalprice), 6) AS max_price,
      |  (round(max(o_totalprice), 6) >= $ZonePredLo
      |    AND round(min(o_totalprice), 6) <= $ZonePredHi) AS hit
      |FROM orders GROUP BY 1 ORDER BY block""".stripMargin

  // --------------------------------------------------------------- q182
  /** Touch channels (the fixture's non-purchase event types), pinned
    * like q51's pivot values so the report schema is static. */
  val MarkovChannels = Seq("click", "error", "signup", "view")
  /** Power-iteration budget for the absorbing-chain solve — far past
    * convergence for a ≤7-state chain; both engines run EXACTLY this
    * many rounds so they compare the same partial sums, not a
    * convergence race. */
  val MarkovIters = 24

  /** Markov removal-effect attribution — the data-driven upgrade of
    * q125's last-touch: user journeys (touches up to the first
    * purchase) become a first-order Markov chain over
    * START/channels/CONV/NULL; a channel's credit is how much the
    * chain's START→CONV probability DROPS when the channel is removed
    * (transitions into it re-routed to NULL — the standard removal
    * effect), normalized into shares. The absorbing-chain probability
    * is solved by [[MarkovIters]] unrolled power-iteration rounds.
    *
    * Shape for 100 TB: the corpus-scale work is journeys → transition
    * counts (two per-user windows + a groupBy(src, dst)); the chain
    * itself is O(channels²) — a bounded enum like q171's trace — so
    * the solve runs driver-side on the collected matrix and the
    * oracle replays every scenario's every round as CTEs. */
  def q182MarkovAttribution(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Markov.removalEffects(Tables.events(spark, sfDir),
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      convType = "purchase", channels = MarkovChannels, iters = MarkovIters)

  val q182Sql: String = {
    val scens = None +: MarkovChannels.map(Some(_))
    val sb = new StringBuilder
    sb ++= s"""WITH ev AS (
  SELECT user_id, event_id, event_type,
    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events),
seqd AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS seq
  FROM ev),
pur AS (SELECT user_id, min(seq) AS pseq FROM seqd
        WHERE event_type = 'purchase' GROUP BY user_id),
tch AS (
  SELECT s.user_id, s.event_type,
    row_number() OVER (PARTITION BY s.user_id ORDER BY s.seq) AS tord,
    lead(s.event_type) OVER (PARTITION BY s.user_id ORDER BY s.seq) AS nxt
  FROM seqd s LEFT JOIN pur p ON s.user_id = p.user_id
  WHERE s.event_type <> 'purchase' AND (p.pseq IS NULL OR s.seq < p.pseq)),
lab AS (
  SELECT u.user_id,
    CASE WHEN p.user_id IS NULL THEN '__null__' ELSE '__conv__' END AS lab
  FROM (SELECT DISTINCT user_id FROM seqd) u
  LEFT JOIN pur p ON u.user_id = p.user_id),
raw AS (
  SELECT '__start__' AS src, event_type AS dst FROM tch WHERE tord = 1
  UNION ALL
  SELECT event_type, nxt FROM tch WHERE nxt IS NOT NULL
  UNION ALL
  SELECT t.event_type, l.lab FROM tch t JOIN lab l ON t.user_id = l.user_id
  WHERE t.nxt IS NULL
  UNION ALL
  SELECT '__start__', l.lab FROM lab l
  LEFT JOIN (SELECT DISTINCT user_id FROM tch) x ON l.user_id = x.user_id
  WHERE x.user_id IS NULL),
trans AS MATERIALIZED (SELECT src, dst, count(*) AS cnt FROM raw GROUP BY src, dst),
"""
    scens.zipWithIndex.foreach { case (c, i) =>
      val redirect = c.map(ch => s"CASE WHEN dst = '$ch' THEN '__null__' ELSE dst END")
        .getOrElse("dst")
      val filt = c.map(ch => s"WHERE src <> '$ch'").getOrElse("")
      sb ++= s"""t_$i AS MATERIALIZED (SELECT src, $redirect AS dst, CAST(sum(cnt) AS DOUBLE) AS cnt
  FROM trans $filt GROUP BY 1, 2),
o_$i AS MATERIALIZED (SELECT src, sum(cnt) AS o FROM t_$i GROUP BY src),
s_$i AS MATERIALIZED (SELECT DISTINCT s FROM (SELECT src AS s FROM t_$i UNION ALL SELECT dst FROM t_$i)),
p_${i}_0 AS (SELECT s, CASE WHEN s = '__conv__' THEN 1.0 ELSE 0.0 END AS p FROM s_$i),
"""
      for (k <- 1 to MarkovIters) {
        sb ++= s"""p_${i}_$k AS MATERIALIZED (
  SELECT st.s, CASE WHEN st.s = '__conv__' THEN 1.0 WHEN st.s = '__null__' THEN 0.0
    ELSE coalesce((SELECT sum(t.cnt / o.o * pp.p)
      FROM t_$i t JOIN o_$i o ON o.src = t.src JOIN p_${i}_${k - 1} pp ON pp.s = t.dst
      WHERE t.src = st.s), 0.0) END AS p
  FROM s_$i st),
"""
      }
    }
    val resRows = MarkovChannels.zipWithIndex.map { case (ch, j) =>
      s"""  SELECT '$ch' AS channel,
    (SELECT p FROM p_0_$MarkovIters WHERE s = '__start__') AS rb,
    (SELECT p FROM p_${j + 1}_$MarkovIters WHERE s = '__start__') AS rr"""
    }.mkString("\n  UNION ALL\n")
    sb ++= s"""res AS (
$resRows),
tot AS (SELECT sum(rb - rr) AS te FROM res)
SELECT channel, round(rb, 6) AS base_pconv, round(rr, 6) AS removed_pconv,
  round(rb - rr, 6) AS removal_effect,
  round((rb - rr) / nullif((SELECT te FROM tot), 0), 6) AS share
FROM res ORDER BY channel"""
    sb.toString
  }

  // --------------------------------------------------------------- q184
  /** ORC round-trip census — the second columnar format a warehouse
    * speaks (Spark bundles native ORC vectorized read/write): events
    * written as ORC, read back, and fingerprinted per type with the
    * q122 checksum discipline (mod-sum timestamps, decimal value sums,
    * hashed payloads). DuckDB cannot read ORC, so — like q179 — the
    * oracle recomputes the census from the SOURCE table: equality
    * proves the round trip preserved every row and value.
    *
    * Shape for 100 TB: one write pass, one scan + partial-agged
    * census; ORC predicate pushdown and column pruning apply to the
    * read-back exactly as parquet's do. */
  def q184OrcIo(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_q184_")
    val dir = tmp.resolve("events_orc").toString
    ev.write.mode("overwrite").orc(dir)
    val res = spark.read.orc(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("ts % 1000000007")).as("ts_mod_sum"),
        asD(dsum(col("value"))).as("total_value"),
        sum(MF.hash32(col("props"))).as("props_checksum"))
      .orderBy(col("event_type"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q184Sql: String =
    s"""SELECT event_type, count(*) AS n_events,
      |  CAST(sum(epoch_ns(ts) % 1000000007) AS BIGINT) AS ts_mod_sum,
      |  round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS total_value,
      |  CAST(sum(${graft.oracle.Sql.hash32OfHex("md5(props)")}) AS BIGINT) AS props_checksum
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------- q185
  /** Distributed ordinary least squares — price ~ quantity + discount
    * over lineitem, the regression primitive an analytics engine must
    * run without collecting the data: ALL corpus-scale work is ONE
    * partial-agged pass accumulating the 10 second-order moments
    * (each per-row product rounded to the 1e-6 grid and summed as
    * DECIMAL(38,6), so both engines hold bit-identical moments); the
    * 3×3 normal equations then solve by Cramer's rule as scalar
    * expressions on the 1-row moment frame — identical formula text
    * in both engines, so the solve is deterministic too. Emits
    * coefficients, R² and RMSE.
    *
    * Shape for 100 TB: one scan, one 1-row aggregate, O(k³) scalar
    * math. The k-feature generalization keeps the same shape (k²
    * moments, driver-bounded solve). */
  def q185Ols(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Glm.olsFit2(Tables.lineitem(spark, sfDir),
        col("l_quantity"), col("l_discount"), col("l_extendedprice"))
      .withColumnRenamed("b_x1", "b_quantity")
      .withColumnRenamed("b_x2", "b_discount")

  /** Formula text shared with the oracle; lives in operators.Glm. */
  private def OlsExprs = graft.operators.Glm.OlsExprs
  private def OlsDet = graft.operators.Glm.OlsDet

  val q185Sql: String =
    s"""WITH m AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    CAST(sum(CAST(round(l_quantity, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx1,
      |    CAST(sum(CAST(round(l_discount, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
      |    CAST(sum(CAST(round(l_extendedprice, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(l_quantity * l_quantity, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx11,
      |    CAST(sum(CAST(round(l_quantity * l_discount, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx12,
      |    CAST(sum(CAST(round(l_discount * l_discount, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx22,
      |    CAST(sum(CAST(round(l_quantity * l_extendedprice, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx1y,
      |    CAST(sum(CAST(round(l_discount * l_extendedprice, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx2y,
      |    CAST(sum(CAST(round(l_extendedprice * l_extendedprice, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      |  FROM lineitem),
      |b AS (
      |  SELECT n, sy, sx1y, sx2y, syy,
      |    ${OlsExprs("b0")} AS b0_raw,
      |    ${OlsExprs("b1")} AS b1_raw,
      |    ${OlsExprs("b2")} AS b2_raw
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n_rows,
      |  round(b0_raw, 6) AS intercept,
      |  round(b1_raw, 6) AS b_quantity,
      |  round(b2_raw, 6) AS b_discount,
      |  round(1.0 - (syy - b0_raw * sy - b1_raw * sx1y - b2_raw * sx2y)
      |    / (syy - sy * sy / n), 6) AS r2,
      |  round(sqrt((syy - b0_raw * sy - b1_raw * sx1y - b2_raw * sx2y) / n), 6) AS rmse
      |FROM b""".stripMargin

  // --------------------------------------------------------------- q186
  /** IRLS round budget for the logistic fit. */
  val LogregIters = 3

  /** Per-user (activity, converted) training frame shared by the
    * q186/q187/q188 model rows — q155's outcome over q156's
    * predictor. */
  private def labeledUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("x"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === AbLastDay, 1.0).otherwise(0.0))
          .as("y"))

  private def labeledUsersSql: String =
    s"""per_user AS MATERIALIZED (
       |  SELECT user_id, CAST(count(*) AS DOUBLE) AS x,
       |    max(CASE WHEN event_type = 'purchase'
       |             AND epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 = $AbLastDay
       |             THEN 1.0 ELSE 0.0 END) AS y
       |  FROM events GROUP BY user_id)""".stripMargin

  /** Distributed logistic regression (conversion ~ activity) by
    * [[LogregIters]] IRLS/Newton rounds — the GLM primitive beside
    * q185's OLS: each round is ONE partial-agged pass accumulating the
    * five weighted working-response moments (per-row terms on the
    * 1e-6 grid, DECIMAL(38,6) sums — bit-identical in both engines),
    * and the 2×2 weighted normal equations solve as scalar expressions
    * with formula text shared verbatim with the oracle. The
    * coefficient state rides a 1-row broadcast frame — no driver
    * round-trip inside the loop. Emits coefficients, mean log-loss and
    * 0.5-threshold accuracy from one final scoring pass.
    *
    * Shape for 100 TB: iters+1 scans, each a map-side expression +
    * 1-row aggregate; nothing else. */
  def q186Logreg(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Glm.logregFit(labeledUsers(spark, sfDir),
        col("x"), col("y"), LogregIters)
      .withColumnRenamed("n_rows", "n_users")
      .withColumnRenamed("b_x", "b_activity")

  /** Shared with the oracle; lives in operators.Glm. */
  private def LogregB1 = graft.operators.Glm.LogregB1

  val q186Sql: String = {
    def gs(e: String) = s"CAST(round($e, 6) AS DECIMAL(38,6))"
    val sb = new StringBuilder
    sb ++= s"WITH $labeledUsersSql,\nc0 AS (SELECT 0.0 AS b0, 0.0 AS b1),\n"
    for (k <- 1 to LogregIters) {
      val p = s"(1.0 / (1.0 + exp(-(c.b0 + c.b1 * u.x))))"
      val w = s"($p * (1.0 - $p))"
      val z = s"((c.b0 + c.b1 * u.x) + (u.y - $p) / $w)"
      sb ++= s"""m$k AS (
  SELECT CAST(sum(${gs(w)}) AS DOUBLE) AS sw,
    CAST(sum(${gs(s"$w * u.x")}) AS DOUBLE) AS swx,
    CAST(sum(${gs(s"$w * u.x * u.x")}) AS DOUBLE) AS swxx,
    CAST(sum(${gs(s"$w * $z")}) AS DOUBLE) AS swz,
    CAST(sum(${gs(s"$w * u.x * $z")}) AS DOUBLE) AS swxz
  FROM per_user u CROSS JOIN c${k - 1} c),
c$k AS (SELECT (swz - ($LogregB1) * swx) / sw AS b0, $LogregB1 AS b1 FROM m$k),
"""
    }
    val p = s"(1.0 / (1.0 + exp(-(c.b0 + c.b1 * u.x))))"
    sb ++= s"""fin AS (
  SELECT count(*) AS n_users, max(c.b0) AS b0r, max(c.b1) AS b1r,
    CAST(sum(${gs(s"-(u.y * ln($p) + (1.0 - u.y) * ln(1.0 - $p))")}) AS DOUBLE) AS llsum,
    CAST(sum(CASE WHEN ($p >= 0.5) = (u.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM per_user u CROSS JOIN c$LogregIters c)
SELECT n_users, round(b0r, 6) AS intercept, round(b1r, 6) AS b_activity,
  round(llsum / n_users, 6) AS mean_logloss,
  round(CAST(hits AS DOUBLE) / n_users, 6) AS accuracy
FROM fin"""
    sb.toString
  }

  // --------------------------------------------------------------- q187
  /** Decision-stump split finder — the inner loop of tree/GBDT
    * training run as a distributed operator: over the (activity,
    * converted) frame, evaluate EVERY candidate threshold's weighted
    * Gini gain from the score histogram's cumulative sums (q161's
    * pattern — a window over O(distinct scores) rows, never a per-row
    * sort) and emit the best split with both leaves' statistics.
    * Ties on gain break toward the smaller threshold; all inputs are
    * integer counts so the gain arithmetic is exact-rational in both
    * engines.
    *
    * Shape for 100 TB: one partial-agged groupBy(user), one
    * groupBy(score) histogram, a tiny cumulative window, a 1-row
    * TakeOrdered. */
  def q187Stump(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = labeledUsers(spark, sfDir)
      .groupBy(col("x")).agg(sum(col("y")).cast("long").as("pos"),
        count(lit(1)).as("n"))
    val w = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("n")).as("nt"), sum(col("pos")).as("pt"))
    val cum = hist
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("pl", sum(col("pos")).over(w))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("nt")) // a split must leave both sides non-empty
    def gini(p: Column, n: Column): Column =
      lit(2.0) * (p.cast("double") / n) * (lit(1.0) - p.cast("double") / n)
    val gainCol = gini(col("pt"), col("nt")) -
      (col("nl").cast("double") / col("nt")) * gini(col("pl"), col("nl")) -
      ((col("nt") - col("nl")).cast("double") / col("nt")) *
        gini(col("pt") - col("pl"), col("nt") - col("nl"))
    cum.select(col("x").as("split_x"), col("nl").as("n_left"),
        (col("nt") - col("nl")).as("n_right"), col("pl").as("pos_left"),
        (col("pt") - col("pl")).as("pos_right"),
        round(gainCol, 6).as("gini_gain"),
        round(col("pl").cast("double") / col("nl"), 6).as("rate_left"),
        round((col("pt") - col("pl")).cast("double") / (col("nt") - col("nl")), 6)
          .as("rate_right"))
      .orderBy(col("gini_gain").desc, col("split_x")).limit(1)
  }

  val q187Sql: String =
    s"""WITH $labeledUsersSql,
      |hist AS (
      |  SELECT x, CAST(sum(y) AS BIGINT) AS pos, count(*) AS n
      |  FROM per_user GROUP BY x),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt FROM hist),
      |cum AS (
      |  SELECT x, CAST(sum(n) OVER win AS BIGINT) AS nl,
      |    CAST(sum(pos) OVER win AS BIGINT) AS pl, nt, pt
      |  FROM hist CROSS JOIN tot
      |  WINDOW win AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT x AS split_x, nl AS n_left, nt - nl AS n_right,
      |  pl AS pos_left, pt - pl AS pos_right,
      |  round((2.0 * (CAST(pt AS DOUBLE) / nt) * (1.0 - CAST(pt AS DOUBLE) / nt))
      |    - (CAST(nl AS DOUBLE) / nt) * (2.0 * (CAST(pl AS DOUBLE) / nl) * (1.0 - CAST(pl AS DOUBLE) / nl))
      |    - (CAST(nt - nl AS DOUBLE) / nt) * (2.0 * (CAST(pt - pl AS DOUBLE) / (nt - nl)) * (1.0 - CAST(pt - pl AS DOUBLE) / (nt - nl))), 6) AS gini_gain,
      |  round(CAST(pl AS DOUBLE) / nl, 6) AS rate_left,
      |  round(CAST(pt - pl AS DOUBLE) / (nt - nl), 6) AS rate_right
      |FROM cum WHERE nl < nt
      |ORDER BY gini_gain DESC, split_x LIMIT 1""".stripMargin

  // --------------------------------------------------------------- q188
  /** Precision-recall sweep — the threshold-tuning curve for the
    * activity predictor (predict positive when x > t): one row per
    * candidate threshold with tp/fp/fn, precision, recall and F1, all
    * from the score histogram's from-the-top cumulative sums (exact
    * integers; q161's no-global-sort shape). The consumer picks an
    * operating point (max F1, precision floor, …) from the curve —
    * the spec asserts the max-F1 point as the canonical read. */
  def q188PrCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = labeledUsers(spark, sfDir)
      .groupBy(col("x")).agg(sum(col("y")).cast("long").as("pos"),
        count(lit(1)).as("n"))
    val above = Window.orderBy(col("x"))
      .rowsBetween(1, Window.unboundedFollowing)
    val tot = hist.agg(sum(col("pos")).as("pt"))
    hist
      .withColumn("tp", coalesce(sum(col("pos")).over(above), lit(0L)))
      .withColumn("pp", coalesce(sum(col("n")).over(above), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("x").as("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"), (col("pt") - col("tp")).as("fn"),
        when(col("pp") > 0, round(col("tp").cast("double") / col("pp"), 6))
          .as("precision"),
        round(col("tp").cast("double") / col("pt"), 6).as("recall"),
        when(col("tp") > 0, round(
          lit(2.0) * col("tp") / (lit(2.0) * col("tp") + (col("pp") - col("tp"))
            + (col("pt") - col("tp"))), 6)).otherwise(0.0).as("f1"))
      .orderBy(col("threshold"))
  }

  val q188Sql: String =
    s"""WITH $labeledUsersSql,
      |hist AS (
      |  SELECT x, CAST(sum(y) AS BIGINT) AS pos, count(*) AS n
      |  FROM per_user GROUP BY x),
      |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS pt FROM hist),
      |cum AS (
      |  SELECT x, CAST(coalesce(sum(pos) OVER above, 0) AS BIGINT) AS tp,
      |    CAST(coalesce(sum(n) OVER above, 0) AS BIGINT) AS pp, pt
      |  FROM hist CROSS JOIN tot
      |  WINDOW above AS (ORDER BY x ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |SELECT x AS threshold, tp, pp - tp AS fp, pt - tp AS fn,
      |  (CASE WHEN pp > 0 THEN round(CAST(tp AS DOUBLE) / pp, 6) END) AS precision,
      |  round(CAST(tp AS DOUBLE) / pt, 6) AS recall,
      |  (CASE WHEN tp > 0
      |        THEN round(2.0 * tp / (2.0 * tp + (pp - tp) + (pt - tp)), 6)
      |        ELSE 0.0 END) AS f1
      |FROM cum ORDER BY threshold""".stripMargin

  // --------------------------------------------------------------- q189
  /** ALS geometry: rank-2 factors, ridge λ, deterministic hash init. */
  val AlsLambda = 0.1
  val AlsSeedA = 11
  val AlsSeedB = 12

  /** ALS matrix-factorization sweep — one full alternating round of
    * the classic recommender factorization (Koren et al.; Spark's own
    * mllib ALS is this loop at rank 10–200) over the (customer, part,
    * quantity) interaction matrix, rank 2: with item factors fixed,
    * every user's ridge normal equations solve in CLOSED FORM (2×2
    * Cramer as expressions — per-row outer-product terms on the 1e-6
    * grid, DECIMAL sums per user, formula text shared verbatim with
    * the oracle); then the symmetric item update against the new user
    * factors; finally the fit report (n, entities, RMSE after the
    * user half-step and after the full sweep).
    *
    * Shape for 100 TB: two shuffle-on-key aggregations (by user, then
    * by item) and two scoring joins — exactly the data movement one
    * distributed ALS round costs; factors are (entity, f1, f2) rows,
    * never a dense matrix. */
  def q189AlsSweep(spark: SparkSession, sfDir: String): DataFrame = {
    def g(c: Column) = round(c, 6).cast(DecimalType(38, 6))
    def asDbl(c: Column) = c.cast("double")
    val inter = graft.Checkpoints.deferUnpersist(
      Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
          col("l_quantity").as("r"))
        .cache())
    def initF(id: Column, seed: Int): Column =
      lit(0.5) + pmod(graft.functions.MathFunctions.universalHash(id, seed),
        lit(1000L)).cast("double") / 2000.0
    val vi = inter.select(col("i")).distinct()
      .select(col("i"), initF(col("i"), AlsSeedA).as("f1"),
        initF(col("i"), AlsSeedB).as("f2"))
    // half-step 1: users from fixed items
    def solveSide(joined: DataFrame, key: String): DataFrame =
      joined
        .groupBy(col(key))
        .agg(sum(g(col("f1") * col("f1"))).as("a11d"),
          sum(g(col("f1") * col("f2"))).as("a12d"),
          sum(g(col("f2") * col("f2"))).as("a22d"),
          sum(g(col("r") * col("f1"))).as("b1d"),
          sum(g(col("r") * col("f2"))).as("b2d"))
        .select(col(key), asDbl(col("a11d")).as("a11"),
          asDbl(col("a12d")).as("a12"), asDbl(col("a22d")).as("a22"),
          asDbl(col("b1d")).as("b1"), asDbl(col("b2d")).as("b2"))
        .select(col(key), expr(AlsF1).as("f1"), expr(AlsF2).as("f2"))
    val uf = graft.Checkpoints.deferUnpersist(
      solveSide(inter.join(vi, "i"), "u").cache())
    // half-step 2: items from the new users
    val vf = graft.Checkpoints.deferUnpersist(solveSide(
      inter.join(uf.select(col("u"), col("f1"), col("f2")), "u"), "i").cache())
    val half = inter
      .join(uf.select(col("u"), col("f1").as("uf1"), col("f2").as("uf2")), "u")
      .join(vi.select(col("i"), col("f1").as("if1"), col("f2").as("if2")), "i")
      .agg(sum(g((col("r") - (col("uf1") * col("if1") + col("uf2") * col("if2")))
        * (col("r") - (col("uf1") * col("if1") + col("uf2") * col("if2")))))
        .cast("double").as("se_half"), count(lit(1)).as("n1"))
    val full = inter
      .join(uf.select(col("u"), col("f1").as("uf1"), col("f2").as("uf2")), "u")
      .join(vf.select(col("i"), col("f1").as("if1"), col("f2").as("if2")), "i")
      .agg(sum(g((col("r") - (col("uf1") * col("if1") + col("uf2") * col("if2")))
        * (col("r") - (col("uf1") * col("if1") + col("uf2") * col("if2")))))
        .cast("double").as("se_full"), count(lit(1)).as("n2"))
    val cnts = inter.agg(count(lit(1)).as("n_interactions"),
      countDistinct(col("u")).as("n_users"), countDistinct(col("i")).as("n_items"))
    cnts.crossJoin(half).crossJoin(full)
      .select(col("n_interactions"), col("n_users"), col("n_items"),
        round(sqrt(col("se_half") / col("n1")), 6).as("rmse_half"),
        round(sqrt(col("se_full") / col("n2")), 6).as("rmse_full"))
  }

  /** Ridge 2×2 closed form, shared verbatim with the oracle:
    * (λI + A) f = b. */
  private val AlsDet =
    s"((${AlsLambda} + a11) * (${AlsLambda} + a22) - a12 * a12)"
  private val AlsF1 = s"((${AlsLambda} + a22) * b1 - a12 * b2) / $AlsDet"
  private val AlsF2 = s"((${AlsLambda} + a11) * b2 - a12 * b1) / $AlsDet"

  val q189Sql: String = {
    def gs(e: String) = s"CAST(round($e, 6) AS DECIMAL(38,6))"
    def initF(id: String, seed: Int) =
      s"(0.5 + CAST(${graft.oracle.Sql.universalHash(id, seed)} % 1000 AS DOUBLE) / 2000.0)"
    def solve(src: String, key: String) =
      s"""SELECT $key,
  ($AlsF1) AS f1, ($AlsF2) AS f2 FROM (
  SELECT $key,
    CAST(sum(${gs("f1 * f1")}) AS DOUBLE) AS a11,
    CAST(sum(${gs("f1 * f2")}) AS DOUBLE) AS a12,
    CAST(sum(${gs("f2 * f2")}) AS DOUBLE) AS a22,
    CAST(sum(${gs("r * f1")}) AS DOUBLE) AS b1,
    CAST(sum(${gs("r * f2")}) AS DOUBLE) AS b2
  FROM $src GROUP BY $key)"""
    s"""WITH inter AS MATERIALIZED (
  SELECT o.o_custkey AS u, l.l_partkey AS i, l.l_quantity AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
vi AS MATERIALIZED (
  SELECT i, ${initF("i", AlsSeedA)} AS f1, ${initF("i", AlsSeedB)} AS f2
  FROM (SELECT DISTINCT i FROM inter)),
uf AS MATERIALIZED (
  ${solve("(SELECT t.u, t.r, v.f1, v.f2 FROM inter t JOIN vi v ON t.i = v.i)", "u")}),
vf AS MATERIALIZED (
  ${solve("(SELECT t.i, t.r, x.f1, x.f2 FROM inter t JOIN uf x ON t.u = x.u)", "i")}),
half AS (
  SELECT CAST(sum(${gs("(t.r - (x.f1 * v.f1 + x.f2 * v.f2)) * (t.r - (x.f1 * v.f1 + x.f2 * v.f2))")}) AS DOUBLE) AS se, count(*) AS n
  FROM inter t JOIN uf x ON t.u = x.u JOIN vi v ON t.i = v.i),
me AS (
  SELECT CAST(sum(${gs("(t.r - (x.f1 * v.f1 + x.f2 * v.f2)) * (t.r - (x.f1 * v.f1 + x.f2 * v.f2))")}) AS DOUBLE) AS se, count(*) AS n
  FROM inter t JOIN uf x ON t.u = x.u JOIN vf v ON t.i = v.i),
cnts AS (
  SELECT count(*) AS n_interactions, count(DISTINCT u) AS n_users,
    count(DISTINCT i) AS n_items FROM inter)
SELECT c.n_interactions, c.n_users, c.n_items,
  round(sqrt(h.se / h.n), 6) AS rmse_half,
  round(sqrt(m.se / m.n), 6) AS rmse_full
FROM cnts c CROSS JOIN half h CROSS JOIN me m""".stripMargin
  }

  // --------------------------------------------------------------- q191
  /** Centered moving-average half-width for the trend pass (±12 h
    * around each hour — one diurnal period of smoothing). */
  val StlHalf = 12

  /** STL-lite seasonal decomposition — the hourly event series split
    * into trend + seasonal + residual the classical way: trend = the
    * centered ±[[StlHalf]]-hour moving average (only hours with a FULL
    * window keep a trend — edge hours are excluded, the textbook
    * rule); seasonal = the per-hour-of-day mean of the detrended
    * series; residual = what remains. Emits the 24-row seasonal
    * profile with the shared variance split (detrended vs residual)
    * and seasonal strength 1 − var(resid)/var(detrended) — q121
    * reports the strength METRIC, this exposes the decomposition
    * itself (what a forecaster or anomaly detector consumes).
    *
    * Shape for 100 TB: one partial-agged groupBy(hour) collapses the
    * corpus; every window/mean after that runs on the O(hours)
    * series. */
  def q191StlLite(spark: SparkSession, sfDir: String): DataFrame = {
    val series = Tables.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("h"))
      .groupBy(col("h")).agg(count(lit(1)).cast("double").as("y"))
    val w = Window.orderBy(col("h")).rowsBetween(-StlHalf, StlHalf)
    val trended = series
      .withColumn("trend", round(avg(col("y")).over(w), 6))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === 2 * StlHalf + 1)
      .withColumn("det", col("y") - col("trend"))
      .withColumn("hod", pmod(col("h"), lit(24L)))
    val seasonal = trended.groupBy(col("hod"))
      .agg(round(avg(col("det")), 6).as("seasonal"), count(lit(1)).as("n_obs"))
    def gq(c: Column) = round(c, 6).cast(DecimalType(38, 6))
    val stats = trended.join(broadcast(seasonal), "hod")
      .withColumn("resid", col("det") - col("seasonal"))
      .agg(count(lit(1)).as("n"), sum(gq(col("det"))).cast("double").as("sd"),
        sum(gq(col("det") * col("det"))).cast("double").as("sdd"),
        sum(gq(col("resid"))).cast("double").as("sr"),
        sum(gq(col("resid") * col("resid"))).cast("double").as("srr"))
      .select(
        round((col("sdd") - col("sd") * col("sd") / col("n")) / col("n"), 6)
          .as("var_detrended"),
        round((col("srr") - col("sr") * col("sr") / col("n")) / col("n"), 6)
          .as("var_residual"),
        round(lit(1.0) -
          ((col("srr") - col("sr") * col("sr") / col("n")) / col("n"))
          / ((col("sdd") - col("sd") * col("sd") / col("n")) / col("n")), 6)
          .as("seasonal_strength"))
    seasonal.crossJoin(broadcast(stats))
      .select(col("hod"), col("n_obs"), col("seasonal"),
        col("var_detrended"), col("var_residual"), col("seasonal_strength"))
      .orderBy(col("hod"))
  }

  val q191Sql: String =
    s"""WITH series AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1),
      |trended AS (
      |  SELECT h, y, round(avg(y) OVER win, 6) AS trend,
      |    count(*) OVER win AS nw
      |  FROM series
      |  WINDOW win AS (ORDER BY h ROWS BETWEEN $StlHalf PRECEDING AND $StlHalf FOLLOWING)),
      |det AS (
      |  SELECT h, h % 24 AS hod, y - trend AS det FROM trended
      |  WHERE nw = ${2 * StlHalf + 1}),
      |seasonal AS (
      |  SELECT hod, round(avg(det), 6) AS seasonal, count(*) AS n_obs
      |  FROM det GROUP BY hod),
      |resid AS (
      |  SELECT d.det, d.det - s.seasonal AS resid
      |  FROM det d JOIN seasonal s ON d.hod = s.hod),
      |stats AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CAST(round(det, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sd,
      |    CAST(sum(CAST(round(det * det, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sdd,
      |    CAST(sum(CAST(round(resid, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sr,
      |    CAST(sum(CAST(round(resid * resid, 6) AS DECIMAL(38,6))) AS DOUBLE) AS srr
      |  FROM resid)
      |SELECT s.hod, s.n_obs, s.seasonal,
      |  round((t.sdd - t.sd * t.sd / t.n) / t.n, 6) AS var_detrended,
      |  round((t.srr - t.sr * t.sr / t.n) / t.n, 6) AS var_residual,
      |  round(1.0 - ((t.srr - t.sr * t.sr / t.n) / t.n)
      |    / ((t.sdd - t.sd * t.sd / t.n) / t.n), 6) AS seasonal_strength
      |FROM seasonal s CROSS JOIN stats t ORDER BY s.hod""".stripMargin

  // --------------------------------------------------------------- q192
  /** PSI smoothing pseudo-count (per bin per period, kills ln(0)). */
  val PsiSmooth = 0.5

  /** Population stability index — THE model-monitoring drift metric
    * (banking/ML-ops standard): the per-user activity feature is
    * binned by the FIRST period's deciles (the trained reference), the
    * second period's population is scored against those frozen bins,
    * and PSI = Σ (p−q)·ln(p/q) with [[PsiSmooth]] pseudo-counts.
    * PSI < 0.1 is calm, 0.1–0.25 drifting, > 0.25 retrain. q82 tracks
    * token-distribution KL per source; this is its numeric-feature,
    * frozen-reference sibling. The time split is the day-range
    * midpoint — a pure function of the data both engines compute.
    *
    * Shape for 100 TB: one partial-agged groupBy(user, period), one
    * 9-value percentile aggregate broadcast back (q178's identity),
    * per-bin census over 10 keys. */
  def q192Psi(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val split = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(split))
      .select(col("user_id"), when(col("day") < col("mid"), "a").otherwise("b")
        .as("period"))
      .groupBy(col("user_id"), col("period"))
      .agg(count(lit(1)).cast("double").as("x"))
    val qs = array((1 to 9).map(i => lit(i / 10.0)): _*)
    val th = perUser.filter(col("period") === "a")
      .agg(percentile(col("x"), qs).as("t"))
    val binned = perUser.crossJoin(broadcast(th))
      .withColumn("bin",
        (1 to 9).map(i => when(col("x") > round(col("t")(i - 1), 6), 1)
          .otherwise(0)).reduce(_ + _) + 1)
    val census = binned.groupBy(col("bin"))
      .agg(sum(when(col("period") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("period") === "b", 1L).otherwise(0L)).as("n_b"))
    val tot = census.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"),
      count(lit(1)).as("nb"))
    val p = (col("n_a") + PsiSmooth) / (col("ta") + lit(PsiSmooth) * col("nb"))
    val q = (col("n_b") + PsiSmooth) / (col("tb") + lit(PsiSmooth) * col("nb"))
    val term = (p - q) * log(p / q)
    val terms = census.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_a"), col("n_b"), round(term, 6).as("psi_term"))
    val psi = terms.agg(round(sum(col("psi_term")), 6).as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_a"), col("n_b"), col("psi_term"), col("psi"))
      .orderBy(col("bin"))
  }

  val q192Sql: String =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events),
      |split AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
      |per_user AS (
      |  SELECT user_id,
      |    CASE WHEN day < (SELECT mid FROM split) THEN 'a' ELSE 'b' END AS period,
      |    CAST(count(*) AS DOUBLE) AS x
      |  FROM ev GROUP BY 1, 2),
      |th AS (
      |  SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS t
      |  FROM per_user WHERE period = 'a'),
      |binned AS (
      |  SELECT period,
      |    1 + (CASE WHEN x > round(t[1], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[2], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[3], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[4], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[5], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[6], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[7], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[8], 6) THEN 1 ELSE 0 END)
      |      + (CASE WHEN x > round(t[9], 6) THEN 1 ELSE 0 END) AS bin
      |  FROM per_user CROSS JOIN th),
      |census AS (
      |  SELECT bin,
      |    CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM binned GROUP BY bin),
      |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
      |  count(*) AS nb FROM census),
      |terms AS (
      |  SELECT bin, n_a, n_b,
      |    round(((n_a + $PsiSmooth) / (ta + $PsiSmooth * nb)
      |      - (n_b + $PsiSmooth) / (tb + $PsiSmooth * nb))
      |      * ln(((n_a + $PsiSmooth) / (ta + $PsiSmooth * nb))
      |        / ((n_b + $PsiSmooth) / (tb + $PsiSmooth * nb))), 6) AS psi_term
      |  FROM census CROSS JOIN tot),
      |psi AS (SELECT round(sum(psi_term), 6) AS psi FROM terms)
      |SELECT bin, n_a, n_b, psi_term, (SELECT psi FROM psi) AS psi
      |FROM terms ORDER BY bin""".stripMargin

  // --------------------------------------------------------------- q193
  /** TPC-H Q3 cutoff date (both filters pivot on it). */
  val ShipPrioDate = "1998-06-01"

  /** Shipping-priority query — TPC-H Q3 on this schema: revenue of
    * not-yet-shipped lineitems of BUILDING-segment orders placed
    * before [[ShipPrioDate]], grouped per order, top 10 by revenue.
    * The canonical 3-way join + filter + aggregate + TakeOrdered every
    * SQL engine is graded on; revenue sums are DECIMAL(38,6)-exact.
    *
    * Shape for 100 TB: customer⋈orders broadcasts the filtered
    * segment dimension; orders⋈lineitem shuffles on the order key
    * with both date filters PUSHED to the scans; the top 10 is a
    * TakeOrdered, never a global sort. */
  def q193ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(expr(s"o_orderdate < TIMESTAMP_NTZ '$ShipPrioDate'"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(expr(s"l_shipdate > TIMESTAMP_NTZ '$ShipPrioDate'"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev_dec"))
      .select(col("l_orderkey"), asD(col("rev_dec")).as("revenue"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
  }

  val q193Sql: String =
    s"""SELECT l.l_orderkey,
      |  round(CAST(sum(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue,
      |  epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS o_orderdate_us,
      |  o.o_orderpriority
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '$ShipPrioDate'
      |  AND l.l_shipdate > TIMESTAMP '$ShipPrioDate'
      |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q194
  /** Every k-th CSV line is deliberately corrupted in the round trip. */
  val CsvCorruptMod = 7

  /** Malformed-input audit — the ingestion-robustness behavior every
    * production loader needs: the engine writes a CSV export in which
    * every [[CsvCorruptMod]]-th row is DELIBERATELY mangled (a
    * non-numeric key), reads it back PERMISSIVE with a
    * `_corrupt_record` rescue column (the malformed row survives as
    * raw text instead of killing the job or silently vanishing), and
    * reports the per-status census: parsed vs rescued rows and the
    * value mass that survived. The oracle recomputes the expected
    * census from the source and the deterministic corruption rule —
    * the contract a rescue column must satisfy.
    *
    * Shape for 100 TB: one export pass, one PERMISSIVE scan, a 2-row
    * census; the rescue column costs nothing on well-formed rows. */
  def q194MalformedCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_q194_")
    val dir = tmp.resolve("orders_csv").toString
    // the corruption must be STRUCTURAL (wrong token count): a mere
    // type-cast failure nulls the field without flagging the record
    ord.select(
        when(pmod(col("o_orderkey"), lit(CsvCorruptMod)) === 0,
          concat_ws(",", col("o_orderkey"), col("o_totalprice"),
            lit("UNEXPECTED_TRAILING_FIELD")))
          .otherwise(concat_ws(",", col("o_orderkey"), col("o_totalprice")))
          .as("value"))
      .write.mode("overwrite").text(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    // reference EVERY schema column: CSV column pruning skips token
    // parsing for unused columns, and unparsed tokens can't flag the
    // record — a pruned read would report everything as clean
    val res = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .select(when(col("_corrupt_record").isNull, "parsed").otherwise("rescued")
        .as("status"), col("o_orderkey"), col("o_totalprice"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(pmod(col("o_orderkey"), lit(97L))).as("key_checksum"),
        asD(dsum(coalesce(col("o_totalprice"), lit(0.0)))).as("value_mass"))
      .orderBy(col("status"))
      .localCheckpoint()
    graft.Checkpoints.deferFree(res)
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    res
  }

  val q194Sql: String =
    s"""SELECT (CASE WHEN o_orderkey % $CsvCorruptMod = 0 THEN 'rescued'
      |              ELSE 'parsed' END) AS status,
      |  count(*) AS n_rows,
      |  CAST(sum(o_orderkey % 97) AS BIGINT) AS key_checksum,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 6) AS value_mass
      |FROM orders GROUP BY 1 ORDER BY status""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_path_perplexity" -> q223PathPerplexity,
    "q226_lift_table" -> q226LiftTable,
    "q192_psi" -> q192Psi,
    "q193_shipping_priority" -> q193ShippingPriority,
    "q194_malformed_csv" -> q194MalformedCsv,
    "q191_stl_lite" -> q191StlLite,
    "q189_als_sweep" -> q189AlsSweep,
    "q186_logreg" -> q186Logreg,
    "q187_stump" -> q187Stump,
    "q188_pr_curve" -> q188PrCurve,
    "q184_orc_io" -> q184OrcIo,
    "q185_ols" -> q185Ols,
    "q182_markov_attribution" -> q182MarkovAttribution,
    "q180_salt_plan" -> q180SaltPlan,
    "q181_zonemaps" -> q181Zonemaps,
    "q178_rfm" -> q178Rfm,
    "q179_schema_merge" -> q179SchemaMerge,
    "q173_forecast_backtest" -> q173ForecastBacktest,
    "q172_stream_trending" -> q172StreamTrending,
    "q168_waiting_suppliers" -> q168WaitingSuppliers,
    "q161_auc" -> q161Auc,
    "q163_fk_integrity" -> q163FkIntegrity,
    "q158_time_to_event" -> q158TimeToEvent,
    "q159_seasonal_anomaly" -> q159SeasonalAnomaly,
    "q155_ab_test" -> q155AbTest,
    "q156_calibration" -> q156Calibration,
    "q150_table_diff" -> q150TableDiff,
    "q146_window_funnel" -> q146WindowFunnel,
    "q147_lag_features" -> q147LagFeatures,
    "q148_item_similarity" -> q148ItemSimilarity,
    "q143_merge_upsert" -> q143MergeUpsert,
    "q140_join_size" -> q140JoinSize,
    "q142_stream_join" -> q142StreamJoin,
    "q137_bursts" -> q137Bursts,
    "q132_stream_dedup" -> q132StreamDedup,
    "q133_incr_agg" -> q133IncrAgg,
    "q134_crosscorr" -> q134CrossCorr,
    "q127_spearman" -> q127Spearman,
    "q128_gini" -> q128Gini,
    "q129_profile" -> q129Profile,
    "q123_unpivot" -> q123Unpivot,
    "q124_scd2" -> q124Scd2,
    "q125_attribution" -> q125Attribution,
    "q126_bloom_semijoin" -> q126BloomSemijoin,
    "q121_seasonality" -> q121Seasonality,
    "q122_csv_io" -> q122CsvIo,
    "q111_stream_sessions" -> q111StreamSessions,
    "q112_compaction" -> q112Compaction,
    "q114_winsorize" -> q114Winsorize,
    "q115_session_paths" -> q115SessionPaths,
    "q118_rank_bins" -> q118RankBins,
    "q105_concurrency" -> q105Concurrency,
    "q101_skyline" -> q101Skyline,
    "q102_basket" -> q102Basket,
    "q103_acf" -> q103Acf,
    "q93_retention" -> q93Retention,
    "q96_transitions" -> q96Transitions,
    "q85_ewma" -> q85Ewma,
    "q86_zorder" -> q86Zorder,
    "q75_skew_join" -> q75SkewJoin,
    "q76_cube" -> q76Cube,
    "q77_changepoints" -> q77Changepoints,
    "q11_pricing_summary" -> q11PricingSummary,
    "q12_top_customers" -> q12TopCustomers,
    "q13_market_share" -> q13MarketShare,
    "q14_window_rank" -> q14WindowRank,
    "q15_sessionize" -> q15Sessionize,
    "q16_tumbling_window" -> q16TumblingWindow,
    "q98_stream_window" -> q98StreamWindow,
    "q17_asof_join" -> q17AsofJoin,
    "q18_bucketed_join" -> q18BucketedJoin,
    "q19_range_join" -> q19RangeJoin,
    "q38_rollup" -> q38Rollup,
    "q52_json" -> q52Json,
    "q53_funnel" -> q53Funnel,
    "q58_partitioned_scan" -> q58PartitionedScan,
    "q59_setops" -> q59SetOps,
    "q71_sliding_window" -> q71SlidingWindow,
    "q72_dynamic_pruning" -> q72DynamicPruning,
    "q63_anomaly" -> q63Anomaly)

  val oracles: Map[String, String] = Map(
    "q223_path_perplexity" -> q223Sql,
    "q226_lift_table" -> q226Sql,
    "q192_psi" -> q192Sql,
    "q193_shipping_priority" -> q193Sql,
    "q194_malformed_csv" -> q194Sql,
    "q191_stl_lite" -> q191Sql,
    "q189_als_sweep" -> q189Sql,
    "q186_logreg" -> q186Sql,
    "q187_stump" -> q187Sql,
    "q188_pr_curve" -> q188Sql,
    "q184_orc_io" -> q184Sql,
    "q185_ols" -> q185Sql,
    "q182_markov_attribution" -> q182Sql,
    "q180_salt_plan" -> q180Sql,
    "q181_zonemaps" -> q181Sql,
    "q178_rfm" -> q178Sql,
    "q179_schema_merge" -> q179Sql,
    "q173_forecast_backtest" -> q173Sql,
    "q172_stream_trending" -> q172Sql,
    "q168_waiting_suppliers" -> q168Sql,
    "q161_auc" -> q161Sql,
    "q163_fk_integrity" -> q163Sql,
    "q158_time_to_event" -> q158Sql,
    "q159_seasonal_anomaly" -> q159Sql,
    "q155_ab_test" -> q155Sql,
    "q156_calibration" -> q156Sql,
    "q150_table_diff" -> q150Sql,
    "q146_window_funnel" -> q146Sql,
    "q147_lag_features" -> q147Sql,
    "q148_item_similarity" -> q148Sql,
    "q143_merge_upsert" -> q143Sql,
    "q140_join_size" -> q140Sql,
    "q142_stream_join" -> q142Sql,
    "q137_bursts" -> q137Sql,
    "q132_stream_dedup" -> q132Sql,
    "q133_incr_agg" -> q133Sql,
    "q134_crosscorr" -> q134Sql,
    "q127_spearman" -> q127Sql,
    "q128_gini" -> q128Sql,
    "q129_profile" -> q129Sql,
    "q123_unpivot" -> q123Sql,
    "q124_scd2" -> q124Sql,
    "q125_attribution" -> q125Sql,
    "q126_bloom_semijoin" -> q126Sql,
    "q121_seasonality" -> q121Sql,
    "q122_csv_io" -> q122Sql,
    "q111_stream_sessions" -> q111Sql,
    "q112_compaction" -> q112Sql,
    "q114_winsorize" -> q114Sql,
    "q115_session_paths" -> q115Sql,
    "q118_rank_bins" -> q118Sql,
    "q105_concurrency" -> q105Sql,
    "q101_skyline" -> q101Sql,
    "q102_basket" -> q102Sql,
    "q103_acf" -> q103Sql,
    "q93_retention" -> q93Sql,
    "q96_transitions" -> q96Sql,
    "q85_ewma" -> q85Sql,
    "q86_zorder" -> q86Sql,
    "q11_pricing_summary" -> q11Sql,
    "q12_top_customers" -> q12Sql,
    "q13_market_share" -> q13Sql,
    "q14_window_rank" -> q14Sql,
    "q15_sessionize" -> q15Sql,
    "q16_tumbling_window" -> q16Sql,
    "q98_stream_window" -> q98Sql,
    "q17_asof_join" -> q17Sql,
    "q18_bucketed_join" -> q18Sql,
    "q19_range_join" -> q19Sql,
    "q38_rollup" -> q38Sql,
    "q52_json" -> q52Sql,
    "q53_funnel" -> q53Sql,
    "q58_partitioned_scan" -> q58Sql,
    "q59_setops" -> q59Sql,
    "q71_sliding_window" -> q71Sql,
    "q72_dynamic_pruning" -> q72Sql,
    "q63_anomaly" -> q63Sql,
    "q75_skew_join" -> q75Sql,
    "q76_cube" -> q76Sql,
    "q77_changepoints" -> q77Sql)
}
