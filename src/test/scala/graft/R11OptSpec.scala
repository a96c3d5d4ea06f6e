package graft

/** r11 optimization-round contracts:
  *  - Tables.load spreads single-row-group FACT scans to session
  *    parallelism (the driver fixtures are one row group per file, so
  *    the scan alone cannot parallelize) and leaves dimension tables
  *    un-spread;
  *  - the spread is transparent to predicate pushdown (filters still
  *    reach the parquet scan through the Repartition);
  *  - TempDirs.ephemeral yields a writable per-run scratch dir and
  *    prefers tmpfs when the host has one.
  */
class R11OptSpec extends GraftSpec {

  test("fact scans spread to defaultParallelism; dimensions untouched") {
    val p = spark.sparkContext.defaultParallelism
    assert(Tables.lineitem(spark, sfDir).rdd.getNumPartitions >= p,
      "single-row-group lineitem scan must be spread to session parallelism")
    assert(Tables.documents(spark, sfDir).rdd.getNumPartitions >= p,
      "single-row-group documents scan must be spread to session parallelism")
    assert(Tables.nation(spark, sfDir).rdd.getNumPartitions < p ||
      Tables.nation(spark, sfDir).queryExecution.executedPlan.toString
        .contains("Scan parquet"),
      "dimension tables are not spread (they ride broadcasts)")
    val nationPlan = Tables.nation(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!nationPlan.toLowerCase.contains("roundrobin"),
      "nation must not carry the spread exchange")
  }

  test("pushdown and pruning survive the spread exchange") {
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 40).select(col("l_orderkey"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity,40"),
      s"quantity filter must reach the scan through Repartition:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_comment"),
      "column pruning must reach the scan through Repartition")
  }

  test("TempDirs.ephemeral is writable and prefers tmpfs when present") {
    val d = TempDirs.ephemeral("graft_spec_")
    try {
      val f = d.resolve("probe")
      java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
      assert(java.nio.file.Files.size(f) == 3)
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")) &&
        java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")) &&
        sys.env.get("SPARK_GRAFT_TMPDIR").isEmpty)
        assert(d.startsWith("/dev/shm"), s"expected tmpfs scratch dir, got $d")
    } finally {
      java.nio.file.Files.deleteIfExists(d.resolve("probe"))
      java.nio.file.Files.deleteIfExists(d)
    }
  }
}
