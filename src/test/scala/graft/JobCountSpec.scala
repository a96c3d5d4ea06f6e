package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Counts Spark jobs launched by a block of driver code, with a settle
  * loop after the action so async listener delivery can't undercount. */
object JobMeter {
  private val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile private var installed = false

  private def install(spark: SparkSession): Unit = synchronized {
    if (!installed) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
      installed = true
    }
  }

  private def settled(): Long = {
    var prev = -1L; var cur = jobs.get(); var spins = 0
    while (cur != prev && spins < 40) {
      prev = cur; Thread.sleep(150); cur = jobs.get(); spins += 1
    }
    cur
  }

  def measure(spark: SparkSession)(body: => Unit): Long = {
    install(spark)
    val before = settled()
    body
    settled() - before
  }
}

/** Job-count audit for the iterative loops: the marginal jobs PER
  * ROUND are pinned exactly (measured as a delta between two round
  * budgets of the same engine call, so one-time setup cancels out),
  * and the end-to-end driver rows get absolute ceilings. Each extra
  * job per round is a full scheduler round-trip that multiplies at
  * 100 TB — a regression from 1 to 2 jobs/step doubles the loop's
  * fixed cost and trips these exactly.
  */
class JobCountSpec extends GraftSpec {

  private def jobsOf(body: => org.apache.spark.sql.DataFrame): Long = {
    SessionCache.clear(spark)
    val n = JobMeter.measure(spark) {
      body.write.format("noop").mode("overwrite").save()
    }
    Checkpoints.drain(spark)
    n
  }

  test("GraphX rank loop: exactly ONE job per additional iteration (the r5 property)") {
    val edges = graph.WebGraph.cachedEdges(spark, sfDir)
    edges.count() // edge memo built outside both measurements
    def jobsAt(iters: Int): Long = {
      val n = JobMeter.measure(spark) {
        graph.GraphXLinkRank.run(spark, edges, iters = iters)
          .write.format("noop").mode("overwrite").save()
      }
      Checkpoints.drain(spark)
      n
    }
    val j3 = jobsAt(3)
    val j9 = jobsAt(9)
    info(s"graphx jobs: iters=3 -> $j3, iters=9 -> $j9")
    assert(j9 - j3 == 6L,
      s"marginal cost must be exactly 1 job/iteration, got ${(j9 - j3) / 6.0}")
    SessionCache.clear(spark)
  }

  test("DataFrame rank loop: fixed marginal jobs per additional iteration") {
    val edges = graph.WebGraph.cachedEdges(spark, sfDir)
    val init = graph.LinkRank.uniformInit(edges)
    edges.count()
    def jobsAt(iters: Int): Long = {
      val n = JobMeter.measure(spark) {
        graph.LinkRank.run(spark, edges, init, iters = iters)
          .write.format("noop").mode("overwrite").save()
      }
      Checkpoints.drain(spark)
      n
    }
    val j3 = jobsAt(3)
    val j9 = jobsAt(9)
    info(s"dataframe jobs: iters=3 -> $j3, iters=9 -> $j9")
    // 7 = the round's ONE localCheckpoint action decomposed by AQE into
    // stage-jobs (dangling agg exchange, its broadcast build, the
    // contribution shuffle, final stage, ...) — pipelined pieces of a
    // single pass, not extra passes. Probed: AQE off runs the same
    // round in 3 jobs at identical wall time; AQE stays on because its
    // runtime skew-splitting is the 100 TB posture. Pinned exactly so
    // a real extra pass (say a second scalar collect per round) trips
    // this at 8/round.
    assert(j9 - j3 == 7L * 6L,
      s"marginal cost must stay at 7 AQE stage-jobs/iteration, got ${(j9 - j3) / 6.0}")
    SessionCache.clear(spark)
  }

  // Absolute ceilings for the multi-round driver rows: measured-at-pin
  // (35 / 35 / 65 at sf0.001) + headroom for fixture drift, far below
  // the 2x that a jobs-per-round regression would cost.
  test("q66 connected components: bounded total jobs") {
    assert(jobsOf(SparkEntry.queries("q66_components")(spark, sfDir)) <= 45)
  }

  test("q69 BFS: bounded total jobs") {
    assert(jobsOf(SparkEntry.queries("q69_bfs_reach")(spark, sfDir)) <= 45)
  }

  test("q89 k-core: bounded total jobs") {
    assert(jobsOf(SparkEntry.queries("q89_kcore")(spark, sfDir)) <= 80)
  }
}
