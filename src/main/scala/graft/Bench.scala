package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing FULL materialization through the noop
  * sink (a bare count() would let Catalyst prune the expensive
  * projection columns). Failures are reported in an "errors" object and
  * EXCLUDED from timings — a broken query can never improve the total.
  * Prints exactly one JSON line.
  *
  * Two timing regimes are reported side by side:
  *
  *  - **cold** (`cold_queries` / `total_cold`): min of RUNS (default 2)
  *    per query with SessionCache.clear before EVERY run — every run
  *    pays the query's own one-time builds (edge derivation, rank loop,
  *    minhash signatures), and the min strips co-tenant load spikes.
  *    The r4 single-run cold pass produced a 5.7× noise-inflated
  *    artifact on this shared host (709s driver vs 103.5s isolated,
  *    same config); a min-of-N of STRUCTURALLY cold runs keeps the
  *    "nothing hidden behind a memo" honesty while making the total
  *    reproducible. This is the number a round-over-round or
  *    cross-engine comparison of TOTALS should use.
  *  - **warm** (`queries` / `value`): min of RUNS (default 2) with
  *    session memos retained across queries and runs, as in a real
  *    analytics session running the whole suite — the marginal cost of
  *    each query once shared inputs exist. q01/q10 read the memoized
  *    rank output here; q02 (full TrustRank loop) and q34 (GraphX, no
  *    memo) remain full-loop timings in both regimes.
  *
  * A third regime publishes itself only when needed: any query whose
  * in-suite warm min exceeds 1.5× its own cold min (the block-residency
  * inversion artifact — q79/q136 history) is automatically re-measured
  * isolated and reported as `isolated_warm` in the full artifact
  * (`n_inverted` in the compact line).
  *
  * Env knobs: SPARK_GRAFT_ONLY=q23_ngram_jaccard,q32_ivf_knn restricts
  * the query set (isolated re-measurement on a noisy host);
  * SPARK_GRAFT_RUNS=3 raises the min-of-N (both regimes); SPARK_GRAFT_COLD=0
  * skips the cold pass; SPARK_GRAFT_METRICS=1 adds per-query shuffle
  * write volume (`shuffle_mb`, first warm run) — the number that
  * decides whether an operator survives a 100× scale-up.
  */
object Bench {

  /** Sums shuffle-write bytes across completed stages. */
  private final class ShuffleMeter extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      bytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val doCold = sys.env.getOrElse("SPARK_GRAFT_COLD", "1") != "0"
    val doMetrics = sys.env.getOrElse("SPARK_GRAFT_METRICS", "0") == "1"
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    def once(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${esc(String.valueOf(e.getMessage)).take(200)}")
      } finally Checkpoints.drain(spark) // session stays block-clean per run
    }

    // Cold pass: memos dropped before every RUN, so each timing includes
    // the query's own one-time builds; min-of-runs strips host noise
    // (each run is structurally identical — same builds, same plan).
    val cold = if (doCold) names.map { n =>
      val rs = (1 to runs).map { _ =>
        SessionCache.clear(spark)
        once(n)
      }
      val oks = rs.collect { case Right(t) => t }
      n -> (if (oks.nonEmpty) Right(oks.min) else rs.head)
    } else Seq.empty
    if (doCold) SessionCache.clear(spark) // warm pass starts from scratch

    // Warm pass: min of `runs` per query with memos retained — strips
    // first-run codegen/JIT warmup and external-load spikes (this
    // harness shares its host); the min is the query's structural
    // marginal cost.
    val meter = new ShuffleMeter
    if (doMetrics) spark.sparkContext.addSparkListener(meter)
    val shuffleMb = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val results = names.map { name =>
      val before = if (doMetrics) { Thread.sleep(200); meter.bytes.get() } else 0L
      val first = once(name)
      if (doMetrics) { // listener events drain async; settle briefly
        // FIRST warm run only: later runs read session memos and would
        // average the build volume away
        Thread.sleep(200)
        shuffleMb(name) = (meter.bytes.get() - before) / 1048576.0
      }
      val rs = first +: (2 to runs).map(_ => once(name))
      val oks = rs.collect { case Right(t) => t }
      name -> (if (oks.nonEmpty) Right(oks.min) else rs.head)
    }

    // Self-diagnosing warm>cold inversion (r9): inside the full suite,
    // ~200 queries of accumulated block residency ahead of a late heavy
    // loop can inflate its in-suite warm timing past its own cold cost
    // (q79 in r6/r8, q136 in r8 — every time an artifact, never a plan
    // defect, but every time re-litigated by hand). Any query whose
    // in-suite warm min exceeds 1.5x its cold min is now automatically
    // re-measured ISOLATED — memos cleared, one warm-up run to rebuild
    // its own memos, then min-of-RUNS — and published as
    // `isolated_warm` in the artifact, so the inversion class carries
    // its own counter-measurement instead of a verdict debt.
    val coldOk = cold.collect { case (n, Right(t)) => n -> t }.toMap
    val inverted = results.collect {
      case (n, Right(t)) if coldOk.get(n).exists(c => t > 1.5 * c) => n
    }
    val isolated = inverted.map { n =>
      SessionCache.clear(spark)
      once(n) // warm-up: rebuild this query's own memos only
      val rs = (1 to runs).map(_ => once(n))
      val oks = rs.collect { case Right(t) => t }
      n -> (if (oks.nonEmpty) Right(oks.min) else rs.head)
    }

    def obj(xs: Seq[(String, Either[String, Double])]): (String, Double, Int) = {
      val ok = xs.collect { case (n, Right(t)) => n -> t }
      (ok.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"),
        ok.map(_._2).sum, ok.size)
    }
    val (qs, total, nOk) = obj(results)
    val (cqs, coldTotal, _) = obj(cold)
    // cold failures keyed distinctly: a query can fail cold yet succeed
    // warm (it stays in `queries`; the cold error is still reported),
    // and duplicate JSON keys would make n_err disagree with the parsed
    // object.
    val errs = results.collect { case (n, Left(m)) => n -> m } ++
      cold.collect { case (n, Left(m)) => s"$n (cold)" -> m }
    val es = errs.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val coldPart = if (doCold) s""""cold_queries":$cqs,"total_cold":$coldTotal,""" else ""
    val (isoQs, _, _) = obj(isolated)
    val isoPart = if (isolated.nonEmpty) s""""isolated_warm":$isoQs,""" else ""
    val metricsPart = if (doMetrics)
      shuffleMb.map { case (k, v) => s""""$k":${math.round(v * 100) / 100.0}""" }
        .mkString(""""shuffle_mb":{""", ",", "},")
    else ""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$coldPart$isoPart$metricsPart"errors":$es,"n_ok":$nOk,"n_err":${errs.size},"sf":"$sfDir"}"""
    // Durability: the harness keeps only the LAST ~2000 chars of the log.
    // r6 lost the warm section to shutdown WARN spew; r7 quieted the
    // shutdown but the full line itself (warm + cold maps × 107 queries at
    // nanosecond precision, ~7 KB) no longer fits the window, so the head
    // of the JSON was cut and the artifact still parsed as null. The
    // contract line on stdout is therefore a COMPACT form sized to the
    // window: keys shortened to their unique "qNN" prefix, timings at
    // centisecond precision, cold pass reduced to its total. The
    // full-fidelity line (full names, full precision, per-query cold map,
    // shuffle metrics) goes to the file named in its "full" field.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/last_bench.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // file write is best-effort; stdout is the contract
    def r2(v: Double): Double = math.round(v * 100) / 100.0
    val shortUnique = names.map(_.takeWhile(_ != '_')).distinct.size == names.size
    def key(n: String): String = if (shortUnique) n.takeWhile(_ != '_') else n
    // The harness window keeps ~2000 log chars and sbt appends its own
    // "[success] Total time" line after ours, so the compact line must
    // stay under ~1800 chars AS THE SUITE GROWS. If the full per-query
    // map would overflow, keep the slowest queries (the ones a perf
    // comparison needs) up to the budget and say how many were dropped;
    // the file artifact always has everything.
    val entries = results.collect { case (n, Right(t)) => (t, s""""${key(n)}":${r2(t)}""") }
      .sortBy(-_._1)
    val fullLen = entries.map(_._2.length + 1).sum
    val budget = 1450 // chars for the queries map body; wrapper+errors ~200
    val (kept2, dropped) =
      if (fullLen <= budget) (entries, 0)
      else {
        var acc = 0
        val k = entries.takeWhile { e => acc += e._2.length + 1; acc <= budget }
        (k, entries.size - k.size)
      }
    val qsCompact = kept2.map(_._2).mkString("{", ",", "}")
    val omitted = if (dropped > 0) s""""queries_omitted":$dropped,""" else ""
    val coldCompact = if (doCold) s""""total_cold":${r2(coldTotal)},""" else ""
    val isoCompact = if (isolated.nonEmpty) s""""n_inverted":${isolated.size},""" else ""
    val compact = s"""{"metric":"total","value":${r2(total)},"unit":"sec","queries":$qsCompact,$omitted$coldCompact$isoCompact"errors":$es,"n_ok":$nOk,"n_err":${errs.size},"sf":"$sfDir","full":"$outPath"}"""
    spark.sparkContext.setLogLevel("ERROR")
    println(compact)
    spark.stop()
  }
}
