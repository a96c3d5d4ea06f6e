package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.text.PipelineQueries

/** Wave-39 operators (q203–q206): sequence packing, the composed
  * quality gate, power-iteration PCA, shard-parity audit. Each is
  * replayed independently on the driver.
  */
class W39OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q203 packing replays the per-source concat-and-cut on the driver") {
    val rows = PipelineQueries.q203SeqPacking(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    assert(rows.length === docs.length)
    val n = PipelineQueries.PackLen.toLong
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).toSeq.map { case (id, _, t) =>
        val start = cum; cum += t
        id -> ((t, start / n, (cum - 1) / n))
      }
    }.toMap
    rows.foreach { r =>
      val (t, fp, lp) = expect(r.getLong(0))
      assert(r.getLong(2) === t, s"tokens doc ${r.getLong(0)}")
      assert(r.getLong(3) === fp && r.getLong(4) === lp, s"packs doc ${r.getLong(0)}")
      assert(r.getLong(5) === lp - fp + 1)
      assert(r.getInt(6) === (if (lp > fp) 1 else 0))
    }
    // packing conservation within a source: pack count ≈ token mass / N
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val tokens = ds.map(_._3).sum
      val maxPack = rows.filter(_.getString(1) == src).map(_.getLong(4)).max
      assert(maxPack === (tokens - 1) / n, s"last pack of $src")
    }
  }

  test("q204 quality-gate funnel replays rule-by-rule on the driver") {
    val rows = PipelineQueries.q204QualityGate(spark, sfDir).collect()
    val stopAll = (graft.text.TextQueries.StopEn ++ graft.text.TextQueries.StopEs ++
      graft.text.TextQueries.StopFr ++ graft.text.TextQueries.StopDe).toSet
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val rules = ds.map { case (_, text) =>
        val w = text.split(" ")
        val nW = w.length
        val avgWl = (text.length - (nW - 1)).toDouble / nW
        val stopR = w.count(t => stopAll(t)).toDouble / nW
        val divR = w.distinct.length.toDouble / nW
        (nW >= PipelineQueries.GateMinWords && nW <= PipelineQueries.GateMaxWords,
          stopR >= PipelineQueries.GateMinStop,
          avgWl >= PipelineQueries.GateMinWl && avgWl <= PipelineQueries.GateMaxWl,
          divR >= PipelineQueries.GateMinDistinct)
      }
      src -> (ds.length.toLong, rules.count(_._1).toLong, rules.count(_._2).toLong,
        rules.count(_._3).toLong, rules.count(_._4).toLong,
        rules.count(r => r._1 && r._2 && r._3 && r._4).toLong)
    }
    assert(rows.map(_.getString(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (n, pl, ps, pw, pd, keep) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === pl && r.getLong(3) === ps)
      assert(r.getLong(4) === pw && r.getLong(5) === pd && r.getLong(6) === keep)
      assert(math.abs(r.getDouble(7) - keep.toDouble / n) < 1e-6)
    }
  }

  test("q205 power iteration: Rayleigh estimates are positive, bounded by trace, and non-decreasing") {
    val rows = PipelineQueries.q205PcaPower(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (1 to PipelineQueries.PcaRounds))
    val lambdas = rows.map(_.getDouble(1))
    assert(lambdas.forall(_ > 0))
    // power iteration's Rayleigh quotient is monotone non-decreasing
    assert(lambdas.zip(lambdas.tail).forall { case (a, b) => b >= a - 1e-9 },
      s"rayleigh must not decrease: ${lambdas.toSeq}")
    // explained share = λ/trace ∈ (0, 1]
    assert(rows.map(_.getDouble(2)).forall(s => s > 0 && s <= 1))
    Checkpoints.drain(spark)
  }

  test("q205 matvec joins broadcast the O(d) vector frame") {
    val plan = formatted(PipelineQueries.q205PcaPower(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), "v joins broadcast")
    assert(!plan.contains("CartesianProduct"))
    Checkpoints.drain(spark)
  }

  test("q206 shard parity replays the hash assignment and balances within 4x") {
    val rows = PipelineQueries.q206ShardParity(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= PipelineQueries.NShards)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), size(split(col("text"), " ")))
      .collect()
      .map(r => (h32(r.getLong(0).toString) % PipelineQueries.NShards,
        r.getString(1), r.getInt(2).toLong))
    val byShard = docs.groupBy(_._1)
    assert(rows.map(_.getLong(0)).toSet === byShard.keySet)
    rows.foreach { r =>
      val ds = byShard(r.getLong(0))
      assert(r.getLong(1) === ds.length.toLong)
      assert(r.getLong(2) === ds.map(_._3).sum)
      val langCounts = ds.groupBy(_._2).map(_._2.length.toLong)
      assert(r.getLong(3) === langCounts.size.toLong)
      assert(math.abs(r.getDouble(4) - langCounts.max.toDouble / ds.length) < 1e-6)
    }
    // hash sharding balances doc counts (loose 4x bound on the fixture)
    val counts = rows.map(_.getLong(1))
    assert(counts.max <= 4 * counts.min, s"shard skew: ${counts.toSeq}")
  }
}
