package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.text.{FeatureQueries, PipelineQueries}
import graft.queries.SpectralQueries

/** Wave-40 operators (q207–q210): windowed co-occurrence, leakage-safe
  * target encoding, Fiedler spectral bipartition, pad-batching census.
  */
class W40OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q207 co-occurrence replays the windowed pair counts on the driver") {
    val rows = FeatureQueries.q207Cooccurrence(spark, sfDir).collect()
    assert(rows.length === FeatureQueries.CoocTopK)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).split(" "))
    val vocab = docs.flatten.groupBy(identity).toSeq
      .map { case (t, xs) => (t, xs.length) }
      .sortBy { case (t, c) => (-c, t) }
      .take(FeatureQueries.CoocVocab).map(_._1).toSet
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val pairs = scala.collection.mutable.Map.empty[(String, String), (Long, BigDecimal)]
    docs.foreach { ts =>
      for {
        i <- ts.indices
        k <- 1 to FeatureQueries.CoocWindow
        if i + k < ts.length
        a = ts(i); b = ts(i + k)
        if vocab(a) && vocab(b)
      } {
        val key = if (a <= b) (a, b) else (b, a)
        val (n, w) = pairs.getOrElse(key, (0L, BigDecimal(0)))
        pairs(key) = (n + 1, w + BigDecimal(r6(1.0 / k)))
      }
    }
    val top = pairs.toSeq
      .map { case (k, (n, w)) => (k._1, k._2, n, r6(w.toDouble)) }
      .sortBy { case (a, b, _, w) => (-w, a, b) }
      .take(FeatureQueries.CoocTopK)
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      top.map(t => (t._1, t._2)))
    rows.zip(top).foreach { case (r, (_, _, n, w)) =>
      assert(r.getLong(2) === n)
      assert(math.abs(r.getDouble(3) - w) < 1e-6)
    }
  }

  test("q208 target encoding is out-of-fold exact and shrinks toward the global mean") {
    val rows = PipelineQueries.q208TargetEncoding(spark, sfDir).collect()
    val data = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), pmod(col("o_orderkey"), lit(5L)), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), BigDecimal(r.getDouble(2))))
    val gmean = (data.map(_._3).sum / data.length).toDouble
    val byCatFold = data.groupBy(d => (d._1, d._2))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet === byCatFold.keySet)
    val m = PipelineQueries.TeSmooth.toDouble
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val own = byCatFold(key)
      assert(r.getLong(2) === own.length.toLong)
      val other = data.filter(d => d._1 == key._1 && d._2 != key._2)
      val expect = (other.map(_._3).sum.toDouble + m * gmean) / (other.length + m)
      assert(math.abs(r.getDouble(3) - expect) < 1e-4, s"encoding $key")
    }
    // shrinkage sanity: every encoding lies between min and max fold means
    val ys = data.map(_._3.toDouble)
    assert(rows.forall(r => r.getDouble(3) >= ys.min && r.getDouble(3) <= ys.max))
  }

  test("q209 Fiedler: lambda2 positive, partitions cover the graph, cut below total") {
    val rows = SpectralQueries.q209Fiedler(spark, sfDir).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (1 to SpectralQueries.FiedlerRounds))
    val und = graft.graph.WebGraph.cachedHostEdges(spark, sfDir)
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nVerts = und.flatMap(e => Seq(e._1, e._2)).distinct.length.toLong
    val nEdges = und.length.toLong
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === nVerts, "partition covers all hosts")
      assert(r.getLong(5) === nEdges)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= nEdges)
      // λ₂ of a graph Laplacian is ≥ 0 and ≤ 2·max-degree (Gershgorin)
      assert(r.getDouble(1) >= -1e-6)
    }
    // both sides of the bipartition are non-trivial in the last round
    val last = rows.last
    assert(last.getLong(2) > 0 && last.getLong(3) > 0)
    Checkpoints.drain(spark)
  }

  test("q210 pad batching replays the bucket census on the driver") {
    val rows = PipelineQueries.q210PadBatching(spark, sfDir).collect()
    val lens = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " "))).collect().map(_.getInt(0).toLong)
    def bucketOf(n: Long): Long = {
      var b = 1L; while (b < n) b <<= 1; b
    }
    val expect = lens.groupBy(bucketOf).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.sum)
    }
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    val budget = PipelineQueries.BatchBudget.toLong
    rows.foreach { r =>
      val b = r.getLong(0)
      val (n, tok) = expect(b)
      assert(r.getLong(1) === n && r.getLong(2) === tok)
      assert(r.getLong(3) === n * b)
      val perBatch = math.max(budget / b, 1L)
      assert(r.getLong(4) === (n + perBatch - 1) / perBatch, s"batches bucket $b")
      assert(math.abs(r.getDouble(5) - (1.0 - tok.toDouble / (n * b))) < 1e-6)
    }
  }

  test("wave-40 plans: partial aggregation everywhere, no cartesian products") {
    Seq(
      FeatureQueries.q207Cooccurrence(spark, sfDir),
      PipelineQueries.q208TargetEncoding(spark, sfDir),
      PipelineQueries.q210PadBatching(spark, sfDir)
    ).foreach { df =>
      val plan = formatted(df)
      assert(plan.contains("partial_"), "partial aggregation present")
      assert(!plan.contains("CartesianProduct"))
    }
    Checkpoints.drain(spark)
  }
}
