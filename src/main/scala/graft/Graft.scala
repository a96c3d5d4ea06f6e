package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Public facade: the library surface in one import, operating on the
  * CALLER's DataFrames (any schema — pass columns in). The fixture
  * queries under graft.queries are the driver-verified instantiations
  * of these operators over the test tables; this object is what an
  * application (or a giranking migration) calls.
  *
  * Column functions require a session built by [[GraftSession]] (or
  * any session with `spark.sql.extensions=graft.plans.GraftExtensions`)
  * so the compiled graft_* kernels resolve.
  */
object Graft {

  // ------------------------------------------------------------- graph
  /** LinkRank over (src, dst) string edges, uniform-1.0 init —
    * giranking's LinkRankComputation with its default inputs.
    * @param tol when set, halt once max|v'−v| < tol (budget `iters`). */
  def linkRank(spark: SparkSession, edges: DataFrame,
               iters: Int = 9, tol: Option[Double] = None): DataFrame =
    graph.LinkRank.run(spark, edges, graph.LinkRank.uniformInit(edges),
      iters = iters, tol = tol)

  /** TrustRank: `init(id, score)` rows with score ≈ 1.0 are the trusted
    * seeds; dangling mass flows only to them. */
  def trustRank(spark: SparkSession, edges: DataFrame, init: DataFrame,
                iters: Int = 9, tol: Option[Double] = None): DataFrame =
    graph.LinkRank.run(spark, edges, init, iters = iters,
      trustedMode = true, tol = tol)

  /** HostRank: page edges projected to their hosts, then LinkRank. */
  def hostRank(spark: SparkSession, pageEdges: DataFrame): DataFrame = {
    val hedges = graph.WebGraph.hostEdges(pageEdges)
    graph.LinkRank.run(spark, hedges, graph.LinkRank.uniformInit(hedges))
  }

  /** LinkRank through the GraphX Pregel-style backend (same answers). */
  def linkRankGraphX(spark: SparkSession, edges: DataFrame): DataFrame =
    graph.GraphXLinkRank.run(spark, edges)

  /** removeDuplicateLinks: trim, strip #fragment, drop self-links,
    * distinct — giranking's edge cleanup. */
  def dedupLinks(rawEdges: DataFrame): DataFrame =
    graph.WebGraph.dedupEdges(rawEdges)

  // ------------------------------------------- text kernels (Columns)
  /** Winnowing fingerprint summary of a text column:
    * struct(n_fingerprints, min_fp, max_fp). Compiled, map-only. */
  def winnowFingerprint(text: Column): Column =
    call_function("graft_winnow", text)

  /** 12-value MinHash signature (array<long>) of a text column. */
  def minhashSignature(text: Column): Column =
    call_function("graft_minhash", text)

  /** Sorted distinct trigram-shingle hash set (array<long>). */
  def shingleSet(text: Column): Column =
    call_function("graft_shingle_set", text)

  /** |a ∩ b| of two sorted long arrays (e.g. [[shingleSet]] outputs). */
  def intersectCount(a: Column, b: Column): Column =
    call_function("graft_intersect_count", a, b)

  /** Exact Jaccard similarity of two shingle sets. */
  def jaccard(a: Column, b: Column): Column = {
    val i = intersectCount(a, b)
    i.cast("double") / (size(a) + size(b) - i).cast("double")
  }

  /** 64-bit SimHash as struct(simlo, simhi) — two 32-bit halves. */
  def simhash(text: Column): Column = call_function("graft_simhash", text)

  /** Highest-frequency bigram stats: struct(mx, tot). */
  def topBigram(text: Column): Column = call_function("graft_top_bigram", text)

  // ---------------------------------------------- vectors (Columns)
  /** Compiled dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column = VF.dot(a, b)

  /** Cosine similarity (compiled dot + norms). */
  def cosine(a: Column, b: Column): Column = VF.cosine(a, b)

  /** Squared L2 distance (compiled). */
  def dist2(a: Column, b: Column): Column = VF.dist2(a, b)

  /** bits-bit random-hyperplane LSH code of an array<double> column. */
  def lshCode(v: Column, dims: Int, bits: Int, planeOffset: Int = 0): Column =
    VF.lshCode(v, dims, bits, planeOffset)

  // ------------------------------------------ operators (DataFrames)
  /** Exact dedup of `df` on a fingerprint expression: adds
    * `canonical_id` (min of `idCol` per fingerprint) and `is_dup`. */
  def dedupExact(df: DataFrame, idCol: Column, fp: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(fp)
    df.withColumn("canonical_id", min(idCol).over(w))
      .withColumn("is_dup", idCol =!= col("canonical_id"))
  }

  /** Skew-safe sum+count of `value` per `key` (two-stage salted agg). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame =
    operators.Salting.saltedSumCount(df, key, value, salts)

  /** Deterministic hash sampling: keep rows whose stable-id bucket
    * (0-99) falls under `ratePct` — reproducible across runs/engines. */
  def hashSample(df: DataFrame, id: Column, ratePct: Column): DataFrame =
    df.filter(pmod(functions.MathFunctions.universalHash(id, 3), lit(100)) < ratePct)

  // -------------------------------------------------- streaming
  /** Streaming exact dedup with bounded state (watermark horizon). */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    streaming.StreamingWindows.dedupStream(docs, watermarkDelay)
}
