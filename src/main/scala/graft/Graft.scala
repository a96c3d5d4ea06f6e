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
  *
  * Lifecycle: the iterative operators (rank family, [[kmeans]],
  * [[minhashPairs]]) cache/checkpoint intermediate frames whose blocks
  * stay live until the CALLER's action finishes — call [[drain]] after
  * consuming each result in a long-lived session, or the block manager
  * accumulates one orphaned set per call.
  */
object Graft {

  /** Release the deferred caches/checkpoints of every Graft call made
    * on `spark` since the last drain. Call AFTER the action that
    * consumes the returned DataFrame (the blocks are inputs to it). */
  def drain(spark: SparkSession): Unit = Checkpoints.drain(spark)

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

  /** Warm-start / incremental LinkRank: RAW (pre-normalization) damped
    * scores with convergence halting, plus the round count actually
    * run. Feed a previous result back as `init` after an edge delta —
    * the loop starts near the new fixed point and halts in far fewer
    * rounds than a cold uniform start (don't re-rank a 100 TB graph
    * from scratch because one crawl batch landed). Apply
    * [[linkRank]]-style normalization downstream if display scores are
    * needed; keep the raw frame as the next delta's init. */
  def linkRankIncremental(spark: SparkSession, edges: DataFrame,
                          init: DataFrame, iters: Int = 60,
                          tol: Double = 1e-8): (DataFrame, Int) =
    graph.LinkRank.runCounted(spark, edges, init, iters = iters,
      tol = Some(tol), normalize = false)

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

  /** All nBands band codes (array<long>) in one compiled pass — the
    * multi-band LSH emission for banded dedup/ANN blocking. */
  def lshBands(v: Column, dims: Int, bits: Int, nBands: Int): Column =
    VF.lshBands(v, dims, bits, nBands)

  // ------------------------------------------ operators (DataFrames)
  /** Exact dedup of `df` on a fingerprint expression: adds
    * `canonical_id` (min of `idCol` per fingerprint) and `is_dup`. */
  def dedupExact(df: DataFrame, idCol: Column, fp: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(fp)
    df.withColumn("canonical_id", min(idCol).over(w))
      .withColumn("is_dup", idCol =!= col("canonical_id"))
  }

  /** TF-IDF top-k terms per document over any (id, text) frame:
    * (doc_id, term, rank, tfidf) with smoothed ln IDF. Aggregated-rows
    * joins only; the per-doc top-k compiles to WindowGroupLimit. The
    * score is round(6)-gridded before ranking (engine-stable order). */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column,
                    k: Int = 3): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val tok = base.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // df from tf, not a second corpus tokenization: tf has one row per
    // (doc, term), so its per-term row count IS the document frequency
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = base.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(idf, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"), col("tfidf"))
  }

  /** Skew-safe sum+count of `value` per `key` (two-stage salted agg). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     salts: Int = 16): DataFrame =
    operators.Salting.saltedSumCount(df, key, value, salts)

  /** Okapi BM25 top-k documents per query term over any (id, text)
    * frame: (term, doc_id, rank, score). One corpus tokenization (dl
    * and df both derive from the tf frame); (N, Σdl) ride a broadcast
    * 1-row aggregate; score round(6)-gridded before ranking. */
  def bm25(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val tok = base.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val dlNorm = col("dl").cast("double") * col("n").cast("double") / col("sumdl").cast("double")
    val tfNorm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    tf.filter(col("term").isin(terms: _*))
      .join(df, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("term"), col("doc_id"), round(idf * tfNorm, 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("term"), col("doc_id"), col("rank"), col("score"))
  }

  /** Deterministic weighted sampling without replacement (A-ES) over
    * any (id, weight) frame: the top-`k` rows per `stratum` by key
    * ln(u)/w with u a pure hash of the id — P(selected) follows the
    * weight, reproducible across runs and engines. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
                     stratum: Column, k: Int): DataFrame = {
    val u = (functions.MathFunctions.universalHash(id, 5) + lit(1))
      .cast("double") / lit(2147483647.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__stratum")).orderBy(col("key").desc, col("__id"))
    df.withColumn("__id", id).withColumn("__stratum", stratum)
      .withColumn("key", round(log(u) / weight, 6) + lit(0.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__id", "__stratum")
  }

  /** 64-bit perceptual hash (aHash) of a text-backed payload as
    * [lo, hi] 32-bit halves; empty array when under 64 code points
    * (see plans.PhashMath). */
  def phash(payload: Column): Column = call_function("graft_phash", payload)

  /** Deterministic hash sampling: keep rows whose stable-id bucket
    * (0-99) falls under `ratePct` — reproducible across runs/engines. */
  def hashSample(df: DataFrame, id: Column, ratePct: Column): DataFrame =
    df.filter(pmod(functions.MathFunctions.universalHash(id, 3), lit(100)) < ratePct)

  /** MinHash-LSH near-duplicate pairs over any (id, text) frame:
    * (da, db, est_jaccard) for band-colliding pairs — compiled
    * signatures, band-bucket equi-join, never O(n²). */
  def minhashPairs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.dedup.DedupQueries.{K, bands, candidates}
    // the signature scan feeds the band join AND both pair sides —
    // cache it once (freed at the caller's next drain)
    val sigs = Checkpoints.deferUnpersist(docs
      .select(id.as("doc_id"), minhashSignature(text).as("mhs"))
      .select(col("doc_id") +:
        (0 until K).map(j => element_at(col("mhs"), j + 1).as(s"mh$j")): _*)
      .cache())
    val cand = candidates(bands(sigs))
    val sa = sigs.toDF("da" +: (0 until K).map(j => s"a$j"): _*)
    val sb = sigs.toDF("db" +: (0 until K).map(j => s"b$j"): _*)
    val matches = (0 until K)
      .map(j => when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "da").join(sb, "db")
      .select(col("da"), col("db"),
        (matches.cast("double") / K).as("est_jaccard"))
  }

  /** Benchmark decontamination over caller frames: score every training
    * document's 3-gram-shingle overlap against the union shingle set of
    * a held-out benchmark frame. Returns (doc_id, n_shingles, n_overlap,
    * overlap_frac, contaminated). Map-only over the training side — the
    * benchmark set is broadcast, guarded by `maxBenchShingles` (an
    * oversized slice fails loudly instead of OOMing; see
    * DedupQueries.benchUnionSet). */
  def decontaminate(train: DataFrame, id: Column, text: Column,
                    bench: DataFrame, benchText: Column,
                    maxBenchShingles: Long = dedup.DedupQueries.MaxBenchShingles): DataFrame =
    dedup.DedupQueries.decontaminateSets(
      train.select(id.as("doc_id"), shingleSet(text).as("s")),
      bench.select(shingleSet(benchText).as("s")),
      maxBenchShingles)

  /** [[decontaminate]] for a benchmark too large to broadcast: the
    * exploded training shingles equi-join the benchmark's distinct hash
    * set — identical output, no size cap, at the price of shuffling the
    * training corpus's shingles. */
  def decontaminateJoin(train: DataFrame, id: Column, text: Column,
                        bench: DataFrame, benchText: Column): DataFrame =
    dedup.DedupQueries.decontaminateJoinSets(
      train.select(id.as("doc_id"), shingleSet(text).as("s")),
      bench.select(shingleSet(benchText).as("s")))

  /** [[decontaminate]] through a fixed-size Bloom sketch: the
    * broadcast is `numBits` bits regardless of benchmark size and the
    * training side stays map-only. No false negatives — the flagged
    * set is a conservative superset of the exact one (false positives
    * at the sketch's fpp inflate overlap counts slightly). */
  def decontaminateBloom(train: DataFrame, id: Column, text: Column,
                         bench: DataFrame, benchText: Column,
                         numBits: Long = 8L << 20): DataFrame =
    dedup.DedupQueries.decontaminateBloomSets(
      train.select(id.as("doc_id"), shingleSet(text).as("s")),
      bench.select(shingleSet(benchText).as("s")), numBits)

  /** Per-vertex triangle count + local clustering coefficient over any
    * (src, dst) edge frame — oriented a<b<c enumeration. Defaults to
    * the any-size shuffle-join plan; pass `broadcastEdges = true` only
    * for a known-bounded edge set (see graph.Triangles). */
  def triangles(edges: DataFrame, src: Column, dst: Column,
                broadcastEdges: Boolean = false): DataFrame =
    graph.Triangles.run(edges.select(src.as("src"), dst.as("dst")), broadcastEdges)

  /** Connected components over any (src, dst) edge frame: (id,
    * component) with component = the minimum id reachable over
    * undirected paths — the transitive-grouping primitive behind
    * near-dup cluster canonicalization (q25), on a caller schema.
    * Convergence-stopped min-label propagation, one checkpointed label
    * snapshot live at a time (see graph.ConnectedComponents). */
  def connectedComponents(edges: DataFrame, src: Column, dst: Column,
                          maxIters: Int = 20): DataFrame =
    graph.ConnectedComponents.run(
      edges.select(src.as("src"), dst.as("dst")), maxIters)

  /** Multi-source BFS hop distances over any directed (src, dst) edge
    * frame: (id, dist), dist = NULL when no seed reaches the vertex
    * within `maxIters` hops. Convergence-stopped min-propagation, one
    * checkpointed snapshot live at a time (see graph.Bfs). */
  def bfs(edges: DataFrame, src: Column, dst: Column,
          seeds: DataFrame, seedId: Column, maxIters: Int = 20): DataFrame = {
    val e = edges.select(src.as("src"), dst.as("dst"))
    graph.Bfs.run(e, graph.WebGraph.vertices(e),
      seeds.select(seedId.as("id")), maxIters)
  }

  /** k-core decomposition by iterative peeling — edges are treated as
    * undirected; returns (id, in_core, core_deg) for every vertex.
    * See [[graph.KCore]]. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
            maxIters: Int = 20): DataFrame = {
    val e = edges.select(src.as("src"), dst.as("dst"))
    val und = e.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(e.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct()
    graph.KCore.run(und, k, maxIters)
  }

  /** Multi-source weighted shortest paths (Bellman–Ford relaxation)
    * over `(src, dst, weight)` edges following edge direction; weights
    * must be non-negative. Returns (id, cost), cost NULL if unreached
    * within `maxIters` relaxation rounds. See [[graph.Sssp]]. */
  def shortestPaths(edges: DataFrame, src: Column, dst: Column, weight: Column,
                    seeds: DataFrame, seedId: Column, maxIters: Int = 20): DataFrame = {
    val e = edges.select(src.as("src"), dst.as("dst"), weight.as("w"))
    graph.Sssp.run(e, graph.WebGraph.vertices(e),
      seeds.select(seedId.as("id")), maxIters)
  }

  /** Semi-supervised label propagation over any undirected (src, dst)
    * edge frame from a clamped (id, lbl ≥ 0) seed frame: (id, lbl,
    * is_seed), lbl = −1 where no labeled vertex reaches within
    * `maxIters` synchronous rounds (deterministic mode tie-break; see
    * graph.LabelPropagation). */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
                       seeds: DataFrame, seedId: Column, seedLbl: Column,
                       maxIters: Int = 10): DataFrame =
    graph.LabelPropagation.run(
      edges.select(src.as("src"), dst.as("dst")),
      seeds.select(seedId.as("id"), seedLbl.as("lbl")), maxIters)

  /** Adamic–Adar link prediction over any undirected (src, dst) edge
    * frame: (a, b, common, aa_score) for non-adjacent pairs sharing
    * ≥1 neighbor, wedges through hubs above `degreeCap` dropped
    * (0 = no cap; see graph.LinkPrediction). */
  def adamicAdar(edges: DataFrame, src: Column, dst: Column,
                 degreeCap: Int = 0): DataFrame =
    graph.LinkPrediction.adamicAdar(edges.select(src.as("src"), dst.as("dst")),
      degreeCap)

  /** HITS hubs & authorities over any directed (src, dst) edge frame:
    * (id, auth, hub), sum-normalized after `iters` full update rounds
    * (see graph.Hits). */
  def hits(spark: SparkSession, edges: DataFrame, src: Column, dst: Column,
           iters: Int = 5): DataFrame =
    graph.Hits.run(spark, edges.select(src.as("src"), dst.as("dst")), iters)

  /** Personalized PageRank (random walk with restart) over any
    * directed (src, dst) edge frame from a one-column seed frame:
    * (id, score) with Σscore = 1 — seed-conditional visit
    * probabilities after `iters` damped restart rounds (see
    * graph.Ppr; dangling mass restarts by the seed vector). */
  def ppr(spark: SparkSession, edges: DataFrame, src: Column, dst: Column,
          seeds: DataFrame, seedId: Column, iters: Int = 6,
          damping: Double = 0.85): DataFrame =
    graph.Ppr.run(spark, edges.select(src.as("src"), dst.as("dst")),
      seeds.select(seedId.as("id")), iters, damping)

  /** Ordered funnel counts over any event frame: (stage, step,
    * n_users, conversion), step k reached only strictly after step
    * k−1 (see operators.Funnel). */
  def funnel(events: DataFrame, user: Column, step: Column, ts: Column,
             steps: Seq[String]): DataFrame =
    operators.Funnel.stageCounts(events, user, step, ts, steps)

  /** Distributed k-means (Lloyd) over any (id, vector) frame:
    * (vec_id, cluster, dist2). Broadcast centroids, map-side arg-min,
    * algebraic per-dimension means. */
  def kmeans(vecs: DataFrame, id: Column, v: Column, k: Int,
             dims: Int, iters: Int = 3, seed: Int = 2): DataFrame =
    ann.AnnQueries.kmeansFit(vecs.select(id.as("vec_id"), v.as("v")),
        k, iters, dims, seed)
      .select(col("vec_id"), col("cid").as("cluster"), col("d2").as("dist2"))

  /** Brute-force cosine top-k: broadcast query frame × base frame.
    * Returns (qid, neighbor, rank, cosine). The query frame must share
    * the base frame's id space (queries ⊆ base): a query's own base
    * row is excluded from its neighbors by id equality — with disjoint
    * id spaces that exclusion would silently drop one unrelated base
    * vector per colliding id. */
  def knnBrute(base: DataFrame, id: Column, v: Column,
               queries: DataFrame, qid: Column, qv: Column,
               k: Int): DataFrame = {
    val e = base.select(id.as("vec_id"), v.as("v"))
      .withColumn("nrm", VF.norm(col("v")))
    val q = queries.select(qid.as("qid"), qv.as("qv"))
      .withColumn("qn", VF.norm(col("qv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    broadcast(q).join(e, col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        VF.cosineByNorm(col("qv"), col("v"), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id").as("neighbor"), col("rank"), col("cosine"))
  }

  // -------------------------------------------------- streaming
  /** Streaming exact dedup with bounded state (watermark horizon). */
  def dedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    streaming.StreamingWindows.dedupStream(docs, watermarkDelay)
}
