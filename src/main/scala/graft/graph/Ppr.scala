package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Personalized PageRank (random walk with restart) on DataFrames —
  * the seed-centric member of the rank family next to LinkRank's
  * global walk and TrustRank's trusted-dangling variant
  * (LinkRankComputation.java:192-296 is the shared update skeleton;
  * the reference itself has no PPR, but a trust pipeline asks this
  * exact question: "how close is every page to THIS seed set?").
  *
  * Update rule (restart vector r, r_i = 1/|S| on seeds, 0 elsewhere):
  *   v' = (1-d)·r + d·(Σ_{w→v} v_w/outdeg(w) + D·r)
  * where D = dangling mass of the previous step — dangling walkers
  * restart by r, so Σv stays exactly 1 every round and the scores are
  * probabilities (visit rates of the restarting walk), not the
  * [0,scale] CDF grid of LinkRank.
  *
  * Scale posture: identical to LinkRank (shared code) — the
  * (svid, dvid, od) edge side is built/partitioned once per graph and
  * SessionCache-shared with LinkRank/TrustRank loops on the same
  * graph; dangling mass is a 1-row broadcast aggregate inside the
  * iteration's job; checkpoint rotation holds one live snapshot.
  *
  * Float-grid caveat (the LinkRank convention, accepted here too): the
  * per-round contribution sum runs in IEEE double with
  * partition-dependent association, so the oracle equality of the
  * round(,6)-gridded output relies on no score landing exactly on a
  * grid boundary — true for the benchmarked fixtures, same posture as
  * the q01/q02 loops this code shares its edge side with. The
  * scaled-int64 alternative (grid each edge contribution at 12 places,
  * decimal-sum — LinkPrediction's trick) is available if a fixture ever
  * hits the boundary.
  */
object Ppr {

  /** @param seeds one-column (id) frame, the restart set S.
    * @return (id, score) — raw PPR probabilities, Σ = 1, unrounded. */
  def run(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
          iters: Int = 6, damping: Double = 0.85,
          cacheKey: Option[String] = None): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val vmap = LinkRank.vmapFor(spark, WebGraph.vertices(edges), cacheKey)
    val eod = LinkRank.eodFor(spark, edges, vmap, cacheKey)

    // |S| as an O(1)-row driver scalar (the dangling-mass pattern);
    // seeds outside the graph's vertex set are ignored by the join.
    val seedVids = seeds.select(col("id")).distinct().join(vmap, "id")
      .select(col("vid").as("svid_seed"))
    val base = vmap
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .join(seedVids, col("vid") === col("svid_seed"), "left")
      .select(col("vid"), col("od").isNull.as("dangling"),
        col("svid_seed").isNotNull.as("seed"))
      .repartition(col("vid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ns = base.agg(coalesce(sum(when(col("seed"), 1L).otherwise(0L)),
      lit(0L))).first().getLong(0)
    require(ns > 0, s"Ppr.run: empty seed set (no seed id is a graph vertex)")

    val rInit = when(col("seed"), lit(1.0 / ns)).otherwise(lit(0.0))
    var ranks = base.select(col("vid"), col("dangling"),
      rInit.as("r"), rInit.as("score")).localCheckpoint()
    base.unpersist()

    val oneMinusD = 1.0 - damping
    for (_ <- 1 to iters) {
      val dang = ranks.filter(col("dangling"))
        .agg(coalesce(sum(col("score")), lit(0.0)).as("ds"))
      val contribs = eod
        .join(ranks.select(col("vid"), col("score")), eod("svid") === col("vid"))
        .groupBy(col("dvid")).agg(sum(col("score") / col("od")).as("contrib"))
        .withColumnRenamed("dvid", "cid")
      val newScore = lit(oneMinusD) * col("r") +
        lit(damping) * (coalesce(col("contrib"), lit(0.0)) + col("ds") * col("r"))
      val prevCp = ranks
      ranks = ranks
        .join(contribs, col("vid") === col("cid"), "left")
        .crossJoin(broadcast(dang))
        .select(col("vid"), col("dangling"), col("r"), newScore.as("score"))
      ranks = graft.Checkpoints.rotate(ranks, prevCp)
    }

    val out = ranks.join(vmap, "vid").select(col("id"), col("score"))
    graft.Checkpoints.deferFree(ranks)
    if (cacheKey.isEmpty) {
      eod.unpersist()
      graft.Checkpoints.deferCleanup(spark)(() => graft.Checkpoints.free(vmap))
    }
    out
  }
}
