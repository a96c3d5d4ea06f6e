package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected graph:
  * for every NON-adjacent vertex pair sharing at least one neighbor,
  * the common-neighbor count and the Adamic–Adar score
  * Σ_{w ∈ N(a)∩N(b)} 1/ln(deg(w)) (Adamic & Adar, "Friends and
  * neighbors on the Web", Social Networks 2003) — the classic
  * "which edge appears next" signal a crawl scheduler or
  * recommendation layer reads off the host graph.
  *
  * Scale shape: candidate pairs come from WEDGE enumeration (two hops
  * through a shared neighbor w), never an all-pairs join — the same
  * bucketing argument as the triangle engine: work is Σ_w deg(w)²,
  * bounded on real graphs by capping hub degrees (drop w above a
  * degree cap: a w adjacent to everything scores ~1/ln(huge) per pair
  * and adds quadratic work for near-zero signal — the standard
  * Adamic–Adar practicality cut). Every common neighbor w has
  * deg(w) ≥ 2 by construction, so 1/ln(deg) is finite. Existing edges
  * are removed with one anti-join against the edge frame. All
  * exchanges carry (pair, partial-sum) rows.
  */
object LinkPrediction {

  /** Adamic–Adar + common-neighbor counts for every pair of
    * `edges(src, dst)` sharing ≥1 neighbor, hub wedges dropped above
    * `degreeCap` (≤ 0 disables the cap). Scores round(,6)-gridded.
    * Returns (a, b, common, aa_score, is_new) with a < b: `is_new`
    * pairs are non-adjacent (the link PREDICTIONS); adjacent pairs
    * carry the same score as existing-tie strength (triadic-closure
    * support) — on dense graphs where every wedge closes, predictions
    * may be empty while tie strengths never are. */
  def adamicAdar(edges: DataFrame, degreeCap: Int = 0): DataFrame = {
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(edges.select(col("dst").as("a"), col("src").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.groupBy(col("a").as("w")).agg(count(lit(1)).as("deg"))
    val capped = if (degreeCap > 0) deg.filter(col("deg") <= degreeCap) else deg
    // neighbor lists keyed by the shared vertex w: (w, x) for x ∈ N(w)
    val nb = und.select(col("a").as("w"), col("b").as("x"))
    val wedges = nb.select(col("w"), col("x").as("pa"))
      .join(nb.select(col("w"), col("x").as("pb")), "w")
      .filter(col("pa") < col("pb"))
      .join(capped, "w")
    val adj = und.filter(col("a") < col("b"))
      .select(col("a").as("pa"), col("b").as("pb"), lit(true).as("adjacent"))
    // each term is round(,12)-gridded and summed in exact DECIMAL so
    // the total is independent of partial-sum association (the dsum
    // convention) — a plain double Σ could differ across engines
    val term = round(lit(1.0) / log(col("deg").cast("double")), 12)
      .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(38, 12))
    val scored = wedges
      .join(adj, Seq("pa", "pb"), "left")
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("common"),
        round(sum(term).cast("double"), 6).as("aa_score"),
        coalesce(first(col("adjacent")), lit(false)).as("adjacent"))
      .select(col("pa").as("a"), col("pb").as("b"), col("common"),
        col("aa_score"), (!col("adjacent")).as("is_new"))
    und.unpersist(blocking = false)
    scored
  }
}
