package graft

import org.apache.spark.sql.functions._
import graft.graph.{LinkRank, WebGraph, WeightedRank}
import graft.multimodal.MultimodalQueries

/** Wave-10 operators (q152–q153): weighted rank and VAD segmentation. */
@SlowSuite
class W20OpsSpec extends GraftSpec {

  test("WeightedRank with uniform weights reproduces LinkRank's raw iterate") {
    val edges = WebGraph.cachedHostEdges(spark, sfDir)
    val init = LinkRank.uniformInit(edges)
    val raw = LinkRank.runCounted(spark, edges, init, normalize = false)._1
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wedges = edges.withColumn("w", lit(1L))
    val wr = WeightedRank.run(spark, wedges, init)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(wr.keySet === raw.keySet)
    wr.foreach { case (id, s) =>
      assert(math.abs(s - raw(id)) < 1e-9, s"host $id uniform-weight equivalence")
    }
  }

  test("q152 weights change the ranking where multiplicity exists") {
    val rows = graft.queries.GraphQueries.q152WeightedRank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0.0))
    // the multiplicity-weighted page graph must NOT equal the uniform
    // rank on the deduped graph — otherwise the weights are vacuous
    val uniform = LinkRank.runCounted(spark, WebGraph.cachedEdges(spark, sfDir),
        LinkRank.uniformInit(WebGraph.cachedEdges(spark, sfDir)),
        cacheKey = Some(s"page:$sfDir"), normalize = false)._1
      .collect().map(r => r.getString(0) ->
        BigDecimal(r.getDouble(1) * 1000)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    val diff = rows.count(r => uniform.get(r.getString(0))
      .exists(u => math.abs(u - r.getDouble(1)) > 1e-6))
    assert(diff > 0, "weighted rank must diverge from uniform rank somewhere")
  }

  test("q153 VAD replays hash energies and islands on the driver") {
    val rows = MultimodalQueries.q153Vad(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val texts = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === texts.filter(_._2.nonEmpty).keySet)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    texts.foreach { case (id, t) =>
      if (t.nonEmpty) {
        val L = MultimodalQueries.VadFrameLen
        val n = (t.length + L - 1) / L
        val flags = (0 until n).map { i =>
          val f = t.substring(i * L, math.min((i + 1) * L, t.length))
          h32(f) % 1000 >= MultimodalQueries.VadThreshold
        }
        val segs = scala.collection.mutable.ListBuffer.empty[Int]
        var cur = 0
        flags.foreach { f =>
          if (f) cur += 1 else { if (cur > 0) segs += cur; cur = 0 }
        }
        if (cur > 0) segs += cur
        val (gn, gs, gsegs, glong, gratio) = rows(id)
        assert(gn === n.toLong, s"doc $id frames")
        assert(gs === flags.count(identity).toLong, s"doc $id speech frames")
        assert(gsegs === segs.length.toLong, s"doc $id segments")
        assert(glong === (if (segs.isEmpty) 0L else segs.max.toLong), s"doc $id longest")
        assert(math.abs(gratio - flags.count(identity).toDouble / n) < 1e-6)
      }
    }
  }
}
