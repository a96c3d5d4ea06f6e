package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, RelationalQueries, StorageQueries, StreamBatchQueries, TimeseriesQueries, WindowQueries}
import graft.text.TextQueries

/** r8 operators: streaming session-state equivalence, compaction
  * planning, readability, winsorized stats, session paths, directed
  * SCC, survivorship, exact-rank deciles. Each test recomputes the
  * semantics a second way (driver-side walk, batch twin, or closed
  * form) so the DuckDB hash gate isn't the only line of defense.
  */
class R8OpsSpec extends GraftSpec {

  test("q111 streaming session_window == batch gap-sessions closed by the watermark") {
    val got = StreamBatchQueries.q111StreamSessions(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    // batch twin: q15's sessions, kept iff last event + gap ≤ watermark
    val sess = WindowQueries.q15Sessionize(spark, sfDir)
    val maxUs = Tables.events(spark, sfDir)
      .agg(max(expr("ts div 1000"))).first().getLong(0)
    val wmUs = (maxUs / 1000 - StreamBatchQueries.StreamDelayMs) * 1000
    val want = sess
      .filter(col("session_end_us") + StreamBatchQueries.SessGapUs <= wmUs)
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"), col("session_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got.nonEmpty, "some sessions must close inside the horizon")
    assert(got === want)
    // and something must be withheld — otherwise the watermark is vacuous
    assert(got.size < sess.count(), "the delay horizon must withhold the tail")
  }

  test("q112 compaction bins tile each source exactly and fill before spilling over") {
    val docs = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("bytes"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = StorageQueries.q112Compaction(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.keySet === docs.keySet)
    val T = StorageQueries.CompactTargetBytes
    bySource.foreach { case (src, bins) =>
      val (nDocs, totBytes) = docs(src)
      assert(bins.map(_.getLong(2)).sum === nDocs, s"$src: every file planned once")
      assert(bins.map(_.getLong(3)).sum === totBytes, s"$src: byte-complete plan")
      val byBin = bins.map(b => b.getLong(1) -> b.getLong(3)).toMap
      val maxBin = byBin.keys.max
      assert(byBin.keySet === (0L to maxBin).toSet, s"$src: contiguous bin ids")
      // next-fit by start offset: if bin k+1 opened, bins 0..k must
      // already cover at least (k+1) capacities
      (0L until maxBin).foreach { k =>
        val cum = (0L to k).map(byBin).sum
        assert(cum >= (k + 1) * T,
          s"$src: bin ${k + 1} opened before ${k + 1}x capacity was packed")
      }
    }
  }

  test("q113 readability matches a driver-side regex recount and the Flesch closed form") {
    val got = TextQueries.q113Readability(spark, sfDir).collect()
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length === texts.size)
    def count(re: String, s: String): Long =
      re.r.findAllMatchIn(s).size.toLong
    got.take(50).foreach { r =>
      val t = texts(r.getLong(0))
      val w = count("[a-z]+", t.toLowerCase)
      val sents = math.max(count("[.!?]+", t), 1L)
      val syl = count("[aeiouy]+", t.toLowerCase)
      assert(r.getLong(1) === w, s"words of doc ${r.getLong(0)}")
      assert(r.getLong(2) === sents, s"sentences of doc ${r.getLong(0)}")
      assert(r.getLong(3) === syl, s"syllables of doc ${r.getLong(0)}")
      val flesch = BigDecimal(206.835 - 1.015 * w.toDouble / sents -
        84.6 * syl.toDouble / math.max(w, 1L))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - flesch) < 1e-9, s"flesch of doc ${r.getLong(0)}")
    }
  }

  test("q114 winsorized stats equal a driver-side sort-and-clip recompute") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val rows = RelationalQueries.q114Winsorize(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === parts.keySet)
    rows.foreach { r =>
      val brand = r.getString(0)
      val prices = parts(brand).sortBy(p => (p._3, p._2)).map(_._3)
      val n = prices.length
      val p05 = prices((n + 19) / 20 - 1)
      val p95 = prices((19 * n + 19) / 20 - 1)
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === p05, s"$brand p05")
      assert(r.getDouble(3) === p95, s"$brand p95")
      def mean6(xs: Seq[Double]): Double =
        (xs.map(BigDecimal(_)).sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - mean6(prices.toSeq)) < 1e-6, s"$brand raw mean")
      val clipped = prices.map(p => math.min(math.max(p, p05), p95))
      assert(math.abs(r.getDouble(5) - mean6(clipped.toSeq)) < 1e-6, s"$brand winsor mean")
      assert(r.getDouble(5) >= p05 - 1e-9 && r.getDouble(5) <= p95 + 1e-9)
    }
  }

  test("q115 top paths: contiguous ranks, monotone counts, bounded prefix length") {
    val rows = WindowQueries.q115SessionPaths(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "counts non-increasing")
    rows.foreach { r =>
      val steps = r.getString(1).split(">")
      assert(steps.length <= WindowQueries.PathPrefixLen)
      assert(steps.forall(_.nonEmpty))
      assert(r.getDouble(3) <= WindowQueries.PathPrefixLen + 1e-9)
    }
    // the sessions covered by counted paths can never exceed the session count
    val nSessions = WindowQueries.q15Sessionize(spark, sfDir).count()
    assert(counts.sum <= nSessions)
  }

  test("q116 SCC equals a driver-side Kosaraju on the collected host graph") {
    val edges = graft.graph.WebGraph
      .cachedHostEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val fwd = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toList }
    val bwd = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toList }
    // Kosaraju: DFS finish order on G, then DFS on G^T in reverse finish order
    val visited = scala.collection.mutable.Set.empty[String]
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    def dfs1(s: String): Unit = { // iterative, explicit stack with post-visit marker
      val stack = scala.collection.mutable.Stack[(String, Boolean)]((s, false))
      while (stack.nonEmpty) stack.pop() match {
        case (v, true) => order += v
        case (v, false) if !visited(v) =>
          visited += v
          stack.push((v, true))
          fwd.getOrElse(v, Nil).foreach(w => if (!visited(w)) stack.push((w, false)))
        case _ =>
      }
    }
    verts.foreach(v => if (!visited(v)) dfs1(v))
    val comp = scala.collection.mutable.Map.empty[String, String]
    order.reverse.foreach { root =>
      if (!comp.contains(root)) {
        val stack = scala.collection.mutable.Stack(root)
        val members = scala.collection.mutable.ArrayBuffer.empty[String]
        while (stack.nonEmpty) {
          val v = stack.pop()
          if (!comp.contains(v)) {
            comp(v) = root; members += v
            bwd.getOrElse(v, Nil).foreach(w => if (!comp.contains(w)) stack.push(w))
          }
        }
        val canon = members.min
        members.foreach(m => comp(m) = canon)
      }
    }
    val want = verts.map(v => v -> comp(v)).toMap
    val got = GraphQueries.q116Scc(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === want)
    val sizes = GraphQueries.q116Scc(spark, sfDir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val wantSizes = want.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(sizes === wantSizes)
  }

  test("q117 survivor is the longest member of its cluster (ties to min id)") {
    val rows = graft.dedup.DedupQueries.q117Survivor(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      val best = members.minBy(m => (-m._3, m._1))
      assert(members.forall(_._4 == best._1), s"cluster $c survivor_id")
      members.foreach(m =>
        assert(m._5 === (m._1 == best._1), s"cluster $c flag of doc ${m._1}"))
      assert(members.count(_._5) === 1, s"cluster $c has exactly one survivor")
    }
    // every q25 cluster appears with identical membership
    val q25 = graft.dedup.DedupQueries.q25DupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === q25)
  }

  test("q119 double-sweep eccentricity equals a driver-side BFS pair") {
    val edges = graft.graph.WebGraph
      .cachedHostEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def bfs2(seed: String): Map[String, Long] = {
      val dist = scala.collection.mutable.Map(seed -> 0L)
      var frontier = Vector(seed)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Array.empty[String]))
          .filterNot(dist.contains).distinct
        next.foreach(dist(_) = d)
        frontier = next
      }
      dist.toMap
    }
    val d1 = bfs2(verts.min)
    val seed2 = d1.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
    val d2 = bfs2(seed2)
    val diam = d2.values.max
    val got = graft.queries.GraphQueries.q119Ecc(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getString(2) === seed2, "re-seed host")
      assert(r.getLong(3) === diam, "diameter lower bound")
      assert(r.getLong(1) === d2.getOrElse(r.getString(0), -1L), s"dist of ${r.getString(0)}")
    }
    assert(got.map(_.getString(0)).toSeq.sorted === verts)
  }

  test("q120 KMV set ops: exact side recomputed, estimator formulas self-consistent") {
    val rows = graft.text.TextQueries.q120KmvSetops(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exact side from collected per-source token-hash sets
    val hs = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), graft.functions.MathFunctions.hash32(col("tok")).as("h"))
      .distinct().collect().map(r => r.getString(0) -> r.getLong(1))
    val bySrc = hs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (a, b) = (bySrc(sa), bySrc(sb))
      assert(r.getLong(2) === a.size.toLong, s"$sa n_a")
      assert(r.getLong(3) === b.size.toLong, s"$sb n_b")
      assert(r.getLong(4) === (a & b).size.toLong, s"($sa,$sb) n_inter")
      val jx = BigDecimal((a & b).size.toDouble / (a | b).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - jx) < 1e-9, s"($sa,$sb) exact jaccard")
      // estimator plausibility: within [0,1], and err column is honest
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
      assert(math.abs(r.getDouble(9) - math.abs(r.getDouble(8) - r.getDouble(5))) < 1e-6)
      // the merged sketch can never estimate union below the larger side's sketch floor
      assert(r.getDouble(7) > 0.0)
    }
  }

  test("q121 seasonality eta2 equals a driver-side ANOVA recompute") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = TimeseriesQueries.q121Seasonality(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === ev.map(_._1).toSet)
    rows.foreach { r =>
      val t = r.getString(0)
      val cells = ev.filter(_._1 == t).groupBy(e => (e._2, e._3))
        .map { case (k, v) => k -> v.size.toLong }
      val days = cells.keySet.map(_._1)
      val grid = for (d <- days.toSeq; h <- 0L until 24L)
        yield cells.getOrElse((d, h), 0L)
      val D = days.size.toLong
      assert(r.getLong(1) === D, s"$t n_days")
      val n = 24 * D
      val s = grid.sum
      val q = grid.map(c => c * c).sum
      val byH = (0L until 24L).map(h =>
        days.toSeq.map(d => cells.getOrElse((d, h), 0L)).sum)
      val ssh = byH.map(x => x * x).sum
      val denom = n * q - s * s
      val eta2 = if (denom == 0) 0.0
        else BigDecimal((24 * ssh - s * s).toDouble / denom)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - eta2) < 1e-9, s"$t eta2")
      val peakH = byH.zipWithIndex.maxBy { case (v, h) => (v, -h) }._2
      assert(r.getLong(3) === peakH.toLong, s"$t peak hour")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0 + 1e-9)
    }
  }

  test("q122 CSV round-trip aggregates equal the direct parquet aggregates") {
    val got = StorageQueries.q122CsvIo(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val want = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr("ts % 1000000007")).as("m"),
        round(sum(col("value").cast("decimal(38,6)")).cast("double"), 6).as("v"),
        sum(graft.functions.MathFunctions.hash32(col("props"))).as("p"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
      .toSet
    assert(got.toSet === want)
    assert(got.nonEmpty)
  }

  test("q118 deciles: equal-frequency, complete, ordered, and exact vs a driver sort") {
    val prices = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getDouble(1), r.getLong(0))).sorted
    val n = prices.length
    val rows = WindowQueries.q118RankBins(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    assert(rows.map(_.getLong(1)).sum === n.toLong)
    // exact per-decile membership from the driver-side global sort
    val wantCounts = prices.zipWithIndex
      .groupBy { case (_, i) => 1 + i * 10 / n }
      .map { case (d, xs) => d.toLong -> xs.length.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === wantCounts)
    val wantMin = prices.zipWithIndex
      .groupBy { case (_, i) => 1 + i * 10 / n }
      .map { case (d, xs) => d.toLong -> xs.map(_._1._1).min }
    assert(rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap === wantMin)
    // bins are contiguous in price space (ties may touch, never cross)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 1e-12)
      case _ =>
    }
  }
}
