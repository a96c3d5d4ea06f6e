package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, MlEvalQueries}
import graft.text.TextQueries

/** Wave-57 operators: isotonic calibration via the minimax identity
  * (q273), co-citation + bibliographic coupling (q274), Dunning G²
  * collocations (q275) — each cross-checked by an INDEPENDENT
  * driver-side formulation (sequential PAVA pooling vs the minimax
  * closed form; brute-force pair maps; raw-count G² recompute).
  */
class W57OpsSpec extends GraftSpec {

  test("q273: minimax-identity isotonic fit equals the sequential PAVA pooling loop") {
    val out = MlEvalQueries.q273Isotonic(spark, sfDir).collect()
    val perUser = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === MlEvalQueries.AbLastDay, 1L)
          .otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val maxEv = perUser.map(_._1).max
    val bins = perUser
      .groupBy { case (nEv, _) => math.min(nEv * 10 / maxEv, 9L) }
      .map { case (b, us) => (b, us.length.toLong, us.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    // sequential pool-adjacent-violators on (weight=n_users, sum=conv)
    case class Block(bins: List[Long], w: Long, s: Long) {
      def mean: Double = s.toDouble / w
    }
    var stack = List.empty[Block]
    for ((b, w, s) <- bins) {
      stack = Block(List(b), w, s) :: stack
      while (stack.lengthCompare(2) >= 0 &&
        stack(1).mean > stack.head.mean) {
        val h :: p :: rest = stack: @unchecked
        stack = Block(p.bins ++ h.bins, p.w + h.w, p.s + h.s) :: rest
      }
    }
    val pava = stack.reverse.flatMap(bl => bl.bins.map(_ -> bl.mean)).toMap
    assert(out.length == bins.length, "one row per populated bin")
    out.foreach { r =>
      val b = r.getLong(0)
      assert(math.abs(r.getDouble(4) -
        BigDecimal(pava(b)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9,
        s"bin $b: minimax ${r.getDouble(4)} vs PAVA ${pava(b)}")
    }
    // isotonic properties: monotone, and pooling preserves the
    // weighted total (sum over bins of n_users * iso == total conv)
    val isoSeq = out.map(_.getDouble(4))
    assert(isoSeq.zip(isoSeq.tail).forall { case (a, b) => a <= b + 1e-9 },
      "fitted curve is monotone non-decreasing")
    val totalFit = out.map(r => r.getLong(1) * pava(r.getLong(0))).sum
    val totalObs = bins.map(_._3).sum.toDouble
    assert(math.abs(totalFit - totalObs) < 1e-6,
      "PAVA preserves the weighted conversion mass")
    assert(out.exists(_.getBoolean(5)),
      "the fixture's curve has at least one pooled (non-monotone) bin")
  }

  test("q274: top pairs equal the brute-force co-citation/coupling maps") {
    val out = GraphQueries.q274Cocitation(spark, sfDir).collect()
    val hedges = graph.WebGraph.cachedHostEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    def pairCounts(key: ((String, String)) => String,
                   leaf: ((String, String)) => String): Map[(String, String), Long] =
      hedges.groupBy(key).toSeq
        .flatMap { case (_, es) =>
          val ls = es.map(leaf).sorted
          for (i <- ls.indices; j <- (i + 1) until ls.length)
            yield (ls(i), ls(j))
        }
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cocite = pairCounts(_._1, _._2)
    val couple = pairCounts(_._2, _._1)
    // FULL OUTER merge (r10): coupled-but-never-co-cited pairs appear
    // with cocitation = 0 instead of being silently absent
    val expect = (cocite.keySet ++ couple.keySet).toSeq
      .map { case (a, b) => (a, b, cocite.getOrElse((a, b), 0L),
        couple.getOrElse((a, b), 0L)) }
      .sortBy { case (a, b, c, _) => (-c, a, b) }
      .take(GraphQueries.CoCiteTopK)
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (a, b, c, p)) =>
      assert(r.getString(1) == a && r.getString(2) == b &&
        r.getLong(3) == c && r.getLong(4) == p,
        s"rank ${r.getInt(0)}: (${r.getString(1)},${r.getString(2)}," +
          s"${r.getLong(3)},${r.getLong(4)}) vs ($a,$b,$c,$p)")
    }
    // the degreeCap>0 path: hubs above the cap emit no wedges
    val outdegs = hedges.groupBy(_._1).toSeq.map(_._2.length)
    val cap = outdegs.sorted.apply(outdegs.length / 2)
    assert(outdegs.exists(_ > cap), "fixture must have a host above the cap")
    val cappedRows = graph.CoCitation.run(spark,
      graph.WebGraph.cachedHostEdges(spark, sfDir), degreeCap = cap).collect()
    val keepS = hedges.groupBy(_._1).toSeq
      .filter(_._2.length <= cap).map(_._1).toSet
    val keepD = hedges.groupBy(_._2).toSeq
      .filter(_._2.length <= cap).map(_._1).toSet
    def cappedCounts(edges: Array[(String, String)],
                     key: ((String, String)) => String,
                     leaf: ((String, String)) => String) =
      edges.groupBy(key).toSeq.flatMap { case (_, es) =>
        val ls = es.map(leaf).sorted
        for (i <- ls.indices; j <- (i + 1) until ls.length)
          yield (ls(i), ls(j))
      }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cc = cappedCounts(hedges.filter(e => keepS(e._1)), _._1, _._2)
    val cp = cappedCounts(hedges.filter(e => keepD(e._2)), _._2, _._1)
    assert(cappedRows.length == (cc.keySet ++ cp.keySet).size,
      "capped pair set size (full outer)")
    cappedRows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(cc.getOrElse(k, 0L) == r.getLong(2) &&
        cp.getOrElse(k, 0L) == r.getLong(3))
    }
    assert(cc.size < cocite.size,
      "the cap must actually drop some hub wedges on this fixture")
  }

  test("q275: G² recomputes from raw bigram counts; ranking is by gridded evidence") {
    val out = TextQueries.q275Collocations(spark, sfDir).collect()
    assert(out.nonEmpty)
    val bigrams = Tables.documents(spark, sfDir)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t => val w = t.split(" ", -1); w.dropRight(1).zip(w.drop(1)) }
    val n11 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val r1 = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val c1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = bigrams.length.toLong
    def S(x: Long): Double = if (x > 0) x * math.log(x.toDouble) else 0.0
    out.foreach { r =>
      val (w1, w2) = (r.getString(1), r.getString(2))
      val k11 = n11((w1, w2))
      assert(k11 == r.getLong(3), s"n11 of ($w1,$w2)")
      assert(k11 >= TextQueries.G2MinSupport)
      val (rr, cc) = (r1(w1), c1(w2))
      val g2 = 2.0 * (S(k11) + S(rr - k11) + S(cc - k11) +
        S(n - rr - cc + k11) - S(rr) - S(n - rr) - S(cc) - S(n - cc) + S(n))
      assert(math.abs(r.getDouble(4) - g2) < 1e-4,
        s"G² of ($w1,$w2): ${r.getDouble(4)} vs $g2")
      assert(g2 > -1e-9, "a likelihood ratio statistic is non-negative")
    }
    val gs = out.map(_.getDouble(4))
    assert(gs.zip(gs.tail).forall { case (a, b) => a >= b },
      "rows are ranked by descending gridded G²")
    // the statistic must separate: the top collocation carries far
    // more evidence than the cut line
    assert(gs.head > gs.last, "G² spread is non-degenerate on the fixture")
  }
}
