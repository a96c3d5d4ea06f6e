package graft

import org.apache.spark.sql.functions._
import graft.queries.{RelationalQueries, WindowQueries}
import graft.ann.AnnQueries
import graft.text.FeatureQueries

/** Wave-54 operators: arbitrary grouping sets (q264), exact sliding-
  * window distinct (q265), MMR diversified retrieval (q266), OOV-rate
  * audit (q267) — each cross-checked by a driver recompute.
  */
class W54OpsSpec extends GraftSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q264: the three pairwise marginals equal per-set recomputes") {
    val rows = RelationalQueries.q264GroupingSets(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).cast("long"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    def agg(key: ((String, String, Long, Double)) => (String, String, Long)) =
      base.groupBy(key).map { case (k, xs) =>
        (k._1, k._2, k._3) -> (xs.length.toLong,
          r6(xs.map(x => BigDecimal(x._4)).sum.toDouble))
      }
    val sy = agg(x => (x._1, "(all)", x._3))
    val sp = agg(x => (x._1, x._2, -1L))
    val yp = agg(x => ("(all)", x._2, x._3))
    val want = sy ++ sp ++ yp
    assert(rows.length === want.size, "row count = union of the three marginals")
    rows.foreach { case (s, p, y, n, rev) =>
      val (wn, wrev) = want((s, p, y))
      assert(n === wn, s"count of ($s,$p,$y)")
      assert(math.abs(rev - wrev) < 1e-6, s"revenue of ($s,$p,$y)")
    }
  }

  test("q265: window distincts equal a per-window set recompute") {
    val rows = WindowQueries.q265WindowDistinct(spark, sfDir).collect()
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val dmin = ud.map(_._2).min
    val dmax = ud.map(_._2).max
    val want = (dmin to dmax).map { w =>
      val inWin = ud.filter(x => x._2 <= w &&
        x._2 > w - WindowQueries.WindowDistinctDays)
      w -> (inWin.map(_._1).distinct.length.toLong, inWin.length.toLong)
    }.toMap
    assert(rows.length === want.size)
    rows.foreach { r =>
      val (na, nd) = want(r.getLong(0))
      assert(r.getLong(1) === na, s"distinct at day ${r.getLong(0)}")
      assert(r.getLong(2) === nd, s"user-days at day ${r.getLong(0)}")
    }
    // the operator must have real re-appearance mass to collapse
    assert(rows.exists(r => r.getLong(2) > r.getLong(1)),
      "n_user_days must exceed n_active somewhere")
  }

  test("q266: the greedy MMR sequence is an exact driver replay") {
    val rows = AnnQueries.q266Mmr(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, r6(cos(q, v))) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(AnnQueries.MmrCandidates)
    var sel = Vector(cand.head)
    var expect = Vector((1, cand.head._1, cand.head._3, 0.0, cand.head._3))
    for (r <- 2 to AnnQueries.MmrPicks) {
      val picked = sel.map(_._1).toSet
      val scored = cand.filterNot(c => picked(c._1)).map { case (id, v, rel) =>
        val ms = sel.map(s => r6(cos(v, s._2))).max
        (id, v, rel, ms, r6(AnnQueries.MmrLambda * rel -
          AnnQueries.MmrDiversity * ms))
      }
      val best = scored.minBy { case (id, _, _, _, m) => (-m, id) }
      sel = sel :+ ((best._1, best._2, best._3))
      expect = expect :+ ((r, best._1, best._3, best._4, best._5))
    }
    assert(rows.length === expect.length)
    rows.zip(expect).foreach { case (row, (pick, id, rel, ms, mmr)) =>
      assert(row.getInt(0) === pick)
      assert(row.getLong(1) === id, s"pick $pick chose ${row.getLong(1)}, want $id")
      assert(math.abs(row.getDouble(2) - rel) < 1e-6)
      assert(math.abs(row.getDouble(3) - ms) < 1e-6)
      assert(math.abs(row.getDouble(4) - mmr) < 1e-6)
    }
    // diversification must actually bite: picks are not just top-rel
    val topRel = cand.take(AnnQueries.MmrPicks).map(_._1).toSet
    assert(rows.map(_.getLong(1)).toSet != topRel,
      "MMR must diverge from plain top-k on the fixture")
  }

  test("q267: OOV rates equal a driver vocab-freeze recompute") {
    val rows = FeatureQueries.q267OovRate(spark, sfDir).collect()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1)))
    val (train, held) = docs.partition(d =>
      h32(s"lm:${d._1}") % FeatureQueries.LmTrainMod < FeatureQueries.LmTrainPct)
    val vocab = train.flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
      .toSeq.sortBy { case (t, c) => (-c, t) }
      .take(FeatureQueries.OovVocabK).map(_._1).toSet
    val byLang = held.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSet === byLang.keySet)
    rows.foreach { r =>
      val toks = byLang(r.getString(0)).flatMap(_._3)
      val oov = toks.count(t => !vocab(t)).toLong
      assert(r.getLong(1) === toks.length.toLong, "token count")
      assert(r.getLong(2) === oov, "oov tokens")
      assert(math.abs(r.getDouble(3) - oov.toDouble / toks.length) < 1e-6)
      val types = toks.distinct
      val oovT = types.count(t => !vocab(t)).toLong
      assert(r.getLong(4) === types.length.toLong && r.getLong(5) === oovT)
      assert(math.abs(r.getDouble(6) - oovT.toDouble / types.length) < 1e-6)
    }
    // the audit must surface real OOV mass on the fixture's 31-word vocab
    assert(rows.forall(_.getDouble(3) > 0.2), "top-20 of 31 words leaves real OOV")
  }
}
