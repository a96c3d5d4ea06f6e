package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, RelationalQueries, WindowQueries}
import graft.text.PipelineQueries

/** Wave-44 operators (q223–q225): session-path perplexity, rich-club
  * coefficient, epoch-shuffle audit.
  */
class W44OpsSpec extends GraftSpec {

  test("q223 path perplexity: model replay on the driver, atypical paths score higher") {
    val rows = WindowQueries.q223PathPerplexity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rebuild transitions exactly as q96/q223 do
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(_._2)
      val sessions = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Long, String)]]
      var prev = Long.MinValue
      sorted.foreach { case (_, ts, t) =>
        if (prev == Long.MinValue || ts - prev > 30L * 60 * 1000000)
          sessions += scala.collection.mutable.ArrayBuffer((ts, t))
        else sessions.last += ((ts, t))
        prev = ts
      }
      sessions.flatMap(s => s.map(_._2).sliding(2).filter(_.length == 2)
        .map(p => (u, p(0), p(1))))
    }
    val counts = trans.groupBy(t => (t._2, t._3)).map { case (k, xs) => k -> xs.length.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val nTypes = counts.keys.map(_._2).toSet.size.toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val logp = counts.map { case (k, n) =>
      k -> r6(math.log((n + 1).toDouble / (totals(k._1) + nTypes).toDouble)) }
    val perUser = trans.groupBy(_._1).map { case (u, ts) =>
      u -> (ts.length.toLong, ts.map(t => logp((t._2, t._3))).sum) }
    assert(rows.map(_.getLong(0)).toSet === perUser.keySet)
    rows.foreach { r =>
      val (n, ll) = perUser(r.getLong(0))
      assert(r.getLong(1) === n, s"n_trans user ${r.getLong(0)}")
      val nll = math.rint(-ll.toDouble / n * 1e6) / 1e6
      assert(math.abs(r.getDouble(2) - nll) < 1e-5)
      assert(math.abs(r.getDouble(3) - math.exp(nll)) < 1e-4)
    }
    // perplexity is bounded by the number of event types (uniform worst case ~ |T|+)
    assert(rows.forall(_.getDouble(3) > 1.0))
  }

  test("q224 rich club: exact integer replay, phi within [0,1], monotone club shrink") {
    val rows = GraphQueries.q224RichClub(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === GraphQueries.RichClubKs)
    val und = graft.graph.WebGraph.cachedHostEdges(spark, sfDir)
      .select(least(col("src"), col("dst")), greatest(col("src"), col("dst")))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.length.toLong }
    rows.foreach { r =>
      val k = r.getInt(0)
      val club = deg.filter(_._2 > k).keySet
      val eClub = und.count(e => club(e._1) && club(e._2)).toLong
      assert(r.getLong(1) === club.size.toLong, s"club size k=$k")
      assert(r.getLong(2) === eClub, s"club edges k=$k")
      if (club.size >= 2) {
        val phi = 2.0 * eClub / (club.size.toLong * (club.size - 1))
        assert(math.abs(r.getDouble(3) - phi) < 1e-6)
        assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0 + 1e-9)
      }
    }
    // clubs shrink as k grows
    val sizes = rows.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b <= a })
  }

  test("q225 epoch shuffle: rank-correlation replay; identical epochs would score 1") {
    val rows = PipelineQueries.q225EpochShuffle(spark, sfDir).collect()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val ids = ds.map(_._1)
      val r1 = ids.sortBy(id => (h32(s"e1#$id"), id)).zipWithIndex.toMap
      val r2 = ids.sortBy(id => (h32(s"e2#$id"), id)).zipWithIndex.toMap
      val sumD2 = ids.map { id =>
        val d = r1(id).toLong - r2(id).toLong; d * d
      }.sum
      val n = ids.length.toLong
      src -> (n, sumD2, 1.0 - 6.0 * sumD2 / (n * (n * n - 1)))
    }
    assert(rows.map(_.getString(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (n, d2, rho) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === d2)
      assert(math.abs(r.getDouble(3) - rho) < 1e-6)
      // healthy decorrelation: |rho| far from 1 on every shard
      assert(math.abs(r.getDouble(3)) < 0.5, s"shard ${r.getString(0)} rho=$rho")
    }
  }
}
