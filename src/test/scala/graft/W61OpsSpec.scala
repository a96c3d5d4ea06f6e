package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupQueries
import graft.queries.MlEvalQueries
import graft.text.TextQueries

/** Wave-61 operators: blocked tf-idf cosine join (q285), Burrows'
  * Delta stylometry (q286), the CMH stratified A/B test (q287) — each
  * cross-checked by an INDEPENDENT driver-side formulation (plain
  * Scala tokenize/weight/score loops; an independent JVM md5 for the
  * arm split).
  */
class W61OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def tokenize(docs: Array[(Long, String, String)]) =
    docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(t => (id, src, t))
    }

  private def collectDocs(): Array[(Long, String, String)] =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q285: top pairs replay a plain tf-idf cosine over source blocks") {
    val out = DedupQueries.q285TfidfCosine(spark, sfDir).collect()
    assert(out.length == DedupQueries.TfidfPairTopK)
    val docs = collectDocs()
    val tf = tokenize(docs).groupBy(t => (t._1, t._3)).map { case ((id, t), v) =>
      (id, t, v.length.toDouble)
    }.toSeq
    val dfm = tf.groupBy(_._2).map { case (t, v) => t -> v.size }
    val n = docs.length.toDouble
    val w = tf.map { case (id, t, f) => (id, t, f * math.log((n + 1.0) / (dfm(t) + 1.0))) }
    val nrm = w.groupBy(_._1).map { case (id, v) =>
      id -> math.sqrt(v.map(x => x._3 * x._3).sum)
    }
    val srcOf = docs.map(d => d._1 -> d._2).toMap
    val vecs = w.groupBy(_._1).map { case (id, v) =>
      id -> v.map(x => x._2 -> x._3 / nrm(id)).toMap
    }
    val ids = docs.map(_._1).sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if srcOf(ids(i)) == srcOf(ids(j))
      shared = (vecs(ids(i)).keySet & vecs(ids(j)).keySet)
      if shared.nonEmpty
    } yield {
      val cos = shared.toSeq.map(t => vecs(ids(i))(t) * vecs(ids(j))(t)).sum
      (ids(i), ids(j), cos)
    }
    val top = pairs.sortBy { case (a, b, c) => (-c, a, b) }
      .take(DedupQueries.TfidfPairTopK)
    out.zip(top).foreach { case (r, (a, b, c)) =>
      assert(r.getLong(2) == a && r.getLong(3) == b,
        s"rank ${r.getInt(0)}: (${r.getLong(2)},${r.getLong(3)}) vs ($a,$b)")
      assert(closeRel(r.getDouble(4), c, 1e-5), s"cosine($a,$b)")
      assert(r.getString(1) == srcOf(a), "block column carries the pair's source")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("q286: deltas replay a plain z-score recompute; all pairs covered") {
    val out = TextQueries.q286BurrowsDelta(spark, sfDir).collect()
    val docs = collectDocs()
    val cnts = tokenize(docs).groupBy(t => (t._2, t._3))
      .map { case ((s, t), v) => (s, t, v.length.toLong) }.toSeq
    val tot = cnts.groupBy(_._1).map { case (s, v) => s -> v.map(_._3).sum }
    val sources = cnts.map(_._1).distinct.sorted
    val vocab = cnts.map(_._2).distinct.sorted
    val cmap = cnts.map(c => (c._1, c._2) -> c._3).toMap
    val rf = (for (s <- sources; t <- vocab) yield
      (s, t) -> cmap.getOrElse((s, t), 0L).toDouble / tot(s)).toMap
    val z = vocab.flatMap { t =>
      val xs = sources.map(s => rf((s, t)))
      val mu = xs.sum / xs.length
      val v = xs.map(x => x * x).sum / xs.length - mu * mu
      if (v > 0) sources.map(s => (s, t) -> ((rf((s, t)) - mu) / math.sqrt(v)))
      else Seq.empty
    }.toMap
    val terms = z.keys.map(_._2).toSeq.distinct
    val expect = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val ds = terms.map(t => math.abs(z((sources(i), t)) - z((sources(j), t))))
      (sources(i), sources(j)) -> ds.sum / ds.length
    }).toMap
    assert(out.length == sources.length * (sources.length - 1) / 2,
      "every source pair is scored")
    out.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(closeRel(r.getDouble(2), expect(key), 1e-5), s"delta$key")
      assert(r.getDouble(2) > 0.0)
    }
    // ranks follow delta ascending
    val sorted = out.sortBy(_.getLong(3))
    assert(sorted.map(_.getDouble(2)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("q287: CMH replays an independent-md5 stratified recompute; null fixture stays quiet") {
    val out = MlEvalQueries.q287Cmh(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def arm(uid: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab:$uid".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) "A" else "B"
    }
    val ud = ev.groupBy(e => (e._1, e._2)).map { case ((u, d), es) =>
      (u, d, if (es.exists(_._3 == "purchase")) 1L else 0L)
    }.toSeq
    val byDay = ud.groupBy(_._2).toSeq.flatMap { case (d, rows) =>
      val as = rows.filter(r => arm(r._1) == "A")
      val bs = rows.filter(r => arm(r._1) == "B")
      if (as.isEmpty || bs.isEmpty) None
      else Some((as.length.toLong, as.map(_._3).sum,
        bs.length.toLong, bs.map(_._3).sum))
    }
    val strata = byDay.filter { case (na, _, nb, _) => na + nb >= 2 }
    val sumA = strata.map(_._2).sum
    val sumE = strata.map { case (na, xa, nb, xb) =>
      na * (xa + xb) / (na + nb).toDouble }.sum
    val sumV = strata.map { case (na, xa, nb, xb) =>
      na.toDouble * nb * (xa + xb) * ((na - xa) + (nb - xb)) /
        ((na + nb).toDouble * (na + nb) * (na + nb - 1)) }.sum
    val orN = strata.map { case (na, xa, nb, xb) =>
      xa * (nb - xb).toDouble / (na + nb) }.sum
    val orD = strata.map { case (na, xa, nb, xb) =>
      xb * (na - xa).toDouble / (na + nb) }.sum
    assert(out.getLong(0) == strata.length, "stratum count")
    assert(out.getLong(1) == sumA, "sum of A-arm conversions")
    assert(closeRel(out.getDouble(2), sumE, 1e-5), "expected sum")
    assert(closeRel(out.getDouble(3), sumV, 1e-5), "variance sum")
    val chi2 = (sumA - sumE) * (sumA - sumE) / sumV
    assert(closeRel(out.getDouble(4), chi2, 1e-4), "chi2")
    assert(closeRel(out.getDouble(5), orN / orD, 1e-4), "MH odds ratio")
    assert(out.getDouble(4) < 3.841,
      "null fixture: CMH correctly refuses to declare a winner")
  }
}
