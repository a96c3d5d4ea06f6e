package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MultimodalQueries
import graft.queries.MlEvalQueries

/** Wave-62 operators: banded pHash near-dup join (q288),
  * difference-in-differences (q289), two-way fixed effects (q290) —
  * each cross-checked by an INDEPENDENT driver-side formulation: an
  * ALL-PAIRS plain-Scala pHash scan (proving the banded candidate
  * stage lossless at the pigeonhole radius), an independent-md5 DiD
  * recompute, and a dense demeaning loop.
  */
class W62OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def arm(uid: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$uid".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    if (java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0) "A" else "B"
  }

  private def phash(text: String): (Long, Long) = {
    val codes = text.map(_.toLong)
    val L = codes.length.toLong
    val total = codes.sum
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64) {
      val s = (b * L / 64).toInt
      val e = ((b + 1) * L / 64).toInt
      val cnt = (e - s).toLong
      val blockSum = codes.slice(s, e).sum
      if (blockSum * L > total * cnt) {
        if (b < 32) lo |= (1L << b) else hi |= (1L << (b - 32))
      }
    }
    (lo, hi)
  }

  test("q288: banded candidates are lossless vs an all-pairs pHash scan") {
    val out = MultimodalQueries.q288PhashNear(spark, sfDir).collect()
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.filter(_._1 % 10 == 0).map { case (id, t) =>
      val m = t.length / 2
      (id + MultimodalQueries.PhashNearOffset,
        t.substring(0, m) + "Z" + t.substring(m + 1))
    }
    val sigs = corpus.filter(_._2.length >= graft.plans.PhashMath.Pixels)
      .map { case (id, t) => id -> phash(t) }.sortBy(_._1)
    val expected = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2._1 ^ sigs(j)._2._1) +
        java.lang.Long.bitCount(sigs(i)._2._2 ^ sigs(j)._2._2)
      if h <= MultimodalQueries.PhashHammingMax
    } yield (sigs(i)._1, sigs(j)._1) -> h).toMap
    assert(out.length == expected.size,
      s"banded join found ${out.length} pairs, all-pairs found ${expected.size}")
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(expected.contains(key), s"unexpected pair $key")
      assert(r.getInt(2) == expected(key), s"hamming$key")
      assert(r.getBoolean(3) == (expected(key) == 0))
    }
    assert(out.exists(!_.getBoolean(3)),
      "the one-char twins produce genuinely NEAR (nonzero-distance) matches")
    assert(out.exists(_.getBoolean(3)), "hamming-0 twins exist too")
  }

  test("q289: DiD replays an independent-md5 four-cell recompute; null fixture quiet") {
    val out = MlEvalQueries.q289Did(spark, sfDir).collect().head
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(e => (e._1, e._2)).map { case ((u, d), es) =>
        (u, d, if (es.exists(_._3 == "purchase")) 1L else 0L)
      }.toSeq
    val mid = (ud.map(_._2).min + ud.map(_._2).max) / 2
    def cell(a: String, post: Boolean) = {
      val rows = ud.filter(r => arm(r._1) == a && (r._2 > mid) == post)
      (rows.length.toLong, rows.map(_._3).sum)
    }
    val (na0, xa0) = cell("A", post = false); val (na1, xa1) = cell("A", post = true)
    val (nb0, xb0) = cell("B", post = false); val (nb1, xb1) = cell("B", post = true)
    val (pa0, pa1) = (xa0.toDouble / na0, xa1.toDouble / na1)
    val (pb0, pb1) = (xb0.toDouble / nb0, xb1.toDouble / nb1)
    val did = (pa1 - pa0) - (pb1 - pb0)
    val se = math.sqrt(pa0 * (1 - pa0) / na0 + pa1 * (1 - pa1) / na1 +
      pb0 * (1 - pb0) / nb0 + pb1 * (1 - pb1) / nb1)
    assert(out.getLong(0) == na0 && out.getLong(1) == na1)
    assert(out.getLong(2) == nb0 && out.getLong(3) == nb1)
    Seq(pa0, pa1, pb0, pb1).zipWithIndex.foreach { case (p, i) =>
      assert(closeRel(out.getDouble(4 + i), p, 1e-5), s"rate $i") }
    assert(closeRel(out.getDouble(8), did, 1e-4), "did")
    assert(closeRel(out.getDouble(9), se, 1e-4), "se")
    assert(math.abs(out.getDouble(10)) < 1.96,
      "null fixture: DiD correctly reads no differential shift")
  }

  test("q290: within-estimator replays a dense demeaning loop; FE differs from pooled") {
    val out = MlEvalQueries.q290FixedEffects(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        col("event_type"), round(col("value"), 6).as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val panel = ev.groupBy(e => (e._1, e._2)).map { case ((u, d), es) =>
      (u, d, es.length.toDouble,
        es.filter(_._3 == "purchase").map(e => BigDecimal(e._4)).sum.toDouble)
    }.toSeq
    val n = panel.length
    val xg = panel.map(_._3).sum / n
    val yg = panel.map(_._4).sum / n
    val xu = panel.groupBy(_._1).map { case (u, v) => u -> v.map(_._3).sum / v.length }
    val yu = panel.groupBy(_._1).map { case (u, v) => u -> v.map(_._4).sum / v.length }
    val xd = panel.groupBy(_._2).map { case (d, v) => d -> v.map(_._3).sum / v.length }
    val yd = panel.groupBy(_._2).map { case (d, v) => d -> v.map(_._4).sum / v.length }
    val (sxyW, sxxW) = panel.foldLeft((0.0, 0.0)) { case ((sy, sx), (u, d, x, y)) =>
      val xt = x - xu(u) - xd(d) + xg
      val yt = y - yu(u) - yd(d) + yg
      (sy + xt * yt, sx + xt * xt)
    }
    val sxy = panel.map(p => p._3 * p._4).sum
    val sxx = panel.map(p => p._3 * p._3).sum
    val pooled = (sxy - n * xg * yg) / (sxx - n * xg * xg)
    assert(out.getLong(0) == n)
    assert(out.getLong(1) == panel.map(_._1).distinct.length)
    assert(out.getLong(2) == panel.map(_._2).distinct.length)
    assert(closeRel(out.getDouble(3), pooled, 1e-5), "pooled beta")
    assert(closeRel(out.getDouble(4), sxyW / sxxW, 1e-5), "within beta")
    assert(math.abs(out.getDouble(3) - out.getDouble(4)) > 1e-3,
      "fixed effects absorb real confounding on the fixture")
  }
}
