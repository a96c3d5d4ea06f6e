package graft

import org.apache.spark.sql.functions._
import graft.dedup.DedupQueries
import graft.queries.MlEvalQueries

/** Wave-65 operators: IPF raking (q297), Fellegi–Sunter EM (q298),
  * the Qini uplift curve (q299) — each cross-checked by an
  * INDEPENDENT driver-side formulation (a dense sequential IPF loop;
  * a plain-double EM recursion over brute-forced pattern counts; an
  * independent-md5 cumulative-decile recompute).
  */
class W65OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def arm(uid: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$uid".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0
  }

  test("q297: weights replay a dense IPF loop; both margins converge") {
    val out = MlEvalQueries.q297Raking(spark, sfDir).collect()
    val cells = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("(ts div 3600000000000) % 24").as("hod"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val nAll = cells.map(_._2).sum.toDouble
    val types = cells.map(_._1._1).distinct.sorted
    val hods = cells.map(_._1._2).distinct.sorted
    var w = cells.map { case (k, _) => k -> 1.0 }.toMap
    for (_ <- 1 to MlEvalQueries.RakeRounds) {
      val rm = types.map { t =>
        t -> cells.filter(_._1._1 == t).map { case (k, n) => w(k) * n }.sum
      }.toMap
      w = w.map { case (k, v) => k -> v * ((nAll / types.length) / rm(k._1)) }
      val cm = hods.map { h =>
        h -> cells.filter(_._1._2 == h).map { case (k, n) => w(k) * n }.sum
      }.toMap
      w = w.map { case (k, v) => k -> v * ((nAll / hods.length) / cm(k._2)) }
    }
    assert(out.length == cells.length)
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(closeRel(r.getDouble(3), w(k), 1e-5), s"weight$k")
      assert(r.getDouble(3) > 0.0)
      assert(r.getDouble(4) <= 1e-4, "row margins converged")
    }
    // column margins converge too (not just the reported row error)
    val nMap = cells.toMap
    hods.foreach { h =>
      val mass = cells.filter(_._1._2 == h).map { case (k, n) => w(k) * n }.sum
      assert(math.abs(mass / (nAll / hods.length) - 1.0) < 1e-9, s"col margin $h")
    }
    assert(nMap.nonEmpty)
  }

  test("q298: EM replays a plain-double recursion over brute-forced patterns") {
    val out = DedupQueries.q298LinkageEm(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("len"),
        substring(col("text"), 1, DedupQueries.LkEmPrefix).as("pre"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3), r.getString(4)))
    val pats = scala.collection.mutable.Map.empty[(Int, Int, Int), Long]
    val byLang = docs.groupBy(_._2)
    byLang.values.foreach { ds =>
      val sorted = ds.sortBy(_._1)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length) {
        val (a, b) = (sorted(i), sorted(j))
        val g1 = if (a._3 == b._3) 1 else 0
        val g2 = if (10 * math.min(a._4, b._4) >= 9 * math.max(a._4, b._4)) 1 else 0
        val g3 = if (a._5 == b._5) 1 else 0
        val k = (g1, g2, g3)
        pats(k) = pats.getOrElse(k, 0L) + 1
      }
    }
    var (p, m, u) = (0.05, Array(0.9, 0.9, 0.9), Array(0.3, 0.3, 0.3))
    var post = Map.empty[(Int, Int, Int), Double]
    for (_ <- 1 to DedupQueries.LkEmRounds) {
      post = pats.keys.map { case k @ (g1, g2, g3) =>
        val gs = Seq(g1, g2, g3)
        val num = p * gs.zipWithIndex.map { case (g, i) =>
          if (g == 1) m(i) else 1 - m(i) }.product
        val den = (1 - p) * gs.zipWithIndex.map { case (g, i) =>
          if (g == 1) u(i) else 1 - u(i) }.product
        k -> num / (num + den)
      }.toMap
      val tot = pats.map { case (k, c) => c.toDouble }.sum
      val gm = pats.map { case (k, c) => c * post(k) }.sum
      p = gm / tot
      m = (0 until 3).map { i =>
        pats.map { case (k, c) =>
          c * post(k) * Seq(k._1, k._2, k._3)(i) }.sum / gm
      }.toArray
      u = (0 until 3).map { i =>
        pats.map { case (k, c) =>
          c * (1 - post(k)) * Seq(k._1, k._2, k._3)(i) }.sum / (tot - gm)
      }.toArray
    }
    assert(out.length == pats.size)
    out.foreach { r =>
      val k = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
      assert(r.getLong(3) == pats(k), s"count$k")
      assert(closeRel(r.getDouble(4), post(k), 1e-4), s"posterior$k")
      val gs = Seq(k._1, k._2, k._3)
      val wgt = math.log(gs.zipWithIndex.map { case (g, i) =>
        (if (g == 1) m(i) else 1 - m(i)) / (if (g == 1) u(i) else 1 - u(i))
      }.product)
      assert(closeRel(r.getDouble(5), wgt, 1e-3), s"weight$k")
    }
    // the EM separates: all-agree outranks all-disagree by a wide margin
    val byPat = out.map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
      r.getDouble(5))).toMap
    assert(byPat((1L, 1L, 1L)) > byPat((0L, 0L, 0L)) + 5.0)
  }

  test("q299: curve replays an independent-md5 cumulative recompute; null stays flat") {
    val out = MlEvalQueries.q299Qini(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("activity"),
        max(when(col("event_type") === "purchase" &&
          expr("ts div 86400000000000") === MlEvalQueries.AbLastDay, 1L)
          .otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // FROZEN value deciles (r10): exact interpolated percentiles of
    // activity, 6dp-gridded; decile = 10 − #{thresholds below activity}
    val acts = users.map(_._2.toDouble).sorted
    def pct(q: Double): Double = {
      val pos = q * (acts.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      val v = if (lo + 1 < acts.length) acts(lo) + (acts(lo + 1) - acts(lo)) * frac
              else acts(lo)
      math.floor(v * 1e6 + 0.5) / 1e6
    }
    val ths = (1 to 9).map(i => pct(i / 10.0))
    def decile(a: Long): Int = 10 - ths.count(a.toDouble > _)
    val byDec = users.groupBy(u => decile(u._2))
    val present = byDec.keys.toSeq.sorted
    assert(out.map(_.getInt(0)).toSeq == present, "decile key set")
    var nT = 0L; var xT = 0L; var nC = 0L; var xC = 0L
    out.foreach { r =>
      val us = byDec(r.getInt(0))
      val t = us.filter(u => arm(u._1))
      val c = us.filterNot(u => arm(u._1))
      nT += t.length; xT += t.map(_._3).sum
      nC += c.length; xC += c.map(_._3).sum
      assert(r.getLong(1) == nT && r.getLong(3) == nC, s"decile sizes")
      assert(r.getLong(2) == xT && r.getLong(4) == xC)
      val qini = xT - xC * (nT.toDouble / nC)
      assert(closeRel(r.getDouble(5), qini, 1e-5), s"qini@${r.getInt(0)}")
    }
    // null fixture: final cumulative uplift is a small fraction of conversions
    val last = out.last
    val totalConv = last.getLong(2) + last.getLong(4)
    assert(math.abs(last.getDouble(5)) <= math.max(5.0, 0.5 * totalConv),
      "no fabricated uplift on the null split")
  }
}
