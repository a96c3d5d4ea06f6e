package graft

import org.apache.spark.sql.functions._
import graft.queries.TimeseriesQueries

/** Wave-66 operators: log-rank survival test (q300), SAX symbolic
  * discretization (q301) — each cross-checked by an INDEPENDENT
  * driver-side formulation (an independent-md5 per-death-time 2×2
  * recompute; a plain z/PAA/breakpoint loop).
  */
class W66OpsSpec extends GraftSpec {

  private def closeRel(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def arm1(uid: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab:$uid".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 2 == 0
  }

  test("q300: logrank replays a per-death-time 2x2 recompute; null stays quiet") {
    val out = TimeseriesQueries.q300Logrank(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val corpusEnd = ev.map(_._2).max
    val hourUs = TimeseriesQueries.KmHourUs
    val subj = ev.groupBy(_._1).map { case (uid, es) =>
      val f = es.map(_._2).min
      val p = es.filter(_._3 == "purchase").map(_._2).sorted.headOption
      val t = p.map(x => (x - f) / hourUs).getOrElse((corpusEnd - f) / hourUs)
      (if (arm1(uid)) 1 else 0, t, if (p.isDefined) 1L else 0L)
    }.toSeq
    val deathTimes = subj.filter(_._3 == 1L).map(_._2).distinct.sorted
    var o1 = 0L; var e1 = 0.0; var v = 0.0; var nTimes = 0
    deathTimes.foreach { t =>
      val n1 = subj.count(s => s._1 == 1 && s._2 >= t).toLong
      val n0 = subj.count(s => s._1 == 0 && s._2 >= t).toLong
      val d1 = subj.count(s => s._1 == 1 && s._2 == t && s._3 == 1L).toLong
      val d0 = subj.count(s => s._1 == 0 && s._2 == t && s._3 == 1L).toLong
      if (d1 + d0 > 0 && n1 + n0 >= 2) {
        nTimes += 1
        o1 += d1
        e1 += n1 * (d1 + d0) / (n1 + n0).toDouble
        v += n1.toDouble * n0 * (d1 + d0) * ((n1 + n0) - (d1 + d0)) /
          ((n1 + n0).toDouble * (n1 + n0) * (n1 + n0 - 1))
      }
    }
    assert(out.getLong(0) == nTimes && out.getLong(1) == o1)
    assert(closeRel(out.getDouble(2), e1, 1e-5), "E1")
    assert(closeRel(out.getDouble(3), v, 1e-5), "V")
    assert(closeRel(out.getDouble(4), (o1 - e1) * (o1 - e1) / v, 1e-4), "chi2")
    assert(out.getDouble(4) < 3.841, "null fixture: no survival split")
  }

  test("q301: words replay a plain z/PAA/breakpoint loop; motifs counted") {
    val out = TimeseriesQueries.q301Sax(spark, sfDir).collect()
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        expr("(ts div 3600000000000) % 24").as("hr")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val series = hourly.keys.map(k => (k._1, k._2)).toSeq.distinct
    val breaks = TimeseriesQueries.SaxBreaks.map(_.toDouble)
    val words = series.map { case (et, d) =>
      val cnt = (0L to 23L).map(h => hourly.getOrElse((et, d, h), 0L))
      val mu = cnt.sum / 24.0
      val m2 = cnt.map(c => c * c).sum / 24.0
      val sd2 = m2 - mu * mu
      val word = (0 until TimeseriesQueries.SaxSegments).map { s =>
        val paa = cnt.slice(s * 4, s * 4 + 4).sum / 4.0
        val z = if (sd2 > 0) (paa - mu) / math.sqrt(sd2) else 0.0
        ('a' + breaks.count(z >= _)).toChar
      }.mkString
      (et, d) -> word
    }.toMap
    val wc = words.values.toSeq.groupBy(identity)
    val perType = words.groupBy(_._1._1).map { case (et, m) =>
      et -> m.values.toSeq.groupBy(identity).map { case (w, v) => w -> v.length }
    }
    assert(out.length == series.length)
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(r.getString(2) == words(k), s"word$k")
      assert(r.getLong(3) == perType(k._1)(words(k)).toLong, s"word_days$k")
      assert(r.getString(2).length == TimeseriesQueries.SaxSegments)
      assert(r.getString(2).forall(c => c >= 'a' && c <= 'd'))
    }
    assert(wc.nonEmpty)
  }
}
