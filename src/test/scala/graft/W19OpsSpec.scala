package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, RelationalQueries}
import graft.graph.WebGraph

/** Wave-9 operators (q150–q151): snapshot diff reconciliation and
  * deterministic random-walk corpus generation.
  */
class W19OpsSpec extends GraftSpec {

  test("q150 diff classes match the feed rules exactly") {
    val got = RelationalQueries.q150TableDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val deleted = ids.count(_ % 21 == 0).toLong
    val changed = ids.count(i => i % 9 == 0 && i % 21 != 0).toLong
    val added = ids.count(_ % 13 == 0).toLong
    val unchanged = ids.length - deleted - changed
    assert(got("deleted")._1 === deleted)
    assert(got("changed")._1 === changed)
    assert(got("added")._1 === added)
    assert(got("unchanged")._1 === unchanged)
    // matched classes carry identical key sums on both sides; one-sided
    // classes carry zero on the absent side
    assert(got("changed")._2 === got("changed")._3)
    assert(got("unchanged")._2 === got("unchanged")._3)
    assert(got("added")._2 === 0L && got("deleted")._3 === 0L)
    assert(got("deleted")._2 === ids.filter(_ % 21 == 0).sum)
  }

  test("q151 walks follow real edges and replay the hash-pick on the driver") {
    val rows = GraphQueries.q151RandomWalks(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(2)) -> r.getString(1)).toMap
    val hedges = WebGraph.cachedHostEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj: Map[String, Seq[String]] = hedges.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.map(_._2).sorted: Seq[String])
    }
    val hosts = (hedges.map(_._1) ++ hedges.map(_._2)).distinct
    // every host starts exactly one walk
    assert(rows.keys.count(_._2 == 0) === hosts.length)
    hosts.foreach(h => assert(rows((h, 0)) === h))
    // deterministic replay: hash32 = first 8 md5 hex chars of "id#step"
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    rows.toSeq.sortBy(x => (x._1._1, x._1._2)).foreach { case ((wid, step), host) =>
      if (step > 0) {
        val prev = rows((wid, step - 1))
        val nbrs = adj.getOrElse(prev, Seq.empty[String])
        assert(nbrs.nonEmpty, s"walk $wid stepped from dangling $prev")
        val want = nbrs((h32(s"$wid#$step") % nbrs.length).toInt)
        assert(host === want, s"walk $wid step $step pick")
      }
    }
    // a walk either runs the full length or stops at a dangling host
    rows.keys.groupBy(_._1).foreach { case (wid, ks) =>
      val steps = ks.map(_._2).toSeq.sorted
      assert(steps === (0 to steps.max), s"walk $wid contiguous steps")
      if (steps.max < GraphQueries.WalkLen)
        assert(!adj.contains(rows((wid, steps.max))),
          s"walk $wid stopped early at a non-dangling host")
    }
  }
}
