package graft

import org.apache.spark.sql.functions._
import graft.queries.GraphQueries
import graft.graph.WebGraph

/** Wave-53 graph operators: sampled Brandes betweenness (q261),
  * effective diameter (q262), Luby MIS (q263) — each cross-checked by
  * a textbook driver-side recompute over the collected host graph.
  */
class W53OpsSpec extends GraftSpec {

  private def hostGraph(): (Seq[(String, String)], Seq[String]) = {
    val edges = WebGraph.cachedHostEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    (edges, verts)
  }

  private def h32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16)
  }

  test("q261: betweenness matches a textbook Brandes recompute") {
    val rows = GraphQueries.q261Betweenness(spark, sfDir).collect()
    val (edges, verts) = hostGraph()
    val adj = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val seeds = verts.take(GraphQueries.BetweennessSeeds)
    val R = GraphQueries.BetweennessRounds
    val bc = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    seeds.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      val levels = scala.collection.mutable.Map(0 -> Seq(s))
      for (l <- 1 to R) {
        val frontier = scala.collection.mutable.ArrayBuffer.empty[String]
        levels.getOrElse(l - 1, Seq.empty).foreach { u =>
          adj.getOrElse(u, Seq.empty).foreach { w =>
            if (!dist.contains(w)) { dist(w) = l; frontier += w }
          }
        }
        levels(l) = frontier.distinct.toSeq
        levels(l).foreach(w => sigma(w) = 0L)
        levels(l - 1).foreach { u =>
          adj.getOrElse(u, Seq.empty).foreach { w =>
            if (dist.get(w).contains(l)) sigma(w) += sigma(u)
          }
        }
      }
      val delta = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      for (l <- (R - 1) to 0 by -1) {
        levels.getOrElse(l, Seq.empty).foreach { v =>
          var acc = BigDecimal(0)
          adj.getOrElse(v, Seq.empty).foreach { w =>
            if (dist.get(w).contains(l + 1))
              acc += BigDecimal(sigma(v).toDouble / sigma(w) * (1 + delta(w)))
                .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }
          delta(v) = acc.toDouble
          if (v != s) bc(v) += delta(v)
        }
      }
    }
    assert(rows.length === verts.length)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - bc(r.getString(0))) < 1e-4,
        s"betweenness of ${r.getString(0)}")
    }
    assert(rows.count(_.getDouble(1) > 0) > verts.length / 2,
      "the dense fixture graph must have broad nonzero betweenness")
  }

  test("q262: the distance distribution matches a driver BFS recompute") {
    val rows = GraphQueries.q262EffDiameter(spark, sfDir).collect()
    val (edges, verts) = hostGraph()
    val adj = edges.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val seeds = verts.take(GraphQueries.EffDiamSeeds)
    val dists = scala.collection.mutable.ArrayBuffer.empty[Long]
    seeds.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0L)
      var frontier = Seq(s)
      var l = 0L
      while (frontier.nonEmpty && l < GraphQueries.EffDiamMaxRounds) {
        l += 1
        frontier = frontier.flatMap(u => adj.getOrElse(u, Seq.empty))
          .distinct.filterNot(dist.contains)
        frontier.foreach(w => dist(w) = l)
      }
      dists ++= dist.values.filter(_ > 0)
    }
    val hist = dists.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val nt = dists.length.toLong
    val mean = dists.sum.toDouble / nt
    val sortedD = hist.keys.toSeq.sorted
    val cum = sortedD.scanLeft(0L)((a, d) => a + hist(d)).tail
    val effD = sortedD.zip(cum)
      .find(_._2 >= math.ceil(0.9 * nt).toLong).get._1
    assert(rows.length === hist.size)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) === hist(d), s"count at hop $d")
      assert(r.getLong(3) === effD, "effective diameter")
      assert(math.abs(r.getDouble(4) - mean) < 1e-5, "mean distance")
    }
    val shares = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(math.abs(shares.last - 1.0) < 1e-9, "cumulative share ends at 1")
    assert(shares.sameElements(shares.sorted), "cumulative share is monotone")
  }

  test("q263: the MIS is independent, maximal, and an exact hash replay") {
    val rows = GraphQueries.q263Mis(spark, sfDir).collect()
    val (edges, verts) = hostGraph()
    val und = (edges ++ edges.map(e => (e._2, e._1)))
      .filter(e => e._1 != e._2).distinct
    val nbrs = und.groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2).toSet }
    // driver Luby replay with the same hash priorities
    var alive = verts.toSet
    val mis = scala.collection.mutable.Map.empty[String, Int]
    for (r <- 1 to GraphQueries.MisRounds) {
      val pri = alive.map(v => v -> h32(s"mis:$r:$v")).toMap
      val sel = alive.filter { v =>
        nbrs.getOrElse(v, Set.empty).filter(alive).forall { n =>
          pri(n) > pri(v) || (pri(n) == pri(v) && n >= v)
        }
      }
      sel.foreach(v => mis(v) = r)
      alive = alive -- sel -- sel.flatMap(v => nbrs.getOrElse(v, Set.empty))
    }
    assert(rows.length === verts.length)
    rows.foreach { r =>
      val v = r.getString(0)
      assert(r.getBoolean(1) === mis.contains(v), s"membership of $v")
      assert(r.getInt(2) === mis.getOrElse(v, -1), s"round of $v")
      assert(r.getLong(3) === alive.size.toLong, "unresolved count")
    }
    // independence: no two members adjacent
    val members = mis.keySet
    assert(!und.exists(e => members(e._1) && members(e._2)),
      "MIS members must not be adjacent")
    // maximality (when fully resolved): every non-member has a member neighbor
    if (alive.isEmpty) {
      verts.filterNot(members).foreach { v =>
        assert(nbrs.getOrElse(v, Set.empty).exists(members),
          s"non-member $v must have a MIS neighbor")
      }
    }
    assert(members.nonEmpty)
  }
}
