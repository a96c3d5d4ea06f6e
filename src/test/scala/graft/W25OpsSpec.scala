package graft

import org.apache.spark.sql.functions._
import graft.ann.AnnQueries
import graft.graph.WebGraph
import graft.multimodal.MultimodalQueries
import graft.queries.GraphQueries

/** Wave-25 operators (q164–q166): bow-tie decomposition, shot-boundary
  * detection, product quantization. Each test replays the operator on
  * the driver from first principles.
  */
class W25OpsSpec extends GraftSpec {

  test("q164 bow-tie classes match a driver-side closure computation") {
    val rows = GraphQueries.q164Bowtie(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val edges = WebGraph.cachedHostEdges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    assert(rows.keySet === verts.toSet)
    // driver-side reachability closure (BFS per vertex; 200 hosts max)
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    def reach(from: Set[String]): Set[String] = {
      var seen = from
      var frontier = from
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        seen ++= next
        frontier = next
      }
      seen
    }
    val fwdOf = verts.map(v => v -> reach(Set(v))).toMap
    // SCC: mutual reachability classes
    val comp = verts.map { v =>
      v -> verts.filter(w => fwdOf(v)(w) && fwdOf(w)(v)).min
    }.toMap
    val bySize = comp.groupBy(_._2).map { case (c, m) => c -> m.size }
    val maxSize = bySize.values.max
    val coreLab = bySize.filter(_._2 == maxSize).keys.min
    val core = verts.filter(v => comp(v) == coreLab).toSet
    val fwd = reach(core)
    val radj = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).toSet }
    def rreach(from: Set[String]): Set[String] = {
      var seen = from; var frontier = from
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => radj.getOrElse(v, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val bwd = rreach(core)
    val inSet = bwd -- core
    val outSet = fwd -- core
    val fIn = reach(inSet)
    val bOut = rreach(outSet)
    verts.foreach { v =>
      val want =
        if (core(v)) "core"
        else if (bwd(v)) "in"
        else if (fwd(v)) "out"
        else if (fIn(v) && bOut(v)) "tube"
        else if (fIn(v) || bOut(v)) "tendril"
        else "disconnected"
      assert(rows(v) === want, s"host $v")
    }
    assert(rows.values.count(_ == "core") == maxSize)
    // IN and OUT are disjoint by the mutual-reach argument
    assert(rows.filter(_._2 == "in").keySet
      .intersect(rows.filter(_._2 == "out").keySet).isEmpty)
  }

  test("bowtie engine separates all six classes on a synthetic graph") {
    // a<->b core; i->a (IN); b->o (OUT); i->t (tendril); i->u->o (tube);
    // x->y (disconnected)
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("i", "a"), ("b", "o"),
      ("i", "t"), ("i", "u"), ("u", "o"), ("x", "y")
    ).toDF("src", "dst")
    val cls = graft.graph.Bowtie.run(spark, edges, sccIters = 10, maxRounds = 10)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cls === Map(
      "a" -> "core", "b" -> "core", "i" -> "in", "o" -> "out",
      "t" -> "tendril", "u" -> "tube", "x" -> "disconnected",
      "y" -> "disconnected"))
  }

  test("q165 shot boundaries replay the luma-jump walk on the driver") {
    val rows = MultimodalQueries.q165Shots(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val texts = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet === texts.filter(_._2.nonEmpty).keySet)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    texts.foreach { case (id, t) =>
      if (t.nonEmpty) {
        val L = MultimodalQueries.ShotFrameLen
        val n = (t.length + L - 1) / L
        val luma = (0 until n).map { i =>
          h32(t.substring(i * L, math.min((i + 1) * L, t.length))) % 1000
        }
        val cuts = (1 until n).count(i =>
          math.abs(luma(i) - luma(i - 1)) >= MultimodalQueries.ShotCut)
        val shotLens = scala.collection.mutable.ListBuffer.empty[Int]
        var cur = 1
        (1 until n).foreach { i =>
          if (math.abs(luma(i) - luma(i - 1)) >= MultimodalQueries.ShotCut) {
            shotLens += cur; cur = 1
          } else cur += 1
        }
        shotLens += cur
        val (gn, gshots, glong, gmean, grate) = rows(id)
        assert(gn === n.toLong, s"doc $id frames")
        assert(gshots === shotLens.length.toLong, s"doc $id shots (cuts=$cuts)")
        assert(glong === shotLens.max.toLong, s"doc $id longest")
        assert(math.abs(gmean - n.toDouble / shotLens.length) < 1e-6)
        val rate = if (n > 1) cuts.toDouble / (n - 1) else 0.0
        assert(math.abs(grate - rate) < 1e-6, s"doc $id cut rate")
      }
    }
  }

  test("q166 PQ codebook census replays a driver-side Lloyd fit") {
    val rows = AnnQueries.q166Pq(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // universal hash constants must match MathFunctions
    import graft.functions.{MathFunctions => M}
    def uh(id: Long): Long = {
      val x = (M.hashA(AnnQueries.PqSeed) * id + M.hashB(AnnQueries.PqSeed)) % M.HashP
      if (x < 0) x + M.HashP else x
    }
    val seedIds = vecs.map(_._1).sortBy(id => (uh(id), id))
      .take(AnnQueries.PqK)
    val subDim = AnnQueries.PqSubDim
    for (m <- 0 until AnnQueries.PqSubs) {
      val subs = vecs.map { case (id, v) => id -> v.slice(m * subDim, (m + 1) * subDim) }
      var cents: Seq[(Long, Array[Double])] =
        seedIds.map(id => id -> subs.find(_._1 == id).get._2).toSeq
      def assign(cs: Seq[(Long, Array[Double])]) = subs.map { case (id, sv) =>
        val (cid, d2) = cs.map { case (c, cv) =>
          (c, r6(sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum))
        }.minBy { case (c, d) => (d, c) }
        (id, cid, sv, d2)
      }
      for (_ <- 1 to AnnQueries.PqIters) {
        cents = assign(cents).groupBy(_._2).toSeq.map { case (cid, xs) =>
          val n = xs.length
          cid -> (0 until subDim).map(i =>
            r6(xs.map(_._3(i)).sum / n)).toArray
        }
      }
      val fin = assign(cents)
      fin.groupBy(_._2).foreach { case (cid, xs) =>
        val (gn, gd2) = rows((m, cid))
        assert(gn === xs.length.toLong, s"m=$m cid=$cid population")
        assert(math.abs(gd2 - xs.map(_._4).sum / xs.length) < 1e-5,
          s"m=$m cid=$cid distortion")
      }
      assert(rows.keys.count(_._1 == m) === fin.map(_._2).distinct.length)
    }
    // whole-corpus invariant: every subspace assigns every vector
    (0 until AnnQueries.PqSubs).foreach { m =>
      assert(rows.collect { case ((mm, _), (n, _)) if mm == m => n }.sum
        === vecs.length.toLong)
    }
  }
}
