package graft

import org.apache.spark.sql.functions._
import graft.queries.{GraphQueries, RelationalQueries, TimeseriesQueries}
import graft.text.TextQueries
import graft.graph.{Bfs, MultiBfs, WebGraph}

/** Wave-4 operators (q135–q138): sampled closeness, community
  * modularity, burst episodes, byte-weighted quantiles. Each test
  * recomputes the semantics independently (K single-seed BFS runs,
  * driver-side walks, closed forms).
  */
@SlowSuite
class W14OpsSpec extends GraftSpec {

  test("MultiBfs one-loop distances equal K independent single-seed Bfs runs") {
    val hedges = WebGraph.cachedHostEdges(spark, sfDir)
    val verts = WebGraph.vertices(hedges)
    val seeds = verts.orderBy(col("id")).limit(GraphQueries.ClosenessSeeds)
    val got = MultiBfs.run(hedges, seeds, GraphQueries.ClosenessMaxRounds)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val seedIds = seeds.collect().map(_.getString(0))
    seedIds.foreach { s =>
      val one = Bfs.run(hedges, verts,
        verts.filter(col("id") === s), GraphQueries.ClosenessMaxRounds)
        .collect().filterNot(_.isNullAt(1))
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val mine = got.collect { case ((id, seed), d) if seed == s => id -> d }
      assert(mine === one, s"seed $s distance field")
    }
  }

  test("q135 closeness is the integer ratio of the per-seed distance sums") {
    val rows = GraphQueries.q135Closeness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, c) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      if (n == 0) { assert(s === 0L); assert(c === 0.0) }
      else {
        assert(s >= n, "every reached seed is >= 1 hop away")
        assert(math.abs(c - BigDecimal(n.toDouble / s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      }
      assert(n <= GraphQueries.ClosenessSeeds.toLong)
    }
    // seeds themselves reach each other: some host reaches all K seeds
    // minus itself or better
    assert(rows.map(_.getLong(1)).max >= 1L)
  }

  test("q136 modularity contributions recompute from labels and edges on the driver") {
    val rows = GraphQueries.q136Modularity(spark, sfDir).collect()
    val labels = GraphQueries.q78LabelProp(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (if (r.getLong(1) >= 0) s"c${r.getLong(1)}" else s"v:${r.getString(0)}")).toMap
    val und = WebGraph.cachedHostEdges(spark, sfDir)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val m = und.length.toLong
    val eIn = und.filter { case (u, v) => labels(u) == labels(v) }
      .groupBy { case (u, _) => labels(u) }.map { case (c, xs) => c -> xs.length.toLong }
    val deg = und.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (id, xs) => id -> xs.length.toLong }
    val degC = deg.toSeq.groupBy { case (id, _) => labels(id) }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    assert(rows.map(_.getString(0)).toSet === degC.keySet)
    var q = 0.0
    rows.foreach { r =>
      val c = r.getString(0)
      assert(r.getLong(2) === eIn.getOrElse(c, 0L), s"$c e_in")
      assert(r.getLong(3) === degC(c), s"$c deg_sum")
      val want = (4.0 * m * eIn.getOrElse(c, 0L) - degC(c).toDouble * degC(c)) /
        (4.0 * m * m)
      assert(math.abs(r.getDouble(4) - want) < 1e-6, s"$c contribution")
      q += r.getDouble(4)
    }
    assert(q > -0.5 && q <= 1.0, s"modularity $q out of range")
    // degree mass is complete: sum of community degrees = 2m
    assert(degC.values.sum === 2 * m)
  }

  test("q137 bursts: the injected surge is detected and flags replay on the driver") {
    val rows = TimeseriesQueries.q137Bursts(spark, sfDir).collect()
    // at least one episode must intersect the injected 3-hour window
    assert(rows.exists(r =>
      r.getLong(2) <= TimeseriesQueries.BurstHourEnd &&
        r.getLong(3) >= TimeseriesQueries.BurstHourStart),
      "injected surge not detected")
    // driver-side replay of the full flag pipeline on zero-filled series
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val h1 = ev.map(_._2).max
    val types = ev.map(_._1).distinct
    val want = types.flatMap { t =>
      val counts = ev.filter(_._1 == t).groupBy(_._2)
        .map { case (h, xs) =>
          val amp = if (h >= TimeseriesQueries.BurstHourStart &&
            h <= TimeseriesQueries.BurstHourEnd) TimeseriesQueries.BurstAmp else 1
          h -> xs.length.toLong * amp
        }
      val series = (h0 to h1).map(h => h -> counts.getOrElse(h, 0L))
      val flags = series.zipWithIndex.collect {
        case ((h, c), i) if i >= TimeseriesQueries.BurstBaselineHours &&
          c * TimeseriesQueries.BurstBaselineHours >=
            TimeseriesQueries.BurstFactor *
              series.slice(i - TimeseriesQueries.BurstBaselineHours, i).map(_._2).sum &&
          c >= TimeseriesQueries.BurstMinCount => (h, c)
      }
      // islands
      val episodes = flags.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc @ (cur :: rest), f) if f._1 == cur.head._1 + 1 => (f :: cur) :: rest
        case (acc, f) => List(f) :: acc
      }.reverse.map(_.reverse)
      episodes.map(e => (t, e.head._1, e.last._1, e.length.toLong,
        e.map(_._2).max, e.map(_._2).sum))
    }.toSet
    val gotSet = rows.map(r => (r.getString(0), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(gotSet === want)
  }

  test("q138 weighted quantiles replay the cumulative-mass walk and bracket the mean") {
    val rows = TextQueries.q138WeightedQuantiles(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_.getString(0)).toSet === docs.map(_._1).toSet)
    rows.foreach { r =>
      val lang = r.getString(0)
      val lens = docs.filter(_._1 == lang).map(_._2).sorted
      val w = lens.sum
      assert(r.getLong(1) === lens.length.toLong)
      assert(r.getLong(2) === w)
      def wq(pct: Int): Long = {
        var cum = 0L
        lens.find { l => cum += l; cum * 100 >= pct.toLong * w }.get
      }
      // driver walk counts duplicate lengths one at a time, the query
      // per distinct value — identical crossing point
      assert(r.getLong(3) === wq(25), s"$lang wp25")
      assert(r.getLong(4) === wq(50), s"$lang wp50")
      assert(r.getLong(5) === wq(75), s"$lang wp75")
      assert(r.getLong(6) === wq(90), s"$lang wp90")
      assert(r.getLong(3) <= r.getLong(4) && r.getLong(4) <= r.getLong(5) &&
        r.getLong(5) <= r.getLong(6))
    }
  }
}
