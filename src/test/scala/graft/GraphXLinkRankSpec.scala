package graft

import graft.graph.{GraphXLinkRank, LinkRank, WebGraph}

/** The GraphX-Pregel backend must agree with the DataFrame engine —
  * on the reference's gold fixtures AND on the derived web graph.
  */
class GraphXLinkRankSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def gx(edges: Seq[(String, String)]): Map[String, Double] =
    GraphXLinkRank.run(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("GraphX backend reproduces the reference gold numbers") {
    val s = gx(Seq("a" -> "b", "b" -> "c", "a" -> "c"))
    assert(math.abs(s("a") - 1.3515060339386287) < 1e-3, s)
    assert(math.abs(s("b") - 4.144902009567587) < 1e-3, s)
    assert(math.abs(s("c") - 9.06389778197704) < 1e-3, s)
    val t = gx(Seq("a" -> "b", "b" -> "a"))
    assert(math.abs(t("a") - 5.0) < 1e-3 && math.abs(t("b") - 5.0) < 1e-3, t)
  }

  test("GraphX and DataFrame backends agree on the derived graph (sf0.001)") {
    val edges = WebGraph.cachedEdges(spark, sfDir)
    val df = LinkRank.run(spark, edges, LinkRank.uniformInit(edges))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gxm = GraphXLinkRank.run(spark, edges)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df.keySet === gxm.keySet)
    df.foreach { case (id, v) =>
      assert(math.abs(v - gxm(id)) < 1e-9, s"$id: df=$v gx=${gxm(id)}")
    }
  }
}
