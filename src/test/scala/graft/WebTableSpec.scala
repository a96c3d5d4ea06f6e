package graft

import org.apache.spark.sql.functions._
import graft.graph.{LinkRank, WebGraph}
import graft.sources.WebTable

/** Nutch2 webpage-table model: edges→table→edges roundtrip, score
  * write-back, and the parquet IO path (Nutch2Webpage In/OutputFormat
  * semantics on columnar storage).
  */
class WebTableSpec extends GraftSpec {

  test("edges -> webtable -> edges preserves the edge set (sf0.001)") {
    val edges = WebGraph.cachedEdges(spark, sfDir)
    val table = WebTable.fromEdges(edges)
    val back = WebTable.toEdges(table)
    assert(back.count() === edges.count())
    assert(back.except(edges).count() === 0)
    assert(edges.except(back).count() === 0)
  }

  test("rank scores write back and survive a parquet roundtrip") {
    val edges = WebGraph.cachedEdges(spark, sfDir)
    val ranks = LinkRank.run(spark, edges, LinkRank.uniformInit(edges))
    val table = WebTable.fromEdges(edges, Some(ranks))
    val dir = java.nio.file.Files.createTempDirectory("graft_webtable").toString
    WebTable.write(table, dir)
    val readBack = WebTable.read(spark, dir)
    assert(readBack.count() === table.count())
    // key is the reversed url (reference HBase row-key form)
    val row = readBack.filter(col("outlinks").isNotNull).first()
    assert(row.getAs[String]("key").contains(":http"))
    // scores joined back match the rank output
    val joined = WebTable.toVertices(readBack)
      .join(ranks.toDF("id", "want"), "id")
      .filter(abs(col("score") - col("want")) > 1e-12)
    assert(joined.count() === 0)
  }
}
