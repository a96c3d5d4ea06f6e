package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries}
import graft.ann.AnnQueries

/** Wave-45 operators (q226–q227): decile lift table, k-NN label
  * classification.
  */
class W45OpsSpec extends GraftSpec {

  test("q226 lift table: cumulative identities hold and top-decile lift beats 1") {
    val rows = MlEvalQueries.q226LiftTable(spark, sfDir).collect()
      .sortBy(-_.getInt(0))
    assert(rows.nonEmpty && rows.length <= 10)
    val tu = rows.map(_.getLong(1)).sum
    val tc = rows.map(_.getLong(2)).sum
    // cumulative columns really accumulate top-down
    var cu = 0L; var cc = 0L
    rows.foreach { r =>
      cu += r.getLong(1); cc += r.getLong(2)
      assert(r.getLong(4) === cu, s"cum_users bin ${r.getInt(0)}")
      assert(r.getLong(5) === cc, s"cum_conv bin ${r.getInt(0)}")
      assert(math.abs(r.getDouble(6) -
        (cc.toDouble * tu) / (cu.toDouble * tc)) < 1e-5, "lift identity")
      assert(math.abs(r.getDouble(7) - cc.toDouble / tc) < 1e-6, "capture")
    }
    // the last (full-population) row has lift exactly 1 and capture 1
    val last = rows.last
    assert(math.abs(last.getDouble(6) - 1.0) < 1e-6)
    assert(math.abs(last.getDouble(7) - 1.0) < 1e-6)
    // targeting the most active users must not be WORSE than random
    assert(rows.head.getDouble(6) >= 1.0 - 1e-6,
      s"top-bin lift ${rows.head.getDouble(6)}")
  }

  test("q227 knn classification replays the vote on the driver") {
    val rows = AnnQueries.q227KnnClassify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val knn = AnnQueries.q30KnnBrute(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val predicted = knn.groupBy(_._1).map { case (qid, ns) =>
      val votes = ns.groupBy(n => labels(n._2))
        .map { case (l, xs) =>
          l -> (xs.length, xs.map(x => BigDecimal(x._3)).sum) }
      val best = votes.toSeq
        .sortBy { case (l, (n, cs)) => (-n, -cs, l) }.head
      qid -> best._1
    }
    val census = predicted.groupBy(p => labels(p._1)).map { case (l, ps) =>
      l -> (ps.size.toLong, ps.count(p => p._2 == l).toLong) }
    assert(rows.map(_.getInt(0)).toSet === census.keySet)
    rows.foreach { r =>
      val (n, c) = census(r.getInt(0))
      assert(r.getLong(1) === n && r.getLong(2) === c, s"label ${r.getInt(0)}")
      assert(math.abs(r.getDouble(3) - c.toDouble / n) < 1e-6)
    }
  }
}
