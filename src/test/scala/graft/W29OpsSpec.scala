package graft

import org.apache.spark.sql.functions._
import graft.queries.{MlEvalQueries, RelationalQueries, StorageQueries}
import graft.text.TextQueries

/** Wave-29 operators (q176, q178, q179): DP release, RFM segmentation,
  * schema-evolution merge read.
  */
class W29OpsSpec extends GraftSpec {

  test("q176 noise follows the deterministic Laplace inverse-CDF exactly") {
    val rows = TextQueries.q176DpRelease(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val cells = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1))).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.length === cells.size)
    rows.foreach { r =>
      val (lang, source) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === cells((lang, source)))
      val u = (h32(s"$lang|$source") + 0.5) / 4294967296.0 - 0.5
      val noise = -math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)) /
        TextQueries.DpEpsilon
      assert(math.abs(r.getDouble(3) - noise) < 1e-6, s"($lang,$source) noise")
      assert(math.abs(r.getDouble(4) - (r.getLong(2) + noise)) < 1e-6)
    }
    // the mechanism is centered: mean noise over many cells is small
    val meanNoise = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(meanNoise) < 1.0, s"mean noise $meanNoise implausibly biased")
  }

  test("q178 RFM census covers all users and respects its own thresholds") {
    val rows = MlEvalQueries.q178Rfm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.map(_.getLong(3)).sum === nUsers)
    rows.foreach { r =>
      (0 to 2).foreach(i =>
        assert(r.getInt(i) >= 1 && r.getInt(i) <= 5, s"score range col $i"))
      assert(r.getLong(3) > 0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(5) >= 1.0)
    }
    // quintile scores actually spread: more than one distinct value per dim
    assert(rows.map(_.getInt(1)).distinct.length > 1, "freq scores degenerate")
    assert(rows.map(_.getInt(2)).distinct.length > 1, "monetary scores degenerate")
    // monotone sanity: among segments, higher f_score ⇒ higher mean avg_freq
    val byF = rows.groupBy(_.getInt(1)).view
      .mapValues(rs => rs.map(x => x.getDouble(5) * x.getLong(3)).sum /
        rs.map(_.getLong(3)).sum).toMap
    val fKeys = byF.keys.toSeq.sorted
    fKeys.zip(fKeys.tail).foreach { case (a, b) =>
      assert(byF(a) <= byF(b), s"f_score $a vs $b mean freq ordering")
    }
  }

  test("q179 merge read surfaces the evolved column as NULL in old batches") {
    val rows = StorageQueries.q179SchemaMerge(spark, sfDir).collect()
    assert(rows.length === 2)
    val ord = Tables.orders(spark, sfDir)
    val even = ord.filter(pmod(col("o_orderkey"), lit(2)) === 0).count()
    val odd = ord.filter(pmod(col("o_orderkey"), lit(2)) === 1).count()
    val b1 = rows.find(_.getInt(0) == 1).get
    val b2 = rows.find(_.getInt(0) == 2).get
    assert(b1.getLong(1) === even && b2.getLong(1) === odd)
    // v1 files have NO priority column -> all null after merge
    assert(b1.getLong(2) === even && b1.getLong(3) === 0L)
    // v2 files carry it -> zero nulls, real cardinality
    assert(b2.getLong(2) === 0L && b2.getLong(3) >= 1L)
  }
}
