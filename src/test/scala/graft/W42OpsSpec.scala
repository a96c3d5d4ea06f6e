package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.queries.TpchQueries
import graft.text.PipelineQueries

/** Wave-42 operators (q215–q218): TPC-H Q4 priority check, unicode-NFC
  * audit via the graft_nfc kernel, TPC-H Q7 trade flows, watermark
  * audit.
  */
class W42OpsSpec extends GraftSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def us(s: String): Long =
    java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
      .toInstant.toEpochMilli * 1000L

  test("q215 Q4 matches a driver-side EXISTS replay") {
    val rows = TpchQueries.q215PriorityCheck(spark, sfDir).collect()
    val lateDays = TpchQueries.Q4LateDays.toLong * 86400L * 1000000L
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), unix_micros(col("l_shipdate").cast("timestamp")))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).max }
    val expect = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_orderpriority"))
      .collect()
      .filter { r =>
        val d = r.getLong(1)
        d >= us(TpchQueries.Q4From) && d < us(TpchQueries.Q4Until) &&
          li.get(r.getLong(0)).exists(_ > d + lateDays)
      }
      .groupBy(_.getString(2)).map { case (p, xs) => p -> xs.length.toLong }
    assert(rows.map(_.getString(0)).toSet === expect.keySet)
    rows.foreach(r => assert(r.getLong(1) === expect(r.getString(0)),
      s"priority ${r.getString(0)}"))
  }

  test("q215 compiles the EXISTS to a semi join, never a fan-out") {
    val plan = formatted(TpchQueries.q215PriorityCheck(spark, sfDir))
    assert(plan.contains("LeftSemi"), "EXISTS must be a semi join")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), "window pushed")
  }

  test("q216 unicode audit: graft_nfc composes exactly the injected docs") {
    val rows = PipelineQueries.q216UnicodeNorm(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      // every injected doc (id%9==0) is denormalized; suffix has 3
      // combining marks that NFC composes away
      val inj = ds.count(_._1 % 9 == 0).toLong
      src -> (ds.length.toLong, inj, inj * 3)
    }
    assert(rows.map(_.getString(0)).toSet === expect.keySet)
    rows.foreach { r =>
      val (n, inj, saved) = expect(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === inj, s"denormalized in ${r.getString(0)}")
      assert(r.getLong(3) === saved, s"cp_saved in ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - inj.toDouble / n) < 1e-6)
    }
  }

  test("graft_nfc composes decomposed accents, is idempotent, leaves ASCII untouched") {
    val decomposed = "cafe\u0301" // e + combining acute (NFD)
    val composed = "caf\u00e9"    // precomposed \u00e9 (NFC)
    val r = spark.sql(
      s"SELECT graft_nfc('plain ascii') = 'plain ascii', " +
        s"graft_nfc('$decomposed') = '$composed', " +
        s"graft_nfc('$composed') = '$composed', " +
        s"length('$decomposed'), length(graft_nfc('$decomposed'))")
      .collect().head
    assert(r.getBoolean(0), "ASCII fixed point")
    assert(r.getBoolean(1), "NFD composes to NFC")
    assert(r.getBoolean(2), "idempotent on NFC input")
    assert(r.getInt(3) === 5 && r.getInt(4) === 4, "one code point saved")
  }

  test("q217 trade flows match a driver-side nation-pair replay") {
    val rows = TpchQueries.q217TradeFlows(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TpchQueries.Q7TopK)
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val sup = Tables.supplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(2))).toMap
    val cus = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(2))).toMap
    val ordCust = Tables.orders(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .filter { r =>
        val d = r.getLong(2)
        d >= us(TpchQueries.Q7From) && d < us(TpchQueries.Q7Until)
      }
      .flatMap { r =>
        val sn = sup(r.getLong(1))
        val cn = cus(ordCust(r.getLong(0)))
        if (sn == cn) None
        else {
          val yr = java.time.Instant.ofEpochMilli(r.getLong(2) / 1000)
            .atZone(java.time.ZoneOffset.UTC).getYear
          Some(((sn, cn, yr),
            BigDecimal(r.getDouble(3)) * (BigDecimal(1) - BigDecimal(r.getDouble(4)))))
        }
      }
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum, xs.length.toLong) }
    val top = flows.toSeq
      .sortBy { case ((sn, cn, yr), rev, _) => (-rev, sn, cn, yr) }
      .take(TpchQueries.Q7TopK)
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq ===
      top.map(_._1))
    rows.zip(top).foreach { case (r, (_, rev, n)) =>
      assert(math.abs(r.getDouble(3) - rev.toDouble) < 1e-4)
      assert(r.getLong(4) === n)
    }
  }

  test("q218 watermark audit replays the per-user running-max lateness") {
    val rows = PipelineQueries.q218WatermarkAudit(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def h32(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 8), 16)
    }
    val lates = ev.groupBy(_._1).values.flatMap { es =>
      var runMax = Long.MinValue
      es.sortBy(e => (h32(e._2.toString), e._2)).map { case (_, _, ts) =>
        runMax = math.max(runMax, ts)
        (runMax - ts) / 1000000000L
      }
    }.toSeq
    val edges = PipelineQueries.LateBuckets
    def bucketOf(s: Long): Int = edges.lastIndexWhere(s >= _)
    val census = lates.groupBy(bucketOf).map { case (b, xs) => b -> xs.length.toLong }
    assert(rows.map(_.getInt(0)).toSet === census.keySet)
    val total = lates.length.toDouble
    var cum = 0L
    rows.sortBy(_.getInt(0)).foreach { r =>
      val n = census(r.getInt(0))
      assert(r.getLong(1) === edges(r.getInt(0)), "bucket edge")
      assert(r.getLong(2) === n)
      cum += n
      assert(math.abs(r.getDouble(3) - n / total) < 1e-6)
      assert(math.abs(r.getDouble(4) - cum / total) < 1e-6)
    }
    assert(rows.map(_.getLong(2)).sum === lates.length.toLong)
    // the permuted arrival log populates multiple lateness buckets
    assert(rows.length >= 3, "lateness distribution must be non-degenerate")
  }

  test("q216/q218 keep partial aggregation; q217 broadcasts dims") {
    val p216 = formatted(PipelineQueries.q216UnicodeNorm(spark, sfDir))
    assert(p216.contains("partial_") && !p216.contains("CartesianProduct"))
    val p217 = formatted(TpchQueries.q217TradeFlows(spark, sfDir))
    assert(p217.contains("BroadcastHashJoin") && p217.contains("TakeOrderedAndProject"))
  }
}
