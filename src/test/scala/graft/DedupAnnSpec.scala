package graft

import org.apache.spark.sql.functions._
import graft.functions.{MathFunctions => MF, VectorFunctions => VF}

/** Unit fixtures for the dedup/ANN kernels: portable hashing, cosine,
  * LSH codes, and end-to-end behavior of the suite queries at
  * sf0.001.
  */
class DedupAnnSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("hash32 parses the first 8 md5 hex chars exactly") {
    val got = Seq("hello").toDF("s").select(MF.hash32(col("s"))).first().getLong(0)
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592 -> 0x5d41402a
    assert(got === 0x5d41402aL)
  }

  test("universalHash stays in [0, p) and differs per k") {
    val hs = Seq("a", "b", "c").toDF("s").select(MF.hash32(col("s")).as("h"))
    val out = hs.select((0 until 4).map(k => MF.universalHash(col("h"), k).as(s"u$k")): _*)
      .collect()
    out.foreach { r =>
      val vals = (0 until 4).map(r.getLong)
      assert(vals.forall(v => v >= 0 && v < MF.HashP))
      assert(vals.distinct.size === 4)
    }
  }

  test("cosine of identical / orthogonal vectors") {
    val df = Seq(
      (Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0), 1.0),
      (Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), 0.0),
      (Array(1.0, 1.0, 0.0), Array(1.0, 0.0, 0.0), 1.0 / math.sqrt(2))
    ).toDF("a", "b", "want")
    df.select(VF.cosine(col("a"), col("b")).as("got"), col("want")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("lshCode is deterministic and equal vectors share codes") {
    val v = Array.tabulate(64)(i => math.sin(i + 1))
    val df = Seq(("x", v), ("y", v)).toDF("id", "v")
    val codes = df.select(VF.lshCode(col("v"), 64, 16)).collect().map(_.getLong(0))
    assert(codes(0) === codes(1))
    assert(codes(0) >= 0 && codes(0) < (1L << 16))
  }

  test("exact dedup groups identical texts only (sf0.001)") {
    val rows = graft.dedup.DedupQueries.q20DedupExact(spark, sfDir).collect()
    val dups = rows.filter(_.getAs[Boolean]("is_dup"))
    // injected exact copies: doc_id%15==0 -> +200000; near-dups differ
    assert(dups.nonEmpty)
    assert(dups.forall(r => r.getAs[Long]("doc_id") >= 200000))
  }

  test("minhash-LSH finds the injected near-duplicates (sf0.001)") {
    val pairs = graft.dedup.DedupQueries.q21MinHashLsh(spark, sfDir).collect()
    val injected = pairs.filter { r =>
      val a = r.getAs[Long]("da"); val b = r.getAs[Long]("db")
      b == a + 100000 || b == a + 200000
    }
    assert(injected.nonEmpty)
    injected.foreach(r => assert(r.getAs[Double]("est_jaccard") >= 0.5))
  }

  test("brute KNN returns k ranked neighbors per query (sf0.001)") {
    val rows = graft.ann.AnnQueries.q30KnnBrute(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.foreach { case (_, g) =>
      assert(g.length === graft.ann.AnnQueries.K)
      val cos = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }
}
