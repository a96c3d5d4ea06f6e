package graft

import org.apache.spark.sql.functions._

/** Drives the public Graft facade on CALLER-shaped data (not the test
  * fixtures): the library surface works on arbitrary schemas.
  */
class GraftApiSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  test("rank family runs on a user edge list") {
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c").toDF("src", "dst")
    val r = Graft.linkRank(spark, edges).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("c") - 9.06389778197704) < 1e-3) // reference gold
    val g = Graft.linkRankGraphX(spark, edges).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    r.foreach { case (k, v) => assert(math.abs(v - g(k)) < 1e-9) }
  }

  test("text kernels compose on a user frame") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content here entirely novel words"))
      .toDF("id", "text")
      .withColumn("s", Graft.shingleSet(col("text")))
    val pair = df.filter(col("id") === 1).select(col("s").as("s1"))
      .crossJoin(df.filter(col("id") === 2).select(col("s").as("s2")))
      .select(Graft.jaccard(col("s1"), col("s2"))).first().getDouble(0)
    assert(pair === 1.0) // identical docs
    val far = df.filter(col("id") === 1).select(col("s").as("s1"))
      .crossJoin(df.filter(col("id") === 3).select(col("s").as("s2")))
      .select(Graft.jaccard(col("s1"), col("s2"))).first().getDouble(0)
    assert(far === 0.0)
    // dedupExact over md5 fingerprints finds the identical pair
    val dd = Graft.dedupExact(df, col("id"), md5(col("text")))
      .select(col("id"), col("is_dup")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(dd === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("minhashPairs, kmeans, knnBrute on user frames") {
    // near-dup pair: same doc with a one-word suffix change
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq((10L, base), (20L, base + "tail"), (30L, "other stuff wholly unrelated text body"))
      .toDF("id", "body")
    val pairs = Graft.minhashPairs(docs, col("id"), col("body"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 10L && p._2 == 20L && p._3 > 0.5), pairs.toSeq)
    assert(!pairs.exists(p => p._1 == 30L || p._2 == 30L))

    val rnd = new scala.util.Random(11)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextDouble() + (i % 3) * 10.0))).toDF("id", "vec")
    val km = Graft.kmeans(vecs, col("id"), col("vec"), k = 3, dims = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Checkpoints.drain(spark)
    assert(km.size === 60)
    // the three offset groups are well-separated: cluster = f(id % 3)
    (0 until 60).foreach(i => assert(km(i.toLong) === km((i % 3).toLong), s"vec $i"))

    val knn = Graft.knnBrute(vecs, col("id"), col("vec"),
        vecs.filter(col("id") === 0), col("id"), col("vec"), k = 3)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(knn.length === 3)
    assert(knn.forall(_.getAs[Long]("neighbor") != 0L)) // self excluded
    val cos = knn.map(_.getAs[Double]("cosine"))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }) // ranked
  }

  test("triangles and funnel on user frames") {
    // K4 minus one edge: triangles {a,b,c} and {a,b,d}
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d", "b" -> "d")
      .toDF("x", "y")
    val tri = Graft.triangles(edges, col("x"), col("y")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(tri("a") === (3L, 2L) && tri("b") === (3L, 2L))
    assert(tri("c") === (2L, 1L) && tri("d") === (2L, 1L))

    val ev = Seq(
      (1L, "signup", 10L), (1L, "buy", 20L),          // full funnel in order
      (2L, "buy", 5L), (2L, "signup", 8L),            // buy BEFORE signup: stops at signup
      (3L, "signup", 1L))                             // never buys
      .toDF("uid", "what", "at")
    val f = Graft.funnel(ev, col("uid"), col("what"), col("at"),
      Seq("signup", "buy")).collect()
    assert(f.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((0, "all_users", 3L), (1, "signup", 3L), (2, "buy", 1L)))
  }

  test("vector and sampling helpers on user data") {
    val v = Seq((1L, Array(1.0, 0.0), Array(0.0, 2.0))).toDF("id", "a", "b")
    assert(v.select(Graft.dot(col("a"), col("b"))).first().getDouble(0) === 0.0)
    assert(v.select(Graft.dist2(col("a"), col("b"))).first().getDouble(0) === 5.0)
    val ids = (0L until 1000L).toDF("id")
    val kept = Graft.hashSample(ids, col("id"), lit(20)).count()
    assert(kept > 100 && kept < 300, s"~20% expected, got $kept")
    val again = Graft.hashSample(ids, col("id"), lit(20)).count()
    assert(kept === again) // deterministic
  }

  test("bm25, weightedSample, phash on user frames") {
    val docs = Seq(
      (1L, "spark shuffles the big table and spark broadcasts the small one"),
      (2L, "spark spark spark"),
      (3L, "nothing relevant here at all")).toDF("id", "body")
    val scored = Graft.bm25(docs, col("id"), col("body"), Seq("spark"), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toList
    // doc 2 is short and saturated with the term — BM25 must rank it first
    assert(scored.map(_._1) === List(2L, 1L))

    val pop = (0L until 400L).map(i => (i, if (i < 4) 10000L else 1L, "s"))
      .toDF("id", "w", "g")
    val picked = Graft.weightedSample(pop, col("id"), col("w"), col("g"), k = 4)
      .collect().map(_.getLong(0)).toSet
    // the four whale weights dominate the draw
    assert(picked.count(_ < 4) >= 3, s"heavy ids should dominate, got $picked")
    val again = Graft.weightedSample(pop, col("id"), col("w"), col("g"), k = 4)
      .collect().map(_.getLong(0)).toSet
    assert(picked === again) // deterministic

    val long = "x" * 100
    val ph = docs.select(Graft.phash(lit(long))).first().getSeq[Long](0)
    assert(ph.length === 2)
  }
}
