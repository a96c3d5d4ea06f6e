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
}
