package graft

import org.apache.spark.sql.functions._

/** SessionCache's LRU bound: inserts past the per-session cap evict
  * the least-recently-used entry (memory stays bounded no matter how
  * many inputs a long-lived session cycles), a hit refreshes recency,
  * and an evicted key transparently rebuilds on the next request.
  */
class SessionCacheSpec extends GraftSpec {
  private lazy val sp = spark
  import sp.implicits._

  private def put(key: String): Unit = {
    var built = 0
    SessionCache.cached(spark, key) { built += 1; Seq(key).toDF("k") }
    assert(built <= 1)
  }

  test("LRU eviction keeps the session at the configured cap; hits refresh recency") {
    SessionCache.clear(spark)
    val old = spark.conf.getOption("spark.graft.sessionCache.maxEntries")
    spark.conf.set("spark.graft.sessionCache.maxEntries", "3")
    try {
      put("lru-a"); put("lru-b"); put("lru-c")
      assert(SessionCache.size(spark) == 3)
      // touch a => b is now the LRU
      SessionCache.cached(spark, "lru-a")(fail("must be a hit"))
      put("lru-d") // evicts b, not a
      assert(SessionCache.size(spark) == 3)
      assert(SessionCache.contains(spark, "lru-a"))
      assert(!SessionCache.contains(spark, "lru-b"))
      assert(SessionCache.contains(spark, "lru-c"))
      assert(SessionCache.contains(spark, "lru-d"))
      // evicted key rebuilds (fresh frame, correct contents)
      var rebuilt = false
      val df = SessionCache.cached(spark, "lru-b") {
        rebuilt = true; Seq("lru-b").toDF("k")
      }
      assert(rebuilt && df.collect().map(_.getString(0)).toSeq == Seq("lru-b"))
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.graft.sessionCache.maxEntries", v)
        case None => spark.conf.unset("spark.graft.sessionCache.maxEntries")
      }
      SessionCache.clear(spark)
    }
  }

  test("default cap never evicts on the standard suite's memo population") {
    SessionCache.clear(spark)
    try {
      (1 to 14).foreach(i => put(s"pop-$i")) // the full bench holds ~14
      assert(SessionCache.size(spark) == 14, "nothing should be evicted at the default cap")
    } finally SessionCache.clear(spark)
  }
}
