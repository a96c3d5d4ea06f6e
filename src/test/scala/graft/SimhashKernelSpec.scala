package graft

import org.apache.spark.unsafe.types.UTF8String

/** Pins the compiled simhash kernel to the composed explode+64-sum
  * formulation over the sf0.001 dedup corpus.
  */
class SimhashKernelSpec extends GraftSpec {

  test("graft_simhash equals the composed signature build on the corpus") {
    import graft.dedup.DedupQueries
    val native = DedupQueries.simhashSigNative(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val composed = DedupQueries.simhashSig(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native.keySet === composed.keySet && native.nonEmpty)
    native.foreach { case (id, s) => assert(s === composed(id), s"doc $id") }
  }

  test("simhash hand case: single word sets exactly its hash bits") {
    val r = graft.plans.SimhashMath.simhash(UTF8String.fromString("hello"))
    // one token: every bit vote is +1 or -1, so the signature halves
    // equal the token's two 32-bit hashes exactly
    assert(r.getLong(0) === graft.plans.WinnowMath.hash32("hello"))
  }
}
