package graft

import graft.dedup.DedupQueries

/** Wave-12 operator (q157): LSH recall/precision vs exact ground truth. */
class W22OpsSpec extends GraftSpec {

  test("q157 recall/precision recompute from the two pair sets") {
    val r = DedupQueries.q157LshRecall(spark, sfDir).first()
    val (nc, nt, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= math.min(nc, nt))
    assert(nt > 0, "the dup corpus must have true near-dup pairs")
    assert(math.abs(r.getDouble(3) - nh.toDouble / nt) < 1e-6)
    assert(math.abs(r.getDouble(4) - nh.toDouble / nc) < 1e-6)
    // the banded config must be a GOOD candidate generator here — a
    // collapse below 0.9 recall means someone broke the band math
    assert(r.getDouble(3) >= 0.9, s"LSH recall collapsed: ${r.getDouble(3)}")
    // and the sets really are the advertised ones
    val cand = DedupQueries.q21MinHashLsh(spark, sfDir).count()
    // q21 emits one row per candidate pair (plus estimate columns)
    assert(nc === cand)
    val truth = DedupQueries.q149SetSimJoin(spark, sfDir).count()
    assert(nt === truth)
  }
}
