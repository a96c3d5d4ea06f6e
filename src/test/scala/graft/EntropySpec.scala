package graft

import org.apache.spark.sql.functions._
import graft.plans.EntropyMath
import org.apache.spark.unsafe.types.UTF8String

/** q95's char-entropy kernel: driver-recompute parity on corpus rows,
  * and the UNIT CONTRACT — entropy counts Unicode CODE POINTS, which
  * is exactly what the DuckDB oracle's `string_split(text, '')`
  * produces (empirically: astral-plane chars are single units,
  * combining marks are separate units — code points, not UTF-16 units,
  * not grapheme clusters). Pinned here so neither side can drift.
  */
class EntropySpec extends GraftSpec {

  private def kernel(s: String): (Long, Long, Long) = {
    val r = EntropyMath.charEntropy(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The kernel's documented math, recomputed independently. */
  private def recompute(s: String): (Long, Long, Long) = {
    val cps = s.codePoints().toArray
    val m = cps.groupBy(identity).view.mapValues(_.length.toLong)
    val n = cps.length.toLong
    val e = m.values.map { c =>
      val p = c.toDouble / n
      java.math.BigDecimal.valueOf(-(p * math.log(p)))
        .setScale(12, java.math.RoundingMode.HALF_UP)
        .scaleByPowerOfTen(12).longValueExact()
    }.sum
    (n, m.size.toLong, e)
  }

  test("kernel matches the driver recompute on corpus documents") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("text")).limit(60).collect().map(_.getString(0))
    assert(texts.nonEmpty)
    texts.foreach(t => assert(kernel(t) === recompute(t)))
  }

  test("unit contract: code points, not UTF-16 units or graphemes") {
    // "𝄞" (U+1D11E, astral): ONE unit even though it is 2 UTF-16 chars.
    assert(kernel("𝄞") === ((1L, 1L, 0L)))
    // Decomposed "é" = 'e' + U+0301 combining acute: TWO units (DuckDB's
    // string_split('',…) also yields two — code points, not graphemes).
    val (n, k, _) = kernel("é")
    assert(n === 2L && k === 2L)
    // Mixed astral + BMP: n counts each code point once.
    val (n2, k2, _) = kernel("a𝄞😀b")
    assert(n2 === 4L && k2 === 4L)
  }

  test("empty and uniform strings hit the boundary cases exactly") {
    assert(kernel("") === ((0L, 0L, 0L)))
    assert(kernel("aaaa") === ((4L, 1L, 0L))) // p=1 → −1·ln(1) = 0
  }

  test("q95 flags low-entropy documents consistently with its threshold") {
    val rows = graft.text.TextQueries.q95Entropy(spark, sfDir)
      .select(col("entropy_nats"), col("low_entropy")).collect()
    assert(rows.nonEmpty)
    val thr = graft.text.TextQueries.EntropyLowE12 / 1e12
    rows.foreach { r =>
      val flagGrid = r.getDouble(0) < thr
      // round(,6) display value agrees with the exact-grid flag except
      // within half an ulp of the display grid of the threshold
      if (math.abs(r.getDouble(0) - thr) > 1e-6)
        assert(flagGrid === r.getBoolean(1))
    }
  }
}
