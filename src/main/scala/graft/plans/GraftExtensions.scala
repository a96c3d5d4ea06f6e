package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType}

/** Session extension point: registers graft's native expressions so
  * SQL users get them by name. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession
  * sets this by default).
  *
  * This is the (b)-tier extension path from the design rules: a native
  * Expression with doGenCode, injected via SparkSessionExtensions —
  * used only where built-ins can't express the scalar. Everything else
  * in graft composes `org.apache.spark.sql.functions`.
  *
  * Every builder wraps its arguments in Cast to the kernel's expected
  * input type (the Erf pattern): an `array<float>` embedding column
  * into graft_dot is cast to `array<double>` at analysis time instead
  * of being read with 8-byte strides over 4-byte elements (silent
  * garbage), and an uncastable argument fails analysis instead of
  * crashing an executor. Casts on already-correct types are removed by
  * SimplifyCasts, so the fixture plans are unchanged.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    val dblArr = ArrayType(DoubleType)
    val longArr = ArrayType(LongType)
    ext.injectFunction((
      new FunctionIdentifier("graft_erf"),
      new ExpressionInfo(classOf[Erf].getName, "graft_erf"),
      (args: Seq[Expression]) => Erf(Cast(args.head, DoubleType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDot(Cast(args(0), dblArr), Cast(args(1), dblArr))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dist2"),
      new ExpressionInfo(classOf[ArrayDist2].getName, "graft_dist2"),
      (args: Seq[Expression]) => ArrayDist2(Cast(args(0), dblArr), Cast(args(1), dblArr))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowSummary].getName, "graft_winnow"),
      (args: Seq[Expression]) => WinnowSummary(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_bigram"),
      new ExpressionInfo(classOf[TopBigram].getName, "graft_top_bigram"),
      (args: Seq[Expression]) => TopBigram(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinhashSig(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingle_set"),
      (args: Seq[Expression]) => ShingleSet(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "graft_intersect_count"),
      (args: Seq[Expression]) => IntersectCount(Cast(args(0), longArr), Cast(args(1), longArr))))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "graft_gram_hashes"),
      (args: Seq[Expression]) => GramHashes(Cast(args(0), StringType),
        Cast(args(1), IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "graft_cdc_chunks"),
      (args: Seq[Expression]) => CdcChunks(Cast(args.head, StringType),
        Cast(args(1), IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cdc_cuts"),
      new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
      (args: Seq[Expression]) => CdcCuts(Cast(args.head, StringType),
        Cast(args(1), IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "graft_entropy"),
      (args: Seq[Expression]) => CharEntropy(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => NfcNormalize(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_phash"),
      new ExpressionInfo(classOf[PhashExpr].getName, "graft_phash"),
      (args: Seq[Expression]) => PhashExpr(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashSig].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimhashSig(Cast(args.head, StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_code"),
      new ExpressionInfo(classOf[LshCodeExpr].getName, "graft_lsh_code"),
      (args: Seq[Expression]) => LshCodeExpr(Cast(args(0), dblArr),
        args(1), args(2), args(3))))
    ext.injectFunction((
      new FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBandsExpr].getName, "graft_lsh_bands"),
      (args: Seq[Expression]) => LshBandsExpr(Cast(args(0), dblArr),
        args(1), args(2), args(3))))
    // Spark's own Bloom sketch pair (used internally for runtime join
    // pruning) exposed by name: they are not in the public registry,
    // but a fixed-size broadcastable membership sketch is exactly what
    // scale-path decontamination wants (DedupQueries
    // .decontaminateBloomSets). graft_bloom_agg(longCol, estItems,
    // numBits) → binary sketch; graft_might_contain(sketch, longCol).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          Cast(args(0), LongType), args(1), args(2)).toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_count_contains"),
      new ExpressionInfo(classOf[BloomCountContains].getName, "graft_bloom_count_contains"),
      (args: Seq[Expression]) => BloomCountContains(args(0), Cast(args(1), longArr))))
    ext.injectFunction((
      new FunctionIdentifier("graft_pbloom_hits"),
      new ExpressionInfo(classOf[PBloomHits].getName, "graft_pbloom_hits"),
      (args: Seq[Expression]) => PBloomHits(args(0), Cast(args(1), longArr))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerExpr].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinklerExpr(Cast(args(0), StringType),
        Cast(args(1), StringType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_damerau"),
      new ExpressionInfo(classOf[DamerauExpr].getName, "graft_damerau"),
      (args: Seq[Expression]) => DamerauExpr(Cast(args(0), StringType),
        Cast(args(1), StringType))))
    // SymSpell deletion neighborhood (q309's equi-join blocking key):
    // deletes(a,k) ∩ deletes(b,k) ≠ ∅ whenever DL(a,b) ≤ k.
    ext.injectFunction((
      new FunctionIdentifier("graft_deletes"),
      new ExpressionInfo(classOf[DeleteNeighborsExpr].getName, "graft_deletes"),
      (args: Seq[Expression]) => DeleteNeighborsExpr(Cast(args(0), StringType),
        Cast(args(1), IntegerType))))
    // Real JDK media codecs (q306/q307): encode builds the asset from
    // closed-form integer formulas, decode recovers them — both ends
    // per-row compiled expressions (see plans/MediaCodec.scala).
    ext.injectFunction((
      new FunctionIdentifier("graft_png_encode"),
      new ExpressionInfo(classOf[PngEncodeExpr].getName, "graft_png_encode"),
      (args: Seq[Expression]) => PngEncodeExpr(Cast(args(0), LongType),
        Cast(args(1), IntegerType), Cast(args(2), IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_png_stats"),
      new ExpressionInfo(classOf[PngStatsExpr].getName, "graft_png_stats"),
      (args: Seq[Expression]) => PngStatsExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_wav_encode"),
      new ExpressionInfo(classOf[WavEncodeExpr].getName, "graft_wav_encode"),
      (args: Seq[Expression]) => WavEncodeExpr(Cast(args(0), LongType),
        Cast(args(1), IntegerType))))
    ext.injectFunction((
      new FunctionIdentifier("graft_wav_stats"),
      new ExpressionInfo(classOf[WavStatsExpr].getName, "graft_wav_stats"),
      (args: Seq[Expression]) => WavStatsExpr(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), Cast(args(1), LongType))))
  }
}
