package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** Session extension point: registers graft's native expressions so
  * SQL users get them by name. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession
  * sets this by default).
  *
  * This is the (b)-tier extension path from the design rules: a native
  * Expression with doGenCode, injected via SparkSessionExtensions —
  * used only where built-ins can't express the scalar. Everything else
  * in graft composes `org.apache.spark.sql.functions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_erf"),
      new ExpressionInfo(classOf[Erf].getName, "graft_erf"),
      (args: Seq[Expression]) => Erf(Cast(args.head, DoubleType))))
    // compiled vector kernels (array<double> args — callers pass
    // already-cast arrays; see VectorFunctions)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (args: Seq[Expression]) => ArrayDot(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_dist2"),
      new ExpressionInfo(classOf[ArrayDist2].getName, "graft_dist2"),
      (args: Seq[Expression]) => ArrayDist2(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowSummary].getName, "graft_winnow"),
      (args: Seq[Expression]) => WinnowSummary(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_top_bigram"),
      new ExpressionInfo(classOf[TopBigram].getName, "graft_top_bigram"),
      (args: Seq[Expression]) => TopBigram(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinhashSig(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingle_set"),
      (args: Seq[Expression]) => ShingleSet(args.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName, "graft_intersect_count"),
      (args: Seq[Expression]) => IntersectCount(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashSig].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimhashSig(args.head)))
  }
}
