package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import graft.functions.MathFunctions

/** Compiled random-hyperplane LSH code. The composed form evaluates
  * `bits` separate dot-product expressions per row (each against a
  * 64-literal ±1 array); this kernel computes all sign bits in one
  * pass, deriving the hyperplane components from the same integer
  * parity formula as VectorFunctions.signAt — products are v·(±1.0)
  * exactly, so the per-plane sums and the resulting code are bitwise
  * identical to the composed formulation (VectorKernelSpec pins it).
  */
object LshCodeMath {
  private val A0 = MathFunctions.hashA(0)
  private val B0 = MathFunctions.hashB(0)
  private val P = MathFunctions.HashP

  /** ±1.0 hyperplane component — same integers as signAt(j, i). */
  private def sign(j: Int, i: Int): Double = {
    val h = (A0 * (j * 128L + i) + B0) % P
    if (h % 2 == 1) 1.0 else -1.0
  }

  def code(v: ArrayData, dims: Int, bits: Int, planeOffset: Int): Long = {
    val n = math.min(dims, v.numElements())
    var c = 0L
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * sign(planeOffset + j, i); i += 1 }
      if (acc >= 0) c |= 1L << j
      j += 1
    }
    c
  }
}

/** (v, dims, bits, planeOffset) → long code; the three int arguments
  * must be foldable (they parameterize the generated loop). */
case class LshCodeExpr(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_code"

  override protected def nullSafeEval(v: Any, d: Any, b: Any, o: Any): Any =
    LshCodeMath.code(v.asInstanceOf[ArrayData], d.asInstanceOf[Int],
      b.asInstanceOf[Int], o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, d, b, o) =>
      s"graft.plans.LshCodeMath.code($v, $d, $b, $o)")

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression, d: Expression): LshCodeExpr =
    LshCodeExpr(a, b, c, d)
}
