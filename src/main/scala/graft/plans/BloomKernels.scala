package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Compiled whole-array Bloom probe. The composed form
  * (`aggregate(arr, 0L, (acc, x) -> acc + if(might_contain(bf, x)))`)
  * evaluates its lambda interpreted once per element AND re-reads the
  * sketch expression per step; this kernel deserializes the constant
  * sketch ONCE per task (the same `addReferenceObj` pattern Spark's own
  * BloomFilterMightContain uses) and counts memberships in one
  * JIT-compiled loop per row. Same probe, same order ⇒ identical count
  * to the composed twin (DecontaminateBloomSpec pins it).
  */
object BloomKernelMath {
  def countContains(bf: BloomFilter, arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (bf.mightContainLong(arr.getLong(i))) acc += 1L
      i += 1
    }
    acc
  }
}

/** (sketch: binary, elems: array<long>) → count of elements the Bloom
  * sketch might contain. The sketch must be a constant (foldable)
  * expression — the broadcastable-literal contract `might_contain`
  * itself has — because it is deserialized once at plan time. */
case class BloomCountContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bloom_count_contains"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a constant (foldable) Bloom sketch argument")
    else if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName sketch argument must be binary, got ${left.dataType}")
    else right.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName elements argument must be array<long>, got $t")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any =
    if (filter == null) null
    else {
      val arr = right.eval(input)
      if (arr == null) null
      else BloomKernelMath.countContains(filter, arr.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (filter == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("graftBloom", filter, classOf[BloomFilter].getName)
      val arrEval = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${arrEval.code}
          boolean ${ev.isNull} = ${arrEval.isNull};
          long ${ev.value} = -1L;
          if (!${ev.isNull}) {
            ${ev.value} = graft.plans.BloomKernelMath.countContains($bf, ${arrEval.value});
          }""")
    }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomCountContains =
    copy(left = l, right = r)
}
