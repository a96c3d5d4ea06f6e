package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.MathFunctions

/** Compiled shingle-hash kernels for the dedup suite. The composed
  * formulation exploded every word trigram of every document
  * (~300 rows per doc) through a shuffle just to take 12 per-doc
  * minima (minhash signatures) or a per-doc distinct set (Jaccard) —
  * at 100 TB that is a 300× row inflation feeding an exchange. Shingle
  * statistics are strictly per-document, so these kernels compute them
  * in one compiled pass per row and the operators become map-only.
  *
  * Arithmetic is bit-for-bit the composed chain's (MinhashSpec pins
  * it): trigram shingles exactly as WinnowMath (split(" ", -1),
  * <3 words → the whole text), hash32 = first 4 md5 bytes, universal
  * hashes with MathFunctions' constants. min over duplicate shingles
  * equals min over the distinct set, so signatures need no dedup.
  */
object MinhashMath {
  val K: Int = 12
  private val A = Array.tabulate(K)(MathFunctions.hashA)
  private val B = Array.tabulate(K)(MathFunctions.hashB)
  private val P = MathFunctions.HashP

  /** Shingle hashes of a document, duplicates kept (order = position). */
  def shingleHashes(text: UTF8String): Array[Long] = {
    val w = text.toString.split(" ", -1)
    val n = w.length
    if (n >= 3) {
      val arr = new Array[Long](n - 2)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n - 2) {
        sb.setLength(0)
        sb.append(w(i)).append(' ').append(w(i + 1)).append(' ').append(w(i + 2))
        arr(i) = WinnowMath.hash32(sb.toString)
        i += 1
      }
      arr
    } else Array(WinnowMath.hash32(text.toString))
  }

  /** K minhash values: min_j over shingles of (a_j*h + b_j) mod p. */
  def minhash(text: UTF8String): ArrayData = {
    val hs = shingleHashes(text)
    val mins = Array.fill(K)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < K) {
        val u = (A(j) * h + B(j)) % P
        if (u < mins(j)) mins(j) = u
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct shingle-hash set (the Jaccard set). */
  def shingleSet(text: UTF8String): ArrayData = {
    val hs = shingleHashes(text)
    java.util.Arrays.sort(hs)
    var uniq = 0
    var i = 0
    while (i < hs.length) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, uniq))
  }

  /** |a ∩ b| for two SORTED distinct long arrays (merge walk). */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** text → array<long>(12) minhash signature, compiled. */
case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    MinhashMath.minhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinhashMath.minhash($c)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** text → sorted distinct array<long> of shingle hashes, compiled. */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"
  override protected def nullSafeEval(input: Any): Any =
    MinhashMath.shingleSet(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinhashMath.shingleSet($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** (sorted array<long>, sorted array<long>) → |a ∩ b|, compiled. */
case class IntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinhashMath.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MinhashMath.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
    copy(left = l, right = r)
}
