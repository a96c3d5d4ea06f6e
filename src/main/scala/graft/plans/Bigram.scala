package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-document bigram frequency summary (q46's repetition
  * statistic). Bigram statistics are strictly per-row, so the explode +
  * groupBy(doc_id, gram) formulation shuffles every bigram string only
  * to reunite rows that never left their document; this kernel computes
  * max-frequency and total count in one compiled pass over the row —
  * the operator becomes map-only (zero shuffle). Counts are over exact
  * bigram strings (no hashing), so results equal the relational
  * formulation integer-for-integer (BigramSpec pins it; the DuckDB
  * oracle keeps the unnest + GROUP BY form).
  */
object BigramMath {
  def topBigram(text: UTF8String): InternalRow = {
    val w = text.toString.split(" ", -1)
    if (w.length < 2) return new GenericInternalRow(Array[Any](0L, 0L))
    val m = new java.util.HashMap[String, Long]()
    var mx = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < w.length - 1) {
      sb.setLength(0)
      sb.append(w(i)).append(' ').append(w(i + 1))
      val k = sb.toString
      val c = m.getOrDefault(k, 0L) + 1L
      m.put(k, c)
      if (c > mx) mx = c
      i += 1
    }
    new GenericInternalRow(Array[Any](mx, (w.length - 1).toLong))
  }
}

/** text → struct(mx, tot): highest bigram frequency and bigram count. */
case class TopBigram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("mx", LongType, nullable = false),
    StructField("tot", LongType, nullable = false)))
  override def prettyName: String = "graft_top_bigram"

  override protected def nullSafeEval(input: Any): Any =
    BigramMath.topBigram(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BigramMath.topBigram($c)")

  override protected def withNewChildInternal(newChild: Expression): TopBigram =
    copy(child = newChild)
}
