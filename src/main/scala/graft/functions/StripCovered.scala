package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rebuild of a token array with a sorted set of 1-based
  * indices removed, space-joined — the in-row rewrite step of
  * `TextDedup.duplicateSubstringStrip`.
  *
  * Semantics are EXACTLY the declarative form it replaces
  * (`array_join(transform(filter(tokens-with-index, i ∉ covered), t))`)
  * — same output for ANY covered array, sorted or not, because
  * membership is what is computed — but the cost is O(n_tokens +
  * n_covered) per row instead of the lambda form's O(n_tokens ×
  * n_covered) `array_contains` scan: both the token indices (1..n,
  * ascending by construction) and the covered list (sort_array'd by the
  * caller) are ascending, so one merge pointer suffices. A document
  * that is thousands of tokens long and almost entirely duplicated —
  * the worst case of the 100 TB pitch — pays one linear pass, not ~10⁸
  * comparisons in a single row. (Un-sorted covered input degrades to a
  * bounded per-element catch-up scan, never to wrong output.)
  */
case class StripCovered(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_covered"

  override protected def nullSafeEval(words: Any, covered: Any): Any =
    StripCovered.compute(words.asInstanceOf[ArrayData],
      covered.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, c) =>
      s"graft.functions.StripCovered.compute($w, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripCovered =
    copy(left = newLeft, right = newRight)
}

object StripCovered {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted and generated code. `words`: array<string>
    * (null elements render as the literal "null", matching
    * `array_join`'s null replacement never firing here — split() never
    * yields null tokens); `covered`: array<long> of 1-based indices to
    * drop, ascending for the O(n+m) merge.
    */
  def compute(words: ArrayData, covered: ArrayData): UTF8String = {
    val n = words.numElements()
    val m = covered.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var j = 0
    var i = 0
    while (i < n) {
      val idx = (i + 1).toLong
      // merge pointer: covered is ascending, so each element is passed
      // at most once across the whole row (amortized O(1) per token)
      while (j < m && covered.getLong(j) < idx) j += 1
      if (j < m && covered.getLong(j) == idx) j += 1
      else kept.add(words.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(Space,
      kept.toArray(new Array[UTF8String](kept.size)): _*)
  }

  /** Column-API form: `stripCovered(tokens, coveredIdx)`. */
  def stripCovered(words: Column, covered: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      StripCovered(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(words),
        org.apache.spark.sql.graftshim.ColumnBridge.expression(covered)))
}
