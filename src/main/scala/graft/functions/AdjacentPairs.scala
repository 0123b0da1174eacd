package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Codegen'd Catalyst expression: the n−1 CONSECUTIVE element pairs of an
  * array, as `array<struct<a: elem, b: elem>>` in order — the
  * sessionization step shape (each user's time-sorted event array →
  * consecutive transitions) without a window function.
  *
  * Replacing `lead(...) over (partition by u order by ts, id)` with
  * `groupBy(u).agg(sort_array(collect_list(...)))` + this expression
  * turns the per-user exchange + SORT + Window + (distinct-rewrite)
  * extra exchange into one hash aggregate whose partitioning the
  * downstream per-user regroup reuses — see
  * [[graft.operators.EventAnalytics.transitionCounts]]. Same trade as
  * [[UpperTrianglePairs]]: one straight-line JVM pass per row inside
  * whole-stage codegen, pair rows referencing the input elements.
  */
case class AdjacentPairs(child: Expression) extends UnaryExpression {

  private lazy val elemInfo: (DataType, Boolean) = child.dataType match {
    case ArrayType(et, cn) => (et, cn)
    case other => throw new IllegalArgumentException(
      s"adjacent_pairs: input must be an array, got $other")
  }

  override def dataType: DataType = {
    val (et, cn) = elemInfo
    ArrayType(StructType(Seq(
      StructField("a", et, nullable = cn),
      StructField("b", et, nullable = cn))), containsNull = false)
  }

  override def prettyName: String = "adjacent_pairs"

  override protected def nullSafeEval(input: Any): Any =
    AdjacentPairs.compute(input.asInstanceOf[ArrayData], elemInfo._1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemInfo._1,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AdjacentPairs.compute($c, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

object AdjacentPairs {

  /** Java entry point used by both interpreted and generated code (same
    * reference-not-copy contract as [[UpperTrianglePairs.compute]]).
    */
  def compute(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev = arr.get(0, elemType)
    var i = 1
    while (i < n) {
      val cur = arr.get(i, elemType)
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def adjacentPairs(arr: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      AdjacentPairs(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(arr)))
}
