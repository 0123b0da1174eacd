package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Codegen'd Catalyst expression: all upper-triangle (i < j) element pairs
  * of an array, as `array<struct<a: elem, b: elem>>` in i-major order —
  * the in-group candidate-pair expansion at the core of every
  * posting-list / LSH-bucket dedup tier.
  *
  * Semantically identical to the declarative formulation it replaces
  * (`flatten(transform(ps, (x, i) => transform(slice(ps, i + 2, ...),
  * y => struct(x, y))))`): same pairs, same order. The win is execution:
  * the higher-order-function tree is interpreted per element and
  * materializes ~3 intermediate copies of every pair struct (the `slice`
  * copy, the inner `transform` array, the `flatten` concatenation) —
  * round-16 profiling put it at the floor of the suite's slowest queries
  * (dd_tier_report, dd_ngram_jaccard, dd_containment, dd_dual_signal) —
  * while this expression is one straight-line JVM pass per row inside
  * whole-stage codegen whose pair rows REFERENCE the input elements
  * instead of copying them (the same trade [[CdcCuts]] and
  * [[ShingleHashes]] document).
  *
  * Group sizes are bounded upstream (doc-frequency stop-list cap /
  * `maxGroupSize` bucket cap), so the n·(n−1)/2 output stays small; the
  * expression still guards the count against Int overflow explicitly
  * rather than corrupting an allocation.
  */
case class UpperTrianglePairs(child: Expression) extends UnaryExpression {

  private lazy val elemInfo: (DataType, Boolean) = child.dataType match {
    case ArrayType(et, cn) => (et, cn)
    case other => throw new IllegalArgumentException(
      s"upper_triangle_pairs: input must be an array, got $other")
  }

  override def dataType: DataType = {
    val (et, cn) = elemInfo
    ArrayType(StructType(Seq(
      StructField("a", et, nullable = cn),
      StructField("b", et, nullable = cn))), containsNull = false)
  }

  override def prettyName: String = "upper_triangle_pairs"

  override protected def nullSafeEval(input: Any): Any =
    UpperTrianglePairs.compute(input.asInstanceOf[ArrayData], elemInfo._1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemInfo._1,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UpperTrianglePairs.compute($c, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTrianglePairs =
    copy(child = newChild)
}

object UpperTrianglePairs {

  /** Java entry point used by both interpreted and generated code. The
    * pair rows hold REFERENCES to the input's element values (for struct
    * elements, `ArrayData.get` yields row views over the input buffer) —
    * safe because the result is consumed within the enclosing row's
    * evaluation (the downstream explode/projection copies what it keeps),
    * exactly like Spark's own `arrays_zip`.
    */
  def compute(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val nPairs = n.toLong * (n - 1) / 2
    if (nPairs > Int.MaxValue) throw new IllegalArgumentException(
      s"upper_triangle_pairs: $n elements expand to $nPairs pairs (> 2^31-1)")
    val elems = new Array[Any](n)
    var i = 0
    while (i < n) { elems(i) = arr.get(i, elemType); i += 1 }
    val out = new Array[Any](nPairs.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def upperTrianglePairs(arr: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      UpperTrianglePairs(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(arr)))
}
