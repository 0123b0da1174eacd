package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd squared Euclidean distance of two array<double> columns.
  *
  * Arithmetic is EXACTLY the declarative fold
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, (acc,v) => acc+v)`:
  * ascending-index left-to-right summation from 0.0 (0.0 + x == x
  * exactly), so results are bit-identical to the HOF formulation and to
  * an oracle running the same fold — the same determinism contract as
  * [[VectorDot]]. The k-means assignment and product-quantization
  * distance computations both reduce to this primitive.
  */
case class VectorSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSqDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorSqDist.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorSqDist =
    copy(left = newLeft, right = newRight)
}

object VectorSqDist {
  /** Shared by interpreted and generated code paths. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
