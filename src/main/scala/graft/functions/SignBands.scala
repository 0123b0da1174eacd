package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused random-hyperplane LSH banding: array<double> vector → array of
  * `bands` band-bucket longs, in ONE codegen'd expression.
  *
  * Semantically identical to the unfused form in
  * [[graft.operators.Similarity.embedNearDupPairs]]'s original layout —
  * nBits sign bits (bit i = sign of the dot with pseudo-random plane i),
  * packed little-endian into nBits/bands buckets — and BIT-IDENTICAL to
  * it: the plane components use the same splitmix-style (i, j) mix and
  * the dot products run the same ascending-j left-to-right fold as
  * [[VectorDot]], so every rounding step matches. What the fusion
  * removes is the per-bit expression machinery: the unfused plan
  * evaluates nBits separate VectorDot(literal-plane) expressions plus
  * band-packing arithmetic per row (224 evaluation frames at the
  * fixture sizing), where this loops once over a flat static double[]
  * plane matrix inside a single JIT-friendly method.
  */
case class SignBands(child: Expression, nBits: Int, bands: Int)
    extends UnaryExpression {

  require(nBits % bands == 0, "bands must divide nBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bands"

  override protected def nullSafeEval(v: Any): Any =
    SignBands.compute(v.asInstanceOf[ArrayData], nBits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignBands.compute($c, $nBits, $bands)")

  override protected def withNewChildInternal(newChild: Expression): SignBands =
    copy(child = newChild)
}

object SignBands {

  /** Column API entry point. */
  def signBands(vec: org.apache.spark.sql.Column, nBits: Int,
      bands: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      SignBands(org.apache.spark.sql.graftshim.ColumnBridge.expression(vec),
        nBits, bands))

  // plane matrices are tiny (nBits × dim doubles) and reused across every
  // row of a stage — cache per (nBits, dim)
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Component j of plane i: deterministic hash-to-[-1,1) — the exact
    * formula the unfused literal planes used.
    */
  def planes(nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((nBits, dim), { _ =>
      val p = new Array[Double](nBits * dim)
      var i = 0
      while (i < nBits) {
        var j = 0
        while (j < dim) {
          val h = java.lang.Long.rotateLeft((i.toLong * 0x9E3779B97F4A7C15L) ^
            (j.toLong * 0xC2B2AE3D27D4EB4FL), 31) * 0x165667B19E3779F9L
          p(i * dim + j) = (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
          j += 1
        }
        i += 1
      }
      p
    })

  /** Shared by interpreted and generated code paths. */
  def compute(v: ArrayData, nBits: Int, bands: Int): ArrayData = {
    val dim = v.numElements()
    val p = planes(nBits, dim)
    val bitsPerBand = nBits / bands
    val out = new Array[Long](bands)
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var j = 0
      val off = i * dim
      while (j < dim) {
        acc += v.getDouble(j) * p(off + j)
        j += 1
      }
      if (acc >= 0) out(i / bitsPerBand) |= 1L << (i % bitsPerBand)
      i += 1
    }
    new GenericArrayData(out)
  }
}
