package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Second-moment (Gram) accumulator over an embedding column, as a
  * TypedImperativeAggregate — the covariance/PCA training statistic in
  * its scale-correct shape.
  *
  * The declarative alternative explodes every vector into d(d+1)/2
  * upper-triangle product rows before aggregating (a 2 080× row
  * amplification at d = 64 that exists only to be summed back down).
  * This aggregate folds each vector into a single packed
  * `Array[Long]` buffer per group per map task — update is one O(d²)
  * pass, partial aggregation combines map-side, and ONE buffer per
  * group crosses the shuffle regardless of corpus size. Same
  * ObjectHashAggregate machinery as [[TopKByScore]].
  *
  * Quantized-integer statistics, like the `*_e6` query family: elements
  * quantize to `q = floor(x · scale)` BEFORE any product or sum, so
  * results are exact integers — engine-portable (a float Gram matrix
  * depends on summation order) at the cost of `1/scale` input
  * resolution. Output: `struct<n, sums: array (Σq_i), gram: array
  * (packed row-major upper triangle of Σ q_i·q_j)>`; the biased
  * covariance follows as `(n·G_ij − S_i·S_j) / n²` in scale² units —
  * computed downstream so everything here stays overflow-checkable:
  * with |x| ≤ 1, `scale = 10³` holds exact past 10⁹ rows
  * (q ≤ 10³, n·ΣG ≤ n²·10⁶ < 2⁶³ at n = 10⁹ per group).
  *
  * Null vectors are skipped; a vector of the wrong length is a data
  * bug and throws (silently mis-accumulating a covariance is worse).
  */
case class GramMatrix(
    child: Expression,
    dim: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 0, "dim must be positive")
  require(scale > 0, "scale must be positive")

  private val triLen = dim * (dim + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("gram", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "gram_matrix"

  // buffer layout: [n, sums(dim), upper-triangle gram(triLen)]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + triLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dim,
        s"gram_matrix(dim=$dim) got a vector of length ${arr.numElements()}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        q(i) = math.floor(arr.getFloat(i).toDouble * scale).toLong
        i += 1
      }
      buf(0) += 1
      i = 0
      var t = 1 + dim
      while (i < dim) {
        buf(1 + i) += q(i)
        var j = i
        while (j < dim) {
          buf(t) += q(i) * q(j)
          j += 1; t += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = InternalRow(
    buf(0),
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + dim)),
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1 + dim, buf.length)))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramMatrix =
    copy(child = newChildren.head)
}

object GramMatrix {
  /** Column API: `gram_matrix(vec, dim, scale)` over `array<float>`. */
  def apply(vec: Column, dim: Int, scale: Double): Column =
    ColumnBridge.column(GramMatrix(ColumnBridge.expression(vec), dim, scale)
      .toAggregateExpression())
}
