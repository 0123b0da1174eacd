package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Merge aggregate over already-MATERIALIZED KMV/theta sketches — the
  * re-merge leg that makes the bottom-k sketch a warehouse object, the
  * exact analog of [[HllMergeRegisters]] for HLL registers and
  * `CmsCounters.cmsMergeCounters` for count-min grids: per-scope
  * sketches persisted as `vals` long arrays
  * ([[graft.operators.ThetaSketch.kmvSketch]]'s output) re-combine
  * months later into the sketch of the UNION without re-reading a
  * single key.
  *
  * KMV merge is LOSSLESS: the bottom-k of unioned bottom-k samples IS
  * the bottom-k of the union (any value among the union's k smallest
  * is among the k smallest of the scope it came from), so the merged
  * sketch is bit-identical to building one sketch over all the raw
  * keys — which is exactly what the DuckDB oracle computes directly.
  * Merge is associative and commutative (set union + retain-k-smallest
  * is), so map-side combine is sound: ≤ k longs per group per
  * partition cross the shuffle regardless of input cardinality.
  *
  * Emits (vals ascending, θ = k-th smallest or the 2⁵² domain when the
  * union holds < k distinct values, est = |{v < θ}|·2⁵² div θ) — the
  * same integer-grid estimator rule as
  * [[graft.operators.ThetaSketch.intersectEstimate]], exact while the
  * union is exhaustive.
  */
case class KmvMergeVals(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= 1024, "k in [2, 1024] keeps count*2^52 in int64")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("vals", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("theta", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))
  override def prettyName: String = "kmv_merge_vals"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def fold(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) {
      buf.add(v)
      if (buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        fold(buf, arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) fold(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val domain = graft.operators.ThetaSketch.Domain
    val n = buf.size
    val vals = new Array[Any](n)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { vals(i) = it.next().longValue(); i += 1 }
    val theta = if (n >= k) vals(n - 1).asInstanceOf[Long] else domain
    var below = 0L
    i = 0
    while (i < n && vals(i).asInstanceOf[Long] < theta) { below += 1; i += 1 }
    InternalRow(new GenericArrayData(vals), theta, below * domain / theta)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) { buf.add(bb.getLong); () }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeVals =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeVals =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvMergeVals =
    copy(child = newChildren.head)
}

object KmvMergeVals {
  /** Column form: re-merge persisted `vals` arrays (ascending bottom-k
    * hash samples, one row per scope) into the union's sketch.
    */
  def kmvMergeVals(vals: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMergeVals(ColumnBridge.expression(vals), k).toAggregateExpression())
}
