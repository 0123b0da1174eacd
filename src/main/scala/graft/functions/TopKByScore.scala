package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Top-k by (score DESC, id ASC) as a TypedImperativeAggregate.
  *
  * The window formulation of per-group top-k
  * (`row_number().over(partitionBy(g).orderBy(score.desc)) <= k`) shuffles
  * and sorts EVERY scored row. This aggregate keeps a bounded k-element
  * heap per group and participates in partial aggregation, so only k rows
  * per group PER MAP PARTITION cross the shuffle — at a 100 TB corpus ×
  * query fan-out that is the difference between shuffling the cross
  * product and shuffling k·partitions rows.
  *
  * Input: struct(score: Long, id: Long). Output: array<struct<id, score>>
  * sorted by (score DESC, id ASC) — identical row set and order to the
  * window formulation for any total (score, id) order (ties on score break
  * by ascending id, deterministically).
  */
case class TopKByScore(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  // min-heap: the WORST element (lowest score, then highest id) at the head
  private def newHeap(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](k + 1,
      new java.util.Comparator[Array[Long]] {
        override def compare(a: Array[Long], b: Array[Long]): Int = {
          val byScore = java.lang.Long.compare(a(0), b(0))
          if (byScore != 0) byScore else java.lang.Long.compare(b(1), a(1))
        }
      })

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] = newHeap()

  override def update(
      buf: java.util.PriorityQueue[Array[Long]], input: InternalRow
  ): java.util.PriorityQueue[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.add(Array(row.getLong(0), row.getLong(1)))
      if (buf.size > k) buf.poll()
    }
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[Array[Long]],
      other: java.util.PriorityQueue[Array[Long]]
  ): java.util.PriorityQueue[Array[Long]] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.poll()
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val arr = new Array[Array[Long]](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // (score DESC, id ASC)
    java.util.Arrays.sort(arr, new java.util.Comparator[Array[Long]] {
      override def compare(a: Array[Long], b: Array[Long]): Int = {
        val byScore = java.lang.Long.compare(b(0), a(0))
        if (byScore != 0) byScore else java.lang.Long.compare(a(1), b(1))
      }
    })
    new GenericArrayData(arr.map(e =>
      InternalRow(e(1), e(0)): Any))
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e(0)); bb.putLong(e(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = newHeap()
    var i = 0
    while (i < n) { heap.add(Array(bb.getLong, bb.getLong)); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(child = newChildren.head)
}

object TopKByScore {
  /** Column form: input a struct(score: Long, id: Long) column. */
  def topKByScore(scoreId: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(scoreId), k).toAggregateExpression())
}
