package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory frequent-items sketch (Misra-Gries, with the
  * Agarwal et al. "Mergeable Summaries" merge): at most `capacity`
  * counters per aggregation buffer REGARDLESS of stream length or
  * cardinality — the memory contract an exact token-count aggregate
  * cannot make at 100 TB (its hash map is vocabulary-sized per task).
  *
  * Guarantees (N = items processed, m = capacity): every retained
  * counter UNDERestimates its item's true frequency by at most
  * `(N − Σ retained counts) / (m + 1)`, and any item with true
  * frequency above that bound is guaranteed present. The aggregate
  * emits the bound per row: `cnt_lo` is the counter, `cnt_hi = cnt_lo +
  * bound` — so `cnt_lo = cnt_hi` certifies the count EXACT (which holds
  * everywhere when per-buffer distinct counts never exceed `m`: no
  * decrement ever fires and the sketch degenerates to exact counting;
  * the correctness oracle runs in that regime on purpose).
  *
  * Merge sums counters pairwise, then restores the bound by subtracting
  * the (m+1)-th largest count from every counter and dropping the
  * non-positive ones — the standard mergeable-summaries step, so
  * partial aggregation (map-side combine) is safe: k counters per map
  * partition cross the shuffle, never the token stream.
  *
  * Output: array<struct<item, cnt_lo, cnt_hi>> sorted by
  * (cnt_lo DESC, item ASC). Null items are ignored.
  */
case class FrequentItems(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FrequentItems.Buf] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("cnt_lo", LongType, nullable = false),
      StructField("cnt_hi", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "frequent_items"

  override def createAggregationBuffer(): FrequentItems.Buf =
    new FrequentItems.Buf(new java.util.HashMap[String, Array[Long]](), 0L)

  override def update(buf: FrequentItems.Buf, input: InternalRow): FrequentItems.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.n += 1L
      val cur = buf.m.get(item)
      if (cur != null) cur(0) += 1L
      else if (buf.m.size < capacity) buf.m.put(item, Array(1L))
      else {
        // classic MG decrement round: every counter −1 (the arriving
        // item's conceptual counter hits 0 and is not inserted)
        val it = buf.m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          e.getValue()(0) -= 1L
          if (e.getValue()(0) <= 0L) it.remove()
        }
      }
    }
    buf
  }

  override def merge(buf: FrequentItems.Buf, other: FrequentItems.Buf): FrequentItems.Buf = {
    buf.n += other.n
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.m.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0)
      else buf.m.put(e.getKey, Array(e.getValue()(0)))
    }
    if (buf.m.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop non-positives — restores size ≤ capacity and the MG bound
      val counts = new Array[Long](buf.m.size)
      var i = 0
      val vs = buf.m.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next()(0); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(buf.m.size - capacity - 1)
      val es = buf.m.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        e.getValue()(0) -= cut
        if (e.getValue()(0) <= 0L) es.remove()
      }
    }
    buf
  }

  override def eval(buf: FrequentItems.Buf): Any = {
    var kept = 0L
    val vs = buf.m.values().iterator()
    while (vs.hasNext) kept += vs.next()(0)
    val bound = (buf.n - kept) / (capacity + 1L)
    val arr = new Array[(String, Long)](buf.m.size)
    var i = 0
    val es = buf.m.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      arr(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    java.util.Arrays.sort(arr, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val byCnt = java.lang.Long.compare(b._2, a._2)
        if (byCnt != 0) byCnt else a._1.compareTo(b._1)
      }
    })
    new GenericArrayData(arr.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c, c + bound): Any
    })
  }

  override def serialize(buf: FrequentItems.Buf): Array[Byte] = {
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.m.size)
    var bytes = 12 // n + size
    val es = buf.m.entrySet().iterator()
    while (es.hasNext) {
      val e = es.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue()(0)))
      bytes += 4 + b.length + 8
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putLong(buf.n)
    bb.putInt(entries.size())
    var i = 0
    while (i < entries.size()) {
      val (b, c) = entries.get(i)
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FrequentItems.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val sz = bb.getInt
    val m = new java.util.HashMap[String, Array[Long]](sz * 2)
    var i = 0
    while (i < sz) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), Array(bb.getLong))
      i += 1
    }
    new FrequentItems.Buf(m, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(child = newChildren.head)
}

object FrequentItems {
  /** Mutable sketch state: item → 1-element count cell, plus the total
    * processed count (the error bound's N).
    */
  final class Buf(val m: java.util.HashMap[String, Array[Long]], var n: Long)

  /** Column form: `frequentItems(item, capacity)` over a string column. */
  def frequentItems(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FrequentItems(ColumnBridge.expression(item), capacity).toAggregateExpression())
}
