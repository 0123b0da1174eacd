package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") over
  * PRE-HASHED 64-bit input — the 100 TB frequency-estimation tool that
  * complements [[HllRegisters]] (cardinality) and
  * [[FrequentItems]] (Misra-Gries top-k): the aggregation state is a
  * fixed `d × w` grid of long counters per group REGARDLESS of stream
  * length or distinct count, merge is elementwise ADD (so map-side
  * combine ships `8·d·w` bytes per partition per group instead of the
  * value stream), and any item's frequency is over-estimated by at most
  * `2n/w` with probability `1 − 2^−d` — never under-estimated.
  *
  * The caller supplies the hash (`xxhash64(col)` — codegen'd, and
  * already reproducible in DuckDB via [[graft.XxOracleSql]]'s XXH64
  * chain); the sketch derives its `d` row hashes from that one 64-bit
  * value by Kirsch–Mitzenmacher double hashing (2006, "Less hashing,
  * same performance"): with `a` = top 32 bits (unsigned) and
  * `b` = (low 32 bits) | 1 (forced odd, so b is invertible mod the
  * power-of-two width), row `i` indexes `(a + i·b) mod w`. Everything
  * is integer-exact, so the emitted grid is bit-reproducible in any
  * engine at any partitioning — the oracle unrolls the same arithmetic
  * in SQL.
  *
  * Emits `(n_total, counters)` where `counters` is the nonzero
  * (row, idx, cnt) triples sorted by (row, idx) — the persistable
  * sketch unit. Point estimates are a downstream join: explode the
  * triples, compute the probe's d indexes with the same arithmetic
  * (plain codegen'd expressions — see `ev_cms_freq`), take
  * `min(cnt)` over rows (a missing triple means the counter is zero,
  * which can only happen for items that never occurred).
  */
case class CmsCounters(
    child: Expression,
    d: Int,
    logW: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 16, "depth d must be in [1, 16]")
  require(logW >= 4 && logW <= 24, "logW must be in [4, 24]")
  private def w: Int = 1 << logW

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("counters", ArrayType(
      StructType(Seq(
        StructField("row", IntegerType, nullable = false),
        StructField("idx", IntegerType, nullable = false),
        StructField("cnt", LongType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "cms_counters"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CmsCounters.observe(buf, v.asInstanceOf[Long], d, logW)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = CmsCounters.evalRow(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsCounters =
    copy(child = newChildren.head)
}

object CmsCounters {
  /** Fold one pre-hashed value into the grid in place — the ONE
    * index-derivation definition every consumer shares (the aggregate
    * here, the probe-side expression arithmetic in `ev_cms_freq`, and
    * the SQL oracle), so they cannot drift: a = top 32 bits of the
    * unsigned hash, b = low 32 bits forced odd, row i increments
    * column (a + i·b) mod 2^logW.
    */
  /** The aggregates' shared output row: (n_total from row 0's sum,
    * nonzero (row, idx, cnt) triples in (row, idx) order).
    */
  private[functions] def evalRow(buf: Array[Long], w: Int): InternalRow = {
    var nTotal = 0L
    var j = 0
    while (j < w) { nTotal += buf(j); j += 1 } // row 0 sums the stream
    var nnz = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) nnz += 1; i += 1 }
    val triples = new Array[Any](nnz)
    i = 0
    var k = 0
    while (i < buf.length) {
      if (buf(i) != 0L) {
        triples(k) = InternalRow(i / w, i % w, buf(i))
        k += 1
      }
      i += 1
    }
    InternalRow(nTotal, new GenericArrayData(triples))
  }

  def observe(buf: Array[Long], h: Long, d: Int, logW: Int): Unit = {
    val w = 1 << logW
    val mask = w - 1
    val aU = h >>> 32
    val bU = (h & 0xffffffffL) | 1L
    var i = 0
    while (i < d) {
      buf(i * w + ((aU + i * bU) & mask).toInt) += 1L
      i += 1
    }
  }

  /** Column form: `cmsCounters(hash64, d, logW)` over a pre-hashed
    * LONG column (pair with `xxhash64(...)`).
    */
  def cmsCounters(hash64: Column, d: Int, logW: Int): Column =
    ColumnBridge.column(
      CmsCounters(ColumnBridge.expression(hash64), d, logW)
        .toAggregateExpression())

  /** Column form: re-merge PERSISTED sketches — input is the
    * `counters` array<struct<row,idx,cnt>> the main aggregate emitted
    * (e.g. one row per day/group read back from a table), output the
    * same (n_total, counters) struct over the union. Counter addition
    * is associative and commutative, so frequency grids compose across
    * days/sources without re-reading the streams — the property that
    * makes the sketch a warehouse object like [[HllRegisters]]'.
    */
  def cmsMergeCounters(counters: Column, d: Int, logW: Int): Column =
    ColumnBridge.column(
      CmsMergeCounters(ColumnBridge.expression(counters), d, logW)
        .toAggregateExpression())
}

/** Merge aggregate over already-materialized counter triples — same
  * state, same output row as [[CmsCounters]]; update folds each input
  * row's (row, idx, cnt) triples by addition.
  */
case class CmsMergeCounters(
    child: Expression,
    d: Int,
    logW: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 16, "depth d must be in [1, 16]")
  require(logW >= 4 && logW <= 24, "logW must be in [4, 24]")
  private def w: Int = 1 << logW

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = CmsCounters(child, d, logW).dataType
  override def prettyName: String = "cms_merge_counters"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val t = arr.getStruct(i, 3)
        buf(t.getInt(0) * w + t.getInt(1)) += t.getLong(2)
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

  override def eval(buf: Array[Long]): Any = CmsCounters.evalRow(buf, w)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeCounters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeCounters =
    copy(child = newChildren.head)
}
