package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm") over PRE-HASHED 64-bit input — the canonical 100 TB
  * distinct-count tool: the aggregation state is `m = 2^p` byte
  * registers per group REGARDLESS of stream length, and merge is
  * elementwise max, so map-side combine ships `m` bytes per partition
  * per group across the shuffle instead of the value stream (an exact
  * count-distinct ships every distinct value to the reducer).
  *
  * The caller supplies the hash (`xxhash64(col)` — already codegen'd
  * and already oracled in DuckDB by [[graft.XxOracleSql]]); the
  * aggregate only slices bits, which keeps it hash-algorithm-agnostic
  * and the oracle story one-layer. Register assignment is the textbook
  * split of the UNSIGNED hash: bucket = top `p` bits, rho = number of
  * leading zeros of the remaining `64-p` bits plus one (all-zero
  * remainder → `64-p+1`).
  *
  * Everything emitted is INTEGER-exact and therefore bit-reproducible
  * in any engine at any partitioning:
  *  - `registers`: the nonzero (bucket, register) pairs sorted by
  *    bucket — the sketch itself, the unit a warehouse would persist
  *    and re-merge across days;
  *  - `nnz`: the count of nonzero registers (m − nnz = the linear-
  *    counting zeros term);
  *  - `est_raw`: the raw HLL estimate
  *    `floor(alpha_micro · m² · 2^64 / (10^6 · S))` where
  *    `S = Σ_j 2^(64−M[j])` (empty registers contribute 2^64) and
  *    `alpha_micro = round(10^6 · 0.7213/(1 + 1.079/m))` — computed in
  *    BigInteger so the division happens once, exactly. S is a sum of
  *    integers (order-free); no float enters until never.
  *
  * Bias corrections (linear counting below 2.5m, the 2^64 clamp) are
  * range corrections on top of `est_raw` and involve `ln`; they are the
  * CALLER's choice — the sketch emits `nnz` so either engine can apply
  * them identically, and the oracle gate compares the uncorrected
  * integer field. At p=9 the standard error is 1.04/√512 ≈ 4.6%.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "p must be in [4, 16]")
  private def m: Int = 1 << p

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("nnz", IntegerType, nullable = false),
    StructField("est_raw", LongType, nullable = false),
    StructField("registers", ArrayType(
      StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("register", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllRegisters.observe(buf, v.asInstanceOf[Long], p)
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllRegisters.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = HllRegisters.evalRow(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
}

object HllRegisters {
  /** round(10^6 · 0.7213 / (1 + 1.079/m)) — the Flajolet alpha_m for
    * m ≥ 128, on the same integer grid the oracle hardcodes. Computed
    * once in exact rational form: 10^6·0.7213/(1+1.079/m)
    * = 7213·10^5·m / (10^3·m + 1079) rounded half-up.
    */
  def alphaMicro(m: Int): Long = {
    val num = BigInteger.valueOf(721300000L).multiply(BigInteger.valueOf(m.toLong))
    val den = BigInteger.valueOf(1000L * m + 1079L)
    // round half-up: (2·num + den) / (2·den)
    num.multiply(BigInteger.TWO).add(den)
      .divide(den.multiply(BigInteger.TWO)).longValueExact()
  }

  /** Fold one pre-hashed value into the register array in place — the
    * ONE bit-slicing definition every consumer (the aggregate, the
    * register-merge aggregate, the streaming keyed state) shares, so
    * they cannot drift: bucket = top p bits (unsigned), rho = leading
    * zeros of the remaining 64−p bits + 1 (all-zero remainder →
    * 64−p+1).
    */
  def observe(buf: Array[Byte], h: Long, p: Int): Unit = {
    val bucket = (h >>> (64 - p)).toInt
    val rest = h << p
    val rho = (if (rest == 0L) 64 - p + 1
               else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
    if (rho > buf(bucket)) buf(bucket) = rho
  }

  /** Elementwise max of `other` into `buf` (both length 2^p). */
  def mergeInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  /** (nnz, raw estimate) on the exact integer grid — see the class doc. */
  def stats(buf: Array[Byte], p: Int): (Int, Long) = {
    val m = 1 << p
    var nnz = 0
    // S scaled: Σ 2^(64−rho) over all m buckets, rho=0 meaning 2^64.
    // Max Σ = m·2^64 = 2^(64+p) — BigInteger, exact.
    var s = BigInteger.ZERO
    var i = 0
    while (i < m) {
      val r = buf(i).toInt
      s = s.add(BigInteger.ONE.shiftLeft(64 - r))
      if (r > 0) nnz += 1
      i += 1
    }
    val est = BigInteger.valueOf(alphaMicro(m))
      .multiply(BigInteger.valueOf(m.toLong * m.toLong))
      .shiftLeft(64)
      .divide(BigInteger.valueOf(1000000L).multiply(s))
      .longValueExact()
    (nnz, est)
  }

  /** The aggregate's output row: (nnz, est_raw, nonzero registers). */
  private[functions] def evalRow(buf: Array[Byte], p: Int): InternalRow = {
    val m = 1 << p
    val (nnz, est) = stats(buf, p)
    val pairs = new Array[Any](nnz)
    var i = 0
    var j = 0
    while (i < m) {
      if (buf(i) > 0) { pairs(j) = InternalRow(i, buf(i).toInt); j += 1 }
      i += 1
    }
    InternalRow(nnz, est, new GenericArrayData(pairs))
  }

  /** Column form: `hllRegisters(hash64, p)` over a pre-hashed LONG
    * column (pair with `xxhash64(...)`).
    */
  def hllRegisters(hash64: Column, p: Int): Column =
    ColumnBridge.column(
      HllRegisters(ColumnBridge.expression(hash64), p).toAggregateExpression())

  /** Column form: re-merge PERSISTED sketches — input is the
    * `registers` array<struct<bucket,register>> the main aggregate
    * emitted (e.g. one row per day/group read back from a table), output
    * the same (nnz, est_raw, registers) struct over the union. This is
    * the property that makes the sketch a warehouse object: distinct
    * counts compose by register max, never by re-reading the ids.
    */
  def hllMergeRegisters(registers: Column, p: Int): Column =
    ColumnBridge.column(
      HllMergeRegisters(ColumnBridge.expression(registers), p)
        .toAggregateExpression())
}

/** Merge aggregate over already-materialized register arrays — same
  * state, same output row as [[HllRegisters]]; update folds each input
  * row's (bucket, register) pairs by elementwise max.
  */
case class HllMergeRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, "p must be in [4, 16]")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("nnz", IntegerType, nullable = false),
    StructField("est_raw", LongType, nullable = false),
    StructField("registers", ArrayType(
      StructType(Seq(
        StructField("bucket", IntegerType, nullable = false),
        StructField("register", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))
  override def prettyName: String = "hll_merge_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        val bucket = row.getInt(0)
        val reg = row.getInt(1).toByte
        if (reg > buf(bucket)) buf(bucket) = reg
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    HllRegisters.mergeInto(buf, other)

  override def eval(buf: Array[Byte]): Any = HllRegisters.evalRow(buf, p)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeRegisters =
    copy(child = newChildren.head)
}
