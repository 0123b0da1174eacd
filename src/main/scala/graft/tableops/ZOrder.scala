package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-dimensional (Z-order) clustering address for layout rewrites.
  *
  * The range-clustered compaction layout ([[TableOps.compactRaw]] with
  * `clusterBy`) sorts lexicographically, so the manifest's per-file
  * min/max ([[FileStats]]) become selective for the LEADING column only:
  * after clustering on `(x, y)`, a predicate on `y` alone still overlaps
  * every file, because each file spans the full `y` domain within its
  * narrow `x` slice. Z-ordering interleaves the bits of rank-bucketed
  * column values into one address, so sorting by the address gives every
  * file a tight hyper-rectangle in ALL clustered dimensions — a box
  * predicate on any subset of them prunes ~N^((k-s)/k) of N files
  * instead of none. This is the trade Delta's `OPTIMIZE ZORDER BY` and
  * Iceberg's sort-order rewrite make; here it is re-expressed against
  * this warehouse's own manifest stats, and it needs no new read
  * machinery: [[TxWarehouse.readWhere]] prunes on the very min/max the
  * interleaved layout tightens.
  *
  * Mechanics, sized for a 1000-executor rewrite:
  *  1. ONE bounded sampling job over only the clustered columns
  *     (column-pruned scan, per-partition top-K by a seeded random key —
  *     no full shuffle, ≤ `maxSample` rows on the driver) yields
  *     per-column quantile boundaries, the same move RangePartitioner
  *     makes. Rank-bucketing via quantiles rather than raw bit patterns
  *     keeps the interleave balanced when column domains differ wildly
  *     in scale or skew (a raw 64-bit epoch-micros column would
  *     otherwise contribute 40 constant high bits).
  *  2. Each column maps to a bucket in [0, 2^bits) by counting
  *     boundaries ≤ value — a fold over ≤ 63 literals, pure codegen'd
  *     comparisons, no UDF. Nulls bucket to 0 (nulls-first, matching the
  *     stats evaluator's "nulls never satisfy a comparison").
  *  3. Buckets interleave bit-by-bit into one long
  *     (bit `i` of column `j` lands at position `i*k + j`), and the
  *     rewrite range-partitions + sorts on that single address column,
  *     which its own range sampling keeps balanced regardless of bucket
  *     skew.
  *
  * The address column never reaches storage — callers drop it after the
  * sort, and the data files' stats are recorded on the REAL columns.
  */
object ZOrder {

  /** Working column name used by layout rewrites; never persisted. */
  val AddrCol = "__z_addr"

  /** Bits per dimension (64 buckets): with the 63-bit long budget this
    * supports up to 10 clustered columns, and 64 buckets per dimension
    * out-resolves any practical per-partition output file count.
    */
  val DefaultBits = 6

  /** The interleaved z-address for `cols` of `df` as a Column. Runs one
    * bounded sampling job on `df` (seeded — deterministic layout for a
    * given input) to learn bucket boundaries; the returned expression is
    * then fully distributed and codegen-friendly. Columns must exist;
    * supported types are the manifest-prunable ones plus the other
    * ordered primitives (integral, date, timestamp, float/double,
    * decimal, string, boolean) — an unsupported or constant column
    * contributes a constant 0 bucket (harmless: the other dimensions
    * still cluster).
    */
  def zAddress(df: DataFrame, cols: Seq[String], bits: Int = DefaultBits,
      maxSample: Int = 1 << 16, seed: Long = 42L): Column = {
    require(cols.nonEmpty, "zAddress needs at least one column")
    require(bits >= 1 && bits * cols.length <= 63,
      s"bits * cols must fit a long: $bits * ${cols.length}")
    val bounds = boundaries(df, cols, (1 << bits) - 1, maxSample, seed)
    interleave(cols.map(c => bucket(col(c), bounds(c))), bits)
  }

  /** Per-column quantile boundaries (ascending, deduplicated, ≤ `nB`
    * each) from one seeded sample of ≤ `maxSample` rows. The sample job
    * is a TakeOrdered over a random key: per-partition heap of
    * `maxSample`, single merge on the driver — no shuffle of the data,
    * bounded driver memory, unbiased regardless of the input's physical
    * order (a plain `limit` would sample only the first files of an
    * already-ordered table and learn boundaries from one corner of the
    * space).
    */
  private def boundaries(df: DataFrame, cols: Seq[String], nB: Int,
      maxSample: Int, seed: Long): Map[String, Seq[Any]] = {
    val sample: Array[Row] = df
      .select(cols.map(col): _*)
      .orderBy(rand(seed))
      .limit(maxSample)
      .collect()
    val schema = df.select(cols.map(col): _*).schema
    cols.zipWithIndex.map { case (c, i) =>
      val ord = orderingFor(schema(i).dataType)
      c -> (ord match {
        case None => Seq.empty[Any] // unsupported type: constant bucket
        case Some(o) =>
          val vs = sample.iterator.map(_.get(i)).filter(_ != null)
            .toArray.sortWith((a, b) => o(a, b) < 0)
          if (vs.isEmpty) Seq.empty[Any]
          else {
            // nB evenly spaced order statistics, deduplicated — a
            // low-cardinality column simply yields fewer, coarser
            // buckets (correct, just less resolution)
            val picks = (1 to nB).map(j => vs(((j.toLong * vs.length) / (nB + 1)).toInt))
            picks.foldLeft(Vector.empty[Any]) { (acc, v) =>
              if (acc.nonEmpty && o(acc.last, v) == 0) acc else acc :+ v
            }
          }
      })
    }.toMap
  }

  /** Driver-side ordering matching Spark's sort order for the types we
    * bucket (strings compare as UTF-8 bytes, per [[FileStats]]'s
    * soundness note). None = don't bucket this type.
    */
  private def orderingFor(dt: DataType): Option[(Any, Any) => Int] = dt match {
    case ByteType | ShortType | IntegerType | LongType => Some(
      (a, b) => java.lang.Long.compare(
        a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue))
    case FloatType | DoubleType => Some(
      (a, b) => java.lang.Double.compare(
        a.asInstanceOf[Number].doubleValue, b.asInstanceOf[Number].doubleValue))
    case _: DecimalType => Some(
      (a, b) => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal]))
    case DateType => Some(
      (a, b) => a.asInstanceOf[java.sql.Date].compareTo(b.asInstanceOf[java.sql.Date]))
    case TimestampType => Some(
      (a, b) => a.asInstanceOf[java.sql.Timestamp]
        .compareTo(b.asInstanceOf[java.sql.Timestamp]))
    case BooleanType => Some(
      (a, b) => java.lang.Boolean.compare(
        a.asInstanceOf[Boolean], b.asInstanceOf[Boolean]))
    case StringType => Some { (a, b) =>
      val x = a.toString.getBytes(UTF_8); val y = b.toString.getBytes(UTF_8)
      var i = 0; val n = math.min(x.length, y.length); var r = 0
      while (r == 0 && i < n) {
        r = java.lang.Byte.compareUnsigned(x(i), y(i)); i += 1
      }
      if (r != 0) r else x.length - y.length
    }
    case _ => None
  }

  /** Bucket id = number of boundaries ≤ value: a fold of codegen'd
    * comparisons over sorted literals. Null (and NaN-free unsupported
    * edges) → bucket 0.
    */
  private def bucket(c: Column, bs: Seq[Any]): Column =
    bs.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c.isNotNull && c >= lit(b), 1).otherwise(0)
    }

  /** Interleave `bits` bits of each bucket: bit `i` of bucket `j` →
    * address bit `i*k + j`, so equal-order bits of every dimension are
    * adjacent and the sort refines all dimensions together.
    */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.length
    var z = lit(0L)
    for (bit <- 0 until bits; (b, j) <- buckets.zipWithIndex)
      z = z.bitwiseOR(shiftleft(
        shiftright(b.cast("long"), bit).bitwiseAND(lit(1L)), bit * k + j))
    z
  }

  /** `df` laid out z-ordered on `cols` into `nOut` files: address →
    * range-partition → in-partition sort → address dropped. The range
    * partitioner's own sampling balances the output files even when
    * bucket occupancy is skewed.
    */
  def layout(df: DataFrame, cols: Seq[String], nOut: Int): DataFrame = {
    require(!df.columns.contains(AddrCol), s"column collision: $AddrCol")
    df.withColumn(AddrCol, zAddress(df, cols))
      .repartitionByRange(nOut, col(AddrCol))
      .sortWithinPartitions(col(AddrCol))
      .drop(AddrCol)
  }
}
