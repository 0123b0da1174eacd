package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators reproducing the reference's semantics.
  *
  * Two distinct semantics exist in the reference (SURVEY.md §2.4, §7.3):
  *
  *  1. v2 "keep-set" dedup (cloud/bq/ops.go:190-218): a DELETE keeps every
  *     row whose (partition keys, order key) equals the winning order key —
  *     ALL rows tying on the max order key survive. Implemented as a
  *     max-over-window + filter: one shuffle, no global sort, no row
  *     explosion; ties are preserved exactly.
  *  2. legacy ranked dedup (cloud/bq/dedup.go): ROW_NUMBER() = 1 over a
  *     multi-key priority order — exactly one row per key survives.
  *
  * Scale notes: both are a single hash-partition shuffle on the dedup keys.
  * The keep-set form uses an unordered window aggregate (max), so Spark's
  * WindowExec sorts only by partition keys within each shuffle partition.
  * At 100 TB, dedup cost is proportional to the partition being cleaned
  * (the reference observes the same: cloud/bq/ops.go:186-189); AQE handles
  * skewed ids.
  */
object Dedup {

  /** v2 keep-set dedup: keep rows where `orderKey` equals the max over the
    * partition keys. Ties on the max all survive — matching the reference's
    * NOT EXISTS delete (cloud/bq/ops.go:214-217).
    */
  def keepLatest(df: DataFrame, partitionKeys: Seq[String], orderKey: Column): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*)
    df.withColumn("__max_order_key", max(orderKey).over(w))
      .filter(orderKey === col("__max_order_key"))
      .drop("__max_order_key")
  }

  /** Legacy ranked dedup: exactly one row per key, first in `ordering`.
    * Reference: cloud/bq/dedup.go:23-38 (ndt), :41-53 (sidestream),
    * :55-68 (traceroute). Callers must make `ordering` total if they need
    * deterministic output.
    */
  def rankedFirst(df: DataFrame, partitionKeys: Seq[Column], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionKeys: _*).orderBy(ordering: _*)
    df.withColumn("__row_number", row_number().over(w))
      .filter(col("__row_number") === 1)
      .drop("__row_number")
  }

  /** [[rankedFirst]] as a HASH AGGREGATE instead of a sorted window —
    * identical semantics (exactly one row per key, first in `ordering`)
    * when the ordering is total, a different physical shape: the window
    * form shuffles every row and SORTS each hash partition by
    * (keys, ordering); this form folds each key to its current winner
    * via `min_by(row, sortKey)` with map-side partial aggregation — the
    * shuffle carries one candidate row per (key, input partition), and
    * nothing ever sorts. On a 100 TB day-partition with meaningful
    * duplication that is the difference between shuffling the day and
    * shuffling its distinct keys; with a hot key it degrades like any
    * hash aggregate (partial combine absorbs the skew map-side) instead
    * of serializing one sort task.
    *
    * Mixed-direction orderings are normalized into one ascending struct
    * sort key: DESC numeric/boolean fields negate, DESC integral/date/
    * timestamp fields invert bitwise (`~x`, an overflow-free
    * order-reversing bijection), strings can't be cheaply inverted — a
    * DESC string (or an unsupported type) falls back to the window form.
    * Physical shape: a row-carrying `min_by` plans as SortAggregate
    * (struct buffers aren't hash-aggregable), but the required sort is
    * by GROUP KEYS only — not the full ordering — and the partial
    * aggregate still combines map-side, which is where the win lives.
    * Caveats vs the window form, all documented not silently diverged:
    * ties beyond a non-total ordering resolve arbitrarily (same contract
    * as [[rankedFirst]]); NULL/NaN in a DESC field sort first rather
    * than last (Spark's desc default) — callers with nullable DESC
    * ordering columns should use [[rankedFirst]]; and a DESC
    * timestamp_ntz ordering is coerced through the session zone, which
    * is order-preserving in DST-free session zones (this library's UTC
    * standard) — under a DST session zone use [[rankedFirst]].
    */
  def rankedFirstAgg(df: DataFrame, partitionKeys: Seq[Column],
      ordering: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    import org.apache.spark.sql.types._

    def typeOf(c: Column): DataType = df.select(c).schema.head.dataType

    // Some(normalized ascending column) or None = not invertible
    val normalized: Seq[Option[Column]] = ordering.map { o =>
      ColumnBridge.unwrapSortOrder(o) match {
        case Some((c, true)) => // descending: order-reversing bijection
          typeOf(c) match {
            case ByteType | ShortType | IntegerType | LongType =>
              Some(bitwise_not(c.cast("long")))
            case FloatType | DoubleType | _: DecimalType => Some(-c)
            case DateType => Some(bitwise_not(unix_date(c)))
            case TimestampType => Some(bitwise_not(unix_micros(c)))
            case TimestampNTZType =>
              // ntz→instant goes through the session zone; monotone in
              // DST-free session zones (the library standard is UTC) —
              // see the scaladoc caveat
              Some(bitwise_not(unix_micros(c.cast("timestamp"))))
            case BooleanType => Some(!c)
            case _ => None // strings and exotica: no cheap inversion
          }
        case Some((c, false)) => Some(c) // explicit ascending
        case None => Some(o) // bare column: orderBy treats it ascending
      }
    }
    if (normalized.exists(_.isEmpty)) rankedFirst(df, partitionKeys, ordering)
    else {
      val sortKey = struct(normalized.map(_.get): _*)
      val row = struct(df.columns.map(col): _*)
      df.groupBy(partitionKeys: _*)
        .agg(min_by(row, sortKey).as("__ranked_row"))
        .select(col("__ranked_row.*"))
    }
  }

  /** Keep-set dedup for SKEWED keys — identical semantics to
    * [[keepLatest]], different physical shape. The window form sorts each
    * hash partition by the dedup keys, so one hot key (a single id with
    * millions of rows on a 100 TB day-partition) serializes into one
    * task. This form computes the winning order key as a hash aggregate
    * (partial aggregation combines map-side, so the hot key ships one
    * pre-aggregated row per input partition) and semi-joins the winners
    * back — a plain shuffle join that AQE's skew-join splitting can
    * parallelize. Prefer [[keepLatest]] when keys are well distributed
    * (one shuffle, no join); prefer this when a key can be hot.
    */
  def keepLatestForSkew(df: DataFrame, partitionKeys: Seq[String], orderKey: Column): DataFrame = {
    val winners = df.groupBy(partitionKeys.map(col): _*)
      .agg(max(orderKey).as("__max_order_key"))
      .toDF(partitionKeys.map(k => s"__k_$k") :+ "__max_order_key": _*)
    // <=> on keys: the window form groups null keys together, so the
    // join-back must too; === on the order key matches keepLatest's
    // filter (an all-null group keeps nothing in both forms).
    val cond = partitionKeys.map(k => col(k) <=> col(s"__k_$k"))
      .reduce(_ && _) && (orderKey === col("__max_order_key"))
    df.join(winners, cond, "left_semi")
  }

  /** The deleted set of a keep-set dedup — rows the reference's DELETE would
    * remove (anti-join semantics, SURVEY.md §2.3 J2). Useful for audits.
    */
  def deletedSet(df: DataFrame, partitionKeys: Seq[String], orderKey: Column): DataFrame = {
    val w = Window.partitionBy(partitionKeys.map(col): _*)
    df.withColumn("__max_order_key", max(orderKey).over(w))
      .filter(orderKey =!= col("__max_order_key"))
      .drop("__max_order_key")
  }

  /** Duplicate-stats pre-check: keys whose group holds more than one distinct
    * order-key value — i.e. groups a keep-set dedup would actually shrink.
    * The reference gets "very cheap if no duplicates" for free from DELETE
    * semantics (cloud/bq/ops.go:188); we expose the check so callers can skip
    * the partition rewrite entirely when it would be a no-op — a map-side-
    * combined aggregate, far cheaper than rewriting the partition.
    */
  def duplicateStats(df: DataFrame, partitionKeys: Seq[String], orderKey: Column): DataFrame =
    df.groupBy(partitionKeys.map(col): _*)
      .agg(count(lit(1)).as("rows"), countDistinct(orderKey).as("versions"))
      .filter(col("versions") > 1)

  /** Sketch-based [[duplicateStats]] for the 100 TB pre-check:
    * approx_count_distinct (HLL++) instead of exact countDistinct — the
    * exact form keeps every distinct order key in the aggregation state,
    * the sketch is constant-size per group. HLL++ is exact in its sparse
    * range, so "more than one version" is still a reliable signal at any
    * realistic rsd.
    */
  def duplicateStatsApprox(
      df: DataFrame, partitionKeys: Seq[String], orderKey: Column,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(partitionKeys.map(col): _*)
      .agg(count(lit(1)).as("rows"),
        approx_count_distinct(orderKey, rsd).as("versions_approx"))
      .filter(col("versions_approx") > 1)

  /** True iff a keep-set dedup would change nothing (cheap pre-check). */
  def isClean(df: DataFrame, partitionKeys: Seq[String], orderKey: Column): Boolean =
    duplicateStats(df, partitionKeys, orderKey).isEmpty
}
