package graft.tableops

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for additive grouped aggregates —
  * keep `SELECT keys, count(*), sum(v1), sum(v2)… FROM src GROUP BY
  * keys` materialized as a tx table whose upkeep cost is O(CHANGED
  * FILES of src), never O(src). At 100 TB the difference is the whole
  * point: a day's churn touches a handful of files; recomputing the
  * view rescans the table.
  *
  * Three properties carry the design, all inherited rather than
  * invented:
  *
  *  1. **Delta extraction is [[TxWarehouse.diffSnapshots]]** — the
  *     manifest diff decides which files to read (O(churn)), and rows
  *     come back tagged insert/delete. The CDC is file-granular, so a
  *     rewrite that preserves rows (compaction, a dedup keeping most
  *     rows, updateWhere's survivors) emits them as BOTH delete and
  *     insert — and in a LINEAR aggregate those pairs cancel exactly
  *     (+x − x = 0), which makes this maintenance rewrite-proof with no
  *     key-level anti-join: count deltas sum signs, sum deltas sum
  *     signed values.
  *  2. **Application is [[TxWarehouse.mergeIntoTxn]]** — the merged
  *     rows land in ONE atomic commit that also carries the
  *     `(appId, srcVersion)` txn marker, so a crashed/replayed
  *     maintenance run is exactly-once: re-running at-or-below the
  *     applied source version is a no-op, and there is no window where
  *     the view reflects a version the marker does not (or vice versa).
  *  3. **Groups whose row count returns to zero are DELETED** from the
  *     view (mergeInto's deleteCol), so the view never accretes dead
  *     groups.
  *
  * The view schema is `keys…, countCol, sum columns…, date` with the
  * caller-fixed `date` partition. Sum columns must be integer-typed in
  * the source (LONG arithmetic is associative; float sums would make
  * the view's value depend on churn history — scale doubles to e2
  * longs upstream).
  *
  * Cost note at depth: the delta-to-existing lookup is a LEFT JOIN of
  * the (small) delta against the view read; on a bloom'd/range-
  * clustered view that read prunes to the touched key range.
  *
  * @return Some(fromVersion, toVersion) applied, or None when the view
  *         is already current (or the net delta cancelled to nothing —
  *         correctness unaffected; the skipped marker only means the
  *         same cancelling churn is re-diffed next run).
  */
object IncrementalAgg {

  def maintainSumView(spark: SparkSession, wh: TxWarehouse,
      srcPath: String, viewPath: String, keyCols: Seq[String],
      countCol: String, sumCols: Seq[(String, String)],
      appId: String, date: LocalDate): Option[(Long, Long)] = {
    require(keyCols.nonEmpty, "IVM needs at least one group key")
    require(!appId.exists(_.isWhitespace), "appId must not contain whitespace")
    val fromV = math.max(0L, wh.lastTxn(spark, viewPath, appId))
    val toV = wh.currentVersion(spark, srcPath)
    if (toV <= fromV) return None

    val changes = wh.diffSnapshots(spark, srcPath, fromV, toV)
    if (changes.isEmpty) return None
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val deltaAggs = sum(sign).as("__dn") +: sumCols.map { case (out, src) =>
      sum(sign * col(src).cast("long")).as(s"__d_$out")
    }
    val zero = sumCols.foldLeft(col("__dn") === 0L) { case (c, (out, _)) =>
      c && col(s"__d_$out") === 0L
    }
    val delta = changes
      .groupBy(keyCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
      .filter(!zero)
    if (delta.isEmpty) return None

    val existing =
      if (wh.exists(spark, viewPath))
        wh.read(spark, viewPath)
          .select((keyCols.map(col) :+ col(countCol)) ++
            sumCols.map { case (out, _) => col(out) }: _*)
      else {
        val fields = keyCols.map(k =>
          delta.schema(k).copy(nullable = true)) ++
          (countCol +: sumCols.map(_._1)).map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.LongType))
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(fields))
      }

    val newCount = (coalesce(col(countCol), lit(0L)) + col("__dn"))
      .as(countCol)
    val newSums = sumCols.map { case (out, _) =>
      (coalesce(col(out), lit(0L)) + col(s"__d_$out")).as(out)
    }
    val merged = delta.join(existing, keyCols, "left")
      .select(keyCols.map(col) ++ (newCount +: newSums): _*)
      .withColumn("date", lit(java.sql.Date.valueOf(date)))
      .withColumn("_delete", col(countCol) === 0L)
    wh.mergeIntoTxn(spark, merged, viewPath, keyCols, Some("_delete"),
      appId, toV)
    Some((fromV, toV))
  }
}
