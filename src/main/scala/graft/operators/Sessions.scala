package graft.operators

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the batch counterpart
  * of Structured Streaming session windows, and the standard "group a
  * user's events into visits" primitive a training-data pipeline needs
  * (e.g. to build per-session documents from interaction logs).
  *
  * Scale shape: one shuffle on the user key; the two window functions
  * (lag + running sum) and the final aggregate all share that
  * partitioning, so Catalyst plans a single Exchange. Skewed users (one
  * user with millions of events) serialize into one task — at 100 TB,
  * use [[sessionizePresplit]], which bounds per-task rows by a coarse
  * time bucket and merges sessions across bucket edges.
  */
object Sessions {

  /** Assigns each event a per-user session index (1-based, in time order)
    * and aggregates one row per session. A new session starts when the
    * gap since the user's previous event exceeds `gap`.
    *
    * Output: (userCol, session_idx, session_start, session_end, n_events).
    * Deterministic under timestamp ties: tied events land in the same
    * session whichever order the sort breaks the tie.
    */
  def sessionize(
      events: DataFrame, userCol: String, tsCol: String,
      gap: Duration = Duration.ofMinutes(30)
  ): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val gapMicros = gap.toNanos / 1000
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** [[sessionize]] with a hot-user skew guard: events are sessionized
    * within coarse (user, time-bucket) groups first, then the resulting
    * SESSIONS — orders of magnitude fewer rows than events — are merged
    * across bucket edges with the same gap rule. Output is identical to
    * the plain path (spec-asserted): within one user, buckets partition
    * time, so per-bucket sessions are disjoint intervals, and a greedy
    * start-ordered merge of intervals whose gap ≤ `gap` reproduces
    * exactly the global gap rule; n_events adds through merges and
    * session_idx is re-derived by start order.
    *
    * Scale shape: two Exchanges instead of one — (user, bucket) for the
    * event-level pass, then user for the interval merge — but no task
    * ever sorts more than one user's events per `bucket` span (pick the
    * bucket a few× the gap: big enough that most sessions don't span
    * edges, small enough to split the hottest user), and the merge pass
    * sorts sessions, bounded by events/session-density, not raw events.
    * Use the plain [[sessionize]] when no user exceeds a task.
    */
  def sessionizePresplit(
      events: DataFrame, userCol: String, tsCol: String,
      gap: Duration = Duration.ofMinutes(30),
      bucket: Duration = Duration.ofHours(6)
  ): DataFrame = {
    require(bucket.compareTo(gap) > 0, "bucket must exceed gap")
    val gapMicros = gap.toNanos / 1000
    val bucketMicros = bucket.toNanos / 1000
    // pass 1: the plain algorithm, partitioned by (user, coarse bucket)
    val wb = Window.partitionBy(col(userCol), col("__bkt")).orderBy(tsCol)
    val perBucket = events
      .withColumn("__bkt", floor(unix_micros(col(tsCol)) / bucketMicros))
      .withColumn("__prev", lag(col(tsCol), 1).over(wb))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("__prev")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("__sidx",
        sum(col("__new")).over(
          wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__bkt"), col("__sidx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
    // pass 2: merge bucket-local sessions over the user key — the same
    // lag + running-sum shape, applied to interval endpoints
    val wu = Window.partitionBy(col(userCol))
      .orderBy(col("session_start"), col("session_end"))
    perBucket
      .withColumn("__prev_end", lag(col("session_end"), 1).over(wu))
      .withColumn("__new",
        when(col("__prev_end").isNull ||
          unix_micros(col("session_start")) - unix_micros(col("__prev_end")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"))
  }
}
