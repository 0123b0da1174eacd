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
  * pre-split such users by a coarse time bucket first if they exist.
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
}
