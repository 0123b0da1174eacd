package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort and funnel analytics over an event stream — the standard
  * product-analytics pair every event warehouse ends up needing (the
  * reference's events are measurements, but its incremental date-
  * partition model is exactly a product event stream; SURVEY.md §7.5).
  */
object EventAnalytics {

  /** Retention cohort matrix: users grouped by the date of their FIRST
    * event (the cohort), counted in each subsequent `bucketDays`-wide
    * activity period. Output: (cohort_date, period_offset, n_users) —
    * period_offset 0 is the cohort's own bucket, so n_users at offset 0
    * is the cohort size and the classic retention curve is each row
    * divided by it.
    *
    * Scale shape: one distinct over (user, day) — active DAYS per user,
    * orders of magnitude fewer rows than events — then the cohort date
    * is a min window over the user key and the final count aggregates
    * with map-side partial distinct. The user-key window and the
    * distinct share nothing forced: Catalyst plans distinct's exchange
    * on (user, day) and the window re-exchanges on user — two exchanges
    * over the deduplicated day-grain rows, never over raw events.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      bucketDays: Int = 7): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val w = Window.partitionBy(userCol)
    events.select(col(userCol), to_date(col(tsCol)).as("__d")).distinct()
      .withColumn("cohort_date", min(col("__d")).over(w))
      .select(col("cohort_date"),
        floor(datediff(col("__d"), col("cohort_date")) / bucketDays)
          .cast("long").as("period_offset"),
        col(userCol))
      .groupBy(col("cohort_date"), col("period_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Ordered funnel: how many users reached each step, where step i+1
    * only counts events STRICTLY AFTER the user's step-i time (first
    * qualifying occurrence per step — the standard ordered-funnel
    * semantics; an unordered "did all steps" count would overstate
    * conversion whenever later steps also occur before earlier ones).
    * Output: (step_idx, step, n_users), one row per step.
    *
    * Scale shape: per step, one filtered aggregate keyed by user joined
    * to the previous step's (user, time) frame — all exchanges are on
    * the user key, the per-step frames are |users-reaching-step| rows
    * (monotonically shrinking), and the final output is a union of
    * single-row counts; the whole funnel is ONE declarative plan,
    * nothing executes at build time.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val perStep = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.filter(col(typeCol) === step)
        val qualified = prev match {
          case None => hits
          case Some(p) =>
            hits.join(p.select(col(userCol), col("__t").as("__prev_t")), userCol)
              .filter(col(tsCol) > col("__prev_t"))
        }
        Some(qualified.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t")))
    }.flatten
    perStep.zip(steps).zipWithIndex.map { case ((frame, step), i) =>
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
  }
}
