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

  /** Event-transition (first-order Markov) counts: for each user's
    * time-ordered event stream, count every consecutive
    * `src event_type → dst event_type` step, globally — the transition
    * matrix behind user-path sankeys, next-action models, and funnel
    * discovery (which ordered funnels are worth defining).
    *
    * Deterministic ordering: (ts, idCol) — the unique event id breaks
    * timestamp ties identically in any engine (`sort_array` on the
    * struct compares (ts, id) first; the id is unique, so the trailing
    * type field never decides).
    *
    * Scale shape: ONE hash exchange on the user key feeds a hash
    * aggregate collecting each user's (ts, id, type) events (per-user
    * memory — the same bound the former sessionize window's sort buffer
    * held), sorted and paired per row by the codegen'd
    * [[graft.functions.AdjacentPairs]] expression; the per-user
    * (src, dst) regroup REUSES the user partitioning (no exchange), and
    * the final count aggregates map-side into a |event_types|² -bounded
    * result. The former `lead` window form paid the same user exchange
    * PLUS an in-partition sort, a Window pass, and a third exchange for
    * the countDistinct rewrite — measured as the ~0.3-0.5 s floor under
    * every ev_ graph query at sf0.1 (round-17).
    */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    events
      .groupBy(col(userCol).as("u"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("t"), col(idCol).as("i"), col(typeCol).as("e"))))
        .as("es"))
      .select(col("u"), explode(
        graft.functions.AdjacentPairs.adjacentPairs(col("es"))).as("p"))
      .select(col("u"), col("p.a.e").as("src"), col("p.b.e").as("dst"))
      // partitioned by u already ⇒ (u, src, dst) groups are co-located:
      // this aggregate adds no exchange, and one row per (user, src, dst)
      // is exactly the partial-distinct the old countDistinct rewrite
      // bought with a third exchange
      .groupBy(col("u"), col("src"), col("dst"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("c")).as("n_transitions"),
        count(col("u")).as("n_users"))
  }

  /** Top-k most frequent length-3 event-type PATHS (the second-order
    * extension of [[transitionCounts]]): per user, consecutive
    * (e1, e2, e3) triples by time (ties by event id), counted with the
    * distinct-user reach of each path. ONE user-key exchange feeds both
    * leads (same window), the aggregate is |types|³-bounded, and the
    * top-k plans as TakeOrderedAndProject (per-partition heaps + driver
    * merge — no global sort at any corpus size).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol).as("u"), col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .filter(col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n_paths"), countDistinct(col("u")).as("n_users"))
      .orderBy(col("n_paths").desc, col("e1").asc, col("e2").asc,
        col("e3").asc)
      .limit(k)
  }

  /** Daily / trailing-7-day active users per day — DAU, WAU, and the
    * stickiness numerator every engagement dashboard wants. WAU(d) is
    * the distinct-user count over days [d−6, d]: computed by exploding
    * each (user, active-day) row into the ≤7 trailing days it covers
    * and re-distincting — day-grain rows ×7, never event-scale, and no
    * windowed distinct (which Spark would compute per-frame). Only days
    * with at least one event emit a row (a fully-idle calendar day is
    * absent, matching the relational oracle).
    *
    * Scale shape: ONE distinct over (user, day) — the event stream's
    * only full-width pass — then everything downstream is |users·days|
    * day-grain: the 7-day cover explode, a distinct, and two counts,
    * all map-side-combined.
    */
  def dauWau(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ud = events.select(col(userCol).as("u"),
      to_date(col(tsCol)).as("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("u")).as("dau"))
    val wau = ud
      .select(col("u"), explode(sequence(lit(0), lit(6))).as("off"),
        col("day"))
      .select(col("u"), date_add(col("day"), col("off")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // only event-bearing days: inner-join the cover counts onto DAU days
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"))
  }

  /** Daily volume anomalies per event type: days whose count deviates
    * from the type's mean by ≥ `zE3Threshold/1000` population standard
    * deviations — the ingest-volume alarm (a collector outage or a
    * duplicate-storm both spike |z|). The statistic includes the
    * candidate day itself (population σ, not leave-one-out).
    *
    * Determinism: mean and variance are carried as the EXACT integer
    * forms `n·x − Σx` and `n·Σx² − (Σx)²`; the z-score is one
    * multiply-divide-sqrt chain over them, floor-quantized to e3 —
    * value-identical in any engine. Types with zero variance (every day
    * equal) are skipped outright rather than dividing by zero.
    *
    * Scale shape: daily counts are one map-side-combined aggregate
    * (|types|·|days| rows — tiny); per-type moments re-aggregate from
    * it; the join back is |types| rows broadcast. Nothing past the scan
    * is event-scale.
    */
  def anomalyDays(events: DataFrame, tsCol: String, typeCol: String,
      zE3Threshold: Long): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("num", col("n_days") * col("n_events") - col("s1"))
      .withColumn("den2", col("n_days") * col("s2") - col("s1") * col("s1"))
      .filter(col("den2") > 0)
      .select(col("event_type"), col("day"), col("n_events"),
        floor(lit(1000.0) * abs(col("num")).cast("double") /
          sqrt(col("den2").cast("double"))).cast("long").as("z_e3"))
      .filter(col("z_e3") >= zE3Threshold)
  }

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
    * Scale shape: ONE scan of the events relation — the step filter is
    * pushed to the scan, one user-keyed aggregate collects each step's
    * event times as a sorted array (per-user memory, bounded by that
    * user's step events — the same rows the per-step join frames held),
    * and the strictly-after fold runs as pure array expressions per
    * user: t₀ = min(times₀), tᵢ = min{t ∈ timesᵢ : t > tᵢ₋₁} via
    * `array_min(filter(...))`, with a missed step nulling every later
    * one (null comparisons filter to empty → null). A second global
    * aggregate counts non-null tᵢ map-side; the per-step unpivot
    * explodes a single row. Total: one exchange on the user key and one
    * single-row exchange — the previous per-step-join form re-executed
    * the event scan O(steps²/2) times.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    val timesAggs = steps.zipWithIndex.map { case (s, i) =>
      // repeated step names are fine: identical arrays, and the
      // strictly-after fold then requires a SECOND occurrence
      sort_array(collect_list(when(col(typeCol) === s, col(tsCol))))
        .as(s"__ts_$i")
    }
    val perUser = events
      .filter(col(typeCol).isInCollection(steps))
      .groupBy(col(userCol))
      .agg(timesAggs.head, timesAggs.tail: _*)
    val stepTimes = steps.indices.foldLeft(Vector.empty[org.apache.spark.sql.Column]) {
      (acc, i) =>
        val t =
          if (i == 0) array_min(col("__ts_0"))
          else array_min(filter(col(s"__ts_$i"), x => x > acc.last))
        acc :+ t
    }
    // a NULL user is a degenerate group: it can "enter" the funnel
    // (step 0 counts events, SQL GROUP BY keeps the null group) but a
    // null key can never chain a per-user SEQUENCE (equi-join semantics
    // drop it from step 1 on) — the same contract as the equivalent
    // per-step-join SQL, pinned by the oracle
    def guarded(t: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) t else when(col(userCol).isNotNull, t)
    val counts = perUser.agg(
      count(guarded(stepTimes.head, 0)).as("__c_0"),
      stepTimes.tail.zipWithIndex.map { case (t, i) =>
        count(guarded(t, i + 1)).as(s"__c_${i + 1}")
      }: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("step_idx"), lit(s).as("step"),
        col(s"__c_$i").as("n_users"))
    }: _*)).as("__r")).select(col("__r.*"))
  }
}
