package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming expression of the reference's incremental model
  * (SURVEY.md §2.7). The reference is date-partition batch with
  * at-least-once redo — these operators are the streaming-native duals,
  * for deployments that want the same semantics continuously instead of
  * via the daily scheduler:
  *
  *  - [[jsonArchiveStream]] ≙ S1 (GCS JSON load, cloud/bq/ops.go:130-155)
  *    as a file stream; with [[runAvailableNow]] it processes exactly the
  *    files currently present and stops — the reference's per-day batch
  *    trigger, with checkpointed exactly-once file tracking replacing
  *    "append then dedup later".
  *  - [[hourlyEventAgg]] ≙ the tumbling daily window + allowed-lateness
  *    delay (job-service/iterators.go:69-73): event-time window +
  *    watermark. countDistinct is not streaming-legal, so the user count
  *    is approx_count_distinct (HLL) — the documented delta vs the batch
  *    ev_hourly_agg query.
  *  - [[keepLatestState]] ≙ W1 keep-latest dedup (cloud/bq/ops.go:196-210)
  *    as keyed state: each key holds its current winner; every trigger
  *    emits the updated winner (Update mode downstream).
  *  - [[sessionizeState]] ≙ the batch gap-based sessionization
  *    (graft.operators.Sessions): keyed open-session state with an
  *    event-time timeout closing sessions the watermark proves complete.
  *
  * Scale notes: file streams shard listing + read across executors;
  * watermarked window aggs keep state bounded by (watermark horizon ×
  * key cardinality); keyed dedup state is one row per key — at 100 TB
  * feed RocksDB state store and partition by the dedup key, which is the
  * same shuffle the batch window dedup performs.
  */
/** One closed user session (streaming dual of
  * [[graft.operators.Sessions.sessionize]]'s output rows). Top-level:
  * object-nested case classes break encoder codegen (Janino resolves the
  * inner constructor as a zero-arg method).
  */
final case class UserSession(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

private[streaming] final case class SessionAcc(startMs: Long, endMs: Long, n: Long)

/** One emitted src→dst step (streaming dual of
  * [[graft.operators.EventAnalytics.transitionCounts]]'s pre-aggregation
  * rows). Top-level for the same encoder-codegen reason as
  * [[UserSession]].
  */
final case class TransitionStep(user_id: Long, src: String, dst: String,
    ts_ms: Long)

private[streaming] final case class LastEvent(tsMs: Long, id: Long, typ: String)

/** One attributed conversion (streaming dual of the `ev_attribution`
  * batch query's pre-aggregation rows). Top-level for the same
  * encoder-codegen reason as [[UserSession]].
  */
final case class AttributedConversion(user_id: Long, conversion_id: Long,
    ts_ms: Long, channel: String)

object Streams {

  /** Newline-delimited-JSON archive stream with an explicit schema (schema
    * inference is illegal on streams, and the load schema is declared in
    * the reference too).
    *
    * With `captureCorrupt` the schema gains the PERMISSIVE corrupt-record
    * column `_corrupt_record` — the streaming dual of the batch load's
    * quarantine (`TableOps.loadToTmp`): a malformed line must not kill a
    * long-running ingest query. Callers split with a filter on the
    * column (null ⇒ parsed row, non-null ⇒ raw bad line) — typically in
    * `foreachBatch`, writing each side to its own sink so one source
    * read feeds both.
    */
  def jsonArchiveStream(spark: SparkSession, schema: StructType, glob: String,
      maxFilesPerTrigger: Option[Int] = None,
      captureCorrupt: Boolean = false): DataFrame = {
    val s =
      if (captureCorrupt && !schema.fieldNames.contains("_corrupt_record"))
        schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
      else schema
    val r = spark.readStream.schema(s)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(glob)
  }

  /** Tumbling event-time window aggregate with watermark: rows later than
    * `lateness` past the max seen event time are dropped, finalized
    * windows are emitted once (Append mode).
    */
  def hourlyEventAgg(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4"))
      .select(col("window.start").as("hour"), col("n_events"),
        col("n_users_approx"), col("sum_value_e4"))

  /** Sliding event-time window aggregate — the streaming dual of the
    * batch `ev_sliding_agg` query: each event lands in windowDur/slide
    * overlapping windows, watermark finalizes each window once its end
    * passes the horizon (Append mode). State is bounded by (watermark
    * horizon / slide) open windows per key-space, the standard sliding-
    * window cost — pick slide ≥ windowDur/8 or so to bound the fan-out.
    */
  def slidingEventAgg(events: DataFrame, windowDur: String, slide: String,
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur, slide))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4"))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("n_users_approx"), col("sum_value_e4"))

  /** Native SESSION-WINDOW aggregate — the engine-managed dual of
    * [[sessionizeState]]: `session_window` merges events within `gap`
    * of each other per user, the watermark finalizes a session once no
    * event can extend it (Append mode — each session emits exactly
    * once, closed). Prefer this form when per-session output is plain
    * aggregates; [[sessionizeState]] remains for custom state shapes
    * (running payloads, early emission).
    */
  def sessionWindowAgg(events: DataFrame, gap: String,
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value_e4"))

  /** Streaming maintenance of the MATERIALIZED BM25 index
    * ([[graft.operators.Retrieval.indexDocs]]) for `foreachBatch`: each
    * micro-batch's documents index per date-partition, with the
    * warehouse's replace-per-day semantics making a crash-replayed
    * batch idempotent. CONTRACT: a batch must carry complete days (the
    * AvailableNow daily-archive drive, the gardener's date-partition
    * model) — a partial-day batch would REPLACE the day with only its
    * own rows. For finer-grained arrival, land the corpus through
    * [[exactlyOnceSink]] first and index from the table per day.
    */
  def bm25IndexSink(wh: graft.tableops.TxWarehouse, postingsPath: String,
      statsPath: String, idCol: String, textCol: String):
      (DataFrame, Long) => Unit =
    (batch, _) => {
      // a null/unparsable date must fail loudly, not NPE mid-collect:
      // under the REPLACE-per-day contract a malformed batch silently
      // proceeding could truncate a day's index to the batch's own rows.
      // try_to_date, not to_date: under ANSI (the Spark 4 default) a
      // malformed string makes to_date throw an opaque execution error
      // mid-scan — try_to_date folds it to null so the refusal below
      // names the actual contract violation
      val dayRows = batch.select(try_to_date(col("date")).as("d")).distinct()
        .collect()
      require(dayRows.forall(!_.isNullAt(0)),
        "bm25IndexSink: batch contains rows with null/unparsable date — " +
          "refusing to index (REPLACE-per-day would lose those rows)")
      val days = dayRows.map(_.getDate(0).toLocalDate)
      days.sorted.foreach { d =>
        graft.operators.Retrieval.indexDocs(batch.sparkSession, wh,
          postingsPath, statsPath,
          batch.filter(to_date(col("date")) === lit(java.sql.Date.valueOf(d))),
          idCol, textCol, d)
      }
    }

  /** STREAM-STREAM interval join — the streaming dual of the annotation
    * join (J1, cloud/bq/ops.go:234-253): a measurement stream enriched
    * left-outer with the annotation rows of the same key whose event
    * time falls within [ts − maxAge, ts]. This is the interval form of
    * as-of: batch as-of picks the single LATEST qualifying annotation,
    * which stream-stream joins cannot express (no per-key ordering
    * selection inside the join) — callers wanting exactly-one dedup the
    * output downstream (keepLatestState) or accept the interval
    * multiplicity. Both sides are watermarked: the time-range condition
    * bounds the join STATE (Spark retires buffered rows once the
    * watermark passes their join window — without the range the state
    * grows forever), and unmatched measurements emit with null
    * annotation columns once their window can no longer match
    * (left-outer append semantics).
    *
    * Column contract: `meas(id, ts, …)` joined to
    * `ann(ann_id, ann_ts, …)` on `id = ann_id` — alias the annotation
    * side's columns before calling (a self-named `id`/`ts` would
    * collide).
    */
  def annotateStream(meas: DataFrame, ann: DataFrame,
      lateness: String = "1 hour", maxAge: String = "1 day"): DataFrame =
    meas.withWatermark("ts", lateness)
      .join(ann.withWatermark("ann_ts", lateness),
        expr(s"id = ann_id AND ann_ts >= ts - interval $maxAge" +
          " AND ann_ts <= ts"),
        "leftOuter")

  /** Streaming keep-latest-per-key dedup: keyed state holds the current
    * winner under `newer` (a total "is-newer" merge, e.g. max parser.Time
    * — W1's order key); each trigger emits the key's winner after folding
    * the new rows in.
    */
  def keepLatestState[T, K](ds: Dataset[T], key: T => K, newer: (T, T) => T)(
      implicit ek: Encoder[K], et: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)
      .mapGroupsWithState[T, T](GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          val winner = (state.getOption.iterator ++ rows).reduce(newer)
          state.update(winner)
          winner
      }

  /** Streaming first-seen dedup: a key's row is emitted only the FIRST
    * time the key appears across the whole stream — the streaming dual
    * of [[graft.operators.TextDedup.incrementalNearDupFilter]]'s exact
    * tier (the seen-corpus fingerprint index lives in keyed state instead
    * of a table; earlier micro-batches ARE the seen corpus for later
    * ones). Within one trigger, `pick` chooses the key's representative
    * (e.g. min doc id — make it a total order for determinism); across
    * triggers, first-seen wins, matching "the already-ingested corpus
    * keeps its copy".
    *
    * State per key is one boolean — bounded by distinct keys, the same
    * cardinality any exact-dedup index carries. At 100 TB: RocksDB state
    * store, and the shuffle is the same fingerprint-key exchange the
    * batch anti-join performs. Append-mode output.
    */
  def firstSeenState[T, K](ds: Dataset[T], key: T => K, pick: (T, T) => T)(
      implicit ek: Encoder[K], et: Encoder[T]): Dataset[T] = {
    implicit val eb: Encoder[Boolean] = org.apache.spark.sql.Encoders.scalaBoolean
    ds.groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(rows.reduce(pick)) }
      }
  }

  /** Stream-static dedup: drop stream rows whose fingerprint exists in a
    * STATIC seen-corpus table — the other half of incremental dedup's
    * streaming story ([[firstSeenState]] handles duplicates WITHIN the
    * stream; this anti-joins each micro-batch against the already-
    * archived corpus).
    *
    * The static side is a SNAPSHOT TAKEN AT STREAM START: a path-based
    * parquet DataFrame pins its file listing (InMemoryFileIndex) when
    * the frame is created and Structured Streaming re-plans the join per
    * micro-batch against that same listing — fingerprints archived AFTER
    * the query starts are NOT seen, and their duplicates pass. When the
    * seen corpus grows while the stream runs, use [[dropSeenInBatch]]
    * inside `foreachBatch` (re-lists the path every batch) or back the
    * static side with a snapshot-refreshing table format.
    *
    * @param fp fingerprint expression over the stream columns (e.g.
    *        [[graft.operators.TextAnalysis.fingerprint]] of the text col)
    * @param seenFps static single-column ("__fp") fingerprint frame
    */
  def dropSeenStatic(stream: DataFrame, fp: org.apache.spark.sql.Column,
      seenFps: DataFrame): DataFrame =
    stream.withColumn("__fp", fp)
      .join(seenFps.select(col("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")

  /** [[dropSeenStatic]]'s refresh-per-trigger form, for use inside
    * `foreachBatch`: re-reads the seen-fingerprint parquet path on EVERY
    * call, so fingerprints archived between triggers are respected —
    * each `spark.read.parquet` builds a fresh file index, which is the
    * whole difference from the snapshot the stream-static join pins.
    *
    * {{{
    * stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
    *   Streams.dropSeenInBatch(batch, fingerprint(col("text")), seenPath)
    *     .write.mode("append").parquet(outPath)
    * }
    * }}}
    *
    * Listing cost is per-trigger — keep the fingerprint table compacted
    * (few large files), as any per-batch-scanned side should be.
    */
  def dropSeenInBatch(batch: DataFrame, fp: org.apache.spark.sql.Column,
      seenFpsPath: String): DataFrame =
    dropSeenStatic(batch, fp,
      batch.sparkSession.read.parquet(seenFpsPath).select(col("__fp")))

  /** Stream-static BLOOM-prefiltered semi join — the streaming dual of
    * [[graft.operators.RuntimeFilter.bloomSemiJoin]]: each stream row
    * must have a key in the static dim table. The dim keys fold into a
    * fixed-size bloom ONCE at query build; every micro-batch then runs
    * the codegen'd `might_contain` predicate BEFORE the stream-static
    * semi join, so non-matching rows (the overwhelming majority in a
    * funnel-shaped pipeline) die in the map stage without touching the
    * join at all. Exactness is the batch operator's: the semi join
    * removes the bloom's false positives, rows are bit-identical to the
    * plain stream-static semi join.
    *
    * Same snapshot caveat as [[dropSeenStatic]]: both the bloom and the
    * join's static side pin the dim at stream start; a growing dim
    * wants the foreachBatch form (rebuild per trigger via
    * [[graft.operators.RuntimeFilter.bloomSemiJoin]] directly — it is
    * batch-shaped already).
    */
  def bloomSemiJoinStream(stream: DataFrame, dim: DataFrame,
      streamKey: String, dimKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame = {
    val bloomBytes = dim
      .select(org.apache.spark.sql.graftshim.AggBridge
        .bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]](0)
    val pre =
      if (bloomBytes == null) stream
      else stream.filter(org.apache.spark.sql.graftshim.AggBridge
        .bloomMightContain(bloomBytes, col(streamKey)))
    // reserved-name alias: same ambiguity guard as the batch operator
    // (shared key names would otherwise fail analysis)
    pre.join(dim.select(col(dimKey).as("__graft_dim_key")),
      pre(streamKey) === col("__graft_dim_key"), "left_semi")
  }

  /** Streaming gap-based sessionization ≙ the batch
    * [[graft.operators.Sessions.sessionize]]: keyed state holds each
    * user's open session; events within `gapMs` of the open session
    * extend it, a larger gap closes it (emitted) and opens a new one, and
    * the event-time timeout (watermark + gap) closes sessions no further
    * event can extend — exactly the gap rule, enforced by the engine.
    * Append-mode output: each session is emitted once, when it closes.
    *
    * State is one small accumulator per active user — bounded by active
    * users, not events; the shuffle is the same user-key exchange the
    * batch operator performs.
    *
    * Late-data semantics: each trigger re-runs the batch merge over the
    * open session plus the trigger's events, so late-but-valid events
    * (inside the watermark) sessionize exactly as the batch operator
    * would for all data still on hand; only events belonging to an
    * ALREADY-EMITTED session diverge — they close as their own session,
    * since append mode cannot retract prior output.
    */
  def sessionizeState(
      events: Dataset[(Long, java.sql.Timestamp)],
      gapMs: Long = 30L * 60 * 1000,
      lateness: String = "1 hour"
  ): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ts")
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          def emit(a: SessionAcc) = UserSession(user,
            new java.sql.Timestamp(a.startMs), new java.sql.Timestamp(a.endMs), a.n)
          if (state.hasTimedOut) {
            val closed = emit(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // Re-run the BATCH algorithm over everything on hand: the
            // open session (as an interval) plus the batch's events,
            // sorted, merged wherever the start-to-previous-end gap is
            // within gapMs. This handles late-but-valid events exactly
            // like the batch operator for all data still available —
            // only events older than an ALREADY-EMITTED session diverge
            // (they form their own session; append mode cannot retract).
            val intervals = (state.getOption.toSeq ++
              rows.map(r => SessionAcc(r._2.getTime, r._2.getTime, 1)))
              .sortBy(a => (a.startMs, a.endMs))
            val closed = Vector.newBuilder[UserSession]
            var cur = intervals.head
            intervals.tail.foreach { iv =>
              if (iv.startMs - cur.endMs <= gapMs)
                cur = SessionAcc(cur.startMs,
                  math.max(cur.endMs, iv.endMs), cur.n + iv.n)
              else { closed += emit(cur); cur = iv }
            }
            state.update(cur)
            state.setTimeoutTimestamp(cur.endMs + gapMs)
            closed.result().iterator
          }
      }
  }

  /** Streaming dual of [[graft.operators.EventAnalytics
    * .transitionCounts]]: keyed per-user state holding the LAST seen
    * event; each trigger sorts the on-hand chain (state + batch rows, by
    * (ts, event id) — the batch operator's exact order) and emits every
    * consecutive src→dst step. Downstream counts in Update mode, or
    * feeds an online next-action model directly.
    *
    * Divergence from batch (append mode cannot retract): an event later
    * than the watermark but older than an ALREADY-EMITTED step lands
    * inside the sorted chain and emits its local steps, but the
    * previously-emitted step spanning it stands. State is one
    * [[LastEvent]] per user, evicted `stateTtlMs` past the user's last
    * event once the watermark proves no earlier event can arrive.
    */
  def transitionState(
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      lateness: String = "1 hour",
      stateTtlMs: Long = 24L * 3600 * 1000
  ): Dataset[TransitionStep] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, TransitionStep](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val chain = (state.getOption.toVector ++
              rows.map(r => LastEvent(r._2.getTime, r._3, r._4)))
              .sortBy(e => (e.tsMs, e.id))
            val steps = chain.sliding(2).collect {
              case Seq(a, b) => TransitionStep(user, a.typ, b.typ, b.tsMs)
            }.toVector
            if (chain.nonEmpty) {
              state.update(chain.last)
              state.setTimeoutTimestamp(chain.last.tsMs + stateTtlMs)
            }
            steps.iterator
          }
      }
  }

  /** Streaming dual of the `ev_attribution` batch query's per-purchase
    * attribution rows: keyed per-user state holding the most recent
    * NON-conversion touch; each trigger sorts the on-hand rows by
    * (ts, event id) — the batch window's exact order — walks the
    * chain updating the touch, and emits one [[AttributedConversion]]
    * per conversion event: the touch's type when it lands inside
    * `lookbackMs`, else 'direct'. A downstream
    * `groupBy(channel).count` in Update mode reproduces the batch
    * report; on an in-order stream the emitted rows equal the batch
    * query's pre-aggregation rows exactly (spec-pinned batch≡stream).
    *
    * Same state/divergence contract as [[transitionState]]: state is
    * ONE [[LastEvent]] per user regardless of event volume, evicted
    * `stateTtlMs` past the user's last on-hand event; append mode
    * cannot retract, so a late-but-in-watermark touch that arrives in
    * a trigger AFTER a conversion it should have claimed leaves the
    * earlier 'direct' attribution standing — the batch query remains
    * the retrospective truth, this is the online feed.
    */
  def lastTouchState(
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      conversionType: String = "purchase",
      lookbackMs: Long = 7L * 24 * 3600 * 1000,
      lateness: String = "1 hour",
      stateTtlMs: Long = 24L * 3600 * 1000): Dataset[AttributedConversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, AttributedConversion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val chain = rows.toVector.sortBy(r => (r._2.getTime, r._3))
            var touch = state.getOption
            val out = Vector.newBuilder[AttributedConversion]
            chain.foreach { r =>
              val tsMs = r._2.getTime
              if (r._4 == conversionType) {
                val channel = touch match {
                  // batch rule: direct iff no touch or t_ts < ts − lookback
                  case Some(t) if t.tsMs >= tsMs - lookbackMs => t.typ
                  case _ => "direct"
                }
                out += AttributedConversion(user, r._3, tsMs, channel)
              } else touch = Some(LastEvent(tsMs, r._3, r._4))
            }
            touch.foreach { t =>
              val horizon = chain.lastOption.map(_._2.getTime)
                .getOrElse(t.tsMs)
              state.update(t)
              state.setTimeoutTimestamp(math.max(t.tsMs, horizon) + stateTtlMs)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming feed for [[graft.operators.GraphAlgos.pageRank]]'s edge
    * list — the dual of the `ev_pagerank` query's batch edge build
    * ([[graft.operators.EventAnalytics.transitionCounts]] feeding the
    * power iteration): [[transitionState]] emits each consecutive
    * src→dst step as it becomes known, and this maintains the running
    * (src, dst, n_transitions) edge-weight table as an Update-mode
    * aggregation (fMGWS in Append mode composes with a downstream
    * streaming agg; the counts state is |types|²-bounded, so no
    * watermark eviction is needed on the aggregate itself).
    *
    * PageRank stays a BATCH power iteration by design — it is a
    * whole-graph fixed point, not an incremental fold — so the
    * deployment shape is: this stream keeps the edge table current
    * (memory sink, or [[exactlyOnceSink]] into a tx table), and
    * `pageRank` re-runs over the materialized counts on whatever cadence
    * ranking freshness demands. On an in-order stream the maintained
    * table equals the batch `transitionCounts` output exactly (minus
    * `n_users`, which an Update aggregate over steps cannot carry —
    * distinct users per edge would need its own keyed state), so the
    * ranks computed from it are bit-identical to `ev_pagerank`'s.
    *
    * Running this query requires
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`:
    * Spark's cross-operator watermark check conservatively rejects ANY
    * aggregation after flatMapGroupsWithState because a downstream
    * stateful operator COULD discard the late rows fMGWS may emit. It
    * cannot happen here — the count aggregate carries no watermark and
    * never evicts (its state is |types|²-bounded by design, not by
    * eviction), so a late-emitted step is still counted, exactly like
    * the batch operator would.
    */
  def pageRankEdgeCounts(
      events: Dataset[(Long, java.sql.Timestamp, Long, String)],
      lateness: String = "1 hour",
      stateTtlMs: Long = 24L * 3600 * 1000): DataFrame =
    transitionState(events, lateness, stateTtlMs)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_transitions"))

  /** Streaming distinct-count: the HyperLogLog sketch as keyed state —
    * the streaming dual of the `ev_hll_users` batch aggregate, sharing
    * [[graft.functions.HllRegisters.observe]]/`stats` verbatim so batch
    * and stream CANNOT disagree on a register. Input is (key,
    * pre-hashed 64-bit id) — pair with `xxhash64(...)` upstream like the
    * batch side; each trigger folds the new hashes into the key's 2^p
    * byte registers and re-emits (key, nnz, est_raw).
    *
    * State per key is exactly 2^p bytes FOREVER, regardless of stream
    * length or id cardinality — the property that makes per-key distinct
    * counting viable on an unbounded stream at all (exact distinct
    * state grows with cardinality; watermarking can't bound it without
    * changing the answer). No timeout: a cardinality sketch is
    * all-time by definition; scope keys (e.g. `type:2026-08-15`) when
    * a bounded horizon is wanted, and re-merge scoped sketches with
    * [[graft.functions.HllRegisters.hllMergeRegisters]].
    */
  def hllDistinctState(hashes: Dataset[(String, Long)], p: Int = 9)(
      implicit ek: Encoder[String], eb: Encoder[Array[Byte]],
      eo: Encoder[(String, Int, Long)]): Dataset[(String, Int, Long)] =
    hashes.groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Int, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Byte]]) =>
          val buf = state.getOption.getOrElse(new Array[Byte](1 << p))
          rows.foreach(r => graft.functions.HllRegisters.observe(buf, r._2, p))
          state.update(buf)
          val (nnz, est) = graft.functions.HllRegisters.stats(buf, p)
          (key, nnz, est)
      }

  /** Streaming KMV/theta sketch: the bottom-k distinct-hash sample as
    * keyed state — the streaming dual of the `ev_theta_intersect` batch
    * sketch ([[graft.operators.ThetaSketch]]). Input is (key, 52-bit
    * masked hash — pair with `xxhash64(...) & (2^52−1)` upstream like
    * the batch side); each trigger folds the new values into the key's
    * sorted bottom-k array and re-emits (key, vals, θ, est). KMV merge
    * is LOSSLESS (the bottom-k of unioned bottom-k samples IS the
    * bottom-k of the union), so on any split of the stream the final
    * state is bit-identical to the batch sketch of the same rows, and
    * emitted sketches from scoped keys re-merge downstream by the same
    * rule — including into INTERSECTIONS, the set op that makes this
    * sketch worth its state over HLL's.
    *
    * State per key is ≤ k longs forever — same bounded-state contract
    * as [[hllDistinctState]], with est = |{v < θ}|·2⁵² div θ on the
    * integer grid (exact count while the key has < k distinct values).
    */
  def kmvState(hashes: Dataset[(String, Long)], k: Int = 256)(
      implicit ek: Encoder[String], eb: Encoder[Array[Long]],
      eo: Encoder[(String, Array[Long], Long, Long)])
      : Dataset[(String, Array[Long], Long, Long)] = {
    // same bound as ThetaSketch.kmvSketch: count·2⁵² stays in int64
    require(k >= 2 && k <= 1024, "k in [2, 1024] keeps count*2^52 in int64")
    hashes.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Array[Long], Long, Long)](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Long]]) =>
          val merged = (state.getOption.getOrElse(Array.empty[Long]).toSet
            ++ rows.map(_._2)).toArray.sorted.take(k)
          state.update(merged)
          val domain = graft.operators.ThetaSketch.Domain
          val theta = if (merged.length >= k) merged.last else domain
          val below = merged.count(_ < theta).toLong
          (key, merged, theta, below * domain / theta)
      }
  }

  /** Streaming frequency sketch: the count-min grid as keyed state —
    * the streaming dual of the `ev_cms_freq` batch aggregate, sharing
    * [[graft.functions.CmsCounters.observe]] verbatim so batch and
    * stream CANNOT disagree on a counter. Input is (key, pre-hashed
    * 64-bit id); each trigger folds the new hashes into the key's d×2^w
    * long grid and re-emits (key, n_total, nonzero (row, idx, cnt)
    * triples) — the same persistable unit the batch aggregate emits,
    * re-mergeable across scopes with
    * [[graft.functions.CmsCounters.cmsMergeCounters]].
    *
    * State per key is exactly 8·d·2^logW bytes FOREVER, regardless of
    * stream length or item cardinality — same argument as
    * [[hllDistinctState]]: exact per-item counting state grows with
    * cardinality; the sketch's is pinned.
    */
  def cmsFreqState(hashes: Dataset[(String, Long)], d: Int = 4,
      logW: Int = 10)(
      implicit ek: Encoder[String], eb: Encoder[Array[Long]],
      eo: Encoder[(String, Long, Seq[(Int, Int, Long)])]):
      Dataset[(String, Long, Seq[(Int, Int, Long)])] =
    hashes.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Long, Seq[(Int, Int, Long)])](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)],
            state: GroupState[Array[Long]]) =>
          val w = 1 << logW
          val buf = state.getOption.getOrElse(new Array[Long](d * w))
          rows.foreach(r =>
            graft.functions.CmsCounters.observe(buf, r._2, d, logW))
          state.update(buf)
          var n = 0L
          var j = 0
          while (j < w) { n += buf(j); j += 1 }
          val triples = (0 until buf.length).collect {
            case i if buf(i) != 0L => (i / w, i % w, buf(i))
          }
          (key, n, triples)
      }

  /** Run a streaming DataFrame to a date-partitioned parquet sink with
    * Trigger.AvailableNow — one checkpointed batch over whatever input
    * exists, then stop. This is the reference's daily job as a stream:
    * re-running after new files land processes ONLY the new files (the
    * checkpoint remembers processed ones), where the batch path re-reads
    * and re-dedups the partition.
    */
  def runAvailableNow(df: DataFrame, outPath: String, checkpoint: String,
      partitionCol: String = "date"): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCol)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Exactly-once micro-batch sink into a [[graft.tableops.TxWarehouse]]
    * table, for `foreachBatch`:
    *
    * {{{
    * stream.writeStream.foreachBatch(
    *   Streams.exactlyOnceSink(wh, wh.tablePath("raw", "events"), "evq")) …
    * }}}
    *
    * Structured Streaming's recovery contract is at-least-once at the
    * sink: after a crash the restarted query REPLAYS its last batch, and
    * a plain parquet append would duplicate those rows. The tx commit
    * log closes the gap — each batch commits atomically WITH a
    * `(appId, batchId)` txn watermark ([[graft.tableops.TxWarehouse
    * .appendTxn]]), so the replayed batch is recognized and skipped and
    * table contents are exactly-once. This is the foreachBatch
    * idempotence pattern the Spark docs prescribe, with the dedup ledger
    * living in the same atomic commit as the data instead of beside it.
    */
  def exactlyOnceSink(wh: graft.tableops.TxWarehouse, path: String,
      appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => { wh.appendTxn(batch.sparkSession, batch, path, appId, batchId); () }

  /** Exactly-once streaming CDC APPLY for `foreachBatch`: each
    * micro-batch is a change set (full rows + an optional delete-flag
    * column) MERGED into the tx table by key
    * ([[graft.tableops.TxWarehouse.mergeIntoTxn]]) — upserts replace,
    * flagged keys delete, and the batch's `(appId, batchId)` watermark
    * rides the same atomic commit, so a crash-replayed batch is skipped
    * and the table converges to exactly-once MERGED contents. This is
    * the upsert dual of [[exactlyOnceSink]]: append-only streams land
    * with appendTxn; keyed changelogs (debezium-style feeds, dimension
    * updates, late corrections) land here. A batch may still race a
    * concurrent writer on overlapping keys — mergeIntoTxn throws the
    * retryable conflict and Structured Streaming's own retry re-runs
    * the batch against fresh state with the SAME batchId, which the
    * watermark keeps idempotent.
    */
  def cdcApplySink(wh: graft.tableops.TxWarehouse, path: String,
      keyCols: Seq[String], deleteCol: Option[String],
      appId: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      wh.mergeIntoTxn(batch.sparkSession, batch, path, keyCols, deleteCol,
        appId, batchId)
      ()
    }

  /** Streaming INCREMENTAL VIEW MAINTENANCE for `foreachBatch`: each
    * micro-batch lands in the source tx table exactly-once
    * ([[exactlyOnceSink]]'s appendTxn pattern, `appId.load` marker),
    * then [[graft.tableops.IncrementalAgg.maintainSumView]] advances
    * the materialized grouped aggregate to the source's new version —
    * so the view continuously tracks a continuously-loaded table, at
    * O(churn) per batch, never O(table).
    *
    * Exactly-once across BOTH halves, with no two-phase anything —
    * each half carries its own txn marker in its own atomic commit and
    * the composition self-heals:
    *
    *  - crash AFTER the load, BEFORE the maintain: the replayed batch's
    *    load is skipped by the `(appId.load, batchId)` marker, and the
    *    maintain diffs from the VIEW's own `(appId.ivm, srcVersion)`
    *    watermark to the source head — the orphaned append is inside
    *    that window, nothing is lost;
    *  - replay of a FULLY completed batch: the load skips, the
    *    maintain sees the source version unchanged and no-ops;
    *  - a maintain crash mid-merge: mergeIntoTxn is atomic, so the
    *    view either reflects the source version and carries its
    *    marker, or neither.
    *
    * The view equals the batch recompute (`GROUP BY` over the full
    * source) after every batch — the IVM invariant, spec-verified
    * including the injected-crash windows.
    */
  def ivmSink(wh: graft.tableops.TxWarehouse, srcPath: String,
      viewPath: String, keyCols: Seq[String], countCol: String,
      sumCols: Seq[(String, String)], appId: String,
      viewDate: java.time.LocalDate): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      wh.appendTxn(batch.sparkSession, batch, srcPath,
        s"$appId.load", batchId)
      graft.tableops.IncrementalAgg.maintainSumView(batch.sparkSession, wh,
        srcPath, viewPath, keyCols, countCol, sumCols, s"$appId.ivm",
        viewDate)
      ()
    }
}
