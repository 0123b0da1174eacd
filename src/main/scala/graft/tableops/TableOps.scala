package graft.tableops

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Job
import graft.operators.{AnnotationJoin, Dedup}

/** Optional content-level near-dup tier applied after the exact keep-set
  * dedup: MinHash-LSH pairs over `textCol` at `minJaccardE4`, clustered,
  * one representative (min id) kept per cluster — the training-data
  * generalization of the reference's key dedup, run inside the same
  * Deduplicating state.
  *
  * @param vsRawCorpus also drop rows whose content near-dup-matches the
  *        ALREADY-ARCHIVED raw table (other dates only — this date's raw
  *        partition is about to be truncate-replaced by copy anyway):
  *        [[graft.operators.TextDedup.incrementalNearDupFilter]] with raw
  *        as the seen corpus. The reference's incremental model re-sweeps
  *        dates continuously (SURVEY.md §2.7); this keeps a re-swept
  *        day from re-admitting content an earlier day already archived.
  *        No-op while the raw table does not exist yet.
  */
final case class ContentDedupSpec(textCol: String, minJaccardE4: Long = 8000L,
    vsRawCorpus: Boolean = false)

/** Per-datatype dedup key configuration.
  * Reference: cloud/bq/ops.go:53-83 — every current v2 datatype deduplicates
  * on {id} within the date partition, ordered by parser.Time. The map is kept
  * configurable exactly like the reference's PartitionKeys/OrderKeys.
  *
  * @param skewedKeys physical hint: datatypes whose dedup key can be hot
  *        (one id with a large share of a day's rows) dedup via
  *        [[graft.operators.Dedup.keepLatestForSkew]] — same semantics,
  *        AQE-splittable join instead of a per-key window sort.
  * @param contentDedup opt-in near-dup content tier (see [[ContentDedupSpec]])
  */
final case class DatatypeSpec(partitionKeys: Seq[String], orderKey: String,
    skewedKeys: Boolean = false, contentDedup: Option[ContentDedupSpec] = None,
    bloomKey: Option[String] = None, checks: Seq[(String, String)] = Nil)

object DatatypeSpec {
  val default: DatatypeSpec = DatatypeSpec(Seq("id", "date"), "parser.Time")
  val byDatatype: Map[String, DatatypeSpec] = Map(
    "ndt5" -> default, "ndt7" -> default, "tcpinfo" -> default,
    "pcap" -> default, "scamper1" -> default, "switch" -> default,
    "annotation2" -> default, "hopannotation2" -> default
  )
  def forDatatype(dt: String): DatatypeSpec = byDatatype.getOrElse(dt, default)
}

/** Result stats for detail messages (reference parses BQ job statistics,
  * ops/actions.go:150-170; here we count what we wrote).
  */
final case class OpStats(rowsIn: Long, rowsOut: Long) {
  def detail: String = s"in=$rowsIn out=$rowsOut"
}

/** The five table operations of the reference (SURVEY.md §2.1-2.4), as pure
  * DataFrame programs over a [[Warehouse]] backend (plain partitioned
  * parquet, or the transactional manifest-log format — see Warehouse docs).
  *
  *   loadToTmp — S1, GCS JSON scan → tmp append     (cloud/bq/ops.go:130-155)
  *   dedup     — W1+J2, keep-set partition rewrite   (cloud/bq/ops.go:184-218)
  *   copyToRaw — S2, partition copy with truncate    (cloud/bq/ops.go:158-176)
  *   deleteTmp — S3, partition drop                  (cloud/bq/ops.go:221-228)
  *   join      — S4+J1, annotation materialization   (cloud/bq/ops.go:234-295)
  *
  * Every write is append (load) or partition-truncate (dedup/copy/join), so a
  * re-run of any date converges — the reference's idempotency model
  * (SURVEY.md §7.3). All ops scope to `WHERE date = job.date`; other dates in
  * the same table are never touched.
  */
final class TableOps(spark: SparkSession, job: Job, wh: Warehouse,
    specOverride: Option[DatatypeSpec] = None) {

  private val spec = specOverride.getOrElse(DatatypeSpec.forDatatype(job.datatype))
  private val tmpPath = wh.tablePath(job.datasets.tmp, job.datatype)
  private val rawPath = wh.tablePath(job.datasets.raw, job.datatype)
  private val joinPath =
    if (job.datasets.hasJoin) wh.tablePath(job.datasets.join, job.datatype) else ""
  // the materialized near-dup signature index (vsRawCorpus datatypes):
  // maintained per date partition by copyToRaw, probed by dedup's
  // incremental tier so a day's dedup never re-reads the archive's text
  private val indexPath = rawPath + TableOps.NearDupIndexSuffix

  private def dateLit = lit(java.sql.Date.valueOf(job.date))

  private def readPartition(path: String, d: LocalDate): DataFrame =
    wh.readPartition(spark, path, d)

  /** S1: bulk-load newline-delimited JSON under the job's archive prefix into
    * the tmp table, append mode. Schema is inferred (the reference's loads are
    * schema-on-read with evolution tolerated, ops/actions.go:215-225); pass
    * `schema` to pin it. Returns OpStats(lines seen, rows loaded) — the
    * difference is the quarantined count.
    *
    * Corrupt-record quarantine: a malformed line does NOT fail the load
    * (one bad line in a 100 TB archive day must not sink the other
    * billions of rows — the reference parser likewise skips unparseable
    * rows and reports counts, with the tracker's ParseError state for
    * the terminal case). PERMISSIVE-mode parsing captures bad lines in
    * the corrupt-record column; good rows append to tmp as before, and
    * bad raw lines append to `<tmp>__quarantine` partitioned by the
    * job's date for operator inspection/replay. The quarantine pass is a
    * SECOND read of the archive, but it only runs when the first pass
    * observed a nonzero corrupt count — clean loads (the overwhelming
    * case) stay one pass, same plan as before.
    */
  // The load APPEND is the one pipeline write without warehouse
  // conflict fencing (replace semantics do not fit: a load may carry
  // stray rows of other dates that must append, and the reference's
  // model is WRITE_APPEND, cloud/bq/ops.go:130-155) — so a claim-lease
  // takeover mid-load would double the day's rows, and exact duplicates
  // survive the tie-keeping dedup. On the tx backend the append
  // therefore carries a txn marker keyed by the job and the tmp table's
  // version AT ENTRY: two drivers racing the SAME load capture the same
  // entry version, exactly one commit advances the watermark to it, and
  // the loser's append is a no-op (its files are vacuum orphans). A
  // legitimate re-load (redo after deleteTmp) observes a later version
  // and appends normally.
  def loadToTmp(glob: String, schema: Option[org.apache.spark.sql.types.StructType] = None): OpStats = {
    val CR = "_corrupt_record"
    // Idempotence epoch: the load txn is keyed to the DRAIN epoch (the
    // marker deleteTmp advances in the same commit that empties this
    // job's tmp partition), NOT to the current version. The version
    // moves with the load commit itself, so two at-least-once deliveries
    // of the same load (crash retry; a takeover that re-runs the action
    // after the first commit but before the tracker state advanced)
    // would compute DIFFERENT version-based batch ids and both append —
    // exact-duplicate rows that the tie-preserving dedup keeps BY DESIGN
    // and the copy then publishes. The drain epoch is identical for
    // every delivery of one processing and moves only when the pipeline
    // drains, which is also exactly when a reprocessing becomes
    // legitimate again.
    val txEntry: Option[(TxWarehouse, Long)] = wh match {
      case tx: TxWarehouse =>
        Some((tx, if (tx.exists(spark, tmpPath))
          tx.lastTxn(spark, tmpPath, s"drain-${job.key}") + 1L else 0L))
      case _ => None
    }
    TableOps.tr(s"load ${job.key} entry batch=${txEntry.map(_._2)}")
    def reader = spark.read
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
      .option("columnNameOfCorruptRecord", CR)
    // a pinned schema must carry the corrupt-record field to capture (not
    // null-out) malformed lines; inference adds it only when bad lines exist
    val pinned = schema.map(s =>
      if (s.fieldNames.contains(CR)) s
      else s.add(CR, org.apache.spark.sql.types.StringType))
    val df0 = pinned.map(reader.schema).getOrElse(reader).json(glob)
    val quarantinePath = tmpPath + "__quarantine"

    if (!df0.columns.contains("date")) {
      // nothing parsed to the expected shape (e.g. every line malformed, so
      // inference saw only the corrupt column): quarantine the raw text
      val obs = new org.apache.spark.sql.Observation()
      wh.withTableLocks(reads = Nil, writes = Seq(quarantinePath)) {
        wh.append(spark,
          spark.read.text(glob).select(col("value").as("raw"))
            .withColumn("date", dateLit)
            .observe(obs, count(lit(1)).as("rows")),
          quarantinePath)
      }
      return OpStats(obs.get("rows").asInstanceOf[Long], 0L)
    }

    val hasCorrupt = df0.columns.contains(CR)
    // JSON carries date as a string; normalize to DateType partition column.
    val df = df0.withColumn("date", col("date").cast("date"))
    val obs = new org.apache.spark.sql.Observation()
    val appended = wh.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
      val observed = df.observe(obs, count(lit(1)).as("lines"),
        (if (hasCorrupt) count(col(CR))
         else count(when(lit(false), lit(1)))).as("corrupt"))
      val good = if (hasCorrupt) observed.filter(col(CR).isNull).drop(CR)
                 else observed
      txEntry match {
        case Some((tx, v)) =>
          val landed =
            tx.appendTxn(spark, good, tmpPath, s"load-${job.key}", batchId = v)
          TableOps.tr(s"load ${job.key} appendTxn batch=$v landed=$landed")
          landed
        case None => wh.append(spark, good, tmpPath); true
      }
    }
    // a skipped duplicate may not have evaluated the plan at all (the
    // winner's rows are in tmp; its quarantine pass ran too) — the
    // Observation would block forever, so return before touching it
    if (!appended) return OpStats(0, 0)
    val lines = obs.get("lines").asInstanceOf[Long]
    val corrupt = obs.get("corrupt").asInstanceOf[Long]
    if (corrupt > 0) {
      wh.withTableLocks(reads = Nil, writes = Seq(quarantinePath)) {
        // second column referenced alongside the corrupt column to satisfy
        // Spark's raw-source corrupt-column query restriction
        wh.append(spark,
          df0.filter(col(CR).isNotNull)
            .select(col(CR).as("raw"), col("date").cast("string").as("claimed_date"))
            .withColumn("date", dateLit),
          quarantinePath)
      }
    }
    OpStats(lines, lines - corrupt)
  }

  /** Re-drive the job date's quarantined raw lines through the load
    * parse: lines that now parse append to tmp, lines that still don't
    * stay quarantined (the partition is rewritten to exactly them). The
    * "fix" that makes a replay succeed is operator-supplied — a
    * corrected pinned `schema` (the load was quarantining on a wrong
    * pin), or a by-hand rewrite of the quarantine partition's `raw`
    * lines (ReplayQuarantineTool + overwritePartition) after an
    * upstream export bug. Returns OpStats(quarantined lines seen, rows
    * replayed into tmp).
    *
    * Exactly-once on the tx backend: the tmp append carries a txn
    * marker keyed by the job and the QUARANTINE table's version at
    * entry — a crash between the append and the quarantine rewrite
    * replays as a no-op append (same quarantine version) followed by
    * the missing rewrite, converging instead of doubling rows. On the
    * path backend a replay after that crash window is at-least-once;
    * tmp dedup collapses re-appended rows only when their dedup keys
    * tie, so prefer the tx backend where replay matters.
    */
  def replayQuarantine(
      schema: Option[org.apache.spark.sql.types.StructType] = None): OpStats = {
    val CR = "_corrupt_record"
    val quarantinePath = tmpPath + "__quarantine"
    if (!wh.exists(spark, quarantinePath)) return OpStats(0L, 0L)
    val qVersion: Option[(TxWarehouse, Long)] = wh match {
      case tx: TxWarehouse => Some((tx, tx.currentVersion(spark, quarantinePath)))
      case _ => None
    }
    // quarantine partitions are bounded by the day's bad-line count —
    // persisting this small frame keeps the parse/count/rewrite passes
    // from re-reading the table mid-rewrite
    val raws = readPartition(quarantinePath, job.date)
      .select(col("raw").cast("string").as("raw")).persist()
    try {
      val total = raws.count()
      if (total == 0L) return OpStats(0L, 0L)
      def reader = spark.read
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX")
        .option("columnNameOfCorruptRecord", CR)
      val pinned = schema.map(s =>
        if (s.fieldNames.contains(CR)) s
        else s.add(CR, org.apache.spark.sql.types.StringType))
      val ds = raws.as(org.apache.spark.sql.Encoders.STRING)
      val df0 = pinned.map(reader.schema).getOrElse(reader).json(ds)
      if (!df0.columns.contains("date")) return OpStats(total, 0L)
      val hasCorrupt = df0.columns.contains(CR)
      val good =
        (if (hasCorrupt) df0.filter(col(CR).isNull).drop(CR) else df0)
          .withColumn("date", col("date").cast("date"))
      val replayed = good.count()
      if (replayed > 0L) {
        wh.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
          qVersion match {
            case Some((tx, v)) =>
              tx.appendTxn(spark, good, tmpPath,
                s"replay-${job.key}", batchId = v): Unit
            case None => wh.append(spark, good, tmpPath)
          }
        }
      }
      wh.withTableLocks(reads = Nil, writes = Seq(quarantinePath)) {
        if (replayed == total) {
          wh.deletePartition(spark, quarantinePath, job.date)
        } else if (replayed > 0L) {
          // PERMISSIVE over a string dataset carries the original line
          // in the corrupt column — the rewritten partition holds
          // exactly the still-bad raw lines
          wh.overwritePartition(spark,
            df0.filter(col(CR).isNotNull).select(col(CR).as("raw"))
              .withColumn("date", dateLit),
            quarantinePath, job.date)
        } // replayed == 0: nothing changed, keep the partition as-is
      }
      OpStats(total, replayed)
    } finally { raws.unpersist(); () }
  }

  /** W1/J2: keep-set dedup of the job's tmp date partition, in place.
    * Keeps, per (id, date), every row whose parser.Time equals the max —
    * ties all survive (NOT EXISTS delete semantics, cloud/bq/ops.go:214-217).
    * Implemented as a staged partition rewrite published through the
    * warehouse backend (staging-dir swap on the path backend, manifest
    * commit on the transactional one — Spark parquet has no DELETE).
    * Skips the rewrite when the partition is already clean — the "very cheap
    * if no duplicates" property (cloud/bq/ops.go:188) by explicit pre-check.
    */
  // Locking (path backend; the tx backend makes these no-ops): recovery
  // and the final publish MUTATE the table root (write lock); everything
  // between — clean-check, content-tier jobs, the staging-write's scan
  // of tmp — only READS it (read lock), so disjoint dates of one
  // datatype stay concurrent except during commits. The gap between
  // read release and publish acquire is safe: only this job's action
  // touches this date's dirs (monitor claims guarantee one in-flight
  // action per job).
  def dedup(dryRun: Boolean = false): OpStats = {
    wh.recoverSelfReplace(spark, tmpPath, job.date)
    // the incremental content tier also READS the raw table / its index
    val readLocks =
      if (spec.contentDedup.exists(_.vsRawCorpus)) {
        // the raw scan covers OTHER dates too — heal any partition an
        // out-of-band maintenance rewrite (compaction) crashed on
        wh.recoverAllSelfReplace(spark, rawPath)
        Seq(tmpPath, rawPath, indexPath)
      } else Seq(tmpPath)
    val staged = wh.withTableLocks(reads = readLocks, writes = Nil) {
      val part = readPartition(tmpPath, job.date)
      val keptExact =
        if (spec.skewedKeys)
          Dedup.keepLatestForSkew(part, spec.partitionKeys, col(spec.orderKey))
        else Dedup.keepLatest(part, spec.partitionKeys, col(spec.orderKey))
      // dry run validates the exact-tier plan only: the content tier
      // EXECUTES Spark jobs while being built (cluster fixpoint), which
      // a dry run must not do
      if (dryRun) { keptExact.queryExecution.analyzed; Left(OpStats(0, 0)) }
      else dedupStage(part, keptExact)
    }
    publishStaged(tmpPath, staged)
  }

  /** Compute + stage the deduped partition (holding the tmp READ lock).
    * Left(stats) = nothing staged (dry run or clean shortcut);
    * Right(stats, token) = staged, caller must publish.
    */
  private def dedupStage(part: DataFrame, keptExact: DataFrame):
      Either[OpStats, (OpStats, String)] = {
    // opt-in content tier: near-dup clusters keep one representative
    // (min id) — the §7.5 training-data generalization of the key dedup,
    // inside the same Deduplicating state / partition rewrite
    var clusterCache: Option[DataFrame] = None
    val kept = spec.contentDedup match {
      case Some(cd) =>
        val pairs = graft.operators.TextDedup.minhashDedupPairs(
          keptExact, "id", cd.textCol, minJaccardE4 = cd.minJaccardE4)
        val clusters = graft.operators.TextDedup.minLabelClusters(pairs)
        clusterCache = Some(clusters)
        val drop = clusters
          .filter(col("label") =!= col("id"))
          .select(col("id").as("__drop_id"))
        val withinDay = keptExact
          .join(drop, col("id") === col("__drop_id"), "left_anti")
        // incremental tier: filter against the archived corpus (other
        // dates). cacheBatch=false — the monitor is long-lived and this
        // API exposes no unpersist handle; the recompute is bounded by
        // the day partition (the small side). The MATERIALIZED signature
        // index (maintained by copyToRaw) is the preferred probe target:
        // the archive's text is never re-read, per-day cost stays
        // O(day + probes) however deep raw grows. The index is used only
        // when it COVERS every archived date — an existence check alone
        // would silently skip the raw dates a pre-index warehouse
        // archived before the upgrade, re-admitting exactly the content
        // this tier exists to block; uncovered dates fall back to the
        // raw-text probe (and heal as their copies re-run). The date
        // sets come from Warehouse.dates — partition-dir names / the
        // manifest, METADATA only, so the check itself costs no scan.
        if (cd.vsRawCorpus && wh.exists(spark, rawPath)) {
          val today = java.sql.Date.valueOf(job.date)
          val needed = wh.dates(spark, rawPath)
            .map(java.sql.Date.valueOf) - today
          val idxDates = wh.dates(spark, indexPath).map(java.sql.Date.valueOf)
          if (needed.nonEmpty && needed.subsetOf(idxDates)) {
            // probe exactly the NEEDED dates: the index may also hold
            // slices raw lacks (a crash between the index commit and
            // the raw commit) — probing those would drop new documents
            // as duplicates of content that is not in the archive
            val seenIdx = wh.read(spark, indexPath)
              .filter(col("date").isInCollection(needed.toSeq)).drop("date")
            graft.operators.TextDedup.incrementalNearDupFilterIndexed(
              withinDay, seenIdx, "id", cd.textCol,
              minJaccardE4 = cd.minJaccardE4, cacheBatch = false)
          } else if (needed.nonEmpty) {
            val seen = wh.read(spark, rawPath).filter(col("date") =!= lit(today))
            graft.operators.TextDedup.incrementalNearDupFilter(
              withinDay, seen, "id", cd.textCol,
              minJaccardE4 = cd.minJaccardE4, cacheBatch = false)
          } else withinDay
        } else withinDay
      case None => keptExact
    }
    try {
      // the cheap no-op shortcut only applies to the exact tier: a
      // key-clean partition can still hold near-dup content
      if (spec.contentDedup.isEmpty &&
          Dedup.isClean(part, spec.partitionKeys, col(spec.orderKey))) {
        val n = part.count()
        Left(OpStats(n, n))
      } else {
        val rowsIn = part.count()
        val (rowsOut, token) = wh.stageSelfReplace(spark, kept, tmpPath, job.date)
        Right((OpStats(rowsIn, rowsOut), token))
      }
    } finally {
      // the clustering loop returns a persisted frontier — release it
      // once the rewrite has consumed it (long-running monitors would
      // otherwise accumulate cached blocks per job)
      clusterCache.foreach(_.unpersist())
    }
  }

  /** S2: copy the tmp date partition to raw, replacing the destination
    * partition (WriteTruncate, cloud/bq/ops.go:171).
    */
  /** Declarative table properties from the datatype spec (bloom key
    * column, CHECK constraints), ensured on the RAW table before its
    * first governed write — tx backend only (the path backend has no
    * manifest to carry them); property commits happen once and are
    * compared-before-committed so the steady state is read-only.
    */
  private def ensureRawTableProps(): Unit = wh match {
    case tx: TxWarehouse =>
      spec.bloomKey.foreach { c =>
        if (tx.tableProperty(spark, rawPath, FileBloom.PropKey).isEmpty)
          tx.setBloomFilter(spark, rawPath, c)
      }
      spec.checks.foreach { case (name, sql) =>
        if (!tx.checkConstraintSql(spark, rawPath, name).contains(sql))
          tx.addCheckConstraint(spark, rawPath, name, sql)
      }
    case _ => ()
  }

  def copyToRaw(dryRun: Boolean = false): OpStats = {
    val idxMaintained = spec.contentDedup.exists(_.vsRawCorpus)
    val writeLocks = if (idxMaintained) Seq(rawPath, indexPath) else Seq(rawPath)
    // the read must be CONSTRUCTED inside the lock too: parquet listing
    // + mergeSchema footer reads happen eagerly at construction, racing
    // a concurrent same-table commit if taken outside
    wh.withTableLocks(reads = Seq(tmpPath), writes = writeLocks) {
      val part = readPartition(tmpPath, job.date)
      if (dryRun) { part.queryExecution.analyzed; OpStats(0, 0) }
      else {
        ensureRawTableProps()
        // maintain the date's slice of the near-dup signature index in
        // the same action that archives the rows (partition replace, so
        // a re-swept day's index converges with its raw partition) —
        // this is what lets the NEXT day's dedup probe signatures
        // instead of re-reading the archive's text. The index commits
        // BEFORE the raw rows: a crash between the two leaves an index
        // slice for a not-yet-archived date — benign (the copy retry
        // converges, and dedups that probed it early made the decisions
        // the converged state implies) — where the reverse order leaves
        // an archived date the index lacks, silently re-admitting its
        // duplicates until the coverage check falls back to raw text.
        spec.contentDedup.filter(_.vsRawCorpus).foreach { cd =>
          val idx = graft.operators.TextDedup
            .nearDupIndex(part, "id", cd.textCol)
            .withColumn("date", dateLit)
          wh.overwritePartition(spark, idx, indexPath, job.date): Unit
        }
        val n = wh.overwritePartition(spark, part, rawPath, job.date)
        TableOps.tr(s"copyToRaw ${job.key} published rows=$n")
        OpStats(n, n)
      }
    }
  }

  /** S3: drop the tmp date partition (ALTER TABLE DROP PARTITION semantics,
    * cloud/bq/ops.go:221-228). A metadata/filesystem operation — no scan.
    */
  def deleteTmp(): Unit =
    wh.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
      TableOps.tr(s"deleteTmp ${job.key}")
      wh match {
        // advance the load-idempotence drain epoch atomically with the
        // partition delete — see loadToTmp's txEntry comment
        case tx: TxWarehouse =>
          tx.deletePartitionMarking(spark, tmpPath, job.date,
            s"drain-${job.key}")
        case _ => wh.deletePartition(spark, tmpPath, job.date)
      }
    }

  /** S4/J1: annotation LEFT JOIN materialization into the join dataset,
    * replacing the date partition, with schema merge on read (the reference
    * allows field addition/relaxation, cloud/bq/ops.go:280-282).
    * No-op when the datatype has no join dataset (ops/actions.go:371-374).
    */
  def join(annDatatype: String = "annotation2", dryRun: Boolean = false): OpStats = {
    if (!job.datasets.hasJoin) return OpStats(0, 0)
    val annPath = wh.tablePath(job.datasets.raw, annDatatype)
    // both scans cover every date — heal crashed out-of-band rewrites
    wh.recoverAllSelfReplace(spark, rawPath)
    wh.recoverAllSelfReplace(spark, annPath)
    // reads constructed inside the locks — see copyToRaw
    wh.withTableLocks(reads = Seq(rawPath, annPath), writes = Seq(joinPath)) {
      val m = wh.read(spark, rawPath)
      val ann = wh.read(spark, annPath)
      val out = AnnotationJoin.annotatePartition(m, ann, job.date)
      if (dryRun) { out.queryExecution.analyzed; OpStats(0, 0) }
      else {
        // reference parity: the join table is BORN with
        // requirePartitionFilter (cloud/bq/ops.go:283-287) — its whole
        // access pattern is per-day, and the flag turns an accidental
        // full scan into an error instead of a 100 TB bill
        if (!wh.exists(spark, joinPath))
          wh.setRequirePartitionFilter(spark, joinPath)
        val n = wh.overwritePartition(spark, out, joinPath, job.date)
        OpStats(n, n)
      }
    }
  }

  /** Small-file compaction of the raw date partition: rewrite into
    * ceil(partitionBytes / targetFileBytes) files via a narrow coalesce
    * (no shuffle — compaction only merges). The reference never needs
    * this (BigQuery manages physical storage); a parquet warehouse
    * accumulating per-day appends does — at archive scale, scan cost is
    * driven by file COUNT (open/footer/seek per file) as much as bytes,
    * and a day assembled from thousands of archive loads reads back
    * thousands of tiny files until compacted. Uses the same
    * stage + publish path as the dedup rewrite, so it inherits each
    * backend's crash safety and (tx) write-write conflict detection;
    * on the tx backend the replaced files are retired metadata-only
    * and reclaimed by vacuum. No-op when the partition already has no
    * more files than the target layout.
    */
  // `exclusive`: hold the table WRITE lock across the whole
  // stage + publish instead of the dedup's read-then-write pattern. The
  // pipeline's own rewrites may leave the stage→publish gap unlocked
  // because monitor claims guarantee one in-flight action per job/date;
  // OUT-OF-BAND compaction (the maintenance sweep) has no such
  // guarantee on the path backend — a re-dispatched day's fresh copy
  // landing in the gap would be clobbered by the stale staged files at
  // publish. The tx backend needs no lock either way (the staged
  // sidecar fences the publish); path-backend sweeps pay table-wide
  // blocking for the compaction's duration, which is what maintenance
  // windows are.
  // `clusterBy`: layout of the REWRITTEN files. Empty = the narrow
  // coalesce (pure merge, no shuffle). Non-empty = range-partition +
  // in-partition sort on these columns, so each output file covers a
  // tight, near-disjoint min/max range — exactly what makes the tx
  // manifest's file stats ([[FileStats]]) selective: after a clustered
  // compaction, a [[Warehouse.readWhere]] range/point query on a cluster
  // column opens ~one file instead of every file the day's appends
  // scattered the key across. Costs one exchange plus a boundary-
  // sampling pass (repartitionByRange), paid ONCE per fragmented
  // partition at maintenance time to make every later read cheap — the
  // standard layout-maintenance trade (Delta OPTIMIZE ZORDER, Iceberg
  // rewrite with sort order). Clustering rides the fragmentation
  // trigger; an already-compact partition is not rewritten just to
  // re-sort.
  // `interleave`: with ≥ 2 cluster columns, lay the rewrite out in
  // Z-order ([[ZOrder]]) instead of lexicographic range order — every
  // output file then covers a tight min/max box in ALL cluster
  // dimensions, so readWhere's stats pruning stays selective for
  // predicates on ANY of them (a lexicographic layout serves only the
  // leading column). Costs the same single exchange plus one bounded
  // sampling job; ignored (plain range clustering) with < 2 columns,
  // where the two layouts coincide.
  def compactRaw(targetFileBytes: Long = 128L * 1024 * 1024,
      exclusive: Boolean = false, clusterBy: Seq[String] = Nil,
      interleave: Boolean = false): OpStats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    // an exclusive run holds the write lock over stage AND publish (the
    // inner read/write acquisitions below are reentrant under it)
    if (exclusive)
      wh.withTableLocks(reads = Nil, writes = Seq(rawPath)) {
        compactRawBody(targetFileBytes, clusterBy, interleave)
      }
    else compactRawBody(targetFileBytes, clusterBy, interleave)
  }

  private def compactRawBody(targetFileBytes: Long,
      clusterBy: Seq[String], interleave: Boolean = false): OpStats = {
    wh.recoverSelfReplace(spark, rawPath, job.date)
    val staged = wh.withTableLocks(reads = Seq(rawPath), writes = Nil) {
      // sizing comes from the PARTITION's file metadata, never the
      // DataFrame's inputFiles: on the path backend inputFiles ignores
      // the date filter (partition pruning is physical-plan-time for
      // non-catalog reads) and would gate this date's compaction on
      // the WHOLE table's file count and bytes
      val files = wh.partitionFiles(spark, rawPath, job.date)
      if (files.isEmpty) Left(OpStats(0, 0))
      else {
        val totalBytes = files.map(_._2).sum
        val nOut = math.max(1L,
          math.ceil(totalBytes.toDouble / targetFileBytes).toLong).toInt
        val part = readPartition(rawPath, job.date)
        if (files.length <= nOut) {
          val n = part.count() // parquet metadata count — no data read
          Left(OpStats(n, n))
        } else {
          val layout =
            if (clusterBy.isEmpty) part.coalesce(nOut)
            else if (interleave && clusterBy.length >= 2)
              ZOrder.layout(part, clusterBy, nOut)
            else part.repartitionByRange(nOut, clusterBy.map(col): _*)
              .sortWithinPartitions(clusterBy.map(col): _*)
          val (rows, token) =
            wh.stageSelfReplace(spark, layout, rawPath, job.date)
          Right((OpStats(rows, rows), token))
        }
      }
    }
    publishStaged(rawPath, staged)
  }

  /** Publish the staged half of a partition rewrite (shared by the
    * dedup and compaction epilogues — the two must evolve in lockstep).
    */
  private def publishStaged(path: String,
      staged: Either[OpStats, (OpStats, String)]): OpStats = staged match {
    case Left(stats) => stats
    case Right((stats, token)) =>
      wh.publishSelfReplace(spark, path, job.date, token)
      TableOps.tr(s"dedup ${job.key} published token=$token rows=${stats.rowsOut}")
      stats
  }

  /** Row count of one raw partition (status/detail helper). */
  def rawPartitionCount(): Long = {
    wh.recoverSelfReplace(spark, rawPath, job.date)
    wh.withTableLocks(reads = Seq(rawPath), writes = Nil) {
      readPartition(rawPath, job.date).count()
    }
  }
}

object TableOps {
  /** Race-investigation tracing (set GRAFT_TRACE=1): timestamped,
    * thread-tagged prints from the pipeline's commit decision points.
    * Zero cost when off (message is by-name).
    */
  private[graft] val trace: Boolean = sys.env.get("GRAFT_TRACE").contains("1")
  private[graft] def tr(msg: => String): Unit =
    if (trace) println(
      s"[trace ${System.currentTimeMillis()} ${Thread.currentThread.getName}] $msg")

  /** Sibling-table suffix of the materialized near-dup signature index
    * (maintained by copyToRaw, probed by dedup, maintained-for by the
    * sweeper).
    */
  val NearDupIndexSuffix = "__neardup_index"

  /** Dynamic partition overwrite must be on for partition-truncate writes. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
}
