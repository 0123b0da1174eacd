package graft.tableops

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Job
import graft.operators.{AnnotationJoin, Dedup}

/** Warehouse layout: date-partitioned parquet tables under
  * `root/<dataset>/<datatype>/date=YYYY-MM-DD/`. The dataset names come from
  * Job.datasets (tmp/raw/join namespaces, reference: tracker/job.go:41-45).
  */
final case class Warehouse(root: String) {
  def tablePath(dataset: String, datatype: String): String =
    s"$root/$dataset/$datatype"
}

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
    skewedKeys: Boolean = false, contentDedup: Option[ContentDedupSpec] = None)

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
  * DataFrame programs over a parquet warehouse.
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

  private def dateLit = lit(java.sql.Date.valueOf(job.date))

  // mergeSchema: the table's schema evolves across loads (the reference
  // tolerates added fields, cloud/bq/ops.go:280-282 / ops/actions.go:215-225);
  // without it the parquet reader samples ONE footer and a day whose rows
  // carry a newer column than an older footer silently loses it through
  // dedup/copy.
  private def readPartition(path: String, d: LocalDate): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col("date") === lit(java.sql.Date.valueOf(d)))

  private def tableExists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

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
  def loadToTmp(glob: String, schema: Option[org.apache.spark.sql.types.StructType] = None): OpStats = {
    val CR = "_corrupt_record"
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
      TableOps.withTableLocks(reads = Nil, writes = Seq(quarantinePath)) {
        spark.read.text(glob).select(col("value").as("raw"))
          .withColumn("date", dateLit)
          .observe(obs, count(lit(1)).as("rows"))
          .write.mode(SaveMode.Append).partitionBy("date").parquet(quarantinePath)
      }
      return OpStats(obs.get("rows").asInstanceOf[Long], 0L)
    }

    val hasCorrupt = df0.columns.contains(CR)
    // JSON carries date as a string; normalize to DateType partition column.
    val df = df0.withColumn("date", col("date").cast("date"))
    val obs = new org.apache.spark.sql.Observation()
    TableOps.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
      val observed = df.observe(obs, count(lit(1)).as("lines"),
        (if (hasCorrupt) count(col(CR))
         else count(when(lit(false), lit(1)))).as("corrupt"))
      val good = if (hasCorrupt) observed.filter(col(CR).isNull).drop(CR)
                 else observed
      good.write.mode(SaveMode.Append).partitionBy("date").parquet(tmpPath)
    }
    val lines = obs.get("lines").asInstanceOf[Long]
    val corrupt = obs.get("corrupt").asInstanceOf[Long]
    if (corrupt > 0) {
      TableOps.withTableLocks(reads = Nil, writes = Seq(quarantinePath)) {
        // second column referenced alongside the corrupt column to satisfy
        // Spark's raw-source corrupt-column query restriction
        df0.filter(col(CR).isNotNull)
          .select(col(CR).as("raw"), col("date").cast("string").as("claimed_date"))
          .withColumn("date", dateLit)
          .write.mode(SaveMode.Append).partitionBy("date").parquet(quarantinePath)
      }
    }
    OpStats(lines, lines - corrupt)
  }

  /** W1/J2: keep-set dedup of the job's tmp date partition, in place.
    * Keeps, per (id, date), every row whose parser.Time equals the max —
    * ties all survive (NOT EXISTS delete semantics, cloud/bq/ops.go:214-217).
    * Implemented as partition-truncate rewrite (Spark parquet has no DELETE).
    * Skips the rewrite when the partition is already clean — the "very cheap
    * if no duplicates" property (cloud/bq/ops.go:188) by explicit pre-check.
    */
  // Locking: three phases. Recovery and the final swap MUTATE the table
  // root (write lock); everything between — clean-check, content-tier
  // jobs, the staging-write's scan of tmp — only READS it (read lock),
  // so disjoint dates of one datatype stay concurrent except during
  // commits. The gap between read release and swap acquire is safe:
  // only this job's action touches this date's dirs (monitor claims
  // guarantee one in-flight action per job).
  def dedup(dryRun: Boolean = false): OpStats = {
    TableOps.withTableLocks(reads = Nil, writes = Seq(tmpPath))(recoverStaging())
    // the incremental content tier also READS the raw table
    val readLocks =
      if (spec.contentDedup.exists(_.vsRawCorpus)) Seq(tmpPath, rawPath)
      else Seq(tmpPath)
    val staged = TableOps.withTableLocks(reads = readLocks, writes = Nil) {
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
    staged match {
      case Left(stats) => stats
      case Right(stats) =>
        // Spark cannot overwrite a path it is reading from, so the
        // rewrite staged to a private dir; swap it in under the write
        // lock — the same pattern a DELETE-less object-store rewrite uses
        TableOps.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
          val fs = new Path(tmpPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
          val partDir = s"date=${job.date}"
          fs.delete(new Path(s"$tmpPath/$partDir"), true)
          fs.rename(new Path(s"$stagingPath/$partDir"), new Path(s"$tmpPath/$partDir"))
          fs.delete(new Path(stagingPath), true)
          stats
        }
    }
  }

  /** Compute + stage the deduped partition (holding the tmp READ lock).
    * Left(stats) = nothing staged (dry run or clean shortcut);
    * Right(stats) = staged, caller must swap.
    */
  private def dedupStage(part: DataFrame, keptExact: DataFrame): Either[OpStats, OpStats] = {
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
        // the day partition (the small side).
        if (cd.vsRawCorpus && tableExists(rawPath)) {
          val seen = spark.read.option("mergeSchema", "true").parquet(rawPath)
            .filter(col("date") =!= lit(java.sql.Date.valueOf(job.date)))
          graft.operators.TextDedup.incrementalNearDupFilter(
            withinDay, seen, "id", cd.textCol,
            minJaccardE4 = cd.minJaccardE4, cacheBatch = false)
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
        val rowsOut = overwritePartitionLocked(kept, stagingPath)
        Right(OpStats(rowsIn, rowsOut))
      }
    } finally {
      // the clustering loop returns a persisted frontier — release it
      // once the rewrite has consumed it (long-running monitors would
      // otherwise accumulate cached blocks per job)
      clusterCache.foreach(_.unpersist())
    }
  }

  // Per-DATE staging root: the monitor runs one action per job
  // concurrently, and several dates of the same datatype can be
  // deduplicating at once — a shared staging root would let one date's
  // final cleanup delete a sibling date's staged rows mid-swap (and
  // concurrent Spark writes to one root race on _temporary). The
  // reference gets this isolation for free from BigQuery's job model.
  private def stagingPath = s"$tmpPath.__dedup_staging_date_${job.date}"

  /** Crash recovery for the dedup partition swap: a crash between the
    * delete and the rename leaves the tmp partition empty with the deduped
    * rows stranded in staging — a restarted monitor would then see a
    * "clean" empty partition and silently lose the day. If staging holds
    * the partition and tmp does not, rename it back before proceeding.
    */
  private def recoverStaging(): Unit = {
    val fs = new Path(tmpPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDir = s"date=${job.date}"
    val stagedPart = new Path(s"$stagingPath/$partDir")
    val tmpPart = new Path(s"$tmpPath/$partDir")
    if (fs.exists(stagedPart) && !fs.exists(tmpPart)) {
      fs.rename(stagedPart, tmpPart)
      fs.delete(new Path(stagingPath), true)
    }
  }

  /** S2: copy the tmp date partition to raw, replacing the destination
    * partition (WriteTruncate, cloud/bq/ops.go:171).
    */
  def copyToRaw(dryRun: Boolean = false): OpStats =
    // the read must be CONSTRUCTED inside the lock too: parquet listing
    // + mergeSchema footer reads happen eagerly at construction, racing
    // a concurrent same-table commit if taken outside
    TableOps.withTableLocks(reads = Seq(tmpPath), writes = Seq(rawPath)) {
      val part = readPartition(tmpPath, job.date)
      if (dryRun) { part.queryExecution.analyzed; OpStats(0, 0) }
      else {
        val n = overwritePartitionLocked(part, rawPath)
        OpStats(n, n)
      }
    }

  /** S3: drop the tmp date partition (ALTER TABLE DROP PARTITION semantics,
    * cloud/bq/ops.go:221-228). A pure metadata/filesystem operation — no scan.
    */
  def deleteTmp(): Unit =
    TableOps.withTableLocks(reads = Nil, writes = Seq(tmpPath)) {
      val dir = new Path(s"$tmpPath/date=${job.date}")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(dir, true): Unit
    }

  /** S4/J1: annotation LEFT JOIN materialization into the join dataset,
    * replacing the date partition, with schema merge on read (the reference
    * allows field addition/relaxation, cloud/bq/ops.go:280-282).
    * No-op when the datatype has no join dataset (ops/actions.go:371-374).
    */
  def join(annDatatype: String = "annotation2", dryRun: Boolean = false): OpStats = {
    if (!job.datasets.hasJoin) return OpStats(0, 0)
    val annPath = wh.tablePath(job.datasets.raw, annDatatype)
    // reads constructed inside the locks — see copyToRaw
    TableOps.withTableLocks(reads = Seq(rawPath, annPath), writes = Seq(joinPath)) {
      val m = spark.read.option("mergeSchema", "true").parquet(rawPath)
      val ann = spark.read.option("mergeSchema", "true").parquet(annPath)
      val out = AnnotationJoin.annotatePartition(m, ann, job.date)
      if (dryRun) { out.queryExecution.analyzed; OpStats(0, 0) }
      else {
        val n = overwritePartitionLocked(out, joinPath)
        OpStats(n, n)
      }
    }
  }

  /** Row count of one raw partition (status/detail helper). */
  def rawPartitionCount(): Long =
    TableOps.withTableLocks(reads = Seq(rawPath), writes = Nil) {
      readPartition(rawPath, job.date).count()
    }

  /** The write itself — callers must hold the destination's write lock
    * plus read locks of every table the plan scans (parquet listing +
    * mergeSchema footer reads race concurrent commits otherwise).
    */
  private def overwritePartitionLocked(df: DataFrame, destPath: String): Long = {
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .parquet(destPath)
    obs.get("rows").asInstanceOf[Long]
  }
}

object TableOps {
  /** Dynamic partition overwrite must be on for partition-truncate writes. */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  // Per-table read/write locks. Two Spark writes into the SAME table
  // root (different dates of one datatype, dispatched concurrently by
  // the monitor) share a single `_temporary` staging directory and
  // corrupt each other's commits; a scan (parquet listing + mergeSchema
  // footer reads, which run eagerly at read construction) racing a
  // commit in the same root dies with FileNotFoundException. Neither
  // race exists in the reference — BigQuery commits transactionally
  // server-side. Readers share (disjoint dates stay concurrent);
  // commits exclude. A multi-driver deployment should use a
  // transactional table format (e.g. Delta) instead.
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()

  private def rwLock(path: String) =
    tableLocks.computeIfAbsent(path,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  /** Acquire read locks on `reads` and write locks on `writes`, all in
    * one globally-sorted path order (deadlock-free); write wins when a
    * path appears in both. Callers must not nest acquisitions (no
    * read→write upgrade exists).
    */
  private[tableops] def withTableLocks[T](
      reads: Seq[String], writes: Seq[String])(body: => T): T = {
    val w = writes.toSet
    val locks = (reads ++ writes).distinct.sorted.map { p =>
      if (w(p)) rwLock(p).writeLock() else rwLock(p).readLock()
    }
    locks.foreach(_.lock())
    try body finally locks.reverse.foreach(_.unlock())
  }
}
