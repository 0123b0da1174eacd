package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8
import java.time.LocalDate
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage backend seam for the table operations. The reference gets its
  * write atomicity from BigQuery's server-side transactional job model
  * (cloud/bq/ops.go); a parquet warehouse has to supply its own, and two
  * implementations do:
  *
  *  - [[PathWarehouse]] — plain date-partitioned parquet directories.
  *    Concurrency inside ONE driver JVM is handled with per-table
  *    read/write locks (two Spark writes into one table root share a
  *    `_temporary` dir and corrupt each other's commits; a scan racing a
  *    commit dies on missing files). Simple, zero metadata, but the
  *    locks are JVM-local: multi-driver deployments must not share a
  *    table root.
  *  - [[TxWarehouse]] — a minimal transactional table format: immutable
  *    data files under unique directories plus an append-only commit log
  *    of versioned manifests (the same shape Delta/Iceberg use, reduced
  *    to exactly what the pipeline needs). Readers pin the file list of
  *    the latest committed version (snapshot isolation — no read locks);
  *    writers write fresh files and publish with one atomic
  *    create-if-absent of the next log entry (optimistic concurrency,
  *    retry on version collision); partition delete and the dedup
  *    rewrite are metadata commits — a real DELETE, no staging swap, no
  *    window where the day's rows exist nowhere. Safe for multiple
  *    drivers: the version publish is link(2) on local filesystems and
  *    atomic no-overwrite rename on HDFS; object stores plug a
  *    conditional-put committer into the [[LogPublisher]] seam, and
  *    schemes with no registered publisher are rejected loudly.
  *
  * All operations take the table's physical path (from [[tablePath]]);
  * `date` is the partition grain, matching the reference's
  * date-partitioned model (SURVEY.md §2.7).
  */
trait Warehouse {
  def tablePath(dataset: String, datatype: String): String

  /** Live-data read with schema merge across files. */
  def read(spark: SparkSession, path: String): DataFrame

  /** One date partition. Backends prune before the row filter. */
  def readPartition(spark: SparkSession, path: String, date: LocalDate): DataFrame =
    read(spark, path).filter(col("date") === lit(java.sql.Date.valueOf(date)))

  /** Predicate read. The base contract is just `read().filter` — the tx
    * backend overrides it with FILE-LEVEL data skipping from the per-file
    * stats its manifest records ([[FileStats]]): files whose min/max
    * prove the predicate cannot match are never opened, so a range query
    * on a clustered column costs O(overlapping files), not O(table).
    * Always equivalent to the unpruned read — skipping is a proof of
    * emptiness, never a guess.
    */
  def readWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DataFrame =
    read(spark, path).filter(predicate)

  def exists(spark: SparkSession, path: String): Boolean

  /** BigQuery-dual `requirePartitionFilter` (set on the reference's
    * join table at creation, cloud/bq/ops.go:283-287): a flagged table
    * refuses unscoped reads. Backends without a property mechanism
    * (the plain path warehouse) treat it as a no-op — their physical
    * date-directory layout already makes the partition the natural
    * access grain.
    */
  def setRequirePartitionFilter(spark: SparkSession, path: String,
      required: Boolean = true): Unit = ()

  def requiresPartitionFilter(spark: SparkSession, path: String): Boolean =
    false

  /** Distinct partition dates of the table, from METADATA only
    * (partition directory names / the manifest) — never a data or
    * footer scan. Empty set when the table does not exist.
    */
  def dates(spark: SparkSession, path: String): Set[LocalDate]

  /** Append `df` (which carries a `date` column, possibly several dates). */
  def append(spark: SparkSession, df: DataFrame, path: String): Unit

  /** Replace `date`'s partition with `df` (single-date, NOT scanning
    * `path` itself). Returns rows written. Path-backend callers must
    * hold the destination write lock plus read locks on scanned tables.
    */
  def overwritePartition(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): Long

  /** Drop `date`'s partition. Metadata-only where the backend can. */
  def deletePartition(spark: SparkSession, path: String, date: LocalDate): Unit

  /** Phase 1 of a partition rewrite whose plan SCANS `path` itself (the
    * dedup): materialize `df` without publishing. Returns (rows, token).
    * Path-backend callers must hold `path`'s read lock throughout.
    */
  def stageSelfReplace(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): (Long, String)

  /** Phase 2: atomically publish the staged rows as `date`'s partition. */
  def publishSelfReplace(spark: SparkSession, path: String, date: LocalDate,
      token: String): Unit

  /** The physical files of `date`'s partition as (absolute path, size),
    * from one METADATA listing — the input to compaction decisions.
    * Empty when the partition or table does not exist.
    */
  def partitionFiles(spark: SparkSession, path: String,
      date: LocalDate): Seq[(String, Long)]

  /** Live file COUNT per partition date from one metadata pass over the
    * whole table — the maintenance sweep's fragmentation screen. Counts
    * only: a date with ≤ 1 file can never need compaction, so per-file
    * size stats are deferred to [[partitionFiles]] on the (rare) dates
    * that pass the screen; the steady-state sweep of an already-compact
    * table costs one listing (path backend) / one manifest replay (tx),
    * never O(total files) stat calls. Empty when the table does not
    * exist.
    */
  def partitionFileCounts(spark: SparkSession,
      path: String): Map[LocalDate, Int]

  /** Crash recovery for an interrupted stage/publish of `date`. */
  def recoverSelfReplace(spark: SparkSession, path: String, date: LocalDate): Unit

  /** Recovery sweep over EVERY date of the table — for readers that
    * scan partitions other jobs (or out-of-band maintenance like
    * compaction) may have crashed mid-publish on. No-op where the
    * backend has no recovery window.
    */
  def recoverAllSelfReplace(spark: SparkSession, path: String): Unit

  /** Table-level mutual exclusion where the backend needs it (see class
    * docs). Acquire read locks on `reads`, write locks on `writes`.
    */
  def withTableLocks[T](reads: Seq[String], writes: Seq[String])(body: => T): T
}

/** Thrown by [[TxWarehouse]] when a partition commit loses to a
  * concurrent writer. Subclasses the JVM's ConcurrentModificationException
  * for API familiarity, but callers classifying transient-vs-terminal
  * errors (the gardener's Outcome mapping) must match THIS type — a
  * generic CME from a collection bug elsewhere is a real failure, not a
  * retryable conflict.
  */
final class ConcurrentCommitException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

/** A write batch violated a table CHECK constraint
  * ([[TxWarehouse.addCheckConstraint]]); nothing was committed — the
  * written files are unreferenced orphans for vacuum.
  */
final class ConstraintViolationException(msg: String)
    extends IllegalArgumentException(msg)

/** What a [[TxWarehouse.mergeInto]] did, in file and row terms.
  * `filesKept` is the headline scale number: live files the manifest
  * stats PROVED key-disjoint from the change set — never read, never
  * rewritten. `rowsWritten` counts the rewritten files' output
  * (surviving base rows + upserts); `rowsUpserted`/`deleteKeys` size
  * the change set itself.
  */
final case class MergeStats(filesRewritten: Int, filesKept: Int,
    rowsWritten: Long, rowsUpserted: Long, deleteKeys: Long)

/** The atomic exclusive publish behind every [[TxWarehouse]] commit:
  * move a FULLY-WRITTEN temp file to `dest`, returning true iff THIS
  * call created `dest` and false iff `dest` already existed (a racing
  * commit won the version). The entire optimistic-concurrency story
  * rests on the create-if-absent being atomic: of N concurrent
  * publishes of one `dest`, exactly one may see true — a publisher that
  * can silently overwrite (plain rename on raw object stores) would
  * make the LOSING commit disappear, which is a lost update, not a
  * retry. Publishers are selected per filesystem SCHEME; unknown
  * schemes are rejected loudly rather than optimistically renamed —
  * register a conditional-put ("if-none-match") implementation for an
  * object store via [[LogPublisher.register]].
  */
trait LogPublisher {
  def publish(f: FileSystem, tmp: Path, dest: Path): Boolean
}

object LogPublisher {

  /** link(2) on local filesystems: fails EEXIST in the same syscall
    * that creates `dest` — a check-then-rename would lose a racing
    * commit because POSIX rename(2) OVERWRITES an existing destination
    * (observed under the concurrent-writer stress spec).
    */
  object HardLink extends LogPublisher {
    def publish(f: FileSystem, tmp: Path, dest: Path): Boolean = {
      val destNio = java.nio.file.Paths.get(dest.toUri.getPath)
      val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
      try { java.nio.file.Files.createLink(destNio, tmpNio); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }
  }

  /** HDFS-contract rename: atomic, and FAILS (returns false) on an
    * existing destination. Correct only on filesystems honoring that
    * contract (HDFS, viewfs) — never object stores.
    */
  object AtomicRename extends LogPublisher {
    def publish(f: FileSystem, tmp: Path, dest: Path): Boolean =
      if (f.exists(dest)) false else f.rename(tmp, dest)
  }

  private val byScheme =
    new java.util.concurrent.ConcurrentHashMap[String, LogPublisher]()
  register("file", HardLink)
  register("hdfs", AtomicRename)
  register("viewfs", AtomicRename)

  /** Plug a publisher for a filesystem scheme (e.g. a conditional-put
    * committer for `s3a`/`gs`). Later registrations win.
    */
  def register(scheme: String, p: LogPublisher): Unit = {
    byScheme.put(scheme, p); ()
  }

  def forScheme(scheme: String): LogPublisher = {
    val p = byScheme.get(scheme)
    if (p == null) throw new IllegalArgumentException(
      s"no atomic-commit publisher registered for filesystem scheme " +
        s"'$scheme': a plain rename would silently OVERWRITE a racing " +
        "commit (lost update) on stores without an atomic no-overwrite " +
        "rename. Register a conditional-put LogPublisher for this " +
        "scheme via LogPublisher.register before using TxWarehouse on it.")
    p
  }
}

object Warehouse {
  /** Default backend — plain partitioned-parquet directories. */
  def apply(root: String): Warehouse = new PathWarehouse(root)

  /** Named construction for CLI wiring. */
  def forName(name: String, root: String): Warehouse = name match {
    case "path" => new PathWarehouse(root)
    case "tx" => new TxWarehouse(root)
    case other => throw new IllegalArgumentException(s"unknown warehouse backend: $other")
  }
}

/** Plain `root/<dataset>/<datatype>/date=YYYY-MM-DD/` parquet layout with
  * JVM-local per-table read/write locks (see [[Warehouse]] docs). The
  * dataset names come from Job.datasets (tmp/raw/join namespaces,
  * reference: tracker/job.go:41-45).
  */
final class PathWarehouse(val root: String) extends Warehouse {

  def tablePath(dataset: String, datatype: String): String =
    s"$root/$dataset/$datatype"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // mergeSchema: the table's schema evolves across loads (the reference
  // tolerates added fields, cloud/bq/ops.go:280-282); without it the
  // parquet reader samples ONE footer and a day whose rows carry a newer
  // column than an older footer silently loses it through dedup/copy.
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Partition dates = the `date=` directory names — one listing. */
  def dates(spark: SparkSession, path: String): Set[LocalDate] = {
    val f = fs(spark, path)
    if (!f.exists(new Path(path))) return Set.empty
    f.listStatus(new Path(path)).toSet
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("date="))
      .flatMap(st =>
        scala.util.Try(LocalDate.parse(st.getPath.getName.stripPrefix("date=")))
          .toOption)
  }

  def append(spark: SparkSession, df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("date").parquet(path)

  def overwritePartition(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): Long = {
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Pure filesystem operation — no scan (ALTER TABLE DROP PARTITION
    * semantics, cloud/bq/ops.go:221-228).
    */
  def deletePartition(spark: SparkSession, path: String, date: LocalDate): Unit = {
    fs(spark, path).delete(new Path(s"$path/date=$date"), true): Unit
  }

  // Per-DATE staging root: several dates of one datatype can be
  // deduplicating at once — a shared staging root would let one date's
  // final cleanup delete a sibling date's staged rows mid-swap (and
  // concurrent Spark writes to one root race on _temporary). The
  // reference gets this isolation for free from BigQuery's job model.
  private def stagingPath(path: String, date: LocalDate): String =
    s"$path.__dedup_staging_date_$date"

  /** Spark cannot overwrite a path it is reading from, so the rewrite
    * stages to a private dir — the same pattern a DELETE-less
    * object-store rewrite uses.
    */
  def stageSelfReplace(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): (Long, String) = {
    val sp = stagingPath(path, date)
    (overwritePartition(spark, df, sp, date), sp)
  }

  /** Swap the staged partition in under the table's write lock. */
  def publishSelfReplace(spark: SparkSession, path: String, date: LocalDate,
      token: String): Unit =
    withTableLocks(reads = Nil, writes = Seq(path)) {
      val f = fs(spark, path)
      val partDir = s"date=$date"
      f.delete(new Path(s"$path/$partDir"), true)
      // Hadoop rename reports failure by RETURNING false, not throwing —
      // swallowing it would report the action as Success with the live
      // partition deleted and the day's rows stranded in staging until
      // some later recoverSelfReplace of this exact date. Throw, so the
      // action lands in the failure path and the recovery sweep (which
      // sees staged-but-missing) can heal on re-run.
      if (!f.rename(new Path(s"$token/$partDir"), new Path(s"$path/$partDir")))
        throw new java.io.IOException(
          s"publish rename failed: $token/$partDir -> $path/$partDir " +
            "(staged rows retained for recoverSelfReplace)")
      f.delete(new Path(token), true): Unit
    }

  /** One listing of the partition directory — names and lengths come
    * from the same FileStatus batch (no per-file round trips).
    */
  def partitionFiles(spark: SparkSession, path: String,
      date: LocalDate): Seq[(String, Long)] = {
    val f = fs(spark, path)
    val dir = new Path(s"$path/date=$date")
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** One listing per date directory, counts only (statuses come from
    * the directory listing batch — no extra stat round trips).
    */
  def partitionFileCounts(spark: SparkSession,
      path: String): Map[LocalDate, Int] = {
    val f = fs(spark, path)
    dates(spark, path).map { d =>
      d -> f.listStatus(new Path(s"$path/date=$d"))
        .count(st => st.isFile && !st.getPath.getName.startsWith("_"))
    }.toMap
  }

  /** A crash between the swap's delete and rename leaves the partition
    * empty with the deduped rows stranded in staging — a restarted
    * monitor would then see a "clean" empty partition and silently lose
    * the day. If staging holds the partition and the table does not,
    * rename it back before proceeding.
    */
  def recoverSelfReplace(spark: SparkSession, path: String, date: LocalDate): Unit =
    withTableLocks(reads = Nil, writes = Seq(path)) {
      val f = fs(spark, path)
      val partDir = s"date=$date"
      val stagedPart = new Path(s"${stagingPath(path, date)}/$partDir")
      val tablePart = new Path(s"$path/$partDir")
      if (f.exists(stagedPart) && !f.exists(tablePart)) {
        f.rename(stagedPart, tablePart)
        f.delete(new Path(stagingPath(path, date)), true): Unit
      }
    }

  /** Sweep every date's staging dir (they are siblings of the table
    * root, `<path>.__dedup_staging_date_<d>`): one parent listing, then
    * the per-date recovery for each match. Readers of OTHER jobs' dates
    * call this — a crashed out-of-band compaction of date D must not
    * make D's rows silently vanish from a later join or incremental
    * dedup that scans the whole table.
    */
  def recoverAllSelfReplace(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    val parent = new Path(path).getParent
    if (parent == null || !f.exists(parent)) return
    val prefix = new Path(path).getName + ".__dedup_staging_date_"
    f.listStatus(parent).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(LocalDate.parse(n.stripPrefix(prefix))).toOption)
      .foreach(d => recoverSelfReplace(spark, path, d))
  }

  def withTableLocks[T](reads: Seq[String], writes: Seq[String])(body: => T): T =
    PathWarehouse.withTableLocks(reads, writes)(body)
}

object PathWarehouse {
  // Per-table read/write locks, global across Warehouse instances of one
  // JVM (two instances over the same root must still exclude). Readers
  // share (disjoint dates stay concurrent); commits exclude.
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

/** Minimal transactional table format (see [[Warehouse]] docs): per table
  *
  * {{{
  *   <path>/_graft_log/v<00000000000000000001>.txt   commit log (manifest deltas)
  *   <path>/_graft_data/<uuid>/__p_date=<date>/part-*.parquet
  * }}}
  *
  * Each log entry is a text manifest delta: `A <value> <relpath>` adds a
  * live file under its partition VALUE, `R <relpath>` retires one. The
  * live set at version v is the replay of entries 1..v. Data files are
  * immutable and single-partition by construction (writes re-partition
  * on a duplicated `__p_date` dir column, so the real `date` column
  * stays IN the data and each physical file belongs to exactly one
  * partition — the manifest prunes partitions without touching
  * footers). The value's GRAIN is the spec in force when the file was
  * written ([[setPartitionSpec]]): day `yyyy-MM-dd` by default, month
  * `yyyy-MM` after evolution — mixed generations coexist and each file
  * prunes under its own then-spec.
  *
  * Commit = write the delta to a temp name, then rename to the next
  * version number; the rename fails if the version exists (optimistic
  * concurrency) and the writer recomputes its remove-set and retries.
  * A crash before the rename leaves orphan data files that no manifest
  * references — invisible to readers, reclaimable by a vacuum pass
  * (listing `_graft_data` files absent from the live set; not needed for
  * correctness). Retired files likewise stay on disk for time travel /
  * vacuum, which is what makes [[deletePartition]] and the dedup rewrite
  * pure metadata operations.
  */
final class TxWarehouse(val root: String, checkpointEvery: Int = 100)
    extends Warehouse {
  import TxWarehouse._
  require(checkpointEvery > 0, "checkpointEvery must be positive")

  def tablePath(dataset: String, datatype: String): String =
    s"$root/$dataset/$datatype"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def parseInto(text: String, st0: TxState): TxState = {
    var live = st0.live
    var txns = st0.txns
    var stats = st0.stats
    var sizes = st0.sizes
    var blooms = st0.blooms
    var props = st0.props
    var schemaJson = st0.schemaJson
    var dvs = st0.dvs
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      if (line.startsWith("A ")) {
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        live += (rest.substring(sp + 1) -> rest.substring(0, sp))
      } else if (line.startsWith("R ")) {
        val rel = line.substring(2)
        live -= rel
        stats -= rel
        sizes -= rel
        blooms -= rel
        dvs -= rel
      } else if (line.startsWith("D ")) {
        // `D <payload> <rel>`: the file's DELETION VECTOR ([[FileDv]])
        // — sorted deleted row ordinals, applied at every read. Same
        // token-then-rel shape as `S`/`B`, last-one-wins per rel
        // (each commit re-encodes the full merged vector); `D - rel`
        // clears it (restore to a DV-free snapshot).
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        if (sp > 0) {
          val payload = rest.substring(0, sp)
          val rel = rest.substring(sp + 1)
          if (payload == "-") dvs -= rel else dvs += (rel -> payload)
        }
      } else if (line.startsWith("B ")) {
        // `B <payload> <rel>`: the file's bloom filter over the table's
        // bloom property column (FileBloom) — same token-then-rel shape
        // as `S`, same forward compat (unknown/absent = never pruned)
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        if (sp > 0) blooms += (rest.substring(sp + 1) -> rest.substring(0, sp))
      } else if (line.startsWith("P ")) {
        // `P <key> <value>`: table property, last-one-wins (bloom spec
        // lives here; both tokens are space-free by construction)
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        if (sp > 0) props += (rest.substring(0, sp) -> rest.substring(sp + 1))
      } else if (line.startsWith("T ")) {
        val Array(app, batch) = line.substring(2).split(' ')
        txns += (app -> math.max(batch.toLong, txns.getOrElse(app, -1L)))
      } else if (line.startsWith("S ")) {
        // `S <payload> <rel>`: payload first (it never contains spaces,
        // rel may). Unknown line types are skipped above — old readers
        // of a stats-bearing log would do the same, and stats-less logs
        // simply never prune.
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        if (sp > 0) stats += (rest.substring(sp + 1) -> rest.substring(0, sp))
      } else if (line.startsWith("F ")) {
        // `F <bytes> <rel>`: the file's length, so sizing decisions
        // (compaction's fragmentation screen) are manifest-only. Same
        // compat story as `S`: older logs lack the line and fall back
        // to a per-file status call.
        val rest = line.substring(2)
        val sp = rest.indexOf(' ')
        if (sp > 0) scala.util.Try(rest.substring(0, sp).toLong).toOption
          .foreach(len => sizes += (rest.substring(sp + 1) -> len))
      } else if (line.startsWith("H ")) {
        // `H <b64(schemaJson)>`: the table's cumulative merged schema as
        // of this commit; `H -` clears it (irreconcilable file schemas —
        // a mergeSchema read of such a table fails anyway). Last one
        // wins across the replay.
        val tok = line.substring(2)
        schemaJson =
          if (tok == "-") None
          else scala.util.Try(
            new String(java.util.Base64.getDecoder.decode(tok), UTF_8)).toOption
            // corrupt token: keep the last good schema rather than
            // silently clearing the evolution history — only an
            // explicit `H -` may clear
            .orElse(schemaJson)
      }
    }
    TxState(live, txns, stats, sizes, blooms, props, schemaJson, dvs)
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))

  /** The `H` manifest line for a commit adding files of schema `added`:
    * the cumulative merge with the table's previously recorded schema,
    * computed by the SAME `StructType.merge` Spark's own mergeSchema
    * parquet read uses (bridged via
    * [[org.apache.spark.sql.graftshim.SchemaBridge]]). The merge never
    * NARROWS: the recorded schema is a sticky SUPERSET of any
    * footer-merge of the currently-live files (Delta-style table
    * schema) — after deletePartition/overwritePartition retires the
    * only files carrying a column, the column stays recorded and reads
    * as null. Nullable-normalized because it serves as an EXPLICIT
    * read schema over evolved file sets where any column may be
    * null-filled (consumer: [[readWhere]]'s pruned-subset fallback).
    * An irreconcilable merge records `H -` (clears the schema):
    * readers fall back to footer merging, which fails the same way
    * only if the conflicting files are both still live.
    */
  private def schemaLines(prev: Option[String],
      added: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.graftshim.SchemaBridge
    import org.apache.spark.sql.types.{DataType, StructType}
    try {
      val merged = prev match {
        case Some(j) => SchemaBridge.merge(
          DataType.fromJson(j).asInstanceOf[StructType],
          SchemaBridge.asNullable(added))
        case None => SchemaBridge.asNullable(added)
      }
      Seq(s"H ${b64(merged.json)}")
    } catch { case scala.util.control.NonFatal(_) => Seq("H -") }
  }

  /** Log replay up to `upTo`: (latest version, live rel-file →
    * date-string, per-writer txn watermarks). (0, empty, empty) when the
    * table has no commits yet.
    *
    * Replay seeds from the newest CHECKPOINT at or below `upTo` (a full
    * state snapshot written every `checkpointEvery` commits) and applies
    * only the delta files after it — per-operation manifest cost is
    * O(checkpointEvery), not O(total commits), and log segments older
    * than the newest checkpoint can be archived away entirely. Without
    * this, a years-deep daily table would replay thousands of deltas on
    * every read.
    */
  /** Version-keyed replay cache. The log listing (one namenode/store
    * RPC) stays the per-call invalidation check — that is what keeps
    * multiple drivers coherent, since a concurrent commit surfaces as a
    * new version file in the listing — but the PARSE is paid once per
    * (path, version): published manifest files are immutable, so the
    * state at a version can never change, and [[TxState]] is built from
    * immutable maps, so sharing the cached value across threads is
    * safe. Without this, every read re-parses O(manifest bytes) — on a
    * bloom-carrying 800-file table that is ~100 MB of base64 per call
    * (measured 6 s per point probe in `graft.Scale100Probe`); with it
    * the same probe is the listing + one file open. Bounded LRU:
    * bloom-heavy states are large, so keep few. One contract: a log
    * dir DELETED out-of-band and re-created at the same path restarts
    * version numbers, which this instance's cache cannot see — use a
    * fresh TxWarehouse handle for a re-created table (manifest files
    * are otherwise immutable by design; no in-place mutation exists).
    */
  private val stateCache =
    new java.util.LinkedHashMap[(String, Long), TxState](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long), TxState]): Boolean =
        size() > 16
    }

  private def replay(spark: SparkSession, path: String,
      upTo: Long = Long.MaxValue): (Long, TxState) = {
    val f = fs(spark, path)
    val logDir = new Path(s"$path/$LogDir")
    if (!f.exists(logDir)) return (0L, TxState.empty)
    val names = f.listStatus(logDir).map(_.getPath.getName)
    def num(name: String) = name.substring(1, 21).toLong
    def readText(name: String): String = {
      val in = f.open(new Path(logDir, name))
      try new String(in.readAllBytes(), UTF_8) finally in.close()
    }
    val cpsDesc = names.filter(_.matches("c\\d{20}\\.txt"))
      .filter(num(_) <= upTo).sorted.reverse
    val allVersions = names.filter(_.matches("v\\d{20}\\.txt"))
      .filter(num(_) <= upTo).sorted
    // the version the LISTING claims; the parse below may resolve lower
    // if the tail file turns out to be a truncated in-flight write
    val listed = allVersions.lastOption.map(num)
      .getOrElse(cpsDesc.headOption.map(num).getOrElse(0L))
    // fast path: only states built from TERMINATED manifests are ever
    // cached, so a hit needs no per-file validation
    stateCache.synchronized(Option(stateCache.get((path, listed)))) match {
      case Some(cached) => (listed, cached)
      case None =>
        // Newest checkpoint whose snapshot is COMPLETE ([[isTerminated]]
        // — an unterminated checkpoint is a partially visible derived
        // write; its info is subsumed by an older checkpoint + deltas,
        // so fall back rather than trust it). Reading candidates costs
        // IO only on this cache-miss path, and checkpoint publishes are
        // atomic-visible on every registered scheme, so in practice the
        // first candidate wins.
        var cpName: Option[String] = None
        var cpText: String = ""
        val cpIt = cpsDesc.iterator
        while (cpName.isEmpty && cpIt.hasNext) {
          val c = cpIt.next()
          val t = readText(c)
          if (isTerminated(t)) { cpName = Some(c); cpText = t }
        }
        val cpVersion = cpName.map(num).getOrElse(0L)
        val versions = allVersions.filter(n => num(n) > cpVersion)
        // Incremental seed: state at a version is a deterministic left
        // fold over the commit sequence, so the newest cached
        // predecessor in [cpVersion, listed) is a valid starting
        // point — a polling reader of a hot table then folds only the
        // NEW deltas per call, O(delta) instead of O(manifest).
        val seed = stateCache.synchronized {
          import scala.jdk.CollectionConverters._
          stateCache.entrySet().asScala.iterator
            .filter { e =>
              e.getKey._1 == path && e.getKey._2 >= cpVersion &&
                e.getKey._2 < listed
            }
            .map(e => (e.getKey._2, e.getValue))
            .reduceOption((a, b) => if (a._1 >= b._1) a else b)
        }
        val (toParse, st0, v0) = seed match {
          case Some((cv, s)) => (versions.filter(num(_) > cv).toSeq, s, cv)
          case None =>
            (versions.toSeq,
              if (cpName.isDefined) parseInto(cpText, TxState.empty)
              else TxState.empty,
              cpVersion)
        }
        var st = st0
        var v = v0
        toParse.foreach { name =>
          val text = readText(name)
          if (isTerminated(text)) { st = parseInto(text, st); v = num(name) }
          else if (num(name) == listed) {
            // truncated TAIL: an in-flight commit whose bytes are not
            // all visible yet — NOT a committed state. Resolve to the
            // last terminated version; the cache below is keyed at the
            // resolved version, so a poisoned (path, listed) entry can
            // never exist and the next call re-reads the tail until the
            // terminator lands. (The round-12 lost-partition bug was
            // exactly a truncated tail parsed as committed and cached.)
          } else {
            // truncated NON-tail with later versions listed: later
            // commits can only exist once this version was terminated
            // and immutable (their writers would otherwise have
            // resolved below it and retried THIS number), so a still-
            // truncated read here means the file was never a real
            // commit (a squatter / dead winner's leavings). Skip its
            // content but consume its number, exactly as the writers
            // that committed past it did.
            v = num(name)
          }
        }
        if (v > 0L) stateCache.synchronized(stateCache.put((path, v), st)): Unit
        (v, st)
    }
  }

  /** Write the full-state checkpoint for `version`. Derived data — but
    * it must still appear ATOMICALLY: readers trust any listed
    * checkpoint as a complete state seed, so a direct overwrite-create
    * would expose a partial/empty file mid-write and a concurrent
    * replay would silently lose live files. Same tmp-then-exclusive-
    * publish discipline as [[tryCommit]]; losing the publish race to
    * another writer's identical checkpoint is a no-op.
    */
  private def writeCheckpoint(f: FileSystem, path: String, version: Long,
      st: TxState): Unit = {
    val lines = st.live.toSeq.sorted.map { case (rel, d) => s"A $d $rel" } ++
      st.live.keys.toSeq.sorted.flatMap(rel =>
        st.stats.get(rel).map(p => s"S $p $rel")) ++
      st.live.keys.toSeq.sorted.flatMap(rel =>
        st.sizes.get(rel).map(len => s"F $len $rel")) ++
      st.live.keys.toSeq.sorted.flatMap(rel =>
        st.blooms.get(rel).map(b => s"B $b $rel")) ++
      st.live.keys.toSeq.sorted.flatMap(rel =>
        st.dvs.get(rel).map(d => s"D $d $rel")) ++
      st.props.toSeq.sorted.map { case (k, v) => s"P $k $v" } ++
      st.schemaJson.map(j => s"H ${b64(j)}").toSeq ++
      st.txns.toSeq.sorted.map { case (app, b) => s"T $app $b" }
    tryCommit(f, path, new Path(s"$path/$LogDir", f"c$version%020d.txt"),
      lines): Unit
  }

  private def maybeCheckpoint(spark: SparkSession, path: String,
      version: Long): Unit =
    if (version % checkpointEvery == 0) {
      val (v, st) = replay(spark, path, upTo = version)
      if (v == version) writeCheckpoint(fs(spark, path), path, version, st)
    }

  /** (latest version ≤ upTo, live rel-file → date-string at that
    * version). (0, empty) when the table has no commits yet.
    */
  private def state(spark: SparkSession, path: String,
      upTo: Long = Long.MaxValue): (Long, Map[String, String]) = {
    val (v, st) = replay(spark, path, upTo)
    (v, st.live)
  }

  /** Highest batch id committed under `appId`, or -1. */
  def lastTxn(spark: SparkSession, path: String, appId: String): Long =
    replay(spark, path)._2.txns.getOrElse(appId, -1L)

  /** Idempotent append for streaming micro-batches (the txn-marker
    * pattern a Delta sink uses): the commit carries `T appId batchId`,
    * and a batch at-or-below the app's committed watermark is a NO-OP —
    * so a restarted query replaying its last batch cannot double-append,
    * turning the engine's at-least-once replay into exactly-once table
    * contents. Returns false when skipped. The skip is decided against
    * the same manifest version the commit races on, so a concurrent
    * duplicate writer loses the version race, re-reads, and skips.
    * Files written by a skipped attempt are orphans for [[vacuum]].
    */
  def appendTxn(spark: SparkSession, df: DataFrame, path: String,
      appId: String, batchId: Long): Boolean = {
    require(!appId.exists(_.isWhitespace), "appId must not contain whitespace")
    if (lastTxn(spark, path, appId) >= batchId) return false
    val (adds, _) = writeData(spark, df, path)
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      if (st.txns.getOrElse(appId, -1L) >= batchId) return false
      // an empty micro-batch adds no files: recording its schema would
      // let the cumulative schema gain columns that exist in no
      // committed file (commitRetry guards the same case)
      val lines = addLines(adds) ++
        (if (adds.nonEmpty) schemaLines(st.schemaJson, df.schema) else Nil) :+
        s"T $appId $batchId"
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1); return true
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** Latest committed version (0 = no commits yet). */
  def currentVersion(spark: SparkSession, path: String): Long =
    state(spark, path)._1

  /** Time travel: the table exactly as of `version` (immutable data
    * files + replayable log make this free). Fails if the version's
    * files have been [[vacuum]]ed away — retention bounds history depth.
    */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val (v, live) = state(spark, path, upTo = version)
    require(v == version, s"no version $version of $path (latest ≤ is $v)")
    readFiles(spark, path, live.keys, upTo = version)
  }

  /** Version committed at-or-before `ts` (epoch millis) — the Delta
    * `AS OF TIMESTAMP` resolution, from the commit files' modification
    * times. Commit mtimes are assigned at publish and are monotone in
    * practice (same filesystem clock as the atomic create); a publish
    * that lost its race never owns a version file, so every listed
    * `v*.txt` mtime IS its commit time. Versions older than the log
    * truncation horizon resolve only if `ts` is at-or-after the oldest
    * surviving checkpoint's time. None when `ts` predates the table.
    */
  def versionAt(spark: SparkSession, path: String, ts: Long): Option[Long] = {
    val f = fs(spark, path)
    val logDir = new Path(s"$path/$LogDir")
    if (!f.exists(logDir)) return None
    val commits = f.listStatus(logDir)
      .filter(s => s.getPath.getName.matches("[vc]\\d{20}\\.txt"))
      .map(s => (s.getPath.getName.substring(1, 21).toLong,
        s.getModificationTime))
    // a checkpoint is derived later than its version's commit: for a
    // version present as both, keep the EARLIEST mtime (the commit's)
    val byV = commits.groupBy(_._1).view.mapValues(_.map(_._2).min).toSeq
    val eligible = byV.filter(_._2 <= ts).map(_._1)
    if (eligible.isEmpty) None else Some(eligible.max)
  }

  /** Time travel by wall clock: the table as of the last version
    * committed at-or-before `ts` (epoch millis).
    */
  def readAsOf(spark: SparkSession, path: String, ts: Long): DataFrame = {
    val v = versionAt(spark, path, ts).getOrElse(
      throw new IllegalArgumentException(
        s"no version of $path committed at or before $ts"))
    readAt(spark, path, v)
  }

  /** RESTORE TABLE to `version` — the WRITE companion of [[readAt]]:
    * one metadata-only commit whose live file set (plus per-file
    * stats/sizes/blooms and the recorded schema) becomes exactly the
    * target snapshot's. No data moves: files are immutable, so undoing
    * k versions of damage (a bad merge, an over-eager deleteWhere, a
    * wrong-day overwrite) costs one manifest write regardless of table
    * size — at 100 TB THAT asymmetry is the whole point of keeping the
    * log.
    *
    * History is preserved, not rewritten: the restore is a NEW version
    * on top, so [[readAt]] still sees the undone versions,
    * [[rowDiff]]/[[readChangesBetween]] across the restore commit emit
    * the expected inserts (resurrected rows) and deletes (undone rows),
    * and a second restore can undo the first.
    *
    * Deliberately NOT rolled back: table properties (governance knobs
    * like requirePartitionFilter or CHECK constraints must not be
    * silently re-loosened by a data rollback) and streaming txn
    * watermarks (regressing them would re-admit already-committed
    * micro-batches as duplicates). Both match Delta's RESTORE contract.
    * Consequence for zero-rewrite DDL: since the column mapping is a
    * property, restoring below a rename/drop keeps the POST-rename
    * logical view — the recorded schema is then not rolled back either
    * (data rewinds; names stay current; `readAt` shows the old names).
    *
    * Fails if any to-be-resurrected file was [[vacuum]]ed away —
    * retention bounds restore depth exactly as it bounds [[readAt]].
    */
  def restoreTo(spark: SparkSession, path: String, version: Long): Unit = {
    val f = fs(spark, path)
    val (vt, target) = replay(spark, path, upTo = version)
    require(vt == version,
      s"no version $version of $path (latest ≤ is $vt)")
    // resurrection needs the physical files: verify before committing
    val (_, liveNow0) = replay(spark, path)
    val toAdd0 = target.live.keySet -- liveNow0.live.keySet
    val missing = toAdd0.filterNot(r => f.exists(new Path(s"$path/$r")))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"cannot restore $path to v$version: ${missing.size} file(s) " +
          s"vacuumed away (first: ${missing.head})")
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, cur) = replay(spark, path)
      val toAdd = (target.live.keySet -- cur.live.keySet).toSeq.sorted
      val toRemove = (cur.live.keySet -- target.live.keySet).toSeq.sorted
      // table properties are deliberately NOT rolled back (see scaladoc)
      // — and that includes the DdlOps column mapping. Rolling the
      // recorded schema below a zero-rewrite rename/drop would therefore
      // make the H line name columns the still-active mapping renames or
      // tombstones (recorded schema and read view disagreeing). When any
      // ddl op postdates the restore target, keep the CURRENT schemaJson:
      // the restore rewinds the DATA to v`version` but presents it under
      // the post-rename logical view (the view every current read uses;
      // readAt(version) remains the way to see the old names).
      val ddlAfterTarget = DdlOps
        .decode(cur.props.get(DdlOps.Key)).exists(_.v > version)
      val schemaLine =
        if (ddlAfterTarget || target.schemaJson == cur.schemaJson) Nil
        else target.schemaJson match {
          case Some(j) => Seq(s"H ${b64(j)}")
          case None => Seq("H -")
        }
      // deletion vectors are DATA state, not a property: files live in
      // both snapshots must carry the TARGET's vector (or none) after
      // the restore, or the rollback silently keeps later deletes
      val dvLines = (target.live.keySet & cur.live.keySet).toSeq.sorted
        .flatMap { rel =>
          (target.dvs.get(rel), cur.dvs.get(rel)) match {
            case (t, c) if t == c => Nil
            case (Some(t), _) => Seq(s"D $t $rel")
            case (None, Some(_)) => Seq(s"D - $rel")
          }
        }
      if (toAdd.isEmpty && toRemove.isEmpty && schemaLine.isEmpty &&
        dvLines.isEmpty) return
      val lines = toAdd.flatMap { rel =>
        Seq(s"A ${target.live(rel)} $rel") ++
          target.stats.get(rel).map(s => s"S $s $rel") ++
          target.sizes.get(rel).map(n => s"F $n $rel") ++
          target.blooms.get(rel).map(b => s"B $b $rel") ++
          target.dvs.get(rel).map(d => s"D $d $rel")
      } ++ toRemove.map(r => s"R $r") ++ dvLines ++ schemaLine
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1)
        return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** Zero-copy SHALLOW CLONE: create `destPath` as a new table whose
    * first commit references the SOURCE's data files (relative
    * traversal entries — no byte is copied), at the source's latest
    * version or any time-travelable one. The clone is a real table
    * from that moment on: writes, DML, compaction land in its OWN data
    * dir (a rewrite simply retires the source-referenced entries from
    * the clone's live set), so "fork the 100 TB table, experiment,
    * throw it away" costs one manifest write — the dev/test workflow
    * Delta's SHALLOW CLONE exists for, and the natural companion of
    * [[restoreTo]] (restore rewinds in place; clone forks).
    *
    * Carried over: per-file stats/sizes/blooms (pruning works on the
    * clone immediately), the recorded schema, and ALL table properties
    * — including the ddl column mapping (data files carry physical
    * names; the clone must present the same logical view), bloom
    * specs, constraints, and requirePartitionFilter. NOT carried:
    * streaming txn watermarks — the clone is a new sink; inheriting
    * the source's batch-id fences would silently skip the first
    * micro-batches written to it.
    *
    * The shared-bytes hazard is the same as every shallow-clone
    * implementation's and is one-directional: [[vacuum]] on the CLONE
    * only walks the clone's directory (source bytes are unreachable by
    * construction), but vacuum on the SOURCE does not know about
    * clone references — keep source retention ≥ clone lifetime, or
    * compact the clone (rewriting makes it self-contained).
    *
    * Local/HDFS path layout (relative traversal between the two table
    * dirs); an object-store deployment would store absolute URIs here.
    *
    * @return the source version the clone was taken at
    */
  def cloneTo(spark: SparkSession, srcPath: String, destPath: String,
      version: Long = -1L): Long = {
    val f = fs(spark, destPath)
    require(replay(spark, destPath)._1 == 0L,
      s"clone destination already has commits: $destPath")
    val (v, st) =
      if (version < 0L) replay(spark, srcPath)
      else {
        val r = replay(spark, srcPath, upTo = version)
        require(r._1 == version,
          s"no version $version of $srcPath (latest ≤ is ${r._1})")
        r
      }
    require(v > 0L, s"cannot clone an uncommitted table: $srcPath")
    val prefix = java.nio.file.Paths.get(destPath).normalize()
      .relativize(java.nio.file.Paths.get(srcPath).normalize()).toString
    def reref(rel: String): String = s"$prefix/$rel"
    val lines =
      st.live.toSeq.sortBy(_._1).flatMap { case (rel, d) =>
        Seq(s"A $d ${reref(rel)}") ++
          st.stats.get(rel).map(s => s"S $s ${reref(rel)}") ++
          st.sizes.get(rel).map(n => s"F $n ${reref(rel)}") ++
          st.blooms.get(rel).map(b => s"B $b ${reref(rel)}") ++
          st.dvs.get(rel).map(dd => s"D $dd ${reref(rel)}")
      } ++
        st.props.toSeq.sortBy(_._1).map { case (k, vv) => s"P $k $vv" } ++
        st.schemaJson.map(j => s"H ${b64(j)}").toSeq
    if (!tryCommit(f, destPath, 1L, lines))
      throw new ConcurrentCommitException(
        s"clone lost the v1 race on $destPath — another writer created it")
    v
  }

  /** Incremental consumption (the change-data-feed the manifest gives
    * for free): the rows live at `toVersion` that were NOT live at
    * `fromVersion` — i.e. every file that appends/replaces in the range
    * (fromVersion, toVersion] added and that survived to `toVersion`.
    * A downstream consumer (export, index build, sync) polls
    * [[currentVersion]], reads only this difference, and remembers the
    * new version — per-increment cost is O(new files), never a rescan
    * of the table; at archive scale THIS is how anything consumes a
    * continuously-loaded 100 TB table. `fromVersion` 0 is the full
    * table at `toVersion`. Rows RETIRED in the range (dedup rewrites,
    * deletes) are simply absent — consumers needing retraction
    * semantics diff the two [[readAt]] snapshots instead.
    *
    * Both endpoints must still be resolvable from the log
    * ([[truncateLog]] bounds how far back `fromVersion` may reach —
    * same horizon as [[readAt]]).
    */
  def readChangesBetween(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val (stFrom, stTo) = statesAt(spark, path, fromVersion, toVersion)
    // added files read under TO-version vectors (rows deleted again
    // later must still appear to a consumer of THIS range; the later
    // DV surfaces as a dvChanged delete in the next range's rowDiff)
    readFilesDv(spark, path,
      (stTo.live.keySet -- stFrom.live.keySet).toSeq.sorted, stTo.dvs,
      ddlMapping(replay(spark, path)._2))
  }

  /** The RETRACTION-aware dual of [[readChangesBetween]]: both sides of
    * the live-set diff, tagged with a `_change_type` column — `insert`
    * for rows of files live at `toVersion` but not `fromVersion`,
    * `delete` for rows of files retired in the range (dedup rewrites,
    * partition deletes). Still O(changed files) — the manifest diff
    * decides which files to read; no snapshot comparison ever scans
    * unchanged data.
    *
    * File-granular by construction: a rewrite that preserves some row
    * content (compaction, a dedup keeping most rows) emits those rows
    * as BOTH delete and insert. The manifest cannot know row identity —
    * a consumer needing net row changes cancels matching delete/insert
    * pairs itself (an anti-join on its own key), paying that compare
    * only over the changed files this method already bounds.
    */
  def diffSnapshots(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val (stFrom, stTo) = statesAt(spark, path, fromVersion, toVersion)
    val dvChanged = dvChangedBetween(stFrom, stTo)
    // a file whose deletion vector changed is a changed file: its rows
    // appear on BOTH sides, each under that side's vector — survivors
    // cancel in the consumer's own key diff exactly like a rewrite's
    val added = (stTo.live.keySet -- stFrom.live.keySet).toSeq.sorted ++
      dvChanged
    val removed = (stFrom.live.keySet -- stTo.live.keySet).toSeq.sorted ++
      dvChanged
    val mapping = ddlMapping(replay(spark, path)._2)
    def side(rels: Seq[String], tag: String, dvs: Map[String, String]):
        Option[DataFrame] =
      if (rels.isEmpty) None
      else Some(readFilesDv(spark, path, rels, dvs, mapping)
        .withColumn("_change_type", lit(tag)))
    (side(added, "insert", stTo.dvs), side(removed, "delete", stFrom.dvs)) match {
      case (Some(a), Some(d)) => a.unionByName(d, allowMissingColumns = true)
      case (Some(a), None) => a
      case (None, Some(d)) => d
      case (None, None) => spark.emptyDataFrame
    }
  }

  /** ROW-granular snapshot diff — the keyed complement of
    * [[diffSnapshots]]: classify each key as insert / delete / update
    * between two versions. Cost is O(CHURN), not O(table): a row can
    * only differ if its file changed, so both join sides read ONLY the
    * files retired/added between the versions — the survivors a rewrite
    * re-landed appear on both sides with equal values and drop out of
    * the diff. Change detection compares the non-key columns
    * STRING-canonicalized (null-safe struct equality across evolved
    * schemas, absent columns as null), so a schema-evolution rewrite
    * that merely adds an all-null column does not flag every row.
    * Output: key columns + `_change_type` ('insert'/'delete'/'update'),
    * update rows counted once. Assumes keys unique per version (the
    * [[mergeInto]] invariant).
    */
  def rowDiff(spark: SparkSession, path: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rowDiff needs at least one key column")
    val (stFrom, stTo) = statesAt(spark, path, fromVersion, toVersion)
    val liveFrom = stFrom.live
    val liveTo = stTo.live
    val dvChanged = dvChangedBetween(stFrom, stTo)
    // DV-changed files enter both sides under their side's vector: a
    // newly-vectored row keys only the FROM side -> 'delete', exactly
    // the retraction a merge-on-read delete is
    val added = (liveTo.keySet -- liveFrom.keySet).toSeq.sorted ++ dvChanged
    val removed = (liveFrom.keySet -- liveTo.keySet).toSeq.sorted ++ dvChanged
    if (added.isEmpty && removed.isEmpty) {
      // honor the documented output schema even when no files changed:
      // key columns typed as in the table (falling back to string ONLY
      // on an empty table, where no file carries a schema) +
      // _change_type, so downstream select/groupBy on _change_type
      // works in the no-churn case exactly as in the churn case. On a
      // NON-empty table the select analyzes for real — a misspelled key
      // column raises the same AnalysisException the churn path would,
      // instead of silently yielding a string-typed empty frame.
      val keyed =
        if (liveTo.isEmpty) {
          val schema = org.apache.spark.sql.types.StructType(keyCols.map(
            org.apache.spark.sql.types.StructField(_,
              org.apache.spark.sql.types.StringType)))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        } else readAt(spark, path, toVersion).select(keyCols.map(col): _*)
      return keyed.withColumn("_change_type", lit(null).cast("string"))
        .limit(0)
    }
    val mapping = ddlMapping(replay(spark, path)._2)
    val dfA = if (removed.isEmpty) None
      else Some(readFilesDv(spark, path, removed, stFrom.dvs, mapping))
    val dfB = if (added.isEmpty) None
      else Some(readFilesDv(spark, path, added, stTo.dvs, mapping))
    // the comparison struct spans the UNION of both sides' non-key
    // columns (absent = null), so a rewrite that merely ADDS an
    // all-null evolved column compares equal on every survivor instead
    // of flagging the whole file as updates
    val others = (dfA.toSeq ++ dfB.toSeq).flatMap(_.columns).distinct
      .filterNot(c => keyCols.exists(_.equalsIgnoreCase(c))).sorted
    def sided(df: DataFrame, tag: String): DataFrame =
      df.select(keyCols.map(col) :+
        struct(others.map(c =>
          (if (df.columns.contains(c)) col(s"`$c`")
           else lit(null)).cast("string").as(c)): _*)
          .as(s"__v_$tag"): _*)
    (dfA.map(sided(_, "a")), dfB.map(sided(_, "b"))) match {
      case (Some(a), Some(b)) =>
        a.join(b, keyCols, "full_outer")
          .withColumn("_change_type",
            when(col("__v_a").isNull, lit("insert"))
              .when(col("__v_b").isNull, lit("delete"))
              .when(!(col("__v_a") <=> col("__v_b")), lit("update")))
          .filter(col("_change_type").isNotNull)
          .select(keyCols.map(col) :+ col("_change_type"): _*)
      case (Some(a), None) =>
        a.select(keyCols.map(col): _*)
          .withColumn("_change_type", lit("delete"))
      case (None, Some(b)) =>
        b.select(keyCols.map(col): _*)
          .withColumn("_change_type", lit("insert"))
      case (None, None) => spark.emptyDataFrame
    }
  }

  private def liveSetsAt(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long):
      (Map[String, String], Map[String, String]) = {
    val (a, b) = statesAt(spark, path, fromVersion, toVersion)
    (a.live, b.live)
  }

  private def statesAt(spark: SparkSession, path: String,
      fromVersion: Long, toVersion: Long): (TxState, TxState) = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion > toVersion $toVersion")
    val stFrom: TxState =
      if (fromVersion == 0L) TxState.empty
      else {
        val (vF, st) = replay(spark, path, upTo = fromVersion)
        require(vF == fromVersion,
          s"no version $fromVersion of $path (latest ≤ is $vF)")
        st
      }
    val (vT, stTo) = replay(spark, path, upTo = toVersion)
    require(vT == toVersion,
      s"no version $toVersion of $path (latest ≤ is $vT)")
    (stFrom, stTo)
  }

  /** Files live at BOTH versions whose deletion vector changed in the
    * range — merge-on-read's "changed file" for the CDC surfaces: no
    * manifest membership moved, but the file's LOGICAL rows did.
    */
  private def dvChangedBetween(stFrom: TxState, stTo: TxState): Seq[String] =
    (stFrom.live.keySet & stTo.live.keySet).toSeq.sorted
      .filter(rel => stFrom.dvs.get(rel) != stTo.dvs.get(rel))

  /** Reclaim storage: delete data files that (a) are not referenced by
    * any of the newest `keepVersions` manifests — retired by rewrites/
    * deletes, or orphaned by crashed writers — and (b) are older than
    * `minAgeMillis`. The age guard is what makes vacuum safe to run
    * concurrently with writers: an in-flight writer's files are
    * unreferenced by ANY manifest until its commit, so only files old
    * enough that no live write can still own them are eligible (same
    * retention discipline as Delta's VACUUM). Time travel reaches at
    * most `keepVersions` back after a vacuum. Returns deleted file count.
    */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1,
      minAgeMillis: Long = 7L * 24 * 3600 * 1000): Long = {
    val f = fs(spark, path)
    val (latest, _) = state(spark, path)
    if (latest == 0L) return 0L
    val retained = (math.max(1L, latest - keepVersions + 1) to latest)
      .flatMap(v => state(spark, path, upTo = v)._2.keys).toSet
    val dataDir = new Path(s"$path/$DataDir")
    if (!f.exists(dataDir)) return 0L
    val prefix = f.makeQualified(new Path(path)).toString + "/"
    val cutoff = System.currentTimeMillis() - minAgeMillis
    // Manual walk instead of listFiles(recursive): vacuum RACES live
    // writers by design (at archive scale it always does), and a
    // recursive LocatedFileStatus listing both descends into their
    // `_temporary` task dirs (whose entries vanish at task commit —
    // on a local scheme the eager permission load then throws on the
    // gone file and kills the sweep) and pays an eager stat per file.
    // Skipping `_temporary` subtrees is also the correctness-polite
    // choice: their files belong to an in-flight write no manifest
    // references yet — the age guard is what protects them today, the
    // skip makes it structural. Per-dir listings tolerate vanishing
    // dirs (the writer committed/aborted mid-sweep; next vacuum
    // converges).
    var deleted = 0L
    val stack = scala.collection.mutable.Stack(dataDir)
    while (stack.nonEmpty) {
      val d = stack.pop()
      val entries =
        try f.listStatus(d)
        catch { case _: java.io.FileNotFoundException =>
          Array.empty[org.apache.hadoop.fs.FileStatus] }
      entries.foreach { st =>
        if (st.isDirectory) {
          if (st.getPath.getName != "_temporary") stack.push(st.getPath)
        } else {
          val rel = st.getPath.toString.stripPrefix(prefix)
          if (!retained.contains(rel) && st.getModificationTime < cutoff) {
            if (f.delete(st.getPath, false)) deleted += 1
          }
        }
      }
    }
    deleted
  }

  /** Bound the commit log (the archival [[replay]]'s scaladoc promises):
    * pick the truncation horizon H = the NEWEST checkpoint that (a) is
    * older than `minAgeMillis` and (b) still leaves `keepCheckpoints`
    * checkpoints at or above it, then delete every delta segment at or
    * below H (their state is subsumed by H's full snapshot) and every
    * checkpoint below H. Without this, `_graft_log` grows one file per
    * commit forever — bounded REPLAY cost (checkpoints) but unbounded
    * directory size, an object-store LIST cost at streaming-sink commit
    * rates (the reference's analog is its bounded tracker snapshots,
    * tracker/tracker.go:189-204).
    *
    * The age guard is the concurrent-reader safety margin, same
    * discipline as [[vacuum]]: a replay that LISTED the log before H
    * existed may still be reading pre-H deltas; once H has been visible
    * for the retention window, any new replay seeds from a checkpoint
    * ≥ H and never opens them. After truncation [[readAt]] works for
    * every version ≥ the oldest retained checkpoint and fails below it
    * with the clean "no version" message HistoryTool degrades on.
    * Also reclaims aged `.put-*`/`.tmp-*` orphans left in the log dir
    * by writers that crashed between staging and publish (see the
    * body comment). Returns deleted file count.
    */
  def truncateLog(spark: SparkSession, path: String, keepCheckpoints: Int = 1,
      minAgeMillis: Long = 7L * 24 * 3600 * 1000): Long = {
    require(keepCheckpoints >= 1, "keepCheckpoints must be >= 1")
    val f = fs(spark, path)
    val logDir = new Path(s"$path/$LogDir")
    if (!f.exists(logDir)) return 0L
    val sts = f.listStatus(logDir).filter(_.isFile)
    val cutoff = System.currentTimeMillis() - minAgeMillis
    // ORPHAN RECLAMATION: a commit attempt that dies before publishing
    // leaves its `.tmp-<uuid>` payload, and a conditional-put winner
    // that dies between staging and rename leaves `.put-<uuid>` — both
    // invisible to replay (the version regex never matches them) but
    // accreted unboundedly by a crash-prone fleet. Age-delete them
    // under the same retention guard as data [[vacuum]]: a LIVE publish
    // owns its stage/tmp file for the duration of one copy (seconds),
    // so a file older than the retention window can only belong to a
    // crashed writer — never an in-flight commit.
    var deleted = 0L
    sts.foreach { st =>
      val n = st.getPath.getName
      if ((n.startsWith(".put-") || n.startsWith(".tmp-")) &&
          st.getModificationTime < cutoff &&
          f.delete(st.getPath, false)) deleted += 1
    }
    def num(name: String) = name.substring(1, 21).toLong
    val cps = sts.filter(_.getPath.getName.matches("c\\d{20}\\.txt"))
    if (cps.isEmpty) return deleted
    val cpNums = cps.map(st => num(st.getPath.getName)).sorted
    val aged = cps.filter(_.getModificationTime < cutoff)
      .map(st => num(st.getPath.getName)).toSet
    cpNums.filter(v =>
      aged.contains(v) && cpNums.count(_ >= v) >= keepCheckpoints)
      .lastOption match {
      case None => deleted
      case Some(horizon) =>
        sts.foreach { st =>
          val n = st.getPath.getName
          val eligible =
            (n.matches("v\\d{20}\\.txt") && num(n) <= horizon) ||
              (n.matches("c\\d{20}\\.txt") && num(n) < horizon)
          if (eligible && f.delete(st.getPath, false)) deleted += 1
        }
        deleted
    }
  }

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(s"$path/$LogDir"))

  /** Partition dates from the manifest — O(checkpoint) replay, no data
    * or footer reads.
    */
  def dates(spark: SparkSession, path: String): Set[LocalDate] =
    state(spark, path)._2.values.toSet
      .flatMap((d: String) => parseGrain(d))

  /** Manifest value → representative date: day values parse directly,
    * month-generation values (spec evolution) map to the month's first
    * day.
    */
  private def parseGrain(d: String): Option[LocalDate] =
    scala.util.Try(LocalDate.parse(d)).toOption
      .orElse(scala.util.Try(java.time.YearMonth.parse(d).atDay(1)).toOption)

  /** EXACT row count from the manifest alone — each live file's `S`
    * payload records its row count, so COUNT(*) is an O(checkpoint)
    * metadata read with no data or footer access (the archive-scale
    * answer to the monitor's detail stats and any "how big is this
    * table" probe). None when any live file lacks a stats payload
    * (pre-stats commits, unreadable footers) — callers then pay the
    * scan; immutable files mean the two can never disagree.
    */
  def fastRowCount(spark: SparkSession, path: String): Option[Long] = {
    val st = replay(spark, path)._2
    // keys is a SET — map to a Seq first or equal per-file counts
    // collapse before the sum
    // merge-on-read: a file's logical rows = footer rows minus its
    // deletion-vector cardinality — still exact, still metadata-only
    val counts = st.live.keys.toSeq.map(rel =>
      st.stats.get(rel).flatMap(FileStats.decode).map(_.rows -
        st.dvs.get(rel).map(FileDv.cardinality).getOrElse(0L)))
    if (counts.exists(_.isEmpty)) None
    else Some(counts.flatten.sum)
  }

  /** Per-partition exact row counts, manifest-only; None under the same
    * any-file-without-stats condition as [[fastRowCount]] — and ALSO
    * None when any live file's manifest date string fails to parse:
    * silently dropping such a file would make the per-partition sums
    * disagree with [[fastRowCount]]'s total without any signal, so an
    * unparsable date degrades the whole fast path to "recount".
    */
  def fastPartitionRowCounts(spark: SparkSession,
      path: String): Option[Map[LocalDate, Long]] = {
    val st = replay(spark, path)._2
    val rows = st.live.toSeq.map { case (rel, d) =>
      (scala.util.Try(LocalDate.parse(d)).toOption,
        st.stats.get(rel).flatMap(FileStats.decode).map(_.rows -
          st.dvs.get(rel).map(FileDv.cardinality).getOrElse(0L)))
    }
    if (rows.exists(r => r._1.isEmpty || r._2.isEmpty)) None
    else Some(rows.collect { case (Some(d), Some(n)) => (d, n) }
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum })
  }

  /** Manifest-only exact `count(*)`, `count(col)`, `min(col)`,
    * `max(col)` for a LONG-DOMAIN column (ints/longs/dates — the 'l'
    * stats tag, whose per-file footer min/max are exact values, unlike
    * string stats which parquet may truncate to bounds) — aggregate
    * pushdown all the way to METADATA: the answer costs one manifest
    * replay, zero file opens, at any table size. This is the 100 TB
    * dual of [[fastRowCount]]: "what key range does this table span"
    * is a planner/ops question asked constantly and answerable for
    * free, because every commit already recorded the footer stats.
    *
    * Soundness rules (any violation degrades to None = pay the scan,
    * never a wrong answer):
    *  - every live file must carry a stats payload;
    *  - a file whose payload lacks the column contributes nothing (the
    *    column is absent from that file's schema → all-null under
    *    mergeSchema);
    *  - a file with the column tagged non-'l' → None (not exact);
    *  - a file with the column but no min/max must be provably
    *    all-null (nulls == rows), else None;
    *  - null counts must be known (≥ 0) to answer `nonNull`.
    *
    * @return rows = count(*), nonNull = count(col), min/max = None when
    *         the column holds no non-null value in any live file
    */
  def fastColumnStats(spark: SparkSession, path: String,
      column: String): Option[TxWarehouse.FastColumnStats] = {
    val st = replay(spark, path)._2
    // merge-on-read: a deletion vector invalidates the footer's
    // min/max/null proof (the extreme row may be the deleted one) —
    // degrade to the scan, never answer from stale stats
    if (st.live.keys.exists(st.dvs.contains)) return None
    // `column` is the LOGICAL name; stats payloads record PHYSICAL
    // names (zero-rewrite rename never touches footers), so resolve
    // through the ddl mapping like every read does. A tombstoned
    // (dropped) name answers None, same as reading it would fail.
    val ops = DdlOps.decode(st.props.get(DdlOps.Key))
    val m = DdlOps.mappingAt(ops, Long.MaxValue)
    // a tombstoned column must answer None like reading it would fail;
    // drop ops record the PHYSICAL name, so replay the chain to learn
    // what each drop's LOGICAL name was at drop time (rename a→b then
    // drop b tombstones physical "a" — the user-facing dead name is "b")
    var byPhysical = Map.empty[String, String]
    var droppedLogical = Set.empty[String]
    ops.sortBy(_.v).foreach {
      case DdlOps.Op(_, "rename", p, l) => byPhysical += (p -> l)
      case DdlOps.Op(_, "drop", p, _) =>
        droppedLogical += byPhysical.getOrElse(p, p)
        byPhysical -= p
      case _ => ()
    }
    if (droppedLogical.contains(column)) return None
    val key = m.toPhysical.getOrElse(column, column)
      .toLowerCase(java.util.Locale.ROOT)
    // a name that exists NOWHERE (typo, never-written column) must
    // answer None, not a confident all-null: resolve against the
    // recorded schema first; the absent-from-SOME-files all-null rule
    // below is only for schema-evolved columns that exist in the schema
    // but predate some files. Without a recorded schema, require the
    // physical key in at least one stats payload.
    val inSchema = st.schemaJson.exists(j =>
      scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(j))
        .toOption.collect { case s: org.apache.spark.sql.types.StructType =>
          s.fieldNames.exists(_.equalsIgnoreCase(column))
        }.getOrElse(false))
    val inAnyStats = st.live.keys.exists(rel =>
      st.stats.get(rel).flatMap(FileStats.decode)
        .exists(_.cols.contains(key)))
    if (!inSchema && !inAnyStats) return None
    val perFile = st.live.keys.toSeq.map(rel =>
      st.stats.get(rel).flatMap(FileStats.decode).flatMap { p =>
        p.cols.get(key) match {
          case None => // column absent from this file: all-null here
            Some((p.rows, 0L, None: Option[Long], None: Option[Long]))
          case Some(c) if c.tag == 'l' && c.nulls >= 0 =>
            (c.min.flatMap(s => scala.util.Try(s.toLong).toOption),
              c.max.flatMap(s => scala.util.Try(s.toLong).toOption)) match {
              case (Some(mn), Some(mx)) =>
                Some((p.rows, p.rows - c.nulls, Some(mn), Some(mx)))
              case _ if c.nulls == p.rows =>
                Some((p.rows, 0L, None, None))
              case _ => None
            }
          case _ => None
        }
      })
    if (perFile.exists(_.isEmpty)) None
    else {
      val fs = perFile.flatten
      val mins = fs.flatMap(_._3)
      val maxs = fs.flatMap(_._4)
      Some(TxWarehouse.FastColumnStats(fs.map(_._1).sum, fs.map(_._2).sum,
        if (mins.isEmpty) None else Some(mins.min),
        if (maxs.isEmpty) None else Some(maxs.max)))
    }
  }

  private def readFiles(spark: SparkSession, path: String,
      rels: Iterable[String], upTo: Long = Long.MaxValue): DataFrame = {
    // an emptied (but existing) table reads as zero rows; schemaless is
    // fine — every caller either counts or guards with exists()
    if (rels.isEmpty) spark.emptyDataFrame
    else {
      val st = replay(spark, path, upTo)._2
      readFilesDv(spark, path, rels, st.dvs,
        DdlOps.mappingAt(DdlOps.decode(st.props.get(DdlOps.Key)), upTo))
    }
  }

  /** [[readFiles]] with the deletion-vector map and ddl mapping chosen
    * by the caller — the CDC diff reads each SIDE under its own
    * version's vectors while keeping one (current) logical view.
    */
  private def readFilesDv(spark: SparkSession, path: String,
      rels: Iterable[String], dvs: Map[String, String],
      mapping: DdlOps.Mapping): DataFrame = {
    if (rels.isEmpty) return spark.emptyDataFrame
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(rels.map(r => s"$path/$r").toSeq: _*)
    // merge-on-read: subtract each file's deletion vector BEFORE the
    // logical-view projection (metadata columns resolve only directly
    // above the file relation)
    val dvApplied = applyDv(spark, raw,
      rels.flatMap(r => dvs.get(r).map(r -> _)).toMap)
    // column-mapping reconciliation (zero-rewrite rename/drop): data
    // files carry PHYSICAL names forever; present the LOGICAL view as
    // of `upTo` (current by default; a time-travel read shows the
    // names that version had). One global projection — the scan stays
    // a single parquet relation, pushdown intact.
    DdlOps.reconcileRead(dvApplied, mapping)
  }

  /** Apply deletion vectors to a raw file-source frame: anti-join on
    * (file basename, row ordinal) against the decoded position set.
    * `dvs` must already be restricted to the files being scanned —
    * the common DV-free read adds NOTHING to the plan. Basenames are
    * globally unique (every data file carries its write's UUID), so
    * the key is exact; `_metadata.row_index` is the parquet reader's
    * physical row ordinal — precisely the domain [[FileDv]] records.
    * The deleted set is deleted-rows-sized (the merge-on-read
    * contract), rides a broadcast below ~4M positions, and degrades to
    * a shuffle anti-join above rather than a driver/executor OOM.
    */
  private[tableops] def applyDv(spark: SparkSession, raw: DataFrame,
      dvs: Map[String, String]): DataFrame = {
    if (dvs.isEmpty) raw
    else {
      val dvDf = dvPositions(spark, dvs)
      val total = dvs.valuesIterator.map(FileDv.cardinality).sum
      val keyed = raw
        .withColumn("__graft_dv_file", col("_metadata.file_name"))
        .withColumn("__graft_dv_pos", col("_metadata.row_index"))
      val joined =
        if (total <= 4000000L)
          keyed.join(broadcast(dvDf),
            Seq("__graft_dv_file", "__graft_dv_pos"), "left_anti")
        else keyed.join(dvDf,
          Seq("__graft_dv_file", "__graft_dv_pos"), "left_anti")
      joined.drop("__graft_dv_file", "__graft_dv_pos")
    }
  }

  /** The decoded (file basename, row ordinal) frame of a DV map. */
  private def dvPositions(spark: SparkSession,
      dvs: Map[String, String]): DataFrame = {
    import spark.implicits._
    dvs.iterator.flatMap { case (rel, payload) =>
      val base = rel.substring(rel.lastIndexOf('/') + 1)
      FileDv.decode(payload).iterator.map(p => (base, p))
    }.toSeq.toDF("__graft_dv_file", "__graft_dv_pos")
  }

  private def ddlMapping(st: TxState): DdlOps.Mapping =
    DdlOps.mappingAt(DdlOps.decode(st.props.get(DdlOps.Key)), Long.MaxValue)

  def read(spark: SparkSession, path: String): DataFrame = {
    val (_, st) = replay(spark, path)
    require(st.live.nonEmpty || exists(spark, path), s"no such table: $path")
    // BigQuery-style RequirePartitionFilter (the reference sets it on
    // the materialized join table, cloud/bq/ops.go:283-287): a flagged
    // table refuses the unscoped full scan — at archive scale the
    // costly mistake this property exists to prevent. Scoped reads
    // (readPartition, readWhere with a date predicate) and
    // manifest-only probes (dates, fastRowCount) are unaffected.
    require(!st.props.get(RequireFilterKey).exists(_ == "true"),
      s"table $path sets requirePartitionFilter: read through " +
        "readPartition/readWhere with a date predicate, or unset the " +
        "property (setRequirePartitionFilter(path, required = false))")
    readFiles(spark, path, st.live.keys)
  }

  /** Stats-pruned predicate read (manifest-level data skipping): every
    * live file whose recorded min/max PROVE the predicate cannot match
    * is dropped before Spark lists a single footer; the predicate then
    * still applies as a row filter (and pushes into the kept files'
    * row groups as usual). Files without stats — committed before the
    * stats layer, or with unreadable footers — are always kept, so the
    * result is identical to `read().filter` by construction. One
    * contract nuance under schema evolution: the result's MERGED schema
    * is that of the kept files, so a column that only exists in pruned
    * files won't appear (its values would have been all-null anyway);
    * a predicate that cannot even resolve against the kept subset falls
    * back to the unpruned read. At archive scale this is the read path
    * a range query wants: cost follows the files that OVERLAP the
    * predicate (tight after clustered compaction), not the table's
    * total file count.
    */
  override def readWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    val (_, st) = replay(spark, path)
    require(st.live.nonEmpty || exists(spark, path), s"no such table: $path")
    val pred = org.apache.spark.sql.graftshim.PredicateBridge.normalize(predicate)
    // RequirePartitionFilter: a flagged table demands the predicate
    // CONSTRAIN the partition column — the same syntactic contract as
    // BigQuery's flag (the partition column must appear in the WHERE).
    require(!st.props.get(RequireFilterKey).exists(_ == "true") ||
        mentionsPartitionCol(pred),
      s"table $path sets requirePartitionFilter: the readWhere " +
        "predicate must reference the `date` partition column")
    // stats/blooms are recorded under PHYSICAL names; rewrite the
    // predicate's attributes logical→physical so pruning survives
    // renames (unmapped names pass through; a miss only costs keeping)
    val statsPred = DdlOps.toPhysicalPred(pred, ddlMapping(st))
    val kept = st.live.keys.filter { rel =>
      (st.stats.get(rel).flatMap(FileStats.decode) match {
        case Some(payload) => FileStats.mayMatch(payload, statsPred)
        case None => true
      }) &&
      // second skipping layer: equality/IN probes on the bloom column
      // prune the files min/max ranges can't (scattered keys)
      st.blooms.get(rel).forall(FileBloom.mayMatch(_, statsPred))
    }.toSeq.sorted
    if (kept.isEmpty)
      // preserve the table's merged schema without opening data: the
      // false filter folds to an empty relation at optimization time
      readFiles(spark, path, st.live.keys).filter(lit(false))
    else
      try readFiles(spark, path, kept).filter(predicate)
      catch {
        // the predicate references a column every KEPT file lacks (e.g.
        // IsNull on a schema-evolved column, which keeps exactly the
        // files without it) — the pruned subset's footer merge can't
        // resolve the filter. The manifest-recorded cumulative schema
        // (see schemaLines) resolves every column the table ever
        // carried, with missing columns null-filled, so the skipping
        // SURVIVES schema-evolution predicates: re-read the kept
        // subset under the explicit schema. Only a table with no
        // recorded schema (pre-`H` logs, or an `H -` clear) pays the
        // unpruned fallback.
        case _: org.apache.spark.sql.AnalysisException =>
          st.schemaJson.flatMap(j => scala.util.Try(
            org.apache.spark.sql.types.DataType.fromJson(j)
              .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
          match {
            case Some(tableSchema) if kept.nonEmpty =>
              DdlOps.reconcileRead(
                applyDv(spark,
                  spark.read.schema(tableSchema)
                    .parquet(kept.map(r => s"$path/$r"): _*),
                  kept.flatMap(r => st.dvs.get(r).map(r -> _)).toMap),
                ddlMapping(st))
                .filter(predicate)
            // readFiles, not read(): the partition-filter guard already
            // passed above — the internal fallback must not re-trip it
            case _ => readFiles(spark, path, st.live.keys).filter(predicate)
          }
      }
  }

  /** Partition pruning happens at the MANIFEST — only `date`'s files are
    * opened (no footer reads of other days); the row filter stays as a
    * belt for mixed-date files (which [[append]] never produces).
    */
  override def readPartition(spark: SparkSession, path: String,
      date: LocalDate): DataFrame = {
    val (_, live) = state(spark, path)
    // spec evolution: the date's own day-generation files plus any
    // month-generation file covering it — the row filter below is the
    // correctness belt for the month file's other days
    val m = monthTok(date)
    val mine = live.collect {
      case (rel, d) if d == date.toString || d == m => rel
    }
    // no files for the date: keep the table's FULL merged schema so
    // downstream plans (dedup keys, evolved columns) still analyze —
    // read all live files and let the filter yield zero rows. Cost is
    // footer reads only (the date predicate prunes every row group via
    // stats, and a sampled file subset could miss an evolved column and
    // fail analysis); it runs on the rare re-dispatched-empty-date
    // path, not the daily hot path, which opens exactly `mine`.
    val base = if (mine.isEmpty) readFiles(spark, path, live.keys)
               else readFiles(spark, path, mine)
    if (base.columns.isEmpty) base
    else base.filter(col("date") === lit(java.sql.Date.valueOf(date)))
  }

  /** Write `df`'s rows as immutable files under a fresh uuid dir, split
    * one-file-per-date via the duplicated `__p_date` dir column.
    * Returns the written (relpath, date, stats) manifest entries — NOT
    * yet committed.
    */
  private def writeData(spark: SparkSession, df: DataFrame, path: String):
      (Seq[AddEntry], String) = {
    val dir = s"$DataDir/${UUID.randomUUID()}"
    // the backend standardizes its data files on TIMESTAMP_MICROS:
    // Spark's default INT96 is the deprecated legacy physical type and
    // carries no usable min/max for the 't' stats domain — micros makes
    // event-time range probes prunable ([[FileStats]]) and is what
    // every modern reader expects. The session conf is restored after
    // the write so the caller's own SUBSEQUENT parquet writes keep
    // their encoding; overlapping WAREHOUSE writes share one
    // reference-counted save/restore ([[TsTypeOverride]]) so they
    // cannot corrupt each other's saved value. CAVEAT — the conf is
    // session-scoped, not write-scoped (ParquetFileFormat.prepareWrite
    // reads the session SQLConf; there is no per-write option): a
    // caller's own UNRELATED parquet write racing a warehouse write
    // still observes TIMESTAMP_MICROS. Callers wanting conf isolation
    // must use separate sessions (`spark.newSession()` shares the
    // context, not the conf).
    // column mapping: the caller writes LOGICAL names; files land under
    // the table's PHYSICAL names so every file (pre- and post-rename)
    // shares one schema namespace. Tombstoned names are rejected here.
    val st = replay(spark, path)._2
    val phys = DdlOps.translateWrite(df, ddlMapping(st))
    TsTypeOverride.acquire(spark)
    try writeDataInner(spark, phys, path, dir,
      st.props.getOrElse(PartitionSpecKey, "day"),
      st.props.get(BucketSpecKey).flatMap(decodeBucketSpec))
    finally TsTypeOverride.release(spark)
  }

  private def writeDataInner(spark: SparkSession, df: DataFrame,
      path: String, dir: String, spec: String,
      bucketSpec: Option[(Int, String)]): (Seq[AddEntry], String) = {
    // CHECK constraints validate DURING the write pass (observe counts
    // rows whose predicate is FALSE — SQL semantics: null passes), so
    // enforcement costs zero extra scans. A violation aborts before the
    // commit: the written files are unreferenced orphans for vacuum,
    // the table is untouched.
    val checks = checkConstraints(spark, path)
    val obs = if (checks.isEmpty) None
      else Some(new org.apache.spark.sql.Observation())
    val checked = obs match {
      case Some(o) =>
        df.observe(o, checks.map { case (name, sql) =>
          sum(when(expr(sql) <=> lit(false), 1L).otherwise(0L))
            .as(s"__chk_$name")
        }.head, checks.drop(1).map { case (name, sql) =>
          sum(when(expr(sql) <=> lit(false), 1L).otherwise(0L))
            .as(s"__chk_$name")
        }.toSeq: _*)
      case None => df
    }
    // partition-spec evolution (Iceberg-style, zero-rewrite): the dir
    // token — and therefore the file's manifest `A` value — is the
    // partition value at the spec IN FORCE AT WRITE TIME (day
    // `yyyy-MM-dd` or month `yyyy-MM`, distinguishable by shape), so a
    // table carries mixed generations and each file prunes under its
    // own then-spec forever. The real `date` column stays IN the data
    // either way: row filters and min/max stats skipping are
    // grain-agnostic.
    val partTok = if (spec == "month") date_format(col("date"), "yyyy-MM")
                  else col("date").cast("string")
    // bucketed layout ([[setBucketSpec]]): cluster rows into n hash
    // buckets of the bucket column — `pmod(hash(c), n)` is EXACTLY the
    // partition-id expression of Spark's own HashPartitioning (Murmur3,
    // seed 42), so a file's rows land where a shuffle on that key
    // would, which is what lets the bucketed scan DECLARE the hash
    // partitioning and joins skip their Exchange. The id rides a
    // `__p_bucket=` dir level (manifest-parseable for point-lookup
    // pruning) AND, post-write, the bucket file-name suffix the stock
    // FileSourceScanExec derives bucket membership from.
    val withDirs = bucketSpec match {
      case Some((n, c)) =>
        checked.withColumn(PartCol, partTok)
          .withColumn(BucketCol, pmod(hash(col(c)), lit(n)))
          .write.partitionBy(PartCol, BucketCol)
      case None =>
        checked.withColumn(PartCol, partTok).write.partitionBy(PartCol)
    }
    withDirs.parquet(s"$path/$dir")
    if (bucketSpec.isDefined) renameBucketFiles(spark, s"$path/$dir")
    obs.foreach { o =>
      val bad = checks.flatMap { case (name, sql) =>
        val n = Option(o.get(s"__chk_$name")).map(_.asInstanceOf[Long])
          .getOrElse(0L)
        if (n > 0) Some(s"$name ($sql): $n rows") else None
      }
      if (bad.nonEmpty)
        throw new ConstraintViolationException(
          s"write to $path violates CHECK constraint(s) ${bad.mkString("; ")}")
    }
    (listData(spark, path, dir), dir)
  }

  /** Snapshot for [[TxFileIndex]]: (live rels, stats, blooms, sizes,
    * deletion vectors).
    */
  private[tableops] def indexSnapshot(spark: SparkSession, path: String):
      (Set[String], Map[String, String], Map[String, String],
        Map[String, Long], Map[String, String]) = {
    val st = replay(spark, path)._2
    (st.live.keySet, st.stats, st.blooms, st.sizes, st.dvs)
  }

  /** The manifest-recorded cumulative table schema, if any. */
  def recordedSchema(spark: SparkSession,
      path: String): Option[org.apache.spark.sql.types.StructType] =
    replay(spark, path)._2.schemaJson.flatMap(j => scala.util.Try(
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)

  /** The table as a manifest-indexed RELATION ([[TxFileIndex]]): every
    * plan over it pushes its own filters into manifest stats/bloom
    * skipping — `readWhere` semantics without the explicit call, join-
    * and SQL-composable, with metadata-only planning statistics. Pins
    * the current snapshot like every other read.
    */
  def readRelation(spark: SparkSession, path: String): DataFrame =
    TxFileIndex.relation(spark, this, path)

  /** Raw table property (None when unset or explicitly cleared). */
  def tableProperty(spark: SparkSession, path: String,
      key: String): Option[String] =
    replay(spark, path)._2.props.get(key).filter(_ != "-")

  /** The named CHECK constraint's predicate SQL, if active. */
  def checkConstraintSql(spark: SparkSession, path: String,
      name: String): Option[String] =
    checkConstraints(spark, path).collectFirst {
      case (n, sql) if n == name => sql
    }

  /** Active CHECK constraints: `P check.<name> <b64(sql)>` properties
    * (a `-` value is a dropped constraint).
    */
  private def checkConstraints(spark: SparkSession,
      path: String): Seq[(String, String)] =
    replay(spark, path)._2.props.toSeq.collect {
      case (k, v) if k.startsWith("check.") && v != "-" =>
        scala.util.Try(k.stripPrefix("check.") ->
          new String(java.util.Base64.getDecoder.decode(v), UTF_8)).toOption
    }.flatten.sortBy(_._1)

  /** Delta-style CHECK constraint: every SUBSEQUENT write (append,
    * merge, replace, streaming batch) must satisfy `sqlPredicate` on
    * every row or the write aborts with [[ConstraintViolationException]]
    * before committing (SQL CHECK semantics — a NULL predicate passes).
    * Existing data is NOT retro-validated (same contract as Delta's
    * `ADD CONSTRAINT` on new writes... which validates history; here
    * history is immutable and the constraint governs the write path).
    * Names are [A-Za-z0-9_]; re-adding a name replaces its predicate.
    */
  def addCheckConstraint(spark: SparkSession, path: String, name: String,
      sqlPredicate: String): Unit = {
    require(name.matches("[A-Za-z0-9_]+"), s"bad constraint name: $name")
    commitProperty(spark, path, s"check.$name", b64(sqlPredicate))
  }

  /** Drop a CHECK constraint (no-op if absent). */
  def dropCheckConstraint(spark: SparkSession, path: String,
      name: String): Unit =
    commitProperty(spark, path, s"check.$name", "-")

  /** ZERO-REWRITE column rename (column mapping — see [[DdlOps]]): one
    * metadata commit; no data file is touched, at any table size. Data
    * files keep their PHYSICAL names; reads reconcile to the logical
    * view, writes translate back, and time travel shows each version
    * under the names it had then. Stats/bloom pruning keeps working
    * (predicates are rewritten to physical names at the manifest
    * check). The `date` partition column cannot be renamed, and a
    * column referenced by a CHECK constraint must shed the constraint
    * first (constraints evaluate on physical frames).
    */
  def renameColumn(spark: SparkSession, path: String, oldName: String,
      newName: String): Unit =
    ddlCommit(spark, path, oldName, newName, "rename")

  /** ZERO-REWRITE column drop — same mechanism as [[renameColumn]].
    * The physical name is TOMBSTONED: old files still carry the bytes
    * (hidden at read; reclaimed physically only by a rewriting pass
    * like [[compact]] over those files), and a later write
    * re-introducing the name is rejected, because it would un-hide the
    * old values. Time travel before the drop still reads the column.
    */
  def dropColumn(spark: SparkSession, path: String, name: String): Unit =
    ddlCommit(spark, path, name, "", "drop")

  private def ddlCommit(spark: SparkSession, path: String, oldName: String,
      newName: String, kind: String): Unit = {
    require(oldName != "date" && newName != "date",
      "the date partition column cannot be renamed or dropped")
    require(kind == "drop" || oldName != newName,
      "rename to the same name is a no-op")
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      require(st.live.nonEmpty || exists(spark, path),
        s"no such table: $path")
      val ops = DdlOps.decode(st.props.get(DdlOps.Key))
      val m = DdlOps.mappingAt(ops, Long.MaxValue)
      val logical = logicalColumns(spark, path, st, m)
      require(logical.contains(oldName), s"no such column: $oldName")
      if (kind == "rename") {
        require(!logical.contains(newName),
          s"column already exists: $newName")
        require(!m.dropped.contains(newName),
          s"$newName is a tombstoned (dropped) name — it stays retired")
      }
      val offending = checkConstraints(spark, path).collect {
        case (n, sql) if sql.matches(s"(?s).*\\b$oldName\\b.*") => n
      }
      require(offending.isEmpty,
        s"column $oldName is referenced by CHECK constraint(s) " +
          s"${offending.mkString(", ")} — drop them first")
      val physical = m.toPhysical.getOrElse(oldName, oldName)
      val op = DdlOps.Op(v + 1, kind, physical, newName)
      if (tryCommit(f, path, v + 1,
          Seq(s"P ${DdlOps.Key} ${DdlOps.encode(ops :+ op)}"))) {
        maybeCheckpoint(spark, path, v + 1)
        return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** The table's current LOGICAL column set: the manifest-recorded
    * cumulative (physical) schema under the ddl mapping, falling back
    * to a reconciled footer merge when no schema is recorded.
    */
  private def logicalColumns(spark: SparkSession, path: String,
      st: TxState, m: DdlOps.Mapping): Set[String] =
    st.schemaJson.flatMap(j => scala.util.Try(
      org.apache.spark.sql.types.DataType.fromJson(j)
        .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
    match {
      case Some(ts) =>
        (ts.fieldNames.toSet -- m.dropped)
          .map(p => m.toLogical.getOrElse(p, p))
      case None =>
        readFiles(spark, path, st.live.keys).columns.toSet
    }

  /** BigQuery-dual `requirePartitionFilter` (the reference sets it when
    * creating the materialized join table, cloud/bq/ops.go:283-287):
    * once flagged, [[read]] throws and [[readWhere]] demands a
    * predicate referencing the `date` partition column, so no query can
    * accidentally full-scan a table whose access pattern is meant to be
    * per-day. [[readPartition]], [[dates]] and the manifest-only fast
    * counts are unaffected, and so are the time-travel/audit surfaces
    * ([[readAt]], [[readAsOf]], [[rowDiff]]) — like BigQuery's flag,
    * the guard governs the QUERY path, not maintenance/forensics.
    * Rides the same last-one-wins `P` property mechanism as
    * blooms/CHECK constraints, so it survives checkpoints and
    * replicates to every reader.
    */
  override def setRequirePartitionFilter(spark: SparkSession, path: String,
      required: Boolean): Unit =
    commitProperty(spark, path, RequireFilterKey,
      if (required) "true" else "-")

  /** PARTITION-SPEC EVOLUTION (Iceberg v2-style, reference point: the
    * Iceberg spec's "partition evolution" — public design): change the
    * table's partition granularity WITHOUT rewriting a single file.
    * One metadata commit flips the spec; files written before keep
    * their day-grain manifest values, files written after carry
    * month-grain values, and every read path handles the mix:
    *
    *  - [[readWhere]] prunes each generation under its own grain via
    *    the per-file min/max stats (a day file prunes to its day, a
    *    month file to its month — stats are over the real `date`
    *    column, which stays in the data at any grain);
    *  - [[readPartition]] opens the date's day files plus any month
    *    file COVERING the date, with the existing row filter as the
    *    correctness belt;
    *  - time travel shows each version under its then-spec, because
    *    the grain rides in each file's own manifest value.
    *
    * Day-grain partition MUTATIONS (deletePartition /
    * overwritePartition) refuse dates covered by a month-generation
    * file — dropping part of a file is a rewrite, not metadata; use
    * the predicate DELETE for that. This is the day→month compaction
    * story at 100 TB: old days stay metadata-addressable, new data
    * stops exploding into per-day small files.
    */
  def setPartitionSpec(spark: SparkSession, path: String,
      spec: String): Unit = {
    require(spec == "day" || spec == "month",
      s"unsupported partition spec '$spec' (day | month)")
    commitProperty(spark, path, PartitionSpecKey, spec)
  }

  /** The spec new writes will use (`day` unless evolved). */
  def partitionSpec(spark: SparkSession, path: String): String =
    tableProperty(spark, path, PartitionSpecKey).getOrElse("day")

  /** BUCKETED LAYOUT (hash clustering — the Iceberg `bucket(n, col)`
    * partition transform / Spark bucketBy, as a table property like the
    * partition spec): every SUBSEQUENT write clusters its rows into
    * `n` Murmur3 hash buckets of `col`, one `__p_bucket=` dir level
    * under each date, file names carrying the bucket suffix Spark's
    * scan convention expects. What it buys at 100 TB:
    *
    *  - [[readBucketed]] exposes the table as a relation that DECLARES
    *    `HashPartitioning(col, n)` — a join of two tables bucketed to
    *    the same n on their join keys runs with NO Exchange on either
    *    side (storage-partitioned join): the shuffle was paid once at
    *    write, not on every query;
    *  - [[readBucketKey]] prunes a point lookup to the one bucket's
    *    files from the MANIFEST alone (the rel path carries the
    *    bucket), before stats/blooms even apply.
    *
    * Like [[setPartitionSpec]], flipping the property is one metadata
    * commit and rewrites nothing: pre-existing files simply lack
    * bucket ids, and [[readBucketed]] refuses mixed tables with a
    * pointer at [[compact]] (a full-partition rewrite re-clusters
    * under the current spec, the [[compactMonth]] discipline).
    * The bucket column must be a top-level column; re-setting replaces
    * n. Changing n orphans the old generation's ids the same way —
    * rewrite before relying on the scan property.
    */
  def setBucketSpec(spark: SparkSession, path: String, col: String,
      n: Int): Unit = {
    require(n >= 2 && n <= 65536, s"bucket count out of range: $n")
    require(col.nonEmpty && !col.exists(_.isWhitespace) && !col.contains(":"),
      s"bad bucket column name: $col")
    commitProperty(spark, path, BucketSpecKey, s"$n:$col")
  }

  /** The (n, col) bucket spec in force for new writes, if set. */
  def bucketSpec(spark: SparkSession, path: String): Option[(Int, String)] =
    tableProperty(spark, path, BucketSpecKey).flatMap(decodeBucketSpec)

  /** The bucket id a rel path was written under, from its
    * `__p_bucket=` segment (None for pre-spec generations).
    */
  private def bucketOf(rel: String): Option[Int] =
    rel.split('/').collectFirst {
      case seg if seg.startsWith(s"$BucketCol=") =>
        seg.stripPrefix(s"$BucketCol=")
    }.flatMap(t => scala.util.Try(t.toInt).toOption)

  /** Inject the Spark bucket-file suffix (`_00003` before the
    * extension chain) into every just-written file under `dir`, from
    * its `__p_bucket=` dir — files are uncommitted, so the rename is
    * invisible. The stock FileSourceScanExec derives bucket membership
    * from exactly this name shape.
    */
  private def renameBucketFiles(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val it = f.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet")) {
        bucketOf(st.getPath.toString) foreach { b =>
          val renamed = name.replaceFirst("\\.", f"_$b%05d.")
          if (renamed != name)
            require(f.rename(st.getPath,
              new Path(st.getPath.getParent, renamed)),
              s"bucket rename failed: ${st.getPath}")
        }
      }
    }
  }

  /** The table as a BUCKET-AWARE relation: a [[TxFileIndex]] scan that
    * declares `HashPartitioning(col, n)`, so Catalyst elides the
    * Exchange under joins/aggregations keyed on the bucket column —
    * the storage-partitioned join. Requires every live file to carry
    * the current spec's bucket id (mixed generations would silently
    * mis-bucket; rewrite first). Deletion vectors apply as everywhere.
    */
  def readBucketed(spark: SparkSession, path: String): DataFrame = {
    val (_, st) = replay(spark, path)
    val (n, c) = st.props.get(BucketSpecKey).flatMap(decodeBucketSpec)
      .getOrElse(throw new IllegalStateException(
        s"$path has no bucket spec — setBucketSpec first"))
    val unbucketed = st.live.keys.filterNot(r => bucketOf(r).exists(_ < n))
    require(unbucketed.isEmpty,
      s"$path has ${unbucketed.size} live file(s) not written under the " +
        s"current bucket spec ($n buckets on $c) — rewrite them first " +
        "(compact with smallBytes = Long.MaxValue re-clusters a partition)")
    TxFileIndex.relation(spark, this, path,
      Some(org.apache.spark.sql.catalyst.catalog.BucketSpec(n, Seq(c), Nil)))
  }

  /** Manifest-only bucket pruning for a point lookup: read ONLY the
    * files of `value`'s bucket (then stats/blooms/row filters apply as
    * usual on that slice). The bucket id is computed with the SAME
    * catalyst expression the writer used, so it is exact by
    * construction.
    */
  def readBucketKey(spark: SparkSession, path: String,
      value: Any): DataFrame = {
    val (_, st) = replay(spark, path)
    val (n, c) = st.props.get(BucketSpecKey).flatMap(decodeBucketSpec)
      .getOrElse(throw new IllegalStateException(
        s"$path has no bucket spec — setBucketSpec first"))
    val b = spark.range(1)
      .select(pmod(hash(lit(value)), lit(n)).cast("int")).head().getInt(0)
    // pre-spec files (no bucket id) must stay in scope — the key could
    // live anywhere in them
    val mine = st.live.keys.filter(r =>
      bucketOf(r).forall(_ == b)).toSeq.sorted
    readFiles(spark, path, mine).filter(col(c) === lit(value))
  }

  /** The month-grain manifest token covering `date`. */
  private def monthTok(date: LocalDate): String =
    f"${date.getYear}%04d-${date.getMonthValue}%02d"

  /** Guard for day-grain partition mutations: a month-generation file
    * covering the date cannot be retired by metadata alone.
    */
  private def requireDayGrain(live: Map[String, String], path: String,
      date: LocalDate, op: String): Unit = {
    val m = monthTok(date)
    require(!live.values.exists(_ == m),
      s"$op(date=$date) on $path: a month-generation file covers this " +
        "date (partition-spec evolution); retiring part of a file is a " +
        "rewrite, not metadata — use deleteWhere, or re-grain via " +
        "setPartitionSpec(day) + compactMonth first")
  }

  override def requiresPartitionFilter(spark: SparkSession,
      path: String): Boolean =
    tableProperty(spark, path, RequireFilterKey).contains("true")

  /** Syntactic partition-filter check, the same contract BigQuery
    * enforces: the predicate tree mentions the partition column
    * somewhere. Leaf-level soundness (does it actually PRUNE?) is the
    * skipping layers' job; the guard only rules out the predicate that
    * never names `date` at all.
    */
  private def mentionsPartitionCol(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.collectFirst {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.name.equalsIgnoreCase("date") => ()
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if a.name.equalsIgnoreCase("date") => ()
    }.isDefined

  private def commitProperty(spark: SparkSession, path: String,
      key: String, value: String): Unit = {
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, _) = replay(spark, path)
      if (tryCommit(f, path, v + 1, Seq(s"P $key $value"))) {
        maybeCheckpoint(spark, path, v + 1); return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** (relpath, date, footer stats) of every parquet file under
    * `path`/`dir`. The stats harvest is a FOOTER read per file on the
    * driver — bounded by the write's own file count, metadata-only, and
    * the price of [[readWhere]]'s skipping; a file whose footer won't
    * yield stats simply commits without an `S` line (never pruned).
    */
  private def listData(spark: SparkSession, path: String, dir: String):
      Seq[AddEntry] = {
    val f = fs(spark, path)
    val conf = spark.sparkContext.hadoopConfiguration
    val it = f.listFiles(new Path(s"$path/$dir"), true)
    val out = scala.collection.mutable.ListBuffer[AddEntry]()
    val prefix = f.makeQualified(new Path(path)).toString + "/"
    while (it.hasNext) {
      val st = it.next()
      val full = st.getPath.toString
      if (st.isFile && full.endsWith(".parquet")) {
        val rel = full.stripPrefix(prefix)
        val date = rel.split('/').collectFirst {
          case seg if seg.startsWith(s"$PartCol=") =>
            seg.stripPrefix(s"$PartCol=")
        }.getOrElse("")
        out += AddEntry(rel, date, FileStats.harvest(conf, st.getPath),
          st.getLen)
      }
    }
    // bloom property set → ONE column-pruned pass over the new files
    // builds each one's key bloom (keyed by basename, attached here);
    // every writer — append, merge, compaction publish — pays this at
    // write time so equality probes can skip files at read time
    val entries = out.toList
    val specs = bloomSpecs(spark, path)
    if (specs.nonEmpty && entries.nonEmpty) {
      val byBase = FileBloom.harvest(spark, path, dir, specs)
      entries.map { a =>
        a.copy(bloom = byBase.get(a.rel.substring(a.rel.lastIndexOf('/') + 1)))
      }
    } else entries
  }

  /** The table's bloom-skipping specs (one per bloomed column), if
    * [[setBloomFilter]] set any.
    */
  private def bloomSpecs(spark: SparkSession, path: String):
      Seq[FileBloom.Spec] =
    replay(spark, path)._2.props.get(FileBloom.PropKey)
      .map(FileBloom.decodeSpecs).getOrElse(Nil)

  /** Enable per-file bloom-filter skipping on `col` ([[FileBloom]]):
    * every SUBSEQUENT write harvests a bloom sized for
    * `expectedItemsPerFile` at `fpp` alongside its min/max stats, and
    * equality/IN probes on the column ([[readWhere]], [[mergeInto]]'s
    * key overlap) skip files whose bloom rules the keys out — the
    * scattered-key case range stats cannot prune. Existing files keep
    * resolving unpruned until a rewrite (compaction, merge) re-lands
    * them. Property commit is metadata-only and atomic like any other.
    */
  def setBloomFilter(spark: SparkSession, path: String, col: String,
      expectedItemsPerFile: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItemsPerFile, fpp)
    val spec = FileBloom.Spec(col, expectedItemsPerFile, bits)
    // MERGE into the existing spec list: one bloom per distinct column,
    // re-setting a column replaces its sizing
    val merged = bloomSpecs(spark, path).filterNot(_.col == col) :+ spec
    commitProperty(spark, path, FileBloom.PropKey,
      FileBloom.encodeSpecs(merged.sortBy(_.col)))
  }

  /** Manifest lines for a set of adds: `A` entries plus an `S` stats
    * line per file that yielded one, plus an `F` length line each.
    */
  private def addLines(adds: Seq[AddEntry]): Seq[String] =
    adds.map(a => s"A ${a.date} ${a.rel}") ++
      adds.flatMap(a => a.stats.map(p => s"S $p ${a.rel}")) ++
      adds.map(a => s"F ${a.len} ${a.rel}") ++
      adds.flatMap(a => a.bloom.map(b => s"B $b ${a.rel}"))

  def append(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val (adds, _) = writeData(spark, df, path)
    commitRetry(spark, path, Some(df.schema))(_ => (adds, Nil))
  }

  private[tableops] def liveOfDate(spark: SparkSession, path: String,
      date: LocalDate): Set[String] =
    state(spark, path)._2.collect {
      case (rel, d) if d == date.toString => rel
    }.toSet

  def overwritePartition(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): Long =
    overwritePartitionExpecting(spark, df, path, date,
      liveOfDate(spark, path, date))

  /** Partition replace with WRITE-WRITE CONFLICT DETECTION: `expected`
    * is the date's live file set the caller's plan was built against
    * (captured at entry by [[overwritePartition]], at stage time by
    * [[stageSelfReplace]]). If another writer committed rows for the
    * same date in between, blindly retiring "whatever is live now"
    * would silently drop those rows under a replace computed without
    * them — the lost update Delta/Iceberg surface as
    * ConcurrentAppend/DeleteException; this backend throws the dedicated
    * [[ConcurrentCommitException]], which the gardener's Outcome mapping
    * classifies as Retry (stay in state, re-run against fresh table
    * state after backoff) — NOT Failure, which the monitor treats as
    * terminal Failed.
    */
  private[tableops] def overwritePartitionExpecting(spark: SparkSession,
      df: DataFrame, path: String, date: LocalDate,
      expected: Set[String]): Long = {
    val obs = new org.apache.spark.sql.Observation()
    val (adds, _) = writeData(spark,
      df.observe(obs, count(lit(1)).as("rows")), path)
    commitReplace(spark, path, date, adds, expected, Some(df.schema))
    obs.get("rows").asInstanceOf[Long]
  }

  private def commitReplace(spark: SparkSession, path: String,
      date: LocalDate, adds: Seq[AddEntry], expected: Set[String],
      addedSchema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      val live = st.live
      requireDayGrain(live, path, date, "overwritePartition")
      val current = live.collect {
        case (rel, d) if d == date.toString => rel
      }.toSet
      // the DEDICATED conflict type, not the generic CME: the gardener's
      // Outcome mapping matches ConcurrentCommitException → Retry, and
      // this is the conflict path copyToRaw/join (overwritePartition) and
      // the dedup/compaction publish (publishSelfReplace) hit first in a
      // multi-driver deployment — a generic type would land those jobs in
      // terminal Failed instead of retrying against fresh state
      if (current != expected)
        throw new ConcurrentCommitException(
          s"partition date=$date of $path changed since this replace was " +
            s"planned (expected ${expected.size} files, found " +
            s"${current.size}) — a concurrent writer committed; re-run " +
            "against fresh state")
      val lines = addLines(adds) ++ current.toSeq.sorted.map(r => s"R $r") ++
        addedSchema.toSeq.flatMap(s => schemaLines(st.schemaJson, s))
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1); return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** Pure metadata: retire the date's files from the manifest. */
  def deletePartition(spark: SparkSession, path: String, date: LocalDate): Unit =
    if (exists(spark, path))
      commitRetry(spark, path) { live =>
        requireDayGrain(live, path, date, "deletePartition")
        (Nil, live.collect { case (rel, d) if d == date.toString => rel }.toSeq)
      }

  /** [[deletePartition]] that ALSO advances a txn epoch marker in the
    * SAME commit: `T <appId> <thisVersion>`. This is the drain half of
    * the load-idempotence contract (see [[graft.tableops.TableOps]]
    * loadToTmp/deleteTmp): a load keyed to the drain epoch is a no-op
    * when re-run by a crash retry or a takeover — the epoch only moves
    * when the partition is drained, so a legitimate REPROCESSING (which
    * always begins after the previous processing's drain) loads again
    * while an at-least-once re-delivery of the same processing does
    * not. The marker is written even when the partition is already
    * empty: "this processing's drain happened" is the fact being
    * recorded, not "files were removed" — a re-parse of a day that
    * previously produced zero rows must still get a fresh epoch.
    * Marker values are commit versions, so they are monotone under
    * [[parseInto]]'s max.
    */
  def deletePartitionMarking(spark: SparkSession, path: String,
      date: LocalDate, appId: String): Unit = {
    require(!appId.exists(_.isWhitespace), "appId must not contain whitespace")
    if (!exists(spark, path)) return
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      requireDayGrain(st.live, path, date, "deletePartitionMarking")
      val removes = st.live.collect {
        case (rel, d) if d == date.toString => rel
      }.toSeq.sorted
      val lines = removes.map(r => s"R $r") :+ s"T $appId ${v + 1}"
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1); return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** Copy-on-write predicate DELETE — the row-level "remove every row
    * matching `predicate` wherever it lives" path (the GDPR/right-to-
    * erasure operation; [[mergeInto]] covers KEYED deletes, this covers
    * arbitrary predicates across all partitions). SQL DELETE
    * semantics: a row is removed iff the predicate is TRUE — NULL
    * keeps the row.
    *
    * Cost model, in three strictly narrowing tiers:
    *  1. manifest-only: stats ranges + per-file blooms prune the
    *     candidate set exactly as [[readWhere]] does — a delete keyed
    *     to a bloom'd column opens O(files that can match), not the
    *     table;
    *  2. one pruned scan finds which candidates ACTUALLY hold matching
    *     rows (file grain, `input_file_name`) — candidates whose rows
    *     all survive are NOT rewritten;
    *  3. only the hit files are re-read and their surviving rows
    *     rewritten; untouched files keep their stats, blooms, and
    *     z-order layout byte-for-byte (rewritten files get fresh
    *     stats; bloom re-install is the caller's periodic maintenance,
    *     absence only costs skipping, never correctness).
    *
    * Isolation: snapshot (WriteSerializable) — the delete operates on
    * the manifest version it replayed; rows committed concurrently
    * survive. The commit verifies every hit file is STILL LIVE and
    * throws [[ConcurrentCommitException]] when a compaction/another
    * rewrite retired one mid-flight (retry against fresh state). The
    * driver-side state is file NAMES only (hit-file list — bounded by
    * the candidate count; a predicate matching the whole table rewrites
    * the whole table, which is inherent to copy-on-write, not to this
    * implementation). Time travel keeps the deleted rows readable at
    * prior versions until [[vacuum]].
    *
    * @return number of rows deleted.
    */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val (_, st0) = replay(spark, path)
    require(st0.live.nonEmpty || exists(spark, path), s"no such table: $path")
    val pred = org.apache.spark.sql.graftshim.PredicateBridge.normalize(predicate)
    // same syntactic contract as readWhere: a flagged table demands the
    // DML constrain the partition column (BigQuery requires it on DML
    // too)
    require(!st0.props.get(RequireFilterKey).exists(_ == "true") ||
        mentionsPartitionCol(pred),
      s"table $path sets requirePartitionFilter: the deleteWhere " +
        "predicate must reference the `date` partition column")
    if (st0.live.isEmpty) return 0L
    val (hitRels, deleted) = dmlHits(spark, path, st0, predicate, pred)
    if (hitRels.isEmpty) return 0L
    // tier 3: rewrite ONLY the hit files, keeping NULL-predicate rows
    val survivors = readFiles(spark, path, hitRels)
      .filter(!coalesce(predicate, lit(false)))
    val (adds, _) = writeData(spark, survivors, path)
    dmlCommit(spark, path, "deleteWhere", hitRels, addLines(adds))
    deleted
  }

  /** MERGE-ON-READ predicate DELETE — [[deleteWhere]]'s deletion-vector
    * sibling (Delta DV / Iceberg position-delete semantics, both public
    * designs): instead of rewriting every file that holds a matching
    * row, commit each hit file's matching ROW ORDINALS as a `D`
    * manifest line ([[FileDv]]). Write cost is O(deleted rows) — a
    * 10-row GDPR delete into a 1 GB file writes a ~15-byte vector, not
    * a gigabyte — at the price of one (file, ordinal) anti-join on
    * subsequent reads of the vectored files, until a rewrite
    * ([[compact]], [[compactMonth]], merge, CoW DML) folds the vector
    * back into data bytes and retires it with the file.
    *
    * Every read path honors vectors: read/readWhere/readPartition,
    * time travel (a vector is versioned state — [[readAt]] below the
    * delete still sees the rows; [[restoreTo]] rolls vectors back),
    * CDC ([[rowDiff]]/[[diffSnapshots]] treat a vector change as a
    * changed file), [[cloneTo]], the manifest fast counts (exact
    * cardinality subtraction), and [[readRelation]].
    *
    * Same tiers 1–2 as [[deleteWhere]] (stats+bloom manifest pruning,
    * then ONE pruned scan); tier 3 collects the matching ordinals —
    * bounded by `maxDeleteRows`, because the position set is
    * driver-held commit state by design (the merge-on-read contract:
    * SMALL deletes; a predicate matching half the table wants the CoW
    * [[deleteWhere]], and the guard says so rather than OOM). Vectors
    * are CUMULATIVE: a second delete on the same file re-encodes the
    * union inside the optimistic-commit retry loop, so concurrent DV
    * commits on one file converge instead of last-writer-losing-rows.
    * Snapshot isolation and liveness fencing are [[deleteWhere]]'s.
    *
    * @return number of rows deleted.
    */
  def deleteWhereMor(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      maxDeleteRows: Long = 10000000L): Long = {
    val (_, st0) = replay(spark, path)
    require(st0.live.nonEmpty || exists(spark, path), s"no such table: $path")
    val pred = org.apache.spark.sql.graftshim.PredicateBridge.normalize(predicate)
    require(!st0.props.get(RequireFilterKey).exists(_ == "true") ||
        mentionsPartitionCol(pred),
      s"table $path sets requirePartitionFilter: the deleteWhereMor " +
        "predicate must reference the `date` partition column")
    if (st0.live.isEmpty) return 0L
    val (hitRels, deleted) = dmlHits(spark, path, st0, predicate, pred)
    if (hitRels.isEmpty) return 0L
    require(deleted <= maxDeleteRows,
      s"deleteWhereMor on $path matches $deleted rows (> maxDeleteRows " +
        s"$maxDeleteRows): a delete this large wants the copy-on-write " +
        "deleteWhere (rewrite cost ≈ vector cost there), or raise the cap")
    // tier 3 (merge-on-read): the matching ordinals per hit file
    collectAndCommitDvs(spark, path, st0, hitRels, "deleteWhereMor",
      _.filter(predicate))
    deleted
  }

  /** KEYED merge-on-read DELETE — [[deleteWhereMor]] driven by a key
    * FRAME instead of a predicate (the CDC/right-to-erasure-by-id
    * path; [[mergeInto]]'s delete half without the file rewrite).
    * Pruning is [[mergeInto]]'s (exact `In` on the leading key up to
    * `maxInKeys` distinct values, [min,max] ranges on the rest, blooms
    * when installed); the matching ordinals semi-join the broadcast
    * key set and commit as vectors — an increment-sized delete costs
    * O(deleted rows) regardless of how many gigabytes the hit files
    * hold. Same cumulative-vector commit discipline and `maxDeleteRows`
    * guard as [[deleteWhereMor]].
    *
    * @return number of rows deleted.
    */
  def deleteKeysMor(spark: SparkSession, keys: DataFrame, path: String,
      keyCols: Seq[String], maxInKeys: Int = 10000,
      maxDeleteRows: Long = 10000000L): Long = {
    require(keyCols.nonEmpty, "deleteKeysMor needs at least one key column")
    val (_, st0) = replay(spark, path)
    require(st0.live.nonEmpty || exists(spark, path), s"no such table: $path")
    if (st0.live.isEmpty) return 0L
    val k = keys.select(keyCols.map(col): _*).distinct().persist()
    try {
      if (k.isEmpty) return 0L
      // the mergeInto prune predicate: exact In on the lead key when
      // small, ranges otherwise + per-trailing-column ranges
      val lead = keyCols.head
      val leadVals = k.select(col(lead)).distinct()
        .limit(maxInKeys + 1).collect().map(_.get(0))
      val leadPred =
        if (leadVals.length <= maxInKeys) col(lead).isin(leadVals.toSeq: _*)
        else {
          val mm = k.agg(min(col(lead)), max(col(lead))).head()
          col(lead).between(lit(mm.get(0)), lit(mm.get(1)))
        }
      val prunePred = keyCols.tail.foldLeft(leadPred) { (acc, c) =>
        val mm = k.agg(min(col(c)), max(col(c))).head()
        if (mm.isNullAt(0)) acc
        else acc && col(c).between(lit(mm.get(0)), lit(mm.get(1)))
      }
      val pred = org.apache.spark.sql.graftshim.PredicateBridge
        .normalize(prunePred)
      val statsPred = DdlOps.toPhysicalPred(pred, ddlMapping(st0))
      val candidates = st0.live.keys.filter { rel =>
        (st0.stats.get(rel).flatMap(FileStats.decode) match {
          case Some(p) => FileStats.mayMatch(p, statsPred)
          case None => true
        }) && st0.blooms.get(rel).forall(FileBloom.mayMatch(_, statsPred))
      }.toSeq.sorted
      if (candidates.isEmpty) return 0L
      val deleted = collectAndCommitDvs(spark, path, st0, candidates,
        "deleteKeysMor", df => df.join(broadcast(k), keyCols, "left_semi"),
        maxDeleteRows = maxDeleteRows)
      deleted
    } finally { k.unpersist(): Unit }
  }

  /** Shared merge-on-read tier 3: key the candidate scan with
    * (basename, row ordinal) metadata columns ONCE, subtract each
    * file's EXISTING vector with the same anti-join every read uses
    * (so collected positions are only the newly-deleted), apply the
    * caller's match transform, collect, and commit `D` lines — the
    * vector re-merged against CURRENT state inside the optimistic
    * retry loop, so concurrent DV commits on one file converge instead
    * of last-writer-losing-rows. Files with no matching row get no
    * line and keep their bytes and vector untouched.
    *
    * @return number of rows newly deleted.
    */
  private def collectAndCommitDvs(spark: SparkSession, path: String,
      st0: TxState, rels: Seq[String], opName: String,
      matchRows: DataFrame => DataFrame,
      maxDeleteRows: Long = Long.MaxValue): Long = {
    val keyed = spark.read.option("mergeSchema", "true")
        .parquet(rels.map(r => s"$path/$r"): _*)
      .withColumn("__graft_dv_file", col("_metadata.file_name"))
      .withColumn("__graft_dv_pos", col("_metadata.row_index"))
    val existing = rels.flatMap(r => st0.dvs.get(r).map(r -> _)).toMap
    val minus =
      if (existing.isEmpty) keyed
      else keyed.join(broadcast(dvPositions(spark, existing)),
        Seq("__graft_dv_file", "__graft_dv_pos"), "left_anti")
    val collected = matchRows(DdlOps.reconcileRead(minus, ddlMapping(st0)))
      .select(col("__graft_dv_file"), col("__graft_dv_pos"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (collected.isEmpty) return 0L
    require(collected.length <= maxDeleteRows,
      s"$opName on $path matches ${collected.length} rows (> " +
        s"maxDeleteRows $maxDeleteRows): a delete this large wants a " +
        "copy-on-write rewrite, or raise the cap")
    val byBase = collected.groupBy(_._1).map { case (b, xs) =>
      b -> xs.map(_._2).sorted
    }
    val relOfBase = rels.map(r =>
      r.substring(r.lastIndexOf('/') + 1) -> r).toMap
    val hitRels = byBase.keys.map(b => relOfBase.getOrElse(b,
      throw new IllegalStateException(
        s"cannot map scanned file back to a manifest entry: $b"))).toSeq
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      val retired = hitRels.filterNot(st.live.contains)
      if (retired.nonEmpty)
        throw new ConcurrentCommitException(
          s"$opName on $path planned against ${hitRels.size} " +
            s"files of which ${retired.size} were retired by a " +
            "concurrent rewrite — re-run against fresh state")
      val lines = byBase.toSeq.sortBy(_._1).map { case (base, ps) =>
        s"D ${FileDv.merge(st.dvs.get(relOfBase(base)), ps)} ${relOfBase(base)}"
      }
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1)
        return collected.length.toLong
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** Per-file deletion-vector cardinalities of the current snapshot —
    * the maintenance probe's view of outstanding merge-on-read debt
    * (a compaction sweep folds it back to zero).
    */
  def deletionVectorStats(spark: SparkSession,
      path: String): Map[String, Long] =
    replay(spark, path)._2.dvs.map { case (rel, p) =>
      rel -> FileDv.cardinality(p)
    }

  /** Copy-on-write predicate UPDATE — [[deleteWhere]]'s sibling for
    * `UPDATE t SET c = expr, … WHERE p`. Same three narrowing tiers
    * (manifest stats+bloom pruning → one pruned scan for the files that
    * actually hold TRUE-predicate rows → rewrite only those files), same
    * SQL semantics: a row is updated iff the predicate is TRUE — NULL
    * leaves it unchanged. All SET right-hand sides evaluate against the
    * OLD row (one projection; a SET of `a = b, b = a` swaps, it does
    * not chain), and each value is cast to the column's recorded type so
    * an update can never widen the table schema out from under readers.
    * Updating the `date` partition column is legal and moves the row to
    * its new partition (the rewrite's writer re-derives partition dirs
    * from the data). Rewritten files get fresh stats; bloom re-install
    * is periodic maintenance (absence only costs pruning). Snapshot
    * isolation and conflict fencing are [[deleteWhere]]'s, verbatim.
    *
    * @param sets column name → new-value expression (old-row scope).
    * @return number of rows updated.
    */
  def updateWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column]): Long = {
    val (_, st0) = replay(spark, path)
    require(st0.live.nonEmpty || exists(spark, path), s"no such table: $path")
    require(sets.nonEmpty, "updateWhere requires at least one SET column")
    val pred = org.apache.spark.sql.graftshim.PredicateBridge.normalize(predicate)
    require(!st0.props.get(RequireFilterKey).exists(_ == "true") ||
        mentionsPartitionCol(pred),
      s"table $path sets requirePartitionFilter: the updateWhere " +
        "predicate must reference the `date` partition column")
    if (st0.live.isEmpty) return 0L
    val (hitRels, updated) = dmlHits(spark, path, st0, predicate, pred)
    if (hitRels.isEmpty) return 0L
    val src = readFiles(spark, path, hitRels)
    val schema = src.schema
    sets.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"updateWhere SET references a column not in $path: $k"))
    val hit = coalesce(predicate, lit(false))
    val rewritten = src.withColumns(sets.map { case (name, value) =>
      name -> when(hit, value.cast(schema(name).dataType))
        .otherwise(col(name))
    })
    val (adds, _) = writeData(spark, rewritten, path)
    dmlCommit(spark, path, "updateWhere", hitRels, addLines(adds))
    updated
  }

  /** Bin-packing compaction — the OPTIMIZE / rewrite-small-files
    * maintenance op that keeps a 100 TB table's file count sane under
    * streaming/micro-batch appends. Planning is MANIFEST-ONLY (the
    * per-file sizes and partition dates are already recorded; no
    * listing, no scan): per partition date, live files smaller than
    * `smallBytes` are grouped and rewritten into
    * ceil(Σbytes / targetBytes) outputs via `coalesce` — a pure
    * read-and-concatenate with NO shuffle. Files at/above `smallBytes`
    * and partitions with fewer than `minFiles` small files keep their
    * bytes, stats, blooms, and z-order layout untouched.
    *
    * The swap is one metadata commit (adds + retirements): rows are
    * identical at the new version, time travel still reads the
    * pre-compaction layout, and the commit fences on every retired
    * file still being live — [[ConcurrentCommitException]] when a
    * concurrent rewrite (deleteWhere/merge/replace) got one first, so
    * compaction can never resurrect rows such a rewrite removed.
    * Rewritten outputs get fresh stats; blooms are periodic
    * maintenance ([[setBloomFilter]] re-install), absence only costs
    * pruning. At scale, pass `date` to compact the partition the
    * ingest just touched instead of sweeping the table (the per-date
    * rewrite is one Spark job each, driver loop bounded by the date
    * count).
    *
    * @return (files retired, files added) — (0, 0) when nothing
    *         qualified.
    */
  def compact(spark: SparkSession, path: String,
      date: Option[LocalDate] = None, targetBytes: Long = 128L << 20,
      smallBytes: Long = 0L, minFiles: Int = 2,
      zorderCols: Seq[String] = Nil): (Int, Int) =
    compactHooked(spark, path, date, targetBytes, smallBytes, minFiles,
      zorderCols, () => ())

  /** Test seam: `afterPlan` runs between the manifest plan and the
    * commit — the window [[dmlCommit]]'s fence protects.
    */
  private[tableops] def compactHooked(spark: SparkSession, path: String,
      date: Option[LocalDate], targetBytes: Long, smallBytes: Long,
      minFiles: Int, zorderCols: Seq[String],
      afterPlan: () => Unit): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val small = if (smallBytes > 0L) smallBytes else targetBytes / 2
    val (_, st0) = replay(spark, path)
    // a file carrying a deletion vector qualifies REGARDLESS of size
    // (and alone): compaction is what folds merge-on-read debt back
    // into data bytes — Delta's OPTIMIZE does the same with its DVs
    val byDate: Map[String, Seq[String]] = st0.live.toSeq
      .filter { case (rel, d) =>
        date.forall(_.toString == d) &&
          (st0.sizes.get(rel).exists(_ < small) || st0.dvs.contains(rel))
      }
      .groupBy(_._2)
      .collect { case (d, files)
          if files.size >= minFiles ||
            files.exists(f => st0.dvs.contains(f._1)) =>
        d -> files.map(_._1).sorted
      }
    if (byDate.isEmpty) return (0, 0)
    val adds = byDate.toSeq.sortBy(_._1).flatMap { case (_, rels) =>
      val bytes = rels.map(r => st0.sizes.getOrElse(r, 0L)).sum
      val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val src = readFiles(spark, path, rels)
      // packing alone is a shuffle-free concatenate; with zorderCols the
      // rewrite ALSO re-clusters (quantile-bucketed Morton layout — one
      // range exchange), turning compaction into the periodic OPTIMIZE
      // ZORDER BY pass. Re-cluster a whole partition by passing
      // smallBytes = Long.MaxValue so every file qualifies.
      val packed = if (zorderCols.isEmpty) src.coalesce(nOut)
        else ZOrder.layout(src, zorderCols, nOut)
      writeData(spark, packed, path)._1
    }
    val retiring = byDate.values.flatten.toSeq.sorted
    afterPlan()
    dmlCommit(spark, path, "compact", retiring, addLines(adds))
    (retiring.size, adds.size)
  }

  /** Re-grain one month: rewrite EVERY live file covering `ym` —
    * whatever generation it was written under — into files at the
    * table's CURRENT partition spec, in one fenced metadata swap. This
    * is the rewrite path [[setPartitionSpec]]'s mutation guards point
    * at, in both directions:
    *
    *  - spec = month: consolidates the month's per-day small files
    *    into month-grain files (the day→month compaction that
    *    motivates evolving at all — [[compact]] packs WITHIN a
    *    manifest value and cannot merge across days);
    *  - spec = day: splits a month-generation file back into per-day
    *    files, restoring metadata-only [[deletePartition]] /
    *    [[overwritePartition]] for its dates.
    *
    * Rows are identical at the new version; time travel still reads
    * the pre-rewrite layout; the commit fences on every retired file
    * still being live ([[ConcurrentCommitException]] otherwise, the
    * [[compact]] discipline).
    *
    * @return (files retired, files added); (0, 0) when the month is
    *         empty or already a single file at the current grain.
    */
  def compactMonth(spark: SparkSession, path: String,
      ym: java.time.YearMonth): (Int, Int) = {
    val mTok = f"${ym.getYear}%04d-${ym.getMonthValue}%02d"
    val (_, st0) = replay(spark, path)
    val rels = st0.live.toSeq.collect {
      case (rel, d) if d == mTok || d.startsWith(s"$mTok-") => rel
    }.sorted
    val spec = st0.props.getOrElse(PartitionSpecKey, "day")
    if (rels.isEmpty ||
      (rels.size == 1 && spec == "month" && st0.live(rels.head) == mTok))
      return (0, 0)
    val (adds, _) = writeData(spark, readFiles(spark, path, rels), path)
    dmlCommit(spark, path, "compactMonth", rels, addLines(adds))
    (rels.size, adds.size)
  }

  /** Shared tier-1/tier-2 planning for predicate DML: manifest-only
    * stats+bloom candidate pruning, then ONE pruned scan mapping each
    * scanned URI back to its manifest entry. Returns (files that hold
    * at least one TRUE-predicate row, total TRUE-row count).
    */
  private def dmlHits(spark: SparkSession, path: String, st0: TxState,
      predicate: org.apache.spark.sql.Column,
      pred: org.apache.spark.sql.catalyst.expressions.Expression):
      (Seq[String], Long) = {
    val statsPred = DdlOps.toPhysicalPred(pred, ddlMapping(st0))
    val candidates = st0.live.keys.filter { rel =>
      (st0.stats.get(rel).flatMap(FileStats.decode) match {
        case Some(payload) => FileStats.mayMatch(payload, statsPred)
        case None => true
      }) && st0.blooms.get(rel).forall(FileBloom.mayMatch(_, statsPred))
    }.toSeq.sorted
    if (candidates.isEmpty) return (Nil, 0L)
    // tier 2: which candidates actually hold TRUE-predicate rows
    val hitCounts = readFiles(spark, path, candidates)
      .withColumn("__f", input_file_name())
      .filter(predicate)
      .groupBy(col("__f")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    if (hitCounts.isEmpty) return (Nil, 0L)
    // input_file_name URIs differ from rel paths in scheme spelling,
    // and a shallow clone's rel entries contain `..` traversal the
    // scanner's URI has already resolved — compare NORMALIZED path
    // parts, not suffixes
    def normPath(p: String): String =
      java.nio.file.Paths.get(new Path(p).toUri.getPath).normalize().toString
    val byNorm = candidates.map(rel => normPath(s"$path/$rel") -> rel).toMap
    val hitRels = hitCounts.map { case (uri, _) =>
      byNorm.getOrElse(normPath(uri), throw new IllegalStateException(
        s"cannot map scanned file back to a manifest entry: $uri"))
    }.distinct.sorted
    (hitRels, hitCounts.map(_._2).sum)
  }

  /** Shared DML commit loop: verify every planned hit file is STILL
    * LIVE (throw [[ConcurrentCommitException]] when a concurrent
    * rewrite retired one — the caller re-plans against fresh state),
    * then commit `adds` + retirements with the usual CAS retry.
    */
  private def dmlCommit(spark: SparkSession, path: String, opName: String,
      hitRels: Seq[String], adds: Seq[String]): Unit = {
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      val retired = hitRels.filterNot(st.live.contains)
      if (retired.nonEmpty)
        throw new ConcurrentCommitException(
          s"$opName on $path planned against ${hitRels.size} files " +
            s"of which ${retired.size} were retired by a concurrent " +
            "rewrite — re-run against fresh state")
      val lines = adds ++ hitRels.map(r => s"R $r")
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1)
        return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  /** The self-replace needs no staging swap here: the plan's reads are
    * pinned to the manifest version its construction saw, the new files
    * land in a fresh uuid dir, and publish is one metadata commit. A
    * crash at any point leaves either the old manifest (orphan new
    * files) or the new one — never a window where the day is missing.
    */
  def stageSelfReplace(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): (Long, String) = {
    // The conflict-detection snapshot must reflect what the PLAN read,
    // not the manifest at stage entry: the dedup's content tier can run
    // minutes of Spark jobs between plan construction (which pinned its
    // file list) and this call, and a commit landing in that window
    // must be detected, not absorbed. df.inputFiles IS the pinned list
    // — filtered to this table and relativized, it recovers exactly the
    // snapshot the rewrite was computed from.
    val f = fs(spark, path)
    val prefix = f.makeQualified(new Path(path)).toString + "/"
    val pinned = df.inputFiles.filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix)).toSet
    val (_, live) = state(spark, path)
    val currentOfDate = live.collect {
      case (rel, d) if d == date.toString => rel
    }.toSet
    // a df that scans nothing under this table (externally-computed
    // replacement rows) has no plan snapshot — its conflict window
    // starts here, with stage-entry semantics
    val expected =
      if (pinned.isEmpty) currentOfDate
      else pinned.filter(r => live.get(r).contains(date.toString))
    // a pinned file already retired = a replace/delete raced the plan
    val retired = pinned.filterNot(live.contains)
    if (retired.nonEmpty || currentOfDate != expected)
      throw new ConcurrentCommitException(
        s"partition date=$date of $path changed while the rewrite was " +
          s"being computed (plan pinned ${pinned.size} files of this " +
          s"table, ${retired.size} since retired; date has " +
          s"${currentOfDate.size} live files vs ${expected.size} " +
          "planned) — re-run against fresh state")
    val obs = new org.apache.spark.sql.Observation()
    val (_, dir) = writeData(spark,
      df.observe(obs, count(lit(1)).as("rows")), path)
    // persisted as a sidecar INSIDE the (uncommitted) staged dir so
    // publish re-checks; crash-safe (orphaned with the staged files)
    val out = f.create(new Path(s"$path/$dir/$ExpectedSidecar"), false)
    try out.write((expected.toSeq.sorted.mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    // schema sidecar: publish is a separate call (possibly a separate
    // process — recovery) with no DataFrame in hand, so the staged
    // schema rides along for the publish commit's `H` line
    val outS = f.create(new Path(s"$path/$dir/$SchemaSidecar"), false)
    try outS.write(df.schema.json.getBytes(UTF_8)) finally outS.close()
    (obs.get("rows").asInstanceOf[Long], dir)
  }

  def publishSelfReplace(spark: SparkSession, path: String, date: LocalDate,
      token: String): Unit = {
    val adds = listData(spark, path, token)
    val f = fs(spark, path)
    val sidecar = new Path(s"$path/$token/$ExpectedSidecar")
    val expected =
      if (f.exists(sidecar)) {
        val in = f.open(sidecar)
        val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
        text.linesIterator.filter(_.nonEmpty).toSet
      } else liveOfDate(spark, path, date) // pre-sidecar staged dirs
    val schemaSidecar = new Path(s"$path/$token/$SchemaSidecar")
    val addedSchema =
      if (f.exists(schemaSidecar)) {
        val in = f.open(schemaSidecar)
        val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
        scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(text)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
      } else None
    commitReplace(spark, path, date, adds, expected, addedSchema)
  }

  /** Keyed MERGE — Delta-style upsert + delete applied as copy-on-write
    * at FILE granularity, with the manifest's column stats deciding
    * which files the change set can possibly touch:
    *
    *  - `changes` carries full table rows (same columns as the table,
    *    schema evolution allowed — new columns null-fill the kept base)
    *    plus, when `deleteCol` is set, a boolean column marking rows
    *    whose KEY should be deleted instead of upserted. Keys must be
    *    unique within one change set (checked — two change rows for one
    *    key have no deterministic merge result).
    *  - Files whose recorded min/max on the LEADING key column prove
    *    them disjoint from every change key are never read and never
    *    rewritten — at archive scale a daily CDC increment rewrites the
    *    files its keys land in (tight after range/Z-order clustered
    *    compaction), not the table. Change keys collect to the driver
    *    only up to `maxInKeys` distinct leading values (exact per-file
    *    `In` pruning); above that the prune falls back to the change
    *    set's [min,max] range — still sound, just coarser.
    *  - The rewrite is one broadcast anti-join: touched base rows
    *    minus changed keys, union the upsert rows. The change set is
    *    increment-sized by assumption and rides the broadcast; the
    *    touched files stream map-side.
    *  - Commit retires exactly the touched files and publishes the new
    *    ones atomically. Conflict detection is LOGICAL, like Delta's:
    *    a concurrent commit that added or retired a file overlapping
    *    the change keys throws [[ConcurrentCommitException]] (the
    *    outcome algebra maps it to Retry — replan against fresh state);
    *    concurrent commits on disjoint key ranges are absorbed and the
    *    merge commits on top of them.
    *
    * Returns [[MergeStats]]; an empty change set is a no-op (no commit).
    */
  def mergeInto(spark: SparkSession, changes: DataFrame, path: String,
      keyCols: Seq[String], deleteCol: Option[String] = None,
      maxInKeys: Int = 10000): MergeStats =
    mergeImpl(spark, changes, path, keyCols, deleteCol, maxInKeys, None)
      .getOrElse(sys.error("unreachable: non-txn merge never skips"))

  /** Idempotent merge for streaming CDC apply (foreachBatch): the commit
    * carries `T appId batchId`, and a batch at-or-below the app's
    * committed watermark returns None without writing — a restarted
    * stream replaying its last micro-batch cannot double-apply, which
    * upgrades at-least-once replay to exactly-once MERGED contents (the
    * upsert itself is idempotent, but a replayed DELETE racing a
    * concurrent re-insert, or replayed non-idempotent aggregates, are
    * not — the watermark closes that).
    */
  def mergeIntoTxn(spark: SparkSession, changes: DataFrame, path: String,
      keyCols: Seq[String], deleteCol: Option[String], appId: String,
      batchId: Long, maxInKeys: Int = 10000): Option[MergeStats] = {
    require(!appId.exists(_.isWhitespace), "appId must not contain whitespace")
    if (lastTxn(spark, path, appId) >= batchId) return None
    mergeImpl(spark, changes, path, keyCols, deleteCol, maxInKeys,
      Some((appId, batchId)))
  }

  /** Test seam: like [[mergeInto]], with `afterPlan` fired between the
    * plan's manifest snapshot and the commit — the multi-driver window
    * the logical conflict check exists for.
    */
  private[tableops] def mergeIntoHooked(spark: SparkSession,
      changes: DataFrame, path: String, keyCols: Seq[String],
      deleteCol: Option[String], afterPlan: () => Unit): MergeStats =
    mergeImpl(spark, changes, path, keyCols, deleteCol, 10000, None,
      afterPlan)
      .getOrElse(sys.error("unreachable: non-txn merge never skips"))

  private def mergeImpl(spark: SparkSession, changes: DataFrame,
      path: String, keyCols: Seq[String], deleteCol: Option[String],
      maxInKeys: Int, txn: Option[(String, Long)],
      afterPlan: () => Unit = () => ()): Option[MergeStats] = {
    // a not-yet-created table is legal (CDC bootstrap): the merge
    // degenerates to an append of the upsert rows at v1
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    deleteCol.foreach(c => require(!keyCols.contains(c),
      "deleteCol cannot be a key column"))
    val ch = changes.persist()
    try {
      val dupKeys = ch.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
      require(dupKeys == 0L,
        s"change set has duplicate keys on (${keyCols.mkString(", ")}) — " +
          "merge result would be nondeterministic")
      val del = deleteCol.map(c => ch.filter(coalesce(col(c), lit(false))))
        .getOrElse(ch.limit(0))
      val ups = deleteCol
        .map(c => ch.filter(!coalesce(col(c), lit(false))).drop(c))
        .getOrElse(ch)
      val delKeys = del.count()
      val upsRows = ups.count()
      if (delKeys + upsRows == 0L)
        return Some(MergeStats(0, state(spark, path)._2.size, 0L, 0L, 0L))
      // prune predicate: exact In on the leading key up to maxInKeys
      // distinct values ([min,max] range above), AND a [min,max] range
      // conjunct per REMAINING key column — for a compound key whose
      // leading column is low-cardinality (e.g. (date, id)), the
      // trailing ranges carry the pruning the lead alone can't
      val lead = keyCols.head
      val leadVals = ch.select(col(lead)).distinct()
        .limit(maxInKeys + 1).collect().map(_.get(0))
      val leadPred =
        if (leadVals.length <= maxInKeys) col(lead).isin(leadVals.toSeq: _*)
        else {
          val mm = ch.agg(min(col(lead)).as("lo"), max(col(lead)).as("hi")).head()
          col(lead).between(lit(mm.get(0)), lit(mm.get(1)))
        }
      val prunePred = keyCols.tail.foldLeft(leadPred) { (acc, c) =>
        val mm = ch.agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
        if (mm.isNullAt(0)) acc
        else acc && col(c).between(lit(mm.get(0)), lit(mm.get(1)))
      }
      val pred = org.apache.spark.sql.graftshim.PredicateBridge
        .normalize(prunePred)
      def overlap(st: TxState): Set[String] = st.live.keys.filter { rel =>
        (st.stats.get(rel).flatMap(FileStats.decode) match {
          case Some(p) => FileStats.mayMatch(p, pred)
          case None => true // unprovable: must be treated as touched
        }) &&
        // bloom layer: a scattered change set (every file's key RANGE
        // overlaps) still rewrites only the files that may actually
        // CONTAIN a change key
        st.blooms.get(rel).forall(FileBloom.mayMatch(_, pred))
      }.toSet
      val (v0, st0) = replay(spark, path)
      if (txn.exists { case (app, b) => st0.txns.getOrElse(app, -1L) >= b })
        return None
      val touched = overlap(st0)
      afterPlan()
      val chKeys = ch.select(keyCols.map(col): _*)
      val survivors =
        if (touched.isEmpty) None
        else Some(readFiles(spark, path, touched.toSeq.sorted)
          .join(broadcast(chKeys), keyCols, "left_anti"))
      val out = survivors match {
        case Some(s) => s.unionByName(ups, allowMissingColumns = true)
        case None => ups
      }
      val obs = new org.apache.spark.sql.Observation()
      val (adds, _) =
        writeData(spark, out.observe(obs, count(lit(1)).as("rows")), path)
      val rowsWritten = obs.get("rows").asInstanceOf[Long]
      val f = fs(spark, path)
      var attempts = 0
      while (attempts < MaxCommitAttempts) {
        val (v, st) = replay(spark, path)
        if (txn.exists { case (app, b) => st.txns.getOrElse(app, -1L) >= b })
          return None // duplicate applier won the race after our plan
        val overlapNow = overlap(st)
        if (overlapNow != touched)
          throw new ConcurrentCommitException(
            s"merge on (${keyCols.mkString(", ")}) of $path planned " +
              s"against ${touched.size} key-overlapping files at " +
              s"v$v0, but v$v has ${overlapNow.size} — a concurrent " +
              "commit touched the change keys; re-run against fresh state")
        val lines = addLines(adds) ++
          touched.toSeq.sorted.map(r => s"R $r") ++
          (if (adds.nonEmpty) schemaLines(st.schemaJson, out.schema) else Nil) ++
          txn.map { case (app, b) => s"T $app $b" }.toSeq
        if (tryCommit(f, path, v + 1, lines)) {
          maybeCheckpoint(spark, path, v + 1)
          return Some(MergeStats(touched.size, st.live.size - touched.size,
            rowsWritten, upsRows, delKeys))
        }
        attempts += 1
      }
      throw new IllegalStateException(
        s"commit contention: $MaxCommitAttempts failed attempts on $path")
    } finally { ch.unpersist() }
  }

  /** The manifest gives the file list AND (for commits since the `F`
    * line) each file's length — so the compaction sweep's sizing is a
    * pure manifest read, zero per-file round trips. Only files from
    * pre-`F` commits fall back to one status call each, and they age
    * out with their partitions' next rewrite. At archive scale this is
    * the difference between a maintenance sweep that costs one log
    * replay and one that costs a LIST+HEAD per file on an object store.
    */
  def partitionFiles(spark: SparkSession, path: String,
      date: LocalDate): Seq[(String, Long)] = {
    lazy val f = fs(spark, path)
    val st = replay(spark, path)._2
    st.live.collect {
      case (rel, d) if d == date.toString =>
        val p = new Path(s"$path/$rel")
        (p.toString,
          st.sizes.getOrElse(rel, f.getFileStatus(p).getLen))
    }.toSeq
  }

  /** ONE manifest replay for the whole table — the live map already
    * carries every file's date.
    */
  def partitionFileCounts(spark: SparkSession,
      path: String): Map[LocalDate, Int] =
    state(spark, path)._2.values.groupBy(identity).flatMap { case (d, fs) =>
      parseGrain(d).map(_ -> fs.size)
    }

  /** Nothing to recover: uncommitted files are invisible by design. */
  def recoverSelfReplace(spark: SparkSession, path: String, date: LocalDate): Unit = ()

  /** No recovery window anywhere: commits are atomic. */
  def recoverAllSelfReplace(spark: SparkSession, path: String): Unit = ()

  /** No locks: readers pin manifest versions (snapshot isolation),
    * writers never share directories, commits are atomic create-if-
    * absent. This is the property that makes the backend safe across
    * DRIVERS, not just threads.
    */
  def withTableLocks[T](reads: Seq[String], writes: Seq[String])(body: => T): T =
    body

  /** Optimistic commit: compute the delta against the latest live set,
    * try to own the next version number, recompute and retry on
    * collision. `mk` returns (adds as (rel, date), removes as rel).
    * `addedSchema` is the schema of the added files (for the `H` line);
    * remove-only commits leave the recorded schema untouched.
    */
  private def commitRetry(spark: SparkSession, path: String,
      addedSchema: Option[org.apache.spark.sql.types.StructType] = None)(
      mk: Map[String, String] => (Seq[AddEntry], Seq[String])): Unit = {
    val f = fs(spark, path)
    var attempts = 0
    while (attempts < MaxCommitAttempts) {
      val (v, st) = replay(spark, path)
      val (adds, removes) = mk(st.live)
      if (adds.isEmpty && removes.isEmpty) return
      val lines = addLines(adds) ++ removes.map(r => s"R $r") ++
        (if (adds.nonEmpty)
          addedSchema.toSeq.flatMap(s => schemaLines(st.schemaJson, s))
        else Nil)
      if (tryCommit(f, path, v + 1, lines)) {
        maybeCheckpoint(spark, path, v + 1); return
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"commit contention: $MaxCommitAttempts failed attempts on $path")
  }

  private def tryCommit(f: FileSystem, path: String, version: Long,
      lines: Seq[String]): Boolean =
    tryCommit(f, path,
      new Path(s"$path/$LogDir", f"v$version%020d.txt"), lines)

  private def tryCommit(f: FileSystem, path: String, dest: Path,
      lines: Seq[String]): Boolean = {
    val logDir = new Path(s"$path/$LogDir")
    f.mkdirs(logDir)
    if (f.exists(dest)) return false
    // full write to a temp name first, so a reader never sees a partial
    // manifest; then publish with the scheme's atomic create-if-absent
    // (link(2) locally, no-overwrite rename on HDFS, a registered
    // conditional-put committer on object stores — see [[LogPublisher]];
    // unknown schemes fail loudly there instead of losing a race).
    // The payload ends with the `E` terminator line: [[replay]] treats a
    // manifest without it as a truncated in-flight write, never a
    // committed state — so even a publisher that exposes partial bytes
    // (a store without atomic whole-object visibility) cannot make a
    // reader silently lose the commit's files.
    val publisher = LogPublisher.forScheme(f.getScheme) // fail fast
    val tmp = new Path(logDir, s".tmp-${UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(((lines :+ Terminator).mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    val won = publisher.publish(f, tmp, dest)
    // on a hard-link win or any loss the temp name still exists; a
    // successful rename already consumed it (delete is then a no-op)
    f.delete(tmp, false)
    won
  }
}

object TxWarehouse {
  private val LogDir = "_graft_log"
  private val DataDir = "_graft_data"

  /** [[TxWarehouse.fastColumnStats]] result: manifest-only exact
    * aggregates. min/max None ⇔ the column holds no non-null value in
    * any live file.
    */
  final case class FastColumnStats(rows: Long, nonNull: Long,
      min: Option[Long], max: Option[Long])

  /** Final line of every committed manifest (delta or checkpoint).
    * [[parseInto]] skips it like any unknown line type (old readers of
    * a terminated log behave identically); `replay` requires it before
    * treating a file's content as committed — a manifest whose visible
    * bytes do not end in the terminator is an in-flight write, not a
    * state. A truncation that happens to cut exactly at the terminator
    * boundary yields a file that IS complete, so there is no
    * false-accept window.
    */
  private val Terminator = "E"
  private def isTerminated(text: String): Boolean =
    text == "E\n" || text.endsWith("\nE\n")
  private val PartCol = "__p_date"
  private val RequireFilterKey = "requirePartitionFilter"
  private val PartitionSpecKey = "graft.partitionSpec"
  private val BucketCol = "__p_bucket"
  private val BucketSpecKey = "graft.bucketSpec"

  /** `<n>:<col>` property token -> (n, col); None on malformed. */
  private def decodeBucketSpec(tok: String): Option[(Int, String)] = {
    val i = tok.indexOf(':')
    if (i <= 0 || i == tok.length - 1) None
    else scala.util.Try(tok.substring(0, i).toInt).toOption
      .map(n => (n, tok.substring(i + 1)))
  }

  /** Reference-counted session override of
    * `spark.sql.parquet.outputTimestampType`: the conf is SESSION-wide,
    * so two warehouse writes overlapping in one session with a naive
    * save/restore corrupt each other — the second writer "saves" the
    * first's TIMESTAMP_MICROS override and restores it as the caller's
    * value, leaking MICROS into the session forever (observed in the
    * concurrent-merge spec). First acquirer saves the caller's value
    * and sets MICROS; only the last releaser restores. What this CANNOT
    * fix: the caller's own unrelated parquet write racing a warehouse
    * write still observes MICROS while any warehouse write is in
    * flight — session confs have no per-write scope (see [[writeData]]).
    */
  private object TsTypeOverride {
    private val key = "spark.sql.parquet.outputTimestampType"
    // identity map: sessions have no value-equality contract
    private val inflight =
      new java.util.IdentityHashMap[SparkSession, (Int, Option[String])]()
    def acquire(spark: SparkSession): Unit = inflight.synchronized {
      inflight.get(spark) match {
        case null =>
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, "TIMESTAMP_MICROS")
          inflight.put(spark, (1, prev))
        case (n, prev) => inflight.put(spark, (n + 1, prev))
      }
      ()
    }
    def release(spark: SparkSession): Unit = inflight.synchronized {
      inflight.get(spark) match {
        case null => // unbalanced release: nothing to restore
        case (1, prev) =>
          inflight.remove(spark)
          prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        case (n, prev) => inflight.put(spark, (n - 1, prev))
      }
      ()
    }
  }
  private val ExpectedSidecar = "_expected_removes.txt"
  private val SchemaSidecar = "_staged_schema.json"
  private val MaxCommitAttempts = 50

  /** Replayed manifest state: live rel-file → date, per-writer txn
    * watermarks, per-file stats payloads, and per-file byte lengths
    * (files without stats/sizes — pre-stats commits, unreadable
    * footers — are simply absent from those maps).
    */
  private final case class TxState(live: Map[String, String],
      txns: Map[String, Long], stats: Map[String, String],
      sizes: Map[String, Long], blooms: Map[String, String],
      props: Map[String, String], schemaJson: Option[String],
      dvs: Map[String, String])
  private object TxState {
    val empty: TxState =
      TxState(Map.empty, Map.empty, Map.empty, Map.empty, Map.empty,
        Map.empty, None, Map.empty)
  }

  /** One to-be-committed file: manifest `A` entry + optional `S` stats
    * + `F` length + optional `B` bloom.
    */
  private final case class AddEntry(rel: String, date: String,
      stats: Option[String], len: Long, bloom: Option[String] = None)
}
