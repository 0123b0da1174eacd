package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The durable CONSUMER of [[TxWarehouse.readChangesBetween]]: tails a
  * tx table into a downstream export directory at O(new files) per
  * sync. `readChangesBetween` gives the increment; this object gives
  * the cursor discipline that makes repeated polling exactly-once —
  * the piece a real 100 TB deployment needs before "incremental
  * consumption" is an operation rather than an API (reference analog:
  * the gardener's downstream BigQuery materializations are re-derived
  * per day-partition, `cloud/bq/ops.go:234-253`; with a manifest log
  * the same freshness costs only the new files).
  *
  * Export layout under `exportRoot`:
  * {{{
  *   _chain/from_<%020d>   marker: "<to> <dataDirName|- >"
  *   data/<uuid>/          parquet rows of the (from, to] increment
  * }}}
  *
  * The marker chain starting at `from_0` DEFINES the export's content;
  * data directories not referenced by the chain are invisible garbage.
  * Each marker is published create-if-absent through the scheme's
  * [[LogPublisher]] — the same seam the tx commit log rides, so on an
  * object store the cursor advance is a conditional put. Keying the
  * marker by the FROM version makes the chain unique by construction:
  * of N racing exporters extending the same cursor position, exactly
  * one marker lands, so no version range can be exported twice — the
  * failure mode a naive "remember the last version in a file" cursor
  * has on every store where rename overwrites.
  *
  * Crash windows: data is staged BEFORE the marker, so a crash between
  * the two leaves an orphan dir and an unchanged chain — the next sync
  * re-reads the same range into a fresh dir and publishes; replaying
  * converges. [[vacuumOrphans]] reclaims unreferenced dirs past a
  * reader-safety age, mirroring [[TxWarehouse.vacuum]].
  */
object IncrementalExport {

  private val ChainDir = "_chain"
  private val DataDir = "data"

  /** One committed increment: rows of table versions (from, to],
    * stored under `data/<dir>` (dir None = the increment added no
    * parquet files — e.g. an empty micro-batch commit).
    */
  final case class Increment(from: Long, to: Long, dir: Option[String])

  /** Result of one [[sync]] call: the chain extension that is now
    * committed for (from, to] — `applied` false when this call lost
    * the publish race to a rival exporter (the range is still
    * exported, by the rival) or when there was nothing new.
    */
  final case class SyncResult(from: Long, to: Long, applied: Boolean)

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def markerPath(root: String, from: Long): Path =
    new Path(f"$root/$ChainDir/from_$from%020d")

  private def readMarker(f: FileSystem, p: Path): Option[(Long, Option[String])] = {
    if (!f.exists(p)) return None
    val in = f.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    body.split(' ') match {
      case Array(to, "-") => Some((to.toLong, None))
      case Array(to, dir) => Some((to.toLong, Some(dir)))
      case _ => None // torn marker: only a winner that died mid-copy —
                     // treated as chain end; replay re-exports the range
    }
  }

  /** The committed increment chain, in version order from 0. */
  def chain(spark: SparkSession, exportRoot: String): Seq[Increment] =
    walkFrom(fs(spark, exportRoot), exportRoot, 0L)

  private def walkFrom(f: FileSystem, exportRoot: String,
      start: Long): Seq[Increment] = {
    val out = scala.collection.mutable.ListBuffer[Increment]()
    var from = start
    var next = readMarker(f, markerPath(exportRoot, from))
    while (next.isDefined) {
      val (to, dir) = next.get
      out += Increment(from, to, dir)
      from = to
      next = readMarker(f, markerPath(exportRoot, from))
    }
    out.toList
  }

  /** Cursor-position cache bounding the steady-state walk to O(1):
    * `_chain/head` holds the FROM of a recently published marker. The
    * hint is advisory, never authoritative — it is overwritten
    * non-atomically (last writer wins), and a reader VALIDATES it by
    * requiring that marker `from_<hint>` exists before trusting it.
    * Every existing marker is on the single chain by construction
    * (publishes are create-if-absent keyed by a from obtained from a
    * validated walk), so a validated hint can only be a rewind, never
    * a fork: stale ⇒ a slightly longer walk forward; torn/corrupt ⇒
    * ignored, full walk from 0. ExportProbe pins the effect — without
    * it the poll cost grows linearly in chain length.
    */
  private def headHint(f: FileSystem, exportRoot: String): Long = {
    val p = new Path(s"$exportRoot/$ChainDir/head")
    try {
      if (!f.exists(p)) return 0L
      val in = f.open(p)
      val s =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val v = s.toLong
      if (v > 0L && f.exists(markerPath(exportRoot, v))) v else 0L
    } catch { case _: Exception => 0L }
  }

  private def writeHeadHint(f: FileSystem, exportRoot: String,
      from: Long): Unit =
    try {
      val p = new Path(s"$exportRoot/$ChainDir/head")
      val out = f.create(p, true)
      try out.write(from.toString.getBytes(UTF_8)) finally out.close()
    } catch { case _: Exception => () } // a lost hint is only a slower walk

  /** Highest table version the export has committed (0 = nothing). */
  def exportedVersion(spark: SparkSession, exportRoot: String): Long = {
    val f = fs(spark, exportRoot)
    val start = headHint(f, exportRoot)
    walkFrom(f, exportRoot, start).lastOption.map(_.to).getOrElse(start)
  }

  /** Advance the export to the table's current version: read ONLY the
    * files that became live since the cursor, stage them under a fresh
    * data dir, and publish the chain marker. Cost is O(files in the
    * increment) — independent of table depth. Safe to call from any
    * number of exporters on any schedule; each version range commits
    * exactly once.
    */
  def sync(spark: SparkSession, wh: TxWarehouse, tablePath: String,
      exportRoot: String): SyncResult = {
    val from = exportedVersion(spark, exportRoot)
    val to = wh.currentVersion(spark, tablePath)
    if (to <= from) return SyncResult(from, from, applied = false)
    val f = fs(spark, exportRoot)
    val inc = wh.readChangesBetween(spark, tablePath, from, to)
    // the `inc-` prefix separates increment dirs from `ckpt-`
    // consolidations so readExportStream's glob can tail increments
    // only (a checkpoint re-packages rows the stream already saw)
    val dirName = s"inc-${UUID.randomUUID()}"
    val dataPath = new Path(s"$exportRoot/$DataDir/$dirName")
    // a file-less increment (e.g. an empty exactly-once micro-batch's
    // T-line commit) reads as a schemaless frame parquet cannot write;
    // its chain link is dir-less — nothing to stage
    if (inc.schema.nonEmpty) inc.write.parquet(dataPath.toString)
    // a 0-row increment writes no part files; record it as dir-less so
    // readExport never points Spark at an empty directory
    val hasParquet = f.exists(dataPath) &&
      f.listStatus(dataPath).exists(_.getPath.getName.endsWith(".parquet"))
    val body = s"$to ${if (hasParquet) dirName else "-"}"
    val tmp = new Path(s"$exportRoot/$ChainDir/.tmp-$dirName")
    f.mkdirs(tmp.getParent)
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    val dest = markerPath(exportRoot, from)
    val won = LogPublisher.forScheme(f.getScheme).publish(f, tmp, dest)
    f.delete(tmp, false)
    if (!won) { f.delete(dataPath, true); () } // rival extended the chain
    else writeHeadHint(f, exportRoot, from) // O(1) next walk (advisory)
    SyncResult(from, to, applied = won)
  }

  /** Everything the export has committed, as one DataFrame (schema
    * merged across increments — the table may have evolved between
    * syncs). Reads the newest checkpoint's consolidated directory plus
    * only the increments past it, so read amplification is bounded by
    * the checkpoint cadence, not the chain's lifetime length. Empty
    * chain reads as an empty 0-column frame.
    */
  def readExport(spark: SparkSession, exportRoot: String): DataFrame = {
    val f = fs(spark, exportRoot)
    val (ckptDirs, start) = bestCheckpoint(f, exportRoot) match {
      case Some((to, dir)) => (Seq(dir), to)
      case None => (Nil, 0L)
    }
    val dirs = (ckptDirs ++ walkFrom(f, exportRoot, start).flatMap(_.dir))
      .map(d => s"$exportRoot/$DataDir/$d")
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** The export as a live STREAM: increments are immutable parquet
    * dirs that only ever appear, which is exactly Structured
    * Streaming's file-source contract — so a downstream job can
    * `readExportStream → transform → writeStream` and receive each
    * synced increment's rows exactly once (the file source's own
    * checkpoint tracks seen files). The glob tails `inc-*` dirs ONLY:
    * a `ckpt-` consolidation re-packages rows the stream already
    * processed and must stay invisible to it, and [[vacuumCompacted]]
    * deleting covered increments is safe because the file source never
    * re-reads files it has committed. Schema is pinned from the
    * current committed content (file streams cannot infer), so start
    * the stream after the first sync; increments appended with MORE
    * columns than the pinned schema surface when the stream restarts
    * with a re-pinned schema, same as any file-source evolution.
    *
    * A stream STARTED FRESH sees only the increments still on disk: if
    * maintenance already compacted-and-vacuumed a prefix, bootstrap
    * with a batch [[readExport]] first and stream from then on — the
    * same history/tail split every log-compacted feed has.
    */
  def readExportStream(spark: SparkSession, exportRoot: String): DataFrame = {
    val schema = readExport(spark, exportRoot).schema
    require(schema.nonEmpty,
      s"export at $exportRoot has no committed content yet; start the " +
        "stream after the first sync")
    spark.readStream.schema(schema)
      .parquet(s"$exportRoot/$DataDir/inc-*")
  }

  private def ckptPath(root: String, to: Long): Path =
    new Path(f"$root/$ChainDir/ckpt_$to%020d")

  /** Newest committed checkpoint: (covered-up-to version, data dir). */
  private def bestCheckpoint(f: FileSystem,
      exportRoot: String): Option[(Long, String)] = {
    val dir = new Path(s"$exportRoot/$ChainDir")
    if (!f.exists(dir)) return None
    f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("ckpt_"))
      .flatMap(n => scala.util.Try(n.stripPrefix("ckpt_").toLong).toOption)
      .sorted.reverse
      .flatMap { to =>
        val in = f.open(ckptPath(exportRoot, to))
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        // a winner that died mid-copy leaves an empty/torn body (or a
        // truncated dir name that matches no directory); skip to the
        // next-newest intact checkpoint
        if (body.nonEmpty && !body.contains(' ') &&
            f.exists(new Path(s"$exportRoot/$DataDir/$body")))
          Some((to, body))
        else None
      }
      .headOption
  }

  /** Consolidate the chain's current prefix into ONE data directory,
    * published as checkpoint marker `_chain/ckpt_<to>` through the
    * scheme's [[LogPublisher]] — exactly one checkpoint per covered
    * version ever commits, racing compactors lose cleanly. After a
    * checkpoint, [[readExport]] opens the consolidated dir plus only
    * the increments past it: the analog of [[TxWarehouse]]'s own
    * checkpoint, aimed at the export's two lifetime liabilities —
    * per-increment small files and O(links) read fan-in. The chain
    * MARKERS stay (they are the cursor's correctness record and are
    * O(bytes)); the covered increments' data dirs become reclaimable
    * via [[vacuumCompacted]]. Returns the covered version, or None if
    * there was nothing new to checkpoint.
    */
  def checkpointExport(spark: SparkSession, exportRoot: String): Option[Long] = {
    val f = fs(spark, exportRoot)
    val head = exportedVersion(spark, exportRoot)
    if (head == 0L) return None
    if (bestCheckpoint(f, exportRoot).exists(_._1 >= head)) return None
    val df = readExport(spark, exportRoot)
    val dirName = s"ckpt-${UUID.randomUUID()}"
    val dataPath = new Path(s"$exportRoot/$DataDir/$dirName")
    if (df.schema.nonEmpty) df.write.parquet(dataPath.toString)
    else return None // nothing but dir-less links: no data to compact
    val tmp = new Path(s"$exportRoot/$ChainDir/.tmp-$dirName")
    val out = f.create(tmp, true)
    try out.write(dirName.getBytes(UTF_8)) finally out.close()
    val won = LogPublisher.forScheme(f.getScheme)
      .publish(f, tmp, ckptPath(exportRoot, head))
    f.delete(tmp, false)
    if (!won) { f.delete(dataPath, true); return None } // rival won
    Some(head)
  }

  /** Reclaim data dirs the newest committed checkpoint supersedes:
    * increment dirs it fully covers, and older checkpoints' dirs —
    * both behind the age guard (readers resolving a pre-checkpoint
    * view may still hold their file lists — same retention discipline
    * as [[TxWarehouse.vacuum]]). Chain and checkpoint MARKERS are never
    * touched (the cursor's correctness record; a superseded checkpoint
    * marker whose dir is gone is skipped by validation). Returns the
    * number of dirs removed.
    */
  def vacuumCompacted(spark: SparkSession, exportRoot: String,
      minAgeMillis: Long = 24L * 3600 * 1000): Long = {
    val f = fs(spark, exportRoot)
    bestCheckpoint(f, exportRoot) match {
      case None => 0L
      case Some((to, ckptDir)) =>
        val cutoff = System.currentTimeMillis() - minAgeMillis
        var removed = 0L
        def rm(d: String): Unit = {
          val p = new Path(s"$exportRoot/$DataDir/$d")
          if (f.exists(p) && f.getFileStatus(p).getModificationTime < cutoff) {
            f.delete(p, true)
            removed += 1
          }
        }
        chain(spark, exportRoot).takeWhile(_.to <= to).flatMap(_.dir)
          .filter(_ != ckptDir).foreach(rm)
        f.listStatus(new Path(s"$exportRoot/$ChainDir")).toSeq
          .map(_.getPath.getName).filter(_.startsWith("ckpt_"))
          .flatMap(n => scala.util.Try(n.stripPrefix("ckpt_").toLong).toOption)
          .filter(_ < to)
          .foreach { old =>
            val in = f.open(ckptPath(exportRoot, old))
            val body =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            if (body.nonEmpty && body != ckptDir) rm(body)
          }
        removed
    }
  }

  /** Reclaim data dirs the chain does not reference — losers of publish
    * races and stage-then-crash leftovers. The age guard keeps an
    * in-flight sync's staging safe, same discipline as
    * [[TxWarehouse.vacuum]]. Returns the number of dirs removed.
    */
  def vacuumOrphans(spark: SparkSession, exportRoot: String,
      minAgeMillis: Long = 24L * 3600 * 1000): Long = {
    val f = fs(spark, exportRoot)
    val dataRoot = new Path(s"$exportRoot/$DataDir")
    if (!f.exists(dataRoot)) return 0L
    // every committed checkpoint's dir is live too — including
    // superseded ones, which are the fallback if a newer checkpoint
    // marker turns out torn; [[vacuumCompacted]] owns reclaiming
    // covered increments, this method only collects never-committed
    // staging
    val ckptDirs = {
      val dir = new Path(s"$exportRoot/$ChainDir")
      if (!f.exists(dir)) Set.empty[String]
      else f.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("ckpt_"))
        .flatMap { n =>
          val in = f.open(new Path(dir, n))
          val body =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          if (body.nonEmpty) Some(body) else None
        }.toSet
    }
    val live = chain(spark, exportRoot).flatMap(_.dir).toSet ++ ckptDirs
    val cutoff = System.currentTimeMillis() - minAgeMillis
    var removed = 0L
    f.listStatus(dataRoot).foreach { st =>
      if (st.isDirectory && !live.contains(st.getPath.getName) &&
          st.getModificationTime < cutoff) {
        f.delete(st.getPath, true)
        removed += 1
      }
    }
    removed
  }
}
