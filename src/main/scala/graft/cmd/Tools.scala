package graft.cmd

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.model.{Datasets, Job}
import graft.tableops.{TableOps, Warehouse}

/** Debug CLIs mirroring the reference's cmd/load/load.go and
  * cmd/copy/copy.go: run a single table op against a warehouse without the
  * orchestrator — for backfills and by-hand debugging.
  */
private[cmd] object ToolSession {
  def spark(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def job(datatype: String, date: String, tmp: String, raw: String,
      join: String): Job =
    Job("cli", "cli", datatype, LocalDate.parse(date),
      datasets = Datasets(tmp, raw, join))
}

/** Usage: LoadTool <warehouseRoot> <datatype> <YYYY-MM-DD> <jsonGlob>
  *                 [tmpDataset] [backend]
  */
object LoadTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date, glob) = args.take(4)
    val tmp = if (args.length > 4) args(4) else s"tmp_cli"
    val backend = if (args.length > 5) args(5) else "path"
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, tmp, "raw_cli", ""),
      Warehouse.forName(backend, whRoot))
    val stats = ops.loadToTmp(glob)
    println(s"loaded ${stats.detail}")
  }
}

/** Usage: ReplayQuarantineTool <warehouseRoot> <datatype> <YYYY-MM-DD>
  *                              [tmpDataset] [backend]
  * Re-drives the date's quarantined raw lines through the load parse
  * (TableOps.replayQuarantine): fixed lines land in tmp, still-bad
  * lines stay quarantined. Run after correcting the quarantine
  * partition's lines (or with corrected upstream expectations).
  */
object ReplayQuarantineTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date) = args.take(3)
    val tmp = if (args.length > 3) args(3) else "tmp_cli"
    val backend = if (args.length > 4) args(4) else "path"
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, tmp, "raw_cli", ""),
      Warehouse.forName(backend, whRoot))
    val stats = ops.replayQuarantine()
    println(s"replayed ${stats.detail}")
  }
}

/** Usage: CopyTool <warehouseRoot> <datatype> <YYYY-MM-DD> <tmpDataset> <rawDataset> */
object CopyTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date, tmp, raw) = args.take(5)
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, tmp, raw, ""), Warehouse(whRoot))
    val stats = ops.copyToRaw()
    println(s"copied ${stats.detail}")
  }
}

/** Usage: CompactTool <warehouseRoot> <datatype> <YYYY-MM-DD> <rawDataset>
  *                    [targetFileMB] [backend] [clusterCols] [zorder]
  * Small-file compaction of one raw date partition (TableOps.compactRaw).
  */
object CompactTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date, raw) = args.take(4)
    val targetMB = if (args.length > 4) args(4).toLong else 128L
    val backend = if (args.length > 5) args(5) else "path"
    // optional 7th arg: comma-separated cluster-by columns for a
    // range-clustered rewrite (stats-selective layout, see compactRaw)
    val clusterBy =
      if (args.length > 6) args(6).split(',').toSeq.filter(_.nonEmpty)
      else Nil
    // optional 8th arg: `zorder` interleaves the cluster columns
    // (multi-dimension stats-selective layout, see ZOrder)
    val interleave = args.length > 7 && args(7) == "zorder"
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, "tmp_cli", raw, ""),
      Warehouse.forName(backend, whRoot))
    val stats = ops.compactRaw(targetMB * 1024 * 1024, clusterBy = clusterBy,
      interleave = interleave)
    println(s"compacted ${stats.detail}")
  }
}

/** Operational maintenance for transactional-backend tables.
  *
  * Usage: VacuumTool <warehouseRoot> <dataset> <datatype>
  *                   [keepVersions] [minAgeHours]
  *
  * Deletes data files unreferenced by the newest keepVersions manifests
  * and older than minAgeHours (defaults 1 / 168 — one week, the
  * concurrent-writer safety margin; see TxWarehouse.vacuum).
  */
object VacuumTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype) = args.take(3)
    val keep = if (args.length > 3) args(3).toInt else 1
    val ageHours = if (args.length > 4) args(4).toLong else 168L
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val path = wh.tablePath(dataset, datatype)
    val n = wh.vacuum(spark, path, keep, ageHours * 3600 * 1000)
    // log truncation is vacuum's companion: vacuum reclaims DATA files,
    // this bounds the _graft_log directory itself (same age guard)
    val t = wh.truncateLog(spark, path, minAgeMillis = ageHours * 3600 * 1000)
    println(s"vacuumed $n data files and truncated $t log files from $path " +
      s"(kept $keep versions, min age ${ageHours}h)")
  }
}

/** Usage: HistoryTool <warehouseRoot> <dataset> <datatype> — prints one
  * line per committed version with its live row-file count and total
  * rows at that version (a `DESCRIBE HISTORY` analog over the tx log).
  */
object HistoryTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype) = args.take(3)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val path = wh.tablePath(dataset, datatype)
    val latest = wh.currentVersion(spark, path)
    // routine maintenance legitimately removes old versions: log
    // truncation past a checkpoint makes readAt's version check fail
    // (IllegalArgumentException), and vacuum leaves manifests whose
    // data files are gone (FileNotFoundException, possibly wrapped by
    // Spark). ONLY those degrade to an "archived" line — anything else
    // (corrupt manifest, IO errors, contention) is a real problem and
    // propagates.
    def isExpected(t: Throwable): Boolean = t != null && (t match {
      case _: IllegalArgumentException => true
      case _: java.io.FileNotFoundException => true
      case other => isExpected(other.getCause)
    })
    (1L to latest).foreach { v =>
      try {
        val df = wh.readAt(spark, path, v)
        val files = df.inputFiles.length
        println(s"v$v: $files files, ${df.count()} rows")
      } catch {
        case e: Exception if isExpected(e) =>
          println(s"v$v: unavailable — vacuumed or truncated " +
            s"(${e.getClass.getSimpleName})")
      }
    }
  }
}

/** Usage: DetailTool <warehouseRoot> <dataset> <datatype>
  *
  * DESCRIBE DETAIL analog: one manifest replay answers version, file
  * count, total bytes, exact row count (fastRowCount — stats payloads,
  * no data reads), partition dates, and per-partition rows. At archive
  * scale this is the table-inventory query that must never scan.
  */
object DetailTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype) = args.take(3)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val path = wh.tablePath(dataset, datatype)
    val v = wh.currentVersion(spark, path)
    val counts = wh.partitionFileCounts(spark, path)
    val rows = wh.fastRowCount(spark, path)
      .map(_.toString).getOrElse("unknown (some files lack stats)")
    println(s"table: $path")
    println(s"version: $v")
    println(s"files: ${counts.values.sum} across ${counts.size} partitions")
    println(s"rows: $rows")
    wh.fastPartitionRowCounts(spark, path).foreach(m =>
      m.toSeq.sortBy(_._1.toString).foreach { case (d, n) =>
        println(s"  $d: $n rows, ${counts.getOrElse(d, 0)} files")
      })
  }
}

/** Usage: MergeTool <warehouseRoot> <dataset> <datatype> <changesParquet>
  *                   <keyCols,comma-separated> [deleteCol]
  *
  * Applies a change-set parquet (full rows + optional boolean delete
  * column) to a tx table by key (TxWarehouse.mergeInto) — the CLI for
  * one-off CDC backfills and corrections. Only files whose manifest
  * stats/blooms overlap the change keys are rewritten.
  */
object MergeTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, changes, keys) = args.take(5)
    val deleteCol = if (args.length > 5) Some(args(5)) else None
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val st = wh.mergeInto(spark, spark.read.parquet(changes),
      wh.tablePath(dataset, datatype),
      keys.split(',').toSeq.filter(_.nonEmpty), deleteCol)
    println(s"merged: rewrote ${st.filesRewritten} files " +
      s"(${st.filesKept} kept untouched), wrote ${st.rowsWritten} rows " +
      s"(${st.rowsUpserted} upserts, ${st.deleteKeys} delete keys)")
  }
}

/** Usage: SetBloomTool <warehouseRoot> <dataset> <datatype> <column>
  *                     [expectedItemsPerFile] [fpp]
  *
  * Enables per-file bloom-filter skipping on the column for all
  * SUBSEQUENT writes (TxWarehouse.setBloomFilter); run CompactTool
  * afterwards to re-land existing files with blooms.
  */
object SetBloomTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, column) = args.take(4)
    val items = if (args.length > 4) args(4).toLong else 1000000L
    val fpp = if (args.length > 5) args(5).toDouble else 0.01
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    wh.setBloomFilter(spark, wh.tablePath(dataset, datatype), column,
      items, fpp)
    println(s"bloom property set on $column " +
      s"($items items/file, fpp $fpp) — subsequent writes harvest blooms")
  }
}

/** Usage: ExportTool <warehouseRoot> <dataset> <datatype> <exportRoot>
  *                   [vacuumOrphanHours]
  *
  * One poll of the incremental export (IncrementalExport.sync): reads
  * ONLY the tx-table files that became live since the export's cursor,
  * appends them to the export directory, and advances the marker chain
  * through the scheme's atomic publisher. Run from cron/scheduler at
  * any cadence — each version range commits exactly once, concurrent
  * runs race safely. Pass vacuumOrphanHours to also reclaim staging
  * dirs abandoned by crashed or out-raced runs.
  */
object ExportTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, exportRoot) = args.take(4)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val path = wh.tablePath(dataset, datatype)
    val r = graft.tableops.IncrementalExport.sync(spark, wh, path, exportRoot)
    val what =
      if (r.applied) s"exported versions (${r.from}, ${r.to}]"
      else if (r.to > r.from) s"lost the publish race for (${r.from}, ${r.to}] (a rival exported it)"
      else s"up to date at version ${r.to}"
    println(s"$what of $path -> $exportRoot")
    if (args.length > 4) {
      val n = graft.tableops.IncrementalExport.vacuumOrphans(spark,
        exportRoot, args(4).toLong * 3600 * 1000)
      println(s"vacuumed $n orphaned staging dirs")
    }
  }
}

/** Usage: CompactExportTool <exportRoot> [minAgeHours]
  *
  * Maintenance for a long-lived incremental export: consolidate the
  * chain's current prefix into one data directory
  * (IncrementalExport.checkpointExport) and reclaim the increment and
  * superseded-checkpoint dirs it covers (vacuumCompacted, default age
  * guard 168h). Bounds readExport's file fan-in to the checkpoint
  * cadence instead of the chain's lifetime; the cursor chain itself is
  * untouched.
  */
/** Usage: DeleteWhereTool <warehouseRoot> <dataset> <datatype> <sqlPredicate>
  *
  * Copy-on-write predicate DELETE (TxWarehouse.deleteWhere) — the
  * right-to-erasure path. Stats/bloom pruning decides the candidate
  * files manifest-only; only files actually holding matching rows
  * rewrite. SQL semantics: NULL predicate keeps the row.
  */
object DeleteWhereTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, predicate) = args.take(4)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val n = wh.deleteWhere(spark, wh.tablePath(dataset, datatype),
      org.apache.spark.sql.functions.expr(predicate))
    println(s"deleted $n rows matching: $predicate")
  }
}

/** Usage: UpdateWhereTool <warehouseRoot> <dataset> <datatype>
  *                        <sqlPredicate> <col=expr>[,<col=expr>…]
  *
  * Copy-on-write predicate UPDATE (TxWarehouse.updateWhere). All SET
  * right-hand sides evaluate against the OLD row; values cast to the
  * column's recorded type.
  */
object UpdateWhereTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, predicate, sets) = args.take(5)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val assignments = sets.split(',').toSeq.filter(_.nonEmpty).map { kv =>
      val eq = kv.indexOf('=')
      require(eq > 0, s"SET clause must be col=expr, got: $kv")
      kv.substring(0, eq).trim ->
        org.apache.spark.sql.functions.expr(kv.substring(eq + 1))
    }.toMap
    val n = wh.updateWhere(spark, wh.tablePath(dataset, datatype),
      org.apache.spark.sql.functions.expr(predicate), assignments)
    println(s"updated $n rows matching: $predicate")
  }
}

/** Usage: RenameColumnTool <warehouseRoot> <dataset> <datatype> <old> <new>
  *        DropColumnTool   <warehouseRoot> <dataset> <datatype> <column>
  *
  * Zero-rewrite schema evolution (column mapping): one metadata
  * commit, no data file touched at any table size. Time travel shows
  * each version under its then-current names; dropped names stay
  * tombstoned.
  */
object RenameColumnTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, oldName, newName) = args.take(5)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    wh.renameColumn(ToolSession.spark(), wh.tablePath(dataset, datatype),
      oldName, newName)
    println(s"renamed $oldName -> $newName (metadata-only)")
  }
}

object DropColumnTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, column) = args.take(4)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    wh.dropColumn(ToolSession.spark(), wh.tablePath(dataset, datatype), column)
    println(s"dropped $column (tombstoned; bytes reclaimed by a rewrite pass)")
  }
}

/** `clone <whRoot> <srcDataset> <srcDatatype> <destDataset>
  * <destDatatype> [version]` — zero-copy shallow clone (fork) of a
  * table at its latest or a time-travelable version.
  */
object CloneTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, sd, st, dd, dt) = args.take(5)
    val version = if (args.length > 5) args(5).toLong else -1L
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val v = wh.cloneTo(spark, wh.tablePath(sd, st), wh.tablePath(dd, dt),
      version)
    println(s"cloned $sd/$st@v$v -> $dd/$dt (zero bytes copied)")
  }
}

/** `restore <whRoot> <dataset> <datatype> <version>` — RESTORE TABLE to
  * a prior version: one metadata-only commit, no data movement; refuses
  * if the target's files were vacuumed.
  */
object RestoreTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, dataset, datatype, version) = args.take(4)
    val wh = new graft.tableops.TxWarehouse(whRoot)
    val spark = ToolSession.spark()
    val tbl = wh.tablePath(dataset, datatype)
    wh.restoreTo(spark, tbl, version.toLong)
    println(s"restored $tbl to v$version " +
      s"(now v${wh.currentVersion(spark, tbl)})")
  }
}

object CompactExportTool {
  def main(args: Array[String]): Unit = {
    val exportRoot = args(0)
    val ageHours = if (args.length > 1) args(1).toLong else 168L
    val spark = ToolSession.spark()
    val ck = graft.tableops.IncrementalExport.checkpointExport(spark, exportRoot)
    val n = graft.tableops.IncrementalExport.vacuumCompacted(spark,
      exportRoot, ageHours * 3600 * 1000)
    println(ck match {
      case Some(v) => s"checkpointed $exportRoot up to version $v; reclaimed $n covered dirs"
      case None => s"nothing new to checkpoint in $exportRoot; reclaimed $n covered dirs"
    })
  }
}
