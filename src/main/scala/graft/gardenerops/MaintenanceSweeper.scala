package graft.gardenerops

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

import graft.model.Job
import graft.tableops.{ConcurrentCommitException, TableOps, TxWarehouse, Warehouse}
import graft.tracker.Tracker

/** The scheduling half of storage maintenance: the engine ships
  * compaction / vacuum / log truncation as table operations
  * ([[TableOps.compactRaw]], [[TxWarehouse.vacuum]],
  * [[TxWarehouse.truncateLog]]) and CLIs, but a 100 TB warehouse needs
  * them to RUN without an operator — scan cost is driven by file count
  * as much as bytes, the tx commit log grows one file per commit, and
  * retired data files hold storage until reclaimed. The reference never
  * needs this (BigQuery manages physical storage; its analog of bounded
  * metadata is the tracker snapshot, tracker/tracker.go:189-204).
  *
  * Every `periodMillis` the sweeper snapshots the tracker and, for each
  * raw table the tracked jobs name, compacts every fragmented date
  * partition that has NO active job — an active pipeline owns its date:
  * racing it would serialize on the path backend's locks and guarantee
  * a conflict/retry cycle on tx. On the transactional backend it then
  * vacuums unreferenced data files and truncates the commit log across
  * the job namespace's tables (tmp/raw/join + the near-dup signature
  * index), behind the age guards that make both safe under concurrent
  * writers.
  *
  * Compaction runs through [[TableOps.compactRaw]] — the same
  * stage + publish path as the dedup rewrite — so a crash mid-compaction
  * is healed by the pipeline's existing `recoverAllSelfReplace` sweeps,
  * and a compaction losing a tx commit race surfaces as the retryable
  * conflict the NEXT sweep simply absorbs (skipped here, retried then).
  */
final class MaintenanceSweeper(
    spark: SparkSession,
    wh: Warehouse,
    tracker: Tracker,
    targetFileBytes: Long = 128L * 1024 * 1024,
    minAgeMillis: Long = 7L * 24 * 3600 * 1000,
    // per-DATATYPE cluster-by columns: datatypes listed here get their
    // fragmented partitions rewritten range-clustered (stats-selective
    // file layout for readWhere; see TableOps.compactRaw), others keep
    // the narrow coalesce
    clusterBy: Map[String, Seq[String]] = Map.empty,
    // datatypes whose clustered rewrite interleaves (Z-orders) the
    // cluster columns instead of sorting them lexicographically — keeps
    // stats pruning selective on every cluster dimension, not just the
    // leading one (see TableOps.compactRaw / ZOrder)
    interleaved: Set[String] = Set.empty,
    // tx-table path -> export root: each sweep advances these
    // incremental exports (IncrementalExport.sync — O(new files) per
    // pass) BEFORE truncating the table's commit log, so an export the
    // sweeper owns can never fall behind the truncation horizon its own
    // maintenance imposes. Ignored on non-tx backends.
    exportRoots: Map[String, String] = Map.empty) {

  /** One sweep pass. Visible for deterministic tests. Returns the number
    * of partitions compacted.
    */
  def sweep(): Int = {
    syncExports()
    val state = tracker.getState().values.toSeq
    // one representative job per (datasets, datatype): the sweep reuses
    // the pipeline's own TableOps with the date swapped in
    val tables = state.map { case (j, _) => ((j.datasets, j.datatype), j) }.toMap
    var compacted = 0
    tables.values.foreach { j =>
      val rawPath = wh.tablePath(j.datasets.raw, j.datatype)
      // fragmentation screen: ONE metadata pass for the whole table
      // (single manifest replay on tx); a date with ≤ 1 file can never
      // need compaction, so the steady state costs no per-file stats
      val counts = wh.partitionFileCounts(spark, rawPath)
      counts.toSeq.sortBy(_._1).foreach { case (d, count) =>
        if (count > 1 && !activeDate(j, d)) {
          // size stats only for dates that passed the screen; mirrors
          // compactRaw's sizing (keep in lockstep)
          val files = wh.partitionFiles(spark, rawPath, d)
          val nOut = math.max(1L, math.ceil(
            files.map(_._2).sum.toDouble / targetFileBytes).toLong)
          // re-check the tracker RIGHT before touching the partition: a
          // pipeline may have re-dispatched this date since the pass
          // started (the historical sweep restarts completed dates).
          // `exclusive` then closes the remaining window on the path
          // backend — stage and publish under one write lock, so a copy
          // landing between them cannot be clobbered by stale staged
          // files; on tx the staged sidecar fences the publish instead
          if (files.length > nOut && !activeDate(j, d)) {
            try {
              new TableOps(spark, j.copy(date = d), wh)
                .compactRaw(targetFileBytes, exclusive = true,
                  clusterBy = clusterBy.getOrElse(j.datatype, Nil),
                  interleave = interleaved.contains(j.datatype)): Unit
              compacted += 1
            } catch { case _: ConcurrentCommitException => () }
          }
        }
      }
      maintainTx(j)
    }
    compacted
  }

  /** Does the tracker CURRENTLY show an active (non-terminal) job for
    * this table and date? Queried per date, immediately before acting —
    * a pass-level snapshot would go stale over a long sweep.
    */
  private def activeDate(j: Job, d: java.time.LocalDate): Boolean =
    tracker.getState().values.exists { case (job, st) =>
      !st.isDone && job.datasets.raw == j.datasets.raw &&
        job.datatype == j.datatype && job.date == d
    }

  /** Advance every registered incremental export one increment and
    * reclaim its abandoned staging, before any log truncation this pass
    * (ordering is the horizon guarantee — see the constructor note). A
    * failed export is dropped like a failed pass: the chain is
    * crash-convergent, so the next sweep's sync re-reads the same
    * range and publishes.
    */
  private def syncExports(): Unit = wh match {
    case tx: TxWarehouse => exportRoots.foreach { case (path, exRoot) =>
      try {
        graft.tableops.IncrementalExport.sync(spark, tx, path, exRoot): Unit
        graft.tableops.IncrementalExport.vacuumOrphans(spark, exRoot,
          minAgeMillis): Unit
      } catch { case _: Exception => () }
    }
    case _ => ()
  }

  private def maintainTx(j: Job): Unit = wh match {
    case tx: TxWarehouse =>
      val names =
        Seq(j.datasets.tmp, j.datasets.raw, j.datasets.join).filter(_.nonEmpty)
      val paths = names.map(ds => tx.tablePath(ds, j.datatype)) :+
        (tx.tablePath(j.datasets.raw, j.datatype) + TableOps.NearDupIndexSuffix)
      paths.distinct.filter(tx.exists(spark, _)).foreach { p =>
        tx.vacuum(spark, p, minAgeMillis = minAgeMillis): Unit
        tx.truncateLog(spark, p, minAgeMillis = minAgeMillis): Unit
      }
    case _ => ()
  }

  /** Start the periodic sweep (daemon thread, like Monitor.watch / the
    * tracker's saveEvery). A failed pass is dropped — the next one
    * re-derives everything from fresh metadata.
    */
  def watch(periodMillis: Long): AutoCloseable = {
    val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "maintenance-sweep"); t.setDaemon(true); t
    })
    scheduler.scheduleAtFixedRate(
      () => try { sweep(); () } catch { case _: Exception => () },
      periodMillis, periodMillis, TimeUnit.MILLISECONDS)
    () => { scheduler.shutdownNow(); () }
  }
}
