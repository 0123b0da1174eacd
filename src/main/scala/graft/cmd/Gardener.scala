package graft.cmd

import java.nio.file.{Files, Paths}
import java.time.Duration

import org.apache.spark.sql.SparkSession

import graft.api.JobsApi
import graft.config.GardenerConfig
import graft.gardenerops.{Monitor, StandardPipeline}
import graft.jobservice._
import graft.model.{Job, Outcome}
import graft.persistence.LocalNamedSaver
import graft.tableops.{TableOps, Warehouse}
import graft.tracker.Tracker

/** Main wiring (reference: cmd/gardener/gardener.go:222-309): config →
  * tracker (restored from snapshot) → monitor with the standard pipeline
  * driving Spark TableOps → job service with daily + historical iterators →
  * Jobs HTTP API.
  *
  * Usage: Gardener <config.yml> <stateDir> <archiveRoot> <warehouseRoot>
  *                 [port] [backend]
  * `backend` is `path` (default — partitioned parquet dirs, JVM-local
  * locks, single driver) or `tx` (transactional manifest-log tables,
  * safe for multiple drivers — see [[graft.tableops.TxWarehouse]]).
  */
object Gardener {

  /** Config-declared per-datatype dedup keys / content tiers as TableOps
    * overrides (reference keeps these per-datatype too,
    * cloud/bq/ops.go:53-83 — config is the Spark-native home for them).
    */
  def datatypeSpecs(config: GardenerConfig): Map[String, graft.tableops.DatatypeSpec] =
    config.datatypes.map { case (dt, c) =>
      dt -> graft.tableops.DatatypeSpec(c.partitionKeys, c.orderKey,
        c.skewedKeys, c.contentDedup.map(cd =>
          graft.tableops.ContentDedupSpec(cd.textCol, cd.minJaccardE4,
            cd.vsRawCorpus)),
        bloomKey = c.bloomKey, checks = c.checks)
    }

  /** Map one TableOps invocation onto the monitor's Outcome algebra
    * (reference: ops/errors.go — retryable vs terminal BQ errors).
    * Tx-backend concurrency conflicts (a concurrent writer beat this
    * action's commit) are TRANSIENT: Retry re-runs the same state
    * against fresh table state after the backoff. Matched by the
    * warehouse's DEDICATED type: a generic
    * ConcurrentModificationException from a collection bug anywhere
    * else is a real failure and must reach Failed, not loop forever.
    */
  def tableAction(spark: SparkSession, wh: Warehouse,
      dtSpecs: Map[String, graft.tableops.DatatypeSpec] = Map.empty)(
      f: TableOps => Unit): Job => Outcome = job =>
    try {
      f(new TableOps(spark, job, wh, specOverride = dtSpecs.get(job.datatype)))
      Outcome.Success()
    } catch {
      case e: graft.tableops.ConcurrentCommitException =>
        Outcome.Retry(e.getMessage)
      case e: Exception => Outcome.Failure(e.getMessage)
    }

  /** Graceful shutdown (reference: cmd/gardener/gardener.go:280-309 and
    * the `shutdown_timeout` flag, default 1 m): stop intake FIRST (the
    * jobs API — parsers get connection-refused and fail over to a
    * healthy replica), then stop scheduling (monitor + sweeper timers;
    * in-flight actions keep their threads), wait up to `timeoutMillis`
    * for in-flight actions to drain, and finish with a forced tracker
    * sync so the durable snapshot reflects everything that completed.
    * Returns whether the drain finished inside the allowance — an
    * undrained action is safe (its lease expires and a surviving driver
    * takes the job over; a stale late commit is fenced into Retry) but
    * worth logging.
    */
  def gracefulShutdown(api: JobsApi, handles: Seq[AutoCloseable],
      monitor: Monitor, tracker: Tracker, timeoutMillis: Long): Boolean = {
    scala.util.Try(api.stop())
    handles.foreach(h => scala.util.Try(h.close()))
    val deadline = System.currentTimeMillis() + timeoutMillis
    while (monitor.inFlight > 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    val drained = monitor.inFlight == 0
    tracker.sync()
    drained
  }

  def main(args: Array[String]): Unit = {
    val configPath = args(0)
    val stateDir = Paths.get(args(1))
    val archiveRoot = args(2)
    val warehouseRoot = args(3)
    val port = if (args.length > 4) args(4).toInt else 8080

    val config = GardenerConfig.parse(Files.readString(Paths.get(configPath)))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("gardener")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // the monitor runs concurrent per-job Spark actions; FAIR scheduling
      // keeps one long dedup from starving the small copy/delete jobs
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    TableOps.configure(spark)

    val saver = new LocalNamedSaver(stateDir)
    // reference: cmd/gardener/gardener.go:56,192-195 plumbs the configured
    // expiration as the job-expiry horizon (config default 5h; the
    // constructor's 24h default mirrors the reference flag default)
    val tracker = new Tracker(saver, expiryMillis = config.trackerTimeout.toMillis)
    tracker.saveEvery(60000)

    val wh = Warehouse.forName(
      if (args.length > 5) args(5) else "path", warehouseRoot)
    val dtSpecs = datatypeSpecs(config)
    def tableOp(f: TableOps => Unit): Job => Outcome =
      tableAction(spark, wh, dtSpecs)(f)

    // claim-owner identity must be unique PER DRIVER PROCESS — two
    // gardeners sharing a tracker under one name would shadow each
    // other's leases
    val driverName =
      s"gardener-${java.util.UUID.randomUUID().toString.take(8)}"
    val monitor = new Monitor(tracker, StandardPipeline.actions(
      // the load action publishes its input volume as gardener_files /
      // gardener_bytes (reference: metrics/metrics.go:152-191) — the
      // archive listing the load consumed, via the same PrefixStats the
      // has-files gate uses (driver-side metadata, no Spark job)
      load = job => tableOp { ops =>
        val (files, bytes) = PrefixStats.prefixStats(archiveRoot, job,
          spark.sparkContext.hadoopConfiguration)
        ops.loadToTmp(s"$archiveRoot/${job.prefix}*")
        tracker.observeLoadStats(job, files, bytes)
      }(job),
      dedup = tableOp(ops => { ops.dedup(); () }),
      copy = tableOp(ops => { ops.copyToRaw(); () }),
      delete = tableOp(_.deleteTmp()),
      join = tableOp(ops => { ops.join(); () })
    ), name = driverName)
    val monitorHandle = monitor.watch(config.pollingInterval.toMillis)

    // storage maintenance runs unattended alongside the pipeline:
    // compaction of fragmented completed days, plus (tx backend) vacuum
    // and commit-log truncation — see MaintenanceSweeper
    val sweeper = new graft.gardenerops.MaintenanceSweeper(spark, wh, tracker)
    val sweeperHandle = sweeper.watch(config.maintenanceInterval.toMillis)

    // ALL sources get daily jobs; DailyOnly only excludes a source from the
    // historical sweep (reference: job-service/job-service.go puts every
    // source in dailySpecs) — otherwise fresh data of non-dailyOnly sources
    // would wait ~36h for the historical sweep to reach it. The sweep DOES
    // re-reach daily-dispatched dates: re-dispatching a completed date
    // restarts it (at-least-once redo is the reference's model — idempotent
    // ops converge), and an ACTIVE duplicate is rejected by the tracker
    // (500/MsgJobExists to the parser, also reference behavior).
    val daily = new JobIterator(
      new DailyIterator(saver), config.sources)
    val historical = new JobIterator(
      new HistoricalIterator(saver, config.startDate),
      config.sources.filterNot(_.dailyOnly))
    val service = new JobService(daily, historical, config.sources.size,
      job => PrefixStats.hasFiles(archiveRoot, job,
        spark.sparkContext.hadoopConfiguration))

    val api = new JobsApi(tracker, service, port)
    val boundPort = api.start()
    println(s"gardener listening on :$boundPort")

    // SIGTERM path (k8s rolling update): drain in-flight actions within
    // the reference's 1-minute default allowance, then persist state
    sys.addShutdownHook {
      println("gardener shutting down")
      val drained = gracefulShutdown(api,
        Seq(monitorHandle, sweeperHandle), monitor, tracker,
        timeoutMillis = 60000L)
      println(s"gardener shutdown drained=$drained")
    }
    Thread.currentThread().join()
  }
}
