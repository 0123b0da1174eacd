package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.cmd.Gardener
import graft.gardenerops.{Monitor, StandardPipeline}
import graft.model.{Datasets, Job, Outcome, State}
import graft.persistence.NamedSaver
import graft.tableops.{RacingOverwriteWarehouse, TableOps, Warehouse}
import graft.tracker.Tracker

/** The multi-driver story end-to-end (VERDICT r8 #2): TWO full
  * monitor/pipeline instances — separate SparkSessions, separate
  * warehouse handles — drive overlapping dates through
  * load→dedup→copy→delete→join against ONE transactional warehouse
  * root, coordinating only through the shared tracker's leased claims
  * (the reference's ops/ops.go:107-124 claim semantics generalized
  * across processes) and the warehouse's commit conflict detection.
  *
  * The test engineers the failure mode the design exists for: each
  * driver's FIRST raw-table copy stalls past its claim lease (a "slow
  * driver"), the other driver takes the job over and completes it, and
  * the stale driver's late commit MUST be fenced into Outcome.Retry by
  * the warehouse — never committed over the winner, never terminal
  * Failed. Done = every job drains to Complete, at least one
  * fenced-conflict Retry was observed, both drivers did real work, and
  * the final tables equal the single-driver run's.
  */
class MultiDriverE2ESpec extends SparkTestBase {
  import spark.implicits._

  private object NoopSaver extends NamedSaver {
    def save(name: String, contents: String): Unit = ()
    def load(name: String): Option[String] = None
  }

  private def writeJsonl(dir: Path, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.asJava)
  }

  test("two racing drivers over one tx root: claims split the work, a " +
    "stale copy is fenced into Retry, and the state converges") {
    race(Files.createTempDirectory("graft-mdrv-wh").toString)
  }

  test("the same two-driver race through the conditional-put publisher " +
    "on an object-store scheme — commit exclusivity from the CAS, not " +
    "filesystem rename/link atomicity") {
    spark.sparkContext.hadoopConfiguration.set("fs.casobj.impl",
      classOf[graft.tableops.CasObjectStoreFileSystem].getName)
    graft.tableops.LogPublisher.register("casobj",
      new graft.tableops.ConditionalPutPublisher(
        new graft.tableops.InMemoryCasKeySpace))
    race("casobj:" + Files.createTempDirectory("graft-mdrv-cas").toString)
  }

  test("the race converges with LIVE maintenance: a sweeper compacts, " +
    "advances the incremental export, and truncates the commit log " +
    "concurrently with both drivers — and the export ends up exact") {
    val root = Files.createTempDirectory("graft-mdrv-sweep").toString
    val exportDir = Files.createTempDirectory("graft-mdrv-exp").toString
    val sweepWh = new graft.tableops.TxWarehouse(root)
    val rawNdt = sweepWh.tablePath("raw_exp", "ndt7")
    var sweeper: graft.gardenerops.MaintenanceSweeper = null
    race(root, attachSweeper = tracker => {
      sweeper = new graft.gardenerops.MaintenanceSweeper(spark, sweepWh,
        tracker, targetFileBytes = 1L, // every multi-file day "fragmented"
        exportRoots = Map(rawNdt -> exportDir))
      () => { sweeper.sweep(): Unit }
    })
    // maintenance quiesced: one more sweep, then the export must hold
    // EXACTLY the converged raw table (the sweeper synced before any
    // truncation, so no change was lost to the horizon)
    sweeper.sweep()
    val exported = graft.tableops.IncrementalExport.readExport(spark, exportDir)
    assert(exported.count() == 3)
    assert(exported.filter($"id" === "m1").select("val").as[Long]
      .collect().toSet == Set(2L))
    // the log kept truncating/replaying under load: reads still exact
    assert(sweepWh.read(spark, rawNdt).count() == 3)
  }

  test("composed worst case: the two-driver race through the " +
    "conditional-put publisher WITH the sweeper churning the same tx " +
    "root — reads stay correct (and their latency bounded) during the " +
    "race, and the export ends exact") {
    spark.sparkContext.hadoopConfiguration.set("fs.casobj.impl",
      classOf[graft.tableops.CasObjectStoreFileSystem].getName)
    graft.tableops.LogPublisher.register("casobj",
      new graft.tableops.ConditionalPutPublisher(
        new graft.tableops.InMemoryCasKeySpace))
    val root = "casobj:" + Files.createTempDirectory("graft-mdrv-cassweep")
    val exportDir = Files.createTempDirectory("graft-mdrv-casexp").toString
    val sweepWh = new graft.tableops.TxWarehouse(root)
    val rawNdt = sweepWh.tablePath("raw_exp", "ndt7")

    // snapshot-isolation probe: sample full reads of the raw table
    // WHILE both drivers commit through the CAS and the sweeper
    // compacts/vacuums/truncates it. Every read must either succeed on
    // a consistent snapshot or be the benign "table not created yet" —
    // any other failure means maintenance broke a reader mid-replay.
    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val readErrors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sampler = new Thread(() => {
      while (!stop.get()) {
        val t0 = System.nanoTime()
        try {
          sweepWh.read(spark, rawNdt).count(): Unit
          latencies.add((System.nanoTime() - t0) / 1e9): Unit
        } catch {
          case e: IllegalArgumentException
              if e.getMessage != null &&
                e.getMessage.contains("no such table") => () // pre-create
          case e: Throwable =>
            readErrors.add(s"${e.getClass.getSimpleName}: ${e.getMessage}"): Unit
        }
        Thread.sleep(100)
      }
    })
    sampler.start()
    var sweeper: graft.gardenerops.MaintenanceSweeper = null
    try {
      race(root, attachSweeper = tracker => {
        sweeper = new graft.gardenerops.MaintenanceSweeper(spark, sweepWh,
          tracker, targetFileBytes = 1L,
          exportRoots = Map(rawNdt -> exportDir))
        () => { sweeper.sweep(): Unit }
      })
    } finally { stop.set(true); sampler.join() }

    assert(readErrors.isEmpty,
      s"reads failed during the composed race: ${readErrors.asScala.toSeq.take(3)}")
    val ls = latencies.asScala.toSeq.sorted
    assert(ls.nonEmpty, "the latency probe never completed a read")
    // BASELINE row: read latency under the composed churn
    println(f"[probe] cas+sweeper race reads: n=${ls.size} " +
      f"p50=${ls(ls.size / 2)}%.3fs max=${ls.last}%.3fs")

    // maintenance quiesced: the export holds exactly the converged table
    sweeper.sweep()
    val exported = graft.tableops.IncrementalExport.readExport(spark, exportDir)
    assert(exported.count() == 3)
    assert(exported.filter($"id" === "m1").select("val").as[Long]
      .collect().toSet == Set(2L))
    assert(sweepWh.read(spark, rawNdt).count() == 3)
  }

  private def race(root: String,
      attachSweeper: Tracker => (() => Unit) = _ => () => ()): Unit = {
    val archive = Files.createTempDirectory("graft-mdrv-arc")

    // same fixture shape as the single-driver E2E walk: ndt7 over two
    // days (one with a key duplicate), annotation2 for the join window
    writeJsonl(archive.resolve("ndt7/2024-01-01"), "part.json", Seq(
      """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T10:00:00Z"},"val":1}""",
      """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T12:00:00Z"},"val":2}""",
      """{"id":"m2","date":"2024-01-01","parser":{"Time":"2024-01-01T11:00:00Z"},"val":3}"""
    ))
    writeJsonl(archive.resolve("ndt7/2024-01-02"), "part.json", Seq(
      """{"id":"m9","date":"2024-01-02","parser":{"Time":"2024-01-02T09:00:00Z"},"val":9}"""
    ))
    writeJsonl(archive.resolve("annotation2/2023-12-31"), "part.json", Seq(
      """{"id":"m1","date":"2023-12-31","parser":{"Time":"2023-12-31T01:00:00Z"},"geo":"DE"}"""
    ))
    writeJsonl(archive.resolve("annotation2/2024-01-01"), "part.json", Seq(
      """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T01:00:00Z"},"geo":"US"}"""
    ))
    writeJsonl(archive.resolve("annotation2/2024-01-02"), "part.json", Seq(
      """{"id":"m9","date":"2024-01-02","parser":{"Time":"2024-01-02T01:00:00Z"},"geo":"FR"}"""
    ))

    // ONE tracker = the shared claim/state service both drivers talk to
    val tracker = new Tracker(NoopSaver)
    // long enough that no healthy action (first-load schema inference,
    // the dedup rewrite) outlives its claim, short enough to keep the
    // engineered takeover quick
    val lease = 8000L

    def mkJob(datatype: String, date: String, join: String) =
      Job("bucket", "exp", datatype, java.time.LocalDate.parse(date),
        datasets = Datasets("tmp_exp", "raw_exp", join))

    // each driver's warehouse stalls its FIRST ndt7 raw-partition
    // overwrite between planning and commit until the job has been taken
    // over (left Copying) — the "slow driver whose lease expired" shape;
    // the resumed commit must then hit the conflict fence
    def stallingWh(): RacingOverwriteWarehouse =
      new RacingOverwriteWarehouse(root, _.endsWith("/raw_exp/ndt7"),
        (_, date) => {
          val key = mkJob("ndt7", date.toString, "joined").key
          val deadline = System.currentTimeMillis() + 20000
          while (System.currentTimeMillis() < deadline &&
            tracker.getState().get(key).exists(_._2.state == State.Copying))
            Thread.sleep(25)
        })

    final case class Driver(name: String, wh: RacingOverwriteWarehouse,
        monitor: Monitor, ran: java.util.concurrent.atomic.AtomicInteger,
        retries: java.util.concurrent.atomic.AtomicInteger)

    def mkDriver(name: String): Driver = {
      val s = if (name == "driver-a") spark else spark.newSession()
      TableOps.configure(s)
      val wh = stallingWh()
      val ran = new java.util.concurrent.atomic.AtomicInteger(0)
      val retries = new java.util.concurrent.atomic.AtomicInteger(0)
      def act(f: TableOps => Unit): Job => Outcome = job => {
        val o = Gardener.tableAction(s, wh)(f)(job)
        ran.incrementAndGet()
        o match { case Outcome.Retry(_) => retries.incrementAndGet(); case _ => () }
        o
      }
      def glob(job: Job) = s"$archive/${job.datatype}/${job.date}/*.json"
      val monitor = new Monitor(tracker, StandardPipeline.actions(
        load = job => act(ops => { ops.loadToTmp(glob(job)); () })(job),
        dedup = act(ops => { ops.dedup(); () }),
        copy = act(ops => { ops.copyToRaw(); () }),
        delete = act(_.deleteTmp()),
        join = act(ops => { ops.join(); () })
      ), retryMillis = 50, name = name, claimLeaseMillis = lease)
      Driver(name, wh, monitor, ran, retries)
    }

    val a = mkDriver("driver-a")
    val b = mkDriver("driver-b")

    val jobs = Seq(
      mkJob("annotation2", "2023-12-31", join = ""),
      mkJob("annotation2", "2024-01-01", join = ""),
      mkJob("annotation2", "2024-01-02", join = ""),
      mkJob("ndt7", "2024-01-01", join = "joined"),
      mkJob("ndt7", "2024-01-02", join = "joined")
    )
    jobs.foreach { j =>
      assert(tracker.addJob(j).isRight)
      assert(tracker.setStatus(j.key, State.ParseComplete).isRight)
    }

    val sweepTick = attachSweeper(tracker)
    val deadline = System.currentTimeMillis() + 120000
    var iter = 0
    while (System.currentTimeMillis() < deadline &&
      tracker.getState().values.exists(!_._2.isDone)) {
      a.monitor.tick(); b.monitor.tick()
      iter += 1
      if (iter % 40 == 0) sweepTick()
      Thread.sleep(25)
    }

    // every job terminal, none Failed — a stale-commit conflict must
    // never be a terminal outcome
    val state = tracker.getState()
    assert(state.values.forall(_._2.state == State.Complete),
      s"states: ${state.values.map(v => v._1.key -> v._2.state)}")

    // at least one stale copy was fenced by the warehouse and retried
    val conflicts = a.wh.conflicts.get() + b.wh.conflicts.get()
    val retries = a.retries.get() + b.retries.get()
    assert(conflicts >= 1, "no commit conflict was exercised")
    assert(retries >= 1, "no Retry outcome reached a monitor")

    // both drivers did real work (the claim split, not one idle bystander)
    assert(a.ran.get() > 0 && b.ran.get() > 0,
      s"work split a=${a.ran.get()} b=${b.ran.get()}")

    // final tables equal the single-driver run: raw deduped (m1's
    // latest wins), tmp drained, join used the d-1..d window
    val wh = a.wh
    val rawNdt = wh.read(spark, wh.tablePath("raw_exp", "ndt7"))
    assert(rawNdt.count() == 3, s"raw rows: ${rawNdt
      .select("id", "val", "date").collect().toSeq.sortBy(_.toString)
      .mkString("; ")}")
    assert(rawNdt.filter($"id" === "m1").select("val").as[Long].head() == 2L)
    Seq("2024-01-01", "2024-01-02").foreach { d =>
      assert(wh.readPartition(spark, wh.tablePath("tmp_exp", "ndt7"),
        java.time.LocalDate.parse(d)).count() == 0)
    }
    // requirePartitionFilter on the join table: read through a
    // date-constrained predicate (the readWhere contract a flagged
    // table demands)
    val joined = wh.readWhere(spark, wh.tablePath("joined", "ndt7"),
      $"date".between(java.sql.Date.valueOf("2024-01-01"),
        java.sql.Date.valueOf("2024-01-02")))
    assert(joined.filter($"id" === "m1").select("geo").as[String]
      .collect().toSet == Set("US", "DE"))
    assert(joined.filter($"id" === "m9").select("geo").as[String].head() == "FR")
  }
}
