package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.gardenerops.{Monitor, StandardPipeline}
import graft.model.{Datasets, Job, Outcome, State}
import graft.persistence.NamedSaver
import graft.tableops.{TableOps, Warehouse}
import graft.tracker.Tracker

/** End-to-end state machine over REAL Spark table ops — the local analog
  * of the reference's live integration walk (ops/actions_test.go:23-152):
  * seed jobs at ParseComplete, let the monitor drive
  * Loading → Deduplicating → Copying → Deleting → Joining → Complete
  * against a parquet warehouse, one job expected to Fail (missing
  * archive), and assert terminal counts plus actual table contents —
  * including the cross-job join gate (ndt7's join must see the same-date
  * annotation2 job complete first).
  */
class GardenerE2ESpec extends SparkTestBase {
  import spark.implicits._

  private object NoopSaver extends NamedSaver {
    def save(name: String, contents: String): Unit = ()
    def load(name: String): Option[String] = None
  }

  private def writeJsonl(dir: Path, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.asJava)
  }

  for ((backend, mkWh) <- Seq[(String, String => Warehouse)](
    "path" -> (r => Warehouse(r)),
    "tx" -> (r => new graft.tableops.TxWarehouse(r))))
  test(s"[$backend] six jobs drain to terminal states through real table ops") {
    val root = Files.createTempDirectory("graft-e2e-wh").toString
    val archive = Files.createTempDirectory("graft-e2e-arc")
    val wh = mkWh(root)

    def mkJob(datatype: String, date: String, join: String) =
      Job("bucket", "exp", datatype, java.time.LocalDate.parse(date),
        datasets = Datasets("tmp_exp", "raw_exp", join))

    // archive layout: <datatype>/<date>/part.json
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
    // "broken" has NO archive files => load fails => job Failed

    val jobs = Seq(
      mkJob("annotation2", "2023-12-31", join = ""),
      mkJob("annotation2", "2024-01-01", join = ""),
      mkJob("annotation2", "2024-01-02", join = ""),
      mkJob("ndt7", "2024-01-01", join = "joined"),
      mkJob("ndt7", "2024-01-02", join = "joined"),
      mkJob("broken", "2024-01-01", join = "")
    )

    val tracker = new Tracker(NoopSaver)
    def tableOp(f: TableOps => Unit): Job => Outcome = job =>
      try { f(new TableOps(spark, job, wh)); Outcome.Success() }
      catch { case e: Exception => Outcome.Failure(s"${e.getMessage}") }
    def glob(job: Job) =
      s"$archive/${job.datatype}/${job.date}/*.json"
    val monitor = new Monitor(tracker, StandardPipeline.actions(
      load = job => tableOp(ops => { ops.loadToTmp(glob(job)); () })(job),
      dedup = tableOp(ops => { ops.dedup(); () }),
      copy = tableOp(ops => { ops.copyToRaw(); () }),
      delete = tableOp(_.deleteTmp()),
      join = tableOp(ops => { ops.join(); () })
    ), retryMillis = 10)

    jobs.foreach { j =>
      assert(tracker.addJob(j).isRight)
      assert(tracker.setStatus(j.key, State.ParseComplete).isRight)
    }

    // drive ticks until every job is terminal (budget: the reference's
    // live test allows 300s for 6 jobs; local parquet should be far under)
    val deadline = System.currentTimeMillis() + 120000
    while (System.currentTimeMillis() < deadline &&
      tracker.getState().values.exists(!_._2.isDone)) {
      monitor.tick()
      Thread.sleep(50)
    }

    val state = tracker.getState()
    val byState = state.values.groupBy(_._2.state)
    assert(byState(State.Complete).size === 5, s"states: ${state.values.map(v => v._1.key -> v._2.state)}")
    assert(byState(State.Failed).size === 1)
    assert(state(mkJob("broken", "2024-01-01", "").key)._2.state === State.Failed)

    // warehouse contents: raw deduped (m1 latest wins), tmp partitions gone
    val rawNdt = wh.read(spark, wh.tablePath("raw_exp", "ndt7"))
    assert(rawNdt.count() === 3) // m1(latest) + m2 + m9
    assert(rawNdt.filter($"id" === "m1").select("val").as[Long].head() === 2L)
    if (backend == "path")
      // a fully-drained path table keeps no partition dirs (and reading
      // a schemaless empty dir fails), so assert on the filesystem
      assert(!Files.exists(Path.of(s"$root/tmp_exp/ndt7/date=2024-01-01")))
    else
      assert(wh.readPartition(spark, wh.tablePath("tmp_exp", "ndt7"),
        java.time.LocalDate.parse("2024-01-01")).count() === 0)

    // join ran AFTER annotation2 completed and used the ±1-day window.
    // The tx join table is born with requirePartitionFilter (reference:
    // cloud/bq/ops.go:283-287) — an unscoped read throws; read per-day.
    val joinTbl = wh.tablePath("joined", "ndt7")
    val joined =
      if (backend == "tx") {
        intercept[IllegalArgumentException] { wh.read(spark, joinTbl) }
        wh.readWhere(spark, joinTbl,
          $"date".between(java.sql.Date.valueOf("2024-01-01"),
            java.sql.Date.valueOf("2024-01-02")))
      } else wh.read(spark, joinTbl)
    assert(joined.filter($"id" === "m1").select("geo").as[String].collect().toSet
      === Set("US", "DE")) // date and date-1 annotation rows both matched
    assert(joined.filter($"id" === "m9").select("geo").as[String].head() === "FR")
  }

  for ((backend, mkWh) <- Seq[(String, String => Warehouse)](
    "path" -> (r => Warehouse(r)),
    "tx" -> (r => new graft.tableops.TxWarehouse(r, checkpointEvery = 2))))
  test(s"[$backend] maintenance sweep compacts a fragmented completed day " +
    "without operator action; active days are left to their pipeline") {
    val root = Files.createTempDirectory("graft-e2e-maint").toString
    val wh = mkWh(root)
    val rawPath = wh.tablePath("raw_exp", "ndt7")
    def mkJob(date: String) =
      Job("bucket", "exp", "ndt7", java.time.LocalDate.parse(date),
        datasets = Datasets("tmp_exp", "raw_exp", ""))
    def fragment(date: String): Unit = (1 to 4).foreach { i =>
      wh.append(spark,
        (1 to 3).map(k => (s"id$i$k", java.sql.Date.valueOf(date), i.toLong))
          .toDF("id", "date", "v").repartition(3),
        rawPath)
    }
    // the done day is heavily fragmented (streaming-sink / re-ingest
    // shape: many small appended files); the active day equally so
    fragment("2024-03-01")
    fragment("2024-03-02")
    assert(wh.partitionFiles(spark, rawPath,
      java.time.LocalDate.parse("2024-03-01")).length == 12)

    val tracker = new Tracker(NoopSaver)
    val done = mkJob("2024-03-01")
    val active = mkJob("2024-03-02")
    assert(tracker.addJob(done).isRight)
    assert(tracker.setStatus(done.key, State.Complete).isRight)
    assert(tracker.addJob(active).isRight)
    assert(tracker.setStatus(active.key, State.Copying).isRight)

    // a sweeper-owned incremental export tails the raw table (tx only;
    // ignored on path): synced at the START of each pass, before the
    // same pass's log truncation can move the horizon past the cursor
    val exRoot = Files.createTempDirectory("graft-e2e-maint-ex").toString
    val sweeper = new graft.gardenerops.MaintenanceSweeper(spark, wh, tracker,
      minAgeMillis = 0L, exportRoots = Map(rawPath -> exRoot))
    assert(sweeper.sweep() == 1)

    // done day: 12 tiny files → the target layout (1); rows intact
    val d1 = java.time.LocalDate.parse("2024-03-01")
    assert(wh.partitionFiles(spark, rawPath, d1).length == 1)
    assert(wh.readPartition(spark, rawPath, d1).count() == 12)
    // active day: untouched — its pipeline owns it
    val d2 = java.time.LocalDate.parse("2024-03-02")
    assert(wh.partitionFiles(spark, rawPath, d2).length == 12)
    assert(wh.readPartition(spark, rawPath, d2).count() == 12)

    if (backend == "tx") {
      // the same sweep also bounded the commit log (9 commits + their
      // checkpoints collapse to the newest checkpoint + tail deltas)…
      val logDir = Path.of(s"$rawPath/_graft_log")
      val logCount = Files.list(logDir).iterator().asScala
        .count(_.getFileName.toString.endsWith(".txt"))
      assert(logCount <= 4, s"log not truncated: $logCount files")
      // …and reclaimed the retired fragments: only live data files stay
      val dataFiles = Files.walk(Path.of(s"$rawPath/_graft_data"))
        .iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(dataFiles == 1 + 12, s"retired fragments not vacuumed: $dataFiles")
    }
    if (backend == "tx") {
      // the export synced BEFORE this pass's compaction/truncation: it
      // carries both days' pre-compaction appends, and its cursor is
      // still resolvable after the same pass truncated the log
      assert(graft.tableops.IncrementalExport.readExport(spark, exRoot)
        .count() == 24)
    }
    // a second sweep is a metadata-only no-op
    assert(sweeper.sweep() == 0)
    if (backend == "tx") {
      val tx = wh.asInstanceOf[graft.tableops.TxWarehouse]
      // …except for the export, which caught up to the compaction
      // commit: the rewritten day re-exports as one more increment
      // (append-log semantics — no retraction; consumers diff snapshots
      // for that), and the chain is at the table's current version
      assert(graft.tableops.IncrementalExport.exportedVersion(spark, exRoot)
        == tx.currentVersion(spark, rawPath))
      assert(graft.tableops.IncrementalExport.readExport(spark, exRoot)
        .count() == 36)
    }
  }

  test("YAML-configured incremental content tier through the monitor: " +
    "day 2's re-ingested near-dup is dropped against day 1's archive") {
    val root = Files.createTempDirectory("graft-e2e-inc").toString
    val archive = Files.createTempDirectory("graft-e2e-inc-arc")
    val wh = Warehouse(root)
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    writeJsonl(archive.resolve("textlog/2024-02-01"), "part.json", Seq(
      s"""{"id":"d1","date":"2024-02-01","parser":{"Time":"2024-02-01T10:00:00Z"},"text":"$base"}"""))
    writeJsonl(archive.resolve("textlog/2024-02-02"), "part.json", Seq(
      s"""{"id":"d2","date":"2024-02-02","parser":{"Time":"2024-02-02T10:00:00Z"},"text":"${base}tail"}""",
      s"""{"id":"d3","date":"2024-02-02","parser":{"Time":"2024-02-02T09:00:00Z"},"text":"fresh content about catalyst planning and shuffle exchanges entirely new today"}"""))

    // the full config -> DatatypeSpec -> TableOps chain, as Gardener.main wires it
    val cfg = graft.config.GardenerConfig.parse(
      """sources: []
        |datatypes:
        |  textlog:
        |    content_dedup: { text_col: text, min_jaccard_e4: 8000,
        |                     vs_raw_corpus: true }
        |""".stripMargin)
    val specs = graft.cmd.Gardener.datatypeSpecs(cfg)

    val tracker = new Tracker(NoopSaver)
    def tableOp(f: TableOps => Unit): Job => Outcome = job =>
      try {
        f(new TableOps(spark, job, wh, specOverride = specs.get(job.datatype)))
        Outcome.Success()
      } catch { case e: Exception => Outcome.Failure(s"${e.getMessage}") }
    val monitor = new Monitor(tracker, StandardPipeline.actions(
      load = job => tableOp(ops => { ops.loadToTmp(
        s"$archive/${job.datatype}/${job.date}/*.json"); () })(job),
      dedup = tableOp(ops => { ops.dedup(); () }),
      copy = tableOp(ops => { ops.copyToRaw(); () }),
      delete = tableOp(_.deleteTmp()),
      join = tableOp(ops => { ops.join(); () })
    ), retryMillis = 10)

    def mkJob(date: String) =
      Job("bucket", "exp", "textlog", java.time.LocalDate.parse(date),
        datasets = Datasets("tmp_exp", "raw_exp", ""))
    def drain(j: Job): Unit = {
      assert(tracker.addJob(j).isRight)
      assert(tracker.setStatus(j.key, State.ParseComplete).isRight)
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        tracker.getState().values.exists(!_._2.isDone)) {
        monitor.tick(); Thread.sleep(50)
      }
      assert(tracker.getState()(j.key)._2.state === State.Complete)
    }

    drain(mkJob("2024-02-01")) // d1 archives into raw
    drain(mkJob("2024-02-02")) // d2 near-dups the archive => dropped; d3 kept
    val raw = spark.read.option("mergeSchema", "true").parquet(s"$root/raw_exp/textlog")
    assert(raw.select("id").as[String].collect().toSet === Set("d1", "d3"))
  }
}
