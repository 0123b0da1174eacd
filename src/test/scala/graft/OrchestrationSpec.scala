package graft

import java.time.{Duration, Instant, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import graft.config.GardenerConfig
import graft.jobservice._
import graft.model._
import graft.persistence.{FailSaver, MemorySaver}
import graft.tracker.Tracker

/** Ports of the reference's unit-test intents for model/tracker/iterators/
  * config (SURVEY.md §5, §7.6). No Spark involved.
  */
class OrchestrationSpec extends AnyFunSuite {

  private def mkJob(dt: String = "ndt7", date: String = "2024-01-01") =
    Job("bucket", "ndt", dt, LocalDate.parse(date),
      datasets = Datasets("tmp_ndt", "raw_ndt", "ndt"))

  // ---- model codecs ----

  test("state codec matches reference names incl. postProcessing") {
    assert(State.ParseComplete.name == "postProcessing")
    assert(State.fromString("postProcessing").contains(State.ParseComplete))
    State.all.foreach(s => assert(State.fromString(s.name).contains(s)))
  }

  test("job json round trip") {
    val j = mkJob()
    assert(Codec.jobFromJson(Codec.jobToJson(j)) == j)
    // DailyOnly/FullHistory never reach the wire (reference json:"-"),
    // so a round trip preserves id+job and resets the scheduling flags
    val jt = JobWithTarget("id1", j, dailyOnly = true)
    val wire = Codec.jobWithTargetToJson(jt)
    assert(!wire.contains("DailyOnly") && !wire.contains("FullHistory"))
    assert(Codec.jobWithTargetFromJson(wire) == jt.copy(dailyOnly = false))
  }

  test("status times are RFC3339 strings on the wire, Go zero time for 0") {
    val st = Status.init(5L).newState(State.Parsing, 6L)
    val node = Codec.statusToNode(st.copy(heartbeatTime = 0L))
    assert(node.get("HeartbeatTime").asText() == "0001-01-01T00:00:00Z")
    assert(node.get("History").get(0).get("Start").asText()
      == "1970-01-01T00:00:00.005Z")
    assert(Codec.statusFromNode(node) == st.copy(heartbeatTime = 0L))
  }

  test("snapshot round trip drops jobs with empty Tmp dataset") {
    val good = mkJob()
    val bad = Job("b", "e", "d", LocalDate.parse("2024-01-01"))
    val jobs = Map(
      good.key -> (good, Status.init(5L).newState(State.Parsing, 6L)),
      bad.key -> (bad, Status.init(5L)))
    val restored = Codec.snapshotFromJson(Codec.snapshotToJson(7L, jobs))
    assert(restored.keySet == Set(good.key))
    assert(restored(good.key)._2.state == State.Parsing)
  }

  // ---- tracker ----

  test("tracker: add, dup rejection, restart of done jobs") {
    val tk = new Tracker(new MemorySaver, clock = () => 1000L)
    val j = mkJob()
    assert(tk.addJob(j).isRight)
    assert(tk.addJob(j).isLeft) // active dup rejected
    assert(tk.setStatus(j.key, State.Failed, "boom").isRight)
    assert(tk.addJob(j).isRight) // failed job restarts
  }

  test("tracker: state walk appends history and counts updates") {
    val tk = new Tracker(new MemorySaver, clock = () => 1000L)
    val j = mkJob()
    tk.addJob(j)
    Seq(State.Parsing, State.ParseComplete, State.Loading, State.Complete)
      .foreach(s => assert(tk.setStatus(j.key, s).isRight))
    val (_, st) = tk.getState()(j.key)
    assert(st.state == State.Complete)
    assert(st.history.map(_.state) == Vector(State.Init, State.Parsing,
      State.ParseComplete, State.Loading, State.Complete))
    assert(tk.completed == 1)
  }

  test("tracker: getState expires stale jobs and cleans up complete ones") {
    var now = 0L
    val tk = new Tracker(new MemorySaver, expiryMillis = 1000,
      cleanupMillis = 100, clock = () => now)
    val stale = mkJob(date = "2024-01-01")
    val done = mkJob(date = "2024-01-02")
    val live = mkJob(date = "2024-01-03")
    Seq(stale, done, live).foreach(j => assert(tk.addJob(j).isRight))
    now = 500
    tk.setStatus(done.key, State.Complete)
    tk.heartbeat(live.key)
    now = 1400 // stale: last touch 0 (>1000 ago); done: complete 500 (+100 cleanup passed); live: heartbeat 500
    val state = tk.getState()
    assert(state.keySet == Set(live.key))
  }

  test("tracker: sync persists only when dirty; snapshot restores") {
    val saver = new MemorySaver
    val tk = new Tracker(saver, clock = () => 42L)
    assert(!tk.sync()) // nothing dirty
    val j = mkJob()
    tk.addJob(j)
    assert(tk.sync())
    assert(!tk.sync()) // unchanged since last sync
    val tk2 = new Tracker(saver, clock = () => 43L)
    assert(tk2.getState().keySet == Set(j.key))
  }

  test("tracker: failed save keeps state dirty for retry") {
    val tk = new Tracker(new FailSaver, clock = () => 1L)
    tk.addJob(mkJob())
    assert(!tk.sync()) // save failed
    // still dirty: a later sync (with a working saver it would succeed) retries
    assert(!tk.sync())
  }

  test("tracker: concurrent updates are linearized") {
    val tk = new Tracker(new MemorySaver, clock = () => 1L)
    val js = (1 to 50).map(i => mkJob(date = f"2024-02-${i % 28 + 1}%02d"))
    js.distinct.foreach(tk.addJob)
    val threads = (1 to 8).map { _ =>
      new Thread(() => js.distinct.foreach { j =>
        tk.setDetail(j.key, "d"); tk.heartbeat(j.key)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(tk.numJobs == js.distinct.size)
  }

  // ---- iterators ----

  test("daily iterator yields a date only after the processing delay") {
    var now = Instant.parse("2024-01-10T00:00:00Z")
    val saver = new MemorySaver
    val it = new DailyIterator(saver, delay = Duration.ofHours(10).plusMinutes(30),
      clock = () => now)
    // starts at yesterday (2024-01-09); due at 2024-01-10T10:30Z
    assert(it.next().isEmpty)
    now = Instant.parse("2024-01-10T10:29:00Z")
    assert(it.next().isEmpty)
    now = Instant.parse("2024-01-10T10:31:00Z")
    assert(it.next().contains(LocalDate.parse("2024-01-09")))
    assert(it.next().isEmpty) // next day not due yet
  }

  test("daily iterator saves the CURRENT date; restart re-delivers, never skips") {
    var now = Instant.parse("2024-01-10T10:31:00Z")
    val saver = new MemorySaver
    val it = new DailyIterator(saver, delay = Duration.ofHours(10).plusMinutes(30),
      clock = () => now)
    assert(it.next().contains(LocalDate.parse("2024-01-09")))
    // a restart (new iterator, same saver) re-yields the saved date: a
    // crash between save and dispatch re-does 01-09, never skips it
    // (ops are idempotent; reference iterators.go:23-28)
    val it2 = new DailyIterator(saver, delay = Duration.ofHours(10).plusMinutes(30),
      clock = () => now)
    assert(it2.current == LocalDate.parse("2024-01-09"))
    assert(it2.next().contains(LocalDate.parse("2024-01-09")))
    assert(it2.next().isEmpty) // 2024-01-10 due tomorrow 10:30
  }

  test("historical iterator restart re-delivers the in-flight date") {
    var now = Instant.parse("2020-06-01T00:00:00Z")
    val saver = new MemorySaver
    val it = new HistoricalIterator(saver, LocalDate.parse("2020-01-05"),
      clock = () => now)
    assert(it.next().contains(LocalDate.parse("2020-01-05")))
    assert(it.next().contains(LocalDate.parse("2020-01-06")))
    val it2 = new HistoricalIterator(saver, LocalDate.parse("2020-01-05"),
      clock = () => now)
    assert(it2.next().contains(LocalDate.parse("2020-01-06"))) // re-done
  }

  test("historical iterator sweeps and restarts near now") {
    var now = Instant.parse("2020-01-10T00:00:00Z")
    val it = new HistoricalIterator(new MemorySaver, LocalDate.parse("2020-01-05"),
      restartWithin = Duration.ofHours(36), clock = () => now)
    assert(it.next().contains(LocalDate.parse("2020-01-05")))
    assert(it.next().contains(LocalDate.parse("2020-01-06")))
    assert(it.next().contains(LocalDate.parse("2020-01-07")))
    assert(it.next().contains(LocalDate.parse("2020-01-08")))
    // 2020-01-09T00:00 is within 36h of 2020-01-10T00:00 → restart
    assert(it.next().contains(LocalDate.parse("2020-01-05")))
  }

  test("job iterator enumerates every source per date before advancing") {
    var now = Instant.parse("2020-06-01T00:00:00Z")
    val hist = new HistoricalIterator(new MemorySaver, LocalDate.parse("2020-01-01"),
      clock = () => now)
    val specs = Seq(
      SourceSpec("b", "ndt", "ndt7"), SourceSpec("b", "ndt", "annotation2"))
    val it = new JobIterator(hist, specs)
    val four = (1 to 4).flatMap(_ => it.next())
    assert(four.map(_._1.datatype) == Seq("ndt7", "annotation2", "ndt7", "annotation2"))
    assert(four.map(_._2.toString) ==
      Seq("2020-01-01", "2020-01-01", "2020-01-02", "2020-01-02"))
  }

  test("job service: daily first, lookback cap, has-files gate") {
    var now = Instant.parse("2024-06-01T12:00:00Z")
    val saver = new MemorySaver
    val dailySpec = SourceSpec("b", "ndt", "ndt7", dailyOnly = true,
      datasets = Datasets("tmp", "raw", "join"))
    val histSpec = SourceSpec("b", "ndt", "tcpinfo",
      datasets = Datasets("tmp", "raw", ""))
    val daily = new JobIterator(
      new DailyIterator(saver, delay = Duration.ofHours(10), clock = () => now),
      Seq(dailySpec))
    val hist = new JobIterator(
      new HistoricalIterator(saver, LocalDate.parse("2024-05-20"),
        saverName = "hist", clock = () => now),
      Seq(histSpec))
    var withFiles: Set[LocalDate] = Set(
      LocalDate.parse("2024-05-31"), LocalDate.parse("2024-05-20"))
    val svc = new JobService(daily, hist, 2,
      job => withFiles(job.date), clock = () => now)
    // daily job (yesterday) first
    val first = svc.nextJob().get
    assert(first.job.datatype == "ndt7" && first.dailyOnly)
    assert(first.job.date == LocalDate.parse("2024-05-31"))
    assert(first.id == first.job.key)
    // then the historical sweep
    val second = svc.nextJob().get
    assert(second.job.datatype == "tcpinfo")
    assert(second.job.date == LocalDate.parse("2024-05-20"))
    // dates with no files are skipped (2024-05-21 has none → None this round)
    assert(svc.nextJob().isEmpty)
  }

  // ---- config ----

  test("config: yaml parse with durations, datasets, flags") {
    val cfg = GardenerConfig.parse(
      """start_date: 2019-03-04T00:01:02Z
        |tracker: { timeout: 5h }
        |monitor: { polling_interval: 2m30s }
        |sources:
        |- bucket: fake-bucket
        |  experiment: ndt
        |  datatype: ndt7
        |  filter: ".*T..:..:00.*Z"
        |  target_datasets: { tmp: tmp_ndt, raw: raw_ndt, join: ndt }
        |  daily_only: true
        |- bucket: fake-bucket
        |  experiment: ndt
        |  datatype: annotation2
        |  target_datasets: { tmp: tmp_ndt, raw: raw_ndt }
        |  full_history: true
        |""".stripMargin)
    assert(cfg.startDate == LocalDate.parse("2019-03-04"))
    assert(cfg.trackerTimeout == Duration.ofHours(5))
    assert(cfg.pollingInterval == Duration.ofMinutes(2).plusSeconds(30))
    assert(cfg.sources.size == 2)
    val ndt7 = cfg.sources.head
    assert(ndt7.datasets == Datasets("tmp_ndt", "raw_ndt", "ndt"))
    assert(ndt7.dailyOnly && !ndt7.fullHistory)
    assert(ndt7.filter.nonEmpty)
    val ann = cfg.sources(1)
    assert(!ann.datasets.hasJoin && ann.fullHistory)
  }

  test("config: per-datatype dedup keys and content tier parse, with defaults") {
    val cfg = GardenerConfig.parse(
      """sources:
        |- bucket: b
        |  experiment: e
        |  datatype: textlog
        |  target_datasets: { tmp: tmp_e, raw: raw_e }
        |datatypes:
        |  textlog:
        |    partition_keys: [id, date]
        |    order_key: parser.Time
        |    content_dedup: { text_col: text, min_jaccard_e4: 8000,
        |                     vs_raw_corpus: true }
        |  hotkeys:
        |    skewed_keys: true
        |  governed:
        |    bloom_key: id
        |    checks: { nonempty_id: "id IS NOT NULL", positive_v: "v > 0" }
        |""".stripMargin)
    val tl = cfg.datatypes("textlog")
    assert(tl.partitionKeys == Seq("id", "date"))
    assert(tl.orderKey == "parser.Time")
    assert(!tl.skewedKeys)
    assert(tl.contentDedup.contains(
      graft.config.ContentDedupConfig("text", 8000L, vsRawCorpus = true)))
    // omitted fields default to the reference's v2 configuration
    val hk = cfg.datatypes("hotkeys")
    assert(hk.partitionKeys == Seq("id", "date") && hk.orderKey == "parser.Time")
    assert(hk.skewedKeys && hk.contentDedup.isEmpty)
    // and the cmd wiring converts it into the TableOps override 1:1
    val specs = graft.cmd.Gardener.datatypeSpecs(cfg)
    assert(specs("textlog") == graft.tableops.DatatypeSpec(Seq("id", "date"),
      "parser.Time", skewedKeys = false,
      contentDedup = Some(graft.tableops.ContentDedupSpec("text", 8000L,
        vsRawCorpus = true))))
    assert(specs("hotkeys").skewedKeys && specs("hotkeys").contentDedup.isEmpty)
    // governance: the bloom key and named CHECKs flow through to the spec
    val gv = cfg.datatypes("governed")
    assert(gv.bloomKey.contains("id"))
    assert(gv.checks == Seq("nonempty_id" -> "id IS NOT NULL",
      "positive_v" -> "v > 0"))
    assert(specs("governed").bloomKey.contains("id") &&
      specs("governed").checks.size == 2)
  }

  test("config: go-style duration strings") {
    assert(GardenerConfig.parseDuration("90s") == Duration.ofSeconds(90))
    assert(GardenerConfig.parseDuration("1h30m") == Duration.ofMinutes(90))
    assert(GardenerConfig.parseDuration("5h") == Duration.ofHours(5))
  }
}
