package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.gardenerops.{Action, Monitor, StandardPipeline}
import graft.model._
import graft.persistence.MemorySaver
import graft.tracker.Tracker

/** State-machine tests with stubbed actions (port of ops/ops_test.go:38-79
  * intent): drive jobs Init→…→Complete via deterministic ticks.
  */
class MonitorSpec extends AnyFunSuite {

  private def mkJob(dt: String, date: String = "2024-01-01", join: String = "join") =
    Job("b", "ndt", dt, LocalDate.parse(date),
      datasets = Datasets("tmp", "raw", join))

  /** Run ticks until the predicate holds or timeout (actions are async). */
  private def until(m: Monitor, timeoutMs: Long = 10000)(p: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!p && System.currentTimeMillis() < deadline) {
      m.tick(); Thread.sleep(10)
    }
    p
  }

  test("standard pipeline drains ParseComplete -> Complete") {
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def step(name: String): Job => Outcome =
      _ => { seen.add(name); Outcome.Success(name) }
    val m = new Monitor(tk, StandardPipeline.actions(
      step("load"), step("dedup"), step("copy"), step("delete"), step("join")))
    val j = mkJob("ndt7")
    tk.addJob(j)
    tk.setStatus(j.key, State.ParseComplete)
    assert(until(m) { tk.getState().get(j.key).exists(_._2.state == State.Complete) })
    assert(seen.toArray.toSeq == Seq("load", "dedup", "copy", "delete", "join"))
    // every action's wall time was observed into query_cost_seconds,
    // labeled (datatype, from-state) — the monitor times ALL actions
    val qc = tk.metricsSnapshot().queryCost
    Seq("postProcessing", "loading", "deduplicating", "copying", "deleting",
      "joining").foreach { q =>
      assert(qc.get(("ndt7", q)).exists(_.count == 1L), s"query cost for $q")
    }
  }

  test("join is gated on the same-date annotation job completing") {
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000)
    def ok: Job => Outcome = _ => Outcome.Success()
    val m = new Monitor(tk, StandardPipeline.actions(ok, ok, ok, ok, ok))
    val meas = mkJob("ndt7")
    val ann = mkJob("annotation2", join = "")
    tk.addJob(meas); tk.addJob(ann)
    tk.setStatus(meas.key, State.Joining)
    // annotation job still active (Init) => gate blocks
    (1 to 5).foreach(_ => { m.tick(); Thread.sleep(5) })
    assert(tk.getState()(meas.key)._2.state == State.Joining)
    // annotation pipeline runs to Complete (its own gate self-satisfies)
    tk.setStatus(ann.key, State.ParseComplete)
    assert(until(m) { tk.getState().get(ann.key).exists(_._2.state == State.Complete) })
    assert(until(m) { tk.getState().get(meas.key).exists(_._2.state == State.Complete) })
  }

  test("Retry outcome stays in state with backoff; Failure moves to Failed") {
    var now = 0L
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000, clock = () => now)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val retryAction = Action.unconditional(State.Loading,
      _ => if (attempts.incrementAndGet() < 3) Outcome.Retry("wait")
           else Outcome.Success("ok"),
      State.Deduplicating)
    val failAction = Action.unconditional(State.Deduplicating,
      _ => Outcome.Failure("boom"), State.Copying)
    val m = new Monitor(tk, Seq(retryAction, failAction),
      retryMillis = 1000, clock = () => now)
    val j = mkJob("ndt7")
    tk.addJob(j)
    tk.setStatus(j.key, State.Loading)
    // attempt 1 → Retry; further ticks within backoff do nothing
    assert(until(m) { attempts.get() == 1 })
    (1 to 3).foreach(_ => { m.tick(); Thread.sleep(5) })
    assert(attempts.get() == 1)
    assert(tk.getState()(j.key)._2.state == State.Loading)
    now += 1001 // backoff expires → attempt 2 → Retry
    assert(until(m) { attempts.get() == 2 })
    now += 1001 // attempt 3 → Success → Deduplicating → failAction → Failed
    assert(until(m) { tk.getState().get(j.key).exists(_._2.state == State.Failed) })
    assert(tk.getState()(j.key)._2.detail.contains("boom"))
  }

  test("action exceptions become Failure outcomes") {
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000)
    val m = new Monitor(tk, Seq(Action.unconditional(State.Loading,
      _ => throw new RuntimeException("kaput"), State.Deduplicating)))
    val j = mkJob("ndt7")
    tk.addJob(j)
    tk.setStatus(j.key, State.Loading)
    assert(until(m) { tk.getState().get(j.key).exists(_._2.state == State.Failed) })
    assert(tk.getState()(j.key)._2.detail.contains("kaput"))
  }

  test("tracker claims: grant, single-flight deny, lease expiry " +
    "takeover, owner-scoped release") {
    var now = 0L
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000,
      clock = () => now)
    // grant to the first claimant
    assert(tk.claim("j1", "a", 1000))
    // denied to a second owner AND to the holder itself (single-flight)
    assert(!tk.claim("j1", "b", 1000))
    assert(!tk.claim("j1", "a", 1000))
    // a stale owner's release is a no-op — the holder keeps the lease
    tk.releaseClaim("j1", "b")
    assert(!tk.claim("j1", "b", 1000))
    // past the lease, another driver takes the job over
    now += 1001
    assert(tk.claim("j1", "b", 1000))
    // the original owner's late release must not free b's lease
    tk.releaseClaim("j1", "a")
    assert(!tk.claim("j1", "c", 1000))
    // the holder's release frees it immediately
    tk.releaseClaim("j1", "b")
    assert(tk.claim("j1", "c", 1000))
  }

  test("a taken-over runner's stale outcome is dropped: a late Failure " +
    "cannot fail a job another driver already advanced") {
    var now = 0L
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000,
      clock = () => now)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val slowFail = Action.unconditional(State.Loading,
      _ => { latch.await(); Outcome.Failure("late boom") },
      State.Deduplicating)
    val a = new Monitor(tk, Seq(slowFail), clock = () => now,
      name = "driver-a", claimLeaseMillis = 1000)
    val j = mkJob("ndt7")
    tk.addJob(j); tk.setStatus(j.key, State.Loading)
    a.tick() // a claims and blocks inside the action
    val spin = System.currentTimeMillis() + 5000
    while (a.inFlight == 0 && System.currentTimeMillis() < spin)
      Thread.sleep(5)
    assert(a.inFlight == 1)
    // lease expires; driver b takes the job over and completes the state
    now += 1001
    assert(tk.claim(j.key, "driver-b", 1000))
    tk.setStatus(j.key, State.Deduplicating)
    tk.releaseClaim(j.key, "driver-b")
    // a's action resumes and fails — the stale outcome must be dropped
    latch.countDown()
    val spin2 = System.currentTimeMillis() + 5000
    while (a.inFlight > 0 && System.currentTimeMillis() < spin2)
      Thread.sleep(5)
    assert(a.inFlight == 0)
    assert(tk.getState()(j.key)._2.state == State.Deduplicating)
    assert(!tk.getState()(j.key)._2.history.exists(_.state == State.Failed))
  }

  test("claims: one in-flight action per job even with overlapping ticks") {
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000)
    val concurrent = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val slow = Action.unconditional(State.Loading, _ => {
      val c = concurrent.incrementAndGet()
      maxSeen.updateAndGet(m => math.max(m, c))
      Thread.sleep(50)
      concurrent.decrementAndGet()
      Outcome.Success()
    }, State.Complete)
    val m = new Monitor(tk, Seq(slow))
    val j = mkJob("ndt7")
    tk.addJob(j); tk.setStatus(j.key, State.Loading)
    (1 to 10).foreach(_ => m.tick()) // overlapping ticks while action runs
    assert(until(m) { tk.getState().get(j.key).exists(_._2.state == State.Complete) })
    assert(maxSeen.get() == 1)
  }

  test("single-flight survives lease expiry: a stalled action's own " +
    "monitor never doubles it up, while a rival still claims the key") {
    val tk = new Tracker(new MemorySaver, cleanupMillis = 3600_000)
    val starts = new java.util.concurrent.atomic.AtomicInteger(0)
    val release = new java.util.concurrent.CountDownLatch(1)
    val stalled = Action.unconditional(State.Loading, _ => {
      starts.incrementAndGet()
      release.await(10, java.util.concurrent.TimeUnit.SECONDS)
      Outcome.Success()
    }, State.Complete)
    // 1 ms lease: expired long before the action finishes
    val m = new Monitor(tk, Seq(stalled), name = "stuck-driver",
      claimLeaseMillis = 1L)
    val j = mkJob("ndt7")
    tk.addJob(j); tk.setStatus(j.key, State.Loading)
    m.tick()
    assert(until(m) { starts.get() == 1 })
    Thread.sleep(10) // lease is now expired, the action still running
    (1 to 5).foreach(_ => m.tick())
    assert(starts.get() == 1,
      "the stalled monitor re-dispatched its own in-flight action")
    // the expired lease is exactly what a RIVAL driver may take
    assert(tk.claim(j.key, "healthy-driver", 60_000L))
    release.countDown()
    assert(until(m) { m.inFlight == 0 })
  }

  test("graceful shutdown: intake stops first, in-flight actions drain " +
    "within the allowance, and the tracker snapshot is forced durable") {
    import java.time.{Duration, Instant}
    import graft.jobservice._
    val saver = new MemorySaver
    val now = Instant.parse("2024-06-01T12:00:00Z")
    val tk = new Tracker(saver, clock = () => System.currentTimeMillis())
    val spec = SourceSpec("bkt", "ndt", "ndt7",
      datasets = Datasets("tmp_ndt", "raw_ndt", "ndt"), dailyOnly = true)
    val service = new JobService(
      new JobIterator(new DailyIterator(saver, delay = Duration.ofHours(10),
        clock = () => now), Seq(spec)),
      new JobIterator(new HistoricalIterator(saver,
        java.time.LocalDate.parse("2024-05-30"), saverName = "hist",
        clock = () => now), Seq.empty),
      1, _ => true, clock = () => now)
    val api = new graft.api.JobsApi(tk, service)
    val port = api.start()

    val entered = new java.util.concurrent.CountDownLatch(1)
    val slow = Action.unconditional(State.Loading, _ => {
      entered.countDown(); Thread.sleep(300); Outcome.Success()
    }, State.Complete)
    val m = new Monitor(tk, Seq(slow))
    val handle = m.watch(10L)
    val j = mkJob("ndt7")
    tk.addJob(j); tk.setStatus(j.key, State.Loading)
    assert(entered.await(5, java.util.concurrent.TimeUnit.SECONDS))

    // shutdown while the action is mid-flight: must wait it out
    val drained = graft.cmd.Gardener.gracefulShutdown(api, Seq(handle),
      m, tk, timeoutMillis = 5000L)
    assert(drained)
    // the completed transition reached the tracker and was SYNCED: a
    // fresh tracker restored from the same saver sees Complete
    val restored = new Tracker(saver)
    assert(restored.getState().get(j.key).exists(_._2.state == State.Complete))
    // intake is stopped: the port refuses new connections
    val refused = scala.util.Try {
      val s = new java.net.Socket()
      s.connect(new java.net.InetSocketAddress("127.0.0.1", port), 500)
      s.close()
    }.isFailure
    assert(refused)
    // an undrained shutdown reports false instead of hanging
    val stuck = new java.util.concurrent.CountDownLatch(1)
    val tk2 = new Tracker(new MemorySaver)
    val never = Action.unconditional(State.Loading, _ => {
      stuck.await(); Outcome.Success()
    }, State.Complete)
    val m2 = new Monitor(tk2, Seq(never))
    val j2 = mkJob("ndt7")
    tk2.addJob(j2); tk2.setStatus(j2.key, State.Loading)
    m2.tick()
    val t0 = System.currentTimeMillis()
    val drained2 = graft.cmd.Gardener.gracefulShutdown(
      new graft.api.JobsApi(tk2, service), Seq(), m2, tk2,
      timeoutMillis = 200L)
    assert(!drained2)
    assert(System.currentTimeMillis() - t0 < 3000)
    stuck.countDown()
  }
}