package graft.tracker

import java.util.concurrent.atomic.AtomicBoolean

import graft.model._
import graft.persistence.NamedSaver

/** Thread-safe job tracker (reference: tracker/tracker.go).
  *
  * Holds the JobMap, appends state history, snapshots to a NamedSaver, and
  * expires stale/complete jobs as a side effect of getState — all faithful
  * to the reference's semantics:
  *  - AddJob restarts Failed/Complete duplicates, rejects active ones
  *    (tracker/tracker.go:221-246)
  *  - getState deletes expired (no heartbeat/update for `expiry`) and
  *    cleaned-up (Complete older than `cleanupDelay`) jobs
  *    (tracker/tracker.go:353-377)
  *  - snapshot persists only when modified (tracker/tracker.go:172-204)
  */
final class Tracker(
    saver: NamedSaver,
    snapshotName: String = "gardener-tracker-state-v2",
    expiryMillis: Long = 24L * 3600 * 1000,
    cleanupMillis: Long = 3L * 3600 * 1000,
    clock: () => Long = () => System.currentTimeMillis()
) {
  private val lock = new Object
  private var jobs: Map[String, (Job, Status)] = Map.empty
  private val dirty = new AtomicBoolean(false)
  @volatile private var completedCount: Long = 0

  // ---- Prometheus-style accumulators (reference: metrics/metrics.go) ----
  // Monotonic counters + a time-in-state histogram, accumulated at the
  // transition points so they survive job expiry/cleanup (deriving them
  // from the live JobMap would make the counters go backwards). Reset on
  // restart, as Prometheus counters do; rates survive via rate().
  private val startedBy =
    scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
  private val completedBy =
    scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
  private val failedBy =
    scala.collection.mutable.Map[(String, String, String), Long]().withDefaultValue(0L)
  private val stateSeconds =
    scala.collection.mutable.Map[(String, String, String), Tracker.HistAcc]()
  // load-stats + query-cost families (metrics/metrics.go:152-209): files
  // and bytes submitted per date (labeled by the date's YEAR, as the
  // reference does — dates are unbounded, years are not) and per-op wall
  // time. Observed by the load/monitor paths via the two methods below.
  private val filesPerDate =
    scala.collection.mutable.Map[(String, String, String), Tracker.HistAcc]()
  private val bytesPerDate =
    scala.collection.mutable.Map[(String, String, String), Tracker.HistAcc]()
  private val queryCost =
    scala.collection.mutable.Map[(String, String), Tracker.HistAcc]()

  private def observeStateTime(job: Job, st: Status, now: Long): Unit =
    st.history.lastOption.foreach { last =>
      stateSeconds.getOrElseUpdate(
        (job.experiment, job.datatype, last.state.name),
        new Tracker.HistAcc(Tracker.StateTimeBuckets))
        .observe((now - last.start) / 1000.0)
    }

  /** Record a load's input volume (gardener_files / gardener_bytes,
    * metrics/metrics.go:152-191) — called by the load action with the
    * OpStats the Spark load computed.
    */
  def observeLoadStats(job: Job, files: Long, bytes: Long): Unit =
    lock.synchronized {
      val key = (job.experiment, job.datatype, job.date.getYear.toString)
      filesPerDate.getOrElseUpdate(key, new Tracker.HistAcc(Tracker.FilesBuckets))
        .observe(files.toDouble)
      bytesPerDate.getOrElseUpdate(key, new Tracker.HistAcc(Tracker.BytesBuckets))
        .observe(bytes.toDouble)
    }

  /** Record one table-op's wall time (query_cost_seconds,
    * metrics/metrics.go:193-209; the reference observes BigQuery slot
    * seconds — the Spark analog of "what did this query cost" is wall
    * time on the session's executors, observed by the monitor around
    * every action).
    */
  def observeQueryCost(datatype: String, query: String, seconds: Double): Unit =
    lock.synchronized {
      queryCost.getOrElseUpdate((datatype, query),
        new Tracker.HistAcc(Tracker.QueryCostBuckets)).observe(seconds)
    }

  // restore persisted state on construction (cmd/gardener/gardener.go:188-202)
  saver.load(snapshotName).foreach { json =>
    jobs = Codec.snapshotFromJson(json)
  }

  // ---- claims: the at-most-one-runner-per-job lease (reference:
  // ops/ops.go:107-124 keeps them inside the single monitor process;
  // they live in the TRACKER here so multiple monitor/driver instances
  // sharing one tracker — and one warehouse — split the work instead of
  // duplicating it). Leases expire so a stalled or dead driver's job
  // becomes re-claimable; expiry means a stale runner can still finish
  // LATE (at-least-once), and correctness under that is the WAREHOUSE's
  // job: its commit conflict detection fences the stale write into the
  // Retry path (see MultiDriverE2ESpec). Claims are runtime coordination
  // state — never part of the snapshot.
  private val claims =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Atomically claim `key` for `owner` until the lease expires. True
    * iff this call GRANTED the claim — a re-claim while any owner
    * (including `owner` itself) holds an unexpired lease returns false,
    * preserving single-flight per job within one monitor.
    */
  def claim(key: String, owner: String, leaseMillis: Long): Boolean = {
    val now = clock()
    var granted = false
    claims.compute(key, (_, cur) =>
      if (cur == null || cur._2 <= now) { granted = true; (owner, now + leaseMillis) }
      else cur)
    granted
  }

  /** Release `key` iff `owner` still holds it (a lease that expired and
    * was re-claimed by another driver is left untouched).
    */
  def releaseClaim(key: String, owner: String): Unit = {
    claims.computeIfPresent(key, (_, cur) => if (cur._1 == owner) null else cur)
    ()
  }

  /** Convert a held claim into a backoff: NOBODY — the owner included —
    * may re-claim the key until `backoffMillis` passes. This is the
    * cross-driver form of Retry's stay-in-state delay: a driver-local
    * not-before map would let OTHER drivers re-claim a just-conflicted
    * job instantly and re-run the expensive action back-to-back. No-op
    * if `owner` no longer holds the claim.
    */
  def parkClaim(key: String, owner: String, backoffMillis: Long): Unit = {
    claims.computeIfPresent(key, (_, cur) =>
      if (cur._1 == owner) (owner, clock() + backoffMillis) else cur)
    ()
  }

  /** True iff someone OTHER than `owner` holds an unexpired claim on
    * `key` — the stale-outcome guard: a runner whose lease was taken
    * over must not write its outcome over the new runner's.
    */
  def claimedByOther(key: String, owner: String): Boolean = {
    val cur = claims.get(key)
    cur != null && cur._1 != owner && cur._2 > clock()
  }

  /** Add a new job in Init state. Duplicate active jobs are rejected;
    * Failed/Complete duplicates are replaced (restart).
    */
  def addJob(job: Job): Either[String, Unit] = lock.synchronized {
    jobs.get(job.key) match {
      case Some((_, st)) if !st.isDone =>
        Left(s"job already active: ${job.key}")
      case _ =>
        jobs = jobs.updated(job.key, (job, Status.init(clock())))
        startedBy((job.experiment, job.datatype)) += 1
        dirty.set(true)
        Right(())
    }
  }

  /** Append a state transition to the job's history. */
  def setStatus(key: String, state: State, detail: String = ""): Either[String, Unit] =
    lock.synchronized {
      jobs.get(key) match {
        case None => Left(s"no such job: $key")
        case Some((job, st)) =>
          val now = clock()
          var next = st.newState(state, now)
          if (detail.nonEmpty) next = next.setDetail(detail, now)
          observeStateTime(job, st, now) // time spent in the state we leave
          if (state == State.Complete) {
            completedCount += 1
            completedBy((job.experiment, job.datatype)) += 1
          }
          if (state == State.Failed || state == State.ParseError)
            // label the failure with the state it failed OUT of — a bounded
            // class, like the reference's coarse status label
            failedBy((job.experiment, job.datatype, st.state.name)) += 1
          jobs = jobs.updated(key, (job, next))
          dirty.set(true)
          Right(())
      }
    }

  /** Update the detail of the current state without a transition (COW). */
  def setDetail(key: String, detail: String): Either[String, Unit] =
    lock.synchronized {
      jobs.get(key) match {
        case None => Left(s"no such job: $key")
        case Some((job, st)) =>
          jobs = jobs.updated(key, (job, st.setDetail(detail, clock())))
          dirty.set(true)
          Right(())
      }
    }

  def heartbeat(key: String): Either[String, Unit] = lock.synchronized {
    jobs.get(key) match {
      case None => Left(s"no such job: $key")
      case Some((job, st)) =>
        jobs = jobs.updated(key, (job, st.heartbeat(clock())))
        dirty.set(true)
        Right(())
    }
  }

  /** Parser-reported error → ParseError (terminal-by-neglect; expires). */
  def setJobError(key: String, err: String): Either[String, Unit] =
    setStatus(key, State.ParseError, err)

  /** Snapshot of the JobMap. Side effect (faithful to the reference):
    * removes expired jobs and Complete jobs past the cleanup delay.
    */
  def getState(): Map[String, (Job, Status)] = lock.synchronized {
    val now = clock()
    val (keep, drop) = jobs.partition { case (_, (_, st)) =>
      val lastTouch = math.max(st.heartbeatTime,
        st.history.lastOption.map(si => math.max(si.start, si.detailTime)).getOrElse(0L))
      val expired = expiryMillis > 0 && now - lastTouch > expiryMillis
      val cleaned = st.state == State.Complete &&
        (cleanupMillis == 0 || now - lastTouch > cleanupMillis)
      !(expired || cleaned)
    }
    if (drop.nonEmpty) { jobs = keep; dirty.set(true) }
    keep
  }

  /** Consistent snapshot of the accumulated metric families (for the
    * Prometheus text exposition in JobsApi).
    */
  def metricsSnapshot(): Tracker.Metrics = lock.synchronized(Tracker.Metrics(
    started = startedBy.toMap,
    completed = completedBy.toMap,
    failed = failedBy.toMap,
    stateSeconds = stateSeconds.map { case (k, v) => k -> v.snapshot }.toMap,
    files = filesPerDate.map { case (k, v) => k -> v.snapshot }.toMap,
    bytes = bytesPerDate.map { case (k, v) => k -> v.snapshot }.toMap,
    queryCost = queryCost.map { case (k, v) => k -> v.snapshot }.toMap))

  def numJobs: Int = lock.synchronized(jobs.size)

  def numFailed: Int = lock.synchronized(
    jobs.count { case (_, (_, st)) => st.state == State.Failed })

  def completed: Long = completedCount

  /** Persist the snapshot iff modified since the last sync. */
  def sync(): Boolean = {
    val snapshot = lock.synchronized {
      if (!dirty.getAndSet(false)) None
      else Some(Codec.snapshotToJson(clock(), jobs))
    }
    snapshot match {
      case Some(json) =>
        try { saver.save(snapshotName, json); true }
        catch { case _: Exception => dirty.set(true); false }
      case None => false
    }
  }

  /** Background snapshot loop (reference snapshots every minute,
    * cmd/gardener/gardener.go:191-195). Returns the running thread.
    */
  def saveEvery(intervalMillis: Long): Thread = {
    val t = new Thread(() => {
      var running = true
      while (running && !Thread.currentThread().isInterrupted) {
        try { Thread.sleep(intervalMillis); sync(); () }
        catch { case _: InterruptedException => running = false }
      }
    }, "tracker-saver")
    t.setDaemon(true)
    t.start()
    t
  }
}

object Tracker {

  /** Time-in-state histogram bucket upper bounds in seconds — the
    * reference's StateTimeHistogram buckets (metrics/metrics.go:127-139).
    */
  val StateTimeBuckets: Array[Double] = Array(
    0.1, 0.3, 1, 3, 10, 30,
    100, 300, 1000, 1800, 3600, 2 * 3600, 4 * 3600, 8 * 3600, 12 * 3600)

  /** Files-per-date bucket bounds — the reference's FilesPerDateHistogram
    * (metrics/metrics.go:152-165): a 1-2-3..-geometric ladder from 1 to
    * 900k files.
    */
  val FilesBuckets: Array[Double] = Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9,
    10, 12, 14, 17, 20, 24, 28, 32, 38, 44, 50, 60, 70, 80, 90,
    100, 120, 140, 170, 200, 240, 280, 320, 380, 440, 500, 600, 700, 800, 900,
    1000, 1200, 1400, 1700, 2000, 2400, 2800, 3200, 3800, 4400, 5000, 6000,
    7000, 8000, 9000,
    10000, 12000, 14000, 17000, 20000, 24000, 28000, 32000, 38000, 44000,
    50000, 60000, 70000, 80000, 90000,
    100000, 120000, 140000, 170000, 200000, 240000, 280000, 320000, 380000,
    440000, 500000, 600000, 700000, 800000, 900000)

  /** Bytes-per-date bucket bounds — the reference's BytesPerDateHistogram
    * (metrics/metrics.go:167-191): ~1.4× ladder from 100 kB to 80 GB.
    */
  val BytesBuckets: Array[Double] = Array[Double](
    100000, 140000, 200000, 280000, 400000, 560000, 800000,
    1000000, 1400000, 2000000, 2800000, 4000000, 5600000, 8000000,
    10000000, 14000000, 20000000, 28000000, 40000000, 56000000, 80000000,
    100000000, 140000000, 200000000, 280000000, 400000000, 560000000,
    800000000,
    1000000000, 1400000000, 2000000000, 2800000000d, 4000000000d, 5600000000d,
    8000000000d,
    10000000000d, 14000000000d, 20000000000d, 28000000000d, 40000000000d,
    56000000000d, 80000000000d)

  /** Query-cost bucket bounds — the reference's QueryCostHistogram
    * (metrics/metrics.go:193-209): half-decade ladder, 1 s to ~12k hours.
    */
  val QueryCostBuckets: Array[Double] = Array(
    1.0, 2.15, 4.64, 10, 21.5, 46.4,
    100, 215, 464, 1000, 2150, 4640,
    10000, 21500, 46400, 100000, 215000, 464000,
    1000000, 2150000, 4640000, 10000000, 21500000, 46400000)

  /** Cumulative-bucket histogram accumulator (Prometheus semantics:
    * bucket `le=b` counts observations ≤ b; +Inf bucket == count).
    */
  final class HistAcc(buckets: Array[Double]) {
    private val counts = new Array[Long](buckets.length + 1)
    private var total = 0L
    private var sum = 0.0
    def observe(v: Double): Unit = {
      var i = 0
      while (i < buckets.length && v > buckets(i)) i += 1
      counts(i) += 1
      total += 1
      sum += v
    }
    def snapshot: Hist = {
      val cum = new Array[Long](counts.length)
      var acc = 0L
      var i = 0
      while (i < counts.length) { acc += counts(i); cum(i) = acc; i += 1 }
      Hist(buckets, cum, sum, total)
    }
  }

  /** Immutable histogram snapshot: `cumBuckets(i)` is the count of
    * observations ≤ `le(i)`; the last slot is +Inf (== count).
    */
  final case class Hist(le: Array[Double], cumBuckets: Array[Long],
      sum: Double, count: Long)

  /** Snapshot of all accumulated families, keyed by label values. */
  final case class Metrics(
      started: Map[(String, String), Long],
      completed: Map[(String, String), Long],
      failed: Map[(String, String, String), Long],
      stateSeconds: Map[(String, String, String), Hist],
      files: Map[(String, String, String), Hist],
      bytes: Map[(String, String, String), Hist],
      queryCost: Map[(String, String), Hist])
}
