package graft.gardenerops

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}

import scala.util.{Failure => TFailure, Success => TSuccess, Try}

import graft.model._
import graft.tracker.Tracker

/** One state-machine action: run when a tracked job sits in `from` and
  * `condition` holds; `run`'s Outcome drives the transition to `next`
  * (Success), a stay-and-retry (Retry), or Failed (Failure).
  * Reference: ops/ops.go:75-85 AddAction, ops/errors.go Outcome algebra.
  */
final case class Action(
    from: State,
    condition: (Map[String, (Job, Status)], Job) => Boolean,
    run: Job => Outcome,
    next: State,
    annotation: String = ""
)

object Action {
  def unconditional(from: State, run: Job => Outcome, next: State): Action =
    Action(from, (_, _) => true, run, next)
}

/** Polling monitor (reference: ops/ops.go:198-221 Watch + :107-124 claims +
  * :142-195 outcome dispatch). Every tick it snapshots the tracker, claims
  * each actionable job, and runs its action on a bounded pool. Claims
  * live in the TRACKER (leased, named by `name`) so several monitor
  * instances — including separate driver processes sharing a tracker
  * service and one transactional warehouse — split the job stream
  * instead of duplicating it; one in-flight action per job, and Retry
  * outcomes release the claim after a backoff so a later tick re-runs
  * the same state. `claimLeaseMillis` bounds how long a stalled/dead
  * driver parks a job before another may take it over; a taken-over
  * job's ORIGINAL runner may still commit late, which the warehouse's
  * conflict detection fences into Retry (the multi-driver safety
  * contract — see Tracker.claim). Leases are deliberately NOT renewed
  * while an action runs: a wedged action must not pin its job forever
  * (liveness), and the duplicate run a takeover causes is safe — only
  * wasteful — under the warehouse fencing. Size the lease above the
  * slowest healthy action, not above the poll interval.
  */
final class Monitor(
    tracker: Tracker,
    actions: Seq[Action],
    retryMillis: Long = 120000,
    poolSize: Int = 8,
    clock: () => Long = () => System.currentTimeMillis(),
    name: String = "monitor",
    claimLeaseMillis: Long = 1800000
) {
  private val actionTable: Map[State, Action] = actions.map(a => a.from -> a).toMap
  private val running = new java.util.concurrent.atomic.AtomicInteger(0)
  private val retryNotBefore = new ConcurrentHashMap[String, java.lang.Long]()
  // keys with an action on THIS monitor's pool right now. A stalled
  // action outliving its lease must NOT be doubled up by its own
  // monitor re-claiming the expired key on the next tick — that would
  // run two copies of one action in one driver (pure waste, and it
  // starves the takeover the expiry exists for: the re-claimer always
  // ticks sooner than the rival driver). Takeover stays with OTHER
  // drivers, whose tracker.claim sees only the expired lease.
  private val dispatched = ConcurrentHashMap.newKeySet[String]()
  private val pool = Executors.newFixedThreadPool(poolSize, r => {
    val t = new Thread(r, "monitor-action"); t.setDaemon(true); t
  })
  @volatile private var ticks: Long = 0

  /** One polling pass. Visible for deterministic tests. */
  def tick(): Unit = {
    ticks += 1
    val state = tracker.getState()
    state.foreach { case (key, (job, status)) =>
      actionTable.get(status.state).foreach { action =>
        val nb = retryNotBefore.get(key)
        val backoffOk = nb == null || clock() >= nb
        if (backoffOk && !dispatched.contains(key) &&
            action.condition(state, job) &&
            tracker.claim(key, name, claimLeaseMillis)) {
          dispatched.add(key)
          // count in-flight from DISPATCH, not from thread start: a
          // claimed action sitting in the pool queue must already hold
          // off gracefulShutdown's drain check, or shutdown can sync
          // the tracker and report drained with the action still to run
          running.incrementAndGet()
          try pool.submit(new Runnable {
            override def run(): Unit =
              try applyAction(key, job, action)
              finally {
                dispatched.remove(key); running.decrementAndGet(); ()
              }
          })
          catch {
            case _: java.util.concurrent.RejectedExecutionException =>
              // pool already shut down (close raced the tick): undo
              dispatched.remove(key)
              running.decrementAndGet()
              tracker.releaseClaim(key, name)
          }
        }
      }
    }
  }

  private def applyAction(key: String, job: Job, action: Action): Unit = {
    // EXECUTION-TIME claim re-validation: under load an action can sit
    // in the pool queue long past its claim lease — long enough for a
    // takeover to run the whole remaining pipeline (including the tmp
    // DRAIN that re-arms the load's idempotence epoch). Running the
    // action then is not merely wasted work: a post-drain stale LOAD
    // looks exactly like a legitimate reprocessing to the warehouse's
    // txn fence and re-appends rows the pipeline already archived. The
    // stale-OUTCOME guard below cannot help — it drops the status
    // update, not the side effects — so re-check the state and the
    // claim at thread start and skip the run entirely when either moved
    // on. (Best-effort like the outcome guard: the warehouse's commit
    // fencing stays the correctness backstop for actions that go stale
    // MID-run; this closes the arbitrarily-wide queued window.)
    if (!tracker.getState().get(key).exists(_._2.state == action.from) ||
        tracker.claimedByOther(key, name)) {
      graft.tableops.TableOps.tr(
        s"monitor $name skip-stale ${action.from.name} $key")
      tracker.releaseClaim(key, name): Unit
      return
    }
    // in-flight accounting lives at the dispatch site (tick), which
    // covers the queued-but-not-yet-started window too
    val t0 = clock()
    graft.tableops.TableOps.tr(
      s"monitor $name start ${action.from.name} $key")
    val outcome = Try(action.run(job)) match {
      case TSuccess(o) => o
      case TFailure(e) => Outcome.Failure(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    // every action's wall time feeds query_cost_seconds{datatype,query}
    // (reference: metrics/metrics.go:193-209 — it observes BigQuery slot
    // seconds; the Spark analog of "what did this query cost" is the
    // action's wall time on the session's executors). The query label is
    // the state the action ran FROM — the same bounded set of table ops
    // the reference labels with (load/dedup/copy/delete/join).
    tracker.observeQueryCost(job.datatype, action.from.name,
      (clock() - t0) / 1000.0)
    // Jobs can be expired/removed mid-action (ops/ops.go:176,210) — the
    // tracker update may fail; tolerate it.
    //
    // STALE-OUTCOME GUARD: if this runner's lease expired and the job
    // was taken over, its late outcome must not overwrite the new
    // runner's progress — a stale Failure would flip a since-completed
    // job to terminal Failed, a stale Success would regress the state
    // machine. Apply the outcome only if the job still sits in the
    // state we ran FROM and no other driver holds the claim now. (The
    // check-then-set window is narrow and best-effort by design — DATA
    // correctness never rests on it; the warehouse's commit fencing
    // does that. A dropped outcome just means the current claimant
    // re-runs the idempotent action.)
    val stale = !tracker.getState().get(key).exists(_._2.state == action.from) ||
      tracker.claimedByOther(key, name)
    graft.tableops.TableOps.tr(
      s"monitor $name done ${action.from.name} $key outcome=$outcome stale=$stale")
    outcome match {
      case _ if stale => ()
      case Outcome.Success(detail) =>
        retryNotBefore.remove(key)
        tracker.setStatus(key, action.next, detail): Unit
      case Outcome.Retry(detail) =>
        retryNotBefore.put(key, clock() + retryMillis)
        // park the claim instead of releasing it: the backoff must hold
        // across ALL drivers, not just this one's notBefore map
        tracker.parkClaim(key, name, retryMillis)
        tracker.setDetail(key, s"retrying: $detail"): Unit
      case Outcome.Failure(detail) =>
        retryNotBefore.remove(key)
        tracker.setStatus(key, State.Failed, detail): Unit
    }
    outcome match {
      case Outcome.Retry(_) if !stale => () // claim stays parked
      case _ => tracker.releaseClaim(key, name): Unit
    }
  }

  /** Start the polling loop (reference poll period: 5 s in prod main). */
  def watch(pollMillis: Long): AutoCloseable = {
    val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "monitor-poll"); t.setDaemon(true); t
    })
    scheduler.scheduleAtFixedRate(() => tick(), pollMillis, pollMillis,
      TimeUnit.MILLISECONDS)
    () => { scheduler.shutdownNow(); pool.shutdown(); () }
  }

  /** In-flight action count (this monitor's running actions). */
  def inFlight: Int = running.get()
  def tickCount: Long = ticks
}

/** Standard pipeline wiring (reference: ops/actions.go:62-93):
  * ParseComplete → Loading → Deduplicating → Copying → Deleting → Joining →
  * Complete, with the join gated on the same-date annotation job and
  * skipped entirely for datatypes without a join dataset.
  */
object StandardPipeline {

  /** The cross-job join gate (ops/actions.go:31-54): join waits until the
    * same-date annotation2 job is Complete; a missing annotation job (early
    * dates / annotation's own pipeline) does not block.
    */
  def joinCondition(annotationDatatype: String = "annotation2")(
      state: Map[String, (Job, Status)], job: Job): Boolean = {
    if (job.datatype == annotationDatatype) true
    else {
      val pending = state.values.exists { case (j, st) =>
        j.datatype == annotationDatatype && j.experiment == job.experiment &&
          j.date == job.date && !st.isDone
      }
      !pending
    }
  }

  /** Wire the six standard actions around TableOps-like functions. */
  def actions(
      load: Job => Outcome,
      dedup: Job => Outcome,
      copy: Job => Outcome,
      delete: Job => Outcome,
      join: Job => Outcome,
      annotationDatatype: String = "annotation2"
  ): Seq[Action] = Seq(
    Action.unconditional(State.ParseComplete, _ => Outcome.Success("start postprocessing"),
      State.Loading),
    Action.unconditional(State.Loading, load, State.Deduplicating),
    Action.unconditional(State.Deduplicating, dedup, State.Copying),
    Action.unconditional(State.Copying, copy, State.Deleting),
    Action.unconditional(State.Deleting, delete, State.Joining),
    Action(State.Joining, joinCondition(annotationDatatype),
      job => if (job.datasets.hasJoin) join(job) else Outcome.Success("join skipped"),
      State.Complete)
  )
}
