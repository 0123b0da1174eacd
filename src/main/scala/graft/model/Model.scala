package graft.model

import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Core domain model (no Spark dependency).
  *
  * Mirrors the reference's unit-of-work and lifecycle abstractions:
  * Job (reference: tracker/job.go:28-37), Datasets (tracker/job.go:41-45),
  * State (tracker/job.go:191-205), Status/StateInfo (tracker/job.go:208-245),
  * Outcome (ops/errors.go:9-57).
  */

/** The three-stage table namespace: Tmp (scratch), Raw (deduped archive),
  * Join (annotated materialization). Reference: tracker/job.go:41-45.
  * An empty Join means "no join step for this datatype".
  */
final case class Datasets(tmp: String, raw: String, join: String) {
  def hasJoin: Boolean = join.nonEmpty
}

object Datasets {
  val empty: Datasets = Datasets("", "", "")
}

/** The unit of work: one (bucket, experiment, datatype, date) partition.
  * Reference: tracker/job.go:28-37.
  */
final case class Job(
    bucket: String,
    experiment: String,
    datatype: String,
    date: LocalDate,
    filter: String = "",
    datasets: Datasets = Datasets.empty
) {
  /** Unique key `bucket/exp/type/YYYYMMDD`. Reference: tracker/job.go:158-161. */
  def key: String =
    s"$bucket/$experiment/$datatype/${date.format(Job.Compact)}"

  /** Partition operand `datatype$YYYYMMDD`. Reference: tracker/job.go:48-50. */
  def tablePartition: String = s"$datatype$$${date.format(Job.Compact)}"

  /** Archive prefix `bucket/exp/type/YYYY/MM/DD/`. Reference: tracker/job.go:100-107. */
  def prefix: String =
    s"$bucket/$experiment/$datatype/${date.format(Job.Slashed)}/"
}

object Job {
  val Compact: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyyMMdd")
  val Slashed: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy/MM/dd")
}

/** Job + ID + scheduling flags handed to parsers. Reference: tracker/job.go:54-60. */
final case class JobWithTarget(
    id: String,
    job: Job,
    dailyOnly: Boolean = false,
    fullHistory: Boolean = false
)

/** 13-state lifecycle. String codecs match the reference exactly, including
  * ParseComplete serializing as "postProcessing". Reference: tracker/job.go:191-205.
  */
sealed abstract class State(val name: String) {
  override def toString: String = name
}

object State {
  case object Init          extends State("init")
  case object Parsing       extends State("parsing")
  case object ParseError    extends State("parseError")
  case object ParseComplete extends State("postProcessing")
  case object Stabilizing   extends State("stabilizing")
  case object Loading       extends State("loading")
  case object Deduplicating extends State("deduplicating")
  case object Copying       extends State("copying")
  case object Joining       extends State("joining")
  case object Deleting      extends State("deleting")
  case object Finishing     extends State("finishing")
  case object Failed        extends State("failed")
  case object Complete      extends State("complete")

  /** Any other state string. The reference's State is a plain string type
    * (tracker/job.go:189), so the API accepts arbitrary values; a custom
    * state has no registered action and simply ages out of the tracker.
    */
  final case class Custom(label: String) extends State(label)

  val all: Seq[State] = Seq(Init, Parsing, ParseError, ParseComplete,
    Stabilizing, Loading, Deduplicating, Copying, Joining, Deleting,
    Finishing, Failed, Complete)

  private val byName: Map[String, State] = all.map(s => s.name -> s).toMap

  def fromString(s: String): Option[State] = byName.get(s)

  /** Total parse: a known state, or [[Custom]] — string semantics like the
    * reference's.
    */
  def parse(s: String): State = byName.getOrElse(s, Custom(s))

  /** Terminal states never re-enter the action table. */
  def isTerminal(s: State): Boolean = s == Failed || s == Complete
}

/** One step in a job's state history. Reference: tracker/job.go:208-213. */
final case class StateInfo(
    state: State,
    start: Long,            // epoch millis when the state was entered
    detailTime: Long,       // epoch millis of the last detail update
    detail: String
) {
  def withDetail(d: String, now: Long): StateInfo =
    copy(detailTime = now, detail = d)
}

/** Per-job status: heartbeat, update count, append-only history.
  * Immutable — copy-on-write is free. Reference: tracker/job.go:236-245.
  */
final case class Status(
    heartbeatTime: Long,
    updateCount: Int,
    history: Vector[StateInfo]
) {
  def state: State = history.lastOption.map(_.state).getOrElse(State.Init)
  def detail: String = history.lastOption.map(_.detail).getOrElse("")

  def newState(s: State, now: Long): Status =
    copy(history = history :+ StateInfo(s, now, now, ""), updateCount = updateCount + 1)

  def setDetail(d: String, now: Long): Status =
    history.lastOption match {
      case Some(last) =>
        copy(history = history.init :+ last.withDetail(d, now),
          updateCount = updateCount + 1)
      case None => this
    }

  def heartbeat(now: Long): Status = copy(heartbeatTime = now)

  def isDone: Boolean = State.isTerminal(state)
}

object Status {
  def init(now: Long): Status =
    Status(heartbeatTime = now, updateCount = 0,
      history = Vector(StateInfo(State.Init, now, now, "")))
}

/** Tri-state action outcome driving the state machine. Reference: ops/errors.go:9-57. */
sealed trait Outcome {
  def detail: String
}

object Outcome {
  /** Advance to the action's next state. */
  final case class Success(detail: String = "") extends Outcome
  /** Stay in state; retry after backoff. */
  final case class Retry(detail: String = "") extends Outcome
  /** Move to Failed. */
  final case class Failure(detail: String = "") extends Outcome
}
