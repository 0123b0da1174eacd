package graft.jobservice

import java.time.{Duration, Instant, LocalDate, ZoneOffset}

import graft.model.{Codec, Datasets, Job}
import graft.persistence.NamedSaver

/** Source spec (reference: config/config.go:27-35). */
final case class SourceSpec(
    bucket: String,
    experiment: String,
    datatype: String,
    filter: String = "",
    datasets: Datasets = Datasets.empty,
    dailyOnly: Boolean = false,
    fullHistory: Boolean = false
)

/** Date iterators (reference: job-service/iterators.go:33-128). Both
  * persist the current date BEFORE advancing: a crash between save and
  * hand-off re-does a date, never skips one.
  */
trait DateIterator {
  /** Next date to process, or None when nothing is due yet. */
  def next(): Option[LocalDate]
}

/** Daily iterator: yields each UTC day once, `delay` after the day's data
  * ends (reference delay: 24h + 10h30m ≈ 10:30 UTC next day;
  * job-service/job-service.go:143, iterators.go:69-85).
  */
final class DailyIterator(
    saver: NamedSaver,
    saverName: String = "daily-iterator",
    delay: Duration = Duration.ofHours(24).plusMinutes(630 - 24 * 60),
    clock: () => Instant = () => Instant.now()
) extends DateIterator {
  private var date: LocalDate = saver.load(saverName)
    .map(Codec.iterStateFromJson)
    .getOrElse(clock().atZone(ZoneOffset.UTC).toLocalDate.minusDays(1))

  override def next(): Option[LocalDate] = this.synchronized {
    val due = date.plusDays(1).atStartOfDay(ZoneOffset.UTC).toInstant.plus(delay)
    if (clock().isBefore(due)) None
    else {
      val d = date
      // Save the CURRENT date before advancing (reference:
      // iterators.go:75-77): a crash after the save but before the job is
      // dispatched re-yields d on restart — a date is re-done (ops are
      // idempotent), never skipped.
      saver.save(saverName, Codec.iterStateToJson(d))
      date = date.plusDays(1)
      Some(d)
    }
  }

  def current: LocalDate = this.synchronized(date)
}

/** Historical iterator: continuous sweep from startDate; restarts from
  * startDate when the sweep reaches within `restartWithin` of now
  * (reference: 36h; iterators.go:114-128).
  */
final class HistoricalIterator(
    saver: NamedSaver,
    startDate: LocalDate,
    saverName: String = "historical-iterator",
    restartWithin: Duration = Duration.ofHours(36),
    clock: () => Instant = () => Instant.now()
) extends DateIterator {
  private var date: LocalDate = saver.load(saverName)
    .map(Codec.iterStateFromJson)
    .getOrElse(startDate)

  override def next(): Option[LocalDate] = this.synchronized {
    val nearNow = clock().minus(restartWithin)
    if (!date.atStartOfDay(ZoneOffset.UTC).toInstant.isBefore(nearNow)) {
      date = startDate // restart the sweep
    }
    val d = date
    // save the CURRENT date before advancing — see DailyIterator.next
    saver.save(saverName, Codec.iterStateToJson(d))
    date = date.plusDays(1)
    Some(d)
  }

  def current: LocalDate = this.synchronized(date)
}

/** Job iterator: for each date from the date iterator, enumerate every
  * source spec before advancing (reference: job-service/iterators.go:130-175).
  */
final class JobIterator(dates: DateIterator, specs: Seq[SourceSpec]) {
  private var pending: List[(SourceSpec, LocalDate)] = Nil

  def next(): Option[(SourceSpec, LocalDate)] = this.synchronized {
    if (pending.isEmpty) {
      dates.next() match {
        case Some(d) => pending = specs.map(s => (s, d)).toList
        case None => return None
      }
    }
    pending match {
      case head :: tail => pending = tail; Some(head)
      case Nil => None
    }
  }
}

object JobBuilder {
  def build(spec: SourceSpec, date: LocalDate): Job =
    Job(spec.bucket, spec.experiment, spec.datatype, date, spec.filter, spec.datasets)
}
