package graft.jobservice

import java.time.{Duration, Instant, LocalDate, ZoneOffset}

import graft.model.{Job, JobWithTarget}

/** Hands the next work unit to a parser (reference:
  * job-service/job-service.go:40-85): daily jobs first, then the
  * historical sweep, skipping dates older than the lookback cap (1 year)
  * unless the source is fullHistory, and skipping jobs whose archive
  * prefix holds no files. Tries up to `specs.length` historical candidates
  * per call.
  */
final class JobService(
    daily: JobIterator,
    historical: JobIterator,
    specCount: Int,
    hasFiles: Job => Boolean,
    lookback: Duration = Duration.ofDays(365),
    clock: () => Instant = () => Instant.now()
) {
  private val lock = new Object
  private var counter: Long = 0

  private def mkTarget(spec: SourceSpec, date: LocalDate): JobWithTarget = {
    val job = JobBuilder.build(spec, date)
    counter += 1
    // id == job.key so parser /update|/heartbeat calls address the tracker
    // entry directly (the tracker is keyed by job key).
    JobWithTarget(id = job.key, job = job,
      dailyOnly = spec.dailyOnly, fullHistory = spec.fullHistory)
  }

  private def withinLookback(spec: SourceSpec, date: LocalDate): Boolean =
    spec.fullHistory || {
      val cutoff = clock().minus(lookback).atZone(ZoneOffset.UTC).toLocalDate
      !date.isBefore(cutoff)
    }

  /** Next job, or None when nothing is currently due. */
  def nextJob(): Option[JobWithTarget] = lock.synchronized {
    daily.next() match {
      case Some((spec, date)) if hasFiles(JobBuilder.build(spec, date)) =>
        return Some(mkTarget(spec, date))
      case _ => ()
    }
    var attempts = 0
    while (attempts < math.max(1, specCount)) {
      attempts += 1
      historical.next() match {
        case Some((spec, date))
            if !spec.dailyOnly && withinLookback(spec, date) &&
              hasFiles(JobBuilder.build(spec, date)) =>
          return Some(mkTarget(spec, date))
        case Some(_) => () // filtered out; try the next candidate
        case None => return None
      }
    }
    None
  }
}

/** Archive-prefix listing gate (reference: tracker/job.go:124-149 HasFiles /
  * PrefixStats over GCS; here over any Hadoop-visible filesystem). Driver-
  * side metadata only — no Spark job.
  */
object PrefixStats {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path

  /** (fileCount, totalBytes) under root/<bucket>/<exp>/<type>/YYYY/MM/DD/,
    * honoring the job's optional filename regex filter.
    */
  def prefixStats(root: String, job: Job, conf: Configuration = new Configuration()): (Long, Long) = {
    val dir = new Path(s"$root/${job.prefix}")
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return (0L, 0L)
    val re = if (job.filter.nonEmpty) Some(job.filter.r) else None
    val it = fs.listFiles(dir, true)
    var n = 0L; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && re.forall(_.findFirstIn(f.getPath.getName).isDefined)) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  def hasFiles(root: String, job: Job, conf: Configuration = new Configuration()): Boolean =
    prefixStats(root, job, conf)._1 > 0
}
