package graft.api

import graft.tracker.Tracker

/** Prometheus text exposition (format version 0.0.4) of the tracker's
  * metric families, mirroring the reference's promauto registrations
  * (metrics/metrics.go:16-209): started/completed/fail counters, an
  * in-flight-by-state gauge, and the time-in-state histogram with the
  * reference's bucket bounds. Counters and the histogram are accumulated
  * by the tracker at transition time (so they are monotonic and survive
  * job expiry); the gauge is derived from the live JobMap at scrape time.
  */
object PromFormat {

  private def escLabel(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  private def labels(kvs: Seq[(String, String)]): String =
    kvs.map { case (k, v) => s"""$k="${escLabel(v)}"""" }
      .mkString("{", ",", "}")

  private def num(d: Double): String =
    if (d.isWhole && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  def render(tracker: Tracker): String = {
    val sb = new StringBuilder
    def family(name: String, kind: String, help: String)(
        samples: => Seq[String]): Unit = {
      sb.append(s"# HELP $name $help\n# TYPE $name $kind\n")
      samples.foreach(s => sb.append(s).append('\n'))
    }
    val m = tracker.metricsSnapshot()

    family("gardener_started_total", "counter", "Number of date tasks started.") {
      m.started.toSeq.sortBy(_._1).map { case ((exp, dt), n) =>
        s"gardener_started_total${labels(Seq("experiment" -> exp, "datatype" -> dt))} $n"
      }
    }
    family("gardener_completed_total", "counter", "Number of date tasks completed.") {
      m.completed.toSeq.sortBy(_._1).map { case ((exp, dt), n) =>
        s"gardener_completed_total${labels(Seq("experiment" -> exp, "datatype" -> dt))} $n"
      }
    }
    family("gardener_fail_total", "counter", "Number of processing failures.") {
      m.failed.toSeq.sortBy(_._1).map { case ((exp, dt, status), n) =>
        s"gardener_fail_total${labels(Seq("experiment" -> exp, "datatype" -> dt, "status" -> status))} $n"
      }
    }
    family("gardener_tasks_in_flight", "gauge", "Number of tasks in flight") {
      tracker.getState().values
        .groupBy { case (job, st) => (job.experiment, job.datatype, st.state.name) }
        .view.mapValues(_.size).toSeq.sortBy(_._1)
        .map { case ((exp, dt, state), n) =>
          s"gardener_tasks_in_flight${labels(Seq("experiment" -> exp, "datatype" -> dt, "state" -> state))} $n"
        }
    }
    def histSamples(name: String, base: Seq[(String, String)],
        h: Tracker.Hist): Seq[String] = {
      val buckets = h.le.zipWithIndex.map { case (le, i) =>
        s"${name}_bucket${labels(base :+ ("le" -> num(le)))} ${h.cumBuckets(i)}"
      }.toSeq
      buckets ++ Seq(
        s"${name}_bucket${labels(base :+ ("le" -> "+Inf"))} ${h.count}",
        s"${name}_sum${labels(base)} ${num(h.sum)}",
        s"${name}_count${labels(base)} ${h.count}")
    }
    family("gardener_state_time_histogram", "histogram", "time-in-state distributions.") {
      m.stateSeconds.toSeq.sortBy(_._1).flatMap { case ((exp, dt, state), h) =>
        histSamples("gardener_state_time_histogram",
          Seq("experiment" -> exp, "datatype" -> dt, "state" -> state), h)
      }
    }
    // load-stats + query-cost families (reference: metrics/metrics.go:
    // 152-209) — observed by the load action (files/bytes the load
    // consumed, labeled by the date's YEAR: dates are unbounded, years
    // are not) and by the monitor around every action's run.
    family("gardener_files", "histogram",
      "Histogram of number of files submitted per date.") {
      m.files.toSeq.sortBy(_._1).flatMap { case ((exp, dt, year), h) =>
        histSamples("gardener_files",
          Seq("experiment" -> exp, "datatype" -> dt, "date" -> year), h)
      }
    }
    family("gardener_bytes", "histogram",
      "Histogram of total bytes submitted per date.") {
      m.bytes.toSeq.sortBy(_._1).flatMap { case ((exp, dt, year), h) =>
        histSamples("gardener_bytes",
          Seq("experiment" -> exp, "datatype" -> dt, "date" -> year), h)
      }
    }
    family("query_cost_seconds", "histogram",
      "Distribution of query cost in seconds.") {
      m.queryCost.toSeq.sortBy(_._1).flatMap { case ((dt, query), h) =>
        histSamples("query_cost_seconds",
          Seq("datatype" -> dt, "query" -> query), h)
      }
    }
    sb.toString
  }
}
