package graft.api

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

/** JVM runtime introspection for the status port — the analog of the
  * reference's expvar endpoint (cmd/gardener/gardener.go:36-37 imports
  * `expvar`, which serves Go memstats + cmdline on /debug/vars of the
  * same mux as the status page). Rendered as one JSON object from the
  * platform MXBeans: heap/non-heap usage, per-collector GC counts and
  * time, thread counts, uptime, processors, and system load — the
  * numbers an operator of a long-lived driver checks first when a
  * pipeline slows down (heap creep, GC churn, thread leaks). Go's pprof
  * handlers have no 1:1 JVM twin; the JVM's own remote-diagnostic
  * surface (JMX, jcmd, flight recorder) covers that role out of band.
  */
object DebugVars {
  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def render(): String = {
    val mem = ManagementFactory.getMemoryMXBean
    val heap = mem.getHeapMemoryUsage
    val nonHeap = mem.getNonHeapMemoryUsage
    val threads = ManagementFactory.getThreadMXBean
    val rt = ManagementFactory.getRuntimeMXBean
    val os = ManagementFactory.getOperatingSystemMXBean
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala.map { gc =>
      s""""${esc(gc.getName)}":{"collections":${gc.getCollectionCount},""" +
        s""""time_ms":${gc.getCollectionTime}}"""
    }
    s"""{"memstats":{"heap_used":${heap.getUsed},""" +
      s""""heap_committed":${heap.getCommitted},"heap_max":${heap.getMax},""" +
      s""""nonheap_used":${nonHeap.getUsed}},""" +
      s""""gc":{${gcs.mkString(",")}},""" +
      s""""threads":{"live":${threads.getThreadCount},""" +
      s""""peak":${threads.getPeakThreadCount},""" +
      s""""daemon":${threads.getDaemonThreadCount}},""" +
      s""""uptime_ms":${rt.getUptime},""" +
      s""""processors":${os.getAvailableProcessors},""" +
      s""""load_avg":${os.getSystemLoadAverage}}"""
  }
}
