package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 measurement harness for the DISTRIBUTED (above-gate) graph
  * paths — the 100 TB shape the small-graph driver fast paths never
  * exercise. Forces `localEdgeThreshold = 0` on the same inputs the
  * declared queries use (the near-dup pair graph over documents, the
  * event-transition graph) and reports per-operator wall time, job/
  * stage/task counts, and aggregate executor run + deserialization time
  * — the metrics VERDICT r16 asked the distributed A/B to carry.
  * Optionally dumps each operator's lazy plan to plans/r17 as
  * `<name>_dist_<suffix>.txt` when args = [<outDir>, <suffix>].
  *
  * Session config mirrors graft.Bench.
  */
object DistGraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "2"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", (4 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dump = if (args.length >= 2) Some((args(0), args(1))) else None

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            tasks.incrementAndGet()
            runMs.addAndGet(m.executorRunTime)
            deserMs.addAndGet(m.executorDeserializeTime)
          }
        }
      })

    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    def pairGraph() = operators.TextDedup.lengthBandedJaccardPairs(
      sources.Tables.documents(spark, sfDir), "doc_id", "text", "n_chars",
      bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L)
    def transGraph() = operators.EventAnalytics.transitionCounts(
      sources.Tables.events(spark, sfDir), "user_id", "ts", "event_type",
      "event_id")

    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "dd_kcoreness_dist" -> (() => operators.GraphAlgos.kCoreness(
        pairGraph(), "id_a", "id_b", iters = 6, localEdgeThreshold = 0L)),
      "ev_harmonic_dist" -> (() => operators.GraphAlgos.harmonicCentrality(
        transGraph(), "src", "dst", iters = 6, checkpointEvery = 2,
        localEdgeThreshold = 0L)),
      "ev_harmonic_approx_dist" -> (() => operators.GraphAlgos
        .harmonicHyperBall(transGraph(), "src", "dst", iters = 6,
          localEdgeThreshold = 0L)),
      "ev_triangles_dist" -> (() => operators.GraphAlgos.triangleCounts(
        pairGraph(), "id_a", "id_b", localEdgeThreshold = 0L)),
      "dd_cluster_cc_dist" -> (() => operators.GraphAlgos
        .connectedComponents(pairGraph(), localEdgeThreshold = 0L))
    )
    ops.foreach { case (name, mk) =>
      // warm + 2 timed reps, min — bench methodology at probe scale
      def once(): Double = {
        jobs.set(0); tasks.set(0); runMs.set(0); deserMs.set(0)
        val t0 = System.nanoTime()
        val df = mk()
        val n = df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[dist] $name wall=$wall%.2f rows=$n jobs=${jobs.get} " +
          f"tasks=${tasks.get} execMs=${runMs.get} deserMs=${deserMs.get}")
        clear()
        wall
      }
      once(); once(); once()
      dump.foreach { case (outDir, suffix) =>
        val df = mk()
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), s)
        val depth = s.linesIterator.size
        println(s"[dist] $name plan dumped ($depth lines)")
        clear()
      }
    }
    spark.stop()
  }
}
