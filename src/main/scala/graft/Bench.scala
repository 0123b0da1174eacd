package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Release every persisted block — DataFrame cache entries AND raw
    * persisted RDDs — so the next query starts against an empty block
    * manager. Several operators persist intermediates for the lifetime
    * of their plan (IVF assignments, the corpus-clean gated frame, tf
    * tables); run back-to-back across 81 queries those blocks accumulate
    * and late-suite queries pay eviction/GC pressure that has nothing to
    * do with their own plan (round-6 driver bench recorded dd_dual_signal
    * at 8.15 s vs 1.6-2.0 s isolated). Clearing between queries makes
    * each timing a function of the query's plan alone. blocking=true:
    * async removal would overlap the next query's first timed rep —
    * residual cross-query interference in a mechanism whose whole point
    * is timing isolation (the synchronous wait is microseconds against
    * query times in seconds).
    */
  private def clearPersisted(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // AQE size-first coalescing (coalescePartitions.parallelismFirst=
    // false + a small advisory size) was MEASURED here in round 16 and
    // REJECTED: the expensive queries' shuffles are compute-dense but
    // byte-light (hashed shingle postings, pair expansion), so
    // byte-based coalescing serialized CPU-heavy stages — top-25
    // subset regressed 41.7 s → 52.9 s (dd_cluster_minlabel 1.93×,
    // dd_dual_signal 1.75×). Keeping the default parallelism-first
    // behavior preserves core-count parallelism for those stages.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      // Round-17 thread-dump finding (guide §7.3): with the default
      // bypassMergeThreshold=200, every no-aggregation exchange (round-
      // robin fan-outs, join exchanges) takes BypassMergeSortShuffleWriter,
      // which opens R per-partition files per map task and concatenates
      // them via mmap/transferTo — at M=R=32 that is ~1000 block files
      // and an mmap/munmap storm serializing on the process map lock
      // (ds_corpus_clean: 25 s of 32-thread executor time for 2.7 s of
      // 8-thread work, all in unmap0/write0). Forcing the serialized
      // sort writer (one file per map task) removes the syscall storm.
      // Scale note: production reduce counts are ≫ 200, where bypass
      // never fires anyway — this only affects small-R shuffles, and for
      // those the single-spill-file writer is the right shape at any
      // data size that fits a map task.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "2"))
      .config("spark.ui.enabled", "false")
      // listener-bus plan strings are diagnostics; cap them so a deep
      // iterative plan cannot OOM the driver rendering its own explain
      .config("spark.sql.maxPlanStringLength", (4 * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Debug mode: `runMain graft.Bench <query> [reps]` times one query
    // repeatedly (cold plan + warm reruns) to separate planning/codegen
    // overhead from execution.
    if (args.nonEmpty) {
      val reps = if (args.length > 1) args(1).toInt else 3
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
      // debug-only scheduling diagnostics: stage/task counts + aggregate
      // executor time per rep, to separate compute from per-stage latency
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val stages = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val runMs = new java.util.concurrent.atomic.AtomicLong
      val deserMs = new java.util.concurrent.atomic.AtomicLong
      val gcMs = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(sc.stageInfo.numTasks.toLong)
            if (sys.env.contains("SPARK_GRAFT_STAGES")) {
              val m = sc.stageInfo.taskMetrics
              System.err.println(f"[stage] id=${sc.stageInfo.stageId} " +
                f"tasks=${sc.stageInfo.numTasks} " +
                f"runMs=${m.executorRunTime} " +
                f"sr=${m.shuffleReadMetrics.totalBytesRead} " +
                f"sw=${m.shuffleWriteMetrics.bytesWritten} " +
                sc.stageInfo.name.take(60))
            }
          }
          override def onTaskEnd(
              te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val m = te.taskMetrics
            if (m != null) {
              runMs.addAndGet(m.executorRunTime)
              deserMs.addAndGet(m.executorDeserializeTime)
              gcMs.addAndGet(m.jvmGCTime)
            }
          }
        })
      (1 to reps).foreach { r =>
        jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0); deserMs.set(0)
        gcMs.set(0)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(args(0))(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give it a beat before reading counters
        Thread.sleep(200)
        println(f"run $r: $wall%.2fs rows=$n jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} " +
          f"execMs=${runMs.get} deserMs=${deserMs.get} gcMs=${gcMs.get}")
      }
      spark.stop(); return
    }
    // Optional subset filter for DIAGNOSIS runs (bisecting cross-query
    // interference needs the suite's environment, not an isolated JVM):
    // SPARK_GRAFT_ONLY=a,b,c restricts the suite to the named queries.
    // Unset (the driver's path) it is a no-op — methodology unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val suite = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Untimed warmup: run EVERY query once so each plan's one-time costs
    // (codegen/JIT compilation, parquet footer reads, shuffle machinery —
    // measured ~16s of JVM warmup landing on whichever query runs first,
    // plus multi-second first-plan codegen on the wide dedup plans) are
    // absorbed before timing. Per-query numbers then reflect operator
    // steady state, as on a long-lived cluster. A failure here is a real
    // failure: it propagates and fails the bench loudly — a broken query
    // must never score ~0 s and "improve" the total.
    suite.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, sfDir).count(); clearPersisted(spark) }
      catch { case e: Throwable =>
        throw new RuntimeException(s"bench warmup failed for $name: ${e.getMessage}", e)
      }
    }
    // Each query is timed twice back-to-back and reports the min: a single
    // timing is hostage to whatever GC pause or host contention lands on
    // it (observed 10x outliers on an otherwise-identical run), while the
    // min of two is a stable steady-state figure. No exception handling in
    // the timed closure — a throwing query fails the bench. Persisted
    // state is cleared BETWEEN queries, not between the two reps: a
    // query's own caches are part of its plan (rep 1 builds them, rep 2
    // measures steady state), but no query may inherit another's blocks.
    //
    // Contention sentinel: when the two reps disagree by >3x, something
    // external (GC storm, a concurrent JVM on the host — the round-7
    // driver artifact carried a phantom 31x regression from exactly
    // this) landed on one of them; re-measure up to twice more and keep
    // the min. Queries that needed the rerun are reported under
    // "contended" so a hot host is visible IN the artifact instead of
    // masquerading as a plan regression.
    // Hypervisor-steal sentinel: load_avg only sees THIS VM's runnable
    // threads — a noisy neighbor on the host shows up as CPU ticks
    // stolen from the guest (uniform 1.3-1.5x inflation across every
    // query, observed round 9), readable only from /proc/stat's steal
    // column. Sample it across the run and report steal_pct so a
    // hot-host artifact is distinguishable from a plan regression.
    def stealAndTotalTicks(): (Long, Long) =
      scala.util.Try {
        val cols = scala.io.Source.fromFile("/proc/stat").getLines()
          .next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (cols.length > 7) cols(7) else 0L, cols.sum)
      }.getOrElse((0L, 0L))
    val (steal0, ticks0) = stealAndTotalTicks()

    val contended = scala.collection.mutable.ListBuffer[String]()
    def timedPass(): Seq[(String, Double)] =
      suite.toSeq.sortBy(_._1).map { case (name, fn) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        var a = once(); var b = once()
        var extra = 0
        while (math.max(a, b) > 3 * math.min(a, b) &&
            math.max(a, b) - math.min(a, b) > 0.3 && extra < 2) {
          contended += name
          a = math.min(a, b); b = once(); extra += 1
        }
        clearPersisted(spark)
        // env-gated live progress for diagnosis runs (stderr, not part
        // of the artifact): lets an external profiler align thread
        // dumps with the query under measurement
        if (sys.env.contains("SPARK_GRAFT_PROGRESS"))
          System.err.println(f"[bench-progress] $name ${math.min(a, b)}%.2f")
        name -> math.min(a, b)
      }
    // TWO full timing passes, per-query min: the back-to-back rep pair
    // catches a point spike but not a SUSTAINED slowdown window (GC
    // storm, host noise lasting tens of seconds) — observed twice as a
    // contiguous ALPHABETICAL run of tiny queries inflated 5-10x
    // (rounds 11 and 12: tx_t* then tx_n*..tx_q*), exactly the
    // queries the window happened to cover in sorted order. A second
    // pass minutes later re-times every query at a well-separated
    // moment; a transient window would have to recur on the same query
    // in both passes to survive into the record. Queries whose two
    // PASSES disagree MATERIALLY (>2x AND >0.3s apart — sub-100ms
    // jitter on tiny queries is scheduler noise, not contention) are
    // reported as contended, so sustained cross-pass noise stays
    // visible in the artifact without drowning it in micro-jitter.
    val pass1 = timedPass()
    val pass2 = timedPass().toMap
    val results: Seq[(String, Double)] = pass1.map { case (name, t1) =>
      val t2 = pass2(name)
      if (math.max(t1, t2) > 2 * math.min(t1, t2) &&
          math.max(t1, t2) - math.min(t1, t2) > 0.3) contended += name
      name -> math.min(t1, t2)
    }
    // 0.1 ms resolution keeps the one-line artifact ~40% shorter — the
    // driver's stdout capture has clipped the full-precision line twice
    // (BENCH_r06/r07/r09 "parsed": null); nanosecond noise carries no
    // information at query times in seconds anyway
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (math.rint(v * 10000) / 10000) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val cont = contended.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    val (steal1, ticks1) = stealAndTotalTicks()
    val stealPct =
      if (ticks1 > ticks0) 100.0 * (steal1 - steal0) / (ticks1 - ticks0)
      else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,"sf":"$sfDir","load_avg":$loadAvg,""" +
      f""""steal_pct":$stealPct%.1f,"contended":$cont}"""
    // The full ~4.5 KB per-query line goes ONLY to target/bench.json, never
    // to stdout: the driver keeps the last ~2000 chars of stdout and its
    // parser latches onto the FIRST {"metric":"total"...} it sees, so when
    // both a (clipped) full line and the compact line were printed, parsing
    // failed two rounds running (BENCH_r15/r16 "parsed": null). Exactly ONE
    // metric line may reach stdout — the budget-capped compact one below.
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    // Capture-safe single stdout line: a compact JSON that — together with
    // sbt's trailing "[success] Total time ..." line (~80 chars) — fits
    // inside the 2000-char capture window. The full map cannot fit
    // (211 names × ~20 chars), so this line carries the aggregates, the
    // contention/steal sentinels, the slowest queries that fit in the
    // budget, and a pointer to the full per-query record (also committed
    // as BENCH_local.json).
    val budget = 1800
    val slowest = results.sortBy(-_._2)
    // contended_count, not the name list: with ~150 query names the
    // list alone can blow the 1800-char budget (precisely on the hot
    // host being diagnosed) and clip the line the budget exists to
    // protect. Full names live in the durable target/bench.json.
    val head = s"""{"metric":"total","value":${math.rint(total * 100) / 100},""" +
      s""""unit":"sec","n_queries":${results.size},"sf":"$sfDir",""" +
      f""""steal_pct":$stealPct%.1f,"contended_count":${contended.distinct.size},""" +
      s""""full":"target/bench.json","queries_truncated":true,"queries":{"""
    val tailStr = "}}"
    val entries = scala.collection.mutable.ListBuffer[String]()
    var used = head.length + tailStr.length
    slowest.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + (math.rint(v * 100) / 100)
      val add = e.length + (if (entries.nonEmpty) 1 else 0)
      if (used + add <= budget) { entries += e; used += add }
    }
    println(head + entries.mkString(",") + tailStr)
    spark.stop()
  }
}
