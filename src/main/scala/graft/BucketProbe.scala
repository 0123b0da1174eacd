package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tableops.TxWarehouse

/** Storage-partitioned-join probe (pins TxWarehouse.readBucketed's
  * no-Exchange claim with measured shuffle I/O, not just the plan
  * string): builds co-bucketed (16 buckets) pairs of tables at 1M and
  * 4M rows, runs the SAME key join through (a) the bucket-aware
  * relations and (b) plain reads, and reports per-form wall time plus
  * the executors' total shuffle-write bytes during the join (the
  * system metric the Exchange elision is supposed to zero). Pass
  * criterion: the bucketed form's shuffle-write stays ~0 at BOTH
  * scales while the shuffled form's grows with the data; results
  * agree. Broadcast joins are disabled for the measurement — at probe
  * scale Spark would otherwise broadcast one side and measure nothing.
  *
  * Usage: runMain graft.BucketProbe [outDir]  (default target/bkprobe)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/bkprobe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = new TxWarehouse(outDir)
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = java.sql.Date.valueOf("2024-01-01")

    // total shuffle-write bytes across all completed stages so far
    @volatile var shuffleBytes = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics
            .bytesWritten
      })

    def build(name: String, rows: Long, valCol: String): String = {
      val path = wh.tablePath("probe", name)
      fs.delete(new Path(path), true)
      wh.setBucketSpec(spark, path, "k", 16)
      wh.append(spark,
        spark.range(rows).select(col("id").as("k"),
          (col("id") * 37 % 1000).as(valCol)).withColumn("date", lit(d)),
        path)
      path
    }

    def measure(df: => DataFrame): (Long, Long, Long) = {
      // settle listener events from the build
      Thread.sleep(500)
      val s0 = shuffleBytes
      val t0 = System.nanoTime()
      val n = df.groupBy(col("v")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n"))).as[Long].head()
      val ms = (System.nanoTime() - t0) / 1000000
      Thread.sleep(500) // let stage-completed events drain
      (n, ms, shuffleBytes - s0)
    }

    val out = Seq(1000000L, 4000000L).map { rows =>
      val l = build(s"l_$rows", rows, "v")
      val r = build(s"r_$rows", rows, "w")
      val (nB, msB, shB) = measure(
        wh.readBucketed(spark, l).join(wh.readBucketed(spark, r), Seq("k")))
      val (nS, msS, shS) = measure(
        wh.read(spark, l).join(wh.read(spark, r), Seq("k")))
      assert(nB == nS && nB == rows, s"row mismatch: $nB vs $nS vs $rows")
      s""""rows_$rows":{"bucketed_ms":$msB,"bucketed_shuffle_join_bytes":""" +
        s"""${shB - minAggBytes(shB, shS)},"bucketed_total_shuffle":$shB,""" +
        s""""shuffled_ms":$msS,"shuffled_total_shuffle":$shS}"""
    }
    println(s"""{"probe":"bucket_spj","buckets":16,""" +
      out.mkString(",") + "}")
    spark.stop()
  }

  /** The group-by above the join shuffles in BOTH forms; its bytes are
    * ~the smaller total (the bucketed form's only shuffle).
    */
  private def minAggBytes(a: Long, b: Long): Long = math.min(a, b)
}
