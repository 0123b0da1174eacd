package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.tableops.TxWarehouse

/** Change-feed index-maintenance probe (pins the O(changed files)
  * claim in Retrieval.indexDocsIncremental's scaladoc): builds doc
  * tables at 20k and 200k rows (≈8 and ≈80 data files), brings the
  * postings index to head, then applies ONE small correction (a
  * 20-row deletion-vector delete) and times the increment that
  * follows — an increment that must read only the correction's diff,
  * never re-derive the corpus. Pass criterion: the steady-state
  * increment's wall time and scanned input stay ~FLAT across the 10×
  * corpus step, while the full rebuild scales with it; the probe also
  * re-verifies index ≡ rebuild at both scales.
  *
  * Usage: runMain graft.IndexMaintProbe [outDir] (default
  * target/ixmaint). Prints one JSON line; recorded in BASELINE.md.
  */
object IndexMaintProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/ixmaint"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = new TxWarehouse(outDir)
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = java.sql.Date.valueOf("2024-01-01")
    val day = java.time.LocalDate.parse("2024-01-01")

    @volatile var inputBytes = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          inputBytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
      })
    def measure[T](body: => T): (T, Long, Long) = {
      Thread.sleep(500)
      val b0 = inputBytes
      val t0 = System.nanoTime()
      val r = body
      val ms = (System.nanoTime() - t0) / 1000000
      Thread.sleep(500)
      (r, ms, inputBytes - b0)
    }

    val out = Seq(20000L, 200000L).map { rows =>
      val docsT = wh.tablePath("probe", s"docs_$rows")
      val post = wh.tablePath("probe", s"post_$rows")
      val stat = wh.tablePath("probe", s"stat_$rows")
      Seq(docsT, post, stat).foreach(p => fs.delete(new Path(p), true))
      // ~8 files per 20k rows: append in 2.5k-row slices
      (0L until rows by 2500L).foreach { lo =>
        wh.append(spark,
          spark.range(lo, lo + 2500L).select(col("id").as("doc_id"),
            concat_ws(" ", lit("tok"),
              (col("id") % 997).cast("string"),
              (col("id") % 89).cast("string"),
              (col("id") % 13).cast("string")).as("text"))
            .withColumn("date", lit(d)), docsT)
      }
      def incr() = Retrieval.indexDocsIncremental(spark, wh, post, stat,
        docsT, "doc_id", "text", "probe", day)
      val (_, fullMs, fullIn) = measure(incr()) // bootstrap = full build
      // the steady-state event: a 20-row MoR correction
      wh.deleteWhereMor(spark, docsT, col("doc_id") % (rows / 20) === 3L)
      val (applied, incMs, incIn) = measure(incr())
      assert(applied, "increment did not apply")
      // verify: index ≡ from-scratch rebuild of the final corpus
      val w2 = new TxWarehouse(s"$outDir/ref_$rows")
      val (p2, s2) = (w2.tablePath("i", "p"), w2.tablePath("i", "s"))
      fs.delete(new Path(s"$outDir/ref_$rows"), true)
      Retrieval.indexDocs(spark, w2,
        p2, s2, wh.read(spark, docsT), "doc_id", "text", day)
      val a = wh.read(spark, post).agg(count(lit(1)), sum(col("tf")))
        .as[(Long, Long)].head()
      val b = w2.read(spark, p2).agg(count(lit(1)), sum(col("tf")))
        .as[(Long, Long)].head()
      assert(a == b, s"index diverged from rebuild: $a vs $b")
      s""""rows_$rows":{"full_build_ms":$fullMs,"full_build_in":$fullIn,""" +
        s""""incr_ms":$incMs,"incr_in":$incIn}"""
    }
    println(s"""{"probe":"index_maintenance","correction_rows":20,""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
