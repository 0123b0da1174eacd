package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.tableops.IncrementalAgg]]: the claim under
  * test is O(CHANGED FILES), not O(source) — a fixed-size churn
  * (predicate delete of ~1000 contiguous keys, one range-clustered
  * file hit) is applied to sources 1×/10×/100× the base size, and the
  * maintenance pass that folds it into the materialized view is timed
  * against the from-scratch recompute of the same view.
  *
  * Expectation: recompute grows with the source (it rescans the
  * table); maintain stays flat (the manifest diff hands it the churned
  * files only — the rest of the table is never opened). Each tier
  * reports `files_read`, the count of data files the delta scan
  * touched, observed from the diff frame's inputFiles — the mechanism,
  * not just the wall-clock.
  *
  * Timing: maintain is exactly-once per source version, so each rep is
  * a fresh churn (delete a different key range) + maintain; min of
  * `reps` for both paths.
  *
  * Usage: runMain graft.IvmProbe [N] [reps]
  */
object IvmProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = java.sql.Date.valueOf("2024-01-01")

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val out = f
      ((System.nanoTime() - t0) / 1e9, out)
    }

    for (mult <- Seq(1L, 10L, 100L)) {
      val rows = n * mult
      val wh = new graft.tableops.TxWarehouse(
        Files.createTempDirectory(s"ivm-probe-$mult").toString)
      val src = wh.tablePath("p", "src")
      val view = wh.tablePath("p", "view")
      val df = spark.range(rows).select(col("id").as("k"),
        pmod(col("id"), lit(64)).cast("string").as("g"),
        (col("id") % 1000L).as("v"), lit(D).as("date"))
      // 32 files per decade tier scales file count with the table the
      // way daily ingest would (more days = more files, similar sizes)
      wh.append(spark, df.repartitionByRange((32 * mult).toInt, col("k")), src)
      def maintain() = graft.tableops.IncrementalAgg.maintainSumView(
        spark, wh, src, view, Seq("g"), "n_rows", Seq("sum_v" -> "v"),
        "ivm_probe", LocalDate.parse("2024-01-01"))
      maintain() // bootstrap, untimed

      var tMaint = Double.MaxValue
      var tRecomp = Double.MaxValue
      (0 until reps).foreach { r =>
        val lo = rows / 2 + r * 5000L
        wh.deleteWhere(spark, src, col("k").between(lo, lo + 999L))
        val (tm, _) = time { maintain() }
        tMaint = math.min(tMaint, tm)
        val (tr, _) = time {
          wh.read(spark, src).groupBy(col("g"))
            .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
            .collect().length
        }
        tRecomp = math.min(tRecomp, tr)
      }
      // mechanism check: files the NEXT delta scan would read for one
      // more identical churn
      val vBefore = wh.currentVersion(spark, src)
      wh.deleteWhere(spark, src, col("k").between(100L, 1099L))
      val filesRead = wh.diffSnapshots(spark, src, vBefore,
        wh.currentVersion(spark, src)).inputFiles.length
      val totalFiles = wh.read(spark, src).inputFiles.length
      println(f"[probe] ivm rows=$rows%d maintain=$tMaint%.2fs " +
        f"recompute=$tRecomp%.2fs deltaFiles=$filesRead%d " +
        f"tableFiles=$totalFiles%d")
    }
    spark.stop()
  }
}
