package graft

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{Datasets, Job}
import graft.tableops.{TableOps, TxWarehouse}

/** Steady-state-under-maintenance probe (round-9 verdict #5): a tx table
  * at archive depth — ~100 date partitions, several small files each,
  * checkpointed log — read CONCURRENTLY with the maintenance sweep
  * (per-date compaction + log truncation + vacuum) running against it.
  *
  * What it pins: `dates()` and `readWhere` latencies while the sweeper
  * churns stay in family with the quiet-table baseline (no lock convoy,
  * no failed reads from files disappearing mid-plan), and row counts
  * stay exact through every concurrent rewrite. Vacuum runs with a
  * small positive age margin — the documented contract: the margin must
  * exceed the slowest in-flight reader, which is what protects a reader
  * that resolved a manifest version an instant before compaction
  * retired its files. Commit conflicts between the sweeper's compaction
  * and its own truncation/vacuum are impossible (one sweeper), and
  * reader/writer conflicts don't exist by design (readers never
  * commit) — what this probe can surface is the failure mode where
  * maintenance BLOCKS or BREAKS readers, which is exactly what a 100 TB
  * deployment runs 24/7.
  *
  * Usage: runMain graft.SweeperProbe [outDir] (default target/sweeper)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object SweeperProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/sweeper"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDates = 100
    val filesPerDate = 4
    val rowsPerFile = 50
    val wh = new TxWarehouse(outDir, checkpointEvery = 100)
    val path = wh.tablePath("raw_probe", "dt")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    val start = LocalDate.parse("2020-01-01")

    val t0 = System.nanoTime()
    (0 until nDates).foreach { d =>
      val date = java.sql.Date.valueOf(start.plusDays(d))
      (0 until filesPerDate).foreach { f =>
        wh.append(spark,
          (0 until rowsPerFile).map(r =>
            ((d * 1000 + f * 100 + r).toLong, s"x$d-$f-$r", date))
            .toDF("id", "name", "date").coalesce(1), path)
      }
    }
    val buildSec = (System.nanoTime() - t0) / 1e9
    val perDateRows = (filesPerDate * rowsPerFile).toLong

    def readOnce(d: Int): (Double, Double, Boolean) = {
      val date = start.plusDays(d)
      var t = System.nanoTime()
      val ds = wh.dates(spark, path)
      val datesSec = (System.nanoTime() - t) / 1e9
      t = System.nanoTime()
      val n = wh.readWhere(spark, path,
        col("date") === lit(java.sql.Date.valueOf(date))).count()
      val whereSec = (System.nanoTime() - t) / 1e9
      (datesSec, whereSec, ds.size == nDates && n == perDateRows)
    }

    def phase(samples: Int): (Seq[Double], Seq[Double], Boolean) = {
      val rnd = new scala.util.Random(7)
      val rs = (0 until samples).map(_ => readOnce(rnd.nextInt(nDates)))
      (rs.map(_._1), rs.map(_._2), rs.forall(_._3))
    }

    readOnce(0) // warm the session's read machinery
    val (qd, qw, qOk) = phase(20)

    // the sweep: compact each date in turn; every 10th date also
    // truncate the log and vacuum with a 5 s age margin (> any single
    // reader latency here — the margin IS the reader-safety contract)
    @volatile var sweeps = 0
    @volatile var sweeperErr: Option[String] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sweeper = new Thread(() => {
      // maintenance runs in its OWN session: a shared one would serialize
      // the reader's jobs behind compaction's on the scheduler
      val s2 = spark.newSession()
      try {
        var d = 0
        while (!stop.get()) {
          val date = start.plusDays(d % nDates)
          val ops = new TableOps(s2,
            Job("b", "e", "dt", date,
              datasets = Datasets("tmp_probe", "raw_probe", "")), wh)
          ops.compactRaw(targetFileBytes = 8L * 1024 * 1024): Unit
          if (d % 10 == 9) {
            wh.truncateLog(s2, path, minAgeMillis = 0L)
            wh.vacuum(s2, path, keepVersions = 1, minAgeMillis = 5000L)
          }
          sweeps += 1
          d += 1
        }
      } catch { case e: Throwable =>
        sweeperErr = Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }, "sweeper")
    sweeper.setDaemon(true)
    sweeper.start()

    val (cd, cw, cOk) = phase(20)
    stop.set(true)
    sweeper.join(30000)

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val ok = qOk && cOk && sweeperErr.isEmpty
    println(f"""{"metric":"sweeper","dates":$nDates,"build_sec":$buildSec%.1f,""" +
      f""""sweeps":$sweeps,"reads_exact":$ok,""" +
      f""""err":${sweeperErr.map("\"" + _ + "\"").getOrElse("null")},""" +
      f""""dates_quiet_med":${med(qd)}%.4f,"dates_churn_med":${med(cd)}%.4f,""" +
      f""""dates_churn_ratio":${med(cd) / med(qd)}%.2f,""" +
      f""""where_quiet_med":${med(qw)}%.4f,"where_churn_med":${med(cw)}%.4f,""" +
      f""""where_churn_ratio":${med(cw) / med(qw)}%.2f,""" +
      f""""where_churn_max":${cw.max}%.4f}""")
    spark.stop()
  }
}
