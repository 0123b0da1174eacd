package graft

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.tableops.TxWarehouse

/** Transactional-manifest depth probe (pins the O(checkpointEvery)
  * replay claim in TxWarehouse.replay's scaladoc): builds tx tables at
  * 100 and 1,000 commits — checkpointEvery=100, one date and one 1-row
  * file per commit, so METADATA resolution is what's measured — then
  * times manifest-only `dates()` and a single-partition read at both
  * depths. Near-flat ratios are the pass criterion: replay seeds from
  * the newest checkpoint and applies at most checkpointEvery deltas, so
  * resolution cost does not grow with total commit history. (The
  * checkpoint itself is O(live files) lines — the floor ANY manifest
  * format pays to name the live set.)
  *
  * Usage: runMain graft.TxLogProbe [outDir]   (default target/txdepth)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object TxLogProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/txdepth"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = new TxWarehouse(outDir, checkpointEvery = 100)
    val start = LocalDate.parse("2020-01-01")

    def build(name: String, commits: Int): (String, LocalDate) = {
      val path = wh.tablePath("probe", name)
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      (0 until commits).foreach { i =>
        wh.append(spark,
          Seq((i.toLong, java.sql.Date.valueOf(start.plusDays(i))))
            .toDF("v", "date"), path)
      }
      (path, start.plusDays(commits - 1))
    }

    def timed(body: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      math.min(once(), once())
    }

    val t0 = System.nanoTime()
    val (p100, last100) = build("d100", 100)
    val (p1000, last1000) = build("d1000", 1000)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def logFiles(path: String): Long = {
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new Path(s"$path/_graft_log"))
        .count(_.getPath.getName.endsWith(".txt")).toLong
    }

    val dates100 = timed(() => { wh.dates(spark, p100); () })
    val dates1000 = timed(() => { wh.dates(spark, p1000); () })
    val read100 = timed(() =>
      { wh.readPartition(spark, p100, last100).count(); () })
    val read1000 = timed(() =>
      { wh.readPartition(spark, p1000, last1000).count(); () })

    // replay READS are O(checkpointEvery), but the directory LIST is
    // O(total commits) until the log is truncated — measure the deep
    // table again after truncateLog bounds it (the maintenance sweep's
    // steady state)
    val truncated = wh.truncateLog(spark, p1000, minAgeMillis = 0L)
    val datesTrunc = timed(() => { wh.dates(spark, p1000); () })
    val readTrunc = timed(() =>
      { wh.readPartition(spark, p1000, last1000).count(); () })

    println(f"""{"metric":"txdepth","checkpoint_every":100,""" +
      f""""build_sec":$buildSec%.1f,""" +
      f""""log_files":[${logFiles(p100)},${logFiles(p1000) + truncated},${logFiles(p1000)}],""" +
      f""""dates_sec":[$dates100%.4f,$dates1000%.4f,${dates1000 / dates100}%.2f],""" +
      f""""read_partition_sec":[$read100%.4f,$read1000%.4f,${read1000 / read100}%.2f],""" +
      f""""dates_sec_truncated":[$datesTrunc%.4f,${datesTrunc / dates100}%.2f],""" +
      f""""read_partition_sec_truncated":[$readTrunc%.4f,${readTrunc / read100}%.2f]}""")
    spark.stop()
  }
}
