package graft

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.tableops.{IncrementalExport, TxWarehouse}

/** Incremental-export depth probe (pins the O(new files) claim in
  * IncrementalExport.sync's scaladoc): builds tx tables at 100 and
  * 1,000 commits with an export synced up to the head, appends ONE
  * more commit, and times the steady-state poll — a sync that must
  * read exactly the one new file. Near-flat ratios across a 10× deeper
  * table (and across a 10× longer export chain) are the pass
  * criterion: the sync resolves two manifests (checkpoint-bounded
  * replay, TxLogProbe's result) and reads the increment's files, never
  * a rescan of the table or the export. The chain walk itself is
  * O(increments) marker reads — the 10× chain is the probe's second
  * axis, and syncEvery batches it down in practice.
  *
  * Usage: runMain graft.ExportProbe [outDir]  (default target/exdepth)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object ExportProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/exdepth"
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

    /** Table at `commits` depth, export synced every `syncEvery`
      * commits (the cadence knob: chain length = commits/syncEvery).
      */
    def build(name: String, commits: Int, syncEvery: Int): (String, String) = {
      val path = wh.tablePath("probe", name)
      val ex = s"$outDir/export_$name"
      val fs = new Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      fs.delete(new Path(ex), true)
      (0 until commits).foreach { i =>
        wh.append(spark,
          Seq((i.toLong, java.sql.Date.valueOf(start.plusDays(i))))
            .toDF("v", "date"), path)
        if ((i + 1) % syncEvery == 0)
          IncrementalExport.sync(spark, wh, path, ex): Unit
      }
      (path, ex)
    }

    def timedSync(path: String, ex: String, nextDay: Int): Double = {
      // one fresh commit, then the timed steady-state poll: the sync
      // must read exactly this one file regardless of table depth
      wh.append(spark,
        Seq((nextDay.toLong, java.sql.Date.valueOf(start.plusDays(nextDay))))
          .toDF("v", "date"), path)
      val t0 = System.nanoTime()
      val r = IncrementalExport.sync(spark, wh, path, ex)
      val sec = (System.nanoTime() - t0) / 1e9
      assert(r.applied, s"steady-state sync did not apply: $r")
      sec
    }

    val t0 = System.nanoTime()
    // same chain length (10 links) at both depths isolates TABLE depth;
    // the deep-chain tier isolates CHAIN length (1000 links)
    val (p100, e100) = build("d100", 100, syncEvery = 10)
    val (p1000, e1000) = build("d1000", 1000, syncEvery = 100)
    val (pChain, eChain) = build("chain1000", 1000, syncEvery = 1)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def med3(path: String, ex: String, firstDay: Int): Double = {
      val xs = (0 until 3).map(k => timedSync(path, ex, firstDay + k)).sorted
      xs(1)
    }
    val sync100 = med3(p100, e100, 100)
    val sync1000 = med3(p1000, e1000, 1000)
    val syncChain = med3(pChain, eChain, 1003)

    // the export's content stayed exact through every tier
    val n100 = IncrementalExport.readExport(spark, e100).count()
    val n1000 = IncrementalExport.readExport(spark, e1000).count()
    assert(n100 == 103 && n1000 == 1003,
      s"export content drifted: $n100 / $n1000")

    println(f"""{"metric":"exdepth","build_sec":$buildSec%.1f,""" +
      f""""sync_sec":[$sync100%.4f,$sync1000%.4f,${sync1000 / sync100}%.2f],""" +
      f""""sync_deep_chain_sec":[$syncChain%.4f,${syncChain / sync100}%.2f],""" +
      f""""chain_links":[13,13,1003]}""")
    spark.stop()
  }
}
