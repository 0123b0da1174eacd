package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.tableops.{TxWarehouse, ZOrder}

/** Layout-selectivity probe: how many files (and how much time) a 2-D
  * box / band predicate costs under the three compaction layouts the
  * warehouse can produce — unclustered coalesce, lexicographic range
  * clustering, and Z-order interleave — at a file count where the
  * difference is the read cost (64 files, ~4.2M rows).
  *
  * What it pins: on `k`-dim z-ordered files a box on all dims opens
  * ~N^0 corner files and a band on the TRAILING dim ~N^(1/2); the
  * lexicographic layout serves only its leading column (trailing-dim
  * band opens all N); the unclustered layout serves nothing. That
  * trailing-dim ratio is the whole point of the interleave — at 100 TB
  * the same layout decision is the difference between opening ~√N of an
  * archive day's files and opening every one of them for half the
  * predicates the pipeline runs.
  *
  * Usage: runMain graft.ZOrderProbe [outDir] (default target/zprobe)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/zprobe"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val side = 2048 // 2048² = 4.19M rows over a (x, y) grid
    val nFiles = 64
    val wh = new TxWarehouse(outDir)
    val fs = new Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(outDir), true)

    val df = spark.range(side.toLong * side).select(
      (col("id") % side).as("x"),
      (col("id") / side).cast("long").as("y"),
      (col("id") * 2654435761L % 1000000).as("v"),
      lit(java.sql.Date.valueOf("2024-01-01")).as("date"))

    val tables = Seq(
      "flat" -> df.repartition(nFiles), // hash scatter: every file spans all of both
      "lex" -> df.repartitionByRange(nFiles, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")),
      "zorder" -> ZOrder.layout(df, Seq("x", "y"), nFiles))
    val paths = tables.map { case (name, laid) =>
      val p = wh.tablePath("probe", name)
      wh.append(spark, laid, p)
      name -> p
    }

    val preds: Seq[(String, Column)] = Seq(
      "lead_band" -> (col("x") >= 0L && col("x") < side / 8), // leading dim: lex wins too
      "trail_band" -> (col("y") >= 0L && col("y") < side / 8), // trailing dim: only z prunes
      "box" -> (col("x").between(side / 2, side / 2 + side / 8) &&
        col("y").between(side / 2, side / 2 + side / 8)))

    val results = for ((pname, pred) <- preds; (lname, path) <- paths) yield {
      val t0 = System.nanoTime()
      val q = wh.readWhere(spark, path, pred)
      val kept = q.inputFiles.length
      val n = q.count()
      val sec = (System.nanoTime() - t0) / 1e9
      (pname, lname, kept, n, sec)
    }
    // correctness belt: all layouts agree on every predicate's count
    results.groupBy(_._1).foreach { case (p, rs) =>
      require(rs.map(_._4).distinct.size == 1, s"count mismatch for $p: $rs")
    }

    val js = results.map { case (p, l, kept, n, sec) =>
      f""""${p}_$l":{"files":$kept,"rows":$n,"sec":$sec%.3f}"""
    }.mkString(",")
    println(s"""{"metric":"zorder_probe","side":$side,"n_files":$nFiles,$js}""")
    spark.stop()
  }
}
