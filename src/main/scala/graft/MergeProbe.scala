package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tableops.TxWarehouse

/** Scale probe for the keyed MERGE: applies the SAME fixed-size change
  * set (2,000 keys confined to one narrow key range) to a range-
  * clustered tx table at 1× and at 10× depth (rows replicated with
  * offset keys; file count grows 8 → 80). The 100 TB claim under test:
  * merge cost follows the files the change keys TOUCH (constant here by
  * construction), not the table's depth — the manifest stats prune the
  * other 79 files without opening a footer. A merge that scanned the
  * table would show ~10×; the pass criterion is a ratio near 1 with
  * filesKept growing ~10× while filesRewritten stays put.
  *
  * Usage: runMain graft.MergeProbe [outDir]   (default target/mergeprobe)
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/mergeprobe"
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val D = java.sql.Date.valueOf("2024-01-01")
    // one row per order (the raw (orderkey, linenumber) pair is not
    // unique in this dataset); replicas shift into disjoint key ranges
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey").as("k"))
      .agg(sum("l_quantity").as("q"), sum("l_extendedprice").as("p"))
      .withColumn("date", lit(D))
    val maxK = base.agg(max("k")).head().getLong(0)
    val replicaOffset = maxK + 1

    def stage(mult: Int, files: Int, tag: String): (TxWarehouse, String) = {
      val root = s"$outDir/tx_$tag"
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      val wh = new TxWarehouse(root)
      val tbl = wh.tablePath("probe", "lineitem")
      val df = (0 until mult).map(r =>
        base.withColumn("k", col("k") + lit(r * replicaOffset)))
        .reduce(_ unionAll _)
      wh.append(spark, df.repartitionByRange(files, col("k")), tbl)
      (wh, tbl)
    }

    // fixed change set: 2,000 updates confined to one narrow ORIGINAL
    // key range — present at both depths, touching ~1/8 of the 1x files
    // and ~1/80 of the 10x files
    val lo = maxK / 2
    val changes: DataFrame = base
      .filter(col("k") >= lo).orderBy(col("k")).limit(2000)
      .withColumn("q", col("q") + 1.0)

    def timedMerge(wh: TxWarehouse, tbl: String) = {
      val t0 = System.nanoTime()
      val st = wh.mergeInto(spark, changes, tbl, Seq("k"))
      ((System.nanoTime() - t0) / 1e9, st)
    }

    val (wh1, t1) = stage(1, 8, "1x")
    val (wh10, t10) = stage(10, 80, "10x")
    // warm the merge path once on a throwaway copy so JIT/codegen
    // compilation lands outside both measurements
    val (whW, tW) = stage(1, 8, "warm")
    timedMerge(whW, tW)
    val (sec1, st1) = timedMerge(wh1, t1)
    val (sec10, st10) = timedMerge(wh10, t10)

    // correctness spot: both merged tables must hold the updated rows
    def updated(wh: TxWarehouse, tbl: String): Long =
      wh.readWhere(spark, tbl, col("k") >= lo)
        .join(changes.select(col("k"), col("q").as("q2")), Seq("k"))
        .filter(col("q") === col("q2")).count()
    require(updated(wh1, t1) == 2000L && updated(wh10, t10) == 2000L,
      "merge probe: updated rows missing")

    // ---- scattered-key tier: HASH layout (every file's key range
    // spans the domain, range stats inert) at 10x depth, a 20-key
    // change set, with vs without the bloom property — the regime the
    // bloom layer exists for ----
    def stageScattered(withBloom: Boolean, tag: String): (TxWarehouse, String) = {
      val root = s"$outDir/txs_$tag"
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      val wh = new TxWarehouse(root)
      val tbl = wh.tablePath("probe", "lineitem")
      if (withBloom)
        wh.setBloomFilter(spark, tbl, "k",
          expectedItemsPerFile = 50000L, fpp = 0.01)
      val df = (0 until 10).map(r =>
        base.withColumn("k", col("k") + lit(r * replicaOffset)))
        .reduce(_ unionAll _)
      wh.append(spark, df.repartition(80, col("k")), tbl)
      (wh, tbl)
    }
    val scatterChanges = base.filter(col("k") % 6101 === 0)
      .orderBy(col("k")).limit(20).withColumn("q", col("q") + 1.0)
    def timedScatter(wh: TxWarehouse, tbl: String) = {
      val t0 = System.nanoTime()
      val st = wh.mergeInto(spark, scatterChanges, tbl, Seq("k"))
      ((System.nanoTime() - t0) / 1e9, st)
    }
    val (whN, tN) = stageScattered(withBloom = false, "nobloom")
    val (whB, tB) = stageScattered(withBloom = true, "bloom")
    val (secN, stN) = timedScatter(whN, tN)
    val (secB, stB) = timedScatter(whB, tB)

    val json =
      f"""{"merge_1x_sec":$sec1%.3f,"merge_10x_sec":$sec10%.3f,""" +
      f""""ratio":${sec10 / sec1}%.2f,""" +
      s""""rewritten_1x":${st1.filesRewritten},"kept_1x":${st1.filesKept},""" +
      s""""rewritten_10x":${st10.filesRewritten},"kept_10x":${st10.filesKept},""" +
      f""""scatter_nobloom_sec":$secN%.3f,"scatter_bloom_sec":$secB%.3f,""" +
      s""""scatter_rewritten_nobloom":${stN.filesRewritten},""" +
      s""""scatter_rewritten_bloom":${stB.filesRewritten},""" +
      s""""scatter_kept_bloom":${stB.filesKept}}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/merge_probe.json"), json + "\n")
    spark.stop()
  }
}
