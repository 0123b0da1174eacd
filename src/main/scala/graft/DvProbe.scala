package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tableops.TxWarehouse

/** Deletion-vector cost probe (pins the O(deleted rows) claim in
  * TxWarehouse.deleteWhereMor's scaladoc): builds one-file tables at
  * 250k and 2.5M rows, deletes the SAME 100 scattered keys from each
  * via (a) merge-on-read vectors and (b) copy-on-write deleteWhere,
  * and reports the bytes each commit wrote — the manifest delta for
  * MoR, the rewritten data file for CoW. Pass criterion: MoR bytes are
  * FLAT across the 10× file-size step (the vector encodes 100
  * ordinals regardless of file size) while CoW bytes scale with the
  * file; both reads agree afterwards. Wall times are printed for
  * context but the byte asymmetry is the architectural claim.
  *
  * Usage: runMain graft.DvProbe [outDir]  (default target/dvprobe)
  * Prints one JSON line; recorded in BASELINE.md.
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/dvprobe"
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

    def dirBytes(p: String): Long = {
      val path = new Path(p)
      if (!fs.exists(path)) return 0L
      val it = fs.listFiles(path, true)
      var n = 0L
      while (it.hasNext) { n += it.next().getLen }
      n
    }

    def build(name: String, rows: Int): String = {
      val path = wh.tablePath("probe", name)
      fs.delete(new Path(path), true)
      wh.append(spark,
        spark.range(rows.toLong)
          .select(col("id").as("k"),
            concat(lit("payload-"), col("id")).as("s"))
          .withColumn("date", lit(d))
          .coalesce(1),
        path)
      path
    }

    // the same 100 scattered keys at both scales (all < 250k)
    val delKeys = (0 until 100).map(i => i.toLong * 2499L + 7L)
    def delPred = col("k").isin(delKeys.map(x => x: Any): _*)

    val out = Seq(250000, 2500000).map { rows =>
      val morPath = build(s"mor_$rows", rows)
      val cowPath = build(s"cow_$rows", rows)
      val morData0 = dirBytes(s"$morPath/_graft_data")
      val morLog0 = dirBytes(s"$morPath/_graft_log")
      val t0 = System.nanoTime()
      val nMor = wh.deleteWhereMor(spark, morPath, delPred)
      val morMs = (System.nanoTime() - t0) / 1000000
      val morDataW = dirBytes(s"$morPath/_graft_data") - morData0
      val morLogW = dirBytes(s"$morPath/_graft_log") - morLog0
      val cowData0 = dirBytes(s"$cowPath/_graft_data")
      val t1 = System.nanoTime()
      val nCow = wh.deleteWhere(spark, cowPath, delPred)
      val cowMs = (System.nanoTime() - t1) / 1000000
      val cowDataW = dirBytes(s"$cowPath/_graft_data") - cowData0
      val same = wh.read(spark, morPath).agg(
          count(lit(1)), sum(col("k"))).as[(Long, Long)].head() ==
        wh.read(spark, cowPath).agg(
          count(lit(1)), sum(col("k"))).as[(Long, Long)].head()
      assert(nMor == 100L && nCow == 100L && same,
        s"probe mismatch: nMor=$nMor nCow=$nCow same=$same")
      s""""rows_$rows":{"mor_log_bytes":$morLogW,""" +
        s""""mor_data_bytes":$morDataW,"cow_rewrite_bytes":$cowDataW,""" +
        s""""mor_ms":$morMs,"cow_ms":$cowMs}"""
    }
    println(s"""{"probe":"dv_small_delete","deleted_rows":100,""" +
      out.mkString(",") + "}")
    spark.stop()
  }
}
