package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale-trend probe — the gate language is "survive a 100×
  * scale-up", and [[ScaleProbe]]'s 10× tiers leave the measured
  * exponent at one decade. This probe pushes the three paths where the
  * claim matters most to TWO decades (the largest factor the 128 GiB
  * sandbox sustains for them comfortably):
  *
  *  1. keep-set dedup wide tier (`Dedup.keepLatest`, the reference's
  *     §7.3 core): the measurement frame replicated 100× with a
  *     per-replica id suffix — ~100× GROUPS of the original depth, the
  *     shape a growing archive actually produces (more keys/days, not
  *     deeper ties; the deeper-ties/hot-key regime is [[SkewProbe]]'s).
  *     Both tiers are MATERIALIZED to parquet first so the probe pays
  *     the real scan, not a cached union plan.
  *  2. indexed incremental dedup: a FIXED daily batch probed against a
  *     materialized signature index of a 100× near-duplicate corpus —
  *     the O(batch + probes), not O(archive), claim at two decades.
  *  3. stats+bloom point reads: a fixed day+key probe against a tx
  *     table of 1 vs 100 days (8 range-clustered files each, bloom on
  *     the key) — time AND files-opened must stay ~flat while the
  *     manifest grows 100×.
  *
  * Prints one JSON line: per-probe [sec@1x, sec@100x, ratio, exponent]
  * where exponent = ln(t₁₀₀/t₁)/ln(100) — 1.0 is perfectly linear in
  * the scaled dimension, ~0 is flat. Pass criteria: dedup ≈ linear
  * (exponent ≲ 1), incremental-indexed and point reads ≈ flat
  * (exponent ≪ 0.5).
  *
  * Usage: runMain graft.Scale100Probe [outDir]  (default target/scale100)
  */
object Scale100Probe {
  private val ReplicaOffset = 1000007L // NOT ≡ 0 (mod 1000): spreads ids

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/scale100"
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(q: () => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = q()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warmup (codegen/JIT)
      val (ta, n) = once(); val (tb, _) = once()
      (math.min(ta, tb), n)
    }
    def row(name: String, t1: Double, t100: Double): String = {
      val exp = math.log(t100 / t1) / math.log(100.0)
      f""""$name":[$t1%.3f,$t100%.3f,${t100 / t1}%.2f,$exp%.2f]"""
    }

    // ---- 1. keep-set dedup, 100x groups ----
    // The query-map form derives id = l_orderkey % 1000, which caps the
    // key space at 1000 no matter how lineitem is replicated (offsets
    // only DEEPEN groups — SkewProbe's regime, not this one). The wide
    // tier replicates the measurement frame itself with a per-replica
    // id suffix: 100x groups of the original depth, materialized so the
    // probe pays the real parquet scan.
    val m1 = graft.sources.Tables.measurementsMonthly(spark, sf)
    def stageWide(n: Int, tag: String): String = {
      val p = s"$outDir/__meas_$tag"
      (0 until n).map(r =>
        m1.withColumn("id", concat(col("id"), lit(s"_$r"))))
        .reduce(_ unionAll _)
        .write.mode(SaveMode.Overwrite).parquet(p)
      p
    }
    val (m1Path, m100Path) = (stageWide(1, "1x"), stageWide(100, "100x"))
    def w1(path: String): () => Long = () =>
      graft.operators.Dedup.keepLatest(spark.read.parquet(path),
        Seq("id", "date"), col("parser_time")).count()
    val (w1t1, w1n1) = timed(w1(m1Path))
    val (w1t100, w1n100) = timed(w1(m100Path))
    require(w1n100 > 50L * w1n1,
      s"group spread failed: $w1n1 -> $w1n100 (suffix must widen ids)")

    // ---- 2. indexed incremental dedup vs a 100x archive ----
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val docs100 = (0 until 100).map { r =>
      docs.select((col("doc_id") + lit(r * ReplicaOffset)).as("doc_id"),
        concat(col("text"), lit(s" r$r")).as("text"))
    }.reduce(_ unionAll _)
    import graft.operators.TextDedup
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def idxProbe(corpus: org.apache.spark.sql.DataFrame,
        tag: String): () => Long = {
      val stagePath = s"$outDir/__idx_$tag"
      TextDedup.nearDupIndex(corpus, "doc_id", "text")
        .write.mode(SaveMode.Overwrite).parquet(stagePath)
      () => TextDedup.incrementalNearDupFilterIndexed(
        batch, spark.read.parquet(stagePath), "doc_id", "text").count()
    }
    val (it1, _) = timed(idxProbe(docs.select("doc_id", "text"), "1x"))
    val (it100, _) = timed(idxProbe(docs100, "100x"))

    // ---- 3. stats+bloom point reads over a 100x manifest ----
    import graft.tableops.TxWarehouse
    val liCols = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    def stageTx(days: Int, tag: String): (TxWarehouse, String) = {
      val root = s"$outDir/__tx_$tag"
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      val wh = new TxWarehouse(root)
      val tbl = wh.tablePath("probe", "lineitem")
      wh.setBloomFilter(spark, tbl, "l_orderkey",
        expectedItemsPerFile = 100000, fpp = 0.01)
      for (d <- 0 until days)
        wh.append(spark, liCols
          .withColumn("date",
            lit(java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
              .plusDays(d.toLong))))
          .repartitionByRange(8, col("l_orderkey")), tbl)
      (wh, tbl)
    }
    val probeDay = lit(java.sql.Date.valueOf("2024-01-01"))
    def rangeProbe(wh: TxWarehouse, tbl: String): (Double, Long, Int) = {
      def frame() = wh.readWhere(spark, tbl,
        col("date") === probeDay && col("l_orderkey").between(1000L, 5000L))
      val files = frame().inputFiles.length
      val (t, n) = timed(() => frame().count())
      (t, n, files)
    }
    def pointProbe(wh: TxWarehouse, tbl: String): (Double, Long, Int) = {
      def frame() = wh.readWhere(spark, tbl,
        col("date") === probeDay && col("l_orderkey") === 4242L)
      val files = frame().inputFiles.length
      val (t, n) = timed(() => frame().count())
      (t, n, files)
    }
    val (whA, tblA) = stageTx(1, "1x")
    val (whB, tblB) = stageTx(100, "100x")
    val (rt1, rn1, rf1) = rangeProbe(whA, tblA)
    val (rt100, rn100, rf100) = rangeProbe(whB, tblB)
    require(rn1 == rn100, s"range probe rows diverged: $rn1 vs $rn100")
    val (pt1, pn1, pf1) = pointProbe(whA, tblA)
    val (pt100, pn100, pf100) = pointProbe(whB, tblB)
    require(pn1 == pn100, s"point probe rows diverged: $pn1 vs $pn100")

    val rows = Seq(
      row("w1_dedup_keepset", w1t1, w1t100),
      row("dd_incremental_indexed", it1, it100),
      row("s6_stats_range", rt1, rt100),
      row("s12_bloom_point", pt1, pt100))
    println(s"""{"metric":"scale100","queries":{${rows.mkString(",")}},""" +
      s""""w1_groups":[$w1n1,$w1n100],""" +
      s""""range_files_opened":[$rf1,$rf100],""" +
      s""""point_files_opened":[$pf1,$pf100]}""")
    spark.stop()
  }
}
