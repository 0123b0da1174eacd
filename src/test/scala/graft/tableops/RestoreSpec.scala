package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** [[TxWarehouse.restoreTo]]: metadata-only undo. Data equality with
  * the target snapshot, zero file rewrites, history preserved (time
  * travel + CDC across the restore), the deliberate non-rollbacks
  * (properties, txn watermarks), vacuum fencing, and idempotence.
  */
class RestoreSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  private def rows(wh: TxWarehouse, path: String): Set[(Long, String)] =
    wh.read(spark, path).select("k", "s").as[(Long, String)].collect().toSet

  private def dataFiles(path: String): Set[String] = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).map(_.getPath).filter(_.endsWith(".parquet"))
      .map(_.stripPrefix(root.getPath)).toSet
  }

  test("restore undoes a partition delete with ZERO data files written " +
    "or removed; the read equals the target snapshot exactly") {
    val (wh, path) = fresh("rs1")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D1)).toDF("k", "s", "date"), path)
    wh.append(spark, Seq((3L, "c", D2)).toDF("k", "s", "date"), path)
    val want = rows(wh, path)
    wh.deletePartition(spark, path, D1.toLocalDate) // v3
    val before = dataFiles(path)
    wh.restoreTo(spark, path, 2L) // v4
    assert(dataFiles(path) == before, "restore must move no data")
    assert(rows(wh, path) == want)
    assert(wh.currentVersion(spark, path) == 4L)
  }

  test("restore undoes DML rewrites (deleteWhere + updateWhere) back to " +
    "the pre-DML snapshot, and a second restore can undo the restore") {
    val (wh, path) = fresh("rs2")
    wh.append(spark, (1L to 20L).map(i => (i, s"v$i", D1))
      .toDF("k", "s", "date"), path) // v1
    val v1Rows = rows(wh, path)
    wh.deleteWhere(spark, path, col("k") % 5 === 0) // v2
    wh.updateWhere(spark, path, col("k") % 3 === 0,
      Map("s" -> lit("mut"))) // v3
    val v3Rows = rows(wh, path)
    assert(v3Rows != v1Rows)
    wh.restoreTo(spark, path, 1L) // v4
    assert(rows(wh, path) == v1Rows)
    // restore-of-restore: back to the damaged state
    wh.restoreTo(spark, path, 3L) // v5
    assert(rows(wh, path) == v3Rows)
  }

  test("history is preserved, not rewritten: time travel still sees the " +
    "undone state, and the CDC row diff across the restore reports the " +
    "resurrected rows as inserts") {
    val (wh, path) = fresh("rs3")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D2)).toDF("k", "s", "date"), path)
    wh.deleteWhere(spark, path, col("k") === 1L) // v2
    wh.restoreTo(spark, path, 1L) // v3
    assert(wh.readAt(spark, path, 2L).select("k").as[Long].collect().toSet
      == Set(2L))
    val diff = wh.rowDiff(spark, path, 2L, 3L, keyCols = Seq("k"))
      .select(col("_change_type"), col("k")).as[(String, Long)]
      .collect().toSet
    assert(diff == Set(("insert", 1L)))
  }

  test("restoring to the current state is a no-op: no new version") {
    val (wh, path) = fresh("rs4")
    wh.append(spark, Seq((1L, "a", D1)).toDF("k", "s", "date"), path)
    wh.restoreTo(spark, path, 1L)
    assert(wh.currentVersion(spark, path) == 1L)
  }

  test("properties and txn watermarks are NOT rolled back: governance " +
    "set after the target version survives, and a replayed micro-batch " +
    "is still a duplicate after restore") {
    val (wh, path) = fresh("rs5")
    assert(wh.appendTxn(spark,
      Seq((1L, "a", D1)).toDF("k", "s", "date"), path, "app", 7L)) // v1
    wh.append(spark, Seq((2L, "b", D2)).toDF("k", "s", "date"), path) // v2
    wh.setRequirePartitionFilter(spark, path, required = true) // v3
    wh.restoreTo(spark, path, 1L) // v4: undo v2's rows
    assert(wh.requiresPartitionFilter(spark, path), "governance kept")
    assert(wh.lastTxn(spark, path, "app") == 7L)
    assert(!wh.appendTxn(spark,
      Seq((1L, "dup", D1)).toDF("k", "s", "date"), path, "app", 7L),
      "watermark must not regress")
    assert(wh.readPartition(spark, path, D2.toLocalDate).count() == 0)
  }

  test("restore re-carries per-file stats and blooms: pruned point " +
    "reads behave identically before damage and after restore") {
    val (wh, path) = fresh("rs6")
    wh.setBloomFilter(spark, path, "k", expectedItemsPerFile = 1000L)
    wh.append(spark, (1L to 100L).map(i => (i, s"v$i", D1))
      .toDF("k", "s", "date").repartitionByRange(4, col("k")), path)
    def opened(v: TxWarehouse): Int =
      v.readWhere(spark, path, col("k") === 42L && col("date") === D1)
        .inputFiles.length
    val before = opened(wh)
    assert(before <= 2, s"stats/bloom should prune, opened $before")
    wh.deleteWhere(spark, path, col("k") > 0L) // damage: everything gone
    wh.restoreTo(spark, path, wh.currentVersion(spark, path) - 1L)
    assert(opened(wh) == before, "restored manifest must keep S/F/B lines")
  }

  test("restore racing a concurrent append LINEARIZES: the outcome is " +
    "one of the two serial orders, never a torn mix, across 6 rounds") {
    for (round <- 1 to 6) {
      val (wh, path) = fresh(s"rsrace$round")
      wh.append(spark, Seq((1L, "base", D1)).toDF("k", "s", "date"), path) // v1
      wh.append(spark, Seq((2L, "damage", D2)).toDF("k", "s", "date"), path) // v2
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val restore = pool.submit(new Runnable {
          def run(): Unit = wh.restoreTo(spark, path, 1L)
        })
        val append = pool.submit(new Runnable {
          def run(): Unit = wh.append(spark,
            Seq((3L, "racer", D2)).toDF("k", "s", "date"), path)
        })
        restore.get(); append.get()
      } finally pool.shutdown()
      val got = rows(wh, path)
      val restoreWonLast = Set((1L, "base"), (3L, "racer")) // restore; append
      val appendWonLast = Set((1L, "base"))                 // append; restore
      assert(got == restoreWonLast || got == appendWonLast,
        s"round $round: non-linearizable state $got")
      // the log itself stayed consistent: every version replays
      val latest = wh.currentVersion(spark, path)
      (1L to latest).foreach(v => wh.readAt(spark, path, v).count())
    }
  }

  test("a vacuumed target is refused with a clear error; restore above " +
    "the latest version is refused") {
    val (wh, path) = fresh("rs7")
    wh.append(spark, Seq((1L, "a", D1)).toDF("k", "s", "date"), path) // v1
    wh.overwritePartition(spark,
      Seq((9L, "z", D1)).toDF("k", "s", "date"), path, D1.toLocalDate) // v2
    wh.vacuum(spark, path, keepVersions = 1, minAgeMillis = 0L)
    val e = intercept[IllegalStateException] {
      wh.restoreTo(spark, path, 1L)
    }
    assert(e.getMessage.contains("vacuumed"))
    intercept[IllegalArgumentException] {
      wh.restoreTo(spark, path, 99L)
    }
  }
}
