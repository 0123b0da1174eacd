package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** [[TxWarehouse.cloneTo]]: zero-copy fork semantics — snapshot
  * equality, full isolation in both directions, pruning metadata
  * carried over, time-travel clones, vacuum safety on the clone, and
  * the refusal edges.
  */
class CloneSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "src"), wh.tablePath("d", "fork"))
  }

  private def rows(wh: TxWarehouse, p: String): Set[(Long, String)] =
    wh.read(spark, p).select("k", "s").as[(Long, String)].collect().toSet

  private def parquetCount(p: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(p)).count(_.getName.endsWith(".parquet"))
  }

  test("clone equals the source snapshot with ZERO parquet written; " +
    "subsequent writes to either side never leak to the other") {
    val (wh, src, fork) = fresh("cl1")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D2)).toDF("k", "s", "date"), src)
    val v = wh.cloneTo(spark, src, fork)
    assert(v == 1L)
    assert(parquetCount(new java.io.File(fork).getPath) == 0,
      "shallow: the clone dir holds no data files yet")
    assert(rows(wh, fork) == rows(wh, src))
    // diverge both sides
    wh.append(spark, Seq((3L, "src-only", D2)).toDF("k", "s", "date"), src)
    wh.append(spark, Seq((4L, "fork-only", D2)).toDF("k", "s", "date"), fork)
    assert(rows(wh, src) == Set((1L, "a"), (2L, "b"), (3L, "src-only")))
    assert(rows(wh, fork) == Set((1L, "a"), (2L, "b"), (4L, "fork-only")))
  }

  test("time-travel clone: fork the table as it was BEFORE the damage, " +
    "DML on the fork rewrites into the fork's own dir only") {
    val (wh, src, fork) = fresh("cl2")
    wh.append(spark, (1L to 10L).map(i => (i, s"v$i", D1)).toDF("k", "s", "date"), src)
    wh.deleteWhere(spark, src, col("k") <= 5L) // v2: the damage
    assert(wh.cloneTo(spark, src, fork, version = 1L) == 1L)
    assert(rows(wh, fork).map(_._1) == (1L to 10L).toSet)
    val srcFiles = parquetCount(src)
    assert(wh.deleteWhere(spark, fork, col("k") === 10L) == 1L)
    assert(rows(wh, fork).map(_._1) == (1L to 9L).toSet)
    assert(parquetCount(src) == srcFiles, "fork DML must not touch source")
    assert(parquetCount(fork) >= 1, "the rewrite landed in the fork dir")
    // source still shows its own (damaged) state
    assert(rows(wh, src).map(_._1) == (6L to 10L).toSet)
  }

  test("pruning metadata rides the clone: a point read on the fork " +
    "opens the same pruned file count as on the source") {
    val (wh, src, fork) = fresh("cl3")
    wh.append(spark, (1L to 100L).map(i => (i, s"v$i", D1))
      .toDF("k", "s", "date").repartitionByRange(4, col("k")), src)
    wh.cloneTo(spark, src, fork)
    def opened(p: String): Int =
      wh.readWhere(spark, p, col("k") === 42L).inputFiles.length
    assert(opened(fork) == opened(src))
    assert(opened(fork) <= 2)
    // manifest-only aggregates work on the fork too
    assert(wh.fastColumnStats(spark, fork, "k")
      == wh.fastColumnStats(spark, src, "k"))
  }

  test("vacuum on the clone cannot reach source bytes; compaction makes " +
    "the clone self-contained") {
    val (wh, src, fork) = fresh("cl4")
    wh.append(spark, (1L to 20L).map(i => (i, s"v$i", D1)).toDF("k", "s", "date"), src)
    wh.cloneTo(spark, src, fork)
    val srcFiles = parquetCount(src)
    wh.vacuum(spark, fork, keepVersions = 1, minAgeMillis = 0L)
    assert(parquetCount(src) == srcFiles, "clone vacuum walked into source")
    assert(rows(wh, fork).size == 20)
  }

  test("refusals: cloning onto an existing table, cloning an " +
    "uncommitted source, cloning a nonexistent version") {
    val (wh, src, fork) = fresh("cl5")
    intercept[IllegalArgumentException] { wh.cloneTo(spark, src, fork) }
    wh.append(spark, Seq((1L, "a", D1)).toDF("k", "s", "date"), src)
    wh.cloneTo(spark, src, fork)
    intercept[IllegalArgumentException] { wh.cloneTo(spark, src, fork) }
    intercept[IllegalArgumentException] {
      wh.cloneTo(spark, src, wh.tablePath("d", "fork2"), version = 9L)
    }
  }
}
