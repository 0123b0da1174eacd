package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bin-packing compaction: manifest-only planning, per-partition
  * packing, big files untouched, rows identical, time travel over the
  * swap, conflict fencing against concurrent rewrites.
  */
class CompactSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  private def rows(wh: TxWarehouse, path: String): Set[(Long, String)] =
    wh.read(spark, path).select("k", "s").as[(Long, String)].collect().toSet

  test("many small appends collapse to one file per partition; rows " +
    "and dates identical; counts returned") {
    val (wh, path) = fresh("cp1")
    (1L to 6L).foreach { i =>
      wh.append(spark,
        Seq((i, s"v$i", if (i <= 3) D1 else D2)).toDF("k", "s", "date")
          .coalesce(1), path)
    }
    val before = rows(wh, path)
    assert(wh.read(spark, path).inputFiles.length == 6)
    val (retired, added) = wh.compact(spark, path)
    assert(retired == 6 && added == 2)
    assert(wh.read(spark, path).inputFiles.length == 2)
    assert(rows(wh, path) == before)
    assert(wh.dates(spark, path) == Set(D1.toLocalDate, D2.toLocalDate))
  }

  test("files at/above the small threshold are untouched — same " +
    "physical paths survive the compaction") {
    val (wh, path) = fresh("cp2")
    // one "big" file (made big relative to an artificially tiny
    // threshold) + three smalls in the same partition
    wh.append(spark, (1L to 1000L).map(k => (k, "big", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    val big = wh.read(spark, path).inputFiles.toSet
    (1L to 3L).foreach { i =>
      wh.append(spark,
        Seq((10000L + i, "small", D1)).toDF("k", "s", "date").coalesce(1),
        path)
    }
    // threshold sits between the 1-row files and the 1000-row file
    val bigLen = Files.size(java.nio.file.Paths.get(
      new java.net.URI(big.head).getPath))
    val (retired, added) =
      wh.compact(spark, path, smallBytes = bigLen)
    assert(retired == 3 && added == 1)
    val after = wh.read(spark, path).inputFiles.toSet
    assert(after.intersect(big) == big, "big file must persist untouched")
    assert(wh.read(spark, path).count() == 1003)
  }

  test("minFiles gate: a partition with a single small file is left " +
    "alone (nothing to pack); scoped date compaction ignores others") {
    val (wh, path) = fresh("cp3")
    wh.append(spark, Seq((1L, "a", D1)).toDF("k", "s", "date").coalesce(1), path)
    (1L to 2L).foreach { i =>
      wh.append(spark,
        Seq((10L + i, "b", D2)).toDF("k", "s", "date").coalesce(1), path)
    }
    assert(wh.compact(spark, path, date = Some(D1.toLocalDate)) == ((0, 0)))
    val (retired, added) = wh.compact(spark, path, date = Some(D2.toLocalDate))
    assert(retired == 2 && added == 1)
    assert(wh.read(spark, path).inputFiles.length == 2)
  }

  test("time travel reads the pre-compaction layout; stats on the " +
    "packed file still gate a point readWhere") {
    val (wh, path) = fresh("cp4")
    wh.append(spark, (1L to 25L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark, (26L to 50L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark, (1000L to 1025L).map(k => (k, s"v$k", D2))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark, (1026L to 1050L).map(k => (k, s"v$k", D2))
      .toDF("k", "s", "date").coalesce(1), path)
    val v1 = wh.currentVersion(spark, path)
    val (retired, added) = wh.compact(spark, path)
    assert(retired == 4 && added == 2) // per-partition packing, 1 each
    assert(wh.readAt(spark, path, v1).count() == 101)
    // fresh stats on the rewritten files: a point probe on k prunes to
    // the one partition's file
    val probed = wh.readWhere(spark, path, col("k") === 1010L)
    assert(probed.inputFiles.length == 1)
    assert(probed.count() == 1)
  }

  test("zorderCols: compaction doubles as OPTIMIZE ZORDER BY — the " +
    "rewrite re-clusters so a 2-D box probe prunes files the random " +
    "layout could not; rows identical") {
    val (wh, path) = fresh("cp6")
    // 8 small files, each spanning the FULL (x, y) range — the
    // worst-case layout: every file's min/max covers every probe
    val rnd = new scala.util.Random(7)
    (0 until 8).foreach { _ =>
      val rows = (1 to 250).map { _ =>
        (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong, D1)
      }
      wh.append(spark, rows.toDF("x", "y", "date").coalesce(1), path)
    }
    val boxBefore = wh.readWhere(spark, path,
      col("x").between(100L, 200L) && col("y").between(100L, 200L))
    assert(boxBefore.inputFiles.length == 8, "pre: no file prunable")
    val total = wh.read(spark, path).count()
    val bytes = wh.read(spark, path).inputFiles.map(f =>
      Files.size(java.nio.file.Paths.get(new java.net.URI(f).getPath))).sum
    val (retired, added) = wh.compact(spark, path,
      targetBytes = bytes / 4, smallBytes = Long.MaxValue,
      zorderCols = Seq("x", "y"))
    assert(retired == 8 && added >= 3)
    assert(wh.read(spark, path).count() == total)
    val boxAfter = wh.readWhere(spark, path,
      col("x").between(100L, 200L) && col("y").between(100L, 200L))
    assert(boxAfter.inputFiles.length < added,
      s"post: z-layout must make the box prunable " +
        s"(${boxAfter.inputFiles.length} of $added files opened)")
    assert(boxAfter.count() == boxBefore.count())
  }

  test("conflict fence: a small file retired by a concurrent rewrite " +
    "between plan and commit raises ConcurrentCommitException; the " +
    "retry against fresh state is a clean no-op") {
    val (wh, path) = fresh("cp5")
    (1L to 3L).foreach { i =>
      wh.append(spark,
        Seq((i, "x", D1)).toDF("k", "s", "date").coalesce(1), path)
    }
    // deterministic interleaving via the afterPlan seam: the competing
    // partition delete lands INSIDE compact's plan->commit window, so
    // the fence must see its planned files retired and refuse — a blind
    // commit here would resurrect the deleted partition's rows
    intercept[ConcurrentCommitException] {
      wh.compactHooked(spark, path, None, 128L << 20, 0L, 2, Nil,
        () => wh.deletePartition(spark, path, D1.toLocalDate))
    }
    assert(wh.read(spark, path).count() == 0L)
    assert(wh.compact(spark, path) == ((0, 0)))
  }
}
