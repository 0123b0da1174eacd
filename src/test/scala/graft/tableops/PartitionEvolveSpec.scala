package graft.tableops

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

/** [[TxWarehouse.setPartitionSpec]]: day→month partition-spec evolution
  * without rewriting files. Mixed generations read correctly, each
  * generation prunes under its own then-spec (files-opened pinned),
  * time travel shows each version under its then-spec, and day-grain
  * mutations refuse month-covered dates instead of corrupting them.
  */
class PartitionEvolveSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def day(s: String) = java.sql.Date.valueOf(s)

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  private def dataFiles(path: String): Set[String] = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).map(_.getPath).filter(_.endsWith(".parquet"))
      .map(_.stripPrefix(root.getPath)).toSet
  }

  /** Jan 1..4 at day grain (v1), evolve (v2), Feb 1..4 + Mar 1 at month
    * grain (v3) — two month files, five day files.
    */
  private def evolved(tag: String): (TxWarehouse, String) = {
    val (wh, path) = fresh(tag)
    wh.append(spark, (1 to 4).map(i => (i.toLong, day(s"2024-01-0$i")))
      .toDF("k", "date"), path) // v1: 4 day-generation files
    wh.setPartitionSpec(spark, path, "month") // v2
    wh.append(spark, ((5 to 8).map(i => (i.toLong, day(s"2024-02-0${i - 4}")))
      :+ (9L, day("2024-03-01"))).toDF("k", "date"), path) // v3
    (wh, path)
  }

  test("evolution is metadata-only and mixed generations read as one " +
    "table") {
    val (wh, path) = evolved("pe1")
    val before = dataFiles(path)
    wh.setPartitionSpec(spark, path, "day") // flip back: still metadata
    assert(dataFiles(path) == before)
    wh.setPartitionSpec(spark, path, "month")
    assert(wh.partitionSpec(spark, path) == "month")
    assert(wh.read(spark, path).select("k").as[Long].collect().toSet ==
      (1L to 9L).toSet)
    // manifest values carry each generation's grain
    assert(wh.dates(spark, path) == Set(
      LocalDate.parse("2024-01-01"), LocalDate.parse("2024-01-02"),
      LocalDate.parse("2024-01-03"), LocalDate.parse("2024-01-04"),
      LocalDate.parse("2024-02-01"), LocalDate.parse("2024-03-01")))
  }

  test("files-opened pin: a day-generation read opens exactly that " +
    "day's file; a month-covered day opens exactly the month file " +
    "(plus the row-filter belt); a range spanning generations opens " +
    "only overlapping files of each grain") {
    val (wh, path) = evolved("pe2")
    def dirsOpened(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.inputFiles.flatMap(_.split('/')
        .find(_.startsWith("__p_date="))).toSet
    // day generation: only that day's partition dir
    val jan2 = wh.readPartition(spark, path, LocalDate.parse("2024-01-02"))
    assert(dirsOpened(jan2) == Set("__p_date=2024-01-02"),
      jan2.inputFiles.toSeq)
    assert(jan2.select("k").as[Long].collect().toSeq == Seq(2L))
    // month generation: the covering month's dir only, filtered to the day
    val feb2 = wh.readPartition(spark, path, LocalDate.parse("2024-02-02"))
    assert(dirsOpened(feb2) == Set("__p_date=2024-02"),
      feb2.inputFiles.toSeq)
    assert(feb2.select("k").as[Long].collect().toSeq == Seq(6L))
    // range spanning both generations: 2 day partitions + the Feb month
    // partition (the March month files and the other 2 day files
    // stats-prune away before any footer is listed)
    val span = wh.readWhere(spark, path,
      col("date").between(day("2024-01-03"), day("2024-02-28")))
    assert(dirsOpened(span) == Set("__p_date=2024-01-03",
      "__p_date=2024-01-04", "__p_date=2024-02"), span.inputFiles.toSeq)
    assert(span.select("k").as[Long].collect().toSet ==
      Set(3L, 4L, 5L, 6L, 7L, 8L))
  }

  test("time travel shows each version under its then-spec") {
    val (wh, path) = evolved("pe3")
    // v1: only the day generation exists
    assert(wh.readAt(spark, path, 1L).select("k").as[Long].collect().toSet ==
      (1L to 4L).toSet)
    // v2 (the spec flip): data unchanged
    assert(wh.readAt(spark, path, 2L).select("k").as[Long].collect().toSet ==
      (1L to 4L).toSet)
    // v3: both generations
    assert(wh.readAt(spark, path, 3L).select("k").as[Long].collect().toSet ==
      (1L to 9L).toSet)
  }

  test("day-grain mutations refuse month-covered dates (a partial-file " +
    "retire is a rewrite, not metadata) but still work on day-" +
    "generation dates; deleteWhere handles the month file") {
    val (wh, path) = evolved("pe4")
    val e = intercept[IllegalArgumentException] {
      wh.deletePartition(spark, path, LocalDate.parse("2024-02-02"))
    }
    assert(e.getMessage.contains("month-generation"))
    intercept[IllegalArgumentException] {
      wh.overwritePartition(spark,
        Seq((99L, day("2024-02-02"))).toDF("k", "date"), path,
        LocalDate.parse("2024-02-02"))
    }
    // day-generation dates keep full metadata-only semantics
    wh.deletePartition(spark, path, LocalDate.parse("2024-01-01"))
    assert(wh.read(spark, path).select("k").as[Long].collect().toSet ==
      (2L to 9L).toSet)
    // the rewrite path the error message points at
    wh.deleteWhere(spark, path, col("date") === day("2024-02-02"))
    assert(wh.read(spark, path).select("k").as[Long].collect().toSet ==
      Set(2L, 3L, 4L, 5L, 7L, 8L, 9L))
  }

  test("compactMonth re-grains in both directions: day files " +
    "consolidate to the month generation under spec=month, a month " +
    "file splits back to per-day files under spec=day (restoring " +
    "metadata-only deletes), rows identical throughout, time travel " +
    "keeps the old layout") {
    val (wh, path) = evolved("pe6")
    def ks(): Set[Long] =
      wh.read(spark, path).select("k").as[Long].collect().toSet
    val before = ks()

    // day → month: January's 4 day files become month-generation files
    val (ret1, add1) = wh.compactMonth(spark, path,
      java.time.YearMonth.parse("2024-01"))
    assert(ret1 == 4 && add1 >= 1)
    assert(ks() == before)
    assert(wh.partitionFileCounts(spark, path)
      .contains(LocalDate.parse("2024-01-01")))
    // Jan days are now month-covered: metadata-only delete refuses
    intercept[IllegalArgumentException] {
      wh.deletePartition(spark, path, LocalDate.parse("2024-01-02"))
    }
    // idempotence guard: a single-file month at month grain is a no-op
    if (add1 == 1)
      assert(wh.compactMonth(spark, path,
        java.time.YearMonth.parse("2024-01")) == (0, 0))
    // time travel still reads the pre-rewrite day layout
    assert(wh.readAt(spark, path, 3L).select("k").as[Long].collect().toSet
      == before)

    // month → day: flip the spec back and split February
    wh.setPartitionSpec(spark, path, "day")
    val (ret2, add2) = wh.compactMonth(spark, path,
      java.time.YearMonth.parse("2024-02"))
    assert(ret2 >= 1 && add2 == 4) // one file per February day
    assert(ks() == before)
    // metadata-only day delete works again
    wh.deletePartition(spark, path, LocalDate.parse("2024-02-02"))
    assert(ks() == before - 6L)
    // an empty month is a no-op
    assert(wh.compactMonth(spark, path,
      java.time.YearMonth.parse("2024-07")) == (0, 0))
  }

  test("an invalid spec is rejected") {
    val (wh, path) = fresh("pe5")
    wh.append(spark, Seq((1L, day("2024-01-01"))).toDF("k", "date"), path)
    intercept[IllegalArgumentException] {
      wh.setPartitionSpec(spark, path, "hour")
    }
  }
}
