package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Copy-on-write predicate UPDATE on the tx backend: old-row SET
  * scope (simultaneous assignment), SQL NULL predicate semantics,
  * file-level pruning, type preservation under casting SET values,
  * partition-column updates moving rows, and time travel.
  */
class UpdateWhereSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  test("TRUE-predicate rows get every SET applied; NULL-predicate rows " +
    "are untouched (SQL UPDATE semantics); count returned") {
    val (wh, path) = fresh("uw1")
    wh.append(spark, Seq(
      (1L, "hit", 10.0, D1), (2L, "miss", 20.0, D1),
      (3L, "hit", 30.0, D2),
      (4L, null.asInstanceOf[String], 40.0, D2)
    ).toDF("k", "s", "p", "date"), path)
    val n = wh.updateWhere(spark, path, col("s") === "hit",
      Map("s" -> lit("done"), "p" -> (col("p") + 1.0)))
    assert(n == 2L)
    val got = wh.read(spark, path).select("k", "s", "p")
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "done", 11.0), (2L, "miss", 20.0),
      (3L, "done", 31.0), (4L, null.asInstanceOf[String], 40.0)))
  }

  test("SET right-hand sides see the OLD row: a = b, b = a swaps, " +
    "it does not chain") {
    val (wh, path) = fresh("uw2")
    wh.append(spark, Seq((1L, 100L, 200L, D1)).toDF("k", "a", "b", "date"), path)
    wh.updateWhere(spark, path, col("k") === 1L,
      Map("a" -> col("b"), "b" -> col("a")))
    val (a, b) = wh.read(spark, path).select("a", "b")
      .as[(Long, Long)].head()
    assert((a, b) == (200L, 100L))
  }

  test("files with no matching rows are not rewritten; SET values are " +
    "cast to the column's recorded type (no silent schema widening)") {
    val (wh, path) = fresh("uw3")
    wh.append(spark,
      Seq((1L, 10L, D1)).toDF("k", "v", "date").coalesce(1), path)
    wh.append(spark,
      Seq((2L, 20L, D2)).toDF("k", "v", "date").coalesce(1), path)
    val before = wh.read(spark, path).inputFiles.toSet
    // SET expression is a double; the column is long — value must land
    // as a truncated long and the schema must stay long
    assert(wh.updateWhere(spark, path, col("k") === 2L,
      Map("v" -> lit(99.7))) == 1L)
    val after = wh.read(spark, path)
    assert(after.schema("v").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(before.intersect(after.inputFiles.toSet).size == 1)
    assert(after.select("k", "v").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L), (2L, 99L)))
  }

  test("updating the date partition column moves the row to its new " +
    "partition (readPartition sees it there, not at the old date)") {
    val (wh, path) = fresh("uw4")
    wh.append(spark, Seq((1L, D1), (2L, D1)).toDF("k", "date"), path)
    wh.updateWhere(spark, path, col("k") === 2L, Map("date" -> lit(D2)))
    assert(wh.readPartition(spark, path, D1.toLocalDate)
      .select("k").as[Long].collect().toSet == Set(1L))
    assert(wh.readPartition(spark, path, D2.toLocalDate)
      .select("k").as[Long].collect().toSet == Set(2L))
    assert(wh.dates(spark, path) == Set(D1.toLocalDate, D2.toLocalDate))
  }

  test("time travel reads the pre-update values at the prior version; " +
    "a no-match update commits no new version") {
    val (wh, path) = fresh("uw5")
    wh.append(spark, Seq((1L, "old", D1)).toDF("k", "s", "date"), path)
    val v1 = wh.currentVersion(spark, path)
    assert(wh.updateWhere(spark, path, col("s") === "absent",
      Map("s" -> lit("x"))) == 0L)
    assert(wh.currentVersion(spark, path) == v1)
    wh.updateWhere(spark, path, col("s") === "old", Map("s" -> lit("new")))
    assert(wh.readAt(spark, path, v1).select("s").as[String].head() == "old")
    assert(wh.read(spark, path).select("s").as[String].head() == "new")
  }

  test("requirePartitionFilter: flagged table rejects a dateless " +
    "update; unknown SET column rejected") {
    val (wh, path) = fresh("uw6")
    wh.append(spark, Seq((1L, "a", D1)).toDF("k", "s", "date"), path)
    intercept[IllegalArgumentException] {
      wh.updateWhere(spark, path, col("k") === 1L,
        Map("nope" -> lit(1)))
    }
    wh.setRequirePartitionFilter(spark, path, required = true)
    intercept[IllegalArgumentException] {
      wh.updateWhere(spark, path, col("s") === "a", Map("s" -> lit("b")))
    }
    assert(wh.updateWhere(spark, path,
      col("date") === lit(D1) && col("s") === "a",
      Map("s" -> lit("b"))) == 1L)
  }
}
