package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Copy-on-write predicate DELETE on the tx backend: row removal with
  * SQL NULL semantics, file-level pruning (untouched and all-surviving
  * files keep their bytes), time travel over the deletion, conflict
  * fencing, and the requirePartitionFilter DML contract.
  */
class DeleteWhereSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  private def rows(wh: TxWarehouse, path: String): Set[(Long, String)] =
    wh.read(spark, path).select("k", "s").as[(Long, String)].collect().toSet

  test("rows matching the predicate vanish across partitions; NULL " +
    "predicate rows are KEPT (SQL DELETE semantics); count returned") {
    val (wh, path) = fresh("dw1")
    val df: DataFrame = Seq(
      (1L, "keep", D1), (2L, "drop", D1), (3L, "keep", D2),
      (4L, "drop", D2), (5L, null.asInstanceOf[String], D2)
    ).toDF("k", "s", "date")
    wh.append(spark, df, path)
    val n = wh.deleteWhere(spark, path, col("s") === "drop")
    assert(n == 2L)
    assert(rows(wh, path) == Set((1L, "keep"), (3L, "keep"),
      (5L, null.asInstanceOf[String])))
    // second run: nothing left to delete, no new version
    val v = wh.currentVersion(spark, path)
    assert(wh.deleteWhere(spark, path, col("s") === "drop") == 0L)
    assert(wh.currentVersion(spark, path) == v)
  }

  test("files whose rows all survive are not rewritten — byte-identical " +
    "relpaths stay in the manifest; only hit files are replaced") {
    val (wh, path) = fresh("dw2")
    wh.append(spark,
      Seq((1L, "a", D1), (2L, "a", D1)).toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark,
      Seq((3L, "b", D2), (4L, "x", D2)).toDF("k", "s", "date").coalesce(1), path)
    val before = wh.read(spark, path).inputFiles.toSet
    assert(before.size == 2)
    assert(wh.deleteWhere(spark, path, col("s") === "x") == 1L)
    val after = wh.read(spark, path).inputFiles.toSet
    // the D1 file is untouched (no matching rows): same physical file
    val kept = before.intersect(after)
    assert(kept.size == 1, s"expected exactly the all-surviving file " +
      s"to persist, got kept=$kept")
    assert(rows(wh, path) == Set((1L, "a"), (2L, "a"), (3L, "b")))
  }

  test("time travel still reads the deleted rows at the prior version") {
    val (wh, path) = fresh("dw3")
    wh.append(spark, Seq((1L, "a", D1), (2L, "gone", D1)).toDF("k", "s", "date"), path)
    val v1 = wh.currentVersion(spark, path)
    wh.deleteWhere(spark, path, col("s") === "gone")
    assert(rows(wh, path) == Set((1L, "a")))
    val old = wh.readAt(spark, path, v1).select("k", "s")
      .as[(Long, String)].collect().toSet
    assert(old == Set((1L, "a"), (2L, "gone")))
  }

  test("bloom pruning gates the delete scan: a point delete on a " +
    "bloom'd key opens only the files that can match") {
    val (wh, path) = fresh("dw4")
    // two appends -> two files with disjoint key ranges, bloom on k
    wh.append(spark, (1L to 50L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark, (1000L to 1050L).map(k => (k, s"v$k", D2))
      .toDF("k", "s", "date").coalesce(1), path)
    // stats ranges alone prune the second file for k=7; the delete
    // leaves its file untouched
    val before = wh.read(spark, path).inputFiles.toSet
    assert(wh.deleteWhere(spark, path, col("k") === 7L) == 1L)
    val after = wh.read(spark, path).inputFiles.toSet
    assert(before.intersect(after).size == 1)
    assert(!rows(wh, path).exists(_._1 == 7L))
    assert(rows(wh, path).size == 100)
  }

  test("conflict fencing: a hit file retired between plan and commit " +
    "raises ConcurrentCommitException; a fresh retry converges") {
    val (wh, path) = fresh("dw5")
    wh.append(spark, Seq((1L, "a", D1), (2L, "x", D1)).toDF("k", "s", "date"), path)
    // deterministic race injection: the predicate carries a one-shot
    // side effect (test-only UDF) that retires the D1 partition — a
    // metadata-only commit, no nested Spark job — the first time the
    // delete's own scan evaluates a row. The delete therefore plans
    // against a snapshot whose hit file is retired before its commit
    // loop runs, which is exactly the compaction/competing-rewrite
    // interleaving the fence exists for.
    DeleteWhereSpec.reset()
    // the task thread only touches JVM latches (no SparkSession in the
    // closure); the competing commit runs on a plain driver-side thread
    val competitor = new Thread(() => {
      DeleteWhereSpec.reached.await()
      wh.deletePartition(spark, path, D1.toLocalDate)
      DeleteWhereSpec.proceed.countDown()
    })
    competitor.start()
    val sideEffect = udf { (_: Long) =>
      DeleteWhereSpec.reached.countDown()
      DeleteWhereSpec.proceed.await(30,
        java.util.concurrent.TimeUnit.SECONDS)
      true
    }
    intercept[ConcurrentCommitException] {
      wh.deleteWhere(spark, path, sideEffect(col("k")) && col("s") === "x")
    }
    competitor.join()
    // the competing commit won: partition gone; a fresh delete over the
    // remaining (empty) table is a no-op
    assert(wh.deleteWhere(spark, path, col("s") === "x") == 0L)
  }

  test("requirePartitionFilter: a flagged table rejects a dateless " +
    "delete and accepts a date-constrained one (dml-contract)") {
    val (wh, path) = fresh("dw6")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D2)).toDF("k", "s", "date"), path)
    wh.setRequirePartitionFilter(spark, path, required = true)
    intercept[IllegalArgumentException] {
      wh.deleteWhere(spark, path, col("s") === "a")
    }
    val n = wh.deleteWhere(spark, path,
      col("date") === lit(D1) && col("s") === "a")
    assert(n == 1L)
  }
}

object DeleteWhereSpec {
  /** Race-injection latches for dw5: the delete's own scan signals
    * `reached` and blocks on `proceed` while a driver thread lands the
    * competing commit — both sides plain JVM, nothing Spark crosses the
    * task boundary.
    */
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var proceed: java.util.concurrent.CountDownLatch = _
  def reset(): Unit = {
    reached = new java.util.concurrent.CountDownLatch(1)
    proceed = new java.util.concurrent.CountDownLatch(1)
  }
}
