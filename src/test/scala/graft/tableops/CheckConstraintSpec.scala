package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** CHECK constraints on the tx write path: enforcement rides the write
  * pass (observe — no extra scan), violations abort before commit with
  * the table untouched, NULL predicates pass (SQL semantics), drops
  * re-open the gate, and merge/streaming batches go through the same
  * funnel.
  */
class CheckConstraintSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D = java.sql.Date.valueOf("2024-09-01")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("m", "t"))
  }

  test("violating append aborts uncommitted; conforming rows land; " +
    "null predicate passes; vacuum reclaims the aborted files") {
    val (wh, path) = fresh("ck1")
    wh.addCheckConstraint(spark, path, "positive_v", "v > 0")
    wh.append(spark, Seq((1L, 5L, D)).toDF("k", "v", "date"), path)
    val v = wh.currentVersion(spark, path)
    val e = intercept[ConstraintViolationException] {
      wh.append(spark,
        Seq((2L, -1L, D), (3L, 2L, D)).toDF("k", "v", "date"), path)
    }
    assert(e.getMessage.contains("positive_v") && e.getMessage.contains("1 rows"))
    assert(wh.currentVersion(spark, path) == v, "nothing may commit")
    assert(wh.read(spark, path).count() == 1L)
    // SQL CHECK: a null predicate result is a PASS
    wh.append(spark,
      Seq((4L, null.asInstanceOf[java.lang.Long], D)).toDF("k", "v", "date"),
      path)
    assert(wh.read(spark, path).count() == 2L)
    // the aborted write's files are orphans; vacuum reclaims, data intact
    wh.vacuum(spark, path, keepVersions = 1, minAgeMillis = 0L)
    assert(wh.read(spark, path).count() == 2L)
  }

  test("merge runs through the same gate; dropping the constraint " +
    "re-opens it; re-adding a name replaces the predicate") {
    val (wh, path) = fresh("ck2")
    wh.append(spark, Seq((1L, 5L, D)).toDF("k", "v", "date"), path)
    wh.addCheckConstraint(spark, path, "bounded", "v < 100")
    intercept[ConstraintViolationException] {
      wh.mergeInto(spark, Seq((1L, 500L, D)).toDF("k", "v", "date"),
        path, Seq("k"))
    }
    assert(wh.read(spark, path).select("v").as[Long].collect().toSeq == Seq(5L))
    wh.dropCheckConstraint(spark, path, "bounded")
    wh.mergeInto(spark, Seq((1L, 500L, D)).toDF("k", "v", "date"),
      path, Seq("k"))
    assert(wh.read(spark, path).select("v").as[Long].collect().toSeq == Seq(500L))
    // re-add with a tighter bound: the new predicate governs
    wh.addCheckConstraint(spark, path, "bounded", "v < 1000")
    wh.mergeInto(spark, Seq((1L, 600L, D)).toDF("k", "v", "date"),
      path, Seq("k"))
    intercept[ConstraintViolationException] {
      wh.mergeInto(spark, Seq((1L, 5000L, D)).toDF("k", "v", "date"),
        path, Seq("k"))
    }
  }

  test("constraints survive checkpoint truncation and compose with the " +
    "bloom property") {
    val wh = new TxWarehouse(
      Files.createTempDirectory("graft-ck3").toString, checkpointEvery = 2)
    val path = wh.tablePath("m", "t")
    wh.addCheckConstraint(spark, path, "pos", "v > 0")
    wh.setBloomFilter(spark, path, "k", 100, 0.01)
    wh.append(spark, Seq((1L, 1L, D)).toDF("k", "v", "date"), path)
    wh.append(spark, Seq((2L, 2L, D)).toDF("k", "v", "date"), path)
    wh.truncateLog(spark, path)
    intercept[ConstraintViolationException] {
      wh.append(spark, Seq((3L, -3L, D)).toDF("k", "v", "date"), path)
    }
    // bloom property also survived: the new write still harvests
    wh.append(spark, Seq((3L, 3L, D)).toDF("k", "v", "date"), path)
    val p = wh.readWhere(spark, path, col("k") === 3L)
    assert(p.select("v").as[Long].collect().toSeq == Seq(3L))
  }
}
