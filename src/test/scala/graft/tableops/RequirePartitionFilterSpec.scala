package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Read-side `requirePartitionFilter` — the BigQuery property the
  * reference sets on its materialized join table at creation
  * (cloud/bq/ops.go:283-287): a flagged table refuses unscoped reads,
  * so the 100 TB mistake (a full scan of a table whose access pattern
  * is per-day) becomes an error instead of a bill. Metadata probes and
  * date-scoped reads are unaffected; the flag rides the same `P`
  * property mechanism as blooms/CHECK constraints (last-one-wins,
  * checkpoint-surviving, visible to every driver).
  */
class RequirePartitionFilterSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def data = Seq((1L, "a", D1), (2L, "b", D1), (3L, "c", D2))
    .toDF("k", "s", "date")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("m", "t"))
  }

  test("unscoped read of a flagged table throws; date-scoped reads " +
    "pass; metadata probes are unaffected; unset restores full reads") {
    val (wh, path) = fresh("rpf1")
    wh.append(spark, data, path)
    assert(!wh.requiresPartitionFilter(spark, path))
    assert(wh.read(spark, path).count() == 3L) // unflagged: fine

    wh.setRequirePartitionFilter(spark, path)
    assert(wh.requiresPartitionFilter(spark, path))
    val e = intercept[IllegalArgumentException] { wh.read(spark, path) }
    assert(e.getMessage.contains("requirePartitionFilter"))

    // date-scoped entry points still work
    assert(wh.readPartition(spark, path, D1.toLocalDate).count() == 2L)
    assert(wh.readWhere(spark, path, col("date") === lit(D1))
      .count() == 2L)
    assert(wh.readWhere(spark, path,
      col("date") === lit(D1) && col("k") > 1L).count() == 1L)
    // a readWhere that never names the partition column is exactly the
    // unscoped scan the flag forbids
    val e2 = intercept[IllegalArgumentException] {
      wh.readWhere(spark, path, col("k") === 1L)
    }
    assert(e2.getMessage.contains("date"))

    // manifest-only probes don't open data and stay available
    assert(wh.dates(spark, path) == Set(D1.toLocalDate, D2.toLocalDate))
    assert(wh.fastRowCount(spark, path).contains(3L))

    // unset restores the full read
    wh.setRequirePartitionFilter(spark, path, required = false)
    assert(!wh.requiresPartitionFilter(spark, path))
    assert(wh.read(spark, path).count() == 3L)
  }

  test("the flag survives checkpoint + log truncation, and writes to a " +
    "flagged table still work (the guard is read-side only)") {
    val root = Files.createTempDirectory("graft-rpf2").toString
    val wh = new TxWarehouse(root, checkpointEvery = 2)
    val path = wh.tablePath("m", "t")
    wh.append(spark, data, path)
    wh.setRequirePartitionFilter(spark, path) // v2 → checkpoint
    wh.truncateLog(spark, path)
    intercept[IllegalArgumentException] { wh.read(spark, path) }
    // appends, merges and partition replaces are write-side: unaffected
    wh.append(spark, Seq((4L, "d", D2)).toDF("k", "s", "date"), path)
    wh.mergeInto(spark,
      Seq((1L, "A", D1)).toDF("k", "s", "date"), path, Seq("k"))
    assert(wh.readPartition(spark, path, D1.toLocalDate)
      .filter(col("k") === 1L).select("s").as[String].head() == "A")
    assert(wh.readPartition(spark, path, D2.toLocalDate).count() == 2L)
  }

  test("path-backend no-op: the plain warehouse accepts the setter and " +
    "keeps full reads (its directory layout is the partition grain)") {
    val root = Files.createTempDirectory("graft-rpf3").toString
    val wh = Warehouse(root)
    val path = wh.tablePath("m", "t")
    wh.append(spark, data, path)
    wh.setRequirePartitionFilter(spark, path)
    assert(!wh.requiresPartitionFilter(spark, path))
    assert(wh.read(spark, path).count() == 3L)
  }
}
