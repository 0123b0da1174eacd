package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The manifest-backed FileIndex: plans over readRelation push their own
  * filters into stats/bloom skipping (scan-level numFiles proves it),
  * planning statistics come from manifest byte lengths (auto-broadcast
  * without a hint), snapshots pin until refresh, and evolved columns
  * resolve through the recorded schema.
  */
class TxFileIndexSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D = java.sql.Date.valueOf("2024-09-01")

  private def filesRead(df: DataFrame): Long = {
    df.collect() // execute THIS queryExecution so its metrics populate
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case f: FileSourceScanExec => f.metrics("numFiles").value
    }.sum
  }

  test("pushed filters prune at the manifest: range on the clustered " +
    "key and bloom point probes read only their files; rows equal the " +
    "plain read") {
    val root = Files.createTempDirectory("graft-fi1").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "s", 1000, 0.01)
    wh.append(spark,
      (0 until 800).map(k => (k.toLong, s"v$k", D)).toDF("k", "s", "date")
        .repartitionByRange(8, col("k")), path)

    val rel = wh.readRelation(spark, path)
    assert(rel.count() == 800L)
    assert(rel.columns.toSet == Set("k", "s", "date"))

    // range filter on the clustered key: 1 of 8 files
    val r = rel.filter(col("k").between(100L, 150L))
    assert(filesRead(r) == 1L, "range stats must prune inside the scan")
    assert(r.count() == 51L)

    // bloom point probe on the string key (scattered across the range
    // layout): opens only bloom-positive files
    val b = rel.filter(col("s") === "v10")
    assert(filesRead(b) <= 2L, "bloom must prune inside the scan")
    assert(b.select("k").as[Long].collect().toSeq == Seq(10L))

    // un-prunable predicate still answers correctly over all files
    assert(rel.filter(col("k") % 100 === 0).count() == 8L)
  }

  test("planning statistics come from the manifest: a small tx relation " +
    "auto-broadcasts into a join without a hint") {
    val root = Files.createTempDirectory("graft-fi2").toString
    val wh = new TxWarehouse(root)
    val dim = wh.tablePath("m", "dim")
    wh.append(spark,
      (0 until 50).map(k => (k.toLong, s"name$k", D)).toDF("k", "nm", "date"),
      dim)
    val fact = (0 until 10000).map(i => (i.toLong % 50, i.toLong))
      .toDF("k", "v")
    val joined = fact.join(wh.readRelation(spark, dim).select("k", "nm"),
      Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"manifest sizeInBytes should make the dim broadcast:\n$plan")
    assert(joined.count() == 10000L)
  }

  test("snapshot pins until refresh; schema evolution resolves through " +
    "the recorded schema") {
    val root = Files.createTempDirectory("graft-fi3").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.append(spark, Seq((1L, "a", D)).toDF("k", "s", "date"), path)
    val rel = wh.readRelation(spark, path)
    assert(rel.count() == 1L)
    // a later commit is invisible to the pinned snapshot…
    wh.append(spark, Seq((2L, "b", D)).toDF("k", "s", "date"), path)
    assert(rel.count() == 1L)
    // …and a NEW relation (or refresh) sees it
    assert(wh.readRelation(spark, path).count() == 2L)
    // evolved column: the recorded schema resolves it over old files
    wh.append(spark,
      Seq((3L, "c", D, "en")).toDF("k", "s", "date", "lang"), path)
    val evolved = wh.readRelation(spark, path)
    assert(evolved.columns.contains("lang"))
    val langs = evolved.select("k", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(langs(3L).contains("en") && langs(1L).isEmpty)
  }
}
