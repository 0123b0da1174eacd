package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed layout + storage-partitioned join: writes cluster into
  * Murmur3 hash buckets, the bucket-aware relation declares the hash
  * partitioning so co-bucketed joins skip both Exchanges, point
  * lookups prune to one bucket from the manifest, and mixed
  * generations are refused until rewritten.
  */
class BucketSpecSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")

  private def fresh(tag: String): TxWarehouse =
    new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)

  test("co-bucketed join runs with NO Exchange on either side and " +
    "matches the shuffled join row-for-row") {
    val wh = fresh("bk1")
    val left = wh.tablePath("b", "left")
    val right = wh.tablePath("b", "right")
    wh.setBucketSpec(spark, left, "k", 8)
    wh.setBucketSpec(spark, right, "k", 8)
    wh.append(spark, (1L to 500L).map(k => (k, s"l$k", D1))
      .toDF("k", "lv", "date"), left)
    wh.append(spark, (251L to 750L).map(k => (k, s"r$k", D1))
      .toDF("k", "rv", "date"), right)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = wh.readBucketed(spark, left)
        .join(wh.readBucketed(spark, right), Seq("k"))
        .select(col("k"), col("lv"), col("rv"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
      val got = j.as[(Long, String, String)].collect().toSet
      val want = (251L to 500L).map(k => (k, s"l$k", s"r$k")).toSet
      assert(got == want)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("point lookup prunes to the key's bucket from the manifest " +
    "alone; rows exact") {
    val wh = fresh("bk2")
    val path = wh.tablePath("b", "t")
    wh.setBucketSpec(spark, path, "k", 8)
    wh.append(spark, (1L to 400L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date"), path)
    val all = wh.read(spark, path).inputFiles.length
    val point = wh.readBucketKey(spark, path, 137L)
    assert(point.inputFiles.length < all,
      s"bucket prune opened $all files")
    assert(point.select("s").as[String].collect().toSeq == Seq("v137"))
    // a key that does not exist still resolves (empty result)
    assert(wh.readBucketKey(spark, path, 100000L).isEmpty)
  }

  test("mixed generations are refused until rewritten; compact " +
    "re-clusters under the current spec and the scan works again") {
    val wh = fresh("bk3")
    val path = wh.tablePath("b", "t")
    // generation 0: no bucket spec
    wh.append(spark, (1L to 100L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.setBucketSpec(spark, path, "k", 4)
    wh.append(spark, (101L to 200L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date"), path)
    val e = intercept[IllegalArgumentException](wh.readBucketed(spark, path))
    assert(e.getMessage.contains("bucket"))
    // full rewrite re-clusters everything under the current spec
    wh.compact(spark, path, smallBytes = Long.MaxValue): Unit
    assert(wh.readBucketed(spark, path).select("k").as[Long]
      .collect().toSet == (1L to 200L).toSet)
    // plain reads were never affected by bucketing either way
    assert(wh.read(spark, path).count() == 200L)
  }

  test("bucketed write composes with deletion vectors: the SPJ scan " +
    "subtracts the vector and still reports no Exchange") {
    val wh = fresh("bk4")
    val left = wh.tablePath("b", "l")
    val right = wh.tablePath("b", "r")
    Seq(left, right).foreach(wh.setBucketSpec(spark, _, "k", 4))
    wh.append(spark, (1L to 100L).map(k => (k, s"l$k", D1))
      .toDF("k", "lv", "date"), left)
    wh.append(spark, (1L to 100L).map(k => (k, s"r$k", D1))
      .toDF("k", "rv", "date"), right)
    wh.deleteWhereMor(spark, left, col("k") <= 10L)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = wh.readBucketed(spark, left)
        .join(wh.readBucketed(spark, right), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      // the DV anti-join is a broadcast above the scan — partitioning
      // preserved, still no shuffle Exchange anywhere
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(j.count() == 90L)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
