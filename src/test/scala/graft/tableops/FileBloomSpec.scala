package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter data skipping: the scattered-key regime where min/max
  * ranges prune nothing. Layout here hash-partitions keys so EVERY
  * file's [min,max] spans the whole domain — range stats keep all
  * files, and any skipping observed is the bloom layer's.
  */
class FileBloomSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D = java.sql.Date.valueOf("2024-09-01")

  /** 800 keys scattered across 8 files by hash — every file's key range
    * spans ~[0, 800).
    */
  private def scattered: DataFrame =
    (0 until 800).map(k => (k.toLong, s"v$k", D)).toDF("k", "s", "date")
      .repartition(8, col("k") % 8)

  test("point lookups open only bloom-positive files; results stay " +
    "value-identical to the unpruned filter") {
    val root = Files.createTempDirectory("graft-bl1").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "k", expectedItemsPerFile = 1000, fpp = 0.01)
    wh.append(spark, scattered, path)

    // control: the same data WITHOUT the property prunes nothing
    // (hash layout: each file's key range spans ~the whole domain; the
    // residue hash leaves some of the 8 partitions empty, so compare
    // against the ACTUAL live file count, not 8)
    val wh2 = new TxWarehouse(Files.createTempDirectory("graft-bl1c").toString)
    val path2 = wh2.tablePath("m", "t")
    wh2.append(spark, scattered, path2)
    val allFiles = wh2.read(spark, path2).inputFiles.length
    assert(allFiles >= 4, s"layout sanity: $allFiles files")
    assert(wh2.readWhere(spark, path2, col("k") === 10L)
      .inputFiles.length == allFiles,
      "ranges must NOT prune the scattered layout")

    val pruned = wh.readWhere(spark, path, col("k") === 10L)
    assert(pruned.inputFiles.length <= 2,
      s"bloom should confine a point probe, opened ${pruned.inputFiles.length}")
    assert(pruned.select("s").as[String].collect().toSeq == Seq("v10"))

    // IN probe: union of the keys' files
    val in = wh.readWhere(spark, path, col("k").isin(10L, 11L, 12L))
    assert(in.inputFiles.length <= 4, s"got ${in.inputFiles.length}")
    assert(in.select("s").as[String].collect().toSet == Set("v10", "v11", "v12"))

    // a key the table does NOT contain: bloom proves every file empty
    val none = wh.readWhere(spark, path, col("k") === 5000L)
    assert(none.count() == 0L)

    // soundness sweep: pruned results equal the unpruned filter for
    // every key in a sample (false positives only ever ADD files)
    (0 until 50).foreach { k =>
      val a = wh.readWhere(spark, path, col("k") === k.toLong)
        .select("s").as[String].collect().toSeq
      assert(a == Seq(s"v$k"), s"key $k")
    }
  }

  test("merge on scattered keys rewrites only bloom-positive files " +
    "where ranges would rewrite the whole table") {
    val root = Files.createTempDirectory("graft-bl2").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "k", 1000, 0.01)
    wh.append(spark, scattered, path)

    val total = wh.read(spark, path).inputFiles.length
    val changes = Seq((10L, "X", D), (999L, "new", D)).toDF("k", "s", "date")
    val st = wh.mergeInto(spark, changes, path, Seq("k"))
    assert(st.filesRewritten <= 3 && st.filesRewritten < total,
      s"bloom must confine the rewrite (of $total files): $st")
    val got = wh.read(spark, path).select("k", "s").as[(Long, String)]
      .collect().toMap
    assert(got(10L) == "X" && got(999L) == "new" && got(9L) == "v9")
    assert(got.size == 801)

    // control: same merge without blooms touches every file
    val wh2 = new TxWarehouse(Files.createTempDirectory("graft-bl2c").toString)
    val path2 = wh2.tablePath("m", "t")
    wh2.append(spark, scattered, path2)
    val total2 = wh2.read(spark, path2).inputFiles.length
    val st2 = wh2.mergeInto(spark, changes, path2, Seq("k"))
    assert(st2.filesRewritten == total2, s"ranges can't skip here: $st2")
  }

  test("blooms and the property survive checkpoint + log truncation; " +
    "post-checkpoint writes keep harvesting") {
    val root = Files.createTempDirectory("graft-bl3").toString
    val wh = new TxWarehouse(root, checkpointEvery = 2)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "k", 1000, 0.01)
    wh.append(spark, scattered, path)
    wh.append(spark,
      Seq((900L, "a", D)).toDF("k", "s", "date"), path) // v3 → checkpoint
    wh.truncateLog(spark, path)
    val probe = wh.readWhere(spark, path, col("k") === 10L)
    assert(probe.inputFiles.length <= 3,
      s"bloom lines must ride the checkpoint, opened ${probe.inputFiles.length}")
    assert(probe.select("s").as[String].collect().toSeq == Seq("v10"))
    // the property rode the checkpoint too: a fresh write still harvests
    wh.append(spark, Seq((901L, "b", D)).toDF("k", "s", "date"), path)
    val p2 = wh.readWhere(spark, path, col("k") === 901L)
    assert(p2.select("s").as[String].collect().toSeq == Seq("b"))
    assert(p2.inputFiles.length <= 3, s"opened ${p2.inputFiles.length}")
  }

  test("a rewrite re-lands pre-property files WITH blooms: setBloomFilter " +
    "on an existing table, then the compaction publish path, then " +
    "point probes prune") {
    val root = Files.createTempDirectory("graft-bl5").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.append(spark, scattered, path) // pre-property: no blooms
    val all = wh.read(spark, path).inputFiles.length
    assert(wh.readWhere(spark, path, col("k") === 10L)
      .inputFiles.length == all, "pre-property probes read everything")
    wh.setBloomFilter(spark, path, "k", 1000, 0.01)
    // the compaction publish path: stage a self-replace of the day from
    // its own rows (re-scattered), publish — listData harvests blooms
    val (_, token) = wh.stageSelfReplace(spark,
      wh.readPartition(spark, path, D.toLocalDate).repartition(8, col("k") % 8),
      path, D.toLocalDate)
    wh.publishSelfReplace(spark, path, D.toLocalDate, token)
    val p = wh.readWhere(spark, path, col("k") === 10L)
    assert(p.inputFiles.length <= 2,
      s"re-landed files must carry blooms, opened ${p.inputFiles.length}")
    assert(p.select("s").as[String].collect().toSeq == Seq("v10"))
  }

  test("multiple bloom columns: each key prunes independently and a " +
    "conjunct refuted by either empties the probe") {
    val root = Files.createTempDirectory("graft-blm").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "k", 1000, 0.01)
    wh.setBloomFilter(spark, path, "s", 1000, 0.01)
    wh.append(spark, scattered, path)
    val total = wh.read(spark, path).inputFiles.length
    val pk = wh.readWhere(spark, path, col("k") === 10L)
    assert(pk.inputFiles.length <= 2, s"k bloom: ${pk.inputFiles.length}")
    assert(pk.select("s").as[String].collect().toSeq == Seq("v10"))
    val ps = wh.readWhere(spark, path, col("s") === "v11")
    assert(ps.inputFiles.length <= 2, s"s bloom: ${ps.inputFiles.length}")
    assert(ps.select("k").as[Long].collect().toSeq == Seq(11L))
    // contradictory conjunct: k=10's file does not carry s='v11' unless
    // they collide — both blooms prune their own side
    val none = wh.readWhere(spark, path,
      col("k") === 5000L && col("s") === "v10")
    assert(none.count() == 0L)
    assert(total >= 4)
  }

  test("timestamp bloom column built under UTC probed under Asia/Tokyo " +
    "still returns the rows AND still prunes: the payload records the " +
    "build zone and the probe re-renders its literal under it") {
    val root = Files.createTempDirectory("graft-bltz").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "t", 1000, 0.01)
    // distinct timestamps scattered by hash — ranges can't prune
    val rows = (0 until 800).map { k =>
      (k.toLong, new java.sql.Timestamp(1725148800000L + k * 1000L), D)
    }.toDF("k", "t", "date").repartition(8, col("k") % 8)
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey) // UTC (SparkTestBase)
    assert(prevTz == "UTC")
    wh.append(spark, rows, path) // blooms built + recorded under UTC
    val target = new java.sql.Timestamp(1725148800000L + 10 * 1000L)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo")
      // soundness: the row must come back — under Tokyo the literal's
      // string form differs from what UTC hashed, so a probe hashed
      // under the PROBING zone would prune the file containing it
      val p = wh.readWhere(spark, path, col("t") === lit(target))
      assert(p.select("k").as[Long].collect().toSeq == Seq(10L),
        "cross-timezone probe lost rows — bloom skipping is unsound")
      // and the skipping layer still engages (recorded zone, not a
      // blanket keep-everything)
      val all = wh.read(spark, path).inputFiles.length
      assert(p.inputFiles.length <= 2 && all >= 4,
        s"bloom no longer prunes cross-zone: ${p.inputFiles.length}/$all")
    } finally spark.conf.set(tzKey, prevTz)
  }

  test("timestamp blooms' recorded build zone survives checkpoint + " +
    "truncateLog: the foreign-zone probe after a full log rewrite still " +
    "returns the rows and still prunes") {
    val root = Files.createTempDirectory("graft-bltzcp").toString
    val wh = new TxWarehouse(root, checkpointEvery = 2)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "t", 1000, 0.01)
    val rows = (0 until 800).map { k =>
      (k.toLong, new java.sql.Timestamp(1725148800000L + k * 1000L), D)
    }.toDF("k", "t", "date").repartition(8, col("k") % 8)
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey) // UTC (SparkTestBase)
    assert(prevTz == "UTC")
    wh.append(spark, rows, path) // v2 after the property commit → checkpoint
    wh.append(spark,
      Seq((900L, new java.sql.Timestamp(1725500000000L), D))
        .toDF("k", "t", "date"), path)
    wh.append(spark,
      Seq((901L, new java.sql.Timestamp(1725500001000L), D))
        .toDF("k", "t", "date"), path) // v4 → second checkpoint
    // force a REAL rewrite: pre-checkpoint deltas (the commits whose `B`
    // lines carried the build zone) are deleted; only the checkpoint's
    // re-serialized payloads remain
    val deleted = wh.truncateLog(spark, path, keepCheckpoints = 1,
      minAgeMillis = 0L)
    assert(deleted > 0, "truncation must actually rewrite the log")
    val target = new java.sql.Timestamp(1725148800000L + 10 * 1000L)
    try {
      spark.conf.set(tzKey, "Asia/Tokyo")
      val p = wh.readWhere(spark, path, col("t") === lit(target))
      assert(p.select("k").as[Long].collect().toSeq == Seq(10L),
        "recorded build zone lost across checkpoint+truncation — " +
          "cross-zone probe dropped rows")
      val all = wh.read(spark, path).inputFiles.length
      assert(p.inputFiles.length <= 3 && all >= 4,
        s"bloom no longer prunes after log rewrite: ${p.inputFiles.length}/$all")
    } finally spark.conf.set(tzKey, prevTz)
  }

  test("legacy two-field payloads (no recorded zone): timestamp probes " +
    "keep the file; zone-insensitive probes still prune") {
    import java.nio.charset.StandardCharsets.UTF_8
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      EqualTo, Literal, XxHash64}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    import org.apache.spark.util.sketch.BloomFilter
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    // build a bloom the way harvest does: xxhash64 of the STRING form
    val bf = BloomFilter.create(100, 0.01)
    bf.putLong(new XxHash64(Seq(Literal("42"))).eval(null)
      .asInstanceOf[Long])
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val legacy = s"${b64("t".getBytes(UTF_8))}:${b64(bos.toByteArray)}"
    val tsAttr = AttributeReference("t", TimestampType)()
    // a timestamp literal cannot be re-rendered without the build zone:
    // the file must be KEPT even though the bloom would refute it
    assert(FileBloom.mayMatch(legacy,
      EqualTo(tsAttr, Literal(1725148800000000L, TimestampType))),
      "legacy payload must keep files for timestamp probes")
    // zone-insensitive literals still hash identically under any zone:
    // present value passes, absent value prunes
    val kAttr = AttributeReference("t", LongType)()
    assert(FileBloom.mayMatch(legacy, EqualTo(kAttr, Literal(42L))))
    assert(!FileBloom.mayMatch(legacy, EqualTo(kAttr, Literal(43L))),
      "legacy payload must still prune zone-insensitive probes")
  }

  test("date-typed bloom column prunes date-literal probes; a column " +
    "missing from a write yields an all-null bloom that prunes " +
    "every non-null probe") {
    val root = Files.createTempDirectory("graft-bl4").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    wh.setBloomFilter(spark, path, "s", 1000, 0.01)
    wh.append(spark, scattered, path)
    val p = wh.readWhere(spark, path, col("s") === "v10")
    assert(p.inputFiles.length <= 2, s"opened ${p.inputFiles.length}")
    assert(p.select("k").as[Long].collect().toSeq == Seq(10L))
    // conjunct with an unrelated predicate still prunes on the bloom arm
    val c = wh.readWhere(spark, path, col("s") === "v10" && col("k") >= 0L)
    assert(c.inputFiles.length <= 2, s"opened ${c.inputFiles.length}")
  }
}
