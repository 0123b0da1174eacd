package graft.tableops

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** File-level data skipping: the stats harvest → manifest `S` lines →
  * [[TxWarehouse.readWhere]] pruning chain, plus the evaluator's
  * soundness edges (nulls, missing columns, unsupported shapes, string
  * byte order) against hand-built payloads.
  */
class FileStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def expr(c: Column) = org.apache.spark.sql.graftshim.PredicateBridge.normalize(c)

  private def freshTable(): (TxWarehouse, String) = {
    val root = Files.createTempDirectory("graft-stats").toString
    val wh = new TxWarehouse(root)
    (wh, wh.tablePath("ds", "dt"))
  }

  /** One file per call: disjoint id range [lo, hi), one date. */
  private def appendRange(wh: TxWarehouse, path: String, lo: Long, hi: Long,
      date: String, src: String = "s"): Unit = {
    val df = (lo until hi).map(i => (i, s"$src$i", Date.valueOf(date)))
      .toDF("id", "name", "date").coalesce(1)
    wh.append(spark, df, path)
  }

  test("timestamp stats prune event-time range probes (micros domain), " +
    "and results stay identical to the unpruned filter") {
    val (wh, path) = freshTable()
    def hourFile(h: Int): Unit = {
      val df = (0 until 60).map(m =>
        (h.toLong * 100 + m,
          java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00"),
          Date.valueOf("2024-03-01")))
        .toDF("id", "ts", "date").coalesce(1)
      wh.append(spark, df, path)
    }
    (0 until 4).foreach(hourFile) // 4 files, one hour each
    val all = wh.read(spark, path)
    assert(all.inputFiles.length == 4)
    val pred = col("ts") >= lit(java.sql.Timestamp.valueOf("2024-03-01 02:10:00")) &&
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-03-01 02:50:00"))
    val pruned = wh.readWhere(spark, path, pred)
    assert(pruned.inputFiles.length == 1,
      s"only hour 2 overlaps, opened ${pruned.inputFiles.length}")
    assert(pruned.count() == 40L)
    assert(pruned.count() == all.filter(pred).count())
    // equality on an exact event time
    val eq = wh.readWhere(spark, path,
      col("ts") === lit(java.sql.Timestamp.valueOf("2024-03-01 03:30:00")))
    assert(eq.inputFiles.length == 1 && eq.count() == 1L)
    // a probe outside every file's range proves the table empty
    val none = wh.readWhere(spark, path,
      col("ts") > lit(java.sql.Timestamp.valueOf("2024-03-02 00:00:00")))
    assert(none.count() == 0L)
  }

  test("range predicate opens only overlapping files; rows match unpruned read") {
    val (wh, path) = freshTable()
    appendRange(wh, path, 0, 100, "2024-01-01")
    appendRange(wh, path, 100, 200, "2024-01-01")
    appendRange(wh, path, 200, 300, "2024-01-02")
    appendRange(wh, path, 300, 400, "2024-01-02")
    val all = wh.read(spark, path)
    assert(all.inputFiles.length == 4)

    val pred = col("id") >= 120L && col("id") < 180L
    val pruned = wh.readWhere(spark, path, pred)
    assert(pruned.inputFiles.length == 1, "only the [100,200) file overlaps")
    assert(pruned.count() == 60)
    assert(pruned.agg(sum("id")).as[Long].head() ==
      all.filter(pred).agg(sum("id")).as[Long].head())

    // equality hits one file; a miss between ranges prunes everything
    assert(wh.readWhere(spark, path, col("id") === 250L).inputFiles.length == 1)
    val none = wh.readWhere(spark, path, col("id") === 999L)
    assert(none.count() == 0)
    // and the empty result keeps the table schema
    assert(none.columns.toSet == Set("id", "name", "date"))
  }

  test("date and string predicates prune; IN folds per element") {
    val (wh, path) = freshTable()
    appendRange(wh, path, 0, 10, "2024-01-01", "a")
    appendRange(wh, path, 10, 20, "2024-01-02", "b")
    appendRange(wh, path, 20, 30, "2024-01-03", "c")

    val d = wh.readWhere(spark, path,
      col("date") === lit(Date.valueOf("2024-01-02")))
    assert(d.inputFiles.length == 1 && d.count() == 10)

    val s = wh.readWhere(spark, path, col("name") >= "c")
    assert(s.inputFiles.length == 1 && s.count() == 10)

    val in = wh.readWhere(spark, path,
      col("id").isin(5L, 25L))
    assert(in.inputFiles.length == 2 && in.count() == 2)
  }

  test("pruning survives checkpoints and log truncation") {
    val root = Files.createTempDirectory("graft-stats-cp").toString
    val wh = new TxWarehouse(root, checkpointEvery = 2)
    val path = wh.tablePath("ds", "dt")
    appendRange(wh, path, 0, 10, "2024-01-01")
    appendRange(wh, path, 10, 20, "2024-01-01") // checkpoint at v2
    appendRange(wh, path, 20, 30, "2024-01-01")
    appendRange(wh, path, 30, 40, "2024-01-01") // checkpoint at v4
    assert(wh.truncateLog(spark, path, keepCheckpoints = 1,
      minAgeMillis = 0L) > 0, "deltas below the newest checkpoint go")
    val pruned = wh.readWhere(spark, path, col("id") === 35L)
    assert(pruned.inputFiles.length == 1, "stats came back through the checkpoint")
    assert(pruned.count() == 1)
  }

  test("rewrites refresh stats; schema-evolved files prune as all-null") {
    val (wh, path) = freshTable()
    appendRange(wh, path, 0, 10, "2024-01-01")
    // second file WITHOUT the `extra` column the next append introduces
    val evolved = Seq((100L, "x", Date.valueOf("2024-01-02"), "tagged"))
      .toDF("id", "name", "date", "extra").coalesce(1)
    wh.append(spark, evolved, path)

    // a predicate on `extra` proves the un-evolved file empty (all-null)
    val hit = wh.readWhere(spark, path, col("extra") === "tagged")
    assert(hit.inputFiles.length == 1 && hit.count() == 1)
    // while IsNull must KEEP the un-evolved file — and because that
    // kept file LACKS `extra`, this exercises the recorded-schema
    // fallback: the pruned subset must stay pruned (1 file), not fall
    // back to the unpruned read
    val nullRead = wh.readWhere(spark, path, col("extra").isNull)
    assert(nullRead.count() == 10)
    assert(nullRead.inputFiles.length == 1,
      "schema-evolution predicate lost the manifest pruning")

    // a partition rewrite re-harvests: day 1 rewritten to ids 1000+
    val rewritten = (1000L until 1010L).map(i =>
      (i, s"r$i", Date.valueOf("2024-01-01"))).toDF("id", "name", "date")
      .coalesce(1)
    wh.overwritePartition(spark, rewritten, path,
      java.time.LocalDate.parse("2024-01-01"))
    assert(wh.readWhere(spark, path, col("id") === 5L).count() == 0)
    val post = wh.readWhere(spark, path, col("id") === 1005L)
    assert(post.inputFiles.length == 1 && post.count() == 1)
  }

  test("clustered compaction makes stats selective") {
    val (wh, path0) = freshTable()
    val job = graft.model.Job("bucket", "exp", "dt",
      java.time.LocalDate.parse("2024-01-01"),
      datasets = graft.model.Datasets(tmp = "tmp", raw = "ds", join = ""))
    val path = wh.tablePath("ds", "dt")
    assert(path == path0)
    // six appends, each SPANNING the whole id domain — the layout a
    // day's archive loads produce: every file overlaps every range query
    for (r <- 0 until 6)
      wh.append(spark, (0L until 60L by 6L).map(i =>
        (i + r, s"x${i + r}", Date.valueOf("2024-01-01")))
        .toDF("id", "name", "date").coalesce(1), path)
    val pred = col("id") >= 10L && col("id") < 20L
    assert(wh.readWhere(spark, path, pred).inputFiles.length == 6,
      "pre-compaction: every file overlaps")
    val before = wh.readWhere(spark, path, pred).as[(Long, String, Date)]
      .collect().toSet

    val ops = new TableOps(spark, job, wh)
    // tiny target => 3 output files, range-clustered on id
    val stats = ops.compactRaw(targetFileBytes = 2048L,
      clusterBy = Seq("id"))
    assert(stats.rowsOut == 60)
    val post = wh.readWhere(spark, path, pred)
    assert(post.inputFiles.length < 3,
      s"clustered layout must confine a 1/6-domain range query to one " +
        s"file region, saw ${post.inputFiles.length}")
    assert(post.as[(Long, String, Date)].collect().toSet == before)
  }

  // ------------------------------------------------- evaluator soundness

  private val base = FileStats.Payload(100L, Map(
    "id" -> FileStats.ColStat(0L, 'l', Some("10"), Some("20")),
    "name" -> FileStats.ColStat(5L, 's', Some("bob"), Some("eve")),
    "allnull" -> FileStats.ColStat(100L, 'l', None, None),
    "score" -> FileStats.ColStat(0L, '?', None, None)))

  test("evaluator: comparison atoms against the long domain") {
    def may(c: Column) = FileStats.mayMatch(base, expr(c))
    assert(may(col("id") === 15L))
    assert(!may(col("id") === 25L))
    assert(!may(col("id") === 9L))
    assert(may(col("id") > 19L))
    assert(!may(col("id") > 20L))
    assert(may(col("id") >= 20L))
    assert(!may(col("id") < 10L))
    assert(may(col("id") <= 10L))
    assert(may(lit(15L) > col("id")), "literal-on-left flips")
    assert(!may(lit(10L) > col("id")))
    // int literals compare in the long domain too
    assert(may(col("id") === 15) && !may(col("id") === 25))
  }

  test("evaluator: and/or fold satisfiability; unsupported shapes keep") {
    def may(c: Column) = FileStats.mayMatch(base, expr(c))
    assert(!may(col("id") === 15L && col("id") === 25L))
    assert(may(col("id") === 25L || col("id") === 15L))
    assert(may(col("id") + 1 === 999L), "arithmetic atom: unknown, keep")
    assert(may(col("score") > 5.0), "'?' tag (floats) never prunes")
    // a null literal can never compare true
    assert(!may(col("id") === lit(null)))
  }

  test("evaluator: null semantics, missing columns, not-equal") {
    def may(c: Column) = FileStats.mayMatch(base, expr(c))
    assert(!may(col("allnull") === 5L), "all-null column proves emptiness")
    assert(may(col("allnull").isNull))
    assert(!may(col("allnull").isNotNull))
    assert(!may(col("missing") === 5L), "absent column reads all-null")
    assert(may(col("missing").isNull))
    assert(!may(col("missing").isNotNull))
    assert(may(col("name").isNull), "5 recorded nulls")
    assert(may(col("id").isNotNull) && !may(col("id").isNull))
    assert(may(col("id") =!= 15L))
    val point = FileStats.Payload(10L, Map(
      "k" -> FileStats.ColStat(0L, 'l', Some("7"), Some("7"))))
    assert(!FileStats.mayMatch(point, expr(col("k") =!= 7L)),
      "min==max==v with no nulls proves != empty")
    assert(FileStats.mayMatch(point, expr(col("k") =!= 8L)))
    // empty file matches nothing
    val empty = FileStats.Payload(0L, Map.empty)
    assert(!FileStats.mayMatch(empty, expr(col("k").isNull)))
  }

  test("evaluator: string byte order and prefixes") {
    def may(c: Column) = FileStats.mayMatch(base, expr(c))
    assert(may(col("name") === "carol"))
    assert(!may(col("name") === "zed"))
    assert(may(col("name").startsWith("d")))
    assert(!may(col("name").startsWith("f")))
    assert(may(col("name").startsWith("bo")))
    // non-BMP: U+1F600 sorts ABOVE U+FFFD in UTF-8 bytes (and in Spark's
    // UTF8String order), though java.lang.String order disagrees — the
    // evaluator must use byte order
    val uni = FileStats.Payload(10L, Map(
      "s" -> FileStats.ColStat(0L, 's', Some("�"), Some("😀"))))
    assert(FileStats.mayMatch(uni, expr(col("s") === "😀")))
    assert(FileStats.mayMatch(uni, expr(col("s") >= "�")))
  }

  test("payload codec round-trips") {
    val enc = FileStats.encode(base)
    assert(!enc.contains(' '), "payload must embed as one manifest token")
    assert(FileStats.decode(enc).contains(base))
    assert(FileStats.decode("garbage").isEmpty)
    val emptyCols = FileStats.Payload(3L, Map.empty)
    assert(FileStats.decode(FileStats.encode(emptyCols)).contains(emptyCols))
  }

  test("an empty appendTxn batch records no phantom schema: a column " +
    "that exists in no committed file never resolves") {
    val (wh, path) = freshTable()
    appendRange(wh, path, 0, 10, "2024-01-01")
    // zero-row micro-batch carrying an extra column — adds no files,
    // and must not teach the recorded schema a column no file has
    val empty = Seq.empty[(Long, String, Date, String)]
      .toDF("id", "name", "date", "phantom")
    assert(wh.appendTxn(spark, empty, path, "app", 1L),
      "the empty batch still commits its txn watermark")
    assert(wh.lastTxn(spark, path, "app") == 1L)
    intercept[org.apache.spark.sql.AnalysisException] {
      wh.readWhere(spark, path, col("phantom").isNull).collect()
    }
  }

  test("a corrupt H token keeps the last good recorded schema instead " +
    "of clearing it") {
    val (wh, path) = freshTable()
    appendRange(wh, path, 0, 10, "2024-01-01")
    val evolved = Seq((100L, "x", Date.valueOf("2024-01-02"), "tagged"))
      .toDF("id", "name", "date", "extra").coalesce(1)
    wh.append(spark, evolved, path)
    // hand-write the next commit with a garbage H token (a torn write /
    // bit-rot shape); replay must keep the v2 schema, not clear it
    val v = wh.currentVersion(spark, path)
    Files.write(java.nio.file.Paths.get(
      s"$path/_graft_log/" + "v%020d.txt".format(v + 1)),
      java.util.Arrays.asList("H @@not-base64@@", "E")) // terminated commit

    assert(wh.currentVersion(spark, path) == v + 1)
    // the schema-evolution fallback still prunes (recorded schema
    // survived), exactly like the uncorrupted table above
    val nullRead = wh.readWhere(spark, path, col("extra").isNull)
    assert(nullRead.count() == 10)
    assert(nullRead.inputFiles.length == 1,
      "corrupt H cleared the recorded schema: fallback went unpruned")
  }

  test("fastColumnStats: exact count/nonNull/min/max from the manifest " +
    "ALONE — answers survive physically deleting every data file") {
    val (wh, path) = fresh()
    appendRange(wh, path, 10, 50, "2024-06-01")
    appendRange(wh, path, 100, 130, "2024-06-02")
    val st = wh.fastColumnStats(spark, path, "id").get
    assert(st == TxWarehouse.FastColumnStats(70L, 70L, Some(10L), Some(129L)))
    // the proof it never opens data: remove the parquet, ask again
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete()))
    assert(wh.fastColumnStats(spark, path, "id").get == st)
  }

  test("fastColumnStats soundness: string/float columns answer None, " +
    "an all-null file folds as zero contribution, a column absent from " +
    "one file's schema is all-null there, deletes shrink the range") {
    val (wh, path) = fresh()
    appendRange(wh, path, 10, 50, "2024-06-01")
    assert(wh.fastColumnStats(spark, path, "name").isEmpty,
      "string stats are truncatable bounds, not exact values")
    // a second file where id is entirely null and a new column appears
    wh.append(spark, Seq((null.asInstanceOf[java.lang.Long], 7L,
      java.sql.Date.valueOf("2024-06-02")))
      .toDF("id", "extra", "date"), path)
    val st = wh.fastColumnStats(spark, path, "id").get
    assert(st == TxWarehouse.FastColumnStats(41L, 40L, Some(10L), Some(49L)))
    // extra exists only in file 2: file 1 contributes rows, no values
    val ex = wh.fastColumnStats(spark, path, "extra").get
    assert(ex == TxWarehouse.FastColumnStats(41L, 1L, Some(7L), Some(7L)))
    // delete the first partition: range must follow the LIVE set
    wh.deletePartition(spark, path, java.time.LocalDate.parse("2024-06-01"))
    val after = wh.fastColumnStats(spark, path, "id").get
    assert(after == TxWarehouse.FastColumnStats(1L, 0L, None, None))
  }

  test("fastColumnStats follows zero-rewrite renames (logical name in, " +
    "physical stats consulted) and refuses tombstoned columns") {
    val (wh, path) = fresh()
    appendRange(wh, path, 5, 25, "2024-06-01")
    wh.renameColumn(spark, path, "id", "key_id")
    val st = wh.fastColumnStats(spark, path, "key_id").get
    assert(st.min.contains(5L) && st.max.contains(24L))
    wh.dropColumn(spark, path, "key_id")
    assert(wh.fastColumnStats(spark, path, "key_id").isEmpty)
  }

  private def fresh(): (TxWarehouse, String) = freshTable()
}
