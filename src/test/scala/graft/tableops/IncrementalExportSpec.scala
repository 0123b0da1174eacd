package graft.tableops

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}

/** The cursor discipline around readChangesBetween: syncs are
  * exactly-once per version range, crash windows converge on replay,
  * racing exporters cannot double-export, and orphaned staging is
  * reclaimable. The DATA semantics (which rows a range contains) are
  * TableOpsSpec's readChangesBetween test; this spec owns the chain.
  */
class IncrementalExportSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def rows(d: String, vs: Long*) =
    vs.map(v => (v, java.sql.Date.valueOf(d))).toDF("v", "date")

  private def exported(root: String): Set[Long] = {
    val df = IncrementalExport.readExport(spark, root)
    if (df.columns.isEmpty) Set.empty
    else df.select("v").as[Long].collect().toSet
  }

  test("sync tails the table across appends, replaces and empty polls; " +
    "export content equals the table's latest snapshot for append-only " +
    "and the union of increments under replaces") {
    val whRoot = Files.createTempDirectory("graft-ie1-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie1-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")

    // nothing to do on an empty table
    val r0 = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(r0 == IncrementalExport.SyncResult(0, 0, applied = false))
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 0L)

    wh.append(spark, rows("2024-09-01", 1, 2), path) // v1
    wh.append(spark, rows("2024-09-02", 3), path)    // v2
    val r1 = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(r1 == IncrementalExport.SyncResult(0, 2, applied = true))
    assert(exported(exRoot) == Set(1L, 2L, 3L))

    // idempotent poll: nothing new → no chain growth
    val r2 = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(!r2.applied && r2.from == 2 && r2.to == 2)
    assert(IncrementalExport.chain(spark, exRoot).size == 1)

    // dedup-style partition replace, then an append
    wh.overwritePartition(spark, rows("2024-09-01", 10), path,
      java.time.LocalDate.parse("2024-09-01"))      // v3
    wh.append(spark, rows("2024-09-03", 4), path)    // v4
    val r3 = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(r3 == IncrementalExport.SyncResult(2, 4, applied = true))
    // union-of-increments semantics: replaced-away rows from the FIRST
    // increment remain (documented: consumers needing retraction diff
    // snapshots); the new increment carries only the files that became
    // live in (2, 4]
    assert(exported(exRoot) == Set(1L, 2L, 3L, 10L, 4L))
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 4L)
    assert(IncrementalExport.chain(spark, exRoot).map(i => (i.from, i.to))
      == Seq((0L, 2L), (2L, 4L)))
  }

  test("crash window converges: staged data without a published marker " +
    "is invisible, the replay re-exports the same range, and " +
    "vacuumOrphans reclaims the abandoned dir") {
    val whRoot = Files.createTempDirectory("graft-ie2-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie2-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    wh.append(spark, rows("2024-09-01", 1), path) // v1

    // simulate the crash: stage the increment by hand, never publish
    val fs = new Path(exRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = s"$exRoot/data/dead-beef"
    wh.readChangesBetween(spark, path, 0, 1).write.parquet(orphan)
    assert(exported(exRoot).isEmpty, "unreferenced staging must be invisible")

    // replay: a fresh sync exports the same range exactly once
    val r = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(r.applied && r.from == 0 && r.to == 1)
    assert(exported(exRoot) == Set(1L))

    // the orphan is reclaimable once old enough, live dirs are not
    assert(IncrementalExport.vacuumOrphans(spark, exRoot,
      minAgeMillis = Long.MaxValue) == 0L)
    assert(IncrementalExport.vacuumOrphans(spark, exRoot,
      minAgeMillis = -1L) == 1L)
    assert(!fs.exists(new Path(orphan)))
    assert(exported(exRoot) == Set(1L), "vacuum must not touch live data")
  }

  test("racing exporters: the marker chain admits one extension per " +
    "cursor position, so no version range exports twice") {
    val whRoot = Files.createTempDirectory("graft-ie3-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie3-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    wh.append(spark, rows("2024-09-01", 1, 2), path) // v1

    // both exporters observe cursor 0, then race the same extension
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      IncrementalExport.SyncResult]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        start.await()
        results.add(IncrementalExport.sync(spark, wh, path, exRoot)); ()
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val applied = results.asScala.count(_.applied)
    assert(applied == 1, s"exactly one racer must win, got $applied")
    // rows are NOT duplicated and the chain has one link
    val got = IncrementalExport.readExport(spark, exRoot)
      .select("v").as[Long].collect().toSeq
    assert(got.sorted == Seq(1L, 2L))
    assert(IncrementalExport.chain(spark, exRoot).size == 1)
    // losers' staging dirs are already gone (deleted on loss)
    val fs = new Path(exRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new Path(s"$exRoot/data")).length
    assert(dirs == 1, s"losers must clean their staging, found $dirs dirs")
  }

  test("readExportStream tails the export exactly-once across restarts " +
    "and never re-reads rows a chain checkpoint re-packages") {
    val whRoot = Files.createTempDirectory("graft-ie9-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie9-ex").toString
    val sink = Files.createTempDirectory("graft-ie9-sink").toString
    val ckpt = Files.createTempDirectory("graft-ie9-ckpt").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    def drain(): Unit = {
      val q = IncrementalExport.readExportStream(spark, exRoot)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def sunk(): Seq[Long] =
      spark.read.parquet(sink).select("v").as[Long].collect().toSeq.sorted

    wh.append(spark, rows("2024-09-01", 1, 2), path)
    IncrementalExport.sync(spark, wh, path, exRoot)
    drain()
    assert(sunk() == Seq(1L, 2L))

    // restart with the same checkpoint: only the NEW increment lands
    wh.append(spark, rows("2024-09-02", 3), path)
    IncrementalExport.sync(spark, wh, path, exRoot)
    drain()
    assert(sunk() == Seq(1L, 2L, 3L))

    // a chain checkpoint consolidates rows the stream already emitted;
    // the ckpt- dir is outside the stream's glob, so nothing re-emits —
    // and vacuuming the covered increments doesn't disturb the stream
    assert(IncrementalExport.checkpointExport(spark, exRoot) == Some(2L))
    assert(IncrementalExport.vacuumCompacted(spark, exRoot, -1L) == 2L)
    wh.append(spark, rows("2024-09-03", 4), path)
    IncrementalExport.sync(spark, wh, path, exRoot)
    drain()
    assert(sunk() == Seq(1L, 2L, 3L, 4L))
  }

  test("checkpointExport consolidates the chain prefix: content is " +
    "unchanged, covered increments become reclaimable, later syncs " +
    "extend past it, and a second checkpoint supersedes the first") {
    val whRoot = Files.createTempDirectory("graft-ie7-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie7-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    val fs = new Path(exRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Int = fs.listStatus(new Path(s"$exRoot/data")).length
    (1 to 5).foreach { i =>
      wh.append(spark, rows("2024-09-01", i.toLong), path)
      IncrementalExport.sync(spark, wh, path, exRoot)
    }
    assert(dataDirs() == 5)

    assert(IncrementalExport.checkpointExport(spark, exRoot) == Some(5L))
    assert(exported(exRoot) == (1L to 5L).toSet)
    // idempotent: nothing new to cover
    assert(IncrementalExport.checkpointExport(spark, exRoot).isEmpty)
    // committed checkpoint dirs are NOT orphans
    assert(IncrementalExport.vacuumOrphans(spark, exRoot, -1L) == 0L)
    // covered increments reclaim behind the age guard; content intact
    assert(IncrementalExport.vacuumCompacted(spark, exRoot,
      minAgeMillis = Long.MaxValue) == 0L)
    assert(IncrementalExport.vacuumCompacted(spark, exRoot, -1L) == 5L)
    assert(dataDirs() == 1)
    assert(exported(exRoot) == (1L to 5L).toSet)

    // the cursor is untouched: new increments land past the checkpoint
    wh.append(spark, rows("2024-09-01", 6L), path)
    assert(IncrementalExport.sync(spark, wh, path, exRoot).applied)
    assert(exported(exRoot) == (1L to 6L).toSet)
    // a second checkpoint covers the longer chain and reclaims both the
    // new increment's dir and the superseded checkpoint's dir
    assert(IncrementalExport.checkpointExport(spark, exRoot) == Some(6L))
    assert(IncrementalExport.vacuumCompacted(spark, exRoot, -1L) == 2L)
    assert(dataDirs() == 1)
    assert(exported(exRoot) == (1L to 6L).toSet)
  }

  test("schema evolution between syncs: readExport merges increment " +
    "schemas; earlier increments read the new column as null") {
    val whRoot = Files.createTempDirectory("graft-ie6-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie6-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    wh.append(spark, rows("2024-09-01", 1), path)
    IncrementalExport.sync(spark, wh, path, exRoot)
    wh.append(spark,
      Seq((2L, java.sql.Date.valueOf("2024-09-02"), "en"))
        .toDF("v", "date", "lang"), path)
    IncrementalExport.sync(spark, wh, path, exRoot)
    val got = IncrementalExport.readExport(spark, exRoot)
      .select("v", "lang").as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, None), (2L, Some("en"))))
  }

  test("the head hint is advisory: stale, corrupt, or fabricated hints " +
    "never change what the chain resolves to") {
    val whRoot = Files.createTempDirectory("graft-ie5-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie5-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    val fs = new Path(exRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def putHint(s: String): Unit = {
      val out = fs.create(new Path(s"$exRoot/_chain/head"), true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    (1 to 3).foreach { i =>
      wh.append(spark, rows("2024-09-01", i.toLong), path)
      IncrementalExport.sync(spark, wh, path, exRoot)
    }
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 3L)
    // stale (valid older position): walk continues forward to the head
    putHint("1")
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 3L)
    // corrupt: ignored, full walk
    putHint("not a number")
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 3L)
    // fabricated future position: no such marker, ignored (a trusted
    // fake head would silently skip exporting real increments)
    putHint("17")
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 3L)
    // and the next sync repairs the hint as part of its publish
    wh.append(spark, rows("2024-09-01", 4L), path)
    assert(IncrementalExport.sync(spark, wh, path, exRoot).applied)
    assert(IncrementalExport.exportedVersion(spark, exRoot) == 4L)
    assert(IncrementalExport.readExport(spark, exRoot)
      .select("v").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }

  test("the same exporter race on an object-store scheme: marker " +
    "exclusivity comes from the conditional-put publisher, not " +
    "filesystem rename/link atomicity") {
    spark.sparkContext.hadoopConfiguration.set("fs.casobj.impl",
      classOf[CasObjectStoreFileSystem].getName)
    LogPublisher.register("casobj",
      new ConditionalPutPublisher(new InMemoryCasKeySpace))
    val whRoot = Files.createTempDirectory("graft-ie8-wh").toString
    val exRoot = "casobj:" +
      Files.createTempDirectory("graft-ie8-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    wh.append(spark, rows("2024-09-01", 1, 2), path)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      IncrementalExport.SyncResult]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until 4).map { _ =>
      new Thread(() => {
        start.await()
        results.add(IncrementalExport.sync(spark, wh, path, exRoot)); ()
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(_.applied) == 1)
    assert(IncrementalExport.readExport(spark, exRoot)
      .select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // checkpoint + vacuum run through the same publisher seam
    assert(IncrementalExport.checkpointExport(spark, exRoot) == Some(1L))
    assert(IncrementalExport.vacuumCompacted(spark, exRoot, -1L) == 1L)
    assert(IncrementalExport.readExport(spark, exRoot)
      .select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("a 0-row commit syncs as a dir-less chain link and readExport " +
    "still reads the rest") {
    val whRoot = Files.createTempDirectory("graft-ie4-wh").toString
    val exRoot = Files.createTempDirectory("graft-ie4-ex").toString
    val wh = new TxWarehouse(whRoot)
    val path = wh.tablePath("m", "t")
    wh.append(spark, rows("2024-09-01", 1), path)                // v1
    IncrementalExport.sync(spark, wh, path, exRoot)
    // a plain 0-row append is a no-op commit; an empty exactly-once
    // micro-batch still commits (its T line must land) — that is the
    // real-world source of add-less versions
    assert(wh.appendTxn(spark, rows("2024-09-02"), path, "app", 0L)) // v2
    assert(wh.currentVersion(spark, path) == 2L)
    val r = IncrementalExport.sync(spark, wh, path, exRoot)
    assert(r.applied && r.to == 2)
    assert(IncrementalExport.chain(spark, exRoot).last.dir.isEmpty)
    assert(exported(exRoot) == Set(1L))
  }
}
