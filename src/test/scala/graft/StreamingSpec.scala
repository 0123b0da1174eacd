package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.Streams

case class Ev(ts: Timestamp, user_id: Long, value: Double)
case class Meas(id: String, parserTime: Timestamp, payload: Long)

class StreamingSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("json archive stream: AvailableNow ingests exactly the present files, " +
    "a second run picks up only new ones") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("date", StringType),
      StructField("v", LongType)))

    Files.write(java.nio.file.Paths.get(in, "a.json"),
      """{"id":"m1","date":"2023-05-01","v":1}
        |{"id":"m2","date":"2023-05-01","v":2}""".stripMargin.getBytes)
    val stream = Streams.jsonArchiveStream(spark, schema, in)
    assert(stream.isStreaming)
    Streams.runAvailableNow(stream, out, ckpt)
    assert(spark.read.parquet(out).count() === 2)

    // second batch: only the new file is processed (checkpointed file log)
    Files.write(java.nio.file.Paths.get(in, "b.json"),
      """{"id":"m3","date":"2023-05-02","v":3}""".getBytes)
    Streams.runAvailableNow(
      Streams.jsonArchiveStream(spark, schema, in), out, ckpt)
    val rows = spark.read.parquet(out)
    assert(rows.count() === 3)
    // date-partitioned layout on disk
    assert(new java.io.File(out).listFiles().map(_.getName)
      .count(_.startsWith("date=")) === 2)
  }

  test("json archive stream captures malformed lines instead of dying") {
    val in = Files.createTempDirectory("graft_stream_q_in").toString
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("date", StringType),
      StructField("v", LongType)))
    Files.write(java.nio.file.Paths.get(in, "a.json"),
      """{"id":"m1","date":"2023-05-01","v":1}
        |{"id":"m2","date":"2023-05-01","v":2
        |{"id":"m3","date":"2023-05-01","v":3}""".stripMargin.getBytes)
    implicit val sqlCtx = spark.sqlContext
    val stream = Streams.jsonArchiveStream(spark, schema, in,
      captureCorrupt = true)
    val q = stream.writeStream.format("memory").queryName("quarantine_split")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("quarantine_split")
    assert(rows.count() === 3)
    // good/bad split is a filter on the corrupt column
    assert(rows.filter(rows("_corrupt_record").isNull).count() === 2)
    val bad = rows.filter(rows("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0))
    assert(bad.toSeq === Seq("""{"id":"m2","date":"2023-05-01","v":2"""))
  }

  test("watermarked hourly agg emits finalized windows and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.hourlyEventAgg(mem.toDF(), lateness = "1 hour")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()

    mem.addData(
      Ev(ts("2024-01-01 10:05:00"), 1, 1.0),
      Ev(ts("2024-01-01 10:20:00"), 2, 2.0),
      Ev(ts("2024-01-01 10:40:00"), 1, 3.0))
    q.processAllAvailable()
    // watermark = max(ts) - 1h = 09:40 < 11:00 => window [10,11) not final yet
    assert(spark.table("hourly").count() === 0)

    // advance event time past 12:00 => watermark 11:30 finalizes [10,11)
    mem.addData(Ev(ts("2024-01-01 12:30:00"), 3, 5.0))
    q.processAllAvailable()
    val w10 = spark.table("hourly").filter($"hour" === ts("2024-01-01 10:00:00"))
    assert(w10.count() === 1)
    val r = w10.head()
    assert(r.getAs[Long]("n_events") === 3)
    assert(r.getAs[Long]("sum_value_e4") === 60000L)

    // a row older than the watermark is dropped, not re-aggregated
    mem.addData(Ev(ts("2024-01-01 10:50:00"), 9, 100.0))
    q.processAllAvailable()
    assert(spark.table("hourly")
      .filter($"hour" === ts("2024-01-01 10:00:00")).head()
      .getAs[Long]("n_events") === 3)
    q.stop()
  }

  test("sliding streaming agg: one event lands in every overlapping window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streams.slidingEventAgg(mem.toDF(), "1 hour", "15 minutes",
      lateness = "30 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append).start()

    // one event at 10:20 belongs to windows starting 09:30..10:15
    mem.addData(Ev(ts("2024-01-01 10:20:00"), 1, 1.0))
    // advance the watermark far enough to finalize all four
    mem.addData(Ev(ts("2024-01-01 13:00:00"), 2, 2.0))
    q.processAllAvailable()
    val starts = spark.table("sliding")
      .filter($"n_events" === 1 && $"window_start" < ts("2024-01-01 11:00:00"))
      .select("window_start").as[Timestamp].collect().map(_.toString).sorted
    assert(starts.toSeq == Seq("2024-01-01 09:30:00.0", "2024-01-01 09:45:00.0",
      "2024-01-01 10:00:00.0", "2024-01-01 10:15:00.0"))
    q.stop()
  }

  test("streaming sessionization closes sessions by gap and by watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Streams.sessionizeState(mem.toDS(), gapMs = 30 * 60 * 1000,
        lateness = "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    // open sessions for u1 and u2 — nothing closes yet
    mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")),
      (2L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    assert(spark.table("sessions").count() === 0)

    // u1's 11:30 event exceeds the 30-min gap: session 1 closes in-stream
    mem.addData((1L, ts("2024-01-01 11:30:00")))
    q.processAllAvailable()
    val s1 = spark.table("sessions").as[graft.streaming.UserSession].collect()
    assert(s1.toSeq == Seq(graft.streaming.UserSession(1L,
      ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2)))

    // advance the watermark far past every open session's timeout; the
    // timeouts fire on the NEXT trigger after the watermark update
    mem.addData((3L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 15:01:00")))
    q.processAllAvailable()
    val byUser = spark.table("sessions").as[graft.streaming.UserSession].collect()
      .groupBy(_.user_id)
    // u2's lone-event session and u1's second session closed by timeout
    assert(byUser(2L).toSeq == Seq(graft.streaming.UserSession(2L,
      ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1)))
    assert(byUser(1L).map(s => (s.session_start, s.n_events)).toSet ===
      Set((ts("2024-01-01 10:00:00"), 2L), (ts("2024-01-01 11:30:00"), 1L)))
    q.stop()
  }

  test("streaming sessionization: a late event beyond the open session's " +
    "envelope does not corrupt it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Streams.sessionizeState(mem.toDS(), gapMs = 30 * 60 * 1000,
        lateness = "4 hours")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append).start()

    // open session at 15:00
    mem.addData((1L, ts("2024-01-01 15:00:00")))
    q.processAllAvailable()
    // a late-but-valid event at 14:15 (within the 4h watermark, but more
    // than the 30-min gap BEFORE the open session): must not merge into
    // the 15:00 session — it closes as its own session
    mem.addData((1L, ts("2024-01-01 14:15:00")))
    q.processAllAvailable()
    val late = spark.table("late_sessions").as[graft.streaming.UserSession].collect()
    assert(late.toSeq == Seq(graft.streaming.UserSession(1L,
      ts("2024-01-01 14:15:00"), ts("2024-01-01 14:15:00"), 1)))
    // same-batch late events that chain within the gap merge as one
    // session, exactly as batch would (14:00→14:29 chain below the open
    // session's envelope start): user 3 gets ONE 2-event session later
    mem.addData((3L, ts("2024-01-01 16:00:00")))
    q.processAllAvailable()
    mem.addData((3L, ts("2024-01-01 14:00:00")), (3L, ts("2024-01-01 14:29:00")))
    q.processAllAvailable()
    // a late event WITHIN the gap of the open session extends it downward
    mem.addData((1L, ts("2024-01-01 14:45:00")))
    // close the open session via timeout
    mem.addData((2L, ts("2024-01-01 23:00:00")))
    q.processAllAvailable()
    mem.addData((2L, ts("2024-01-01 23:01:00")))
    q.processAllAvailable()
    val all = spark.table("late_sessions").as[graft.streaming.UserSession].collect()
    assert(all.filter(s => s.user_id == 1L && s.n_events == 2).toSeq ==
      Seq(graft.streaming.UserSession(1L,
        ts("2024-01-01 14:45:00"), ts("2024-01-01 15:00:00"), 2)))
    assert(all.filter(_.user_id == 3L).toSet == Set(
      graft.streaming.UserSession(3L,
        ts("2024-01-01 14:00:00"), ts("2024-01-01 14:29:00"), 2),
      // the open 16:00 session closed later via the watermark timeout
      graft.streaming.UserSession(3L,
        ts("2024-01-01 16:00:00"), ts("2024-01-01 16:00:00"), 1)))
    q.stop()
  }

  test("keyed keep-latest state mirrors W1 dedup across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Meas]
    val deduped = Streams.keepLatestState[Meas, String](
      mem.toDS(), _.id,
      (a, b) => if (a.parserTime.after(b.parserTime)) a else b)
    val q = deduped.writeStream.format("memory").queryName("latest")
      .outputMode(OutputMode.Update).start()

    mem.addData(
      Meas("m1", ts("2023-05-01 10:00:00"), 1),
      Meas("m1", ts("2023-05-01 12:00:00"), 2),
      Meas("m2", ts("2023-05-01 11:00:00"), 7))
    q.processAllAvailable()
    // within one trigger the newer m1 row wins
    val t1 = spark.table("latest").as[Meas].collect().map(m => m.id -> m.payload).toMap
    assert(t1 === Map("m1" -> 2L, "m2" -> 7L))

    // an older row arriving later does NOT displace the stored winner;
    // a newer one does — state persists across triggers
    mem.addData(
      Meas("m1", ts("2023-05-01 09:00:00"), 99),
      Meas("m2", ts("2023-05-01 23:00:00"), 8))
    q.processAllAvailable()
    val all = spark.table("latest").as[Meas].collect()
    // the stale payload 99 never surfaces; m2's state advanced 7 -> 8
    assert(all.filter(_.id == "m1").map(_.payload).toSet === Set(2L))
    assert(all.filter(_.id == "m2").map(_.payload).toSet === Set(7L, 8L))
    q.stop()
  }

  test("stream-static dedup drops rows whose fingerprint is archived") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = Seq("the quick brown fox").toDF("text")
      .select(graft.operators.TextAnalysis.fingerprint($"text").as("__fp"))
    val mem = MemoryStream[String]
    val out = Streams.dropSeenStatic(mem.toDF(),
      graft.operators.TextAnalysis.fingerprint($"value"), seen)
    val q = out.writeStream.format("memory").queryName("nostale")
      .outputMode(OutputMode.Append).start()
    mem.addData("the quick brown fox", "entirely fresh content")
    q.processAllAvailable()
    assert(spark.table("nostale").as[String].collect().toSeq ===
      Seq("entirely fresh content"))
    q.stop()
  }

  test("stream-static bloom semi join: batch ≡ stream on the same rows, " +
    "non-matching keys die at the map-side bloom, false positives are " +
    "removed by the exact join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = (1L to 200L by 13L).toDF("dk")
    val mem = MemoryStream[Long]
    val out = Streams.bloomSemiJoinStream(
      mem.toDF().withColumnRenamed("value", "k"), dim, "k", "dk")
    val q = out.writeStream.format("memory").queryName("bloomsemi")
      .outputMode(OutputMode.Append).start()
    mem.addData(1L to 100L: _*)
    q.processAllAvailable()
    mem.addData(101L to 200L: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bloomsemi").as[Long].collect().toSet
    val want = graft.operators.RuntimeFilter.bloomSemiJoin(
      (1L to 200L).toDF("k"), dim, "k", "dk").as[Long].collect().toSet
    assert(got == want)
    assert(want == (1L to 200L by 13L).toSet)
  }

  test("first-seen state dedups across triggers: earlier batches are the " +
    "seen corpus for later ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Meas]
    // key = fingerprint stand-in (the id); representative = min payload
    val firsts = Streams.firstSeenState[Meas, String](
      mem.toDS(), _.id, (a, b) => if (a.payload <= b.payload) a else b)
    val q = firsts.writeStream.format("memory").queryName("firstseen")
      .outputMode(OutputMode.Append).start()

    mem.addData(
      Meas("f1", ts("2023-05-01 10:00:00"), 5),
      Meas("f1", ts("2023-05-01 11:00:00"), 3),  // same key, min payload wins
      Meas("f2", ts("2023-05-01 11:00:00"), 7))
    q.processAllAvailable()
    val t1 = spark.table("firstseen").as[Meas].collect().map(m => m.id -> m.payload)
    assert(t1.toSet === Set("f1" -> 3L, "f2" -> 7L))

    // a duplicate of f1 in a later trigger is dropped even though its
    // payload would have won within one batch; a fresh key passes
    mem.addData(
      Meas("f1", ts("2023-05-01 12:00:00"), 1),
      Meas("f3", ts("2023-05-01 12:00:00"), 9))
    q.processAllAvailable()
    val all = spark.table("firstseen").as[Meas].collect().map(m => m.id -> m.payload)
    assert(all.toSet === Set("f1" -> 3L, "f2" -> 7L, "f3" -> 9L))
    q.stop()
  }

  test("exactly-once tx sink: a replayed micro-batch cannot double-append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_tx").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val path = wh.tablePath("raw_exp", "events")
    val sink = Streams.exactlyOnceSink(wh, path, appId = "evq")

    val mem = MemoryStream[Ev]
    val withDate = mem.toDF().withColumn("date", to_date(col("ts")))
    val q = withDate.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_tx_ckpt").toString)
      .start()
    mem.addData(Ev(ts("2023-05-01 10:00:00"), 1L, 1.0),
      Ev(ts("2023-05-01 11:00:00"), 2L, 2.0))
    q.processAllAvailable()
    mem.addData(Ev(ts("2023-05-02 10:00:00"), 3L, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(wh.read(spark, path).count() === 3)
    assert(wh.lastTxn(spark, path, "evq") === 1L)

    // crash-recovery replay: the engine re-delivers the LAST batch after
    // a restart — simulate by re-invoking the sink with an already-
    // committed batch id; contents must not change
    val replayed = Seq(Ev(ts("2023-05-02 10:00:00"), 3L, 3.0)).toDF()
      .withColumn("date", to_date(col("ts")))
    sink(replayed, 1L)
    assert(wh.read(spark, path).count() === 3)
    // genuinely new batch ids still append
    sink(replayed, 2L)
    assert(wh.read(spark, path).count() === 4)
    // the skipped replay's files are unreferenced orphans — vacuum with
    // age 0 reclaims them without touching live data
    wh.vacuum(spark, path, keepVersions = 1, minAgeMillis = 0L)
    assert(wh.read(spark, path).count() === 4)
  }

  test("native session windows: gap-merged sessions finalize once the " +
    "watermark passes; separate bursts become separate sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Meas]
    val q = Streams.sessionWindowAgg(
        mem.toDF().toDF("user_id", "ts", "value"), gap = "10 minutes",
        lateness = "5 minutes")
      .writeStream.format("memory").queryName("sesswin")
      .outputMode(OutputMode.Append).start()
    // burst 1: two events 5 min apart; burst 2: 1 h later
    mem.addData(Meas("u1", ts("2024-01-01 10:00:00"), 1),
      Meas("u1", ts("2024-01-01 10:05:00"), 2))
    q.processAllAvailable()
    mem.addData(Meas("u1", ts("2024-01-01 11:30:00"), 3))
    q.processAllAvailable()
    // push the watermark far past burst 2's close
    mem.addData(Meas("u9", ts("2024-01-01 14:00:00"), 0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sesswin")
      .select("user_id", "session_start", "n_events", "sum_value_e4")
      .as[(String, Timestamp, Long, Long)].collect().filter(_._1 == "u1")
      .sortBy(_._2.getTime)
    assert(rows.length == 2, s"got ${rows.toSeq}")
    assert(rows(0)._3 == 2L && rows(0)._4 == 30000L) // 1.0+2.0 at e4
    assert(rows(1)._3 == 1L && rows(1)._4 == 30000L)
  }

  test("bm25 index sink: daily batches keep the materialized index " +
    "equal to the inline ranking over everything ingested; a replayed " +
    "day is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_bm25").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val post = wh.tablePath("ix", "postings")
    val stat = wh.tablePath("ix", "stats")
    val sink = Streams.bm25IndexSink(wh, post, stat, "doc_id", "text")

    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    val day1 = Seq((1L, "apple banana apple", d1), (2L, "apple cherry", d1))
    val day2 = Seq((3L, "banana banana durian", d2), (4L, "durian", d2))
    val mem = MemoryStream[(Long, String, java.sql.Date)]
    val q = mem.toDF().toDF("doc_id", "text", "date")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_bm25_ckpt").toString)
      .start()
    mem.addData(day1: _*)
    q.processAllAvailable()
    mem.addData(day2: _*)
    q.processAllAvailable()
    q.stop()

    val corpus = (day1 ++ day2).map(t => (t._1, t._2)).toDF("doc_id", "text")
    val qs = Seq((1, "apple"), (2, "durian"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score_e4", "rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    val inline = rows(graft.operators.Retrieval.bm25TopK(
      spark, corpus, "doc_id", "text", qs, 3))
    assert(rows(graft.operators.Retrieval.bm25TopKIndexed(
      spark, wh, post, stat, qs, 3)) == inline)
    // crash replay of day 2's batch: replace-per-day keeps it idempotent
    sink(day2.toDF("doc_id", "text", "date"), 99L)
    assert(rows(graft.operators.Retrieval.bm25TopKIndexed(
      spark, wh, post, stat, qs, 3)) == inline)
  }

  test("bm25 index sink refuses a batch with null or unparsable dates " +
    "instead of silently truncating a day to the batch's own rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_stream_bm25bad").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val post = wh.tablePath("ix", "postings")
    val stat = wh.tablePath("ix", "stats")
    val sink = Streams.bm25IndexSink(wh, post, stat, "doc_id", "text")
    // null date (REPLACE-per-day has no day to replace for these rows)
    val nullDate = Seq((1L, "apple", null.asInstanceOf[java.sql.Date]))
      .toDF("doc_id", "text", "date")
    val e1 = intercept[IllegalArgumentException] { sink(nullDate, 0L) }
    assert(e1.getMessage.contains("null/unparsable"))
    // unparsable string date: to_date yields null, same refusal
    val badStr = Seq((2L, "banana", "not-a-date"))
      .toDF("doc_id", "text", "date")
    val e2 = intercept[IllegalArgumentException] { sink(badStr, 1L) }
    assert(e2.getMessage.contains("null/unparsable"))
    // nothing was indexed: the postings table was never created
    assert(!wh.exists(spark, post))
  }

  test("stream-stream interval join: annotations within the lookback " +
    "enrich, unmatched measurements emit null-padded after the " +
    "watermark closes their window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val meas = MemoryStream[(Long, Timestamp)]
    val anns = MemoryStream[(Long, Timestamp, String)]
    val joined = Streams.annotateStream(
      meas.toDF().toDF("id", "ts"),
      anns.toDF().toDF("ann_id", "ann_ts", "geo"),
      lateness = "10 minutes", maxAge = "1 hour")
    val q = joined.select("id", "ts", "geo")
      .writeStream.format("memory").queryName("annjoin")
      .outputMode(OutputMode.Append).start()

    // m1 has an annotation 30 min earlier (in window); m2 has one 2h
    // earlier (outside); m3 has none
    anns.addData((1L, ts("2024-01-01 09:30:00"), "geoA"),
      (2L, ts("2024-01-01 08:00:00"), "geoB"))
    meas.addData((1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:00")),
      (3L, ts("2024-01-01 10:00:00")))
    q.processAllAvailable()
    val matched = spark.table("annjoin").as[(Long, Timestamp, Option[String])]
      .collect().toSet
    assert(matched.contains((1L, ts("2024-01-01 10:00:00"), Some("geoA"))))
    // outer results for m2/m3 wait on the watermark: advance both sides
    // well past the join window
    anns.addData((99L, ts("2024-01-01 13:00:00"), "late"))
    meas.addData((99L, ts("2024-01-01 13:00:00")))
    q.processAllAvailable()
    // one more empty-ish trigger lets the outer rows flush
    anns.addData((98L, ts("2024-01-01 14:00:00"), "late2"))
    meas.addData((98L, ts("2024-01-01 14:00:00")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("annjoin").as[(Long, Timestamp, Option[String])]
      .collect().toSet
    assert(all.contains((2L, ts("2024-01-01 10:00:00"), None)),
      s"out-of-window annotation must null-pad, got $all")
    assert(all.contains((3L, ts("2024-01-01 10:00:00"), None)),
      s"no-annotation row must null-pad, got $all")
    assert(!all.exists(r => r._1 == 2L && r._3.nonEmpty))
  }

  test("streaming CDC apply: keyed change batches merge exactly-once — " +
    "upserts replace, flagged keys delete, a replayed batch is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_cdc").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val path = wh.tablePath("dim", "users")
    val sink = Streams.cdcApplySink(wh, path, Seq("k"), Some("del"), "cdcq")

    def snap(): Map[Long, String] =
      wh.read(spark, path).select("k", "s").as[(Long, String)]
        .collect().toMap

    val mem = MemoryStream[(Long, String, Boolean)]
    val changes = mem.toDF().toDF("k", "s", "del")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
    val q = changes.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_cdc_ckpt").toString)
      .start()
    // batch 0 bootstraps the table
    mem.addData((1L, "a", false), (2L, "b", false))
    q.processAllAvailable()
    assert(snap() === Map(1L -> "a", 2L -> "b"))
    // batch 1: update 1, delete 2, insert 3
    mem.addData((1L, "A", false), (2L, "", true), (3L, "c", false))
    q.processAllAvailable()
    q.stop()
    assert(snap() === Map(1L -> "A", 3L -> "c"))
    assert(wh.lastTxn(spark, path, "cdcq") === 1L)

    // crash-recovery replay of the last batch: merged contents unchanged
    val replayed = Seq((1L, "A", false), (2L, "", true), (3L, "c", false))
      .toDF("k", "s", "del")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
    val v = wh.currentVersion(spark, path)
    sink(replayed, 1L)
    assert(wh.currentVersion(spark, path) === v)
    assert(snap() === Map(1L -> "A", 3L -> "c"))
    // a genuinely new batch applies — and deleting a never-seen key is
    // a tolerated no-op, the changelog idiom for out-of-order deletes
    sink(Seq((9L, "", true), (3L, "C", false)).toDF("k", "s", "del")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))), 2L)
    assert(snap() === Map(1L -> "A", 3L -> "C"))
  }

  test("streaming IVM sink: the materialized aggregate tracks the " +
    "continuously-loaded table (view == batch recompute after every " +
    "batch), exactly-once under a replayed batch AND under a crash " +
    "between the load half and the maintain half") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_stream_ivm").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val src = wh.tablePath("raw", "meas")
    val view = wh.tablePath("views", "by_k")
    val d = java.time.LocalDate.parse("2024-01-01")
    val sink = Streams.ivmSink(wh, src, view, Seq("k"), "n",
      Seq(("sum_v", "v")), "ivq", d)

    def viewSnap(): Map[String, (Long, Long)] =
      wh.read(spark, view).select("k", "n", "sum_v")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
        .toMap
    def recompute(): Map[String, (Long, Long)] =
      wh.read(spark, src).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
        .toMap

    val mem = MemoryStream[(String, Long)]
    val rows = mem.toDF().toDF("k", "v")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
    val q = rows.writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_ivm_ckpt").toString)
      .start()
    mem.addData(("a", 10L), ("b", 1L))
    q.processAllAvailable()
    assert(viewSnap() === Map("a" -> (1L, 10L), "b" -> (1L, 1L)))
    mem.addData(("a", 5L), ("c", 7L))
    q.processAllAvailable()
    mem.addData(("b", 2L), ("b", 3L))
    q.processAllAvailable()
    q.stop()
    assert(viewSnap() === recompute())
    assert(viewSnap() === Map("a" -> (2L, 15L), "b" -> (3L, 6L),
      "c" -> (1L, 7L)))

    // replay of a fully completed batch: both halves no-op
    val srcV = wh.currentVersion(spark, src)
    val viewV = wh.currentVersion(spark, view)
    sink(Seq(("b", 2L), ("b", 3L)).toDF("k", "v")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))), 2L)
    assert(wh.currentVersion(spark, src) === srcV)
    assert(wh.currentVersion(spark, view) === viewV)
    assert(viewSnap() === recompute())

    // injected crash BETWEEN the halves: batch 3's load lands (direct
    // appendTxn, as the sink's first half would), the maintain never
    // runs — the view is now STALE. The engine replays batch 3 through
    // the full sink: the load skips on its marker, the maintain
    // catches the view up over the orphaned append's version window.
    val b3 = Seq(("a", 100L), ("d", 4L)).toDF("k", "v")
      .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
    wh.appendTxn(spark, b3, src, "ivq.load", 3L)
    assert(viewSnap() !== recompute()) // stale: crash window visible
    val loadedV = wh.currentVersion(spark, src)
    sink(b3, 3L)
    assert(wh.currentVersion(spark, src) === loadedV) // load skipped
    assert(viewSnap() === recompute()) // maintain healed
    assert(viewSnap()("a") === (3L, 115L))
    assert(viewSnap()("d") === (1L, 4L))
  }

  test("streaming transitions emit consecutive steps per user and match " +
    "the batch operator on an in-order stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.transitionState(mem.toDS(), lateness = "1 hour")
      .writeStream.format("memory").queryName("steps")
      .outputMode(OutputMode.Append).start()

    mem.addData(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "view"))
    q.processAllAvailable()
    // u1: view->click this trigger; u2 has no second event yet
    val s1 = spark.table("steps").as[graft.streaming.TransitionStep]
      .collect().toSet
    assert(s1 === Set(graft.streaming.TransitionStep(1L, "view", "click",
      ts("2024-01-01 10:01:00").getTime)))

    // the state bridges triggers: u1 click->purchase, u2 view->click
    mem.addData(
      (1L, ts("2024-01-01 10:05:00"), 4L, "purchase"),
      (2L, ts("2024-01-01 10:06:00"), 5L, "click"))
    q.processAllAvailable()
    val s2 = spark.table("steps").as[graft.streaming.TransitionStep]
      .collect().toSet
    assert(s2 === Set(
      graft.streaming.TransitionStep(1L, "view", "click", ts("2024-01-01 10:01:00").getTime),
      graft.streaming.TransitionStep(1L, "click", "purchase", ts("2024-01-01 10:05:00").getTime),
      graft.streaming.TransitionStep(2L, "view", "click", ts("2024-01-01 10:06:00").getTime)))
    q.stop()

    // the emitted step stream aggregates to EXACTLY the batch operator's
    // counts for an in-order stream
    val batch = graft.operators.EventAnalytics.transitionCounts(
      Seq(
        (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
        (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
        (1L, ts("2024-01-01 10:05:00"), 4L, "purchase"),
        (2L, ts("2024-01-01 10:00:00"), 3L, "view"),
        (2L, ts("2024-01-01 10:06:00"), 5L, "click")
      ).toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    val streamed = s2.groupBy(t => (t.src, t.dst)).map { case ((a, b), v) =>
      (a, b, v.size.toLong, v.map(_.user_id).toSet.size.toLong) }.toSet
    assert(streamed === batch)
  }

  test("streaming transitions: a timestamp tie inside one trigger is " +
    "ordered by event id, and a within-watermark late event emits its " +
    "local step") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.transitionState(mem.toDS(), lateness = "2 hours")
      .writeStream.format("memory").queryName("steps_tie")
      .outputMode(OutputMode.Append).start()

    // tie on ts: id 6 (click) precedes id 7 (purchase)
    mem.addData(
      (3L, ts("2024-01-02 08:00:00"), 7L, "purchase"),
      (3L, ts("2024-01-02 08:00:00"), 6L, "click"))
    q.processAllAvailable()
    assert(spark.table("steps_tie").as[graft.streaming.TransitionStep]
      .collect().toSet === Set(graft.streaming.TransitionStep(3L,
        "click", "purchase", ts("2024-01-02 08:00:00").getTime)))

    // a late-but-within-watermark event older than the state sorts in
    // front and emits its step to the state element (append mode keeps
    // the earlier emission; documented divergence)
    mem.addData((3L, ts("2024-01-02 07:30:00"), 5L, "view"))
    q.processAllAvailable()
    assert(spark.table("steps_tie").as[graft.streaming.TransitionStep]
      .collect().toSet === Set(
        graft.streaming.TransitionStep(3L, "click", "purchase", ts("2024-01-02 08:00:00").getTime),
        graft.streaming.TransitionStep(3L, "view", "purchase", ts("2024-01-02 08:00:00").getTime)))
    q.stop()
  }

  test("streaming pagerank feed: the maintained edge-count table on an " +
    "in-order stream yields ranks bit-identical to the batch " +
    "ev_pagerank shape") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:05:00"), 3L, "purchase"),
      (2L, ts("2024-01-01 10:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 10:06:00"), 5L, "click"),
      (2L, ts("2024-01-01 10:07:00"), 6L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 7L, "view"),
      (3L, ts("2024-01-01 11:02:00"), 8L, "click"))

    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    // the documented requirement: the cross-operator watermark check is
    // conservative — the downstream count state never evicts, so fMGWS
    // late emissions are still counted (see pageRankEdgeCounts scaladoc)
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prevCheck = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
      val q = Streams.pageRankEdgeCounts(mem.toDS(), lateness = "1 hour")
        .writeStream.format("memory").queryName("pr_edges")
        .outputMode(OutputMode.Update).start()
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      q.stop()
    } finally prevCheck match {
      case Some(v) => spark.conf.set(checkKey, v)
      case None => spark.conf.unset(checkKey)
    }

    // Update-mode memory sink holds every emitted revision of a key;
    // counts are monotone, so current = max per (src, dst)
    val current = spark.table("pr_edges")
      .groupBy($"src", $"dst")
      .agg(org.apache.spark.sql.functions.max($"n_transitions")
        .as("n_transitions"))

    val streamRanks = graft.operators.GraphAlgos.pageRank(
      current, "src", "dst", "n_transitions", iters = 3)
      .as[(String, Long)].collect().toMap
    val batchRanks = graft.operators.GraphAlgos.pageRank(
      graft.operators.EventAnalytics.transitionCounts(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_type", "event_id"),
      "src", "dst", "n_transitions", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(streamRanks == batchRanks)
    assert(streamRanks.nonEmpty)
  }

  test("streaming last-touch attribution: on an in-order stream the " +
    "emitted attributions equal the batch ev_attribution window rows " +
    "exactly (channel per conversion, 7-day lookback, direct fallback)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "click"),
      (3L, ts("2024-01-01 08:00:00"), 6L, "view"),
      // trigger 2: the conversions
      (1L, ts("2024-01-01 10:05:00"), 3L, "purchase"), // click claims it
      (1L, ts("2024-01-01 10:06:00"), 4L, "purchase"), // same touch again
      (2L, ts("2024-01-01 09:30:00"), 5L, "purchase"), // no touch: direct
      (3L, ts("2024-01-10 09:00:00"), 7L, "purchase")) // 9 days: direct

    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = Streams.lastTouchState(mem.toDS(), lateness = "1 hour")
      .writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("attrib")
      .as[graft.streaming.AttributedConversion].collect().toSet

    // the batch ev_attribution window, verbatim, over the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = rows.toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("lt", last(
        when($"event_type" =!= "purchase",
          struct($"ts".as("t_ts"), $"event_id".as("t_id"),
            $"event_type".as("t_type"))),
        ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .withColumn("channel",
        when($"lt".isNull ||
          $"lt.t_ts" < $"ts" - expr("INTERVAL 7 DAYS"), lit("direct"))
          .otherwise($"lt.t_type"))
      .select($"user_id", $"event_id", $"ts", $"channel")
      .as[(Long, Long, Timestamp, String)].collect()
      .map(r => graft.streaming.AttributedConversion(
        r._1, r._2, r._3.getTime, r._4)).toSet
    assert(got == batch)
    assert(got.map(c => c.conversion_id -> c.channel).toMap ==
      Map(3L -> "click", 4L -> "click", 5L -> "direct", 7L -> "direct"))
  }

  test("streaming KMV theta sketch: after all triggers, every key's " +
    "bottom-k state is bit-identical to the batch sketch over the same " +
    "ids (KMV merge is lossless), estimates included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, xxhash64}

    val mask = lit((1L << 52) - 1L)
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.Streams.kmvState(
        mem.toDS().select(col("_1"),
          xxhash64(col("_2")).bitwiseAND(mask).as("v")).as[(String, Long)],
        k = 64)
      .toDF("key", "vals", "theta", "est")
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Update).start()

    mem.addData(("a", 5L), ("a", 6L), ("b", 5L))
    q.processAllAvailable()
    mem.addData((1L to 3000L).map(i => ("a", i)) :+ (("b", 9L)): _*)
    q.processAllAvailable()
    q.stop()

    // per key: the LAST emitted row (largest vals set — bottom-k only
    // tightens) must equal the batch sketch of all that key's ids
    val streamed = spark.table("kmv_stream")
      .as[(String, Seq[Long], Long, Long)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2.size) }
    val batch = Seq(("a", (1L to 3000L) ++ Seq(5L, 6L)), ("b", Seq(5L, 9L)))
      .flatMap { case (k, ids) => ids.map(k -> _) }.toDF("g", "kk")
    val bsk = graft.operators.ThetaSketch.kmvSketch(batch, "g", "kk", k = 64)
      .as[(String, Seq[Long], Long)].collect().map(r => r._1 -> r).toMap
    assert(streamed("a")._2 == bsk("a")._2)
    assert(streamed("b")._2 == bsk("b")._2)
    // exhaustive key: est is the exact distinct count
    assert(streamed("b")._4 == 2L)
    // sketched key: same integer estimate the batch grid would give
    val domain = graft.operators.ThetaSketch.Domain
    val thetaA = streamed("a")._2.last
    assert(streamed("a")._3 == thetaA)
    assert(streamed("a")._4 == 63L * domain / thetaA)
    // the emitted per-key state sketches RE-MERGE downstream through
    // the warehouse aggregate: kmv_merge_vals over the final vals
    // arrays equals the direct batch sketch of the GLOBAL key union —
    // streaming state, persisted sketches, and batch construction are
    // one family
    val remerged = streamed.values.toSeq.map(_._2).toDF("vals")
      .agg(graft.functions.KmvMergeVals.kmvMergeVals(col("vals"), 64).as("mk"))
      .select(col("mk.vals")).as[Seq[Long]].head()
    val global = graft.operators.ThetaSketch.kmvSketch(
      batch.select(lit("all").as("g"), col("kk")), "g", "kk", k = 64)
      .as[(String, Seq[Long], Long)].head()
    assert(remerged == global._2)
  }

  test("streaming KMV states INTERSECT downstream: the emitted per-key " +
    "sketches fed through the batch theta formula give the same " +
    "estimate the batch operator computes on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, lit, xxhash64}

    val mask = lit((1L << 52) - 1L)
    val aIds = (1L to 900L); val bIds = (601L to 1500L) // overlap 300
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.Streams.kmvState(
        mem.toDS().select(col("_1"),
          xxhash64(col("_2")).bitwiseAND(mask).as("v")).as[(String, Long)],
        k = 128)
      .toDF("key", "vals", "theta", "est")
      .writeStream.format("memory").queryName("kmv_isect")
      .outputMode(OutputMode.Update).start()
    mem.addData(aIds.map("a" -> _) ++ bIds.map("b" -> _): _*)
    q.processAllAvailable()
    q.stop()

    val st = spark.table("kmv_isect")
      .as[(String, Seq[Long], Long, Long)].collect()
      .groupBy(_._1).map { case (k, r) => k -> r.maxBy(_._2.size) }
    val theta = math.min(st("a")._3, st("b")._3)
    val bSet = st("b")._2.toSet
    val matched = st("a")._2.count(v => v < theta && bSet(v)).toLong
    val domain = graft.operators.ThetaSketch.Domain
    val streamedEst = matched * domain / theta
    val batchRow = graft.operators.ThetaSketch.intersectEstimate(
      (aIds.map("a" -> _) ++ bIds.map("b" -> _)).toDF("g", "kk"),
      "g", "kk", "a", "b", k = 128).collect().head
    assert(streamedEst == batchRow.getAs[Long]("est_intersect"))
    assert(batchRow.getAs[Long]("exact_intersect") == 300L)
  }

  test("streaming HLL distinct: after all triggers, every key's " +
    "(nnz, est) equals the batch sketch over the same ids — and the " +
    "last trigger's state saw every prefix (register monotonicity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, xxhash64}

    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.Streams.hllDistinctState(
        mem.toDS().select(col("_1"),
          xxhash64(col("_2")).as("h")).as[(String, Long)], p = 9)
      .toDF("key", "nnz", "est_raw")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(OutputMode.Update).start()

    // three triggers, overlapping ids within and across keys
    mem.addData(("a", 1L), ("a", 2L), ("b", 1L))
    q.processAllAvailable()
    mem.addData(("a", 2L), ("a", 3L), ("b", 100L), ("b", 1L))
    q.processAllAvailable()
    mem.addData((1L to 4000L).map(i => ("a", i)): _*)
    q.processAllAvailable()

    // Update mode re-emits per trigger; registers only grow, so nnz and
    // est are monotone per key and the final state is the per-key max —
    // no reliance on sink row order
    val streamed = spark.table("hll_stream").as[(String, Int, Long)]
      .collect()
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(r => (r._2, r._3))
      }
    val batch = Seq(("a", (1L to 4000L) ++ Seq(2L, 3L)), ("b", Seq(1L, 100L, 1L)))
      .flatMap { case (k, ids) => ids.map(k -> _) }
      .toDF("key", "id")
      .select(col("key"), xxhash64(col("id")).as("h"))
      .groupBy(col("key"))
      .agg(graft.functions.HllRegisters.hllRegisters(col("h"), 9).as("sk"))
      .select(col("key"), col("sk.nnz"), col("sk.est_raw"))
      .as[(String, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(streamed("a") == batch("a"))
    assert(streamed("b") == batch("b"))
    q.stop()
  }

  test("streaming CMS frequency: after all triggers, every key's grid " +
    "equals the batch sketch over the same ids (shared observe => " +
    "counters cannot drift)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, xxhash64}

    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.Streams.cmsFreqState(
        mem.toDS().select(col("_1"),
          xxhash64(col("_2")).as("h")).as[(String, Long)], d = 4, logW = 6)
      .toDF("key", "n_total", "counters")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode(OutputMode.Update).start()

    mem.addData(("a", 1L), ("a", 2L), ("b", 1L))
    q.processAllAvailable()
    mem.addData(("a", 2L), ("b", 7L), ("b", 1L))
    q.processAllAvailable()
    mem.addData((1L to 900L).map(i => ("a", i % 50)): _*)
    q.processAllAvailable()

    // counters only grow, so the final state per key is the row with
    // max n_total — no reliance on sink row order
    val streamed = spark.table("cms_stream")
      .as[(String, Long, Seq[(Int, Int, Long)])].collect()
      .groupBy(_._1).map { case (k, rows) =>
        val last = rows.maxBy(_._2)
        k -> (last._2, last._3.toSet)
      }
    val batch = Seq(
      ("a", Seq(1L, 2L, 2L) ++ (1L to 900L).map(_ % 50)),
      ("b", Seq(1L, 7L, 1L)))
      .flatMap { case (k, ids) => ids.map(k -> _) }
      .toDF("key", "id")
      .select(col("key"), xxhash64(col("id")).as("h"))
      .groupBy(col("key"))
      .agg(graft.functions.CmsCounters.cmsCounters(col("h"), 4, 6).as("sk"))
      .select(col("key"), col("sk.n_total"), col("sk.counters"))
      .as[(String, Long, Seq[(Int, Int, Long)])].collect()
      .map(r => r._1 -> (r._2, r._3.toSet)).toMap
    assert(streamed("a") == batch("a"))
    assert(streamed("b") == batch("b"))
    q.stop()
  }
}
