package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Keep-set dedup semantics per SURVEY.md §7.3 / reference cloud/bq/ops.go:190-218. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  // (id, date, time, payload)
  private def fixture = Seq(
    ("a", d("2024-01-01"), ts("2024-01-01 10:00:00"), "old"),
    ("a", d("2024-01-01"), ts("2024-01-01 12:00:00"), "new"),
    ("b", d("2024-01-01"), ts("2024-01-01 11:00:00"), "tie1"),
    ("b", d("2024-01-01"), ts("2024-01-01 11:00:00"), "tie2"),
    ("a", d("2024-01-02"), ts("2024-01-02 09:00:00"), "otherdate"),
    ("c", d("2024-01-01"), ts("2024-01-01 08:00:00"), "single")
  ).toDF("id", "date", "time", "payload")

  test("latest parser.Time wins per (id, date)") {
    val out = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    val aRows = out.filter($"id" === "a" && $"date" === d("2024-01-01"))
      .select("payload").as[String].collect()
    assert(aRows.toSeq == Seq("new"))
  }

  test("ALL rows tying on the winning time survive (keep-set NOT EXISTS semantics)") {
    val out = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    val bRows = out.filter($"id" === "b").select("payload").as[String].collect().sorted
    assert(bRows.toSeq == Seq("tie1", "tie2"))
  }

  test("other dates of the same id are independent partitions") {
    val out = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    assert(out.filter($"payload" === "otherdate").count() == 1)
    assert(out.count() == 5) // 6 in, only "old" removed
  }

  test("dedup is idempotent") {
    val once = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    val twice = Dedup.keepLatest(once, Seq("id", "date"), col("time"))
    assert(twice.count() == once.count())
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("deletedSet is the exact complement of the kept set") {
    val kept = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    val deleted = Dedup.deletedSet(fixture, Seq("id", "date"), col("time"))
    assert(kept.count() + deleted.count() == fixture.count())
    assert(deleted.select("payload").as[String].collect().toSeq == Seq("old"))
  }

  test("isClean: true only when no group would shrink") {
    assert(!Dedup.isClean(fixture, Seq("id", "date"), col("time")))
    val clean = Dedup.keepLatest(fixture, Seq("id", "date"), col("time"))
    // ties remain but share one time value per group => clean
    assert(Dedup.isClean(clean, Seq("id", "date"), col("time")))
  }

  test("rankedFirst keeps exactly one row per key in priority order") {
    val out = Dedup.rankedFirst(fixture,
      Seq(col("id"), col("date")),
      Seq(col("time").desc, col("payload").asc))
    assert(out.count() == 4) // one per (id,date) group
    val b = out.filter($"id" === "b").select("payload").as[String].collect()
    assert(b.toSeq == Seq("tie1")) // tie broken by payload asc
  }

  test("rankedFirstAgg matches the window form under a total mixed ordering") {
    // every invertible direction in one ordering: desc timestamp, asc
    // string, desc double, desc int, asc long tiebreaker (total order)
    val rows = for (i <- 0 until 500) yield (
      s"id${i % 23}", d("2024-01-0" + (1 + i % 3)),
      ts(f"2024-01-01 ${i % 24}%02d:00:00"),
      s"p${i % 7}", (i % 11).toDouble / 2, i % 5, i.toLong)
    val df = rows.toDF("id", "date", "time", "payload", "score", "rank", "seq")
    val ordering = Seq(col("time").desc, col("payload").asc,
      col("score").desc, col("rank").desc, col("seq").asc)
    val keys = Seq(col("id"), col("date"))
    val win = Dedup.rankedFirst(df, keys, ordering).collect().toSet
    val agg = Dedup.rankedFirstAgg(df, keys, ordering).collect().toSet
    assert(agg == win)
    assert(agg.size == df.select("id", "date").distinct().count())
    // and the aggregate form really aggregates: no window/sort exchange
    val plan = Dedup.rankedFirstAgg(df, keys, ordering)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("rankedFirstAgg falls back to the window form on a desc string") {
    val ordering = Seq(col("payload").desc, col("time").asc)
    val keys = Seq(col("id"), col("date"))
    val win = Dedup.rankedFirst(fixture, keys, ordering).collect().toSet
    val agg = Dedup.rankedFirstAgg(fixture, keys, ordering).collect().toSet
    assert(agg == win)
  }

  test("bestRepresentatives keeps the highest-score member per cluster, " +
    "ties to the lowest id, with correct cluster sizes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "label")
    val docs = Seq((1L, 10L), (2L, 40L), (3L, 40L), (7L, 5L), (8L, 5L),
      (9L, 99L)) // 9 is in no cluster — must not appear
      .toDF("doc_id", "n_chars")
    val out = graft.operators.TextDedup.bestRepresentatives(
      clusters, docs, "doc_id", "n_chars")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (1L, 2L, 40L, 3L), // 2 and 3 tie at 40 -> lowest id 2 wins
      (7L, 7L, 5L, 2L)))
  }

  test("minhashCalibrationPairs: exact duplicates estimate 10000 " +
    "exactly; near-dups' 32-lane estimate tracks true jaccard within " +
    "the sketch's statistical noise") {
    import graft.operators.TextDedup
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 55).map(i => s"tok$i") ++
      (100 to 104).map(i => s"alt$i")).mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, near))
      .toDF("doc_id", "text")
    val rows = TextDedup.minhashCalibrationPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val (j12, e12, err12) = rows((1L, 2L))
    assert(j12 == 10000L && e12 == 10000L && err12 == 0L)
    val (j13, e13, err13) = rows((1L, 3L))
    assert(j13 > 7000L && j13 < 10000L)
    // 32 lanes: sigma ~ sqrt(p(1-p)/32) ~ 0.06 -> allow 4 sigma
    assert(err13 <= 2500L, s"est $e13 vs true $j13")
    assert(err13 == math.abs(e13 - j13))
  }
}