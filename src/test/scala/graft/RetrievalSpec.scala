package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** BM25 retrieval: ranking sanity on a hand-built corpus and the
  * bounded-output contract.
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),     // tf(apple)=2
    (2L, "apple cherry"),           // tf(apple)=1
    (3L, "banana banana banana"),
    (4L, "durian"),                 // rare term
    (5L, "apple banana cherry durian apple banana cherry durian") // long doc
  ).toDF("doc_id", "text")

  test("higher tf wins; rare terms outscore common ones; k bounds output") {
    val out = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq((1, "apple"), (2, "durian")), k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q1 = out.filter(_._1 == 1).sortBy(_._4)
    // doc 1 (tf=2, short) must beat doc 2 (tf=1) and doc 5 (tf=2 but long)
    assert(q1.head._2 == 1L, q1.mkString(","))
    assert(q1.map(_._2).toSet == Set(1L, 2L, 5L))
    val q2 = out.filter(_._1 == 2).sortBy(_._4)
    assert(q2.map(_._2).toSet == Set(4L, 5L))
    // the rare term scores doc 4 higher than any apple score: df=2 of 5
    // vs df=3 of 5, and doc 4 is one term long
    assert(q2.head._2 == 4L)
    assert(q2.head._3 > q1.head._3)
    assert(out.count(_._1 == 1) <= 3 && out.count(_._1 == 2) <= 3)
  }

  test("query terms absent from the corpus contribute nothing; empty-hit " +
    "queries return no rows") {
    val out = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq((7, "zzz qqq")), k = 5)
    assert(out.count() == 0)
  }

  test("plan: query side broadcasts and top-k ships through the bounded heap") {
    val plan = Retrieval.bm25TopK(spark, corpus, "doc_id", "text",
      Seq((1, "apple banana")), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }

  // ---- hybrid RRF fusion ----

  /** Embedding side for the hybrid tests: doc 1's vector is near-parallel
    * to doc 2's and orthogonal to the rest, so the dense arm ranks 2 first
    * for probe 1 regardless of what BM25 says.
    */
  private def embs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.0f, 0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("hybrid RRF: agreement across arms outranks a single-arm hit; " +
    "self is excluded; contributions are the quantized per-arm sum") {
    val out = Retrieval.hybridRrfTopK(corpus, "doc_id", "text",
      embs, "vec_id", "embedding", probeMax = 2L, kEach = 3, kOut = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q1 = out.filter(_._1 == 1L).sortBy(_._4)
    // probe 1 never retrieves itself
    assert(!q1.exists(_._2 == 1L), q1.mkString(","))
    // doc 2 appears in BOTH arms for probe 1 (shares "apple" lexically,
    // near-parallel vector) — its two contributions beat every
    // single-arm doc's one
    assert(q1.head._2 == 2L, q1.mkString(","))
    // every fused score is a sum of floor(1e6/(60+r)) terms, r ∈ [1,3]
    val allowed = (1 to 3).map(r => 1000000L / (60 + r)).toSet
    q1.foreach { case (_, _, s, _) =>
      val ok = allowed.contains(s) ||
        allowed.exists(a => allowed.exists(b => a + b == s))
      assert(ok, s"score $s is not a valid 1- or 2-arm RRF sum")
    }
  }

  test("hybrid RRF: kOut bounds each probe's output and ranks are dense " +
    "1..n by (score desc, doc asc)") {
    val out = Retrieval.hybridRrfTopK(corpus, "doc_id", "text",
      embs, "vec_id", "embedding", probeMax = 3L, kEach = 2, kOut = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.length <= 3)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      // rank order is (rrf desc, doc asc)
      val resorted = rows.sortBy(t => (-t._3, t._2)).map(_._2).toSeq
      assert(sorted.map(_._2).toSeq == resorted)
    }
  }

  test("hybrid RRF plan: no window sort — fusion tops out through the " +
    "bounded heap; corpus-side joins broadcast") {
    val plan = Retrieval.hybridRrfTopK(corpus, "doc_id", "text",
      embs, "vec_id", "embedding", probeMax = 2L, kEach = 2, kOut = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("materialized index: incremental per-day builds compose to the " +
    "inline ranking exactly, and the posting read opens only the files " +
    "the query terms' ranges overlap") {
    val root = java.nio.file.Files.createTempDirectory("graft-bm25ix").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val post = wh.tablePath("ix", "postings")
    val stat = wh.tablePath("ix", "stats")
    // two ingest days; postings range-clustered on term (4 files/day)
    Retrieval.indexDocs(spark, wh, post, stat,
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      java.time.LocalDate.parse("2024-01-01"), termFiles = 4)
    Retrieval.indexDocs(spark, wh, post, stat,
      corpus.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
      java.time.LocalDate.parse("2024-01-02"), termFiles = 4)
    val qs = Seq((1, "apple"), (2, "durian cherry"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score_e4", "rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    val inline = rows(Retrieval.bm25TopK(spark, corpus, "doc_id", "text", qs, 3))
    val indexed = rows(Retrieval.bm25TopKIndexed(spark, wh, post, stat, qs, 3))
    assert(indexed == inline, s"indexed=$indexed inline=$inline")
    // pruning: a single-term probe must not open every posting file
    val total = wh.read(spark, post).inputFiles.length
    val probed = wh.readWhere(spark, post, col("term").isin("durian"))
      .inputFiles.length
    assert(probed < total, s"term-range pruning inert: $probed of $total")
    // idempotent re-ingest: replaying a day replaces, never doubles
    Retrieval.indexDocs(spark, wh, post, stat,
      corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      java.time.LocalDate.parse("2024-01-01"), termFiles = 4)
    assert(rows(Retrieval.bm25TopKIndexed(spark, wh, post, stat, qs, 3))
      == inline, "re-ingest must be idempotent")
  }

  test("change-feed-driven maintenance: increments through appends, a " +
    "rewrite, and a deletion-vector correction equal a from-scratch " +
    "index of the final corpus; replays are no-ops") {
    val D1 = java.sql.Date.valueOf("2024-01-01")
    val day = java.time.LocalDate.parse("2024-01-01")
    val root = java.nio.file.Files.createTempDirectory("graft-bm25inc").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val docsT = wh.tablePath("c", "docs")
    val post = wh.tablePath("ix", "postings")
    val stat = wh.tablePath("ix", "stats")
    def incr() = Retrieval.indexDocsIncremental(spark, wh, post, stat,
      docsT, "doc_id", "text", "app", day)
    // v1: bootstrap = full build
    wh.append(spark, corpus.filter(col("doc_id") <= 2)
      .withColumn("date", lit(D1)), docsT)
    assert(incr())
    assert(!incr(), "at head: increment must be a no-op")
    // v2: append more docs; v3: REWRITE doc 1's text (merge upsert —
    // old terms must vanish, new ones appear); v4: MoR-delete doc 2
    wh.append(spark, corpus.filter(col("doc_id") > 2)
      .withColumn("date", lit(D1)), docsT)
    wh.mergeInto(spark,
      Seq((1L, "melon melon fig")).toDF("doc_id", "text")
        .withColumn("date", lit(D1)),
      docsT, Seq("doc_id"))
    wh.deleteWhereMor(spark, docsT, col("doc_id") === 2L)
    assert(incr())
    // reference: from-scratch index over the FINAL corpus
    val finalCorpus = wh.read(spark, docsT).select("doc_id", "text")
    val root2 = java.nio.file.Files.createTempDirectory("graft-bm25inc2").toString
    val wh2 = new graft.tableops.TxWarehouse(root2)
    val (post2, stat2) = (wh2.tablePath("ix", "p"), wh2.tablePath("ix", "s"))
    Retrieval.indexDocs(spark, wh2, post2, stat2, finalCorpus,
      "doc_id", "text", day)
    val qs = Seq((1, "apple"), (2, "durian cherry"), (3, "melon"))
    def rows(w: graft.tableops.TxWarehouse, p: String, st: String) =
      Retrieval.bm25TopKIndexed(spark, w, p, st, qs, 3)
        .select("query_id", "doc_id", "score_e4", "rank")
        .as[(Int, Long, Long, Int)].collect().toSet
    assert(rows(wh, post, stat) == rows(wh2, post2, stat2))
    // the postings tables agree row-for-row, not just through the query
    val a = wh.read(spark, post).select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    val b = wh2.read(spark, post2).select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(a == b, s"postings diverged: ${a -- b} vs ${b -- a}")
  }
}
