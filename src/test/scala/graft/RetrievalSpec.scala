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
}
