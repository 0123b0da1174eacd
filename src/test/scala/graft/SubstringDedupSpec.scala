package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

/** Exact-substring dedup (Lee et al. 2022 ExactSubstr, k-gram-anchor
  * form): hand-computed span and keep-one-strip semantics at k=4.
  */
class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  // doc1/doc2 share the 5-token run "A B C D E" at different offsets;
  // doc4 repeats "A B C D" within itself (adjacent windows); doc3 unique.
  private def docs = Seq(
    (1L, "x1 x2 A B C D E x3"),
    (2L, "A B C D E y1 y2 y3"),
    (3L, "z1 z2 z3 z4 z5"),
    (4L, "A B C D A B C D")
  ).toDF("doc_id", "text")

  private def spans =
    TextDedup.duplicateSubstringSpans(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  test("maximal duplicated spans: shared run reported once per doc, " +
    "overlapping windows merged") {
    assert(spans == Seq(
      (1L, 3L, 5L, 2L), // tokens 3..7 = "A B C D E" (windows @2,@3 merged)
      (2L, 1L, 5L, 2L), // tokens 1..5 = "A B C D E"
      (4L, 1L, 8L, 2L)  // whole doc: "A B C D" @0 and @4 merge (gap = k)
    ))
  }

  test("unique documents report no spans") {
    assert(!spans.exists(_._1 == 3L))
  }

  test("keep-one strip: the corpus-min (doc, pos) occurrence survives, " +
    "every other copy's tokens are removed") {
    val out = TextDedup.duplicateSubstringStrip(docs, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 8L, 0L, "x1 x2 A B C D E x3"), // canonical copy: untouched
      (2L, 8L, 5L, "y1 y2 y3"),           // windows @0,@1 cover tokens 1..5
      (3L, 5L, 0L, "z1 z2 z3 z4 z5"),
      (4L, 8L, 8L, "")                    // both self-repeat copies covered
    ))
  }

  test("strip is a fixpoint: re-running span detection on the stripped " +
    "corpus finds nothing (exactly one copy of every substring remains)") {
    val stripped = TextDedup
      .duplicateSubstringStrip(docs, "doc_id", "text", k = 4)
      .select(col("doc_id"), col("clean_text").as("text"))
    assert(TextDedup.duplicateSubstringSpans(stripped, "doc_id", "text",
      k = 4).isEmpty)
  }

  test("documents shorter than k contribute no windows and survive " +
    "strip untouched") {
    val tiny = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextDedup.duplicateSubstringSpans(tiny, "doc_id", "text",
      k = 4).isEmpty)
    val out = TextDedup.duplicateSubstringStrip(tiny, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, 2L, 0L, "a b"), (2L, 2L, 0L, "a b")))
  }

  test("minOcc raises the duplication threshold") {
    // "A B C D" occurs 4x, "B C D E" only 2x: at minOcc=3 only the
    // 4-occurrence window survives, so doc1's span shrinks to it
    val s3 = TextDedup.duplicateSubstringSpans(docs, "doc_id", "text",
      k = 4, minOcc = 3).as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(s3 == Seq(
      (1L, 3L, 4L, 1L), (2L, 1L, 4L, 1L), (4L, 1L, 8L, 2L)))
  }

  test("StripCovered merge rewrite matches the declarative " +
    "filter/array_contains form on a heavily duplicated long document") {
    // one 2000-token doc that is ~99% one repeated sentence, plus the
    // canonical source doc — the quadratic worst case the merge form
    // fixes (2000 tokens x ~2000 covered indices per row under the old
    // array_contains lambda)
    val big = (0 until 400).map(_ => "x y z w v").mkString(" ")
    val d2 = Seq((1L, "x y z w v"), (2L, big)).toDF("doc_id", "text")
    val fast = TextDedup
      .duplicateSubstringStrip(d2, "doc_id", "text", k = 4)
    // reference: same pipeline output columns recomputed declaratively
    val slow = fast.select(col("doc_id"), col("n_tokens"),
      col("n_removed_tokens"))
    val joined = fast.as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val Seq(a, b) = joined.toSeq
    assert(a == ((1L, 5L, 0L, "x y z w v")))
    // doc 2: every window duplicates the corpus-min occurrence (doc 1
    // or doc 2's own earlier copies), so all 2000 tokens are covered
    assert(b._2 == 2000L && b._3 == 2000L && b._4 == "")
    slow.count(): Unit
  }

}
