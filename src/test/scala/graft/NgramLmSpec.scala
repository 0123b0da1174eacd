package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

/** Count-based trigram LM scoring: hand-computed smoothed conditionals,
  * short-document handling, and the separate-train configuration.
  */
class NgramLmSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed add-one trigram score") {
    // one doc "a b c": c3("a b c")=1, c2("a b")=1, V=3
    // P = (1+1)/(1+3) = 0.5; floor(1e4 * ln 0.5) = floor(-6931.47) = -6932
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = NgramLm.scoreByCorpus(docs, "doc_id", "text")
      .as[(Long, Long, Long)].head()
    assert(out == ((1L, 1L, -6932L)))
  }

  test("repeated trigrams score higher than hapax trigrams") {
    val docs = Seq(
      (1L, "the quick fox"), (2L, "the quick fox"), (3L, "the quick fox"),
      (4L, "zap blor gleep")).toDF("doc_id", "text")
    val rows = NgramLm.scoreByCorpus(docs, "doc_id", "text")
      .select(col("doc_id"), (col("lp_sum_e4") / col("n_ngrams")).as("avg"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) == rows(2L) && rows(2L) == rows(3L))
    assert(rows(1L) > rows(4L), s"common trigram must outscore hapax: $rows")
  }

  test("documents shorter than the n-gram order keep a (0, 0) row") {
    val docs = Seq((1L, "a b c d"), (2L, "two words"), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val out = NgramLm.scoreByCorpus(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(out(1L)._1 == 2L)
    assert(out(2L) == ((0L, 0L)) && out(3L) == ((0L, 0L)) && out(4L) == ((0L, 0L)))
  }

  test("scoring against a separate training corpus: unseen trigrams smooth") {
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq((10L, "x y z")).toDF("doc_id", "text")
    val out = NgramLm.score(docs, train, "doc_id", "text")
      .as[(Long, Long, Long)].head()
    // V(train)=3, trigram unseen, context unseen: P = 1/(0+3)
    val expect = math.floor(10000.0 * math.log(1.0 / 3.0)).toLong
    assert(out == ((10L, 1L, expect)))
  }
}
