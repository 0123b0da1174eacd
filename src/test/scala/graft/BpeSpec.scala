package graft

import org.apache.spark.sql.functions._

import graft.operators.TextBpe
import graft.operators.TextBpe.Merge

/** BPE vocabulary learning + application: known merges on the classic
  * Sennrich corpus, encode/learn consistency, and the codegen'd encode
  * expression's behavior on edge rows.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the classic subword example corpus: word → corpus frequency
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("learnBpe reproduces the hand-derived merge sequence") {
    val merges = TextBpe.learnBpe(corpus, "text", numMerges = 5)
    // pair mass: es/st tie at 9 (newest 6 + widest 3) → lex picks (e,s);
    // then (es,t) 9; lo/ow tie at 7 → (l,o); then (lo,w) 7; then the
    // 6-mass tie (e,w)/(n,e) → lex picks (e,w)
    assert(merges == Seq(
      Merge("e", "s", 9), Merge("es", "t", 9), Merge("l", "o", 7),
      Merge("lo", "w", 7), Merge("e", "w", 6)))
  }

  test("first learned merge equals the top pairCounts pair") {
    val top = TextBpe.pairCountsTopK(corpus, "text", k = 1)
      .select("lhs", "rhs", "freq").as[(String, String, Long)].head()
    val first = TextBpe.learnBpe(corpus, "text", numMerges = 1).head
    assert((first.lhs, first.rhs, first.freq) == top)
  }

  test("encode segments seen and UNSEEN words with the learned merges") {
    val merges = TextBpe.learnBpe(corpus, "text", numMerges = 5)
    val out = Seq(("newest lowest", 1)).toDF("text", "one")
      .select(TextBpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    // newest: (e,s)→es, (es,t)→est, (e,w)→ew → [n, ew, est]
    // lowest (never in the corpus): l,o→lo→low; e,s→es→est → [low, est]
    assert(out == Seq("n", "ew", "est", "low", "est"))
  }

  test("encode round-trips content: concatenated subwords rebuild the text") {
    val merges = TextBpe.learnBpe(corpus, "text", numMerges = 3)
    val df = Seq(("a lower bound", 1), ("", 2), ("  spaced   out ", 3))
      .toDF("text", "id")
    val got = df.select(col("id"),
        concat_ws("", TextBpe.encode(col("text"), merges)).as("glued"),
        regexp_replace(col("text"), "\\s+", "").as("squashed"))
      .select(col("glued") === col("squashed")).as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("null text encodes to an empty segmentation") {
    val merges = Seq(Merge("a", "b", 2))
    val out = Seq((java.lang.Long.valueOf(1L), null: String))
      .toDF("id", "text")
      .select(size(TextBpe.encode(col("text"), merges))).as[Int].head()
    assert(out == 0)
  }

  test("empty merge list yields pure code-point segmentation") {
    val out = Seq(("héllo", 1)).toDF("text", "id")
      .select(TextBpe.encode(col("text"), Nil).as("t")).as[Seq[String]].head()
    assert(out == Seq("h", "é", "l", "l", "o"))
  }
}
