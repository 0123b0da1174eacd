package graft

import org.apache.spark.sql.functions._

import graft.functions.UnigramSegment
import graft.operators.UnigramLm

/** Unigram-LM tokenizer (Kudo 2018, Viterbi-EM variant): hand-computed
  * segmentation tie-breaks and a hand-traced seed + EM round.
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(word: String, pieces: Seq[(String, Long)],
      charCost: Long = 50000L, maxLen: Int = 5): Seq[String] = {
    import scala.jdk.CollectionConverters._
    UnigramSegment.segment(word, UnigramSegment.costMap(pieces), maxLen,
      charCost).asScala.toSeq
  }

  test("Viterbi picks the min-cost segmentation") {
    val v = Seq(("ta", 40000L), ("ble", 42000L), ("table", 70000L))
    // [table]=70000 beats [ta][ble]=82000 beats chars 5*50000
    assert(seg("table", v) == Seq("table"))
    // without the whole-word piece, the two-piece split wins
    assert(seg("table", v.take(2)) == Seq("ta", "ble"))
  }

  test("cost tie broken by fewer pieces") {
    // [table]=75000 n=1 ties [tab][le]=36000+39000 n=2 → fewer pieces
    val v = Seq(("table", 75000L), ("tab", 36000L), ("le", 39000L))
    assert(seg("table", v) == Seq("table"))
  }

  test("(cost, n) tie broken by the longest LAST piece") {
    // [sm][all]=85000 n=2 ties [sma][ll]=85000 n=2; traceback takes the
    // largest final k → "all"
    val v = Seq(("sm", 40000L), ("all", 45000L), ("sma", 45000L),
      ("ll", 40000L))
    assert(seg("small", v) == Seq("sm", "all"))
  }

  test("character fallback competes even for in-vocabulary characters") {
    // 'e' in the map at 60000 but the fallback arm is 50000 → fallback
    assert(seg("e", Seq(("e", 60000L))) == Seq("e"))
    val v = Seq(("e", 60000L))
    val costs = UnigramSegment.costMap(v)
    // DP value must be the 50000 fallback, not the 60000 map cost:
    // two 'e's cost 100000, cheaper than via-map 120000 — observable
    // through a piece that undercuts one path only
    assert(seg("ee", v) == Seq("e", "e"))
    // and a cheaper in-map char wins over the fallback
    assert(seg("a", Seq(("a", 30000L))) == Seq("a"))
    assert(costs.size == 1)
  }

  test("out-of-vocabulary characters segment as themselves") {
    assert(seg("dup", Seq(("table", 70000L))) == Seq("d", "u", "p"))
  }

  test("maxLen bounds the candidate window") {
    // "abcdef" in the map but maxLen=5 makes it unreachable
    val v = Seq(("abcdef", 10L), ("abc", 40000L), ("def", 40000L))
    assert(seg("abcdef", v, maxLen = 5) == Seq("abc", "def"))
    assert(seg("abcdef", v, maxLen = 6) == Seq("abcdef"))
  }

  test("surrogate pairs segment on code-point boundaries") {
    val clef = new String(Character.toChars(0x1D11E)) // U+1D11E, 2 chars
    assert(seg(s"a${clef}b", Seq.empty) == Seq("a", clef, "b"))
  }

  test("learnUnigram: seed substring counts and EM counts hand-traced " +
    "on a 2-word corpus") {
    // corpus: "ab ab ab cd" per doc ×3 docs → word counts ab=9, cd=3
    val docs = Seq((1L, "ab ab ab cd"), (2L, "ab ab ab cd"),
      (3L, "ab ab ab cd")).toDF("doc_id", "text")
    val vocab = UnigramLm.learnUnigram(docs, "text", rounds = 2,
      maxLen = 5, seedSize = 400, vocabSize = 80)
    val byPiece = vocab.map(p => p.piece -> p).toMap
    // seed: ab=9, a=9, b=9, cd=3, c=3, d=3 (all pass cnt>=2 or len=1);
    // round 1 Viterbi: "ab" → [ab] (1 piece beats [a][b] on any grid
    // where lp(ab)=lp(a)=lp(b)); "cd" → [cd]. counts: ab=9, cd=3;
    // M-step keeps {ab, cd} + chars {a,b,c,d} smoothed to 1 each
    assert(byPiece("ab").cnt == 9L)
    assert(byPiece("cd").cnt == 3L)
    assert(Seq("a", "b", "c", "d").forall(byPiece(_).cnt == 1L))
    // rank order: cnt desc, piece asc
    assert(vocab.map(_.piece) == Seq("ab", "cd", "a", "b", "c", "d"))
    // quantized log-probs: total=16, lp(ab)=floor(1e4·ln(9/16))
    assert(byPiece("ab").lpE4 ==
      math.floor(1e4 * math.log(9.0 / 16)).toLong)
    // determinism: a second run is identical
    assert(UnigramLm.learnUnigram(docs, "text", rounds = 2, maxLen = 5,
      seedSize = 400, vocabSize = 80) == vocab)
  }

  test("cost expression: per-doc cost equals the sum of each word's DP " +
    "value, including the fallback-beats-map case") {
    val pieces = SparkEntry.UnigramFixedPieces
    val costs = UnigramSegment.costMap(pieces)
    // "small table dup" = sm+all (85000) + table (75000) + 3 chars
    // (150000); "line" exercises 'e' via the 50000 fallback (its map
    // cost is 60000): l+i+n (150000) + e (50000) = 200000
    assert(UnigramSegment.cost("small", costs, 5, 50000L) == 85000L)
    assert(UnigramSegment.cost("line", costs, 5, 50000L) == 200000L)
    val docs = Seq((1L, "small table dup"), (2L, ""), (3L, "line"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        UnigramLm.scoreCost(col("text"), pieces,
          SparkEntry.UnigramMaxLen, SparkEntry.UnigramCharCost).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 310000L, 2L -> 0L, 3L -> 200000L))
  }

  test("encode expression matches the driver-side segmenter and is " +
    "codegen-compatible") {
    val docs = Seq((1L, "small table dup"), (2L, "")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        UnigramLm.encode(col("text"), SparkEntry.UnigramFixedPieces,
          SparkEntry.UnigramMaxLen, SparkEntry.UnigramCharCost).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("sm", "all", "table", "d", "u", "p"))
    assert(out(2L) == Seq.empty)
  }
}
