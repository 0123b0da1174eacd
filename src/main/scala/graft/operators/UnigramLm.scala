package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.UnigramSegment

/** Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram family, the second-most-used subword
  * tokenizer after BPE), shaped for a 100 TB corpus exactly like
  * [[TextBpe]]:
  *
  *  1. LEARNING operates on the WORD-FREQUENCY table, never the corpus:
  *     one map-side-combined `groupBy(word).count` collapses any corpus
  *     to its distinct vocabulary, a bounded TakeOrdered keeps the top
  *     `maxWords` by frequency, and the EM loop runs driver-side on
  *     that capped table. Nothing iterative touches the distributed
  *     corpus.
  *  2. APPLICATION is a per-row pure function of (word, piece table) —
  *     [[graft.functions.UnigramEncode]], a codegen'd expression
  *     carrying the cost table as a plan reference object. Map-only:
  *     no join, no shuffle, no per-iteration passes.
  *
  * The EM here is the deterministic VITERBI variant (hard EM): the
  * E-step counts each word's single best segmentation (weighted by word
  * frequency) instead of the full forward-backward expectation, and the
  * M-step re-estimates piece probabilities from those counts on the
  * integer grid `lp_e4 = floor(10⁴·ln(cnt/total))` — quantized costs
  * make every subsequent Viterbi an exact integer argmin, so the whole
  * training run is a pure function of the corpus and is replayable by
  * the DuckDB oracle (which unrolls the same rounds as recursive-CTE
  * Viterbi passes). Kudo's soft-EM/pruning refinement trades that
  * exact replayability for slightly better likelihood; the structure —
  * seed by substring frequency, iterate segment-and-count, keep a
  * capped vocabulary with guaranteed character coverage — is the same.
  */
object UnigramLm {

  /** One learned piece: quantized log-prob `lpE4 = floor(10⁴·ln(cnt /
    * total))` (≤ 0; Viterbi cost is its negation).
    */
  final case class Piece(piece: String, cnt: Long, lpE4: Long)

  /** Code-point count (DuckDB `length()` parity). */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** UTF-8-BYTE string order for count-tie ranking: Spark's string
    * min/ORDER BY and DuckDB's `ORDER BY piece` both compare UTF-8
    * bytes, while Java's `compareTo` compares UTF-16 units — they
    * disagree on supplementary (non-BMP) characters, which would rank
    * tied pieces differently cross-engine and break the bit-exact
    * oracle contract (the same hazard `TextDedup.minLabelClusters`
    * orders its string branch around).
    */
  private val utf8Order: Ordering[String] =
    (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** (count desc, piece asc-by-UTF-8-bytes) rank order. */
  private val rankOrder: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long] { case (_, c) => -c }
      .orElse(Ordering.by[(String, Long), String](_._1)(utf8Order))

  /** Quantized log-prob table from integer counts. */
  private def quantize(counts: Seq[(String, Long)]): Seq[Piece] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, c) =>
      Piece(p, c, math.floor(1e4 * math.log(c.toDouble / total)).toLong)
    }
  }

  /** `(word, freq)` over ALL whitespace tokens (single-character words
    * carry unigram mass, unlike BPE's pair-driven ≥2 filter).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(coalesce(col(textCol), lit("")), "\\s+"))
        .as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn a unigram-LM piece vocabulary: seed with substring
    * frequencies (lengths 1..`maxLen`, overlapping occurrences, kept
    * when count ≥ 2 or single-character, capped to the top `seedSize`
    * by (count desc, piece asc) with single characters always kept for
    * coverage), then `rounds` Viterbi-EM iterations — segment every
    * word under the current cost table, count pieces weighted by word
    * frequency, keep the top `vocabSize` by (count desc, piece asc)
    * plus every seed character with add-one smoothing on the
    * single-character counts, requantize. Returned in rank order
    * (count desc, piece asc).
    *
    * Distributed part: the vocabulary aggregate + bounded TakeOrdered
    * (`maxWords` cap); driver part: O(rounds × Σ|word|·maxLen) over the
    * capped table — the [[TextBpe.learnBpe]] architecture.
    */
  def learnUnigram(docs: DataFrame, textCol: String, rounds: Int = 2,
      maxLen: Int = 5, seedSize: Int = 400, vocabSize: Int = 80,
      maxWords: Int = 1 << 17): Seq[Piece] = {
    val words: Array[(String, Long)] = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // ---- seed: overlapping substring counts on code-point windows ----
    val seedCnt = new java.util.HashMap[String, Long]()
    words.foreach { case (w, f) =>
      val starts = new Array[Int](w.length + 1)
      var n = 0
      var off = 0
      while (off < w.length) {
        starts(n) = off; off += Character.charCount(w.codePointAt(off)); n += 1
      }
      starts(n) = w.length
      var i = 0
      while (i < n) {
        var k = 1
        while (k <= math.min(maxLen, n - i)) {
          seedCnt.merge(w.substring(starts(i), starts(i + k)), f, _ + _)
          k += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val eligible = seedCnt.asScala.toSeq
      .filter { case (p, c) => c >= 2 || cpLen(p) == 1 }
      .sorted(rankOrder)
    val kept = eligible.zipWithIndex
      .filter { case ((p, _), i) => i < seedSize || cpLen(p) == 1 }
      .map(_._1)
    val chars = kept.map(_._1).filter(cpLen(_) == 1).toSet
    var vocab = quantize(kept)

    // ---- Viterbi-EM rounds ----
    var r = 0
    while (r < rounds) {
      val costs = UnigramSegment.costMap(vocab.map(p => (p.piece, -p.lpE4)))
      val used = new java.util.HashMap[String, Long]()
      words.foreach { case (w, f) =>
        UnigramSegment.segment(w, costs, maxLen, UnigramSegment.UnkCost)
          .forEach(p => used.merge(p, f, _ + _))
      }
      val top = used.asScala.toSeq.sorted(rankOrder)
        .take(vocabSize).toMap
      val next = (top.keySet ++ chars).toSeq.map { p =>
        (p, top.getOrElse(p, 0L) + (if (cpLen(p) == 1) 1L else 0L))
      }.sorted(rankOrder)
      vocab = quantize(next)
      r += 1
    }
    vocab
  }

  /** `text → array<string>` of unigram subwords under a fixed piece
    * table — the codegen'd [[graft.functions.UnigramEncode]].
    */
  def encode(text: Column, pieces: Seq[(String, Long)], maxLen: Int,
      charCost: Long): Column =
    ColumnBridge.column(graft.functions.UnigramEncode(
      ColumnBridge.expression(coalesce(text, lit(""))),
      pieces, maxLen, charCost))

  /** `text → long` total unigram-LM segmentation cost (Σ per-word
    * Viterbi DP values) — the per-document quality signal, codegen'd
    * and map-only ([[graft.functions.UnigramCost]]).
    */
  def scoreCost(text: Column, pieces: Seq[(String, Long)], maxLen: Int,
      charCost: Long): Column =
    ColumnBridge.column(graft.functions.UnigramCost(
      ColumnBridge.expression(coalesce(text, lit(""))),
      pieces, maxLen, charCost))
}
