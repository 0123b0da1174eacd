package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

import graft.functions.BpeSegment

/** Byte-pair-encoding vocabulary learning and application (Sennrich et
  * al. 2016, arXiv:1508.07909 — the standard subword tokenizer-training
  * step of an LLM data pipeline), shaped for a 100 TB corpus.
  *
  * The scale argument has two halves:
  *
  *  1. LEARNING operates on the WORD-FREQUENCY table, never the corpus:
  *     one map-side-combined `groupBy(word).count` collapses any corpus
  *     to its distinct vocabulary (natural-language vocabularies are
  *     millions of rows at any corpus size — Heaps' law, and the Zipf
  *     tail beyond a frequency cap contributes negligible pair mass), a
  *     bounded TakeOrdered keeps the top `maxWords` by frequency, and
  *     the merge loop runs driver-side on that capped table — the same
  *     architecture as the reference subword-nmt / tokenizer-trainer
  *     tools, which all learn from a word-frequency dict. Nothing
  *     iterative ever touches the distributed corpus.
  *  2. APPLICATION is a per-row pure function of (word, merge table) —
  *     [[BpeSegment]], a codegen'd expression carrying the merge ranks
  *     as a plan reference object. Encoding is map-only: no join, no
  *     shuffle, no per-iteration passes.
  *
  * [[pairCounts]] — the first iteration's pair statistics — is also
  * exposed as a standalone operator: it is the SQL-expressible surface
  * (DuckDB-oracled as `tx_bpe_pairs`), and it is the exact computation
  * each learning iteration repeats driver-side.
  */
object TextBpe {

  /** Whitespace tokenization — matching [[TextAnalysis.tokens]]. */
  private def words(textCol: String): Column =
    split(coalesce(col(textCol), lit("")), "\\s+")

  /** `(word, freq)` for every distinct word of length ≥ 2 (a 1-symbol
    * word has no pairs and can never influence a merge). One map-side-
    * combined aggregate: corpus → vocabulary.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(textCol)).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent code-point pair frequencies over the corpus, weighted by
    * word frequency — iteration 1 of BPE learning as a first-class
    * query. Cost: the vocabulary aggregate plus a per-word expansion of
    * the DISTINCT words only (length-1 pairs per word), re-aggregated to
    * the alphabet² domain — bounded output regardless of corpus size.
    */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val wc = wordCounts(docs, textCol)
    wc.select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => struct(col("word").substr(i, lit(1)).as("lhs"),
          col("word").substr(i + lit(1), lit(1)).as("rhs")))).as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"), col("freq"))
      .groupBy("lhs", "rhs").agg(sum("freq").as("freq"))
  }

  /** Top-k pair table with a deterministic rank — the query surface of
    * [[pairCounts]]. The ranking window is over the aggregated
    * alphabet² table (bounded domain), not the corpus.
    */
  def pairCountsTopK(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val w = Window.orderBy(col("freq").desc, col("lhs").asc, col("rhs").asc)
    pairCounts(docs, textCol)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** One learned merge: `lhs + rhs` became a symbol with this rank
    * because it was the most frequent pair (`freq`) of its iteration.
    */
  final case class Merge(lhs: String, rhs: String, freq: Long)

  /** Learn `numMerges` BPE merges from the corpus. Distributed part: the
    * vocabulary aggregate + a bounded TakeOrdered (top `maxWords` by
    * frequency, word as the deterministic tiebreak). Driver part: the
    * classic merge loop over the capped frequency table — O(numMerges ×
    * total symbols), with ties broken (freq desc, lhs asc, rhs asc) so
    * the result is a pure function of the corpus. Stops early when no
    * pair occurs twice (merging hapax pairs is vocabulary noise).
    */
  def learnBpe(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 17): Seq[Merge] = {
    val top: Array[(Array[String], Long)] = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word").asc).limit(maxWords)
      .collect().map { r =>
        val w = r.getString(0)
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        (syms.toArray, r.getLong(1))
      }
    var table = top
    val out = Seq.newBuilder[Merge]
    var n = 0
    var exhausted = false
    while (n < numMerges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), Long]()
      table.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (p._1 < best._1._1 ||
                (p._1 == best._1._1 && p._2 < best._1._2)))) best = (p, c)
        }
        if (best._2 < 2) exhausted = true
        else {
          val (l, r) = best._1
          out += Merge(l, r, best._2)
          table = table.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val next = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  next += l + r; i += 2
                } else { next += syms(i); i += 1 }
              }
              (next.toArray, f)
            }
          }
          n += 1
        }
      }
    }
    out.result()
  }

  /** `text → array<string>` of BPE subwords under `merges` — the
    * codegen'd [[graft.functions.BpeEncode]] (tokenize + segment +
    * concatenate in one per-row call). Map-only at any scale.
    */
  def encode(text: Column, merges: Seq[Merge]): Column =
    ColumnBridge.column(graft.functions.BpeEncode(
      ColumnBridge.expression(coalesce(text, lit(""))),
      merges.map(m => (m.lhs, m.rhs))))
}
