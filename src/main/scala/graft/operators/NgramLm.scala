package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the corpus-statistics
  * quality signal (CCNet-style: documents whose token transitions are
  * improbable under the corpus's own n-gram statistics are boilerplate,
  * gibberish, or wrong-language) without any external model artifact.
  *
  * Model: add-one-smoothed trigram conditionals over whitespace tokens,
  *   P(w3 | w1 w2) = (c(w1 w2 w3) + 1) / (c(w1 w2 ·) + V)
  * where `c(w1 w2 ·)` is the trigram-table marginal of the context and
  * `V` the unigram vocabulary size. A document's score is its summed
  * per-trigram `floor(10⁴ · ln P)` — quantizing each term BEFORE the
  * sum keeps the result an exact integer (independent of float
  * summation order, hence engine-portable for the oracle), and the
  * consumer divides by `n_ngrams` for the mean log-probability.
  *
  * Scale shape (100 TB): the count build is one map-side-combined
  * aggregate over exploded trigrams of the corpus — the count table is
  * vocabulary-scale, not corpus-scale, and a production run prunes it
  * with a min-count floor (smoothing absorbs the pruned tail; the
  * `minCount` knob) which typically shrinks it to broadcastable size.
  * Scoring is explode → hash-join against the counts on the trigram
  * key → per-doc re-aggregate: two shuffles of the trigram stream, AQE
  * handles the Zipf skew of hot trigrams (hot KEYS are on the count
  * side of the join, which is the small side).
  */
object NgramLm {

  private def toks(textCol: String): Column =
    split(coalesce(col(textCol), lit("")), "\\s+")

  /** `(idCol, ctx, tri)` — one row per trigram occurrence; documents
    * with fewer than 3 tokens contribute none.
    */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    docs.select(col(idCol),
        explode(when(size(t) >= 3, transform(sequence(lit(0), size(t) - 3),
          i => struct(
            concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2)).as("ctx"),
            concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
              element_at(t, i + 3)).as("tri"))))
          .otherwise(array().cast("array<struct<ctx:string,tri:string>>")))
          .as("g"))
      .select(col(idCol), col("g.ctx").as("ctx"), col("g.tri").as("tri"))
  }

  /** Per-document `(idCol, n_ngrams, lp_sum_e4)` under the corpus's own
    * smoothed trigram statistics (train = score corpus; pass a separate
    * `train` to score against another corpus's model). `minCount`
    * drops trigram counts below the floor from the model — they score
    * as unseen (numerator 1), which is what smoothing models anyway,
    * and it bounds the count table at web scale.
    */
  def scoreByCorpus(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 1L): DataFrame =
    score(docs, docs, idCol, textCol, minCount)

  def score(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, minCount: Long = 1L): DataFrame = {
    val trainTri = trigrams(train, idCol, textCol)
    // tri determines ctx, so grouping by both is free and keeps the
    // context string for the marginal without re-parsing
    val c3 = trainTri.groupBy("tri", "ctx").agg(count(lit(1)).as("c3"))
      .filter(col("c3") >= minCount)
    // context marginal from the (pruned) trigram table — c(w1 w2 ·)
    val c2 = c3.groupBy("ctx").agg(sum(col("c3")).as("c2"))
    val vocab = train.select(explode(toks(textCol)).as("w"))
      .filter(length(col("w")) > 0).agg(countDistinct(col("w"))).first().getLong(0)

    val scored = trigrams(docs, idCol, textCol)
      .join(c3.select("tri", "c3"), Seq("tri"), "left")
      .join(c2, Seq("ctx"), "left")
      .select(col(idCol),
        floor(lit(10000.0) * log(
          (coalesce(col("c3"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c2"), lit(0L)) + lit(vocab)).cast("double")))
          .cast("long").as("lp_e4"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ngrams"), sum(col("lp_e4")).as("lp_sum_e4"))
    // documents too short to have trigrams still appear, with (0, 0)
    docs.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("lp_sum_e4"), lit(0L)).as("lp_sum_e4"))
  }
}
