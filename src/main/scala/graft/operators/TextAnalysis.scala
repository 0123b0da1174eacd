package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language identification, quality scoring, document
  * fingerprinting. All pure column expressions (whole-stage codegen, no
  * UDFs) — at 100 TB these run map-side with zero shuffle.
  *
  * Cross-engine determinism rules (shared with the DuckDB oracle):
  * ratios are floor-scaled integers (`floor(x * 10^k)` as BIGINT), token
  * splitting is a single regex, and fingerprints are md5 hex strings.
  */
object TextAnalysis {

  /** Tokens = maximal runs of non-whitespace. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword pattern: letter runs, digit runs, single
    * non-alphanumeric marks. Deliberately lookahead-free (real BPE
    * pre-tokenizers use lookahead, which RE2-based engines reject) so the
    * same pattern runs in Spark and the DuckDB oracle.
    */
  val BpeishPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Subword token count under [[BpeishPattern]]. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, SQL-expressible.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai")
  )
  val langOrder: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  /** Per-language score from a token-array column:
    * floor(1e4 * markerHits / tokenCount).
    */
  def langScoreFromTokens(toks: Column, lang: String): Column = {
    val markers = array(langMarkers(lang).map(lit): _*)
    val hits = size(filter(toks, t => array_contains(markers, t)))
    floor(hits * lit(10000.0) / size(toks)).cast("long")
  }

  /** Per-language score: floor(1e4 * markerHits / tokenCount).
    * NOTE: inlines `split` twice per score — prefer [[languageId]] /
    * [[langScoreFromTokens]] over a materialized token column in hot paths.
    */
  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(tokens(text), lang)

  /** Predicted language from a token-array column: argmax of the marker
    * scores, ties broken by [[langOrder]]; "und" when no marker hits.
    */
  def langPredictFromTokens(toks: Column): Column = {
    val scores = langOrder.map(l => l -> langScoreFromTokens(toks, l))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language in langOrder reaching `best` wins ties
    val ordered = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best, lit(l)).otherwise(acc)
    }
    when(best <= 0, lit("und")).otherwise(ordered)
  }

  /** Predicted language (see [[langPredictFromTokens]]; same split-inlining
    * caveat as [[langScore]]).
    */
  def langPredict(text: Column): Column = langPredictFromTokens(tokens(text))

  /** Language-ID over a whole frame: appends score_<lang>_e4 per language
    * and lang_pred, with the token array materialized ONCE in its own
    * projection (the Column forms above re-split the text inside every
    * lambda — ~10 splits/row for 5 languages + argmax).
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val scores = langOrder.map(l =>
      langScoreFromTokens(col("__w"), l).as(s"score_${l}_e4"))
    val out = (df.columns.map(col).toSeq ++ scores) :+
      langPredictFromTokens(col("__w")).as("lang_pred")
    df.withColumn("__w", tokens(col(textCol))).select(out: _*)
  }

  /** Quality features + a linear score, all floor-scaled integers:
    *   n_tokens, n_chars, mean token length (e2), distinct-token ratio (e4),
    *   stopword ratio (e4), quality = distinct_ratio + stopword presence.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // token array materialized once (same split-inlining trap as languageId)
    val withW = df.withColumn("__w", tokens(t))
    val toks = col("__w")
    val nTok = size(toks)
    val allMarkers = array(langMarkers.values.flatten.toSeq.distinct.map(lit): _*)
    val stopHits = size(filter(toks, x => array_contains(allMarkers, x)))
    withW.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("mean_tok_len_e2",
        floor((length(t) - nTok + 1) * lit(100.0) / nTok).cast("long"))
      .withColumn("distinct_ratio_e4",
        floor(size(array_distinct(toks)) * lit(10000.0) / nTok).cast("long"))
      .withColumn("stopword_ratio_e4",
        floor(stopHits * lit(10000.0) / nTok).cast("long"))
      .withColumn("quality_e4",
        (col("distinct_ratio_e4") +
          when(col("stopword_ratio_e4") > 0, lit(500L)).otherwise(lit(0L)) -
          when(col("mean_tok_len_e2") > 1200, lit(1000L)).otherwise(lit(0L))).cast("long"))
      .drop("__w")
  }

  /** The eight Gopher "required words" (Rae et al. 2021, A1.1): a
    * document must contain at least two of them to pass the stopword
    * rule — a cheap English-ness / natural-prose gate.
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher rule-set quality FILTER (Rae et al. 2021, Appendix A1.1) —
    * the published decision rules composed into per-document named
    * flags plus the overall keep verdict, where [[qualityFeatures]]
    * gives raw scoring features. Every rule is an exact integer
    * comparison (cross-multiplied thresholds, no float ratios), so the
    * DuckDB oracle reproduces each flag bit-for-bit:
    *
    *   r_word_count     50 ≤ |words| ≤ 100,000
    *   r_mean_word_len  3 ≤ mean word length ≤ 10 (e2 grid, exact
    *                    per-token length sum — no whitespace guess)
    *   r_symbol_ratio   (# chars + "..." occurrences) ≤ 0.1·|words|
    *   r_bullet_lines   ≤ 90% of lines start with a bullet (-, *, •)
    *   r_ellipsis_lines ≤ 30% of lines end with "..."
    *   r_alpha_words    ≥ 80% of words contain an alphabetic char
    *   r_stopwords      ≥ 2 distinct [[GopherStopwords]] present
    *   keep             AND of all rules
    *
    * Map-only: token and line arrays are materialized once per row and
    * every rule is a codegen'd expression over them — zero shuffle at
    * any corpus size (the 100 TB shape: this runs inside the scan
    * stage, fused with whatever filter consumes `keep`).
    */
  def gopherQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val withArrays = df
      .withColumn("__w", tokens(t))
      .withColumn("__l", split(t, "\n"))
    val toks = col("__w")
    val lines = col("__l")
    val nTok = size(toks).cast("long")
    val nLines = size(lines).cast("long")
    // exact character mass of the tokens themselves (not a
    // single-space-separation approximation — tabs/multi-space safe)
    val sumLen = aggregate(transform(toks, x => length(x).cast("long")),
      lit(0L), (a, x) => a + x)
    val meanE2 = floor(sumLen * lit(100.0) / nTok).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    // non-overlapping left-to-right "..." occurrences in BOTH engines
    val ellipses =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val bulletLines = size(filter(lines, x => x.rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, x => x.rlike("\\.\\.\\.$"))).cast("long")
    val alphaWords = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(filter(array(GopherStopwords.map(lit): _*),
      sw => array_contains(toks, sw))).cast("long")
    withArrays
      .withColumn("n_tokens", nTok)
      .withColumn("mean_word_len_e2", meanE2)
      .withColumn("r_word_count", nTok >= 50L && nTok <= 100000L)
      .withColumn("r_mean_word_len", meanE2 >= 300L && meanE2 <= 1000L)
      .withColumn("r_symbol_ratio", (hashes + ellipses) * 10L <= nTok)
      .withColumn("r_bullet_lines", bulletLines * 10L <= nLines * 9L)
      .withColumn("r_ellipsis_lines", ellipsisLines * 10L <= nLines * 3L)
      .withColumn("r_alpha_words", alphaWords * 5L >= nTok * 4L)
      .withColumn("r_stopwords", stopHits >= 2L)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_alpha_words") &&
          col("r_stopwords"))
      .drop("__w", "__l")
  }

  /** N-gram repetition ratios (the Gopher-style duplicate-n-gram
    * quality signal: heavily templated/looping text repeats its n-grams;
    * pipelines drop docs above a repetition threshold). For each k,
    * `rep<k>_e4 = floor((total_k − distinct_k) / total_k · 10⁴)` where
    * total_k is the n-gram OCCURRENCE count (|w| − k + 1; |w| below k
    * tokens falls back to token occurrences, mirroring [[TextDedup
    * .shingles]]) and distinct_k comes from the codegen'd
    * [[graft.functions.ShingleHashes]] (distinct modulo a ~2⁻⁶⁴
    * xxhash64 collision, the same trade the dedup tiers document).
    *
    * Zero shuffle: one straight-line expression per row per k; the token
    * array is materialized once (split-inlining trap, see [[TextDedup
    * .shingles]]).
    */
  def repetitionFeatures(df: DataFrame, textCol: String,
      ks: Seq[Int] = Seq(2, 3)): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val withW = df.withColumn("__w", tokens(t))
    val nTok = size(col("__w"))
    val out = ks.foldLeft(withW) { (acc, k) =>
      val total = when(nTok >= k, nTok - k + 1).otherwise(nTok)
      val distinctK = size(graft.functions.GraftFunctions.shingleHashes(t, k))
      acc.withColumn(s"rep${k}_e4",
        floor((total - distinctK) * lit(10000.0) / total).cast("long"))
    }
    out.drop("__w")
  }

  /** Corpus vocabulary with frequency ranks: top-k tokens by count
    * (ties → lexicographic). The token count is one explode + hash
    * aggregate (map-side combined, shuffle = vocabulary size, not token
    * stream). The top-k itself is `orderBy(...).limit(k)` —
    * TakeOrderedAndProject, a per-partition bounded heap + k-way driver
    * merge, so NO task ever sorts the whole vocabulary (a global
    * row_number window would sort 10⁸+ tokens of a 100 TB corpus in one
    * partition). Ranks are then derived from the ≤ k surviving rows with
    * a deterministic sort_array(collect_list) + posexplode — order
    * independent of row arrival, no window, k-bounded memory.
    */
  def vocabTopK(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = df
      .select(explode(tokens(coalesce(col(textCol), lit("")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    counts.orderBy(col("n").desc, col("token").asc).limit(k)
      // struct(-n, token) sorts ascending ⟺ (n desc, token asc); negation
      // of a nonneg count is ANSI-safe
      .select(struct((-col("n")).as("negn"), col("token").as("token")).as("s"))
      .agg(sort_array(collect_list(col("s"))).as("xs"))
      .select(posexplode(col("xs")))
      .select(col("col.token").as("token"), (-col("col.negn")).as("n"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Per-document token ENTROPY — the Shannon entropy of the document's
    * own token distribution, the classic repetitiveness/diversity
    * quality feature (template spam scores near 0, natural text near
    * its vocabulary's capacity).
    *
    * Computed ENTIRELY IN-ROW: sort the token array, fold it once
    * accumulating run lengths, and emit each run's floor-quantized
    * `1e6·(c/L)·ln(L/c)` term into an integer sum — a pure map-side
    * expression chain (no (doc, token) shuffle, which is how the naive
    * relational form pays a corpus-scale exchange for a per-row
    * statistic). The oracle computes the same integer terms
    * relationally; floor-before-sum makes the two summation orders
    * identical.
    *
    * Output: (doc_id, n_tokens, n_distinct, entropy_e6) — entropy in
    * nats ×1e6.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_sort(filter(
      split(coalesce(col(textCol), lit("")), "\\s+"), t => length(t) > 0))
    val L = size(toks).cast("long")
    def term(c: Column): Column =
      floor(lit(1e6) * (c.cast("double") / L.cast("double")) *
        log(L.cast("double") / c.cast("double"))).cast("long")
    def st(prev: Column, run: Column, sum: Column, nd: Column): Column =
      struct(prev.as("prev"), run.as("run"), sum.as("sum"), nd.as("nd"))
    val zero = st(lit(null).cast("string"), lit(0L), lit(0L), lit(0L))
    val folded = aggregate(
      toks, zero,
      (s, x) => when(s.getField("prev").isNull,
          st(x, lit(1L), lit(0L), lit(1L)))
        .when(x === s.getField("prev"),
          st(x, s.getField("run") + 1L, s.getField("sum"), s.getField("nd")))
        .otherwise(st(x, lit(1L),
          s.getField("sum") + term(s.getField("run")),
          s.getField("nd") + 1L)),
      s => struct(
        when(s.getField("prev").isNull, lit(0L))
          .otherwise(s.getField("sum") + term(s.getField("run")))
          .as("entropy_e6"),
        s.getField("nd").as("nd")))
    df.select(col(idCol).as("doc_id"), L.as("n_tokens"),
      folded.getField("nd").as("n_distinct"),
      folded.getField("entropy_e6").as("entropy_e6"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a document's distinct
    * shingles that occur in no other document — the data-valuation
    * signal dual to the dedup tiers (a doc of novelty ≈ 0 is assembled
    * entirely from corpus-shared text; ≈ 1 means unique content worth
    * keeping). Uses the same md5-family 3-gram shingles as the dedup
    * tiers, so an SQL oracle recomputes it bit-identically.
    *
    * Scale shape: the per-doc distinct shingle stream comes off the
    * codegen'd [[graft.functions.ShingleMd5Hashes]] expression (no
    * explode-then-distinct), the doc-frequency table is one map-side-
    * combined aggregate on the hash, and the df join keys on the hash —
    * the same shuffle class as the Jaccard tier, with no pair
    * formation at all.
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.GraftFunctions.shingleMd5Hashes(col(textCol)))
        .as("h"))
    val dfq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val per = sh.join(dfq, "h").groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_shingles"),
      sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
    df.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(
          floor(lit(10000.0) * col("n_novel").cast("double") /
            col("n_shingles").cast("double")).cast("long"),
          lit(0L)).as("novelty_e4"))
  }

  /** Per-source token-distribution drift vs the whole corpus:
    * `KL(p_s ‖ p_corpus) = Σ_t p_s(t)·ln(p_s(t)/p(t))` — the
    * distribution-shift monitor a continuously-ingesting pipeline runs
    * per source/domain (a source whose language suddenly drifts, a
    * scraper gone wrong, a poisoned feed all spike their KL). Summing
    * only over tokens the source contains is the true KL here: p(t) ≥
    * p_s(t)·N_s/N > 0 wherever p_s(t) > 0, so no term is undefined.
    *
    * Determinism: each term is a two-division multiply-ln chain of
    * exact integer counts floor-quantized to e9 BEFORE the sum (ln is
    * bit-stable across engines — the BM25 precedent), so per-source
    * KL values are exact integers.
    *
    * Scale shape: ONE tokenization pass feeds the (source, token)
    * counts; source totals, corpus token counts, and the grand total
    * all re-aggregate from it map-side-combined (vocabulary-scale, not
    * corpus-scale); the term join keys on token over vocabulary-sized
    * frames and the final sum is |sources| rows.
    */
  def sourceDrift(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(srcCol).as("source"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("token"))
      .filter(length(col("token")) > 0)
    val cst = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val ct = cst.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val tot = cst.agg(sum(col("c_st")).as("n_tot"))
    val p = col("c_st").cast("double") / col("n_s").cast("double")
    val q = col("c_t").cast("double") / col("n_tot").cast("double")
    cst.join(ns, "source").join(ct, "token").crossJoin(broadcast(tot))
      .select(col("source"),
        floor(lit(1e9) * p * log(p / q)).cast("long").as("term_e9"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_e9")).as("kl_e9"))
  }

  /** Discrete value-at-rank quantiles per stratum: for each fraction f,
    * the value of the row at rank ceil(f · n) in ascending `valueCol`
    * order — exact and engine-portable, unlike interpolated quantiles
    * whose float formulas differ across engines.
    *
    * Scale shape: ranking each row (`row_number` per stratum) sorts every
    * stratum in ONE task — a dominant language serializes a 100 TB corpus
    * behind a single sort. Instead the rows are first collapsed to a
    * per-(stratum, value) HISTOGRAM (one map-side-combined aggregate;
    * shuffle = distinct values, and doc-length-like values are bounded),
    * and value-at-rank r is recovered as the smallest value whose
    * cumulative count reaches r. The cumulative window then runs over the
    * histogram — |distinct values| rows per stratum, not |rows| — and the
    * stratum total comes from a second frame over the SAME partitioning
    * (no extra exchange), not from a join that would recompute the
    * histogram per branch.
    *
    * @param quantiles (output column name, fraction) pairs
    * @param nCol      output column for the per-stratum row count
    */
  def valueAtRankQuantiles(
      df: DataFrame, strataCol: String, valueCol: String,
      quantiles: Seq[(String, Double)], nCol: String
  ): DataFrame = {
    val hist = df.groupBy(col(strataCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val qCols = quantiles.map { case (name, f) =>
      min(when(col("__cum") >= ceil(col("__n") * f).cast("long"),
        col(valueCol))).as(name)
    }
    cum.groupBy(col(strataCol))
      .agg(qCols.head, qCols.tail :+ max(col("__n")).as(nCol): _*)
  }

  /** HDR-histogram quantile ESTIMATES — the 100 TB scale path next to
    * [[valueAtRankQuantiles]]'s exact answer. The exact form's state is
    * one row per DISTINCT VALUE per group (a latency/length column with
    * millions of distincts shuffles millions of rows); this one buckets
    * each non-negative long onto the HdrHistogram log grid (Tene's
    * HdrHistogram, public domain: 32 sub-buckets per octave here), so
    * state is ≤ ~1,900 counters per group REGARDLESS of value range —
    * mergeable by addition (a plain map-side-combined `groupBy`.count),
    * with relative error ≤ 1/32 ≈ 3.1% by construction.
    *
    * Everything is integer-exact and engine-reproducible: the bucket is
    * computed from the value's BINARY STRING (`conv(v, 10, 2)` here,
    * `bin(v)` in DuckDB — same digits), values below 64 map to
    * themselves (the exact region), larger values to
    * `(e−4)·32 + (top 6 bits) − 32` with `e` the bit length minus one.
    * The reported estimate for quantile q (per-myriad, so q_e4=5000 is
    * the median) is the LOWER BOUND of the first bucket whose
    * cumulative count reaches `ceil(q_e4·n/10⁴)` — a deterministic
    * under-estimate of the true quantile by at most the bucket width.
    *
    * @param quantiles name → q_e4 (per-myriad rank, integer).
    * @return strataCol, one column per quantile name, nCol
    */
  def hdrQuantiles(
      df: DataFrame, strataCol: String, valueCol: String,
      quantiles: Seq[(String, Int)], nCol: String
  ): DataFrame = {
    val v = col(valueCol).cast("long")
    val e = (length(conv(v, 10, 2)) - 1).cast("long")
    val top6 = expr(
      s"CAST(conv(substring(conv(CAST($valueCol AS BIGINT), 10, 2), 1, 6), 2, 10) AS BIGINT)")
    val bucket = when(v < 64L, v)
      .otherwise((e - 4L) * 32L + top6 - 32L)
    // lower bound of a bucket: identity below 64, else
    // (32 + b mod 32) << (b div 32 − 1)
    val lb = when(col("__b") < 64L, col("__b"))
      .otherwise(expr("shiftleft(32 + CAST(__b % 32 AS INT), " +
        "CAST(__b DIV 32 AS INT) - 1)").cast("long"))
    val hist = df
      .select(col(strataCol), bucket.as("__b"))
      .groupBy(col(strataCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lb", lb)
    val qCols = quantiles.map { case (name, qE4) =>
      require(qE4 >= 0 && qE4 <= 10000, s"q_e4 out of range: $qE4")
      min(when(col("__cum") * 10000L >= col("__n") * qE4.toLong,
        col("__lb"))).as(name)
    }
    cum.groupBy(col(strataCol))
      .agg(qCols.head, qCols.tail :+ max(col("__n")).as(nCol): _*)
  }

  /** Corpus-adaptive common-token ratio: the fraction of each document's
    * tokens that belong to the corpus's own top-`k` vocabulary — the
    * integer-exact cousin of unigram-LM quality scoring (true LM logprob
    * needs `log`, whose libm rounding differs across engines; a rank
    * membership test is deterministic everywhere). Garbage/encoding-noise
    * docs score near 0, natural text scores high.
    *
    * Two stages: (1) the top-k vocabulary via the same distributed top-k
    * as [[vocabTopK]] (map-side-combined token counts; no global sort),
    * collapsed to ONE array row; (2) a broadcast cross join of that row —
    * k strings to every executor, never a shuffle of the corpus — and a
    * per-row membership filter. The vocabulary is ordered (n DESC, token
    * ASC), so the result is a pure function of the corpus.
    *
    * @return idCol, n_tokens, common_ratio_e4
    */
  def commonTokenRatio(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = tokens(coalesce(col(textCol), lit("")))
    val vocab = df
      .select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k)
      .agg(sort_array(collect_list(struct((-col("n")).as("negn"),
        col("token").as("token")))).as("vs"))
      .select(transform(col("vs"), v => v.getField("token")).as("__vocab"))
    df.select(col(idCol), toks.as("__w"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        floor(size(filter(col("__w"),
          x => array_contains(col("__vocab"), x))) * lit(10000.0) /
          size(col("__w"))).cast("long").as("common_ratio_e4"))
  }

  /** Per-document top-k terms by tf·idf — keyword extraction / salient-
    * term indexing over the corpus. idf is the log-free floor-scaled
    * reciprocal document frequency idf_e4 = floor(N·10⁴/df): a strictly
    * decreasing function of df like ln(N/df), chosen because ln is not
    * correctly rounded across engines while integer division is — the
    * score is then exact in both Spark and a plain-SQL oracle (swap in
    * the classic log idf at deployment if score VALUES, not ranks, must
    * match a reference implementation).
    *
    * Scale shape: term frequencies are one map-side-combined groupBy of
    * the exploded token stream, persisted because they feed BOTH the
    * document-frequency aggregate and the scoring join (unpersisted, the
    * corpus would re-scan and re-explode per branch). df rides a second
    * map-side-combined groupBy (shuffle = distinct (doc, token) pairs
    * collapsing to distinct tokens), and the tf ⋈ df join is keyed by
    * token — an AQE-splittable shuffle join, NOT a window over token
    * partitions (stopword tokens appear in nearly every document; a
    * count-over-token window would sort |docs| rows in one task). The
    * final per-document top-k window partitions by document id: groups
    * are bounded by document length, so no task ever sorts more than one
    * document's vocabulary. (The tf cache has no unpersist handle through
    * this API — one-shot analysis callers keep the default; long-lived
    * services pass cacheTf = false, paying the second corpus scan, or
    * materialize tf as a table instead.)
    *
    * @return idCol, token, tf, score_e4, rank (1-based, (score desc,
    *         token asc) — a total order, so deterministic)
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, cacheTf: Boolean = true): DataFrame = {
    val tf0 = docs
      .select(col(idCol), explode(tokens(coalesce(col(textCol), lit("")))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val tf =
      if (cacheTf) tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else tf0
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val scored = tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * floor(col("__n_docs") * lit(10000.0) / col("df")).cast("long"))
          .as("score_e4"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score_e4").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("score_e4"), col("rank"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are the
    * maximal runs of non-stopword words between punctuation/stopword
    * delimiters; each word scores `deg(w)/freq(w)` where `freq` counts
    * the word's occurrences in candidate phrases and `deg` sums the
    * lengths of the phrases containing it (co-occurrence degree,
    * including self); a phrase scores the sum of its words' scores.
    * Corpus-level ranking: identical phrase text always carries the
    * same (global) score, so phrases aggregate to
    * (phrase, n_occurrences, score_e6) and the top-k by
    * (score desc, phrase asc) — a total order after the group-by, so
    * deterministic. Scores are kept on an e6 fixed-point grid with
    * truncating division (`(deg·10⁶) div freq`), bit-identical in any
    * engine — the same exactness contract as the rest of the suite.
    *
    * Segmentation is shared with the oracle: lowercase, split into
    * segments on `[^a-z0-9 ]+` (punctuation delimits phrases), words on
    * spaces, and phrase islands break at stopwords — the island id is a
    * running count of stopwords seen in the segment. The stopword set
    * defaults to the [[langMarkers]] union (tiny, deterministic,
    * SQL-expressible); production callers pass a real per-language list.
    *
    * Scale shape: both explodes are map-side generators in the scan
    * stage; the island window partitions by (doc, segment) — bounded by
    * segment length, one user-key-style exchange; the word-stat
    * aggregate is vocabulary-bounded and map-side combined, and its
    * score table joins back by BROADCAST; the phrase-occurrence and
    * phrase-distinct aggregates key on (doc, segment, island) / phrase;
    * the final top-k plans as TakeOrderedAndProject (per-partition
    * heaps, no global sort). The phrase frame is persisted across its
    * two consumers (word stats, occurrence scoring) — same no-handle
    * trade as [[tfidfTopK]]'s tf cache.
    *
    * @return phrase, n_occurrences, score_e6 — the corpus top-k
    */
  def keywordsRake(docs: DataFrame, idCol: String, textCol: String,
      k: Int,
      stopwords: Seq[String] =
        langMarkers.values.flatten.toSeq.distinct): DataFrame = {
    require(k >= 1)
    val segs = docs.select(col(idCol).as("__doc"),
      posexplode(split(lower(coalesce(col(textCol), lit(""))),
        "[^a-z0-9 ]+")).as(Seq("seg_pos", "seg")))
    val words = segs.select(col("__doc"), col("seg_pos"),
        posexplode(split(col("seg"), " +")).as(Seq("word_pos", "w")))
      .filter(col("w") =!= "")
    val stopArr = array(stopwords.map(lit): _*)
    val flagged = words.withColumn("is_stop",
      when(array_contains(stopArr, col("w")), 1L).otherwise(0L))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__doc"), col("seg_pos")).orderBy(col("word_pos"))
    val islands = flagged
      .withColumn("island", sum(col("is_stop")).over(win))
      .filter(col("is_stop") === 0L)
    val phrases = islands
      .groupBy(col("__doc"), col("seg_pos"), col("island"))
      .agg(sort_array(collect_list(struct(col("word_pos"), col("w"))))
        .as("ww"))
      .withColumn("ws", expr("transform(ww, x -> x.w)"))
      .select(col("__doc"), col("seg_pos"), col("island"),
        concat_ws(" ", col("ws")).as("phrase"),
        size(col("ws")).cast("long").as("plen"), col("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordScores = phrases
      .select(explode(col("ws")).as("w"), col("plen"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"), expr("(deg * 1000000L) div freq").as("wscore"))
    val occ = phrases
      .select(col("__doc"), col("seg_pos"), col("island"), col("phrase"),
        explode(col("ws")).as("w"))
      .join(broadcast(wordScores), "w")
      .groupBy(col("__doc"), col("seg_pos"), col("island"), col("phrase"))
      .agg(sum(col("wscore")).as("score_e6"))
    occ.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        max(col("score_e6")).as("score_e6")) // identical per phrase text
      .orderBy(col("score_e6").desc, col("phrase").asc)
      .limit(k)
  }

  /** Exact content fingerprint: md5 of the normalized text (lower + trim).
    * Identical hex in every engine.
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Canonical text normalization: Unicode NFC (via the codegen'd
    * [[graft.functions.NfcNormalize]] expression — Spark has no builtin),
    * lowercase, whitespace runs collapsed to single spaces, trimmed.
    * The canonical form every exact-dedup key and tokenizer should see;
    * pure map-side column expression, zero shuffle.
    */
  def normalizeText(text: Column): Column =
    regexp_replace(
      lower(trim(graft.functions.GraftFunctions.nfcNormalize(text))),
      "\\s+", " ")

  /** PII patterns — deliberately lookahead-free so the same pattern runs
    * under Java regex (Spark) and RE2 (the DuckDB oracle).
    */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII scrub: per-document match counts plus the redacted text
    * (emails → `<EMAIL>`, IPv4 literals → `<IP>`; emails first so an
    * address's host part is never half-redacted as an IP). Map-side
    * regexp expressions, zero shuffle — at 100 TB this runs inside the
    * scan like the rest of the tx_* family.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails",
        size(regexp_extract_all(t, lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0))).cast("long"))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"), Ipv4Pattern, "<IP>"))
  }

  /** Fixed-size overlapping token windows — context-window chunking for
    * training/embedding: chunk i covers tokens [i·stride, i·stride +
    * chunkTokens). The token array is materialized ONCE in its own
    * projection (split-inlining trap, see [[languageId]]), chunk starts
    * come from one `sequence` + `posexplode` (a generator, so rows fan
    * out inside the scan stage — no shuffle), and each chunk's text is a
    * single `slice` + `concat_ws` over the carried array.
    *
    * @return idCol, chunk_idx (0-based), chunk_start (token offset),
    *         n_chunk_tokens, chunk_fp (md5 of the chunk text)
    */
  def chunkFixed(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    df.select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1, lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("chunk_start"),
        least(size(col("__w")) - col("col"), lit(chunkTokens))
          .cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("__w"), col("col") + 1, lit(chunkTokens))))
          .as("chunk_fp"))
  }

  /** Corpus-vocabulary tokenization: every token position mapped to its
    * integer id in the corpus's own top-`vocabSize` vocabulary (rank by
    * frequency, ties by token — [[vocabTopK]]'s order), out-of-vocabulary
    * tokens to id 0 — the encode step between text curation and sequence
    * packing. Emitted exploded as (id, pos, token_id) rather than as an
    * array column so downstream ops (and the driver's row-wise compare)
    * see scalar rows; `collect_list(token_id) over (partition by id order
    * by pos)` re-assembles sequences when needed.
    *
    * Scale shape: the vocabulary is top-k by construction (bounded — real
    * tokenizers fix V at 2¹⁵-2¹⁷), computed scale-safely by [[vocabTopK]]
    * (TakeOrderedAndProject, no global sort) and BROADCAST back onto the
    * exploded corpus: the encode pass is map-only, no corpus shuffle. A
    * full-vocabulary id assignment would instead need a global rank over
    * an unbounded set — that is the thing this operator deliberately
    * does not do.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabTopK(docs, textCol, vocabSize)
      .select(col("token"), col("rank").cast("long").as("__vid"))
    docs.select(col(idCol),
      posexplode(tokens(coalesce(col(textCol), lit("")))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("__vid"), lit(0L)).as("token_id"))
  }

  /** Global percentile rank of a bounded-domain value column — the
    * calibration step that turns a raw quality score into "this document
    * beats X% of the corpus" (threshold selection, quota curation, and
    * mixture reweighting all consume ranks, not raw scores).
    *
    * pct_e4 = floor(10⁴ · |rows with strictly smaller value| / N), i.e.
    * rank()−1 normalized — identical for ties, exact, engine-portable.
    *
    * NO global sort of the corpus: the rank comes from a cumulative sum
    * over the VALUE HISTOGRAM (one map-side-combined groupBy to |distinct
    * values| rows). The histogram window is a single partition, but its
    * input is bounded by the value DOMAIN, not the corpus — floor-scaled
    * ratio scores like quality_e4 live in [-10⁴, 2·10⁴], so the window
    * sorts ≤ ~3·10⁴ rows at ANY corpus size (the same bounded-domain
    * argument as [[valueAtRankQuantiles]], globally instead of per
    * stratum). The ranked histogram then broadcasts back onto the corpus
    * — a map-side join, no corpus shuffle anywhere. Do NOT use with
    * unbounded-domain values (raw lengths at 100 TB: bucket first).
    *
    * @param cacheInput persist `df` across its two consumers (histogram
    *        + annotate join). Right when df is a SLIM projection over an
    *        expensive upstream (the scores recompute twice otherwise) and
    *        the caller is short-lived — there is no unpersist handle
    *        through this API, so long-lived callers keep the default and
    *        pay the second scan.
    * @return df's columns plus `outCol`. NULL-valued rows are preserved
    *         with a NULL rank (they are excluded from the histogram too —
    *         a null score is "unscored", not "smallest", so it must not
    *         inflate other rows' below-counts or N).
    */
  def percentileRankByValue(df0: DataFrame, valueCol: String,
      outCol: String = "pct_e4", cacheInput: Boolean = false): DataFrame = {
    val df =
      if (cacheInput)
        df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df0
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__below", coalesce(sum(col("__c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("__n", sum(col("__c")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col(valueCol),
        floor(col("__below") * lit(10000.0) / col("__n")).cast("long").as(outCol))
    // LEFT join so null-valued rows survive (with null rank) instead of
    // silently vanishing through the USING-join's null-rejecting equality;
    // for non-null rows left ≡ inner, since every non-null value is in
    // the histogram by construction — same broadcast-hash-join plan.
    df.join(broadcast(hist), Seq(valueCol), "left")
  }

  /** Cross-document duplicate context windows: every chunk (as produced
    * by [[chunkFixed]]) whose fingerprint appears in at least `minDocs`
    * DISTINCT documents — the span-granular dedup between document-level
    * near-dup (whole doc drops) and nothing: repeated boilerplate
    * (license headers, navigation chrome, quoted reply chains) shows up
    * as identical windows inside otherwise-unique documents, and this
    * emits exactly those spans, per document, for downstream excision or
    * weighting. The CCNet paragraph-dedup idea at fixed-window
    * granularity (paragraph boundaries don't survive tokenized corpora).
    *
    * Scale shape: the chunk stream is an explode of the corpus, consumed
    * twice (the doc-frequency aggregate and the annotate join) — two
    * corpus scans; the chunk stream is far wider than the aggregate
    * (it carries per-window fingerprints), so re-scanning beats caching
    * at warehouse scale and the aggregate side is map-side combined down
    * to |distinct fps|. The join back is keyed by chunk_fp: a corpus-wide
    * boilerplate fp is a hot key, which AQE skew-join splits (the build
    * side is the small filtered aggregate).
    *
    * @return idCol, chunk_idx, chunk_fp, n_docs
    */
  def duplicateChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int, minDocs: Int = 2): DataFrame = {
    val chunks = chunkFixed(df, idCol, textCol, chunkTokens, stride)
    val byFp = chunks.groupBy(col("chunk_fp"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    chunks.join(byFp, "chunk_fp")
      .select(col(idCol), col("chunk_idx"), col("chunk_fp"), col("n_docs"))
  }

  /** Powers of 257 mod (2³¹−1) for the CDC window fingerprint, highest
    * power first (j-th element multiplies the j-th char of the window).
    * Shared with the oracle SQL so both engines hash identically.
    */
  val CdcWindow = 8
  val CdcPowers: Seq[Long] = {
    val p = 2147483647L
    (0 until CdcWindow).map { j =>
      var acc = 1L
      (0 until (CdcWindow - 1 - j)).foreach(_ => acc = acc * 257L % p)
      acc
    }
  }

  /** Content-defined chunking dedup (the FastCDC/LBFS idea —
    * Muthitacharoen et al. 2001, "A Low-Bandwidth Network File System";
    * rsync's rolling-window cut) applied to corpus text: chunk
    * boundaries are chosen by the CONTENT — cut after any 8-char window
    * whose Rabin-style fingerprint ≡ 0 (mod `avgChunk`) — so an
    * insertion or deletion only re-chunks its local neighborhood, where
    * [[duplicateChunks]]'s fixed-stride windows desynchronize for the
    * whole rest of the document. This is the shift-ROBUST span-dedup
    * tier: boilerplate that migrates position across documents still
    * lands in byte-identical chunks. Reports chunks whose exact text
    * recurs in ≥ `minDocs` distinct documents (length ≥ `minLen` to
    * mute sub-word noise chunks).
    *
    * Determinism contract: the window fingerprint is an exact 64-bit
    * dot product of the window's code points with [[CdcPowers]]
    * (≤ 16·2¹⁶·2³¹ < 2⁵², never overflows, no float anywhere) — the
    * same value in any engine, so the DuckDB oracle reproduces the cut
    * positions bit-exactly.
    *
    * Scale shape: fully MAP-SIDE until the final fingerprint group-by —
    * the cut list per document comes from the codegen'd
    * [[graft.functions.CdcCuts]] expression (one straight-line O(n·w)
    * JVM pass per row inside whole-stage codegen; the declarative
    * split+transform+filter formulation re-expands its char-code
    * projection into the lambda and goes O(n²) interpreted — measured
    * ~100 ms/doc), and only the chunk generator and the md5 group-by
    * (map-side combined; chunk text never crosses the exchange) touch
    * the engine's shuffle machinery.
    *
    * @return chunk_fp, chunk_len, n_docs, n_occurrences
    */
  def cdcDuplicateChunks(df: DataFrame, idCol: String, textCol: String,
      avgChunk: Int = 32, minDocs: Int = 2, minLen: Int = 8): DataFrame = {
    require(avgChunk >= 2 && minDocs >= 1 && minLen >= 1)
    val w = CdcWindow
    val d = df.select(col(idCol).as("__doc"),
      coalesce(col(textCol), lit("")).as("__t"),
      length(coalesce(col(textCol), lit(""))).as("__n"))
    val bounds = d
      .withColumn("cl",
        graft.functions.CdcCuts.cdcCuts(col("__t"), w, avgChunk))
      .select(col("__doc"), col("__t"),
        array_distinct(concat(col("cl"), array(col("__n")))).as("ends"))
    val chunks = bounds
      .select(col("__doc"), col("__t"), col("ends"),
        posexplode(col("ends")).as(Seq("ci", "cend")))
      .select(col("__doc"),
        when(col("ci") === 0, lit(1))
          .otherwise(element_at(col("ends"), col("ci")) + lit(1))
          .as("cstart"),
        col("cend"), col("__t"))
      .filter(col("cend") >= col("cstart"))
      .select(col("__doc"),
        md5(col("__t").substr(col("cstart"),
          col("cend") - col("cstart") + lit(1))).as("chunk_fp"),
        (col("cend") - col("cstart") + lit(1)).cast("long").as("chunk_len"))
    chunks.groupBy(col("chunk_fp"))
      .agg(max(col("chunk_len")).as("chunk_len"),
        countDistinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs && col("chunk_len") >= minLen)
  }

  /** C4-style boilerplate excision (Raffel et al. 2020 §2.2 — C4 drops
    * any three-sentence span that occurs more than once in the corpus):
    * REWRITES each document with every cross-document-repeated span
    * removed, where a span is a fixed non-overlapping `chunkTokens`
    * window (sentence boundaries don't survive tokenized corpora — the
    * same granularity argument as [[duplicateChunks]], which only
    * REPORTS the spans; this is the cleaning step that consumes them).
    * A window is boilerplate iff its exact text occurs in ≥ `minDocs`
    * DISTINCT documents; surviving windows are re-joined in original
    * order. Documents that lose every window survive with empty
    * `clean_text` (the caller decides whether to drop them — C4 does).
    *
    * Scale shape: the corpus explodes ONCE into non-overlapping windows
    * and is consumed twice — (a) the window-frequency aggregate,
    * map-side combined down to |distinct window fps| and filtered to
    * the (small) hot set, (b) the annotate join back, keyed by the md5
    * fingerprint so the probe side never carries window text into the
    * exchange. The rewrite itself is one groupBy(doc) whose collect_list
    * holds only the document's OWN windows (bounded by document length,
    * not corpus size) re-ordered by a local array_sort. A corpus-wide
    * boilerplate fp is a hot join key; the build side is the filtered
    * aggregate, so AQE's skew split applies. No window text ever sorts
    * globally.
    *
    * @return idCol, n_chunks, n_kept_chunks, n_kept_tokens, clean_text
    */
  def boilerplateStrip(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, minDocs: Int = 2): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(minDocs >= 2, "minDocs < 2 would strip every window")
    val ch = df
      .select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), size(col("__w")) - 1, lit(chunkTokens))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        least(size(col("__w")) - col("col"), lit(chunkTokens))
          .cast("long").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__w"), col("col") + 1, lit(chunkTokens)))
          .as("chunk_text"))
      .withColumn("chunk_fp", md5(col("chunk_text")))
    val hot = ch.groupBy(col("chunk_fp"))
      .agg(countDistinct(col(idCol)).as("__n_docs"))
      .filter(col("__n_docs") >= minDocs)
      .select(col("chunk_fp"), lit(true).as("__hot"))
    ch.join(hot, Seq("chunk_fp"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("__hot").isNull, 1)).as("n_kept_chunks"),
        coalesce(sum(when(col("__hot").isNull, col("n_chunk_tokens"))),
          lit(0L)).as("n_kept_tokens"),
        // when() without otherwise is NULL on hot rows; collect_list
        // drops nulls, so the array holds exactly the kept windows.
        array_join(transform(
          array_sort(collect_list(
            when(col("__hot").isNull,
              struct(col("chunk_idx"), col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("clean_text"))
  }

  /** 64-bit rolling fingerprint over tokens — Spark-side (not portable
    * SQL, so not oracled). The fold chains xxhash64(acc, tok) rather than
    * the classic acc*31+h polynomial: under ANSI mode (Spark 4's default)
    * the multiply-add raises ARITHMETIC_OVERFLOW instead of wrapping.
    * aggregate() keeps it an expression fold, no UDF.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1125899906842597L),
      (acc, tok) => xxhash64(acc, tok))

  /** Corpus bigram collocations by integer LIFT — the log-free PMI
    * surrogate `lift = P(xy) / (P(x)·P(y)) = c_xy·N / (c_x·c_y)` on an
    * e6 grid (taking the log would order identically and cost the
    * cross-engine float; the RANKING is the deliverable). The classic
    * "which token pairs are units" signal a tokenizer/phrase-mining
    * pass runs corpus-side.
    *
    * Plan shape: bigrams are built INSIDE the token array (zip_with of
    * the two shifted slices — map-only, no positional self-join), so
    * the corpus is scanned once for unigrams and once for bigrams; the
    * two count tables join on the bigram's words and the top-k resolves
    * as TakeOrderedAndProject under the (lift DESC, bigram ASC) total
    * order. `minCount` prunes the hapax tail before the join — at
    * corpus scale the bigram long tail is most of the table and all of
    * it is noise at support < minCount.
    *
    * Grid bound: `c_xy·10^6·N` must fit int64 — fine to N ≈ 9·10^6 at
    * worst-case c_xy = N; far beyond that, swap the product order or
    * widen to decimal (documented, not silently wrong: the multiply
    * would overflow loudly under ANSI mode).
    */
  def bigramLift(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    val toks = expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')")
    val t = docs.select(toks.as("w"))
    val uni = t.select(explode(col("w")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // N = Σ unigram counts — derived from the count table itself, so it
    // rides a one-row broadcast instead of an eager driver count; the
    // uni subtree is identical across its consumers, so AQE reuses its
    // shuffle stage at runtime (pinned on the final plan in
    // PlanAuditSpec — the corpus tokenizes once per side, not per use)
    val total = uni.agg(sum(col("c")).as("__n"))
    val bg = t.select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> concat(a, ' ', b))")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    bg
      .join(uni.select(col("tok").as("__w1"), col("c").as("__c1")),
        expr("split(b, ' ')[0] = __w1"))
      .join(uni.select(col("tok").as("__w2"), col("c").as("__c2")),
        expr("split(b, ' ')[1] = __w2"))
      .crossJoin(broadcast(total))
      .select(col("b").as("bigram"), col("n_pair"),
        expr("(n_pair * 1000000 * __n) div (__c1 * __c2)").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("bigram").asc)
      .limit(k)
  }

  /** Vocabulary coverage curve: for each k in `ks`, the share of ALL
    * corpus tokens covered by the top-k vocabulary under the
    * (count DESC, token ASC) total order — the "how big must the
    * tokenizer vocab be" sizing curve.
    *
    * Scale shape: the corpus is reduced once to token counts; the only
    * ordered structure is a TakeOrdered of max(ks) rows (bounded heap,
    * never a vocabulary-wide sort), and the rank window runs on that
    * ≤ max(ks)-row frame (the bounded-domain window precedent). The
    * total N rides a one-row broadcast.
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "ks must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = expr(s"filter(split(lower($textCol), '\\\\s+'), x -> x != '')")
    val counts = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // Σ counts = N, one-row broadcast; the counts subtree is IDENTICAL
    // in both consumers, so AQE reuses its shuffle stage at runtime
    // (pinned on the final plan in PlanAuditSpec)
    val total = counts.agg(sum(col("c")).as("total_tokens"))
    val top = counts.orderBy(col("c").desc, col("tok").asc)
      .limit(ks.max)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok").asc)).cast("long"))
    ks.toDF("k").crossJoin(top)
      .filter(col("rank") <= col("k"))
      .groupBy(col("k"))
      .agg(sum(col("c")).as("covered_tokens"))
      .crossJoin(broadcast(total))
      .withColumn("coverage_e6",
        expr("(covered_tokens * 1000000) div total_tokens"))
      .orderBy(col("k"))
  }

  /** Flesch reading-ease readability on an exact integer micro grid —
    * the classic "is this prose or word salad" quality feature
    * (Flesch 1948; the public formula: 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words)).
    *
    * Counting heuristics, all single-regex so the feature stays map-only
    * and codegen'd (whole-stage, no UDF):
    *  - words     = `\S+` runs, min 1;
    *  - sentences = `[.!?]+` runs, min 1 (an unpunctuated doc is one
    *    sentence);
    *  - syllables = `[aeiouy]+` vowel groups in the lowercased text,
    *    floored at the word count (every word has ≥ 1 syllable) — the
    *    standard vowel-group estimator, applied corpus-side where a
    *    dictionary syllabifier cannot run.
    *
    * The score is computed with integer division on a 10⁶ grid
    * (`fre_micro` = 206835000 − (1015000·words) div sentences −
    * (84600000·syllables) div words) — bit-identical in any engine,
    * unlike the float form whose last ulp depends on evaluation order.
    * Range roughly (−∞, 206.835e6]; 60–70e6 ≈ plain English.
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nw = greatest(size(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))), lit(1))
      .cast("long")
    val ns = greatest(size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val nv = size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    df.select(col(idCol), nw.as("n_words"), ns.as("n_sentences"),
        greatest(nv, nw).as("n_syllables"))
      .withColumn("fre_micro",
        lit(206835000L)
          - expr("(1015000 * n_words) div n_sentences")
          - expr("(84600000 * n_syllables) div n_words"))
  }
}
