package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore

/** Sparse lexical retrieval: BM25 top-k documents per query — the
  * classic inverted-index scorer (Robertson/Spärck Jones; the Lucene
  * `k1/b` practical form with the always-positive idf) that a training
  * pipeline runs for eval-set decontamination sweeps, targeted corpus
  * audits, and hard-negative mining.
  *
  * Scale shape (100 TB corpus, bounded query set):
  *  - the per-(doc, term) tf table is ONE explode + map-side-combined
  *    aggregate over the corpus;
  *  - the query side (terms of all queries) BROADCASTS — the join
  *    immediately restricts the posting stream to query terms, so
  *    everything downstream is |matching postings|, not corpus-scale;
  *  - per-(query, doc) accumulation is a hash aggregate of integer
  *    term scores, and per-query top-k ships through the bounded
  *    [[TopKByScore]] heap (k rows per query per map partition cross
  *    the shuffle — never the full scored list).
  *
  * Determinism: each (doc, term) BM25 contribution is floor-quantized
  * to e4 BEFORE summation (the [[NgramLm]] pattern), so document
  * scores are exact integers, ties break by ascending doc id, and a
  * SQL oracle can reproduce the ranking value-identically.
  */
object Retrieval {

  private def toks(textCol: String): Column =
    split(coalesce(col(textCol), lit("")), "\\s+")

  /** Per-query BM25 top-k over `docs`. `queries` are (query_id, text)
    * literals — the bounded query-set configuration (an eval suite, an
    * audit probe list). Output: (query_id, doc_id, score_e4, rank),
    * rank 1..k by (score DESC, doc ASC).
    */
  def bm25TopK(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, queries: Seq[(Int, String)], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && k >= 1)
    val q = queries.flatMap { case (qid, text) =>
      text.split("\\s+").filter(_.nonEmpty).map(t => (qid, t))
    }.toDF("query_id", "term")
    bm25TopKFromTerms(docs, idCol, textCol, q, k, k1, b,
      excludeSelf = false)
  }

  /** BM25 core over a (query_id, term) query frame — the generalized
    * form behind [[bm25TopK]] (literal queries) and [[hybridRrfTopK]]
    * (probe DOCUMENTS as queries, more-like-this style). Duplicate
    * (query_id, term) pairs are dropped; `excludeSelf` removes the
    * query_id == doc_id match (a probe document trivially top-ranks
    * itself). The query frame must be bounded — it broadcasts.
    */
  def bm25TopKFromTerms(docs: DataFrame, idCol: String, textCol: String,
      q: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1)
    // corpus statistics: one tokenization pass feeds tf, doclen, df
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(toks(textCol)).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N over all docs (empty ones included — they are retrievable-never
    // but still corpus members for idf) and the term-stream total ride
    // the PLAN as one-row broadcast subqueries instead of eager driver
    // actions — a bm25 call costs one job, not three corpus scans. The
    // arithmetic is unchanged: the same doubles, now as columns
    // (avgdl ≡ term_tot / n_docs, the identical division).
    val nd = docs.agg(countDistinct(col(idCol)).cast("double").as("n_docs"))
    val ad = terms.agg(count(lit(1)).cast("double").as("term_tot"))

    // idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene's BM25 form,
    // always positive; tf_norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("term_tot") / col("n_docs")
    val tfNorm = (col("tf") * (lit(k1) + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    val contrib0 = tf
      .join(broadcast(q.distinct()), Seq("term")) // postings of query terms only
      .join(broadcast(dfreq.join(broadcast(q.select("term").distinct()),
        Seq("term"))), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(nd))
      .crossJoin(broadcast(ad))
      .select(col("query_id"), col("doc_id"),
        floor(lit(10000.0) * idf * tfNorm).cast("long").as("c_e4"))
    val contrib =
      if (excludeSelf) contrib0.filter(col("doc_id") =!= col("query_id"))
      else contrib0

    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c_e4")).as("score_e4"))
    val top = scored.groupBy("query_id")
      .agg(TopKByScore.topKByScore(
        struct(col("score_e4"), col("doc_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.id").as("doc_id"),
        col("e.score").as("score_e4"), (col("i") + 1).cast("int").as("rank"))
    top
  }

  /** MATERIALIZED inverted index: tokenize `docs` once and land the
    * postings — (term, doc_id, tf, dl), doclen DENORMALIZED onto each
    * posting so the query path never joins a length table — as a
    * tx-warehouse date partition, range-clustered on `term` into
    * `termFiles` files so the manifest's per-file term ranges prune a
    * query's posting read to the files its terms land in. A sibling
    * one-row-per-day `stats` partition records (n_docs, term_tot) —
    * corpus N and avgdl resolve from an O(days) read of that tiny
    * table, never a corpus scan. Partition semantics follow the
    * warehouse contract: re-indexing a date REPLACES its postings and
    * stats atomically (idempotent re-ingest), so the index tracks a
    * continuously-loaded corpus the way the dedup signature index does
    * (TableOps.copyToRaw precedent).
    */
  def indexDocs(spark: SparkSession, wh: graft.tableops.TxWarehouse,
      postingsPath: String, statsPath: String, docs: DataFrame,
      idCol: String, textCol: String, date: java.time.LocalDate,
      termFiles: Int = 16): Unit = {
    val d = java.sql.Date.valueOf(date)
    val terms = docs.select(col(idCol).as("doc_id"),
        explode(toks(textCol)).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val postings = tf.join(dl, Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .withColumn("date", lit(d))
      .repartitionByRange(termFiles, col("term"))
    val stats = docs.agg(countDistinct(col(idCol)).as("n_docs"))
      .crossJoin(terms.agg(count(lit(1)).as("term_tot")))
      .withColumn("date", lit(d))
    wh.overwritePartition(spark, postings, postingsPath, date)
    wh.overwritePartition(spark, stats, statsPath, date): Unit
  }

  /** CHANGE-FEED-DRIVEN index maintenance — [[indexDocs]]'s incremental
    * dual: instead of re-deriving a whole day when anything in it
    * changes, consume the docs table's manifest diff since the last
    * indexed version and merge only the CHANGED documents' postings.
    * A mid-day correction (a deletion-vector GDPR delete, a merge
    * upsert, a dedup rewrite) then costs O(changed files), never a
    * day — the `s18_incr_agg` exactly-once pattern applied to the
    * retrieval index family.
    *
    * Mechanics per increment (docs table moved v₀ → v₁, where v₀ is
    * the watermark the LAST increment committed under `appId`):
    *
    *  - `diffSnapshots(v₀, v₁)` yields insert/delete-tagged rows of
    *    exactly the changed files — deletion-vector changes included
    *    (each side reads under its own version's vectors);
    *  - both sides re-tokenize INTO postings; the delta change set is
    *    (all insert-side postings as upserts) ∪ (delete-side keys with
    *    no insert-side counterpart as deletes) — so a rewritten doc's
    *    vanished terms are deleted, surviving terms upserted with
    *    fresh tf/dl, and untouched documents never appear;
    *  - [[graft.tableops.TxWarehouse.mergeIntoTxn]] applies the delta
    *    keyed (term, doc_id) carrying `T appId v₁` — a crashed/
    *    replayed increment is a no-op (exactly-once index contents);
    *  - the stats table gets a DELTA row (Δn_docs, Δterm_tot) via
    *    `appendTxn` under the same watermark: [[bm25TopKIndexed]] SUMS
    *    stats rows, so deltas compose with the full-build rows.
    *
    * First call (no watermark) degenerates to the full build. Assumes
    * the docs table's `idCol` is unique per snapshot (the mergeInto
    * invariant the warehouse already enforces for keyed tables).
    *
    * @return true when an increment was applied, false when the index
    *         was already at the docs table's head.
    */
  def indexDocsIncremental(spark: SparkSession,
      wh: graft.tableops.TxWarehouse, postingsPath: String,
      statsPath: String, docsPath: String, idCol: String, textCol: String,
      appId: String, statsDate: java.time.LocalDate): Boolean = {
    val v1 = wh.currentVersion(spark, docsPath)
    // resume point = the LAGGING of the two watermarks: a crash between
    // the postings merge and the stats append re-runs the increment,
    // the merge skips on ITS watermark, and the stats delta lands —
    // exactly-once on both tables without a cross-table transaction
    val v0 = math.max(0L, math.min(
      wh.lastTxn(spark, postingsPath, appId),
      wh.lastTxn(spark, statsPath, appId)))
    if (v1 <= v0) return false
    val changes = wh.diffSnapshots(spark, docsPath, v0, v1)
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        col("date"), col("_change_type"))
      .persist()
    try {
      def postingsOf(side: String): DataFrame = {
        val terms = changes.filter(col("_change_type") === side)
          .select(col("doc_id"), col("date"),
            explode(toks("__text")).as("term"))
          .filter(length(col("term")) > 0)
        val tf = terms.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"), first(col("date")).as("date"))
        val dl = terms.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        tf.join(dl, Seq("doc_id"))
          .select(col("term"), col("doc_id"), col("tf"), col("dl"),
            col("date"))
      }
      val newPost = postingsOf("insert").persist()
      val oldPost = postingsOf("delete")
      try {
        // keys present before but not after: DELETE (covers vanished
        // docs AND vanished terms of rewritten docs)
        val gone = oldPost.select(col("term"), col("doc_id"))
          .join(newPost.select(col("term"), col("doc_id")),
            Seq("term", "doc_id"), "left_anti")
          .select(col("term"), col("doc_id"),
            lit(null).cast("long").as("tf"),
            lit(null).cast("long").as("dl"),
            lit(null).cast("date").as("date"),
            lit(true).as("__del"))
        val delta = newPost.withColumn("__del", lit(false))
          .unionByName(gone)
        wh.mergeIntoTxn(spark, delta, postingsPath,
          Seq("term", "doc_id"), Some("__del"), appId, v1): Unit
        // stats delta: net document count (rewrite survivors cancel)
        // and net token count — bm25TopKIndexed sums stats rows, so a
        // delta row composes with full-build rows
        val insD = changes.filter(col("_change_type") === "insert")
          .select(col("doc_id")).distinct()
        val delD = changes.filter(col("_change_type") === "delete")
          .select(col("doc_id")).distinct()
        val nNew = insD.join(delD, Seq("doc_id"), "left_anti").count()
        val nGone = delD.join(insD, Seq("doc_id"), "left_anti").count()
        val tokIns = newPost.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
        val tokDel = oldPost.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
        import spark.implicits._
        val statsDelta = Seq((nNew - nGone, tokIns - tokDel,
            java.sql.Date.valueOf(statsDate)))
          .toDF("n_docs", "term_tot", "date")
        wh.appendTxn(spark, statsDelta, statsPath, appId, v1): Unit
        true
      } finally { newPost.unpersist(): Unit }
    } finally { changes.unpersist(): Unit }
  }

  /** BM25 top-k over the MATERIALIZED index — value-identical to
    * [[bm25TopK]] on the same corpus (same statistics, same float
    * evaluation order, same quantize-before-sum), but the corpus text
    * is never re-tokenized: the query reads the stats table (O(days)
    * rows) plus ONLY the posting files whose recorded term ranges
    * overlap the query terms. At archive scale a bounded query set
    * costs O(files overlapping its terms), not O(corpus) — the
    * retrieval analog of the dedup signature index.
    */
  def bm25TopKIndexed(spark: SparkSession, wh: graft.tableops.TxWarehouse,
      postingsPath: String, statsPath: String,
      queries: Seq[(Int, String)], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty && k >= 1)
    val qPairs = queries.flatMap { case (qid, text) =>
      text.split("\\s+").filter(_.nonEmpty).map(t => (qid, t))
    }.distinct
    val qTerms = qPairs.map(_._2).distinct
    // corpus stats: O(days) rows
    val st = wh.read(spark, statsPath)
      .agg(sum(col("n_docs")).cast("double").as("n_docs"),
        sum(col("term_tot")).cast("double").as("term_tot")).head()
    val nDocs = st.getDouble(0)
    val termTot = st.getDouble(1)
    // postings of the query terms only — manifest term ranges prune
    val p = wh.readWhere(spark, postingsPath,
      col("term").isin(qTerms.map(x => x: Any): _*))
    val dfreq = p.groupBy("term").agg(count(lit(1)).as("df"))
    val q = qPairs.toDF("query_id", "term")
    // identical arithmetic to bm25TopKFromTerms: N/avgdl as double
    // literals instead of broadcast one-row subqueries — same doubles,
    // same left-associative evaluation, same e4 floor
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = lit(termTot) / lit(nDocs)
    val tfNorm = (col("tf") * (lit(k1) + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    val contrib = p
      .join(broadcast(q), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        floor(lit(10000.0) * idf * tfNorm).cast("long").as("c_e4"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum(col("c_e4")).as("score_e4"))
    scored.groupBy("query_id")
      .agg(TopKByScore.topKByScore(
        struct(col("score_e4"), col("doc_id")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.id").as("doc_id"),
        col("e.score").as("score_e4"), (col("i") + 1).cast("int").as("rank"))
  }

  /** Hybrid retrieval: reciprocal-rank fusion of a sparse (BM25,
    * more-like-this over the probe document's own text) and a dense
    * (cosine over the probe's embedding) ranked list — the standard
    * two-tower + lexical fusion a retrieval-augmented pipeline runs for
    * hard-negative mining and duplicate auditing (Cormack/Clarke/
    * Büttcher RRF, k₀ = 60).
    *
    * Probes are the bounded id range `[0, probeMax)` present in BOTH
    * tables (doc_id ≡ vec_id in the corpus contract). Each arm ranks
    * its own top-`kEach` (self-match excluded); fusion scores
    * `Σ floor(1e6 / (k₀ + rank))` over the arms — floor-quantized PER
    * ARM before the sum, so scores are exact integers and ties break
    * (score DESC, doc ASC) identically in any engine.
    *
    * Scale shape: both arms' outputs are |probes|·kEach rows — the
    * fusion join and final top-k never touch corpus scale; the corpus
    * cost is exactly one BM25 statistics pass (map-side-combined
    * aggregates restricted to broadcast probe terms) plus one
    * broadcast-probe cosine scan.
    */
  def hybridRrfTopK(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      probeMax: Long, kEach: Int, kOut: Int, rrfK: Int = 60,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(kEach >= 1 && kOut >= 1 && rrfK >= 0)
    val probeTerms = docs.filter(col(idCol) < probeMax)
      .select(col(idCol).cast("long").as("query_id"),
        explode(toks(textCol)).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val sparse = bm25TopKFromTerms(docs, idCol, textCol, probeTerms,
      kEach, k1, b, excludeSelf = true)
    val dense = Similarity.cosineTopK(emb, embIdCol, vecCol,
      col(embIdCol) < probeMax, kEach)

    // floor(1e6/(k0+r)) per arm: exactly-representable integer division,
    // correctly rounded in IEEE-754 — identical in Spark and the oracle
    def contrib(rank: Column): Column =
      floor(lit(1000000.0) / (lit(rrfK) + rank)).cast("long")
    val cS = sparse.select(col("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      contrib(col("rank")).as("c_sparse"))
    val cD = dense.select(col("query_id").cast("long").as("query_id"),
      col("nbr_id").cast("long").as("doc_id"),
      contrib(col("rank")).as("c_dense"))
    val fused = cS.join(cD, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(col("c_sparse"), lit(0L)) +
          coalesce(col("c_dense"), lit(0L))).as("rrf_e6"))
    fused.groupBy("query_id")
      .agg(TopKByScore.topKByScore(
        struct(col("rrf_e6"), col("doc_id")), kOut).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.id").as("doc_id"),
        col("e.score").as("rrf_e6"), (col("i") + 1).cast("int").as("rank"))
  }
}
