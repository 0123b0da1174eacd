package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-similarity deduplication over text corpora — the scale
  * generalization of the reference's exact-key dedup (SURVEY.md §7.5).
  *
  * Four tiers, in increasing recall/cost:
  *   1. exact       — hash-groupBy on a content fingerprint; one shuffle.
  *   2. ngramJaccard — blocked all-pairs 3-gram-shingle Jaccard; quadratic
  *      within a block, so blocks must be bounded (lang × length bucket).
  *   3. minhashLsh  — shingle → minhash signature → banded LSH buckets →
  *      candidate pairs → exact-Jaccard verification. Near-linear: the
  *      only all-pairs work happens inside an LSH bucket.
  *   4. simhash     — 64-bit simhash + banded hamming search.
  *
  * At 100 TB: tiers 3/4 are the real path — signatures are built in one
  * explode+groupBy (shuffle ~ corpus tokens), buckets are tiny, and the
  * verify join touches only candidate pairs. Tier 2 exists as the oracle-
  * checkable ground truth at test scale.
  */
object TextDedup {

  // per-invocation suffix for observed-metric names (must be unique
  // within a single query plan)
  private val obsId = new java.util.concurrent.atomic.AtomicInteger(0)

  // ---------- shingles ----------

  /** Distinct k-token shingles of a text column (default 3-gram).
    *
    * PERFORMANCE TRAP: referencing this whole expression inlines the
    * `split` into every lambda position — the text is then re-split once
    * per shingle index (quadratic per doc; measured 4-9× slower than the
    * two-projection form). Operators below use [[withHashedShingles]],
    * which materializes the token array in its own projection first
    * (CollapseProject keeps multiply-referenced non-cheap aliases
    * unmerged). This Column form exists for small/one-off use.
    */
  def shingles(text: org.apache.spark.sql.Column, k: Int = 3): org.apache.spark.sql.Column = {
    val w = split(text, "\\s+")
    val shingled = transform(sequence(lit(0), size(w) - k),
      i => concat_ws(" ", slice(w, i + 1, lit(k))))
    when(size(w) >= k, array_distinct(shingled)).otherwise(array_distinct(w))
  }

  /** Projects `keepCols` plus `sh: array<long>` of distinct hashed
    * k-shingles via the codegen'd [[graft.functions.ShingleHashes]]
    * expression (one straight-line JVM call per row; the declarative HOF
    * formulation is interpreted per element AND gets re-expanded by
    * predicate pushdown — see [[shingles]] scaladoc and the expression's).
    * Parity between the two forms is spec-enforced (ShingleHashesSpec).
    *
    * coalesce makes the chain non-nullable, which stops
    * InferFiltersFromConstraints from deriving isnotnull(size(sh)) checks
    * that pushdown would re-expand below the projection (null text ≡
    * empty text here).
    */
  /** Fan out an under-partitioned input before heavy per-row work
    * (guide §2.5 "input skew: one huge unsplittable file" — the
    * small-table limit of the same problem): a sub-split scan is ONE
    * task, so everything Spark fuses into the scan stage — shingle
    * hashing, per-window md5, per-token explode+aggregate — runs
    * single-threaded while every other core idles (round-16 stage
    * audit: the documents scan+shingle stage was 1 task × 560-900 ms
    * inside every pair-mining query). One round-robin exchange of a
    * few MB buys core-count parallelism for all downstream per-row
    * compute. Applied ONLY inside the compute-heavy operators: pure
    * map-only queries (gopher rules, readability, unigram score)
    * measured 2× WORSE with a blanket scan fan-out — their whole
    * compute is cheaper than the exchange. At production scale the
    * branch never fires: any input above one split already scans in
    * parallel. Filters/pruning push through Repartition, so
    * PushedFilters/ReadSchema at the scan are unchanged.
    */
  private[operators] def ensureParallel(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  def withHashedShingles(
      docs: DataFrame, keepCols: Seq[String], textCol: String, k: Int = 3
  ): DataFrame =
    ensureParallel(docs).select(keepCols.map(col) :+
      graft.functions.GraftFunctions
        .shingleHashes(coalesce(col(textCol), lit("")), k).as("sh"): _*)

  /** Projects `keepCols` plus `shs: array<string>` of distinct k-shingle
    * STRINGS (two projections — tokens materialized first, see
    * [[shingles]] scaladoc for the inlining trap). Used by the md5-based
    * cross-engine-verifiable tiers, which must hash the shingle text with
    * a function the SQL oracle also has.
    */
  def withShingleStrings(
      docs: DataFrame, keepCols: Seq[String], textCol: String, k: Int = 3
  ): DataFrame = {
    val toks = ensureParallel(docs).select(keepCols.map(col) :+
      split(coalesce(col(textCol), lit("")), "\\s+").as("__w"): _*)
    val w = col("__w")
    val shingled = transform(sequence(lit(0), size(w) - k),
      i => concat_ws(" ", slice(w, i + 1, lit(k))))
    toks.select(keepCols.map(col) :+
      when(size(w) >= k, array_distinct(shingled))
        .otherwise(array_distinct(w)).as("shs"): _*)
  }

  /** 60-bit hash from the first 15 hex chars of md5 — the one hash family
    * both Spark and ANSI-SQL oracles (DuckDB: CAST(concat('0x', substr(
    * md5(x),1,15)) AS BIGINT)) can compute bit-identically. Slower than
    * xxhash64; used only by the *_md5 verification tiers.
    */
  def md5Long(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  // ---------- tier 1: exact ----------

  /** Exact dedup: keep the lowest-id document per identical (normalized)
    * content. One hash shuffle on the fingerprint.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp)
    docs.withColumn("__keep", min(col(idCol)).over(w) === col(idCol))
      .filter(col("__keep")).drop("__keep")
  }

  // ---------- tier 2: blocked n-gram Jaccard ----------

  /** All-pairs 3-gram Jaccard within blocks. Returns candidate duplicate
    * pairs (id_a < id_b) with floor-scaled jaccard.
    *
    * @param blockCols columns bounding the quadratic blow-up; pairs are only
    *        formed within identical block values.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      minJaccardE4: Long
  ): DataFrame = {
    val base = withHashedShingles(docs, idCol +: blockCols, textCol)
    val a = base.toDF(base.columns.map(c => s"a_$c").toIndexedSeq: _*)
    val b = base.toDF(base.columns.map(c => s"b_$c").toIndexedSeq: _*)
    val blockCond = blockCols.map(c => a(s"a_$c") === b(s"b_$c")).reduce(_ && _)
    val inter = size(array_intersect(a("a_sh"), b("b_sh")))
    a.join(b, blockCond && a(s"a_$idCol") < b(s"b_$idCol"))
      .select(
        a(s"a_$idCol").as("id_a"),
        b(s"b_$idCol").as("id_b"),
        floor(inter * lit(10000.0) /
          (size(a("a_sh")) + size(b("b_sh")) - inter)).cast("long").as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)
  }

  /** Length-banded all-pairs Jaccard. Semantics: emit (id_a < id_b,
    * jaccard_e4) for every pair whose length buckets overlap (each doc
    * covers buckets floor(len/bw) and floor(len/bw)+1, so bucket overlap
    * ⟺ |Δbucket| ≤ 1), |Δlen| ≤ maxDelta, and 3-gram-shingle Jaccard ≥
    * threshold. Near-dup texts rarely preserve metadata but always
    * preserve approximate length — this blocking found 25/25 planted
    * near-dups in the test corpus where (lang, source) blocking found 1/25.
    *
    * Execution is an inverted shingle index, NOT a bucket-blocked
    * array-vs-array join: shingles are hashed to longs once (distinctness
    * preserved modulo a ~2^-64 xxhash64 collision) and pairs are formed
    * only between docs that actually share a shingle — a pair below the
    * threshold with zero overlap costs nothing. |A ∩ B| falls out of a
    * count per pair and |A ∪ B| = |A| + |B| − |A ∩ B|; no shingle array
    * crosses the pair shuffle. Measured on the 5k-doc corpus: 203k
    * shingle-pair rows vs ~5M in-bucket array comparisons for the
    * blocked formulation.
    *
    * With the stop-list active (the default), the index is ONE
    * `groupBy(h).collect_list` whose posting lists are bounded by the
    * cap — hot shingles are removed BEFORE this aggregation, so no
    * buffer can exceed `maxShingleDocFreq` entries — and pairs expand
    * in-group: one corpus scan for the doc-freq count, one for the
    * postings, no posting-vs-posting join and no duplicated plan branch.
    * With the cap disabled, posting lists are unbounded, so the pair
    * formation falls back to a plain self-join on the shingle hash
    * (which never materializes a group in memory).
    *
    * Hot-shingle skew guard: a shingle appearing in f docs emits f² pair
    * rows into ONE join key — boilerplate shingles (license headers,
    * navigation chrome) make f reach 10⁵+ on web corpora, so the first
    * thing to die at 100× is that one task. A frequency stop-list
    * pre-pass (one map-side-combined `groupBy(h).count`, shuffle =
    * |distinct shingles|, then a broadcast anti-join of the few hot
    * hashes) drops shingles with doc-freq > `maxShingleDocFreq` from the
    * inverted index BEFORE the pair join. Semantics are the standard
    * stop-list: BOTH sets are filtered, so Jaccard is computed over the
    * surviving shingles only — |A ∩ B| from the pair counts and |A|,|B|
    * recomputed from the surviving postings (keeping the pre-filter sizes
    * would overstate |A ∪ B| by the shared hot shingles and bias the
    * score low near the threshold). A shingle shared by thousands of docs
    * carries ~zero similarity signal, but a qualifying pair whose entire
    * overlap is hot shingles is missed — the standard stop-list trade.
    * The default cap (128) is 5× the max doc-freq observed in the test
    * corpus (25 at sf0.1), so test-scale results are bit-identical to the
    * unguarded plan. Dropped-shingle stats are published through
    * `Dataset.observe` under a per-invocation metric name
    * "jaccard_stoplist_<n>" (`hot_shingles`, `dropped_postings`) —
    * readable via a QueryExecutionListener matching the prefix, zero
    * extra jobs.
    */
  def lengthBandedJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, lenCol: String,
      bucketWidth: Int = 32, maxDelta: Int = 32, minJaccardE4: Long = 5000,
      maxShingleDocFreq: Int = 128
  ): DataFrame = {
    val base = withHashedShingles(docs, Seq(idCol, lenCol), textCol)
      .withColumn("b0", floor(col(lenCol) / lit(bucketWidth.toDouble)).cast("long"))
      .withColumn("sz", size(col("sh")))
    def scorePairs(pairs: DataFrame): DataFrame = pairs
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDelta &&
        abs(col("b0_a") - col("b0_b")) <= 1)
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * lit(10000.0) /
          (col("sz_a") + col("sz_b") - col("inter"))).cast("long").as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)

    if (maxShingleDocFreq <= 0) {
      // unbounded posting lists: self-join on the shingle hash (never
      // materializes a whole posting list in one buffer)
      val ex = base.select(col(idCol), col(lenCol), col("b0"), col("sz"),
        explode_outer(col("sh")).as("h"))
      val a = ex.select(col(idCol).as("id_a"), col(lenCol).as("len_a"),
        col("b0").as("b0_a"), col("sz").as("sz_a"), col("h"))
      val b = ex.select(col(idCol).as("id_b"), col(lenCol).as("len_b"),
        col("b0").as("b0_b"), col("sz").as("sz_b"), col("h"))
      scorePairs(a.join(b, Seq("h")))
    } else {
      // Observed-metric names must be unique within one query plan
      // (composing two stop-listed pair sets into a single action would
      // otherwise fail analysis), so each invocation gets a fresh
      // "jaccard_stoplist_<n>" — listeners should match on the prefix.
      // shingles are distinct within a doc, so count(h) IS doc-frequency
      val hot = base.select(explode(col("sh")).as("h"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > maxShingleDocFreq)
        .observe(s"jaccard_stoplist_${obsId.getAndIncrement()}",
          count(lit(1)).as("hot_shingles"),
          coalesce(sum(col("df")), lit(0L)).as("dropped_postings"))
      // Standard stop-list semantics filter BOTH sets: the hot hashes are
      // collected into ONE row (bounded by |postings|/cap — broadcastable
      // by construction), broadcast-cross-joined, and removed from each
      // doc's shingle ARRAY before the explode, so both the surviving
      // postings and the `sz` that enters the denominator come from the
      // same filtered set. Keeping the pre-filter size(sh) would
      // overstate |A ∪ B| by the shared hot shingles and bias Jaccard
      // low exactly on the boilerplate-heavy pairs the guard targets.
      val hotArr = hot.agg(collect_list(col("h")).as("hot_hs"))
      val postings = base.crossJoin(broadcast(hotArr))
        .withColumn("shf", array_except(col("sh"), col("hot_hs")))
        .select(col(idCol).as("id"), col(lenCol).as("len"), col("b0"),
          size(col("shf")).as("szf"), explode(col("shf")).as("h"))
      // In-group pair expansion: every surviving shingle has doc-freq ≤
      // cap, so the collect_list buffer is bounded and the f² blow-up is
      // structurally impossible. One posting shuffle (groupBy h) replaces
      // the self-join's two join exchanges + extra corpus scan; pairs
      // leave each group as bare (id, len, b0, sz) pairs — bytes, not
      // arrays. sort_array orders by id, so i<j gives id_a < id_b.
      val groups = postings.groupBy(col("h"))
        .agg(sort_array(collect_list(struct(col("id"), col("len"),
          col("b0"), col("szf")))).as("ps"))
        .filter(size(col("ps")) > 1)
      // codegen'd upper-triangle expansion (same pairs, same i-major
      // order as the HOF form it replaced — see UpperTrianglePairs)
      val pairs = groups
        .select(explode(graft.functions.UpperTrianglePairs
          .upperTrianglePairs(col("ps"))).as("p"))
        .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
          col("p.a.len").as("len_a"), col("p.b.len").as("len_b"),
          col("p.a.b0").as("b0_a"), col("p.b.b0").as("b0_b"),
          col("p.a.szf").as("sz_a"), col("p.b.szf").as("sz_b"))
      scorePairs(pairs)
    }
  }

  /** Shingle-containment pairs: (id_a < id_b, contain_e4) where
    * contain_e4 = floor(10⁴ · |A ∩ B| / min(|A|, |B|)) ≥ the threshold —
    * the ASYMMETRIC overlap Jaccard misses: a short document wholly
    * embedded in a much longer one (quoted article inside an aggregator
    * page, excerpt inside a compilation) scores |A|/|A∪B| ≈ 0 on Jaccard
    * but 10⁴ on containment. The standard companion pass to near-dup
    * dedup in training-data pipelines.
    *
    * Execution mirrors [[lengthBandedJaccardPairs]]'s inverted-index
    * form — postings grouped per shingle hash, in-group (id, size) pair
    * expansion, one map-side-combined count per pair — WITHOUT the
    * length banding (containment pairs have wildly different lengths by
    * definition, so length blocking would throw away exactly the pairs
    * sought). Candidate volume is therefore Σ_shingle df² rather than
    * band-bounded: the doc-frequency stop-list is the load-bearing guard
    * here (default cap 128, same filtered-set semantics — hot shingles
    * removed from BOTH sets and sizes recomputed, drops published via
    * `Dataset.observe`). With the cap disabled the pair stream falls
    * back to a posting self-join that never materializes a group.
    */
  def containmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      minContainE4: Long = 6000, maxShingleDocFreq: Int = 128
  ): DataFrame = {
    // NOT persisted: the hashed-shingle projection feeds both the
    // doc-frequency pass and the postings build, but measured at sf0.1
    // the double hashing costs ~5% of the query — the pair expansion
    // and count aggregation dominate — and materializing (id, sh) for
    // a whole corpus is exactly the footprint a 100 TB run cannot
    // afford. Recompute is the right trade here.
    val base = withHashedShingles(docs, Seq(idCol), textCol)
    def score(pairs: DataFrame): DataFrame = pairs
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        floor(col("inter") * lit(10000.0) / least(col("sz_a"), col("sz_b")))
          .cast("long").as("contain_e4"))
      .filter(col("contain_e4") >= minContainE4)
    if (maxShingleDocFreq <= 0) {
      val ex = base.select(col(idCol), size(col("sh")).as("sz"),
        explode_outer(col("sh")).as("h"))
      val a = ex.select(col(idCol).as("id_a"), col("sz").as("sz_a"), col("h"))
      val b = ex.select(col(idCol).as("id_b"), col("sz").as("sz_b"), col("h"))
      score(a.join(b, Seq("h")).filter(col("id_a") < col("id_b")))
    } else {
      val hot = base.select(explode(col("sh")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") > maxShingleDocFreq)
        .observe(s"containment_stoplist_${obsId.getAndIncrement()}",
          count(lit(1)).as("hot_shingles"),
          coalesce(sum(col("df")), lit(0L)).as("dropped_postings"))
      val hotArr = hot.agg(collect_list(col("h")).as("hot_hs"))
      val postings = base.crossJoin(broadcast(hotArr))
        .withColumn("shf", array_except(col("sh"), col("hot_hs")))
        .select(col(idCol).as("id"), size(col("shf")).as("szf"),
          explode(col("shf")).as("h"))
      val groups = postings.groupBy(col("h"))
        .agg(sort_array(collect_list(struct(col("id"), col("szf")))).as("ps"))
        .filter(size(col("ps")) > 1)
      val pairs = groups
        .select(explode(graft.functions.UpperTrianglePairs
          .upperTrianglePairs(col("ps"))).as("p"))
        .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
          col("p.a.szf").as("sz_a"), col("p.b.szf").as("sz_b"))
      score(pairs)
    }
  }

  // ---------- cross-corpus decontamination ----------

  /** Benchmark decontamination: for each training document, the number of
    * distinct k-gram shingles it shares with ANY document of an
    * evaluation/benchmark corpus. The standard pre-training hygiene pass
    * (largescale pipelines drop or flag training docs whose n-gram
    * overlap with a benchmark exceeds a threshold); k=3 here at test
    * scale where published pipelines use 8-13 — the plumbing is
    * k-agnostic.
    *
    * Scale shape: benchmark suites are small relative to the training
    * corpus (10³-10⁵ docs ⇒ ≤10⁷ distinct shingle hashes — tens of MB of
    * longs), so the eval side is reduced to DISTINCT hashes and
    * broadcast; the training side streams through a broadcast-hash inner
    * join with NO shuffle of the (huge) training postings, and the only
    * exchange is the map-side-combined count by doc id. Returns
    * (idCol, n_hits) for contaminated docs only — n_hits is the distinct
    * shared-shingle count since shingles are distinct within a doc.
    *
    * Set `broadcastEval = false` if the eval corpus is itself huge; the
    * planner then falls back to a shuffled hash join keyed by shingle
    * hash (hot boilerplate shingles in the TRAINING corpus are harmless
    * here — a training posting matches at most one eval hash row, so no
    * f² blow-up exists in this join).
    */
  def decontaminate(
      train: DataFrame, eval: DataFrame, idCol: String, textCol: String,
      k: Int = 3, broadcastEval: Boolean = true
  ): DataFrame = {
    val evalHashes = withHashedShingles(eval, Nil, textCol, k)
      .select(explode(col("sh")).as("h")).distinct()
    val ev = if (broadcastEval) broadcast(evalHashes) else evalHashes
    withHashedShingles(train, Seq(idCol), textCol, k)
      .select(col(idCol), explode(col("sh")).as("h"))
      .join(ev, Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  // ---------- tier 3: MinHash + LSH ----------

  /** MinHash signatures: one row per doc with `numHashes` min-hash values.
    * Lane i is min over distinct shingles of xxhash64(i, h0), where h0 is
    * the shingle-string xxhash64 — the variable-length string is hashed
    * ONCE, the seeded variants re-hash the fixed 8-byte value, same
    * minhash statistics. (A multiply-add universal family would be
    * cheaper still but needs wrapping arithmetic, which ANSI mode —
    * Spark 4's default — turns into overflow errors.)
    *
    * A signature is a per-document scalar, so it is computed row-locally
    * by the codegen'd [[graft.functions.MinhashXxSignature]] expression —
    * no shingle explode, no numHashes-way aggregate, no shuffle of the
    * shingle stream (spec-enforced equal to that declarative
    * formulation).
    */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, numHashes: Int = 32
  ): DataFrame =
    docs.select(col(idCol),
      graft.functions.GraftFunctions
        .minhashXxSignature(coalesce(col(textCol), lit("")), numHashes).as("sig"))

  /** LSH candidate pairs from banded signatures: docs sharing any band
    * bucket. bands must divide numHashes.
    *
    * @param numHashes signature width — REQUIRED (every producer of a
    *        signature frame knows it); a discover-from-data fallback
    *        would execute the whole upstream signature pipeline at
    *        plan-build time just to read one array length.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int,
      numHashes: Int, maxBucketSize: Int = 0): DataFrame = {
    require(numHashes > 0, "numHashes must be positive")
    require(bands > 0 && numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val banded = sigs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
    ).select(col(idCol), col("pos").as("band"), col("col").as("bucket"))
    // Pairs are expanded per bucket from one collect_list, NOT via a
    // banded self-join: a self-join would re-execute the whole signature
    // pipeline once per branch (signatures aren't materialized), and here
    // the groupBy shuffles only (band, bucket, id) — bytes, not arrays.
    pairsWithinGroups(banded, Seq("band", "bucket"), idCol, maxBucketSize)
      .distinct()
  }

  /** (id_a < id_b) pairs of ids sharing identical values of groupCols —
    * one shuffle, quadratic only inside a group.
    *
    * @param maxGroupSize skew guard: groups larger than this are DROPPED
    *        (|g|² pair rows from one hot bucket land in one task — the
    *        standard LSH mitigation, since a bucket shared by thousands of
    *        docs carries no similarity signal anyway). <= 0 disables.
    *        When enabled, dropped-bucket stats are published through
    *        `Dataset.observe` under a per-invocation metric name
    *        "lsh_bucket_cap_<n>" (`dropped_buckets`, `dropped_ids`) so
    *        the cap is surfaced, not hidden.
    */
  private[operators] def pairsWithinGroups(
      df: DataFrame, groupCols: Seq[String], idCol: String,
      maxGroupSize: Int = 0): DataFrame = {
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
    val bounded =
      if (maxGroupSize > 0) {
        val over = size(col("ids")) > maxGroupSize
        grouped
          .observe(s"lsh_bucket_cap_${obsId.getAndIncrement()}",
            coalesce(sum(when(over, lit(1L)).otherwise(lit(0L))), lit(0L))
              .as("dropped_buckets"),
            coalesce(sum(when(over, size(col("ids")).cast("long"))
              .otherwise(lit(0L))), lit(0L)).as("dropped_ids"))
          .filter(!over)
      } else grouped
    bounded
      .select(explode(graft.functions.UpperTrianglePairs
        .upperTrianglePairs(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification against the shingle sets.
    */
  def minhashDedupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, minJaccardE4: Long = 8000
  ): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes)
    val cands = lshCandidates(sigs, idCol, bands, numHashes)
    // hashed-long shingles for the verify join (see lengthBandedJaccardPairs)
    val sh = withHashedShingles(docs, Seq(idCol), textCol)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val verified = cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard_e4",
        floor(inter * lit(10000.0) /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).cast("long"))
    verified.filter(col("jaccard_e4") >= minJaccardE4)
      .select("id_a", "id_b", "jaccard_e4")
  }

  /** Sketch-calibration pairs: every LSH candidate pair carrying BOTH
    * the exact shingle Jaccard and the minhash-signature estimate
    * (agreeing lanes / numHashes, e4 grid) plus their absolute error —
    * the measurement row for the minhash tier, the way `sim_ann_recall`
    * measures the IVF probe. E[est] = true Jaccard per lane (the
    * classic MinHash identity), so the error column is the direct
    * empirical check of the 1/√numHashes sketch noise on the corpus the
    * tier actually dedups. Candidates only (not all pairs): the
    * calibration question is "how well does the sketch rank what the
    * LSH surfaced", bounded by the banding like the dedup tier itself.
    */
  def minhashCalibrationPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8
  ): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes)
    val cands = lshCandidates(sigs, idCol, bands, numHashes)
    val sh = withHashedShingles(docs, Seq(idCol), textCol)
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("jaccard_e4",
        floor(inter * lit(10000.0) /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).cast("long"))
      .withColumn("est_e4", expr(
        "(aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), " +
          s"0, (a, x) -> a + x) * 10000) div $numHashes").cast("long"))
      .select(col("id_a"), col("id_b"), col("jaccard_e4"), col("est_e4"),
        abs(col("est_e4") - col("jaccard_e4")).as("abs_err_e4"))
  }

  // ---------- tier 4: SimHash ----------

  /** Near-dup pairs from fingerprints: candidates share at least one
    * exact-matching band of `bandBits` bits, verified with
    * bit_count(xor) ≤ maxHamming. In-bucket pair expansion (see
    * lshCandidates): one shuffle of (band, bucket, id, simhash); a banded
    * self-join would run the vote aggregation once per branch.
    */
  private def simhashBandedPairs(sh: DataFrame, idCol: String, bands: Int,
      bandBits: Int, maxHamming: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    val banded = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("simhash"), b * bandBits).bitwiseAND(mask)): _*)))
      .select(col(idCol), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    banded.groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"),
        col("simhash").as("s")))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(graft.functions.UpperTrianglePairs
        .upperTrianglePairs(col("xs"))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        bit_count(col("p.a.s").bitwiseXOR(col("p.b.s"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** 64-bit SimHash per document over 3-gram shingles (raw tokens are far
    * too coarse when the vocabulary is small — distinct-token sets collide
    * across unrelated docs): per-shingle xxhash64, each bit votes ±1,
    * fingerprint bit set where the vote is positive. Computed row-locally
    * by the codegen'd [[graft.functions.SimhashXx]] expression (a
    * fingerprint is a per-document scalar; spec-enforced equal to the
    * explode + 64-vote aggregate formulation).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.functions.GraftFunctions
        .simhashXx(coalesce(col(textCol), lit(""))).as("simhash"))

  /** Near-dup pairs by SimHash hamming distance: candidates share at least
    * one of 4 exact-matching 16-bit bands, verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simhashBandedPairs(simhash(docs, idCol, textCol), idCol,
      bands = 4, bandBits = 16, maxHamming = maxHamming)

  /** Cross-engine-verifiable SimHash: 60-bit fingerprints from the md5
    * hash family ([[md5Long]]) over shingle strings, 4 bands of 15 bits.
    * Same algorithm as [[simhashPairs]]; exists so a plain-SQL oracle can
    * recompute the output bit for bit (xxhash64 has no SQL equivalent).
    *
    * The fingerprint is a per-document scalar, so it is computed row-
    * locally by the codegen'd [[graft.functions.SimhashMd5]] expression —
    * no shingle explode, no 60-vote aggregate, no shuffle before banding
    * (the declarative explode+groupBy formulation is spec-enforced
    * equivalent). The xxhash64 tier remains the fast path.
    */
  def simhashMd5Pairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 6): DataFrame =
    simhashBandedPairs(
      docs.select(col(idCol),
        graft.functions.GraftFunctions
          .simhashMd5(coalesce(col(textCol), lit(""))).as("simhash")),
      idCol, bands = 4, bandBits = 15, maxHamming = maxHamming)

  /** Cross-engine-verifiable MinHash-LSH: signatures from seeded md5
    * re-hashes of the per-shingle md5 ([[md5Long]] — seed g hashes the
    * decimal string "g#h0", and each 128-bit digest yields TWO 60-bit
    * lanes, hex chars 1-15 and 16-30, so 16 minhash lanes cost 8 string
    * hashes), banded into `bands` buckets, candidates verified with exact
    * Jaccard over the md5-hashed shingle sets.
    *
    * A signature is a per-document scalar, so it is computed row-locally
    * by the codegen'd [[graft.functions.MinhashMd5Signature]] expression —
    * no shingle explode, no numHashes-way aggregate, no shuffle before
    * banding (measured ~6× over the explode+groupBy formulation, which is
    * spec-enforced equivalent). The verify join re-derives the shingle
    * hash sets per branch via [[graft.functions.ShingleMd5Hashes]] — at
    * warehouse scale, materialize that column once as the minhash index
    * table instead. The xxhash64 tier remains the fast path.
    */
  def minhashMd5DedupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, minJaccardE4: Long = 5000
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(numHashes % 2 == 0, "numHashes must be even (2 lanes per digest)")
    val text = coalesce(col(textCol), lit(""))
    val sigs = docs.select(col(idCol),
      graft.functions.GraftFunctions.minhashMd5Signature(text, numHashes).as("sig"))
    val hl = docs.select(col(idCol),
      graft.functions.GraftFunctions.shingleMd5Hashes(text).as("hl"))
    val rpb = numHashes / bands
    val banded = sigs.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rpb + 1, lit(rpb))))))
      .select(col(idCol), col("pos").as("band"), col("col").as("bucket"))
    val cands = pairsWithinGroups(banded, Seq("band", "bucket"), idCol).distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    cands
      .join(hl.select(col(idCol).as("id_a"), col("hl").as("sh_a")), "id_a")
      .join(hl.select(col(idCol).as("id_b"), col("hl").as("sh_b")), "id_b")
      .withColumn("jaccard_e4",
        floor(inter * lit(10000.0) /
          (size(col("sh_a")) + size(col("sh_b")) - inter)).cast("long"))
      .filter(col("jaccard_e4") >= minJaccardE4)
      .select("id_a", "id_b", "jaccard_e4")
  }

  // ---------- incremental (new-batch vs seen-corpus) dedup ----------

  /** Incremental dedup: filter a NEW ingest batch against an already-
    * ingested SEEN corpus — the continuous-ingest counterpart of the batch
    * tiers above (the reference's incremental model is exactly this: each
    * daily partition re-enters dedup against what is already in raw,
    * SURVEY.md §2.7). A new document is dropped when
    *
    *   1. its exact content fingerprint already exists in the seen corpus
    *      (tier 1: md5(lower(trim(text))) anti-join), or
    *   2. a MinHash-LSH band bucket it occupies is shared with a seen
    *      document whose exact shingle-set Jaccard is ≥ `minJaccardE4`
    *      (tier 3 semantics, md5 hash family so a SQL oracle can recompute
    *      the decision bit for bit).
    *
    * Returns the SURVIVING new documents with their original columns.
    *
    * Scale shape: the seen side's (fingerprint) and (band, bucket →
    * doc, signature) tables are the persistent dedup INDEX — at warehouse
    * scale they are materialized tables appended to as each batch lands,
    * not recomputed per batch (here they are derived inline from
    * `seenDocs`; the plan below the index boundary is identical). A daily
    * batch is orders of magnitude smaller than the accumulated corpus, so
    * the batch side broadcasts through both probes: the fingerprint
    * anti-join and the band-bucket join stream the big index with NO
    * shuffle of the seen corpus, and only candidate (new, seen) pairs —
    * bucket collisions, near-linear by LSH design — reach the Jaccard
    * verify join. Set `broadcastNew = false` when the batch itself is
    * large; both probes then fall back to shuffled hash joins keyed by
    * fingerprint / (band, bucket).
    */
  /** @param cacheBatch persist the tier-1 survivor batch (it feeds three
    *        plan branches — ~30% faster measured). Callers that hold the
    *        result long after the first action (e.g. a long-running
    *        monitor) should pass false: the cache has no unpersist handle
    *        through this API, so it would pin executor blocks per call.
    */
  def incrementalNearDupFilter(
      newDocs: DataFrame, seenDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, minJaccardE4: Long = 5000,
      broadcastNew: Boolean = true, cacheBatch: Boolean = true
  ): DataFrame =
    // one implementation, two entry points: the inline path IS the
    // indexed path probing an index derived on the fly from the seen
    // corpus — decision-identity between them holds by construction
    // (Catalyst prunes whichever index columns a probe branch does not
    // use, so the plans match the previously hand-split form). The
    // materialized-table variant below is the warehouse-scale entry.
    incrementalNearDupFilterIndexed(newDocs,
      nearDupIndex(seenDocs, idCol, textCol, numHashes, bands),
      idCol, textCol, numHashes, bands, minJaccardE4, broadcastNew, cacheBatch)

  /** Materialized near-dup INDEX rows for `docs` — the table form of the
    * "persistent dedup index" [[incrementalNearDupFilter]]'s scale note
    * describes: one row per document carrying its exact content
    * fingerprint (`__fp`), its banded MinHash bucket keys (`__buckets`,
    * one per band), and its md5 shingle-hash set (`__hl`). At warehouse
    * scale this is a TABLE, appended as each batch archives (the same
    * append the raw copy performs), so the daily filter reads the raw
    * TEXT of the day only — per-increment cost O(batch + index probes)
    * instead of re-deriving every signature of the accumulated corpus.
    * All three columns are row-local codegen'd expressions — building
    * the index is a map-only scan, and the values are bit-identical to
    * what the inline path derives (md5 family, SQL-oracle-reproducible).
    */
  def nearDupIndex(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rpb = numHashes / bands
    // TWO projections, with the band array STATICALLY UNROLLED so
    // `__sig` is referenced `bands` times: CollapseProject inlines a
    // single-use alias regardless of cost, and a lambda-form
    // transform(sequence(...)) references the signature only once — the
    // collapse then lets the generator's inferred size()>0 constraint
    // re-expand the FULL MinHash computation into the scan filter,
    // re-hashing every document's shingles twice (measured 3× on
    // dd_incremental). The unroll keeps the signature materialized in
    // its own projection (same discipline as withHashedShingles) and
    // folds the size constraint away (a literal array's size is known).
    val withSig = docs.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("__fp"),
      graft.functions.GraftFunctions
        .minhashMd5Signature(coalesce(col(textCol), lit("")), numHashes)
        .as("__sig"),
      graft.functions.GraftFunctions
        .shingleMd5Hashes(coalesce(col(textCol), lit(""))).as("__hl"))
    withSig.select(col(idCol), col("__fp"),
      array((0 until bands).map(b =>
        concat_ws(",", slice(col("__sig"), b * rpb + 1, rpb))): _*)
        .as("__buckets"),
      col("__hl"))
  }

  /** CHANGE-FEED maintenance of a MATERIALIZED [[nearDupIndex]] held as
    * a tx-warehouse table — the dedup-index analog of
    * [[graft.operators.Retrieval.indexDocsIncremental]]: consume the
    * docs table's manifest diff since the last indexed version
    * (deletion-vector changes included) and merge only the CHANGED
    * documents' signature rows, keyed on the doc id (one index row per
    * document). A correction to the archive — a GDPR vector delete, a
    * merge upsert, a dedup rewrite — then costs O(changed files), and
    * [[incrementalNearDupFilterIndexed]] probes an index that TRACKS
    * the archive instead of drifting from it (a stale index makes the
    * incremental filter both under-delete, missing new seen docs, and
    * over-delete against corpses). Watermarked exactly-once via the
    * merge's `T appId version` marker; first call is the full build.
    *
    * @return true when an increment was applied.
    */
  def nearDupIndexIncremental(spark: org.apache.spark.sql.SparkSession,
      wh: graft.tableops.TxWarehouse, indexPath: String, docsPath: String,
      idCol: String, textCol: String, appId: String,
      numHashes: Int = 16, bands: Int = 4): Boolean = {
    val v1 = wh.currentVersion(spark, docsPath)
    val v0 = math.max(0L, wh.lastTxn(spark, indexPath, appId))
    if (v1 <= v0) return false
    val changes = wh.diffSnapshots(spark, docsPath, v0, v1)
      .select(col(idCol), col(textCol), col("date"), col("_change_type"))
      .persist()
    try {
      val ins = changes.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val delIds = changes.filter(col("_change_type") === "delete")
        .select(col(idCol)).distinct()
      // upserts: fresh signature rows for every insert-side doc (a
      // rewritten doc's row is replaced whole — one row per doc, so no
      // vanished-subkey bookkeeping applies); deletes: delete-side docs
      // with no insert-side counterpart
      val upserts = nearDupIndex(ins, idCol, textCol, numHashes, bands)
        .join(ins.select(col(idCol), col("date")), Seq(idCol))
        .withColumn("__del", lit(false))
      val gone = delIds
        .join(ins.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
        .withColumn("__del", lit(true))
      val delta = upserts.unionByName(gone, allowMissingColumns = true)
      wh.mergeIntoTxn(spark, delta, indexPath, Seq(idCol), Some("__del"),
        appId, v1).isDefined
    } finally { changes.unpersist(): Unit }
  }

  /** [[incrementalNearDupFilter]] probing a materialized [[nearDupIndex]]
    * instead of the seen corpus' raw text — decision-identical for an
    * index built with the same (numHashes, bands) (spec-asserted), but
    * the seen side never touches text again: tier 1 probes `__fp`,
    * the band join probes exploded `__buckets`, and the Jaccard verify
    * reads `__hl` for exactly the candidate ids. Same two-step broadcast
    * discipline as the inline path — the index streams map-only.
    */
  def incrementalNearDupFilterIndexed(
      newDocs: DataFrame, index: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4, minJaccardE4: Long = 5000,
      broadcastNew: Boolean = true, cacheBatch: Boolean = true
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def bc(df: DataFrame): DataFrame = if (broadcastNew) broadcast(df) else df

    val newFp = newDocs.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
    val matchedFps = index.select(col("__fp"))
      .join(bc(newFp.select(col("__fp")).distinct()), Seq("__fp")).distinct()
    val fresh0 = newFp.join(bc(matchedFps), Seq("__fp"), "left_anti").drop("__fp")
    val fresh =
      if (cacheBatch)
        fresh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else fresh0

    val rpb = numHashes / bands
    val newBands = fresh.select(col(idCol),
      graft.functions.GraftFunctions
        .minhashMd5Signature(coalesce(col(textCol), lit("")), numHashes).as("sig"))
      .select(col(idCol).as("new_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws(",", slice(col("sig"), b * rpb + 1, lit(rpb))))))
      .select(col("new_id"), col("pos").as("band"), col("col").as("bucket"))
    // OUTER explode: plain posexplode lets the optimizer infer a
    // size(__buckets) > 0 constraint and push it — substituted through
    // the projections — into the seen-side scan filter, where a derived
    // (non-materialized) index then recomputes the FULL MinHash per row
    // just to decide the always-true non-emptiness. __buckets has
    // exactly `bands` elements by construction, so outer vs inner
    // explode emit identical rows
    val seenBands = index
      .select(col(idCol).as("seen_id"), posexplode_outer(col("__buckets")))
      .select(col("seen_id"), col("pos").as("band"), col("col").as("bucket"))
    val cands = bc(newBands).join(seenBands, Seq("band", "bucket"))
      .select(col("new_id"), col("seen_id")).distinct()

    val inter = size(array_intersect(col("hl_a"), col("hl_b")))
    val dupNewIds = cands
      .join(fresh.select(col(idCol).as("new_id"),
        graft.functions.GraftFunctions
          .shingleMd5Hashes(coalesce(col(textCol), lit(""))).as("hl_a")), "new_id")
      .join(index.select(col(idCol).as("seen_id"), col("__hl").as("hl_b")), "seen_id")
      .filter(floor(inter * lit(10000.0) /
        (size(col("hl_a")) + size(col("hl_b")) - inter)).cast("long") >= minJaccardE4)
      .select(col("new_id")).distinct()

    fresh.join(bc(dupNewIds), col(idCol) === col("new_id"), "left_anti")
  }

  // ---------- near-dup clustering ----------

  /** Connected components of an undirected (id_a, id_b) pair graph:
    * every node's label converges to the smallest id reachable from it —
    * the canonical "keep one representative per near-dup cluster" step
    * after any pair-producing tier above.
    *
    * Hybrid execution. The pair graph is the OUTPUT of dedup blocking —
    * orders of magnitude smaller than the corpus — so it frequently fits
    * the driver: at or below `localEdgeThreshold` edges (default 2^20 ≈
    * 16 MB) components come from a single collect + union-find, paying
    * one job instead of O(diameter) iterative sweeps (the sweep's
    * fixed per-job latency dominates at that size; requires integral
    * ids). Above the threshold, distributed min-label propagation: each
    * sweep is one shuffle join + aggregate, converging in O(component
    * diameter) sweeps — near-dup clusters are dense and shallow, so real
    * corpora converge in a few. Labels and edges are persisted across
    * sweeps (each iteration would otherwise re-execute the whole
    * upstream pair pipeline).
    */
  def minLabelClusters(pairs: DataFrame, maxIters: Int = 25,
      localEdgeThreshold: Long = 1L << 20,
      pairsDistinct: Boolean = false): DataFrame = {
    val spark = pairs.sparkSession
    // single-pass symmetrization: a union of two selects over `pairs`
    // would execute the whole upstream pair pipeline once per branch
    // (measured 2×); exploding both directions from one scan doesn't.
    // Every pair tier in this library emits unique (id_a < id_b) rows
    // (they end in a groupBy or distinct), so callers pass
    // pairsDistinct = true and skip a full-edge-set exchange; the
    // defensive dedup remains the default for arbitrary input.
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    val edges = (if (pairsDistinct) sym else sym.distinct()).persist()
    val nEdges = edges.count()
    val idType = edges.schema.fields.head.dataType
    val localizable = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.StringType).contains(idType)
    if (nEdges <= localEdgeThreshold && localizable) {
      import spark.implicits._
      if (idType == org.apache.spark.sql.types.StringType) {
        val es = edges.as[(String, String)].collect()
        edges.unpersist()
        // order by UTF-8 BYTES, matching Spark's string min() — Java's
        // UTF-16 compareTo disagrees on supplementary characters, which
        // would pick a different representative than the distributed path
        implicit val utf8Order: Ordering[String] =
          (a: String, b: String) =>
            org.apache.spark.unsafe.types.UTF8String.fromString(a)
              .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
        TextDedup.unionFindMinLabel(es).toDF("id", "label")
      } else {
        val es = edges.select(col("src").cast("long"), col("dst").cast("long"))
          .as[(Long, Long)].collect()
        edges.unpersist()
        // cast back to the INPUT's integral type: the distributed path
        // preserves it, and the two paths must return one schema — which
        // branch fires is an edge-count heuristic, not a contract
        TextDedup.unionFindMinLabel(es).toDF("id", "label")
          .select(col("id").cast(idType), col("label").cast(idType))
      }
    } else {
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")).persist()
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIters) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("dlabel")).as("nlabel"))
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
          .persist()
        changed = next
          .join(labels.select(col("id"), col("label").as("old")), "id")
          .filter(col("label") =!= col("old")).count()
        labels.unpersist()
        labels = next
        it += 1
      }
      if (changed > 0)
        System.err.println(s"[minLabelClusters] WARNING: not converged after " +
          s"$maxIters sweeps ($changed labels still moving) — a component's " +
          "diameter exceeds maxIters; labels are an upper bound, not minima")
      edges.unpersist()
      // NOTE: the returned frame is persisted (it is the loop's final
      // frontier); long-lived callers should unpersist() it after use
      labels
    }
  }

  /** Driver-side union-find: every node labeled with its component's
    * minimum. Union always points the larger root at the smaller, so
    * find() of any node IS the component minimum.
    */
  private[operators] def unionFindMinLabel[A](es: Array[(A, A)])(
      implicit ord: Ordering[A]): Seq[(A, A)] = {
    val parent = scala.collection.mutable.Map[A, A]()
    def find(x: A): A = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ord.compare(ra, rb) != 0) parent(ord.max(ra, rb)) = ord.min(ra, rb)
    }
    parent.keys.toSeq.sorted.map(n => (n, find(n)))
  }

  /** Quality-aware cluster representative selection: for each near-dup
    * cluster, keep the member with the HIGHEST score (ties → lowest id)
    * — the policy real pipelines run instead of keep-lowest-id (keep
    * the longest / highest-quality duplicate, drop the rest). Input is
    * [[minLabelClusters]]'s (id, label) frame plus a scored document
    * frame; output one row per cluster: (label, keep_id, score,
    * cluster_size).
    *
    * Scale shape: the clusters↔scores join hashes on the doc id, and
    * the argmax is a `min_by` aggregate with map-side partial combine
    * (one winner per cluster per map partition crosses the shuffle) —
    * no per-cluster window sort.
    */
  def bestRepresentatives(clusters: DataFrame, docs: DataFrame,
      idCol: String, scoreCol: String): DataFrame =
    clusters
      .join(docs.select(col(idCol).as("id"), col(scoreCol).as("score")), "id")
      .groupBy(col("label"))
      .agg(
        min_by(struct(col("id"), col("score")),
          struct((-col("score")).as("neg"), col("id"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("label"), col("best.id").as("keep_id"),
        col("best.score").as("score"), col("cluster_size"))

  // ---------- exact-substring dedup (k-gram anchors) ----------

  /** `(doc, window-start, fingerprint)` for EVERY k-token window of every
    * document — the k-gram anchor stream behind [[duplicateSubstringSpans]]
    * and [[duplicateSubstringStrip]]. The token array is materialized in
    * its own projection first (the [[shingles]] performance-trap note),
    * and only the 32-hex md5 anchor — never window text — crosses any
    * exchange.
    */
  private def kgramAnchors(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val d = ensureParallel(df).select(col(idCol).as("__doc"),
        split(coalesce(col(textCol), lit("")), "\\s+").as("__w"))
      .filter(size(col("__w")) >= k)
    d.select(col("__doc"),
        posexplode(transform(sequence(lit(0), size(col("__w")) - k),
          i => md5(concat_ws(" ", slice(col("__w"), i + 1, lit(k)))))))
      .select(col("__doc"), col("pos").cast("long").as("pos"),
        col("col").as("fp"))
  }

  /** EXACT-substring dedup, the reporting half (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better",
    * arXiv:2107.06499 — ExactSubstr): every maximal span of ≥ k tokens
    * whose text occurs elsewhere in the corpus (any other position, same
    * or different document), as (doc, span_start, span_len) — the
    * modality BETWEEN chunk-grain dedup ([[TextAnalysis.duplicateChunks]]
    * misses spans that straddle chunk boundaries) and whole-doc near-dup
    * (minhash misses a duplicated paragraph inside an otherwise-unique
    * document). Lee et al. build a corpus suffix array; the equivalent
    * k-gram-anchor form used here marks every k-token window whose
    * fingerprint occurs ≥ `minOcc` times and merges overlapping/adjacent
    * marked windows per document into maximal spans — every duplicated
    * substring of length ≥ k is covered by ≥ 1 duplicated window and is
    * therefore inside a reported span (windows shorter than k are below
    * the dedup threshold by definition, exactly the suffix-array
    * `min-match-length` knob).
    *
    * Scale shape — banded, never all-pairs: the anchor stream is one
    * explode of the corpus (O(total tokens) rows of (doc, pos, 16-byte
    * fp)); the duplicate-anchor set comes from a map-side-combined
    * count per fp (corpus-hot boilerplate fps collapse map-side — no
    * hot-key window, no pair expansion; the ≥minOcc filter is applied
    * to the AGGREGATE, so a fp duplicated a million times costs one
    * count row); the join back is fp-keyed (AQE skew-split applies,
    * build side is the filtered aggregate); and the island merge sorts
    * only each document's OWN duplicated positions (bounded by document
    * length, not corpus size). Nothing is ever quadratic in occurrences.
    *
    * @return idCol, span_start (1-based token index), span_len (tokens),
    *         n_windows (duplicated k-windows merged into the span)
    */
  def duplicateSubstringSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, minOcc: Int = 2): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(minOcc >= 2, "minOcc < 2 would mark every window")
    // The anchor stream feeds BOTH the duplicate-fp aggregate and the
    // join probe side; without a cache the corpus is tokenized and every
    // window md5-hashed TWICE (round-16 plan audit: two Scan+Generate
    // subtrees). MEMORY_AND_DISK: the cached rows are (id, pos, fp) —
    // O(total tokens)·~48 B, strictly cheaper to re-read than to
    // re-hash (k-token concat + md5 per window) at any scale. Lifetime
    // contract = CorpusPipeline.clean's gated frame: one-shot runs let
    // session teardown collect it.
    val wf = kgramAnchors(df, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = wf.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
      .select(col("fp"))
    val dup = wf.join(hot, "fp").select(col("__doc"), col("pos"))
    // gaps-and-islands over each doc's duplicated window positions:
    // windows at p and q overlap or touch when q - p <= k, so a gap
    // > k starts a new maximal span. Both window functions share one
    // (partition, order) spec — a single per-doc sort.
    val byDoc = Window.partitionBy(col("__doc")).orderBy(col("pos"))
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("isl", sum(col("brk")).over(byDoc))
      .groupBy(col("__doc"), col("isl"))
      .agg((min(col("pos")) + 1).as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col("__doc").as(idCol), col("span_start"), col("span_len"),
        col("n_windows"))
  }

  /** EXACT-substring dedup, the rewriting half: strip from every
    * document each token covered by a NON-CANONICAL duplicated k-window,
    * where the canonical occurrence of a window fingerprint is its
    * corpus-wide minimum (doc, pos) — so exactly one copy of every
    * duplicated substring survives (Lee et al. 2022 §3.2 keep-one
    * semantics; contrast [[TextAnalysis.boilerplateStrip]], whose
    * C4-style rule excises EVERY copy at fixed-chunk grain).
    * Deterministic: the canonical choice is a pure function of the
    * corpus, no sampling, no float.
    *
    * Scale shape: same anchor stream as [[duplicateSubstringSpans]]; the
    * canonical occurrence per fp is a map-side-combined `min(struct(doc,
    * pos))` — deliberately NOT a row_number window, which would sort a
    * corpus-hot boilerplate fp's million occurrences in one task. The
    * covered-token expansion (k rows per window) runs only on the
    * duplicate-occurrence stream — output-sized, not corpus-sized — and
    * the rewrite groups each doc's own covered indices (bounded by doc
    * length).
    *
    * @return idCol, n_tokens, n_removed_tokens, clean_text
    */
  def duplicateSubstringStrip(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val d = df.select(col(idCol).as("__doc"),
      split(coalesce(col(textCol), lit("")), "\\s+").as("__w"))
    // same two-consumer shape as duplicateSubstringSpans: cache the
    // anchor stream so the corpus is tokenized + window-hashed once
    val wf = kgramAnchors(df, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = wf.groupBy(col("fp"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("__doc"), col("pos"))).as("canon"))
      .filter(col("cnt") >= 2)
      .select(col("fp"), col("canon"))
    val nonCanonical = wf.join(canon, "fp")
      .filter(struct(col("__doc"), col("pos")) =!= col("canon"))
      .select(col("__doc"), col("pos"))
    val covered = nonCanonical
      .select(col("__doc"),
        explode(sequence(col("pos") + 1, col("pos") + k)).as("ti"))
      .distinct()
      .groupBy(col("__doc"))
      .agg(sort_array(collect_list(col("ti"))).as("cl"))
    // in-row rewrite: one codegen'd merge pass over (tokens ascending,
    // covered ascending) — O(n+m) per document where the lambda form
    // (filter + array_contains per token) is O(n·m); a long heavily-
    // duplicated document pays linear, not quadratic (StripCovered)
    d.join(covered, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        size(col("__w")).cast("long").as("n_tokens"),
        coalesce(size(col("cl")), lit(0)).cast("long")
          .as("n_removed_tokens"),
        graft.functions.StripCovered.stripCovered(col("__w"),
          coalesce(col("cl"), array().cast("array<long>")))
          .as("clean_text"))
  }
}
