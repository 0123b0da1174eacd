package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — SURVEY.md §7.5 extension surface.
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: IVF — vectors
  * are bucketed by nearest centroid and only same-bucket pairs are scored;
  * with C centroids the scored-pair volume drops by ~C×.
  *
  * All vector math is built from codegen'd higher-order functions
  * (zip_with + aggregate folds) over doubles — no UDFs, deterministic
  * left-to-right summation (matches an oracle doing the same fold).
  *
  * At 100 TB: broadcast the (small) query set / centroid set; the corpus
  * side streams map-only until the final per-query top-k aggregation,
  * which shuffles only k rows per query per partition (window over
  * query_id after a partial sort would be the next step; the groupBy-based
  * top-k here keeps shuffle volume at candidates, acceptable for k ≪ n).
  */
object Similarity {

  /** Left-to-right dot product of two double arrays — the codegen'd
    * [[graft.functions.VectorDot]] expression; bit-identical to the
    * interpreted `aggregate(zip_with(...))` fold it replaces.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def maybeCache(df: DataFrame, cache: Boolean): DataFrame =
    if (cache) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else df

  /** Exact brute-force top-k cosine neighbors for a query subset.
    *
    * @param embeddings (idCol, vecCol) corpus
    * @param queryPred  picks the query rows (e.g. vec_id < 10)
    * @param k          neighbors per query
    * Deterministic: ranked by (floor-scaled cosine desc, neighbor id asc).
    */
  def cosineTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int
  ): DataFrame = {
    // per-vector norms precomputed on each side (see cosineNearDupPairs)
    val corpus = embeddings.select(col(idCol).as("nbr_id"),
      asDouble(col(vecCol)).as("nbr_vec"))
      .withColumn("nbr_nrm", norm(col("nbr_vec")))
    val queries = broadcast(embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .withColumn("q_nrm", norm(col("q_vec"))))
    val scored = corpus.join(queries, col("query_id") =!= col("nbr_id"))
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
    rankedTopK(scored, k)
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell &
    * Goldstein 1998): from a relevance SHORTLIST of the `m` nearest
    * neighbors per query, greedily select `k` results maximizing
    *
    *   mmr_e8 = λ·rel_e6 − (100−λ)·max_{s ∈ selected} sim_e6(c, s)
    *
    * (λ in percent — integer arithmetic end to end; the first pick's
    * penalty term is an empty max, defined 0). Plain cosine top-k
    * returns near-duplicate result sets when the corpus has them; MMR
    * is the standard retrieval-side counterpart of the near-dup dedup
    * tiers — each further pick must EARN its place against what is
    * already shown.
    *
    * Greediness is inherently sequential in k, but the sequence is
    * CONFINED TO ONE ROW per query: the shortlist (m rows) and the
    * candidate-pair sims (≤ m² rows) are grouped per query_id and the
    * whole k-step greedy selection runs as a single order-independent
    * fold (argmax = array_min over (−mmr, nbr_id) structs; penalty =
    * array_max over the selected set's sims) — state is O(m²) per
    * query BY CONSTRUCTION, the same bound the previous k-round
    * distributed unrolling carried, without its k barrier rounds
    * (round-16 listener audit: 37 jobs / 673 tasks → 3 jobs; the
    * per-round anti-join + penalty join + argmax each round were pure
    * scheduling overhead at any m ≤ thousands). At 100 TB the brute
    * shortlist phase would be replaced by [[ivfTopKIndexed]] — the MMR
    * fold's cost depends only on |Q|·m² and never touches the corpus
    * again.
    *
    * Determinism: ties break by (mmr DESC, nbr_id ASC); all scores are
    * e6-floored integers, so cross-engine replay is exact.
    *
    * @return (query_id, nbr_id, mmr_e8, rank) — rank 1..k in pick order
    */
  def mmrTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, m: Int, k: Int, lambdaPct: Int = 70
  ): DataFrame = {
    require(m >= k && k >= 1, "need m >= k >= 1")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct in [0,100]")
    val shortlist = cosineTopK(embeddings, idCol, vecCol, queryPred, m)
      .select(col("query_id"), col("nbr_id"), col("cos_e6"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = embeddings.select(col(idCol).as("nbr_id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cands = shortlist.join(vecs, "nbr_id")
      .select(col("query_id"), col("nbr_id"), col("v"), col("nrm"))
    val pairSims = cands.as("x").join(cands.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.nbr_id") =!= col("y.nbr_id"))
      .select(col("x.query_id").as("query_id"),
        col("x.nbr_id").as("id_x"), col("y.nbr_id").as("id_y"),
        floor(dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")) * 1e6)
          .cast("long").as("sim_e6"))

    val slArr = shortlist.groupBy(col("query_id"))
      .agg(collect_list(struct(col("nbr_id"), col("cos_e6"))).as("sl"))
    val ppArr = pairSims.groupBy(col("query_id"))
      .agg(collect_list(struct(col("id_x"), col("id_y"), col("sim_e6")))
        .as("pp"))
    val lam = lambdaPct.toLong
    val oneMinusLam = (100 - lambdaPct).toLong
    // the accumulator's id type follows the shortlist schema — the fold
    // is type-generic over any orderable id, as the round-based form was
    // (a hardcoded bigint would silently null-coerce string ids)
    val idSqlType = shortlist.schema("nbr_id").dataType.sql
    // the k-step greedy fold, one row per query. Every argmax and
    // penalty max is order-independent, so collect_list's arbitrary
    // array order cannot affect the result; ties break exactly as the
    // round form did (min over (−mmr, nbr_id)). The remaining-candidate
    // guard stops early when a query runs out of UNSELECTED candidates
    // (the round form's "no pick row" behavior) — robust to duplicate
    // (query_id, nbr_id) shortlist rows, where a size(sl)-only guard
    // would emit a null-field pick from an empty argmax.
    val greedy = expr(s"""
      aggregate(
        sequence(1, $k),
        cast(array() as array<struct<nbr_id: $idSqlType, mmr_e8: bigint,
          rank: int>>),
        (acc, i) -> CASE WHEN size(
            filter(sl, c -> NOT exists(acc, a -> a.nbr_id = c.nbr_id))
          ) = 0 THEN acc ELSE
          transform(
            array(array_min(transform(
              filter(sl, c -> NOT exists(acc, a -> a.nbr_id = c.nbr_id)),
              c -> named_struct(
                'ns', -($lam * c.cos_e6 -
                  CASE WHEN size(acc) = 0 THEN 0L ELSE
                    $oneMinusLam * coalesce(array_max(transform(
                      filter(pp, p -> p.id_x = c.nbr_id AND
                        exists(acc, a -> a.nbr_id = p.id_y)),
                      p -> p.sim_e6)), 0L)
                  END),
                'nbr_id', c.nbr_id)))),
            w -> acc || array(named_struct('nbr_id', w.nbr_id,
              'mmr_e8', -w.ns, 'rank', cast(i as int))))[0]
        END,
        acc -> acc)""")
    val out = slArr.join(ppArr, Seq("query_id"), "left")
      .select(col("query_id"), explode(greedy).as("s"))
      .select(col("query_id"), col("s.nbr_id").as("nbr_id"),
        col("s.mmr_e8").as("mmr_e8"), col("s.rank").as("rank"))
    // shortlist stays persisted for the returned (lazy) plan's lifetime —
    // it feeds both the per-query fold input and the pair-sim derivation;
    // same session-teardown contract as CorpusPipeline.clean's cache
    out
  }

  /** Multi-probe sign-LSH top-k (Lv et al. 2007, "Multi-probe LSH",
    * adapted to the binary random-hyperplane family): each vector gets
    * `bands` bucket codes of `nBits/bands` sign bits
    * ([[graft.functions.SignBands]] — one codegen'd expression); a query
    * probes each band's own bucket PLUS its single-bit flips (the
    * Hamming-1 perturbations — for sign LSH these are exactly the "most
    * likely to also contain near neighbors" buckets, since flipping one
    * hyperplane sign is the smallest possible code perturbation).
    * Candidates from any probed bucket are exact-cosine re-ranked to
    * top-k.
    *
    * vs single-probe banding: (bitsPerBand+1)× the probe joins buy the
    * recall that otherwise costs MORE TABLES (more bands = more
    * corpus-side explode rows at every scale); the corpus-side index is
    * unchanged. vs brute force: the corpus is touched only through the
    * (band, bucket) equi-join — candidate volume, not |corpus|, prices
    * the exact re-rank.
    *
    * Deterministic end to end (hash planes are pseudo-random from fixed
    * mixing constants; ranking ties break by neighbor id), so the
    * candidate set — not just the final ranks — replays exactly in the
    * SQL oracle.
    *
    * @return (query_id, nbr_id, cos_e6, rank) — top-k among LSH
    *         candidates, rank 1-based by (cos DESC, id ASC)
    */
  def lshMultiprobeTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nBits: Int = 224, bands: Int = 28
  ): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val bitsPerBand = nBits / bands
    require(bitsPerBand <= 16, "flip fan-out is per band bit; keep bands wide")
    val base = embeddings.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("v"))
    val banded = base.select(col("id"),
      posexplode(graft.functions.SignBands.signBands(col("v"), nBits, bands))
        .as(Seq("band", "bucket")))
    val flips = typedLit[Seq[Long]](0L +: (0 until bitsPerBand).map(1L << _))
    // band the QUERY subset directly — same expression, same codes as
    // the corpus side, but the probe branch scans |Q| rows instead of
    // re-deriving the full corpus banding a second time
    val probes = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"),
        posexplode(graft.functions.SignBands.signBands(
          asDouble(col(vecCol)), nBits, bands)).as(Seq("band", "bucket")))
      .select(col("query_id"), col("band"),
        explode(flips).as("f"), col("bucket"))
      .select(col("query_id"), col("band"),
        col("bucket").bitwiseXOR(col("f")).as("bucket"))
    val cand = broadcast(probes).join(banded, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("nbr_id"))
      .distinct()
    val vecs = base.withColumn("nrm", norm(col("v")))
    val scored = cand
      .join(vecs.select(col("id").as("query_id"), col("v").as("q_vec"),
        col("nrm").as("q_nrm")), "query_id")
      .join(vecs.select(col("id").as("nbr_id"), col("v").as("nbr_vec"),
        col("nrm").as("nbr_nrm")), "nbr_id")
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
    rankedTopK(scored, k)
  }

  /** Per-query top-k of scored candidates via the map-side-combining
    * [[graft.functions.TopKByScore]] aggregate: only k rows per query per
    * map partition cross the shuffle, where a row_number window would
    * shuffle and sort every scored row. Same rows and ranks as the window
    * form — (cos DESC, id ASC) is a total order.
    */
  private def rankedTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct(col("cos_e6"), col("nbr_id")), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        col("col.score").as("cos_e6"), (col("pos") + 1).cast("int").as("rank"))

  /** Scalar-quantization (SQ8) top-k: every dimension is affinely mapped
    * to an unsigned byte code (the FAISS `ScalarQuantizer` QT_8bit
    * scheme), and neighbors rank by INTEGER squared distance between
    * code vectors — symmetric SDC ranking. The decisive property at
    * scale: the quantized corpus is 4× smaller than float32 (64 bytes a
    * vector), distances are exact int64 arithmetic (bit-identical in any
    * engine at any partitioning — float dot products are not), and the
    * scan is pure codegen.
    *
    *   code_i = clamp(floor((x_i − mn_i) · 255 / (mx_i − mn_i)), 0, 255)
    *
    * Training the per-dimension [mn, mx] is one posexplode +
    * map-side-combined min/max — `dim` rows collected to the driver
    * (bounded by the embedding dimension, the same contract as the PCA
    * Jacobi and gradient collects) and folded back into the quantizer
    * as literal arrays, so quantization itself is map-only expression
    * work fused into the scan. The query set broadcasts; candidates
    * reduce through the bounded-heap TopKByScore aggregate (k rows per
    * query per partition cross the shuffle).
    *
    * Determinism note: (x−mn)·255/(mx−mn) is IEEE-double arithmetic in
    * this exact association on both engines; the boundary x = mx lands
    * on 255 via the clamp regardless of rounding.
    *
    * @return (query_id, nbr_id, sqdist_q8, rank) — rank 1-based by
    *         (sqdist ASC, nbr_id ASC)
    */
  def sq8TopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int
  ): DataFrame = {
    // train: per-dimension bounds, `dim` rows — a bounded driver collect
    val stats = embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val dim = stats.size
    val mnA = array((0 until dim).map(i => lit(stats(i)._1)): _*)
    val spanA = array((0 until dim).map(i => lit(stats(i)._2 - stats(i)._1)): _*)
    def q8(vec: Column): Column = transform(vec, (x, i) =>
      when(element_at(spanA, (i + 1).cast("int")) <= 0.0, lit(0L))
        .otherwise(least(lit(255L), greatest(lit(0L),
          floor((x.cast("double") - element_at(mnA, (i + 1).cast("int")))
            * 255.0 / element_at(spanA, (i + 1).cast("int")))))))
    val corpus = embeddings.select(col(idCol).as("nbr_id"),
      q8(col(vecCol)).as("nbr_code"))
    val queries = broadcast(embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), q8(col(vecCol)).as("q_code")))
    val scored = corpus.join(queries, col("query_id") =!= col("nbr_id"))
      .withColumn("__negdist",
        -aggregate(zip_with(col("q_code"), col("nbr_code"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x))
    // TopKByScore orders (score DESC, id ASC): negate to rank ASC distance
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct(col("__negdist"), col("nbr_id")), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        (-col("col.score")).as("sqdist_q8"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs, exact: every (id_a < id_b)
    * pair with cosine ≥ threshold. Quadratic — restrict with `pred` or use
    * [[embedNearDupPairs]] at scale. One side broadcasts (the pair space
    * is the cost, not the shuffle).
    */
  def cosineNearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      pred: Column, minCosE6: Long
  ): DataFrame = {
    // norms are per-vector, so compute them BEFORE the pair join — inlined
    // in the cosine they would be re-folded once per pair (n× each).
    // norm_a * norm_b is the same multiply the inline form performs, so
    // results stay bit-identical.
    val base = embeddings.filter(pred)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = base.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("nrm_a"))
    val b = broadcast(base.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("nrm_b")))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")) * 1e6)
          .cast("long").as("cos_e6"))
      .filter(col("cos_e6") >= minCosE6)
  }

  /** Embedding near-dup pairs at scale: random-hyperplane LSH. Each vector
    * gets `nBits` sign bits (sign of dot with a deterministic pseudo-random
    * hyperplane), grouped into `bands` exact-match buckets; only same-bucket
    * pairs are scored exactly. P[bit match] = 1 − θ/π, so near-identical
    * vectors (θ≈0) collide in some band with high probability while the
    * quadratic work stays inside tiny buckets — the vector analog of the
    * text MinHash-LSH tier.
    *
    * Hyperplanes are derived, not stored: component j of plane i is a
    * deterministic hash-to-[-1,1] of (i, j) — reproducible across runs and
    * engines with no random state.
    *
    * Sizing: each band hashes into 2^(nBits/bands) buckets, and on a
    * corpus with no near-dup structure every bucket holds ~N/2^(nBits/
    * bands) ids, so candidate pairs grow ~bands·N²/2^(nBits/bands+1) —
    * bits-per-band is the quadratic-blowup throttle and must grow with
    * log2(N) (defaults 64/8 ⇒ 256 buckets/band: 32× fewer background
    * collisions than the old 16/4, right for ~10⁵-10⁶ vectors; at 10⁸+
    * use ≥16 bits/band). `bands` is the recall knob: P[candidate] =
    * 1−(1−p^(nBits/bands))^bands with p = 1−θ/π, so for a fixed
    * bits-per-band more bands buys recall linearly in compute without
    * touching bucket sizes.
    *
    * Scale shape: only (id, band, bucket) rides the bucketing shuffle —
    * vectors do NOT travel inside the bucket structs (near-dup-heavy
    * corpora produce hot buckets, and |g| vectors × dim in one
    * aggregation buffer is an executor OOM). Candidate pairs are formed
    * on ids alone, optionally capped at `maxBucketSize` per bucket, then
    * vectors are joined back BY ID for the exact-cosine verify.
    * Per-vector norms are precomputed on the join side, so the scoring
    * arithmetic (dot / (nrm_a * nrm_b)) is the same multiply chain as the
    * in-bucket form — results are bit-identical where no bucket exceeds
    * the cap.
    *
    * @param dim embedding dimensionality — a required parameter so plan
    *        construction stays lazy (discovering it with `first()` would
    *        execute a Spark job at plan-build time).
    * @param maxBucketSize buckets larger than this are DROPPED; <= 0
    *        (the default, matching [[TextDedup.lshCandidates]]) disables
    *        the cap. A cluster of > cap near-identical vectors occupies
    *        the same bucket in EVERY band, so capping drops that whole
    *        cluster — zero recall on exactly the heaviest duplicate
    *        clusters a dedup pass exists to find. Only enable the cap
    *        after an exact-dup pre-pass (tier 1: byte/fingerprint
    *        dedup) has removed identical-vector clusters, so no TRUE
    *        duplicate cluster can exceed it; dropped buckets are then
    *        surfaced via `Dataset.observe` ("lsh_bucket_cap_<n>", see
    *        [[TextDedup.pairsWithinGroups]]).
    */
  def embedNearDupPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      minCosE6: Long, dim: Int, nBits: Int = 64, bands: Int = 8,
      maxBucketSize: Int = 0
  ): DataFrame = {
    require(dim > 0, "dim must be positive")
    require(nBits % bands == 0, "bands must divide nBits")
    val base = embeddings
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // all nBits sign bits + band packing fuse into ONE codegen'd
    // expression over a static plane matrix (SignBands) — bit-identical
    // to the per-bit VectorDot formulation it replaces, minus the nBits
    // separate expression-evaluation frames per row
    val banded = base
      .select(col("id"),
        posexplode(graft.functions.SignBands.signBands(col("v"), nBits, bands)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    // ids-only in-bucket pair expansion with the hot-bucket cap, one
    // shuffle of (band, bucket, id) — bytes, not vectors
    val cands = TextDedup.pairsWithinGroups(banded, Seq("band", "bucket"),
      "id", maxBucketSize).distinct()
    val vecs = base.withColumn("nrm", norm(col("v")))
    cands
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a"),
        col("nrm").as("nrm_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("nrm_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        floor(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")) * 1e6)
          .cast("long").as("cos_e6"))
      .filter(col("cos_e6") >= minCosE6)
  }

  /** IVF assignment: each vector gets the id of its nearest centroid
    * (max cosine; ties → lowest centroid id). Centroids are broadcast.
    *
    * The per-vector argmax is a `min_by` AGGREGATE over the broadcast
    * cross-join, not a row_number window: all k scored rows of a vector
    * come off the same input row, so partial aggregation collapses them
    * map-side and the exchange carries ONE row per vector — a window
    * would shuffle (and sort) all n×k scored rows by id. min of
    * (−cos, cent_id) ≡ (cos desc, cent_id asc) without requiring a
    * numeric centroid id.
    */
  def ivfAssign(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String
  ): DataFrame = {
    val cents = broadcast(centroids.select(col(cIdCol).as("cent_id"),
      asDouble(col(cVecCol)).as("cent_vec")))
    val scored = embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .crossJoin(cents)
      .withColumn("cos_e6", floor(cosine(col("v"), col("cent_vec")) * 1e6).cast("long"))
    scored.groupBy(col(idCol))
      .agg(min_by(struct(col("cent_id"), col("v")),
        struct((-col("cos_e6")).as("neg_cos"), col("cent_id"))).as("best"))
      .select(col(idCol), col("best.cent_id").as("cent_id"), col("best.v").as("v"))
  }

  /** MATERIALIZE the IVF index: land [[ivfAssign]]'s (id, cent_id, v)
    * for a day's vectors as a tx-warehouse partition, range-clustered
    * on `cent_id` so the manifest's per-file cluster ranges confine a
    * probe to the files its clusters land in. Per-day REPLACE semantics
    * (idempotent re-ingest), the same maintenance contract as the BM25
    * postings and dedup signature indexes. The centroid set is the
    * caller's fixed configuration (it defines the index — changing it
    * means rebuilding), so it is not stored here.
    */
  def indexEmbeddings(spark: org.apache.spark.sql.SparkSession,
      wh: graft.tableops.TxWarehouse, assignPath: String,
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      date: java.time.LocalDate, clusterFiles: Int = 8): Unit = {
    val assigned = ivfAssign(embeddings, idCol, vecCol,
        centroids, cIdCol, cVecCol)
      .withColumn("date", lit(java.sql.Date.valueOf(date)))
      .repartitionByRange(clusterFiles, col("cent_id"))
    wh.overwritePartition(spark, assigned, assignPath, date): Unit
  }

  /** IVF top-k over the MATERIALIZED index — value-identical to
    * [[ivfTopK]] with the same centroids (same assignment rule, same
    * probe order, same quantized cosine), but the corpus is never
    * re-assigned: the probe reads ONLY the index files whose recorded
    * cent_id ranges overlap the queries' probed clusters. At archive
    * scale a bounded query set costs O(files of probed clusters) —
    * ~nprobe/C of the index and independent of its day count.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession,
      wh: graft.tableops.TxWarehouse, assignPath: String, idCol: String,
      queriesDf: DataFrame, qIdCol: String, qVecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    val cents = broadcast(centroids.select(col(cIdCol).as("cent_id"),
      asDouble(col(cVecCol)).as("cent_vec")))
    val qScored = queriesDf
      .select(col(qIdCol).as("query_id"), asDouble(col(qVecCol)).as("q_vec"))
      .crossJoin(cents)
      .withColumn("__cos",
        floor(cosine(col("q_vec"), col("cent_vec")) * 1e6).cast("long"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cent_id").asc)
    val queries = broadcast(qScored
      .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cent_id"), col("q_vec"),
        norm(col("q_vec")).as("q_nrm")))
    // bounded query set → the probed cluster ids collect and drive the
    // manifest prune on the index read
    val probed = queries.select("cent_id").distinct().collect()
      .map(_.get(0)).toSeq
    val assigned = wh.readWhere(spark, assignPath,
      col("cent_id").isin(probed: _*))
    val scored = assigned
      .select(col(idCol).as("nbr_id"), col("cent_id"),
        col("v").as("nbr_vec"), norm(col("v")).as("nbr_nrm"))
      .join(queries, Seq("cent_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
    rankedTopK(scored, k)
  }

  /** IVF top-k: probe the query's `nprobe` nearest centroid buckets.
    * Approximate — misses neighbors assigned to unprobed centroids;
    * `nprobe` is the recall-vs-cost knob every IVF index exposes: scored
    * candidates grow ~linearly in nprobe (nprobe/C of the corpus), recall
    * approaches exact as nprobe → C. nprobe=1 reproduces the classic
    * "own bucket only" probe.
    *
    * A neighbor reachable through several probed buckets is scored once:
    * candidate (query, nbr) pairs are distinct by construction — each
    * corpus vector lives in exactly ONE bucket (its top-1 assignment), so
    * the probe join emits each (query, nbr) at most once even when
    * nprobe > 1.
    */
  def ivfTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      queryPred: Column, k: Int, nprobe: Int = 1,
      cacheAssignment: Boolean = true
  ): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    // The assignment feeds BOTH join sides below; unpersisted it would be
    // recomputed per branch (centroid cross-join + per-vector top-1 window,
    // the expensive part). Persisting it is building the IVF index — at
    // warehouse scale the same thing, written to a table instead. The
    // cache lives for the plan's lifetime with no unpersist handle, so
    // LONG-LIVED callers (a serving loop issuing many top-k calls) should
    // pass cacheAssignment = false — or better, materialize ivfAssign to
    // a table once and probe that — rather than pin blocks per call
    // (same contract as incrementalNearDupFilter's cacheBatch).
    val assigned = maybeCache(
      ivfAssign(embeddings, idCol, vecCol, centroids, cIdCol, cVecCol),
      cacheAssignment)
    // probe list: each query's nprobe nearest centroids by the SAME
    // (cos desc, cent_id asc) order the assignment uses, so probe #1 is
    // exactly the query's own bucket and nprobe=1 degenerates to it.
    // Queries are few (broadcast side), so the rank window partitions by
    // query_id — no global sort.
    val cents = broadcast(centroids.select(col(cIdCol).as("cent_id"),
      asDouble(col(cVecCol)).as("cent_vec")))
    val qScored = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .crossJoin(cents)
      .withColumn("__cos", floor(cosine(col("q_vec"), col("cent_vec")) * 1e6).cast("long"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cent_id").asc)
    // q_nrm rides the broadcast side like cosineTopK's: inlined in the
    // scored projection the norm would re-fold O(dim) once per
    // (query, candidate) row instead of once per probe entry
    val queries = broadcast(qScored
      .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cent_id"), col("q_vec"),
        norm(col("q_vec")).as("q_nrm")))
    val scored = assigned
      .select(col(idCol).as("nbr_id"), col("cent_id"), col("v").as("nbr_vec"),
        norm(col("v")).as("nbr_nrm"))
      .join(queries, Seq("cent_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
    rankedTopK(scored, k)
  }

  /** Semantic dedup (SemDeDup): embedding-space near-duplicate removal
    * bucketed by cluster — each vector is assigned to its nearest
    * centroid ([[ivfAssign]]), exact cosine is computed only WITHIN a
    * cluster, and a vector is dropped when a lower-id vector of the same
    * cluster sits at cosine ≥ `minCosE6` (keep-the-earliest, the same
    * deterministic representative rule as the text tiers). Returns the
    * survivors as (idCol, cent_id).
    *
    * This is the cluster-then-dedup shape of Abbas et al.'s SemDeDup:
    * the O(n²) cosine matrix shrinks to Σ|cluster|² — with k centroids
    * sized so clusters stay ~n/k, a k ∝ n choice holds per-cluster work
    * constant. The pairwise rule is intentionally NOT a transitive
    * closure (A~B, B~C does not drop C unless C is also near a kept
    * vector's threshold): each drop decision depends only on (pair
    * cosine, id order), so the output is a pure function of the input
    * with no iteration. Chain [[graft.operators.TextDedup.minLabelClusters]]
    * over the pair set instead when component semantics are wanted.
    *
    * Scale shape: one persisted assignment (the clustering index — at
    * warehouse scale a materialized table), a self-join keyed by cent_id
    * whose quadratic work is confined to clusters, and an anti-join of
    * the dropped-id set, broadcast by default (the drop set is bounded
    * by the duplicate count; set `broadcastDrops = false` on
    * duplicate-heavy corpora where it won't fit an executor). A
    * pathologically hot cluster (degenerate centroids) is the operator's
    * skew mode — the fix is more/better centroids, which is why the
    * centroid set is a parameter, not derived here.
    */
  def semanticDedup(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      minCosE6: Long, broadcastDrops: Boolean = true,
      cacheAssignment: Boolean = true
  ): DataFrame = {
    // cacheAssignment: see ivfTopK — long-lived callers pass false (or
    // materialize the assignment) to avoid pinning blocks per call.
    val assigned = maybeCache(
      ivfAssign(embeddings, idCol, vecCol, centroids, cIdCol, cVecCol),
      cacheAssignment)
    val withNrm = assigned.withColumn("nrm", norm(col("v")))
    val l = withNrm.select(col("cent_id"), col(idCol).as("id_a"),
      col("v").as("v_a"), col("nrm").as("nrm_a"))
    val r = withNrm.select(col("cent_id"), col(idCol).as("id_b"),
      col("v").as("v_b"), col("nrm").as("nrm_b"))
    val drops = l.join(r, Seq("cent_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(floor(dot(col("v_a"), col("v_b")) / (col("nrm_a") * col("nrm_b")) * 1e6)
        .cast("long") >= minCosE6)
      .select(col("id_b").as("__drop_id")).distinct()
    assigned
      .join(if (broadcastDrops) broadcast(drops) else drops,
        col(idCol) === col("__drop_id"), "left_anti")
      .select(col(idCol), col("cent_id"))
  }

  /** k-nearest-neighbor graph over the whole corpus, approximated by IVF
    * bucketing: each vector's top-k cosine neighbors AMONG ITS OWN
    * CLUSTER — the all-pairs self-join dual of [[ivfTopK]] (which serves
    * a small broadcast query set; here every vector is a query, so
    * neither side broadcasts and the join is keyed by cent_id). The kNN
    * graph is the substrate for graph-based semantic clustering and ANN
    * index construction (HNSW-style neighborhoods).
    *
    * Scale shape: one persisted assignment (shared by both join sides —
    * unpersisted, the centroid cross-join would run twice), norms
    * precomputed per side, quadratic work confined to clusters, and the
    * per-vector top-k via the map-side-combining [[graft.functions
    * .TopKByScore]] aggregate — only k rows per vector per map partition
    * cross the final shuffle, not the |cluster|² scored stream.
    */
  def knnGraph(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String, k: Int,
      cacheAssignment: Boolean = true
  ): DataFrame = {
    // cacheAssignment: see ivfTopK — long-lived callers pass false (or
    // materialize the assignment) to avoid pinning blocks per call.
    val assigned = maybeCache(
      ivfAssign(embeddings, idCol, vecCol, centroids, cIdCol, cVecCol),
      cacheAssignment)
    val withNrm = assigned.withColumn("nrm", norm(col("v")))
    val q = withNrm.select(col("cent_id"), col(idCol).as("query_id"),
      col("v").as("q_vec"), col("nrm").as("q_nrm"))
    val n = withNrm.select(col("cent_id"), col(idCol).as("nbr_id"),
      col("v").as("nbr_vec"), col("nrm").as("nbr_nrm"))
    val scored = q.join(n, Seq("cent_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
    rankedTopK(scored, k)
  }

  /** Incremental embedding dedup: keep only the batch vectors with NO
    * archive neighbor of cosine ≥ `minCosE6/1e6` — the embedding dual of
    * the text tier's vs-seen-corpus filter (a day's ingest is dropped
    * where the already-archived corpus is semantically equivalent).
    * Candidates form inside shared IVF clusters (both sides assigned to
    * the same broadcast centroids), so the comparison is
    * Σ_c |batch_c|·|archive_c|, never batch × archive.
    *
    * Scale shape: the day's batch is small relative to the archive —
    * its assignment is one broadcast-centroid pass; the archive side at
    * warehouse scale is the MATERIALIZED assignment the index table
    * already holds (the `dd_incremental_indexed` pattern — pass the
    * stored `(id, cent_id, v)` frame as `archive` after one
    * `ivfAssign` at build time, and nothing re-reads archive vectors
    * per day). The in-cluster join hashes on cent_id (AQE-splittable);
    * survivors come off a left-anti join on the batch id.
    */
  def embedIncrementalFilter(
      batch: DataFrame, archive: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      minCosE6: Long
  ): DataFrame = {
    val aSide = ivfAssign(archive, idCol, vecCol, centroids, cIdCol, cVecCol)
      .withColumn("nrm", norm(col("v")))
      .select(col("cent_id"), col(idCol).as("arc_id"),
        col("v").as("a_v"), col("nrm").as("a_nrm"))
    val bAss = ivfAssign(batch, idCol, vecCol, centroids, cIdCol, cVecCol)
      .withColumn("nrm", norm(col("v")))
    val hit = bAss
      .select(col("cent_id"), col(idCol).as("b_id"),
        col("v").as("b_v"), col("nrm").as("b_nrm"))
      .join(aSide, Seq("cent_id"))
      .filter(
        floor(dot(col("b_v"), col("a_v")) / (col("b_nrm") * col("a_nrm")) * 1e6)
          .cast("long") >= minCosE6)
      .select(col("b_id")).distinct()
    batch.join(hit, batch(idCol) === hit("b_id"), "left_anti")
      .select(col(idCol))
  }

  /** Margin-criterion pair mining (Artetxe/Schwenk, the LASER/CCMatrix
    * bitext-mining scorer): a pair qualifies not on raw cosine but on
    * cosine RELATIVE to both endpoints' neighborhood density —
    * `margin(a,b) = 2·cos(a,b) / (avgK(a) + avgK(b))` — which suppresses
    * hub vectors whose neighborhoods are uniformly close. Pairs and the
    * per-vector top-k averages both live inside IVF clusters (the
    * [[knnGraph]] blocking), so nothing is all-pairs.
    *
    * Determinism: pair cosines quantize to e6; each avgK is one
    * correctly-rounded division of an exact integer top-k sum by its
    * count; the margin is a single multiply-divide chain floor-quantized
    * to e4 — an SQL oracle reproduces every value.
    *
    * Scale shape: ONE cached assignment feeds both the directed scored
    * stream (per-vector top-k through the bounded [[graft.functions
    * .TopKByScore]] heap — k rows per vector per map partition) and the
    * a<b pair stream; the pair-to-denominator joins key on vector id
    * (AQE-splittable hash joins, no broadcast of corpus-scale state).
    * Quadratic work is confined to Σ|cluster|², exactly [[knnGraph]]'s
    * bound.
    */
  def marginPairs(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      k: Int, minMarginE4: Long,
      cacheAssignment: Boolean = true
  ): DataFrame = {
    require(k >= 1)
    val assigned = maybeCache(
      ivfAssign(embeddings, idCol, vecCol, centroids, cIdCol, cVecCol),
      cacheAssignment)
    val withNrm = assigned.withColumn("nrm", norm(col("v")))
    val q = withNrm.select(col("cent_id"), col(idCol).as("query_id"),
      col("v").as("q_vec"), col("nrm").as("q_nrm"))
    val n = withNrm.select(col("cent_id"), col(idCol).as("nbr_id"),
      col("v").as("nbr_vec"), col("nrm").as("nbr_nrm"))
    val scored = q.join(n, Seq("cent_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos_e6",
        floor(dot(col("q_vec"), col("nbr_vec")) / (col("q_nrm") * col("nbr_nrm")) * 1e6)
          .cast("long"))
      .select(col("query_id"), col("nbr_id"), col("cos_e6"))
    // per-vector neighborhood density: avg of the top-k in-cluster
    // cosines — integer sum over the bounded heap, ONE division
    val den = scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct(col("cos_e6"), col("nbr_id")), k).as("tk"))
      .select(col("query_id").as("id"),
        (aggregate(col("tk"), lit(0L), (acc, e) => acc + e.getField("score"))
          .cast("double") / size(col("tk")).cast("double")).as("den"))
    val pairs = scored.filter(col("query_id") < col("nbr_id"))
      .select(col("query_id").as("id_a"), col("nbr_id").as("id_b"),
        col("cos_e6"))
    pairs
      .join(den.select(col("id").as("id_a"), col("den").as("den_a")), "id_a")
      .join(den.select(col("id").as("id_b"), col("den").as("den_b")), "id_b")
      .filter(col("den_a") > 0.0 && col("den_b") > 0.0)
      .select(col("id_a"), col("id_b"), col("cos_e6"),
        floor(lit(20000.0) * col("cos_e6") / (col("den_a") + col("den_b")))
          .cast("long").as("margin_e4"))
      .filter(col("margin_e4") >= minMarginE4)
  }

  /** Per-group per-dimension centroid accumulators: (group, dim, sum_e6,
    * n) with floor-scaled-integer sums — exact, order-independent, and a
    * k-means/IVF training step's shuffle shape (posexplode then one hash
    * aggregate on (group, dim); map-side combine collapses the dimension
    * stream before the exchange, so shuffle volume is groups × dims, not
    * rows × dims). Downstream divides sum_e6/n for the mean.
    */
  def centroidSums(
      embeddings: DataFrame, groupCol: String, vecCol: String
  ): DataFrame =
    embeddings
      .select(col(groupCol), posexplode(col(vecCol)))
      .groupBy(col(groupCol), col("pos").cast("int").as("dim"))
      .agg(
        sum(floor(col("col").cast("double") * 1e6).cast("long")).as("sum_e6"),
        count(lit(1)).as("n"))

  /** Per-group centroid-distance outliers: the k vectors FARTHEST from
    * their own group's centroid — the label-noise / out-of-distribution
    * audit a curation pipeline runs over labeled embeddings (confident-
    * learning style: the far tail of a label cluster is where mislabels
    * and junk live).
    *
    * Determinism (shared with the SQL oracle): vectors are e6-floor-
    * quantized FIRST, so per-group per-dim sums are exact integers;
    * the centroid component `s/n` and each squared deviation are single
    * correctly-rounded IEEE-754 ops; per-dim terms floor-quantize
    * before the final sum. Scores are exact integers
    * (`dist2_e12 = Σ_d floor((w_d − s_d/n)²)` in e6-squared units).
    *
    * Scale shape: the centroid table is |groups|·dims rows from ONE
    * map-side-combined aggregate; it broadcasts back; distances are
    * map-only; the per-group top-k ships through the bounded
    * [[graft.functions.TopKByScore]] heap. No corpus-scale shuffle,
    * sort, or window anywhere.
    */
  def centroidOutliers(
      embeddings: DataFrame, idCol: String, groupCol: String,
      vecCol: String, k: Int
  ): DataFrame = {
    require(k >= 1)
    val w = embeddings.select(col(idCol).cast("long").as("vec_id"),
      col(groupCol).as("grp"),
      transform(asDouble(col(vecCol)),
        x => floor(x * 1e6).cast("long")).as("wv"))
    // per-group per-dim integer sums → centroid components, ordered by dim
    val cent = w.select(col("grp"), posexplode(col("wv")))
      .groupBy(col("grp"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("grp"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
        p => p.getField("s").cast("double") /
          p.getField("n").cast("double")).as("cv"))
    val dist2 = w.join(broadcast(cent), Seq("grp"))
      .select(col("grp"), col("vec_id"),
        aggregate(
          zip_with(col("wv"), col("cv"),
            (wi, ci) => floor((wi - ci) * (wi - ci)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("dist2_e12"))
    dist2.groupBy(col("grp"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct(col("dist2_e12"), col("vec_id")), k).as("tk"))
      .select(col("grp"), posexplode(col("tk")))
      .select(col("grp").as("label"), col("col.id").as("vec_id"),
        col("col.score").as("dist2_e12"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
