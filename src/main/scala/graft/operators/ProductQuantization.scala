package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate-nearest-neighbor search —
  * the memory-light scale path beside the IVF and sign-LSH tiers in
  * [[Similarity]] (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — public literature).
  *
  * The vector space is split into `m` subspaces of `dim/m` dimensions;
  * each subspace gets its own `ksub`-centroid codebook, and a vector is
  * stored as `m` small codes (its nearest centroid per subspace) — at
  * m=8, ksub=256 that is 8 bytes per vector instead of dim×4, the
  * difference between an ANN index that fits executor memory at 100 TB
  * corpus scale and one that does not. Queries score candidates with the
  * asymmetric distance computation (ADC): a per-query lookup table of
  * exact (query-subvector → centroid) distances, summed over the
  * candidate's codes — O(m) integer adds per candidate, no vector
  * arithmetic on the scored stream.
  *
  * DETERMINISM (the oracle contract): centroids are canonically
  * e6-quantized integer vectors (`comp_e6` = floor(component × 1e6)),
  * initialization takes the `ksub` lowest-id vectors' subvectors, Lloyd
  * re-assignment breaks distance ties by lowest code, and means use
  * floor-scaled integer sums with floor division — every step is either
  * integer arithmetic or an IEEE-754 operation both Spark and a SQL
  * oracle perform identically (the same discipline as
  * [[Similarity.centroidSums]] / the `emb_kmeans_iter` oracle).
  * Distances run the ascending-index fold of
  * [[graft.functions.VectorSqDist]].
  *
  * Scale shape: codebooks are tiny (m × ksub rows) and broadcast
  * everywhere; training/encoding is a broadcast join + map-side-combined
  * `min(struct)` argmin (ONE row per (vector, subspace) crosses each
  * shuffle, never the ksub-wide scored stream); the code table is the
  * materializable index; ADC scoring is a broadcast LUT join + one hash
  * aggregate; top-k ships k rows per query per map partition through
  * [[graft.functions.TopKByScore]].
  */
object ProductQuantization {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private def sqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(graft.functions.VectorSqDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** One row per (input row, subspace), keeping every non-vector column:
    * (…carry, sub: int, sv: array<double>).
    */
  private def explodeSubs(df: DataFrame, vecCol: String, m: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, "m must divide dim")
    val dsub = dim / m
    val carry = df.columns.filter(_ != vecCol).map(col).toSeq
    df.select(carry :+
        posexplode(array((0 until m).map(s =>
          slice(asDouble(col(vecCol)), s * dsub + 1, dsub)): _*)): _*)
      .select(carry ++ Seq(col("pos").cast("int").as("sub"), col("col").as("sv")): _*)
  }

  /** One row per (vector, subspace): (id, sub, sv: array<double>). */
  private def subvectors(
      embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int): DataFrame =
    explodeSubs(embeddings.select(col(idCol).as("id"), col(vecCol)),
      vecCol, m, dim)

  /** Centroid double vectors from canonical e6 rows:
    * (sub, code, cvec: array<double>). comp_e6 → double/1e6 is one IEEE
    * division both engines round identically.
    */
  def assembleCodebook(cbE6: DataFrame): DataFrame =
    cbE6.groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("comp_e6")))),
        s => s.getField("comp_e6").cast("double") / lit(1e6)).as("cvec"))

  /** Nearest-code assignment of each subvector row against a codebook:
    * min over struct(d_e6, code) — (distance asc, code asc), the
    * deterministic argmin; partial aggregation collapses the ksub-wide
    * scored stream map-side. `groupCols` are the subvector identity
    * (id + sub, plus any functionally-dependent carry like cent_id —
    * carrying it through the groupBy beats joining it back by id, which
    * costs a whole extra shuffle join).
    */
  private def assign(subs: DataFrame, cb: DataFrame,
      groupCols: Seq[String] = Seq("id", "sub")): DataFrame =
    subs.join(broadcast(cb), Seq("sub"))
      .withColumn("__d_e6",
        floor(sqDist(col("sv"), col("cvec")) * 1e6).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(struct(col("__d_e6"), col("code"), col("sv"))).as("best"))
      .select(groupCols.map(col) ++ Seq(col("best.code").as("code"),
        col("best.sv").as("sv")): _*)

  /** Train PQ codebooks: `iters` Lloyd iterations from a deterministic
    * init (the `ksub` lowest-id vectors' subvectors, e6-quantized).
    * Returns canonical component rows (sub, code, dim, comp_e6) — feed
    * through [[assembleCodebook]] for the vector form. A code whose
    * cluster empties keeps its previous centroid. `idCol` must be
    * unique (it is the init tie-break).
    */
  def trainCodebookComponents(
      embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, dim: Int, ksub: Int, iters: Int = 1): DataFrame = {
    require(ksub > 0 && iters >= 0, "ksub must be positive, iters >= 0")
    val dsub = dim / m
    val subs = subvectors(embeddings, idCol, vecCol, m, dim)
    // init: code c of every subspace = subvectors of the (c+1)-th lowest
    // id. The window sorts only the ksub-row limit frame.
    val initIds = embeddings.select(col(idCol).as("id")).orderBy(col("id"))
      .limit(ksub)
      .withColumn("code",
        (row_number().over(Window.orderBy(col("id"))) - 1).cast("int"))
    var cbE6: DataFrame = subs.join(initIds, Seq("id"))
      .select(col("sub"), col("code"), posexplode(col("sv")))
      .select(col("sub"), col("code"), col("pos").cast("int").as("dim"),
        floor(col("col") * 1e6).cast("long").as("comp_e6"))
    for (_ <- 1 to iters) {
      val assigned = assign(subs, assembleCodebook(cbE6))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")))
        .groupBy(col("sub"), col("code"), col("pos").cast("int").as("dim"))
        .agg(sum(floor(col("col") * 1e6).cast("long")).as("sum_e6"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"), col("dim"),
          floor(col("sum_e6") / col("n")).cast("long").as("new_e6"))
      // both sides are m × ksub × dsub rows, but the aggregate output has
      // no stats at plan time — without the hint this 1024-row join
      // sort-merges
      cbE6 = cbE6.join(broadcast(means), Seq("sub", "code", "dim"), "left")
        .select(col("sub"), col("code"), col("dim"),
          coalesce(col("new_e6"), col("comp_e6")).as("comp_e6"))
    }
    cbE6
  }

  /** PQ-encode the corpus against a codebook: (id, sub, code) — the PQ
    * index, m small integers per vector. Materialize this to a table at
    * warehouse scale; every downstream ADC query probes it without
    * touching the raw vectors.
    */
  def encode(
      embeddings: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int, dim: Int): DataFrame =
    assign(subvectors(embeddings, idCol, vecCol, m, dim), codebook)
      .select(col("id").as(idCol), col("sub"), col("code"))

  /** ADC top-k: each query's k nearest codes-space neighbors by
    * asymmetric distance — exact (query-subvector → centroid) distances
    * from a broadcast per-query LUT, summed over the candidate's codes
    * as integers (order-independent), ranked (adist asc, nbr asc).
    *
    * @param codes the PQ index from [[encode]] — (idCol, sub, code)
    * @param codebook from [[assembleCodebook]]
    */
  def adcTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, codebook: DataFrame,
      queryPred: Column, k: Int, m: Int, dim: Int): DataFrame = {
    val qSubs = subvectors(embeddings.filter(queryPred), idCol, vecCol, m, dim)
      .withColumnRenamed("id", "query_id")
    // the LUT: every (query, sub, code) exact distance — q × m × ksub
    // rows, broadcast; the scored stream below does NO vector math
    val lut = broadcast(
      qSubs.join(broadcast(codebook), Seq("sub"))
        .select(col("query_id"), col("sub"), col("code"),
          floor(sqDist(col("sv"), col("cvec")) * 1e6).cast("long").as("d_e6")))
    val scored = codes
      .select(col(idCol).as("nbr_id"), col("sub"), col("code"))
      .join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col("nbr_id"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum(col("d_e6")).as("adist_e6"))
    rankByAdist(scored, k)
  }

  /** Two-stage retrieval — the production ANN shape at corpus scale
    * (Jégou et al. 2011 §V): the compressed-domain ADC pass shortlists
    * `shortlist` candidates per query (only code joins, no vector
    * math on the corpus), then EXACT distances are computed for the
    * shortlist alone and re-ranked to the final top-k. At 100 TB the
    * cost split is the whole point: the corpus-wide stage touches
    * m-byte codes, the full-precision vectors are read only for
    * |queries|·shortlist rows (the shortlist frame broadcasts onto the
    * embedding scan — the corpus never shuffles).
    *
    * Integer-exact like the rest of the family: exact distances are
    * the same ascending-index e6-floored fold as the LUT entries, and
    * both cut boundaries tie-break (distance asc, nbr asc) — so the
    * result is a pure function of the data, replayed verbatim by the
    * DuckDB oracle.
    */
  def pqRerankTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, codebook: DataFrame,
      queryPred: Column, k: Int, shortlist: Int, m: Int, dim: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val short = adcTopK(embeddings, idCol, vecCol, codes, codebook,
      queryPred, shortlist, m, dim)
      .select(col("query_id"), col("nbr_id"))
    val qs = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val exact = embeddings
      .select(col(idCol).as("nbr_id"), asDouble(col(vecCol)).as("nv"))
      .join(broadcast(short), Seq("nbr_id"))
      .join(broadcast(qs), Seq("query_id"))
      .select(col("query_id"), col("nbr_id"),
        floor(sqDist(col("qv"), col("nv")) * 1e6).cast("long").as("dist_e6"))
    exact.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct((-col("dist_e6")).as("score"), col("nbr_id")), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        (-col("col.score")).as("dist_e6"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Per-query (adist asc, nbr asc) top-k through the bounded-heap
    * aggregate — k rows per query per map partition cross the shuffle.
    */
  private def rankByAdist(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct((-col("adist_e6")).as("score"), col("nbr_id")), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), col("col.id").as("nbr_id"),
        (-col("col.score")).as("adist_e6"),
        (col("pos") + 1).cast("int").as("rank"))

  /** IVF-PQ top-k: the coarse IVF quantizer ([[Similarity.ivfAssign]],
    * max-cosine buckets) composed with PQ over RESIDUALS (vector minus
    * its bucket centroid — residual energy is a fraction of vector
    * energy, so the same ksub spends its codes on a tighter distribution;
    * the classic inverted-file-with-ADC layout of Jégou et al. 2011).
    * Queries probe their `nprobe` nearest buckets and score each
    * probed bucket's candidates with a LUT built from the query's
    * residual AGAINST THAT BUCKET's centroid — the per-probe LUT is what
    * makes residual encoding correct across buckets.
    *
    * Scale shape: everything [[adcTopK]] claims, plus the residual
    * frame persists once (training, encoding, and the cent_id join all
    * read it) and candidates are confined to probed buckets — scored
    * rows drop from n×q to (nprobe/C)·n×q before the LUT join.
    */
  def ivfPqTopK(
      embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cIdCol: String, cVecCol: String,
      queryPred: Column, k: Int, m: Int, dim: Int, ksub: Int,
      iters: Int = 1, nprobe: Int = 1,
      cacheIntermediates: Boolean = true): DataFrame = {
    require(nprobe >= 1, "nprobe must be >= 1")
    def maybeCache(df: DataFrame): DataFrame =
      if (cacheIntermediates)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    val cents = broadcast(centroids.select(col(cIdCol).as("cent_id"),
      asDouble(col(cVecCol)).as("cent_vec")))
    // coarse assignment + residuals: one persisted frame feeds codebook
    // training, encoding, and the bucket join
    val residuals = maybeCache(
      Similarity.ivfAssign(embeddings, idCol, vecCol,
        centroids, cIdCol, cVecCol)
        .join(cents, Seq("cent_id"))
        .select(col(idCol), col("cent_id"),
          zip_with(col("v"), col("cent_vec"), (x, y) => x - y).as("r")))
    val cb = maybeCache(assembleCodebook(trainCodebookComponents(
      residuals.select(col(idCol), col("r")), idCol, "r", m, dim, ksub, iters)))
    // cent_id rides the argmin groupBy (functionally dependent on the
    // id), so the index needs no join-back shuffle
    val codes = assign(
      explodeSubs(residuals.withColumnRenamed(idCol, "id"), "r", m, dim),
      cb, groupCols = Seq("id", "cent_id", "sub"))
      .withColumnRenamed("id", idCol)
    // probe list: nprobe nearest centroids per query by the assignment's
    // own (cos desc, cent asc) order; the window partitions by query
    val qScored = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("q_vec"))
      .crossJoin(cents)
      .withColumn("__cos",
        floor(Similarity.cosine(col("q_vec"), col("cent_vec")) * 1e6).cast("long"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("cent_id").asc)
    val probes = qScored
      .withColumn("__rn", row_number().over(wq)).filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("cent_id"),
        zip_with(col("q_vec"), col("cent_vec"), (x, y) => x - y).as("qr"))
    // per-probe LUT: the query's residual against THAT bucket's centroid
    val lut = broadcast(
      explodeSubs(probes, "qr", m, dim)
        .join(broadcast(cb), Seq("sub"))
        .select(col("query_id"), col("cent_id"), col("sub"), col("code"),
          floor(sqDist(col("sv"), col("cvec")) * 1e6).cast("long").as("d_e6")))
    val scored = codes
      .select(col(idCol).as("nbr_id"), col("cent_id"), col("sub"), col("code"))
      .join(lut, Seq("cent_id", "sub", "code"))
      .filter(col("query_id") =!= col("nbr_id"))
      .groupBy(col("query_id"), col("nbr_id"))
      .agg(sum(col("d_e6")).as("adist_e6"))
    rankByAdist(scored, k)
  }
}
