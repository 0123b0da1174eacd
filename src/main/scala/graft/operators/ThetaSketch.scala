package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** KMV / theta sketch: bounded-size distinct sketches that support SET
  * INTERSECTION — the capability the HLL family fundamentally lacks
  * (inclusion–exclusion on HLL unions amplifies error; a theta sketch
  * intersects its SAMPLES). Bottom-k-of-hashes construction (Bar-Yossef
  * et al. 2002; Beyer et al. 2007 "On synopses for distinct-value
  * estimation under multiset operations"; the DataSketches theta
  * sketch is the production form).
  *
  * Every element hashes to a uniform value on [0, 2⁵²) (xxhash64 seed
  * 42, masked to the low 52 bits); the sketch is the k SMALLEST
  * DISTINCT values per group. With θ = the k-th smallest (or the whole
  * domain when the group has < k distinct — the sketch is then exact),
  * any set expression over sketches evaluates on the sample
  * {v < θ = min over the operand θs} and scales by 2⁵²/θ:
  *
  *   est(A ∩ B) = |{v < θ : v ∈ skA ∧ v ∈ skB}| · 2⁵² div θ
  *
  * All arithmetic is int64-exact by construction — 52-bit domain so
  * count·2⁵² ≤ 2⁶² at k ≤ 1024, integer floor division — making the
  * estimate (not just the sample) bit-identical in any engine at any
  * partitioning. The 52-bit truncation costs nothing real: only hash
  * collisions BELOW θ bias the estimate (expected k²/2⁵² of them), and
  * distinct-key collisions overall run n²/2⁵³ — at n = 10⁹ that is
  * ~10⁻⁷ relative, far under the sketch's own 1/√k sampling error.
  *
  * Scale shape: one distinct-project of (group, value) — the same
  * exchange an exact COUNT DISTINCT pays — then the map-side-combining
  * bounded-heap [[graft.functions.TopKByScore]] aggregate: k values per
  * group per partition cross the shuffle, the sketch result is k longs
  * per group, and set operations touch only sketches (never the data).
  */
object ThetaSketch {

  val DomainBits = 52
  val Domain: Long = 1L << DomainBits
  private val Mask = Domain - 1L

  /** Per-group KMV sketch.
    *
    * @return (g, vals: array<long> ascending — the ≤ k smallest distinct
    *         hash values, n_distinct: exact distinct count of the group)
    */
  def kmvSketch(df: DataFrame, grpCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 1024, "k in [2, 1024] keeps count*2^52 in int64")
    df.select(col(grpCol).as("g"),
        xxhash64(col(keyCol)).bitwiseAND(lit(Mask)).as("v"))
      .distinct()
      .groupBy(col("g"))
      .agg(
        graft.functions.TopKByScore.topKByScore(
          struct((-col("v")).as("score"), col("v").as("id")), k).as("tk"),
        count(lit(1)).as("n_distinct"))
      .select(col("g"),
        transform(col("tk"), x => x.getField("id")).as("vals"),
        col("n_distinct"))
  }

  /** Theta-sketch set algebra between two groups' key sets —
    * intersection, union, and BOTH directed differences (every op
    * evaluated on the same {v < θ} sample, so the four estimates are
    * mutually consistent: intersect + diff_ab = |sample_A| scaled) —
    * with the exact intersection alongside for calibration. One result
    * row:
    *
    *   (n_a, n_b, theta, n_matched, est_a, est_b, est_intersect,
    *    est_union, est_diff_ab, est_diff_ba, exact_intersect, err_e4)
    *
    * The two sketch rows and the exact-intersect count are one-row
    * frames crossed together (broadcast, no data movement); every
    * estimate is integer floor arithmetic on the 2⁵² grid.
    */
  def intersectEstimate(df: DataFrame, grpCol: String, keyCol: String,
      groupA: String, groupB: String, k: Int): DataFrame = {
    val scoped = df.filter(col(grpCol).isin(groupA, groupB))
    val sk = kmvSketch(scoped, grpCol, keyCol, k)
    def side(g: String, tag: String) = sk.filter(col("g") === g)
      .select(col("vals").as(s"vals_$tag"),
        col("n_distinct").as(s"n_$tag"),
        when(col("n_distinct") >= k, element_at(col("vals"), k))
          .otherwise(lit(Domain)).as(s"theta_$tag"))
    val keys = scoped.select(col(grpCol).as("g"), col(keyCol).as("kk")).distinct()
    val exact = keys.filter(col("g") === groupA).select(col("kk"))
      .join(keys.filter(col("g") === groupB).select(col("kk").as("kk2")),
        col("kk") === col("kk2"), "left_semi")
      .agg(count(lit(1)).as("exact_intersect"))
    side(groupA, "a").crossJoin(side(groupB, "b")).crossJoin(exact)
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .withColumn("n_matched",
        size(filter(col("vals_a"),
          v => v < col("theta") && array_contains(col("vals_b"), v))).cast("long"))
      .withColumn("n_union_sample",
        (size(filter(col("vals_a"), v => v < col("theta"))) +
          size(filter(col("vals_b"), v => v < col("theta")))).cast("long") -
          col("n_matched"))
      .select(
        col("n_a"), col("n_b"), col("theta"), col("n_matched"),
        // uniform estimator rule: |sample strictly below θ| · 2⁵² div θ
        // (for a full sketch that is the textbook (k−1)·2⁵²/θ_k; for an
        // exhaustive one θ = 2⁵² and the estimate is the exact count)
        expr(s"(size(filter(vals_a, v -> v < theta_a)) * " +
          s"cast(${Domain}L as bigint)) div theta_a").as("est_a"),
        expr(s"(size(filter(vals_b, v -> v < theta_b)) * " +
          s"cast(${Domain}L as bigint)) div theta_b").as("est_b"),
        expr(s"(n_matched * cast(${Domain}L as bigint)) div theta")
          .as("est_intersect"),
        expr(s"(n_union_sample * cast(${Domain}L as bigint)) div theta")
          .as("est_union"),
        expr("((size(filter(vals_a, v -> v < theta)) - n_matched) * " +
          s"cast(${Domain}L as bigint)) div theta").as("est_diff_ab"),
        expr("((size(filter(vals_b, v -> v < theta)) - n_matched) * " +
          s"cast(${Domain}L as bigint)) div theta").as("est_diff_ba"),
        col("exact_intersect"),
        expr(s"abs((n_matched * cast(${Domain}L as bigint)) div theta " +
          "- exact_intersect) * 10000 div nullif(exact_intersect, 0)")
          .as("err_e4"))
  }
}
