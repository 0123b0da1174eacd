package graft.functions

import graft.SparkTestBase
import graft.operators.ThetaSketch
import org.apache.spark.sql.functions._

/** [[ThetaSketch]]: the KMV sketch is exactly the k smallest distinct
  * masked hashes (partition-independent), the exhaustive path is exact,
  * and the intersection estimator is calibrated — within the 1/√k
  * sampling bound of the truth on overlapping random sets and EXACT
  * when both sides fit in the sketch.
  */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def maskedHash(df: org.apache.spark.sql.DataFrame) = df
    .select(col("g"), xxhash64(col("kk"))
      .bitwiseAND(lit((1L << 52) - 1L)).as("v"))

  test("kmvSketch holds the k smallest DISTINCT masked hashes, " +
    "ascending, with the exact distinct count alongside") {
    val df = (1L to 500L).map(i => ("a", i)).toDF("g", "kk")
      .union(Seq(("a", 7L), ("a", 7L)).toDF("g", "kk")) // dup keys
    val got = ThetaSketch.kmvSketch(df, "g", "kk", k = 32)
      .as[(String, Seq[Long], Long)].head()
    val want = maskedHash(df).distinct().as[(String, Long)]
      .collect().map(_._2).sorted.take(32).toSeq
    assert(got._2 == want)
    assert(got._3 == 500L)
    // partition-independence
    val got7 = ThetaSketch.kmvSketch(df.repartition(7), "g", "kk", k = 32)
      .as[(String, Seq[Long], Long)].head()
    assert(got7 == got)
  }

  test("a group with fewer than k distinct keys yields an exhaustive " +
    "sketch and the intersection path returns EXACT counts") {
    val df = ((1L to 40L).map(i => ("a", i)) ++ (21L to 60L).map(i => ("b", i)))
      .toDF("g", "kk")
    val row = ThetaSketch.intersectEstimate(df, "g", "kk", "a", "b", k = 256)
      .collect().head
    assert(row.getAs[Long]("theta") == (1L << 52))
    assert(row.getAs[Long]("est_a") == 40L)
    assert(row.getAs[Long]("est_b") == 40L)
    assert(row.getAs[Long]("est_intersect") == 20L)
    assert(row.getAs[Long]("est_union") == 60L)
    assert(row.getAs[Long]("est_diff_ab") == 20L)
    assert(row.getAs[Long]("est_diff_ba") == 20L)
    assert(row.getAs[Long]("exact_intersect") == 20L)
    assert(row.getAs[Long]("err_e4") == 0L)
  }

  test("sketched estimates are calibrated: on 5000/5000 sets with 2000 " +
    "shared keys, every estimate lands within 4/sqrt(k) of the truth") {
    val a = (1L to 5000L).map(i => ("a", i))
    val b = (3001L to 8000L).map(i => ("b", i)) // overlap 3001..5000
    val row = ThetaSketch.intersectEstimate(
      (a ++ b).toDF("g", "kk"), "g", "kk", "a", "b", k = 256)
      .collect().head
    val tol = 4.0 / math.sqrt(256.0) // 25%, generous vs the ~6% sigma
    def within(est: Long, truth: Double) =
      math.abs(est - truth) <= tol * truth
    assert(within(row.getAs[Long]("est_a"), 5000.0), row)
    assert(within(row.getAs[Long]("est_b"), 5000.0), row)
    assert(within(row.getAs[Long]("est_intersect"), 2000.0), row)
    assert(within(row.getAs[Long]("est_union"), 8000.0), row)
    assert(within(row.getAs[Long]("est_diff_ab"), 3000.0), row)
    assert(within(row.getAs[Long]("est_diff_ba"), 3000.0), row)
    // sample-level consistency: the algebra adds up EXACTLY, not just
    // in expectation (same {v < theta} sample under every op)
    assert(row.getAs[Long]("est_intersect") + row.getAs[Long]("est_diff_ab")
      + row.getAs[Long]("est_diff_ba") <= row.getAs[Long]("est_union") + 2
      && row.getAs[Long]("est_intersect") + row.getAs[Long]("est_diff_ab")
      + row.getAs[Long]("est_diff_ba") >= row.getAs[Long]("est_union") - 2)
    assert(row.getAs[Long]("exact_intersect") == 2000L)
  }

  test("KMV re-merge is LOSSLESS: per-scope bottom-k sketches exploded " +
    "and bottom-k'd again (NO re-hash — sketch values are already in " +
    "hash space) equal the direct sketch of the union — the warehouse-" +
    "object property (persist daily sketches, merge later)") {
    val df = (1L to 4000L)
      .map(i => (s"day${i % 5}", i)).toDF("g", "kk")
    val perDay = ThetaSketch.kmvSketch(df, "g", "kk", k = 128)
    val remerged = perDay.select(explode(col("vals")).as("v"))
      .distinct().orderBy("v").limit(128).as[Long].collect().toSeq
    val direct = ThetaSketch.kmvSketch(
      df.select(lit("all").as("g"), col("kk")), "g", "kk", k = 128)
      .as[(String, Seq[Long], Long)].head()
    assert(remerged == direct._2)
  }

  test("KmvMergeVals aggregate: associative + commutative — any " +
    "grouping/order of per-scope sketches merges to the SAME sketch, " +
    "which equals the direct sketch of the union, with theta/est on " +
    "the integer grid") {
    val df = (1L to 4000L).map(i => (s"day${i % 7}", i)).toDF("g", "kk")
    val perDay = ThetaSketch.kmvSketch(df, "g", "kk", k = 128)
      .persist()
    def mergeOf(scopes: Seq[String]) = perDay
      .filter(col("g").isin(scopes: _*))
      .agg(KmvMergeVals.kmvMergeVals(col("vals"), 128).as("mk"))
      .select(col("mk.vals"), col("mk.theta"), col("mk.est"))
      .as[(Seq[Long], Long, Long)].head()
    val all = (0 until 7).map(i => s"day$i")
    // ((0..3) already merged) + (4..6): the aggregate re-merges its own
    // output arrays — associativity over PERSISTED intermediate sketches
    val left = mergeOf(all.take(4))
    val right = mergeOf(all.drop(4))
    val nested = Seq(left, right).map(_._1).toDF("vals")
      .agg(KmvMergeVals.kmvMergeVals(col("vals"), 128).as("mk"))
      .select(col("mk.vals"), col("mk.theta"), col("mk.est"))
      .as[(Seq[Long], Long, Long)].head()
    val flat = mergeOf(all)
    val flatReversed = mergeOf(all.reverse)
    assert(nested == flat)
    assert(flatReversed == flat)
    // equals the direct sketch of the union: lossless re-merge
    val direct = ThetaSketch.kmvSketch(
      df.select(lit("all").as("g"), col("kk")), "g", "kk", k = 128)
      .as[(String, Seq[Long], Long)].head()
    assert(flat._1 == direct._2)
    assert(flat._2 == direct._2.last) // full sketch: theta = k-th value
    // est = (k-1)*2^52 div theta on the same grid
    assert(flat._3 == 127L * (1L << 52) / flat._2)
    perDay.unpersist()
  }

  test("disjoint sets: intersection estimate is exactly zero (no false " +
    "sample matches), union estimate still calibrated") {
    val a = (1L to 3000L).map(i => ("a", i))
    val b = (100001L to 103000L).map(i => ("b", i))
    val row = ThetaSketch.intersectEstimate(
      (a ++ b).toDF("g", "kk"), "g", "kk", "a", "b", k = 128)
      .collect().head
    assert(row.getAs[Long]("n_matched") == 0L)
    assert(row.getAs[Long]("est_intersect") == 0L)
    assert(row.getAs[Long]("exact_intersect") == 0L)
    assert(row.isNullAt(row.fieldIndex("err_e4")), "0/0 error is null")
    assert(math.abs(row.getAs[Long]("est_union") - 6000.0) < 0.35 * 6000)
  }
}
