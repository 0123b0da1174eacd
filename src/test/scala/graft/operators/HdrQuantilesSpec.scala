package graft.operators

import org.apache.spark.sql.functions._

/** HDR log-histogram quantiles: the estimate is a lower bound of the
  * exact quantile within one bucket width (rel err ≤ 1/32 above the
  * exact region, exact below 64), state stays under the grid cap, and
  * the result is partitioning-invariant.
  */
class HdrQuantilesSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val Qs = Seq("p50" -> 5000, "p90" -> 9000, "p99" -> 9900)

  test("estimate is a lower bound within 1/32 of the exact quantile " +
    "on a log-spread distribution; exact region exact") {
    // mixed magnitudes: 1..100 (exact region + first octaves) and a
    // heavy tail to 10^7
    val vals = ((1L to 1000L).map(i => i % 100 + 1) ++
      (1L to 500L).map(i => (1L << (i % 20).toInt) + i)).map(("g", _))
    val df = vals.toDF("g", "v").repartition(7)
    val got = TextAnalysis.hdrQuantiles(df, "g", "v", Qs, "n")
      .head()
    val sorted = vals.map(_._2).sorted
    val n = sorted.length
    Qs.zipWithIndex.foreach { case ((name, qE4), i) =>
      val est = got.getLong(i + 1)
      val exact = sorted(math.ceil(qE4.toDouble * n / 10000).toInt - 1)
      assert(est <= exact, s"$name: $est not a lower bound of $exact")
      assert(exact < 64 && est == exact ||
        exact.toDouble / est <= 1.0 + 1.0 / 32 + 1e-9,
        s"$name: $est too far below $exact")
    }
    assert(got.getLong(Qs.size + 1) == n.toLong)
  }

  test("partitioning-invariant and multi-group: 1 vs 32 partitions " +
    "agree; per-group state stays under the ~1,900-bucket cap") {
    val vals = (1L to 20000L).flatMap(i =>
      Seq(("a", i * 37 % 1000000 + 1), ("b", i % 50)))
    val r1 = TextAnalysis.hdrQuantiles(
      vals.toDF("g", "v").coalesce(1), "g", "v", Qs, "n")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val r32 = TextAnalysis.hdrQuantiles(
      vals.toDF("g", "v").repartition(32), "g", "v", Qs, "n")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(r1 == r32)
    val buckets = vals.toDF("g", "v").select(col("g"),
      when(col("v") < 64L, col("v")).otherwise(
        (length(conv(col("v"), 10, 2)) - 1).cast("long") * 32L - 128L +
          expr("CAST(conv(substring(conv(CAST(v AS BIGINT), 10, 2), 1, 6), 2, 10) AS BIGINT) - 32")
      ).as("b"))
      .groupBy("g").agg(countDistinct(col("b")).as("nb"))
      .as[(String, Long)].collect().toMap
    assert(buckets.values.forall(_ <= 1900L))
  }
}
