package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[RuntimeFilter.bloomSemiJoin]]: exactness vs the plain semi join,
  * the empty-dim degenerate path, and the plan/pruning contract — the
  * bloom predicate must actually eliminate fact rows BEFORE the join,
  * and the final row set must carry zero false positives through.
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def fact = (1L to 1000L)
    .map(i => (i, (i % 7).toString)).toDF("k", "payload")

  test("bit-identical to the plain semi join (false positives removed)") {
    // dim keys: multiples of 13 plus some misses outside the fact domain
    val dim = ((13L to 1000L by 13L) ++ Seq(5000L, 6000L)).toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk")
      .orderBy("k").collect()
    val want = fact.join(dim, $"k" === $"dk", "left_semi")
      .orderBy("k").collect()
    assert(got.toSeq == want.toSeq)
    assert(got.length == 1000 / 13)
  }

  test("duplicate dim keys do not multiply fact rows (semi, not inner)") {
    val dim = Seq(10L, 10L, 10L, 20L).toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk")
    assert(got.count() == 2)
  }

  test("empty dim: bloom aggregate is NULL, result is the exact empty set") {
    val dim = Seq.empty[Long].toDF("dk")
    assert(RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk").count() == 0)
  }

  test("the bloom pre-filter eliminates non-matching fact rows before " +
    "the exchange: a disjoint dim leaves ~zero survivor rows") {
    val dim = (100001L to 100100L).toDF("dk")
    val bloomBytes = dim
      .select(org.apache.spark.sql.graftshim.AggBridge
        .bloomAgg(col("dk"), 1L << 20, 1L << 23).as("bf"))
      .head.getAs[Array[Byte]](0)
    val survivors = fact.filter(org.apache.spark.sql.graftshim.AggBridge
      .bloomMightContain(bloomBytes, col("k"))).count()
    // 2^23 bits for ~100 items: false-positive mass is ~0 at 1000 probes
    assert(survivors <= 2L, s"bloom should prune, $survivors survived")
    assert(RuntimeFilter.bloomSemiJoin(fact, dim, "k", "dk").count() == 0)
  }

  test("plan: on a parquet fact the might_contain filter sits below ONE " +
    "left-semi join (a local-relation fact would be constant-folded)") {
    // the real j3 query at sf0.001: lineitem is a parquet scan, so the
    // bloom predicate survives optimization as a Filter above the scan
    val df = graft.SparkEntry.queries("j3_bloom_semijoin")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
    assert("(?i)leftsemi".r.findAllIn(p).size == 1, p)
  }

  test("string keys hash consistently between build and probe") {
    val sf = Seq("a", "b", "c", "d").toDF("k")
    val dim = Seq("b", "d", "zz").toDF("dk")
    val got = RuntimeFilter.bloomSemiJoin(sf, dim, "k", "dk")
      .as[String].collect().sorted
    assert(got.toSeq == Seq("b", "d"))
  }
}
