package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Similarity.lshMultiprobeTopK]] invariants: exact duplicates are
  * guaranteed candidates (identical codes), ranking is dense and
  * monotone, results are deterministic, and the probe fan-out widens
  * the candidate set vs the own-bucket join.
  */
class LshMultiprobeSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  // 40 corpus vectors; id 100 duplicates query 0's vector exactly
  private def emb = {
    val rows = (0L until 5L).map(i => (i, vec(i.toInt))) ++
      (10L until 45L).map(i => (i, vec(i.toInt))) :+ (100L, vec(0))
    rows.toDF("vec_id", "embedding")
  }

  test("an exact duplicate of the query is always a candidate and " +
    "ranks first with cosine 1") {
    val got = Similarity.lshMultiprobeTopK(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 3)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.head._2 == 100L && got.head._3 >= 999999L, got.toSeq)
  }

  test("ranks are dense from 1 and cosine is non-increasing per query") {
    val got = Similarity.lshMultiprobeTopK(emb, "vec_id", "embedding",
        col("vec_id") < 5, k = 5)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1)
    got.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length).toSeq, s"q=$q")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq)
      assert(!rows.exists(_._2 == q), "self excluded")
    }
  }

  test("deterministic across runs and partitioning") {
    def run(parts: Int) = Similarity.lshMultiprobeTopK(
      emb.repartition(parts), "vec_id", "embedding",
      col("vec_id") < 5, k = 5)
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(run(1) == run(7))
  }

  test("multi-probe candidates strictly contain the own-bucket join's " +
    "(flip 0 is among the probes)") {
    // replicate the own-bucket candidate count via the banding directly
    val base = emb.select(col("vec_id").as("id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x.cast("double")).as("v"))
    val banded = base.select(col("id"),
      posexplode(graft.functions.SignBands.signBands(col("v"), 224, 28))
        .as(Seq("band", "bucket")))
    val q = banded.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("band"), col("bucket"))
    val own = q.join(banded, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id")).distinct().count()
    val multi = Similarity.lshMultiprobeTopK(emb, "vec_id", "embedding",
      col("vec_id") < 5, k = 1000).count()
    assert(multi >= own, s"multi=$multi own=$own")
  }
}
