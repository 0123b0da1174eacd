package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Similarity.mmrTopK]]: agreement with a driver-side greedy MMR
  * recompute, the λ=100 degeneration to plain relevance order, and the
  * diversification behavior the operator exists for.
  */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic synthetic embeddings: 2 query vectors (ids 0,1) and a
  // corpus containing a near-duplicate pair that plain top-k ranks
  // back to back
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (10L, Array(0.9f, 0.1f, 0.0f)),
    (11L, Array(0.9f, 0.11f, 0.0f)), // near-dup of 10
    (12L, Array(0.7f, 0.0f, 0.7f)),
    (13L, Array(0.6f, 0.6f, 0.0f)),
    (14L, Array(0.5f, 0.0f, -0.5f)),
    (15L, Array(0.2f, 0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  private def cosE6(a: Array[Float], b: Array[Float]): Long = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val d = ad.zip(bd).map { case (x, y) => x * y }.sum
    val na = math.sqrt(ad.map(x => x * x).sum)
    val nb = math.sqrt(bd.map(x => x * x).sum)
    math.floor(d / (na * nb) * 1e6).toLong
  }

  /** Reference greedy MMR, sequential and obvious. */
  private def bruteMmr(vecs: Map[Long, Array[Float]], qid: Long,
      m: Int, k: Int, lam: Int): Seq[(Long, Long, Int)] = {
    val rel = vecs.filterNot(_._1 == qid)
      .map { case (id, v) => id -> cosE6(vecs(qid), v) }
    val shortlist = rel.toSeq.sortBy { case (id, c) => (-c, id) }.take(m)
    var selected = Vector.empty[(Long, Long, Int)]
    for (step <- 1 to k) {
      val remaining = shortlist.filterNot(c => selected.exists(_._1 == c._1))
      if (remaining.nonEmpty) {
        val scored = remaining.map { case (id, c) =>
          val pen = selected.map(s => cosE6(vecs(id), vecs(s._1)))
            .foldLeft(0L)(math.max)
          (id, lam * c - (100L - lam) * pen)
        }
        val (id, sc) = scored.minBy { case (id, sc) => (-sc, id) }
        selected :+= ((id, sc, step))
      }
    }
    selected
  }

  test("matches the driver-side greedy recompute for both queries") {
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    val got = Similarity.mmrTopK(emb, "vec_id", "embedding",
        col("vec_id") < 2, m = 6, k = 4, lambdaPct = 70)
      .as[(Long, Long, Long, Int)].collect()
      .map { case (q, n, s, r) => (q, (n, s, r)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._3).toSeq).toMap
    for (qid <- Seq(0L, 1L)) {
      assert(got(qid) == bruteMmr(vecs, qid, 6, 4, 70), s"query $qid")
    }
  }

  test("lambda=100 degenerates to plain relevance order (cosineTopK ranks)") {
    val mmr = Similarity.mmrTopK(emb, "vec_id", "embedding",
        col("vec_id") === 0, m = 6, k = 4, lambdaPct = 100)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    val plain = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 4)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    assert(mmr.map(_._2).toSeq == plain.map(_._2).toSeq)
    assert(mmr.map(_._3).toSeq == plain.map(_._3).map(_ * 100L).toSeq)
  }

  test("diversification defers the near-duplicate: ids 10 and 11 are " +
    "relevance ranks 1-2 for query 0, but MMR does not pick both first") {
    val plain = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") === 0, k = 2)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().map(_._2)
    assert(plain.toSet == Set(10L, 11L))
    // λ=50: the ~0.99998 sim between 10 and 11 outweighs 11's relevance
    // edge over the genuinely-different 12
    val mmr = Similarity.mmrTopK(emb, "vec_id", "embedding",
        col("vec_id") === 0, m = 6, k = 2, lambdaPct = 50)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect().map(_._2)
    assert(mmr.toSet != Set(10L, 11L), mmr.toSeq)
  }

  test("a query with a shortlist smaller than k returns the whole " +
    "shortlist, ranks dense from 1") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (10L, Array(0.9f, 0.1f)),
      (11L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = Similarity.mmrTopK(tiny, "vec_id", "embedding",
        col("vec_id") === 0, m = 2, k = 2, lambdaPct = 70)
      .orderBy("rank").as[(Long, Long, Long, Int)].collect()
    assert(got.map(_._4).toSeq == Seq(1, 2))
    assert(got.map(_._2).toSet == Set(10L, 11L))
  }
}
