package graft

import org.apache.spark.sql.functions._

import graft.operators.ProductQuantization

/** Product-quantization ANN: deterministic training, empty-cluster
  * handling, encoding, and ADC top-k semantics.
  */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 8-dim corpus, two well-separated clusters + one planted near-dup pair
  private def corpus = Seq(
    (0L, Array(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0)),
    (1L, Array(0.98, 0.02, 0.0, 0.0, 0.97, 0.01, 0.0, 0.0)), // near 0
    (2L, Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0)),
    (3L, Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0)),
    (4L, Array(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
  ).toDF("vec_id", "embedding")

  test("training is deterministic and shapes are (m × codes × dsub)") {
    def train() = ProductQuantization.trainCodebookComponents(
      corpus, "vec_id", "embedding", m = 4, dim = 8, ksub = 4, iters = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    val cb = train()
    assert(cb == train())
    // 4 subspaces × 4 codes × 2 dims
    assert(cb.size == 32)
    assert(cb.map(_._1) == Set(0, 1, 2, 3))
    assert(cb.map(_._2) == Set(0, 1, 2, 3))
  }

  test("a code whose cluster empties keeps its init centroid") {
    // ids 0 and 1 identical: init codes 0 and 1 get identical centroids,
    // every assignment tie-breaks to code 0, so code 1's cluster is empty
    // after the Lloyd step and must keep the init (e6-quantized) value
    val dup = Seq(
      (0L, Array(0.5, 0.25)), (1L, Array(0.5, 0.25)),
      (2L, Array(-0.5, -0.25)), (3L, Array(0.1, 0.9))
    ).toDF("vec_id", "embedding")
    val cb = ProductQuantization.trainCodebookComponents(
      dup, "vec_id", "embedding", m = 1, dim = 2, ksub = 2, iters = 1)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    // code 1 = id 1's init components, untouched by the iteration
    assert(cb((1, 0)) == 500000L && cb((1, 1)) == 250000L)
    // code 0 absorbed everything assigned to it: mean over ids {0,1}
    // (identical) and whatever else fell nearest — at minimum it moved
    // or stayed; the key property is it is the ONLY non-init value
    val rerun = ProductQuantization.trainCodebookComponents(
      dup, "vec_id", "embedding", m = 1, dim = 2, ksub = 2, iters = 1)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(cb == rerun)
  }

  test("encode emits exactly m codes per vector, all within the codebook") {
    val cb = ProductQuantization.assembleCodebook(
      ProductQuantization.trainCodebookComponents(
        corpus, "vec_id", "embedding", m = 4, dim = 8, ksub = 4, iters = 1))
    val codes = ProductQuantization.encode(corpus, "vec_id", "embedding",
      cb, m = 4, dim = 8)
      .as[(Long, Int, Int)].collect()
    assert(codes.length == 5 * 4)
    assert(codes.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)))
    assert(codes.forall(c => c._3 >= 0 && c._3 < 4))
  }

  test("ADC top-k finds the planted near-dup at rank 1 and never returns self") {
    val cb = ProductQuantization.assembleCodebook(
      ProductQuantization.trainCodebookComponents(
        corpus, "vec_id", "embedding", m = 4, dim = 8, ksub = 5, iters = 1))
    val codes = ProductQuantization.encode(corpus, "vec_id", "embedding",
      cb, m = 4, dim = 8)
    val top = ProductQuantization.adcTopK(corpus, "vec_id", "embedding",
      codes, cb, col("vec_id") < 2, k = 2, m = 4, dim = 8)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Int)].collect()
    val byQ = top.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byQ(0L).head == 1L) // the near-dup
    assert(byQ(1L).head == 0L)
    assert(!top.exists(r => r._1 == r._2))
    top.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq)
    }
  }

  test("with one vector per cluster, ADC ranking equals exact " +
    "squared-distance ranking (quantization error is zero)") {
    // ksub >= n: each Lloyd cluster holds exactly its init vector, so
    // centroids are the (e6-quantized) vectors themselves and the ADC
    // distance is the true distance — PQ degenerates to exact search
    val cb = ProductQuantization.assembleCodebook(
      ProductQuantization.trainCodebookComponents(
        corpus, "vec_id", "embedding", m = 4, dim = 8, ksub = 5, iters = 1))
    val codes = ProductQuantization.encode(corpus, "vec_id", "embedding",
      cb, m = 4, dim = 8)
    val got = ProductQuantization.adcTopK(corpus, "vec_id", "embedding",
      codes, cb, lit(true), k = 4, m = 4, dim = 8)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // exact ranking from the raw vectors (sq distance asc, id asc)
    val vecs = corpus.as[(Long, Array[Double])].collect().toMap
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.keys.foreach { q =>
      val expect = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (sq(vecs(q), vecs(n)), n))
      assert(got(q) == expect, s"query $q")
    }
  }

  test("IVF-PQ: with probe-all and one code per residual, ranking equals " +
    "exact squared distance — residual encoding cancels the centroid") {
    // ||(q - c) - (n - c)||² = ||q - n||²: when ksub >= bucket sizes the
    // PQ codes are the residuals themselves, so ADC over ANY probed
    // bucket scores the true distance regardless of which centroid the
    // residuals were taken against
    val cents = corpus.filter(col("vec_id").isin(0L, 2L))
    val got = ProductQuantization.ivfPqTopK(corpus, "vec_id", "embedding",
      cents, "vec_id", "embedding", lit(true), k = 4, m = 4, dim = 8,
      ksub = 5, iters = 1, nprobe = 2)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val vecs = corpus.as[(Long, Array[Double])].collect().toMap
    def sq(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.keys.foreach { q =>
      val expect = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (sq(vecs(q), vecs(n)), n))
      assert(got(q) == expect, s"query $q")
    }
  }

  test("IVF-PQ: nprobe=1 confines candidates to the query's own bucket, " +
    "nprobe widens monotonically, and reruns are deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.filter(col("vec_id") % 50 === 0)
    def run(np: Int) = ProductQuantization.ivfPqTopK(emb, "vec_id",
      "embedding", cents, "vec_id", "embedding", col("vec_id") < 5,
      k = 3, m = 8, dim = 64, ksub = 8, iters = 1, nprobe = np)
      .select("query_id", "nbr_id", "adist_e6", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val p1 = run(1)
    assert(p1 == run(1)) // deterministic
    // every nprobe=1 neighbor shares the query's coarse bucket
    val assigned = graft.operators.Similarity.ivfAssign(emb, "vec_id",
      "embedding", cents, "vec_id", "embedding")
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    p1.foreach { case (q, n, _, _) =>
      assert(assigned(q) == assigned(n), s"pair ($q, $n) crosses buckets")
    }
    // widening probes can only improve (or keep) each query's k-th
    // distance: candidates are a superset, scored identically
    def worst(rows: Set[(Long, Long, Long, Int)]): Map[Long, Long] =
      rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val w1 = worst(p1); val w3 = worst(run(3))
    w1.keys.foreach(q => assert(w3(q) <= w1(q), s"query $q"))
  }

  // ---- SQ8 scalar quantization ----

  test("sq8TopK: hand-computed codes and integer distances on a 2-dim " +
    "corpus, constant dimensions quantize to 0") {
    // dim0 spans [0,2] => codes 0 / 127 / 255; dim1 constant => all 0
    val emb = Seq(
      (0L, Array(0.0f, 7.0f)),
      (1L, Array(1.0f, 7.0f)),
      (2L, Array(2.0f, 7.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .sq8TopK(emb, "vec_id", "embedding", col("vec_id") === 0L, k = 2)
      .select("query_id", "nbr_id", "sqdist_q8", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // codes: v0 -> 0, v1 -> floor(1*255/2)=127, v2 -> 255
    // dist(v0,v1) = 127² = 16129; dist(v0,v2) = 255² = 65025
    assert(out.toSeq == Seq((0L, 1L, 16129L, 1), (0L, 2L, 65025L, 2)))
  }

  test("sq8TopK: ranking is partitioning-invariant (integer distances) " +
    "and ties break by neighbor id") {
    val rnd = new scala.util.Random(88)
    val emb = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) = graft.operators.Similarity
      .sq8TopK(df, "vec_id", "embedding", col("vec_id") < 3L, k = 5)
      .select("query_id", "nbr_id", "sqdist_q8", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val a = run(emb)
    val b = run(emb.repartition(11))
    assert(a == b)
    // mirrored duplicate vectors: equal distance, lower id must rank first
    val dup = Seq((0L, Array(0f, 0f)), (7L, Array(1f, 1f)), (3L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val ranks = graft.operators.Similarity
      .sq8TopK(dup, "vec_id", "embedding", col("vec_id") === 0L, k = 2)
      .select("nbr_id", "rank").as[(Long, Int)].collect().toMap
    assert(ranks == Map(3L -> 1, 7L -> 2))
  }
}
