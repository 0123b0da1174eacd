package graft

import org.apache.spark.sql.functions._

import graft.functions.GramMatrix
import graft.operators.Pca

/** Gram aggregate + PCA: the distributed statistic against a naive
  * reference, the eigensolve on a known-axis cloud, and the map-only
  * projection's variance/plan properties.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("gram aggregate equals the naive quantized computation") {
    val r = rng(1)
    val vecs = Seq.fill(50)(Array.fill(4)(r.nextFloat() * 2f - 1f))
    val df = vecs.map(v => Tuple1(v)).toDF("vec")
    val row = df.select(GramMatrix(col("vec"), 4, 1000.0).as("g"))
      .select("g.n", "g.sums", "g.gram").head()
    val q = vecs.map(_.map(x => math.floor(x * 1000.0).toLong))
    assert(row.getLong(0) == 50L)
    val sums = row.getSeq[Long](1)
    val gram = row.getSeq[Long](2)
    for (i <- 0 until 4)
      assert(sums(i) == q.map(_(i)).sum)
    var t = 0
    for (i <- 0 until 4; j <- i until 4) {
      assert(gram(t) == q.map(v => v(i) * v(j)).sum, s"($i,$j)")
      t += 1
    }
  }

  test("fit recovers a planted principal axis; eigenvalues descend") {
    val r = rng(2)
    val d = 8
    val axis = Array.tabulate(d)(i => if (i == 2) 0.8 else if (i == 5) 0.6 else 0.0)
    val vecs = Seq.fill(400) {
      val t = r.nextGaussian() * 0.5
      Array.tabulate(d)(i => (axis(i) * t + r.nextGaussian() * 0.01).toFloat)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("vec")
    val model = Pca.fit(df, "vec", d, k = 3, scale = 100000.0)
    val c0 = model.components(0)
    val cos = (c0, axis).zipped.map(_ * _).sum /
      math.sqrt(c0.map(x => x * x).sum) / math.sqrt(axis.map(x => x * x).sum)
    assert(math.abs(cos) > 0.99, s"principal axis off: cos=$cos")
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) >= model.eigenvalues(2))
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1),
      "planted variance must dominate the noise floor")
  }

  test("transform projects map-only: score variance matches eigenvalues " +
    "and the plan has no shuffle") {
    val r = rng(3)
    val d = 6
    val vecs = Seq.fill(500) {
      val t = r.nextGaussian()
      Array.tabulate(d)(i =>
        (if (i == 0) t else if (i == 1) 0.3 * t else 0.0).toFloat +
          (r.nextGaussian() * 0.02).toFloat)
    }
    val df = vecs.map(v => Tuple1(v)).toDF("vec")
    val model = Pca.fit(df, "vec", d, k = 2, scale = 100000.0)
    val out = Pca.transform(df, "vec", model)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "projection must be map-only")
    val scores = out.select(col("pca")).as[Seq[Double]].collect()
    for (c <- 0 until 2) {
      val s = scores.map(_(c))
      val mean = s.sum / s.length
      val varc = s.map(x => (x - mean) * (x - mean)).sum / s.length
      assert(math.abs(varc - model.eigenvalues(c)) < 0.05 * (model.eigenvalues(c) + 0.01),
        s"component $c variance $varc vs eigenvalue ${model.eigenvalues(c)}")
    }
  }

  test("wrong-length vector fails loudly; null vectors are skipped") {
    val ok = Seq(Tuple1(Array(1f, 2f)), Tuple1(null: Array[Float]))
      .toDF("vec")
    val row = ok.select(GramMatrix(col("vec"), 2, 10.0).as("g"))
      .select("g.n").as[Long].head()
    assert(row == 1L)
    val bad = Seq(Tuple1(Array(1f, 2f, 3f))).toDF("vec")
    val e = intercept[Exception] {
      bad.select(GramMatrix(col("vec"), 2, 10.0)).collect()
    }
    assert(e.getMessage != null)
  }
}
