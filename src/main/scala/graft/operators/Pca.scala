package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramMatrix

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction / whitening step ahead of clustering and
  * semantic dedup (SemDeDup-style pipelines whiten before cosine).
  *
  * Architecture mirrors the IVF/PQ training tiers: the TRAINING
  * statistic is one distributed pass ([[GramMatrix]] — a single packed
  * buffer per map task crosses the shuffle), the eigensolve runs
  * driver-side on the d×d covariance (d² doubles — microscopic next to
  * the corpus; cyclic Jacobi, deterministic rotation order), and the
  * learned projection APPLIES map-only: each component is a literal
  * array folded against the vector with `zip_with`/`aggregate` — no
  * shuffle, no UDF, broadcast-free (the matrix rides the plan as
  * literals).
  *
  * Sign convention: each eigenvector is normalized so its
  * largest-magnitude coordinate is positive (eigenvectors are
  * sign-ambiguous; fixing it makes `fit` a pure function of the data).
  */
object Pca {

  /** `(mean, components, eigenvalues)`: components are row vectors,
    * strongest first; eigenvalues in the same (descending) order, in
    * input units² (quantization scale divided back out).
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double])

  /** One distributed Gram pass + a driver-side Jacobi eigensolve.
    * `scale` is the integer quantization of the Gram statistic (input
    * resolution 1/scale — see [[GramMatrix]]'s overflow table).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int,
      scale: Double = 1000.0): Model = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val row = df.select(GramMatrix(col(vecCol), dim, scale).as("g"))
      .select(col("g.n"), col("g.sums"), col("g.gram")).head()
    val n = row.getLong(0).toDouble
    require(n >= 2, "PCA needs at least 2 vectors")
    val sums = row.getSeq[Long](1).toArray
    val gram = row.getSeq[Long](2).toArray
    // biased covariance in input units: (G_ij - S_i S_j / n) / n / scale²
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = (gram(t) - sums(i).toDouble * sums(j) / n) / n / (scale * scale)
      cov(i)(j) = c; cov(j)(i) = c
      t += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (v, i) => (-v, i) }.map(_._2)
    val comps = order.take(k).map { c =>
      val v = vectors.map(_(c))
      // sign fix: largest-|coordinate| positive
      val m = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(m) < 0) v.map(x => -x) else v
    }
    Model(sums.map(_ / n / scale), comps, order.take(k).map(values))
  }

  /** Map-only projection: `outCol` = array of `k` component scores of
    * the CENTERED vector. Components and mean are plan literals.
    */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pca"): DataFrame = {
    val meanArr = array(model.mean.map(m => lit(m)).toIndexedSeq: _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanArr,
      (x, m) => x - m)
    val scores = model.components.map { comp =>
      val compArr = array(comp.map(c => lit(c)).toIndexedSeq: _*)
      aggregate(zip_with(centered, compArr, (x, c) => x * c),
        lit(0.0), (acc, v) => acc + v)
    }
    df.withColumn(outCol, array(scores.toIndexedSeq: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors as COLUMNS).
    * Deterministic sweep order; converges quadratically — 64×64
    * covariance solves in well under a millisecond.
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val sgn = if (theta >= 0) 1.0 else -1.0
            val tTan = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tTan * tTan + 1.0)
            val s = tTan * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }
}
