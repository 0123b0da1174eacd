package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[RandomProjection.projectE6]]: agreement with a driver-side
  * recompute from the shared plane generator, the shuffle-free plan,
  * and the JL ordering sanity (a near-duplicate stays far closer than
  * an orthogonal vector after projection).
  */
class RandomProjectionSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64
  private def vec(seed: Int): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextFloat() * 2f - 1f)
  }

  test("matches the driver-side recompute from SignBands.planes exactly") {
    val rows = (0L until 8L).map(i => (i, vec(i.toInt)))
    val got = RandomProjection.projectE6(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", outDim = 16, dim = dim)
      .as[(Long, Int, Long)].collect()
      .map { case (id, j, c) => (id, j) -> c }.toMap
    val planes = graft.functions.SignBands.planes(16, dim)
    for ((id, v) <- rows; j <- 0 until 16) {
      var d = 0.0
      var i = 0
      while (i < dim) { d += v(i).toDouble * planes(j * dim + i); i += 1 }
      assert(got((id, j)) == math.floor(d * 1e6).toLong, s"id=$id j=$j")
    }
  }

  test("plan is map-only: no exchange, no join — the projection is a " +
    "pure per-row expression over the scan") {
    val df = RandomProjection.projectE6(
      (0L until 4L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", outDim = 16, dim = dim)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }

  test("JL sanity: a near-duplicate's projected distance stays well " +
    "under an unrelated vector's") {
    val base = vec(1)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val far = vec(99)
    val rows = Seq((0L, base), (1L, near), (2L, far)).toDF("vec_id", "embedding")
    val proj = RandomProjection.projectE6(rows, "vec_id", "embedding", 16, dim)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3.toDouble)).toMap
    def dist(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val dNear = dist(proj(0L).toSeq, proj(1L).toSeq)
    val dFar = dist(proj(0L).toSeq, proj(2L).toSeq)
    assert(dNear * 10 < dFar, s"near=$dNear far=$dFar")
  }
}
