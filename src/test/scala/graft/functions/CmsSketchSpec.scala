package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Count-min sketch invariants: bit-exact under any partitioning
  * (merge = elementwise add is associative+commutative), n_total equals
  * the stream length, never under-estimates, and the grid matches a
  * from-first-principles replay of the Kirsch–Mitzenmacher arithmetic.
  */
class CmsSketchSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D = 4
  private val LogW = 6 // w = 64: small grid forces collisions

  private def grid(df: org.apache.spark.sql.DataFrame): (Long, Map[(Int, Int), Long]) = {
    val r = df.select(xxhash64(col("v")).as("h"))
      .agg(CmsCounters.cmsCounters(col("h"), D, LogW).as("sk"))
      .select(col("sk.n_total"), col("sk.counters")).head()
    val cells = r.getSeq[Row](1).map(c =>
      (c.getInt(0), c.getInt(1)) -> c.getLong(2)).toMap
    (r.getLong(0), cells)
  }

  test("partitioning-invariant: 1-partition and 32-partition builds " +
    "produce the identical grid; n_total = stream length") {
    val vals = (1L to 5000L).map(v => v % 700)
    val (n1, g1) = grid(vals.toDF("v").coalesce(1))
    val (n32, g32) = grid(vals.toDF("v").repartition(32))
    assert(n1 == 5000L && n32 == 5000L)
    assert(g1 == g32)
  }

  test("grid matches a driver-side replay of the same arithmetic; " +
    "estimates never under-count") {
    val vals = (1L to 2000L).map(v => v % 150)
    val (_, g) = grid(vals.toDF("v"))
    // replay: same xxhash64 (via the engine, one scan), same index math
    val hashes = vals.toDF("v").select(col("v"),
      xxhash64(col("v")).as("h")).as[(Long, Long)].collect()
    val expect = collection.mutable.Map[(Int, Int), Long]().withDefaultValue(0L)
    val w = 1 << LogW
    hashes.foreach { case (_, h) =>
      val a = h >>> 32
      val b = (h & 0xffffffffL) | 1L
      (0 until D).foreach { i =>
        val idx = ((a + i * b) & (w - 1)).toInt
        expect((i, idx)) += 1L
      }
    }
    assert(g == expect.toMap)
    // point estimates: min over rows >= true count, for every value
    val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    hashes.distinct.foreach { case (v, h) =>
      val a = h >>> 32
      val b = (h & 0xffffffffL) | 1L
      val est = (0 until D).map(i =>
        g(((i, ((a + i * b) & (w - 1)).toInt)))).min
      assert(est >= truth(v), s"under-estimate for $v")
    }
  }

  test("null HASH inputs are skipped, not counted (note xxhash64(null) " +
    "is the non-null seed hash — null-skip applies to the hash column)") {
    val n = Seq(Some(7L), None, Some(7L), None).toDF("h")
      .agg(CmsCounters.cmsCounters(col("h"), D, LogW).as("sk"))
      .select(col("sk.n_total")).as[Long].head()
    assert(n == 2L)
  }
}
