package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class UpperTrianglePairsSpec extends SparkTestBase {
  import spark.implicits._

  /** The declarative HOF formulation the expression replaced — the
    * equivalence reference (exact pairs AND order must match).
    */
  private def hofPairs(c: org.apache.spark.sql.Column) =
    flatten(transform(c, (x, i) =>
      transform(slice(c, i + 2, greatest(size(c) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))

  test("equals the HOF formulation on scalar arrays (sizes 0..6, dups)") {
    val df = Seq(
      Seq.empty[Long], Seq(7L), Seq(1L, 2L), Seq(3L, 1L, 2L),
      Seq(5L, 5L, 5L), Seq(1L, 2L, 3L, 4L, 5L, 6L)
    ).toDF("xs")
    val got = df.select(UpperTrianglePairs.upperTrianglePairs(col("xs"))
      .as("p")).as[Seq[(Long, Long)]].collect()
    val want = df.select(hofPairs(col("xs")).as("p"))
      .as[Seq[(Long, Long)]].collect()
    assert(got.toSeq === want.toSeq)
    // spot-check order: i-major upper triangle
    assert(got(5) === Seq.tabulate(6)(i => (i + 1).toLong)
      .combinations(2).map { case Seq(a, b) => (a, b) }.toSeq)
  }

  test("equals the HOF formulation on struct arrays (the dedup-tier shape)") {
    val df = Seq(
      (Seq((1L, "x", 10), (2L, "y", 20), (3L, "z", 30))),
      (Seq((4L, "q", 1), (4L, "q", 1))),
      (Seq.empty[(Long, String, Int)])
    ).toDF("raw").select(transform(col("raw"),
      e => struct(e.getField("_1").as("id"), e.getField("_2").as("s"),
        e.getField("_3").as("sz"))).as("ps"))
    val got = df.select(explode(UpperTrianglePairs
        .upperTrianglePairs(col("ps"))).as("p"))
      .select(col("p.a.id"), col("p.a.s"), col("p.b.id"), col("p.b.sz"))
      .as[(Long, String, Long, Int)].collect().toSeq
    val want = df.select(explode(hofPairs(col("ps"))).as("p"))
      .select(col("p.a.id"), col("p.a.s"), col("p.b.id"), col("p.b.sz"))
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(got === want)
    assert(got === Seq((1L, "x", 2L, 20), (1L, "x", 3L, 30),
      (2L, "y", 3L, 30), (4L, "q", 4L, 1)))
  }

  test("participates in whole-stage codegen (no fallback)") {
    // spark.range keeps the projection in the executed plan (a local Seq
    // would be constant-folded into a LocalTableScan at optimize time)
    val df = spark.range(50)
      .select(array(col("id"), col("id") + 1, col("id") + 2).as("xs"))
      .select(explode(UpperTrianglePairs.upperTrianglePairs(col("xs"))).as("p"))
      .select(col("p.a") + col("p.b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    assert(df.count() === 150) // 3 pairs per row
  }

  test("SQL registration: upper_triangle_pairs usable from spark.sql") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT upper_triangle_pairs(array(1, 2, 3)) AS p").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))) ===
      Seq((1, 2), (1, 3), (2, 3)))
  }
}
