package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AdjacentPairsSpec extends SparkTestBase {
  import spark.implicits._

  test("consecutive pairs equal the lead-window formulation (order kept)") {
    val df = Seq(
      Seq.empty[Long], Seq(7L), Seq(1L, 2L), Seq(3L, 1L, 2L),
      Seq(5L, 5L, 5L, 5L)
    ).toDF("xs")
    val got = df.select(AdjacentPairs.adjacentPairs(col("xs")).as("p"))
      .as[Seq[(Long, Long)]].collect().toSeq
    val want = df.select(
      zip_with(slice(col("xs"), lit(1), greatest(size(col("xs")) - 1, lit(0))),
        slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b"))).as("p"))
      .as[Seq[(Long, Long)]].collect().toSeq
    assert(got === want)
    assert(got(3) === Seq((3L, 1L), (1L, 2L)))
  }

  test("struct elements (the transition shape) + whole-stage codegen") {
    val df = spark.range(40)
      .select(array(
        struct(col("id").as("t"), lit("a").as("e")),
        struct((col("id") + 1).as("t"), lit("b").as("e")),
        struct((col("id") + 2).as("t"), lit("c").as("e"))).as("es"))
      .select(explode(AdjacentPairs.adjacentPairs(col("es"))).as("p"))
      .select(col("p.a.e").as("src"), col("p.b.e").as("dst"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
    val counts = df.groupBy("src", "dst").count().as[(String, String, Long)]
      .collect().map { case (a, b, c) => (a, b) -> c }.toMap
    assert(counts === Map(("a", "b") -> 40L, ("b", "c") -> 40L))
  }

  test("SQL registration: adjacent_pairs usable from spark.sql") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      "SELECT adjacent_pairs(array(4, 2, 9)) AS p").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))) ===
      Seq((4, 2), (2, 9)))
  }
}
