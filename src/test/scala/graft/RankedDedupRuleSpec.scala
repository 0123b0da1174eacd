package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.RankedDedupRewrite

/** The ranked-dedup optimizer rule: the SQL window idiom must plan as
  * the min_by aggregate (no Window node) with identical results, and
  * every guard must keep the window form when the rewrite would be
  * unsound. Registered per-session via experimental.extraOptimizations
  * (the rule's second documented registration path — the first is the
  * GraftExtensions `spark.sql.extensions` hook, which needs the config
  * set before session construction).
  */
class RankedDedupRuleSpec extends SparkTestBase {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RankedDedupRewrite
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RankedDedupRewrite)
    super.afterAll()
  }

  private def fixture = Seq(
    ("a", 3, 10L, 1.5, "x"), ("a", 1, 20L, 2.5, "y"), ("a", 1, 30L, 0.5, "z"),
    ("b", 2, 40L, 9.9, "w"), ("b", 5, 50L, 1.1, "v"), ("c", 7, 60L, 7.7, "u")
  ).toDF("k", "pri", "seq", "score", "payload")

  test("SQL QUALIFY-style row_number()=1 plans as min_by, results unchanged") {
    fixture.createOrReplaceTempView("rr_t")
    val q = spark.sql(
      """SELECT k, pri, seq, score, payload FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY k ORDER BY pri ASC, score DESC, seq ASC) AS rn
        |  FROM rr_t) WHERE rn = 1""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("min_by"), plan)
    // ordering total per key (seq unique) → exactly the window's answer
    val expect = Dedup.rankedFirst(fixture, Seq(col("k")),
      Seq(col("pri").asc, col("score").desc, col("seq").asc)).collect().toSet
    assert(q.collect().toSet == expect)
  }

  test("DataFrame rankedFirst also rewrites under the rule") {
    val out = Dedup.rankedFirst(fixture, Seq(col("k")),
      Seq(col("score").desc, col("seq").asc))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(out.count() == 3)
  }

  test("guard: rn kept in the output blocks the rewrite") {
    fixture.createOrReplaceTempView("rr_t")
    val q = spark.sql(
      """SELECT k, rn FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY k ORDER BY seq) AS rn
        |  FROM rr_t) WHERE rn = 1""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
    assert(q.collect().forall(_.getInt(1) == 1))
  }

  test("guard: a DESC STRING ordering keeps the window form") {
    val out = Dedup.rankedFirst(fixture, Seq(col("k")),
      Seq(col("payload").desc, col("seq").asc))
    assert(out.queryExecution.executedPlan.toString.contains("Window"))
    assert(out.count() == 3)
  }

  test("guard: rn = 2 (not a dedup) keeps the window form") {
    fixture.createOrReplaceTempView("rr_t")
    val q = spark.sql(
      """SELECT k, seq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq) AS rn
        |  FROM rr_t) WHERE rn = 2""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("Window"))
    assert(q.count() == 2) // a and b have second rows, c does not
  }

  test("nullable DESC NULLS LAST ordering keeps the window form; " +
    "explicit NULLS FIRST rewrites with nulls winning") {
    val df = Seq(("a", Some(1L), 1L), ("a", None, 2L), ("b", Some(5L), 3L))
      .toDF("k", "v", "seq")
    df.createOrReplaceTempView("rr_n")
    // default DESC = NULLS LAST on a nullable key: must NOT rewrite
    val qLast = spark.sql(
      """SELECT k, v, seq FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC) AS rn
        |  FROM rr_n) WHERE rn = 1""".stripMargin)
    assert(qLast.queryExecution.executedPlan.toString.contains("Window"))
    // explicit NULLS FIRST: rewrite allowed, null row wins for k=a
    val qFirst = spark.sql(
      """SELECT k, v, seq FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY k ORDER BY v DESC NULLS FIRST, seq) AS rn
        |  FROM rr_n) WHERE rn = 1""".stripMargin)
    assert(!qFirst.queryExecution.executedPlan.toString.contains("Window"))
    val rows = qFirst.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows == Map("a" -> 2L, "b" -> 3L))
  }
}
