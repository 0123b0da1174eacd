package graft

/** Fixture pins for the three xxhash64-family tiers. Since round 10 the
  * DuckDB gate DOES recompute xxhash64 (XxOracleSql — HUGEINT modular
  * arithmetic), so these tiers carry full value-level oracle rows; the
  * fixtures stay as a second, Spark-only line of defense that runs in
  * `sbt test` without the oracle harness, and they are what the oracle
  * SQL itself was validated against while it was built. The md5-family
  * duals still carry the algorithmic cross-engine verification at the
  * expression level (ShingleHashesSpec/ExtensionsSpec).
  *
  * Values are stable across Spark versions and platforms: xxhash64 is a
  * fixed published algorithm and the fixtures were generated from a
  * verified run at sf0.01.
  */
class FixtureOracleSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.01"
  private val fixtures = "src/test/resources/fixtures/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def check(query: String): Unit = {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val actual = SparkEntry.queries(query)(spark, sfDir)
    val expected = spark.read.parquet(s"$fixtures/$query.parquet")
    assert(actual.columns.toSeq == expected.columns.toSeq)
    assert(rows(actual) == rows(expected))
  }

  test("dd_minhash_lsh matches its checked-in fixture at sf0.01") {
    check("dd_minhash_lsh")
  }

  test("dd_simhash matches its checked-in fixture at sf0.01") {
    check("dd_simhash")
  }

  test("dd_embed_neardup_lsh matches its checked-in fixture at sf0.01") {
    check("dd_embed_neardup_lsh")
  }
}
