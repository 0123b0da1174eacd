package graft

/** Fixture oracles for the three xxhash64-family tiers the DuckDB gate
  * cannot recompute (xxhash64 has no SQL equivalent — the md5-family
  * duals carry the algorithmic cross-engine verification, and these
  * tiers' expression-level parity with their duals is spec-enforced in
  * ShingleHashesSpec/ExtensionsSpec).
  *
  * What was still unguarded is DRIFT: a regression in the xx pipelines
  * would sail through the driver's rows-only check as long as the row
  * COUNT held. These fixtures pin the exact expected output at sf0.01,
  * checked in as parquet (generated from a verified run; xxhash64 is a
  * fixed published algorithm, so the values are stable across Spark
  * versions and platforms).
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
