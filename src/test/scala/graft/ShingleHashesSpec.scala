package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, ShingleHashes}
import graft.operators.TextDedup

class ShingleHashesSpec extends SparkTestBase {
  import spark.implicits._

  // gnarly tokenization cases: leading/trailing whitespace (empty tokens
  // under Java split with limit -1), runs of mixed whitespace, short docs,
  // empty and single-token strings, repeated shingles (distinctness)
  private val texts = Seq(
    "a b c d e",
    "  leading space",
    "trailing space ",
    "tabs\tand\nnewlines mixed  runs",
    "one",
    "two words",
    "",
    " ",
    "x y z x y z x y z",
    "a a a a a"
  )

  test("expression output equals the declarative HOF formulation on edge cases") {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val viaExpr = df.select(col("id"),
        GraftFunctions.shingleHashes(col("text"), 3).as("sh"))
      .as[(Int, Seq[Long])].collect().toMap
    // the reference formulation: string shingles hashed afterwards
    val viaHof = df.select(col("id"),
        transform(TextDedup.shingles(col("text"), 3), s => xxhash64(s)).as("sh"))
      .as[(Int, Seq[Long])].collect().toMap
    texts.indices.foreach { i =>
      assert(viaExpr(i) === viaHof(i), s"text ${i}: '${texts(i)}'")
    }
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // spark.range keeps the projection in the executed plan (a local Seq
    // would be constant-folded into a LocalTableScan at optimize time)
    val df = spark.range(100)
      .select(concat_ws(" ", lit("a b c"), col("id").cast("string")).as("text"))
      .select(GraftFunctions.shingleHashes(col("text")).as("sh"))
    // "*(n)" marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // evaluate through the generated path: 4 tokens => 2 distinct 3-grams
    assert(df.agg(sum(size(col("sh")))).head().getLong(0) === 200L)
  }

  test("SQL registration: shingle_hashes usable from spark.sql") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(shingle_hashes('a b c d', 3)) AS n").head().getInt(0)
    assert(n === 2) // "a b c", "b c d"
    val n1 = spark.sql(
      "SELECT size(shingle_hashes('a b c d e f', 2)) AS n").head().getInt(0)
    assert(n1 === 5)
  }

  test("md5 expressions equal the declarative md5Long formulations") {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    // shingle hashes: expression vs string shingles + md5Long
    val viaExpr = df.select(col("id"),
        GraftFunctions.shingleMd5Hashes(col("text")).as("hl"))
      .as[(Int, Seq[Long])].collect().toMap
    val viaHof = TextDedup.withShingleStrings(df, Seq("id"), "text")
      .select(col("id"), transform(col("shs"), s => TextDedup.md5Long(s)).as("hl"))
      .as[(Int, Seq[Long])].collect().toMap
    texts.indices.foreach(i => assert(viaExpr(i) === viaHof(i), s"'${texts(i)}'"))

    // minhash signature: expression vs explode + seeded md5Long lanes
    val sigExpr = df.select(col("id"),
        GraftFunctions.minhashMd5Signature(col("text"), numHashes = 4).as("sig"))
      .as[(Int, Seq[Long])].collect().toMap
    val sigHof = TextDedup.withShingleStrings(df, Seq("id"), "text")
      .select(col("id"), explode(col("shs")).as("s"))
      .select(col("id"), TextDedup.md5Long(col("s")).cast("string").as("h0"))
      .groupBy(col("id"))
      .agg(
        min(conv(substring(md5(concat(lit("0#"), col("h0"))), 1, 15), 16, 10)
          .cast("long")).as("h0m"),
        min(conv(substring(md5(concat(lit("0#"), col("h0"))), 16, 15), 16, 10)
          .cast("long")).as("h1m"),
        min(conv(substring(md5(concat(lit("1#"), col("h0"))), 1, 15), 16, 10)
          .cast("long")).as("h2m"),
        min(conv(substring(md5(concat(lit("1#"), col("h0"))), 16, 15), 16, 10)
          .cast("long")).as("h3m"))
      .select(col("id"), array(col("h0m"), col("h1m"), col("h2m"), col("h3m")).as("sig"))
      .as[(Int, Seq[Long])].collect().toMap
    texts.indices.foreach(i => assert(sigExpr(i) === sigHof(i), s"'${texts(i)}'"))

    // simhash: expression vs explode + 60-vote aggregate
    val fpExpr = df.select(col("id"),
        GraftFunctions.simhashMd5(col("text")).as("fp"))
      .as[(Int, Long)].collect().toMap
    val toks = TextDedup.withShingleStrings(df, Seq("id"), "text")
      .select(col("id"), explode(col("shs")).as("s"))
      .select(col("id"), TextDedup.md5Long(col("s")).as("h"))
    val votes = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val fpHof = toks.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 60).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("fp"))
      .as[(Int, Long)].collect().toMap
    texts.indices.foreach(i => assert(fpExpr(i) === fpHof(i), s"'${texts(i)}'"))
  }

  test("xx expressions equal the declarative explode+aggregate formulations") {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    // minhash: expression vs explode + seeded xxhash64 minima
    val sigExpr = df.select(col("id"),
        GraftFunctions.minhashXxSignature(col("text"), numHashes = 8).as("sig"))
      .as[(Int, Seq[Long])].collect().toMap
    val exploded = df.select(col("id"),
      explode(GraftFunctions.shingleHashes(col("text"), 3)).as("h0"))
    val mins = (0 until 8).map(i => min(xxhash64(lit(i), col("h0"))).as(s"h$i"))
    val sigHof = exploded.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
      .as[(Int, Seq[Long])].collect().toMap
    texts.indices.foreach(i => assert(sigExpr(i) === sigHof(i), s"'${texts(i)}'"))

    // simhash: expression vs explode + 64-vote aggregate
    val fpExpr = df.select(col("id"),
        GraftFunctions.simhashXx(col("text")).as("fp"))
      .as[(Int, Long)].collect().toMap
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("h0"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val fpHof = exploded.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("fp"))
      .as[(Int, Long)].collect().toMap
    texts.indices.foreach(i => assert(fpExpr(i) === fpHof(i), s"'${texts(i)}'"))
  }

  test("withHashedShingles (operator path) matches the expression directly") {
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val op = TextDedup.withHashedShingles(df, Seq("id"), "text")
      .as[(Int, Seq[Long])].collect().toMap
    val ex = df.select(col("id"),
        GraftFunctions.shingleHashes(coalesce(col("text"), lit("")), 3).as("sh"))
      .as[(Int, Seq[Long])].collect().toMap
    texts.indices.foreach(i => assert(op(i) === ex(i)))
  }
}
