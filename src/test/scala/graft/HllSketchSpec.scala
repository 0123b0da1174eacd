package graft

import org.apache.spark.sql.functions._

import graft.functions.HllRegisters
import graft.functions.HllRegisters.hllRegisters

/** HyperLogLog register sketch: bit slicing, mergeability, accuracy. */
class HllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(hashes: Seq[Long], parts: Int, p: Int = 9) =
    spark.createDataset(hashes).repartition(parts).toDF("h")
      .agg(hllRegisters(col("h"), p).as("sk"))
      .select(col("sk.nnz"), col("sk.est_raw"), col("sk.registers"))
      .collect()(0)

  test("register slicing: known hash values land in the documented " +
    "bucket with the documented rho (p=9: top 9 bits / 56-bitlength)") {
    val r = sketch(Seq(0L, 1L, -1L), parts = 1)
    val regs = r.getSeq[org.apache.spark.sql.Row](2)
      .map(x => (x.getInt(0), x.getInt(1)))
    // h=0: bucket 0, all-zero remainder -> rho = 64-9+1 = 56 (beats h=1's 55)
    // h=1: bucket 0, w=1 -> rho = 56 - bitlength(1) = 55 (max'd away by h=0)
    // h=-1: bucket 511 (all top bits set), w = 2^55-1 -> rho = 56-55 = 1
    assert(regs == Seq((0, 56), (511, 1)))
    assert(r.getInt(0) == 2)
  }

  test("sketch is a pure function of the value SET: duplicates and " +
    "partitioning change nothing (elementwise-max merge)") {
    val vals = (1L to 5000L).map(i => i * 2654435761L)
    val a = sketch(vals, parts = 1)
    val b = sketch(vals ++ vals ++ vals.take(137), parts = 32)
    assert(a == b)
  }

  test("raw estimate within 3 sigma (~14% at p=9) of truth above the " +
    "linear-counting cutover, on pre-hashed uniform input") {
    val n = 10000
    val hashed = spark.range(n).select(xxhash64(col("id")).as("h"))
      .agg(hllRegisters(col("h"), 9).as("sk"))
      .select(col("sk.est_raw")).as[Long].collect()(0)
    assert(math.abs(hashed - n).toDouble / n < 0.14,
      s"est $hashed vs exact $n")
  }

  test("alphaMicro pins the cross-engine constant exactly " +
    "(round(1e6 * 0.7213/(1 + 1.079/m)))") {
    assert(HllRegisters.alphaMicro(512) == 719783L)
    assert(HllRegisters.alphaMicro(4096) == 721110L)
  }

  test("re-merging persisted per-group sketches equals the one global " +
    "sketch (register max is associative across any grouping)") {
    val rows = (1L to 3000L).map(i => (s"g${i % 7}", i * 40503L))
    val df = rows.toDF("g", "h")
    val global = df.agg(hllRegisters(col("h"), 9).as("sk")).select(col("sk"))
      .collect()(0)
    val merged = df.groupBy(col("g"))
      .agg(hllRegisters(col("h"), 9).as("sk"))
      .agg(HllRegisters.hllMergeRegisters(col("sk.registers"), 9).as("sk"))
      .select(col("sk")).collect()(0)
    assert(merged == global)
  }
}
