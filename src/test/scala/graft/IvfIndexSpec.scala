package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** The materialized IVF index: per-day builds compose to the in-memory
  * operator's exact results, the probe read is confined by the
  * manifest's cent_id ranges, and re-ingest is idempotent.
  */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  // 3 well-separated clusters on axes 0/1/2, ids grouped by hundreds
  private def vec(axis: Int, jitter: Double): Array[Float] = {
    val v = Array.fill(4)(0.0f)
    v(axis) = 1.0f
    v((axis + 1) % 4) = jitter.toFloat
    v
  }
  private def emb = (0 until 30).map { i =>
    val axis = i % 3
    (i.toLong, vec(axis, 0.01 * (i / 3)))
  }.toDF("vec_id", "embedding")
  private def cents = Seq((100L, vec(0, 0.0)), (101L, vec(1, 0.0)),
    (102L, vec(2, 0.0))).toDF("vec_id", "embedding")

  test("indexed IVF equals the in-memory operator; the probe opens only " +
    "the queried clusters' files; day replay is idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfix").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val assign = wh.tablePath("ix", "ivf")
    Similarity.indexEmbeddings(spark, wh, assign,
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      cents, "vec_id", "embedding",
      java.time.LocalDate.parse("2024-01-01"), clusterFiles = 3)
    Similarity.indexEmbeddings(spark, wh, assign,
      emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
      cents, "vec_id", "embedding",
      java.time.LocalDate.parse("2024-01-02"), clusterFiles = 3)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().toSet
    val inline = rows(Similarity.ivfTopK(emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", col("vec_id") < 4, k = 3))
    val indexed = rows(Similarity.ivfTopKIndexed(spark, wh, assign,
      "vec_id", emb.filter(col("vec_id") < 4), "vec_id", "embedding",
      cents, "vec_id", "embedding", k = 3))
    assert(indexed == inline, s"indexed=$indexed inline=$inline")

    // pruning: one cluster's probe must not open every index file
    val total = wh.read(spark, assign).inputFiles.length
    val one = wh.readWhere(spark, assign, col("cent_id") === 100L)
      .inputFiles.length
    assert(one < total, s"cluster-range pruning inert: $one of $total")

    // replaying day 1 replaces its partition — results unchanged
    Similarity.indexEmbeddings(spark, wh, assign,
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      cents, "vec_id", "embedding",
      java.time.LocalDate.parse("2024-01-01"), clusterFiles = 3)
    assert(rows(Similarity.ivfTopKIndexed(spark, wh, assign,
      "vec_id", emb.filter(col("vec_id") < 4), "vec_id", "embedding",
      cents, "vec_id", "embedding", k = 3)) == inline)
  }
}
