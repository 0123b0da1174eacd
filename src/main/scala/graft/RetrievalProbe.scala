package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.tableops.TxWarehouse

/** Scale probe for the materialized BM25 index: the same bounded query
  * set against the sf0.1 corpus at 1× and 10× (replicas with offset ids
  * and a one-token suffix), inline vs indexed. The claim under test:
  * the INLINE scorer re-tokenizes the corpus per call (cost ∝ corpus
  * tokens), while the INDEXED probe reads the stats table plus the
  * postings of the query terms (cost ∝ matching postings — which grow
  * with the corpus, but are a vanishing fraction of it). Pass criterion:
  * indexed ≪ inline at both scales, with the indexed 10× probe in the
  * neighborhood of the inline 1× cost.
  *
  * Usage: runMain graft.RetrievalProbe [outDir] (default target/retprobe)
  */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/root/repo/target/retprobe"
    val sf = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val off = 1000000L
    val docs10 = (0 until 10).map { r =>
      docs.select((col("doc_id") + lit(r * off)).as("doc_id"),
        concat(col("text"), lit(s" r$r")).as("text"))
    }.reduce(_ unionAll _)
    docs10.write.mode(SaveMode.Overwrite).parquet(s"$outDir/docs10.parquet")
    val d10 = spark.read.parquet(s"$outDir/docs10.parquet")

    val queries = SparkEntry.Bm25Queries

    def timed(f: () => Long): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      once(); math.min(once(), once()) // warm + min of two
    }

    def inline(d: DataFrame): () => Long =
      () => Retrieval.bm25TopK(spark, d, "doc_id", "text", queries, 10).count()

    def buildIndex(d: DataFrame, tag: String): (TxWarehouse, String, String, Double) = {
      val root = s"$outDir/ix_$tag"
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
      val wh = new TxWarehouse(root)
      val post = wh.tablePath("ix", "postings")
      val stat = wh.tablePath("ix", "stats")
      val t0 = System.nanoTime()
      Retrieval.indexDocs(spark, wh, post, stat, d, "doc_id", "text",
        java.time.LocalDate.parse("2024-01-01"), termFiles = 32)
      (wh, post, stat, (System.nanoTime() - t0) / 1e9)
    }

    val (wh1, p1, s1, build1) = buildIndex(docs, "1x")
    val (wh10, p10, s10, build10) = buildIndex(d10, "10x")
    def indexed(wh: TxWarehouse, p: String, s: String): () => Long =
      () => Retrieval.bm25TopKIndexed(spark, wh, p, s, queries, 10).count()

    val in1 = timed(inline(docs))
    val in10 = timed(inline(d10))
    val ix1 = timed(indexed(wh1, p1, s1))
    val ix10 = timed(indexed(wh10, p10, s10))

    val json =
      f"""{"inline_1x_sec":$in1%.3f,"inline_10x_sec":$in10%.3f,""" +
      f""""indexed_1x_sec":$ix1%.3f,"indexed_10x_sec":$ix10%.3f,""" +
      f""""build_1x_sec":$build1%.3f,"build_10x_sec":$build10%.3f,""" +
      f""""speedup_10x":${in10 / ix10}%.2f}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/retrieval_probe.json"), json + "\n")
    spark.stop()
  }
}
