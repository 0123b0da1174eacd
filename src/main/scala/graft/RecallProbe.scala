package graft

import org.apache.spark.sql.functions._

/** Recall-vs-cost trend of the IVF probe knob: at each nprobe, the mean
  * per-query recall of [[graft.operators.Similarity.ivfTopK]] against
  * the exact brute-force top-k, plus the steady-state runtime — the
  * curve a pipeline consults when sizing nprobe (candidates scale
  * ~nprobe/C of the corpus; recall approaches exact as nprobe → C).
  * Usage: runMain graft.RecallProbe [k] [nQueries]; env SPARK_GRAFT_SF_DIR.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val nq = if (args.length > 1) args(1).toLong else 50L
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") % 50 === 0)
    val pred = col("vec_id") < nq
    val exact = graft.operators.Similarity
      .cosineTopK(emb, "vec_id", "embedding", pred, k)
      .select("query_id", "nbr_id").persist()
    val nExact = exact.count().toDouble

    Seq(1, 2, 4, 8, 16).foreach { np =>
      def run() = graft.operators.Similarity.ivfTopK(emb, "vec_id",
        "embedding", cents, "vec_id", "embedding", pred, k, nprobe = np)
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        run().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val hits = exact.join(run().select("query_id", "nbr_id"),
        Seq("query_id", "nbr_id"), "left_semi").count()
      println(f"nprobe=$np%2d recall=${hits / nExact}%.3f time=${best}%.2fs")
    }
    spark.stop()
  }
}
