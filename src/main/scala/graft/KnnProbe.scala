package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bisection probe for the round-9 `sim_knn_graph` slowdown: the round-9
  * diff replaced the per-query top-k window with the map-side-combining
  * [[graft.functions.TopKByScore]] aggregate (commit 8b58d9f). That is
  * the right 100 TB shape — the window shuffles and sorts EVERY scored
  * (query, candidate) row, the aggregate ships k rows per query per map
  * partition — but knnGraph is the one caller whose scored stream is
  * already cluster-bucketed and modest (Σ|cluster|² rows), so the
  * window's sort was cheap there and the aggregate's per-row typed
  * buffer updates (TypedImperativeAggregate — interpreted update path,
  * no codegen) can show up as a constant-factor regression at bench
  * scale. This main times both formulations on the same scored frame so
  * the artifact records WHICH constant factor the bench paid, not a
  * guess. Usage: runMain graft.KnnProbe [reps]; env SPARK_GRAFT_SF_DIR.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the sim_knn_graph fixture shape (SparkEntry.scala): every-50th
    // vector as centroid, k=6
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val cents = emb.filter(col("vec_id") % 50 === 0)

    def scored(): DataFrame = {
      val assigned = graft.operators.Similarity.ivfAssign(
        emb, "vec_id", "embedding", cents, "vec_id", "embedding")
      val withNrm = assigned.withColumn("nrm",
        graft.operators.Similarity.norm(col("v")))
      val q = withNrm.select(col("cent_id"), col("vec_id").as("query_id"),
        col("v").as("q_vec"), col("nrm").as("q_nrm"))
      val n = withNrm.select(col("cent_id"), col("vec_id").as("nbr_id"),
        col("v").as("nbr_vec"), col("nrm").as("nbr_nrm"))
      q.join(n, Seq("cent_id"))
        .filter(col("query_id") =!= col("nbr_id"))
        .withColumn("cos_e6",
          floor(graft.operators.Similarity.dot(col("q_vec"), col("nbr_vec"))
            / (col("q_nrm") * col("nbr_nrm")) * 1e6).cast("long"))
    }

    def aggTopK(df: DataFrame, k: Int): DataFrame =
      df.groupBy(col("query_id"))
        .agg(graft.functions.TopKByScore.topKByScore(
          struct(col("cos_e6"), col("nbr_id")), k).as("tk"))
        .select(col("query_id"), posexplode(col("tk")))
        .select(col("query_id"), col("col.id").as("nbr_id"),
          col("col.score").as("cos_e6"), (col("pos") + 1).cast("int").as("rank"))

    def windowTopK(df: DataFrame, k: Int): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_e6").desc, col("nbr_id").asc)
      df.withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= k)
        .select("query_id", "nbr_id", "cos_e6", "rank")
    }

    def time(tag: String, mk: () => DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = mk().count()
        println(f"$tag run $r: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }
    }

    // warm both plans once
    aggTopK(scored(), 6).count(); windowTopK(scored(), 6).count()
    time("agg   ", () => aggTopK(scored(), 6))
    time("window", () => windowTopK(scored(), 6))
    spark.stop()
  }
}
