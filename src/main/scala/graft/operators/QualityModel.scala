package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DETERMINISTIC distributed logistic regression — a fastText-style
  * quality classifier (hashed bag-of-words features, weak labels)
  * whose full-batch gradient-descent training is BIT-REPRODUCIBLE
  * across engines, so a SQL oracle can replay the entire training loop
  * and match the learned weights exactly:
  *
  *  - features are raw token counts per md5 hash bucket (+ a bias
  *    column) — exact integers;
  *  - weights live as e6-scaled integers; the margin `w·x` is an exact
  *    integer sum (order-independent — the usual float-reduction
  *    nondeterminism of distributed GD is gone by construction);
  *  - the sigmoid is evaluated in double and IMMEDIATELY floor-
  *    quantized to e6 (the [[NgramLm]]/BM25 ln-precedent: one libm
  *    call between exact-integer stages);
  *  - the gradient `Σ (p − y)·x` is again an exact integer sum, and
  *    the update `w −= floor(g / (n·etaDen))` floors a single double
  *    division.
  *
  * Scale shape: the classic distributed-GD loop — per-iteration cost is
  * one broadcast of (dim+1) weights, one map-side-combined aggregate
  * over the (doc, bucket) feature table, and a (dim+1)-row collect.
  * Nothing corpus-sized ever reaches the driver; the feature table
  * builds once and persists across iterations.
  */
object QualityModel {

  /** Train `iters` full-batch GD steps; returns (j, w_e6) — bucket
    * weights for j in [0, dim) plus the bias at j = dim. `label` must
    * be a deterministic boolean column over `docs`.
    */
  def trainLogRegE6(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, label: Column, dim: Int, iters: Int,
      etaDen: Double = 1000.0): DataFrame = {
    import spark.implicits._
    require(dim >= 1 && iters >= 1)
    val toks = docs.select(col(idCol).as("doc"),
        explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val feats = toks.select(col("doc"),
        pmod(TextDedup.md5Long(col("w")), lit(dim.toLong)).cast("int").as("j"))
      .groupBy(col("doc"), col("j")).agg(count(lit(1)).as("x"))
      .unionByName(docs.select(col(idCol).as("doc"),
        lit(dim).as("j"), lit(1L).as("x")))
    val ys = docs.select(col(idCol).as("doc"),
      (label.cast("boolean").cast("long") * lit(1000000L)).as("y_e6"))
    val fx = feats.join(ys, Seq("doc")).persist()
    try {
      val n = docs.count()
      var w = Array.fill(dim + 1)(0L)
      for (_ <- 0 until iters) {
        val wDf = broadcast(
          w.zipWithIndex.map { case (v, j) => (j, v) }.toSeq.toDF("j", "w_e6"))
        val p = fx.join(wDf, Seq("j"))
          .groupBy(col("doc"))
          .agg(sum(col("w_e6") * col("x")).as("m_e6"),
            max(col("y_e6")).as("y_e6"))
          .withColumn("p_e6",
            floor(lit(1000000.0) /
              (lit(1.0) + exp(-(col("m_e6").cast("double") / lit(1000000.0)))))
              .cast("long"))
        val g = fx.join(p.select(col("doc"), col("p_e6")), Seq("doc"))
          .groupBy(col("j"))
          .agg(sum((col("p_e6") - col("y_e6")) * col("x")).as("g"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        w = w.zipWithIndex.map { case (v, j) =>
          v - math.floor(g.getOrElse(j, 0L).toDouble / (n * etaDen)).toLong
        }
      }
      w.zipWithIndex.map { case (v, j) => (j, v) }.toSeq.toDF("j", "w_e6")
    } finally { fx.unpersist(); () }
  }

  /** APPLY the trained model: per-document e6-scaled margin
    * `w·x + bias` — an exact integer (so thresholds and rankings are
    * engine-independent), positive ⇔ predicted positive. Map-side after
    * one (doc, bucket) aggregate; `weights` is (j, w_e6) from
    * [[trainLogRegE6]] and broadcasts.
    */
  def scoreLogRegE6(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        explode(split(coalesce(col(textCol), lit("")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val feats = toks.select(col("doc"),
        pmod(TextDedup.md5Long(col("w")), lit(dim.toLong)).cast("int").as("j"))
      .groupBy(col("doc"), col("j")).agg(count(lit(1)).as("x"))
      .unionByName(docs.select(col(idCol).as("doc"),
        lit(dim).as("j"), lit(1L).as("x")))
    feats.join(broadcast(weights), Seq("j"))
      .groupBy(col("doc"))
      .agg(sum(col("w_e6") * col("x")).as("margin_e6"))
      .select(col("doc").as(idCol), col("margin_e6"))
  }
}
