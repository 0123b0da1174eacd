package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKByScore.topKByScore

/** Corpus-curation operators: per-stratum quality quotas, deterministic
  * dataset splits, and mixture reporting — the selection/accounting layer
  * a training-data pipeline runs between cleaning and packing.
  */
object Curation {

  /** Keep the top `quota` rows per stratum by (score DESC, id ASC) — the
    * "best N documents per language/domain" curation step.
    *
    * Scale shape: a per-group `row_number` window would hash-shuffle and
    * SORT every row of every stratum — a dominant stratum of a 100 TB
    * corpus serializes behind one task. This uses the TopKByScore
    * TypedImperativeAggregate instead: each map partition keeps a bounded
    * `quota`-element heap per stratum and only k·partitions rows cross
    * the shuffle (partial aggregation), after which the ≤ quota survivors
    * are exploded back to rows with their rank. Identical output to the
    * window formulation for any total (score, id) order.
    *
    * @return (strataCol, idCol, scoreCol, rank) — rank 1-based by
    *         (score DESC, id ASC) within the stratum.
    */
  def quotaTopK(df: DataFrame, strataCol: String, idCol: String,
      scoreCol: String, quota: Int): DataFrame =
    df.groupBy(col(strataCol))
      .agg(topKByScore(
        struct(col(scoreCol).cast("long"), col(idCol).cast("long")), quota)
        .as("__top"))
      .select(col(strataCol), posexplode(col("__top")))
      .select(col(strataCol), col("col.id").as(idCol),
        col("col.score").as(scoreCol),
        (col("pos") + 1).cast("long").as("rank"))

  /** Deterministic hash split assignment: each row gets the first split
    * whose cumulative per-ten-thousand weight exceeds
    * md5Long(salt + "#" + key) mod 10000. Pure function of (salt, key):
    * stable across runs, engines, partitionings — and train/eval
    * membership provably can't drift between pipeline stages. Narrow
    * map-side projection, zero shuffle.
    *
    * @param splits ordered (name, weightE4); weights must sum to 10000
    */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Long)], salt: String = "split"): DataFrame = {
    require(splits.map(_._2).sum == 10000L,
      s"split weights must sum to 10000, got ${splits.map(_._2).sum}")
    val h = TextDedup.md5Long(
      concat(lit(salt + "#"), col(keyCol).cast("string"))) % 10000L
    val cum = splits.scanLeft(0L)(_ + _._2).tail
    val expr = splits.zip(cum).init.reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(h < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Mixture report: token and document share per (domain, stratum) —
    * the observability step behind data-mixture decisions (and the input
    * to reweighted sampling). One map-side-combined aggregate over the
    * corpus (shuffle = |domains × strata| rows), then the grand total is
    * broadcast back — never a global single-partition window.
    *
    * @return (domainCol, strataCol, n_docs, n_tokens, share_e6)
    */
  def domainMixture(df: DataFrame, domainCol: String, strataCol: String,
      tokenLen: Column): DataFrame = {
    val agg = df.groupBy(col(domainCol), col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenLen.cast("long")).as("n_tokens"))
    val total = agg.agg(sum(col("n_tokens")).as("__total"))
    agg.crossJoin(broadcast(total))
      .select(col(domainCol), col(strataCol), col("n_docs"), col("n_tokens"),
        floor(col("n_tokens") * lit(1000000.0) / col("__total"))
          .cast("long").as("share_e6"))
  }
}
