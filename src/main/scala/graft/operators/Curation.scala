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

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much its hashed-token distribution looks like a
    * TARGET subset relative to the raw corpus. The published method
    * weights w(x) = Π p_target(b)/p_raw(b) over hashed n-gram buckets
    * (computed as a sum of logs); this implementation keeps the
    * log-free SUM-of-ratios form on an exact integer grid — smoothed
    * bucket probabilities on an e9 grid, per-occurrence ratio on an e4
    * grid, truncating division throughout — so the score is
    * bit-identical in any engine at any partitioning (the same trade
    * every oracled operator here makes; ranking quality is equivalent,
    * only the scale of the score changes).
    *
    *   p_t(b) = (t_b + 1)·10⁹ div (T + nBuckets)      (add-1 smoothing)
    *   p_r(b) = (r_b + 1)·10⁹ div (R + nBuckets)
    *   ratio_e4(b) = p_t(b)·10⁴ div max(p_r(b), 1)
    *   dsir_sum_e4(doc) = Σ_tokens ratio_e4(bucket(token))
    *
    * Scale shape — exactly two corpus passes, which is DSIR's floor:
    * pass 1 is one explode + one map-side-combined groupBy into
    * `nBuckets` rows (the ONLY shuffle keyed by bucket; both raw and
    * target counts come out of the same aggregate via a conditional
    * sum). The bucket-ratio table is O(nBuckets) — broadcast — so pass
    * 2 is a map-side join + per-doc sum, shuffling one row per
    * document. Nothing in the plan grows with corpus size except the
    * two scans.
    *
    * @param targetPred row predicate defining the target distribution
    *        (e.g. `col("lang") === "en"`); target rows also count
    *        toward raw
    * @param hash token hasher — md5Long default for oracle parity;
    *        production swaps `xxhash64` (same API, 5-10× faster)
    * @return (idCol, n_tokens, dsir_sum_e4, dsir_avg_e4). NOTE: the
    *         ≤ nBuckets-row bucket-count frame stays persisted (it
    *         seeds both the totals and the ratio table; without it
    *         pass 1 would run twice) — long-lived callers unpersist
    *         via `spark.catalog.clearCache()` or accept the KB-scale
    *         residue, the [[TextDedup.minLabelClusters]] trade.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int = 4096,
      hash: Column => Column = TextDedup.md5Long): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val toks = docs.select(col(idCol).as("__id"), targetPred.as("__tgt"),
        explode(TextAnalysis.tokens(coalesce(col(textCol), lit("")))).as("__tok"))
      .withColumn("__b", pmod(hash(col("__tok")), lit(nBuckets.toLong)))
    // pass 1: raw + target counts from ONE aggregate (≤ nBuckets rows out)
    val counts = toks.groupBy(col("__b"))
      .agg(count(lit(1)).as("__r"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__t"))
      .persist()
    // distinct names from the per-bucket columns: SQL identifier
    // resolution is case-insensitive, so __R/__r would be ambiguous
    val totals = counts.agg(sum(col("__r")).as("__rtot"),
      sum(col("__t")).as("__ttot"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("__b"),
        expr(s"(((__t + 1L) * 1000000000L) div (__ttot + ${nBuckets}L)) * 10000L " +
          s"div greatest((((__r + 1L) * 1000000000L) div (__rtot + ${nBuckets}L)), 1L)")
          .as("__ratio_e4"))
    // pass 2: broadcast the O(nBuckets) ratio table back onto the stream
    val out = toks.join(broadcast(ratios), "__b")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__ratio_e4")).as("dsir_sum_e4"))
      .select(col("__id").as(idCol), col("n_tokens"), col("dsir_sum_e4"),
        expr("dsir_sum_e4 div n_tokens").as("dsir_avg_e4"))
    out
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

  /** Deterministic global training-shuffle order: every row gets a
    * 0-based position `pos` equal to its rank under
    * (xxhash64(id) ASC, id ASC) — the reproducible replacement for
    * "shuffle the corpus before packing" (same corpus + same seed ⇒
    * same epoch order on any cluster, any partitioning; a new epoch =
    * a new id derivation, e.g. concat(id, ':', epoch) upstream).
    *
    * Scale shape: a single `row_number() OVER (ORDER BY h)` window is a
    * ONE-PARTITION global sort — the classic 100 TB trap. Instead the
    * hash's own uniformity provides a balanced pre-partition for free:
    * the top `bucketBits` bits of h are monotone in h, so global rank =
    * (exact count of rows in lower buckets) + (rank within my bucket).
    * That is one 2^bucketBits-row count aggregate (collected — bounded
    * by construction, NOT by data) plus a window partitioned 2^bucketBits
    * ways, each partition ~N/2^bucketBits rows. No sampling-based range
    * partitioner, so the order is a pure function of the data.
    *
    * @return input columns + `h` (the signed xxhash64) + `pos`.
    */
  /** Integer water-filling allocation: give every stratum (source,
    * domain, language) up to a common cap `c`, chosen so the total
    * `Σ min(n_i, c)` fits `budget` — the proportional-fair mixture
    * balancer ("cap the dominant sources at an equal share, let small
    * sources keep everything") that sits between quota curation and
    * temperature sampling: unlike a fixed per-stratum quota it spends
    * the whole budget, unlike temperature sampling it is exactly
    * budget-bounded.
    *
    * Exact integer construction (no floats, bit-identical in any
    * engine): sort strata ascending by (n, stratum); with prefix sums
    * P_i over the first i strata and k strata total, the cap row is the
    * FIRST i where filling everyone else to n_i overshoots
    * (P_{i-1} + (k-i+1)·n_i > budget), and
    * `cap = (budget − P_{i-1}) div (k−i+1)`; if no row overshoots the
    * budget covers everything and cap = max n. Allocation is
    * min(n, cap); the truncating division leaves ≤ k−1 budget units
    * unspent (documented, not redistributed — determinism over the last
    * crumbs).
    *
    * Scale shape: one count aggregate to strata grain, then ALL work is
    * on k rows — the unpartitioned window is over the stratum table,
    * never the corpus (the [[graft.operators.TextAnalysis
    * .percentileRankByValue]] bounded-domain precedent).
    *
    * @return (strataCol, n_items, cap, alloc) — one row per stratum.
    */
  def waterFillAllocation(df: DataFrame, strataCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_items"))
    val w = Window.orderBy(col("n_items"), col(strataCol))
    val ranked = counts
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__p", sum(col("n_items")).over(w))
      .withColumn("__k", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val capRow = ranked
      .filter(col("__p") - col("n_items") +
        (col("__k") - col("__i") + 1L) * col("n_items") > budget)
      .orderBy(col("__i"))
      .limit(1)
      .select(expr(s"($budget - (__p - n_items)) div (__k - __i + 1)")
        .as("cap"))
    val fullCap = counts.agg(max(col("n_items")).as("__capfull"))
    // both frames are ≤1 row; the overshoot cap wins when it exists,
    // else the budget covers everything and the cap is the max stratum
    val cap = fullCap
      .join(capRow.withColumnRenamed("cap", "__capped"), lit(true), "left")
      .select(coalesce(col("__capped"), col("__capfull")).as("cap"))
    counts.crossJoin(broadcast(cap))
      .select(col(strataCol), col("n_items"), col("cap"),
        least(col("n_items"), col("cap")).as("alloc"))
  }

  def globalShuffleOrder(df: DataFrame, idCol: String,
      bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 16, "bucketBits in [1,16]")
    val hashed = df.withColumn("h", xxhash64(col(idCol)))
      // arithmetic shift keeps signed order: bucket ids run
      // -(2^(b-1)) .. 2^(b-1)-1 monotonically in h
      .withColumn("__bkt", shiftright(col("h"), 64 - bucketBits))
    val counts = hashed.groupBy(col("__bkt")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, c)) => (b, acc + c)
    }
    val offsetMap = counts.map(_._1).zip(offsets.map(_._2)).toMap
    val offCol = counts.map(_._1).foldRight(lit(0L)) { (b, els) =>
      when(col("__bkt") === lit(b), lit(offsetMap(b))).otherwise(els)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__bkt"))
      .orderBy(col("h").asc, col(idCol).asc)
    hashed
      .withColumn("pos", row_number().over(w).cast("long") - 1L + offCol)
      .drop("__bkt")
  }
}
