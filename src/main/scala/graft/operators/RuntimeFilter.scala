package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.AggBridge

/** Explicit runtime bloom-filter semi join.
  *
  * The reference's post-processing joins always reduce a very large
  * measurement/fact table by a much smaller — but NOT broadcast-small —
  * qualifying key set (cloud/bq/ops.go:234-253 joins a day partition
  * against the annotation window; the dedup/copy queries filter by the
  * job's key set). At 100 TB the fact side dominates every cost: a plain
  * shuffle semi join exchanges EVERY fact row on the join key before a
  * single one is eliminated, and a broadcast join is off the table once
  * the dim side exceeds a few hundred MB.
  *
  * The standard fix (Spark's own runtime row-level filtering, and the
  * semi-join reduction in classic distributed query processing) is a
  * two-phase plan this operator makes explicit and deterministic:
  *
  *   1. aggregate the dim keys into a fixed-size bloom filter
  *      (`BloomFilterAggregate` — partial aggregation means each map task
  *      contributes a local bloom and only `numBits`-sized sketches cross
  *      to the driver, never the keys);
  *   2. pre-filter the fact scan with the codegen'd
  *      `might_contain(bloom, xxhash64(key))` predicate — false positives
  *      possible, false negatives impossible;
  *   3. run the EXACT shuffle semi join on the survivors, which removes
  *      the false positives.
  *
  * Result rows are therefore bit-identical to the plain semi join while
  * the fact-side exchange shrinks by the dim selectivity (a 1% key set
  * shuffles ~1% of the fact table plus the bloom's false-positive mass,
  * ~`exp(-bits/items · ln2²)` of the rest). Spark CAN inject this itself
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) but only behind
  * size/selectivity heuristics that a 100 TB plan should not gamble on;
  * building the bloom explicitly pins the plan shape, and the bloom's
  * construction is deterministic (XxHash64 seed 42, fixed bit count), so
  * the pre-filtered row set — not just the final result — is reproducible
  * across runs and engines.
  *
  * Driver memory contract: the only driver-side state is the serialized
  * bloom (`numBits/8` bytes, default 1 MiB) — bounded and independent of
  * both table sizes, the same contract as the per-file manifest blooms
  * ([[graft.tableops.FileBloom]]).
  */
object RuntimeFilter {

  /** Exact `fact SEMI JOIN dim ON fact(factKey) = dim(dimKey)` with the
    * fact side pre-reduced by a bloom of the dim keys.
    *
    * @param expectedItems bloom sizing: expected distinct dim keys
    * @param numBits       bloom sizing: total bits (default 2²³ = 1 MiB)
    * @return fact rows (all fact columns) having a dim match
    */
  def bloomSemiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1L << 20, numBits: Long = 1L << 23
  ): DataFrame = {
    val bloomBytes = dim
      .select(AggBridge.bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))
      .head.getAs[Array[Byte]](0)
    // Empty dim → BloomFilterAggregate yields NULL: skip the pre-filter
    // (the exact semi join below returns the correct empty result).
    val pre =
      if (bloomBytes == null) fact
      else fact.filter(AggBridge.bloomMightContain(bloomBytes, col(factKey)))
    // alias the dim key to a reserved name: with a shared key name (or a
    // fact column named dimKey) bare col(factKey) === col(dimKey) is
    // ambiguous and fails analysis despite valid inputs
    pre.join(dim.select(col(dimKey).as("__graft_dim_key")),
      pre(factKey) === col("__graft_dim_key"), "left_semi")
  }
}
