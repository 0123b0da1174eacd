package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sequence packing — the batching step of an LLM training pipeline:
  * concatenate documents into fixed-token-budget training sequences
  * ("bins") so attention windows are densely filled instead of padded.
  *
  * Algorithm: deterministic sharded greedy next-fit. Each document is
  * assigned to a shard by a salted md5 hash of its id (portable — the
  * SQL oracle recomputes it bit-identically); within a shard, documents
  * are taken in ascending id order and appended to the current bin until
  * the next one would overflow `budgetTokens`, which starts a new bin. A
  * document longer than the whole budget occupies a bin alone (real
  * pipelines truncate it downstream; packing must still place it
  * deterministically).
  *
  * Scale shape (100 TB): one hash-partition exchange on `shard` plus a
  * per-partition external sort — `repartition(nShards)` then
  * `sortWithinPartitions`, the same machinery a shuffle join uses, so
  * nothing ever collects. The greedy scan is a single forward pass per
  * partition (mapPartitions, constant state: one running fill per open
  * bin). Shard count is the parallelism knob: shards ≈ cluster cores,
  * each shard's packing is an independent sequential stream. Next-fit
  * (not first-fit-decreasing) is deliberate: it needs no per-bin index,
  * wastes at most one document's slack per bin boundary, and keeps the
  * result a pure function of (salt, ids, lengths) — reproducible across
  * runs, partitionings, and engines.
  *
  * Output: one row per document — (id, shard, bin, bin_offset, length);
  * (shard, bin) is the training-sequence key, bin_offset the token
  * position where the document starts inside it.
  */
object Packing {

  /** Pack `df`'s rows into (shard, bin) sequences of at most
    * `budgetTokens` tokens. `idCol` must be a unique integral id,
    * `lenCol` an integral token length.
    */
  def packGreedy(df: DataFrame, idCol: String, lenCol: String,
      budgetTokens: Long, nShards: Int, salt: String = "pack"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sharded = df.select(
      (TextDedup.md5Long(concat(lit(salt + "#"), col(idCol).cast("string")))
        % nShards).as("shard"),
      col(idCol).cast("long").as("id"),
      col(lenCol).cast("long").as("len"))
      .as[(Long, Long, Long)]
    sharded
      // all rows of a shard land in one partition; the per-partition sort
      // is external (spills), so a giant shard degrades, never OOMs
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .mapPartitions { it =>
        var shard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (s, id, len) =>
          if (s != shard) { shard = s; bin = 0L; fill = 0L }
          else if (fill + len > budgetTokens && fill > 0) { bin += 1; fill = 0L }
          val off = fill
          fill += len
          (id, s, bin, off, len)
        }
      }
      .toDF(idCol, "shard", "bin", "bin_offset", lenCol)
  }
}
