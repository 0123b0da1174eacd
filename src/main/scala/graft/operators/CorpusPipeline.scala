package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-hygiene pipeline a training-data user actually
  * runs, composed from the library's stages in the canonical order:
  *
  *   1. quality gate      — linear quality score ≥ threshold
  *      ([[TextAnalysis.qualityFeatures]]; drops boilerplate/garbage)
  *   2. repetition gate   — duplicate-trigram ratio ≤ threshold
  *      ([[TextAnalysis.repetitionFeatures]]; drops templated/looping text)
  *   3. near-dup dedup    — length-banded Jaccard pairs → connected
  *      components → keep the min-id representative per cluster
  *      ([[TextDedup.lengthBandedJaccardPairs]] + [[TextDedup.minLabelClusters]])
  *   4. decontamination   — drop docs sharing ≥ `minContamHits` k-gram
  *      shingles with the evaluation corpus ([[TextDedup.decontaminate]])
  *
  * Stage order is semantic, not incidental: quality/repetition run first
  * so the surviving cluster representative is always a quality doc (and
  * the quadratic-ish dedup tier sees the smallest corpus); decontamination
  * runs last because a dropped near-dup must not shield its surviving
  * twin from the contamination check (the representative is re-checked).
  *
  * Scale shape: stages 1-2 are zero-shuffle columnar expressions; stage 3
  * is the stop-listed inverted-index pair join (bounded posting lists)
  * plus min-label propagation; stage 4 is a broadcast semi-join against
  * the (small) eval shingle set. Nothing in the composition adds a
  * shuffle beyond what the stages themselves own.
  *
  * Returns the surviving rows of `train` with `quality_e4` attached.
  */
object CorpusPipeline {

  def clean(
      train: DataFrame, evalDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      lenCol: String = "n_chars",
      minQualityE4: Long = 4000, maxRep3E4: Long = 500,
      minJaccardE4: Long = 5000, minContamHits: Long = 2,
      cacheGated: Boolean = true
  ): DataFrame = {
    val q = TextAnalysis.qualityFeatures(train, textCol)
      .filter(col("quality_e4") >= minQualityE4)
      .select(train.columns.map(col).toIndexedSeq :+ col("quality_e4"): _*)
    // The gated frame feeds FIVE downstream scans (stop-list count,
    // postings, dedup join left side, decontamination shingles, final
    // anti-join left side) — without a cache each re-runs the quality +
    // repetition expression gates over the full corpus. minLabelClusters
    // forces an action on the pair pipeline, so the cache is warm before
    // the remaining branches execute. Persisted for the plan's lifetime
    // (same contract as minLabelClusters' returned labels) with no
    // unpersist handle through this API: one-shot pipeline runs let
    // session teardown collect it; LONG-LIVED callers pass
    // cacheGated = false (paying re-derivation per branch) or
    // materialize the gated frame to a table and clean from there.
    val qr0 = TextAnalysis.repetitionFeatures(q, textCol, ks = Seq(3))
      .filter(col("rep3_e4") <= maxRep3E4)
      .drop("rep3_e4")
    // Fan the gated frame out ONCE, before the persist, so the cache
    // itself holds core-count partitions: each of the five downstream
    // consumers then starts parallel directly from the cache, where
    // previously every consumer's own `ensureParallel` added its own
    // round-robin exchange over the cached rows (the pair pipeline's
    // duplicated base subtree paid it twice more). Round-17 A/B at
    // sf0.1/32c: one exchange materialized into the cache vs 3-4
    // re-exchanges per run. At production scale (input above one split)
    // the branch never fires, as in TextDedup.ensureParallel.
    val qr = if (cacheGated) TextDedup.ensureParallel(qr0).persist() else qr0
    val pairs = TextDedup.lengthBandedJaccardPairs(
      qr, idCol, textCol, lenCol, minJaccardE4 = minJaccardE4)
    val labels = TextDedup.minLabelClusters(pairs, pairsDistinct = true)
    // keep docs with no cluster label (never in a qualifying pair) or
    // that ARE their cluster's min-id representative
    val deduped = qr.join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .filter(col("label").isNull || col("label") === col(idCol))
      .drop("label")
    val contaminated = TextDedup.decontaminate(deduped, evalDocs, idCol, textCol)
      .filter(col("n_hits") >= minContamHits)
      .select(col(idCol))
    deduped.join(contaminated, Seq(idCol), "left_anti")
  }
}
