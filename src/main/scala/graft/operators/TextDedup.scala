package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-similarity deduplication over text corpora — the scale
  * generalization of the reference's exact-key dedup (SURVEY.md §7.5).
  *
  * Four tiers, in increasing recall/cost:
  *   1. exact       — hash-groupBy on a content fingerprint; one shuffle.
  *   2. ngramJaccard — blocked all-pairs 3-gram-shingle Jaccard; quadratic
  *      within a block, so blocks must be bounded (lang × length bucket).
  *   3. minhashLsh  — shingle → minhash signature → banded LSH buckets →
  *      candidate pairs → exact-Jaccard verification. Near-linear: the
  *      only all-pairs work happens inside an LSH bucket.
  *   4. simhash     — 64-bit simhash + banded hamming search.
  *
  * At 100 TB: tiers 3/4 are the real path — signatures are built in one
  * explode+groupBy (shuffle ~ corpus tokens), buckets are tiny, and the
  * verify join touches only candidate pairs. Tier 2 exists as the oracle-
  * checkable ground truth at test scale.
  */
object TextDedup {

  // ---------- shingles ----------

  /** Distinct k-token shingles of a text column (default 3-gram). */
  def shingles(text: org.apache.spark.sql.Column, k: Int = 3): org.apache.spark.sql.Column = {
    val w = split(text, "\\s+")
    val shingled = transform(sequence(lit(0), size(w) - k),
      i => concat_ws(" ", slice(w, i + 1, lit(k))))
    when(size(w) >= k, array_distinct(shingled)).otherwise(array_distinct(w))
  }

  // ---------- tier 1: exact ----------

  /** Exact dedup: keep the lowest-id document per identical (normalized)
    * content. One hash shuffle on the fingerprint.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp)
    docs.withColumn("__keep", min(col(idCol)).over(w) === col(idCol))
      .filter(col("__keep")).drop("__keep")
  }

  // ---------- tier 2: blocked n-gram Jaccard ----------

  /** All-pairs 3-gram Jaccard within blocks. Returns candidate duplicate
    * pairs (id_a < id_b) with floor-scaled jaccard.
    *
    * @param blockCols columns bounding the quadratic blow-up; pairs are only
    *        formed within identical block values.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      minJaccardE4: Long
  ): DataFrame = {
    val base = docs.select(
      (col(idCol) +: blockCols.map(col)) :+ shingles(col(textCol)).as("sh"): _*)
    val a = base.toDF(base.columns.map(c => s"a_$c").toIndexedSeq: _*)
    val b = base.toDF(base.columns.map(c => s"b_$c").toIndexedSeq: _*)
    val blockCond = blockCols.map(c => a(s"a_$c") === b(s"b_$c")).reduce(_ && _)
    val inter = size(array_intersect(a("a_sh"), b("b_sh")))
    val uni = size(array_union(a("a_sh"), b("b_sh")))
    a.join(b, blockCond && a(s"a_$idCol") < b(s"b_$idCol"))
      .select(
        a(s"a_$idCol").as("id_a"),
        b(s"b_$idCol").as("id_b"),
        floor(inter * lit(10000.0) / uni).cast("long").as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)
  }

  /** Length-banded all-pairs Jaccard: blocks on overlapping length buckets
    * (each doc lands in floor(len/bw) and floor(len/bw)+1), so near-dups
    * straddling a bucket edge are still compared; the
    * `bucket = greatest(bucket_a, bucket_b)` condition counts each pair
    * exactly once without a distinct. Equi-join on the bucket => plain
    * shuffle hash join; the |Δlen| residual prunes pairs before the
    * (expensive) shingle intersection is computed.
    *
    * Near-dup texts rarely preserve metadata but always preserve
    * approximate length — this blocking found 25/25 planted near-dups in
    * the test corpus where (lang, source) blocking found 1/25.
    */
  def lengthBandedJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, lenCol: String,
      bucketWidth: Int = 32, maxDelta: Int = 32, minJaccardE4: Long = 5000
  ): DataFrame = {
    val base = docs.select(col(idCol), col(lenCol),
      shingles(col(textCol)).as("sh"),
      floor(col(lenCol) / lit(bucketWidth.toDouble)).cast("long").as("b0"))
    val blocked = base.withColumn("bucket",
      explode(array(col("b0"), col("b0") + 1)))
    val a = blocked.select(col(idCol).as("id_a"), col(lenCol).as("len_a"),
      col("sh").as("sh_a"), col("b0").as("b0_a"), col("bucket"))
    val b = blocked.select(col(idCol).as("id_b"), col(lenCol).as("len_b"),
      col("sh").as("sh_b"), col("b0").as("b0_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDelta &&
        col("bucket") === greatest(col("b0_a"), col("b0_b")))
      .select(col("id_a"), col("id_b"),
        floor(size(array_intersect(col("sh_a"), col("sh_b"))) * lit(10000.0) /
          size(array_union(col("sh_a"), col("sh_b")))).cast("long").as("jaccard_e4"))
      .filter(col("jaccard_e4") >= minJaccardE4)
  }

  // ---------- tier 3: MinHash + LSH ----------

  /** MinHash signatures: one row per doc with `numHashes` min-hash values.
    * Built by exploding shingles once and taking `numHashes` seeded
    * xxhash64 minima in a single groupBy — shuffle volume is the shingle
    * stream, map-side combined.
    */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String, numHashes: Int = 32
  ): DataFrame = {
    val exploded = docs.select(col(idCol), explode(shingles(col(textCol))).as("sh"))
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs from banded signatures: docs sharing any band
    * bucket. bands must divide numHashes.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int = 8): DataFrame = {
    val numHashes = bands * (sigs.select(size(col("sig"))).first().getInt(0) / bands)
    val rowsPerBand = numHashes / bands
    val banded = sigs.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
    ).select(col(idCol), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    * exact-Jaccard verification against the shingle sets.
    */
  def minhashDedupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, minJaccardE4: Long = 8000
  ): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, numHashes)
    val cands = lshCandidates(sigs, idCol, bands)
    val sh = docs.select(col(idCol), shingles(col(textCol)).as("sh"))
    val verified = cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard_e4",
        floor(size(array_intersect(col("sh_a"), col("sh_b"))) * lit(10000.0) /
          size(array_union(col("sh_a"), col("sh_b")))).cast("long"))
    verified.filter(col("jaccard_e4") >= minJaccardE4)
      .select("id_a", "id_b", "jaccard_e4")
  }

  // ---------- tier 4: SimHash ----------

  /** 64-bit SimHash per document over 3-gram shingles (raw tokens are far
    * too coarse when the vocabulary is small — distinct-token sets collide
    * across unrelated docs): per-shingle xxhash64, each bit votes ±1,
    * fingerprint bit set where the vote is positive. One explode+groupBy.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(shingles(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
        ).reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance: candidates share at least
    * one of 4 exact-matching 16-bit bands, verified with bit_count(xor).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col(idCol), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("band"), col("bucket"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
