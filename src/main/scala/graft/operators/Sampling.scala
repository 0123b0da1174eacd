package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducible subsetting step a
  * training-data pipeline needs (down-sample a dominant language/source,
  * carve out eval splits) where `df.sample()` would give a different
  * subset per run and per partitioning.
  *
  * A row is kept iff md5Long(salt + "#" + key) mod 10000 < rate_e4: the
  * decision is a pure function of (salt, key), so it is stable across
  * runs, engines (md5 family — a plain-SQL oracle reproduces it
  * bit-identically), cluster sizes, and row order; disjoint salts give
  * independent samples (train/eval splits that provably can't leak by
  * construction are `salt=split, rate+complement`). Execution is a
  * narrow map-side filter — no shuffle, applied during the scan.
  */
object Sampling {

  /** Keep rows where the salted key hash lands under `rateE4` (per-ten-
    * thousand). `rateE4` may be any Column, enabling per-row rates.
    */
  def hashSample(df: DataFrame, keyCol: String, rateE4: Column,
      salt: String = "samp"): DataFrame =
    df.filter(
      TextDedup.md5Long(concat(lit(salt + "#"), col(keyCol).cast("string")))
        % 10000L < rateE4)

  /** Stratified variant: per-stratum rates with a default for strata not
    * in the map (e.g. down-sample the dominant language).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      ratesE4: Map[String, Long], defaultRateE4: Long,
      salt: String = "samp"): DataFrame = {
    val rate = ratesE4.foldLeft(lit(defaultRateE4)) { case (acc, (s, r)) =>
      when(col(strataCol) === s, lit(r)).otherwise(acc)
    }
    hashSample(df, keyCol, rate, salt)
  }

  /** Temperature-flattened mixture resampling: down-sample each stratum
    * (language, source domain) toward the τ-tempered distribution
    * p_s ∝ n_s^τ — the standard knob for rebalancing a multi-source /
    * multilingual training mixture (τ=1 keeps natural proportions, τ→0
    * approaches uniform). This implements τ = 1/2: the keep rate for
    * stratum s is sqrt(min_s n_s / n_s), so the SMALLEST stratum keeps
    * everything and a stratum 100× larger keeps 10× the smallest's count
    * — rates are all ≤ 1 (pure down-sampling; no row duplication), and
    * expected kept counts are ∝ sqrt(n_s).
    *
    * sqrt is IEEE-754 correctly rounded in both the JVM and SQL engines,
    * so the floor-scaled rate — unlike a pow(n, τ) for general τ — is
    * bit-identical across engines and the sample is exactly reproducible
    * (general-τ support would precompute rates driver-side instead).
    *
    * Scale shape: stratum counts are one map-side-combined groupBy whose
    * output is |strata| rows (tiny — languages/domains, not documents);
    * rates broadcast back and the keep decision is the same narrow
    * map-side hash filter as [[hashSample]]. Two corpus scans total (one
    * counting, one filtering), no corpus shuffle anywhere.
    */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
      salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__min_n"))))
      .select(col(strataCol).as("__strata_r"),
        floor(sqrt(col("__min_n").cast("double") / col("__n")) * 10000)
          .cast("long").as("__rate_e4"))
    // null-SAFE equality: a null stratum is a real group (counted above),
    // so its rows must meet their own rate rather than vanish through a
    // null-rejecting equi-join; <=> still plans as a broadcast hash join.
    df.join(broadcast(rates), col(strataCol) <=> col("__strata_r"))
      .filter(
        TextDedup.md5Long(concat(lit(salt + "#"), col(keyCol).cast("string")))
          % 10000L < col("__rate_e4"))
      .drop("__strata_r", "__rate_e4")
  }

  /** General-τ temperature resampling toward p_s ∝ n_s^τ: keep rate
    * r_s = (min_s n_s / n_s)^(1−τ), so the smallest stratum keeps
    * everything, τ=1 keeps natural proportions (all rates 1), τ=0
    * approaches uniform, and τ=1/2 reproduces [[temperatureSample]]'s
    * sqrt rates.
    *
    * Rates are PRECOMPUTED DRIVER-SIDE: the per-stratum counts collapse
    * to |strata| rows (languages/domains — bounded by definition of a
    * mixture knob, enforced by `maxStrata`), so collecting them is one
    * tiny aggregate, and pow runs once per stratum on the driver. The
    * keep decision stays the same narrow map-side hash filter against
    * the resulting rate LITERALS — reproducibility is therefore a pure
    * function of (salt, keys, the rate literals): an oracle re-deriving
    * the rates needs a bit-identical pow, but one re-running with the
    * same literals (they are plain longs, loggable/persistable) matches
    * exactly on any engine. This is why sqrt-only [[temperatureSample]]
    * remains the fully-declarative path: sqrt is the one power IEEE-754
    * guarantees correctly rounded everywhere.
    *
    * Scale shape: one count aggregate (|strata| rows to the driver) +
    * one map-side filter scan — identical to [[stratifiedSample]]. Null
    * strata get the null-group rate via the null-safe join.
    */
  def temperatureSampleTau(df: DataFrame, keyCol: String, strataCol: String,
      tau: Double, salt: String = "temp", maxStrata: Int = 100000): DataFrame = {
    require(tau >= 0.0 && tau <= 1.0, "tau must be in [0, 1]")
    // counts are grouped on the SPARK-CAST string form of the stratum —
    // the same expression the join below matches on. Collecting the raw
    // values and stringifying them JVM-side would silently diverge for
    // any type whose JVM toString differs from Spark's cast-to-string
    // (java.sql.Timestamp appends ".0", arrays/structs differ wholesale),
    // and every row of such a stratum would vanish through the join.
    val counts = df.select(col(strataCol).cast("string").as("__s"))
      .groupBy(col("__s")).agg(count(lit(1)).as("__n"))
      .limit(maxStrata + 1).collect()
    require(counts.length <= maxStrata,
      s"more than $maxStrata strata — not a mixture-rebalance column")
    if (counts.isEmpty) return df
    val ns = counts.map(r => Option(r.getString(0)) -> r.getLong(1))
    val minN = ns.map(_._2).min
    val ratesE4: Seq[(Option[String], Long)] = ns.toSeq.map { case (s, n) =>
      s -> math.floor(math.pow(minN.toDouble / n, 1.0 - tau) * 10000).toLong
    }
    // the rate literals ride a broadcast-joined literal table (a when-
    // chain over thousands of strata would blow up the expression tree);
    // matching on the STRING form of the stratum keeps the join key
    // type-stable for any strata column type, null stratum included
    val spark = df.sparkSession
    import spark.implicits._
    val rates = broadcast(ratesE4.toDF("__strata_r", "__rate_e4")
      .select(col("__strata_r"), col("__rate_e4")))
    df.join(rates, col(strataCol).cast("string") <=> col("__strata_r"))
      .filter(
        TextDedup.md5Long(concat(lit(salt + "#"), col(keyCol).cast("string")))
          % 10000L < col("__rate_e4"))
      .drop("__strata_r", "__rate_e4")
  }

  /** EXACTLY-n PER-STRATUM sample: within each stratum, the n rows with
    * the smallest salted key hashes (ties by key) — balanced eval
    * carve-outs / per-language inspection panels, where the rate-based
    * stratified sampler only hits sizes in expectation and the global
    * [[uniformSampleN]] ignores strata.
    *
    * Requires an integral key column (the [[graft.functions.TopKByScore]]
    * buffer is (long, long)). Scale shape: the map-side-combining
    * aggregate keeps a bounded n-element heap per stratum per map
    * partition, so only n·partitions rows per stratum cross the shuffle
    * — no stratum ever sorts in one task (the row_number formulation
    * would sort every stratum's rows; see quotaTopK).
    */
  def stratifiedSampleN(df: DataFrame, keyCol: String, strataCol: String,
      n: Int, salt: String = "samp"): DataFrame = {
    val h = TextDedup.md5Long(concat(lit(salt + "#"), col(keyCol).cast("string")))
    df.select(col(strataCol), col(keyCol))
      .withColumn("__negh", -h)
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct(col("__negh"), col(keyCol)), n).as("tk"))
      .select(col(strataCol), explode(col("tk")).as("e"))
      .select(col(strataCol), col("e.id").as(keyCol))
  }

  /** EXACTLY-n uniform sample: the n rows with the smallest salted key
    * hashes (ties broken by the key itself, so the order is total and
    * the result a pure function of (salt, keys) — rate-based
    * [[hashSample]] can only hit a target size in expectation).
    *
    * Scale shape: `orderBy(...).limit(n)` plans as TakeOrderedAndProject
    * — each partition keeps an n-element bounded heap and the driver
    * k-way-merges partition tops, so no global sort and no shuffle of
    * the corpus; this is the same "top-k without sorting the world"
    * discipline as TopKByScore/vocabTopK. Memory is O(n) per task —
    * meant for samples that fit one task comfortably (eval carve-outs,
    * inspection panels), not for down-sampling to billions of rows (use
    * [[hashSample]] with a rate for that).
    */
  def uniformSampleN(df: DataFrame, keyCol: String, n: Int,
      salt: String = "samp"): DataFrame =
    df.orderBy(
      TextDedup.md5Long(concat(lit(salt + "#"), col(keyCol).cast("string"))),
      col(keyCol))
      .limit(n)

  /** Weight-proportional sampling WITHOUT replacement, k per stratum —
    * the quality-weighted subsetting step (sample high-scoring documents
    * more often, but never twice) that rate-based sampling can't
    * express. Exponential-clocks construction (Efraimidis/Spirakis):
    * each row draws `t = −ln(u)/w` from its deterministic hash-uniform
    * `u ∈ (0,1]`, and the k SMALLEST clocks per stratum win — exactly
    * weighted sampling without replacement, as a pure function of
    * (salt, ids, weights).
    *
    * Determinism: `u` is an exact integer in [1, 1e6] from the md5
    * family; ln is bit-stable across the JVM and SQL engines (the
    * [[graft.operators.Retrieval]] BM25 precedent); the clock is one
    * multiply-divide chain floor-quantized to e9 with ties broken by
    * id. Rows with non-positive weight never qualify.
    *
    * Scale shape: the clock is a narrow map-side expression on the scan;
    * per-stratum selection ships through the bounded
    * [[graft.functions.TopKByScore]] heap (k rows per stratum per map
    * partition) — one corpus scan, no corpus-scale sort or window.
    */
  def weightedSampleN(df: DataFrame, idCol: String, strataCol: String,
      weightCol: Column, k: Int, salt: String = "wsamp"): DataFrame = {
    require(k >= 1)
    val uE6 = TextDedup.md5Long(
      concat(lit(salt + "#"), col(idCol).cast("string"))) % 1000000L + 1L
    val keyed = df.filter(weightCol > 0)
      .select(col(strataCol).as("stratum"), col(idCol).cast("long").as("id"),
        floor(lit(1e9) * -log(uE6.cast("double") / lit(1000000.0)) /
          weightCol.cast("double")).cast("long").as("key_e9"))
    keyed.groupBy(col("stratum"))
      .agg(graft.functions.TopKByScore.topKByScore(
        struct((-col("key_e9")).as("s"), col("id")), k).as("tk"))
      .select(col("stratum"), posexplode(col("tk")))
      .select(col("stratum"), col("col.id").as("doc_id"),
        (-col("col.score")).as("key_e9"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
