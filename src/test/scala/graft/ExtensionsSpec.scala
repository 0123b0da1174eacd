package graft

import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Multimodal, Similarity, TextAnalysis, TextDedup}

/** Scale-extension operators: dedup family, similarity search, text
  * analysis, multimodal plumbing (SURVEY.md §7.5).
  */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", 43L),
    (2L, "the quick brown fox jumps over the lazy dog", 43L),     // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", 43L),     // near dup of 1
    (4L, "completely different content about spark engines here", 53L),
    (5L, "der schnelle braune fuchs und der faule hund ist da", 51L)
  ).toDF("doc_id", "text", "n_chars")

  test("exactDedup keeps lowest id per identical content") {
    val out = TextDedup.exactDedup(docs, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("length-banded jaccard finds near-dups, including across bucket edges") {
    // ids 1/2/3 all have n_chars ~43; bucketWidth 32 puts 43 in bucket 1,
    // and the overlap bucket 2. A doc at len 63 vs 65 would straddle: check
    // the pair (1,3) near-dup is found and scored high.
    val pairs = TextDedup.lengthBandedJaccardPairs(docs, "doc_id", "text",
      "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // exact dup => jaccard 10000
    assert(pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("bucket-edge pair is caught by the overlap bucket") {
    val edge = Seq(
      (10L, "a b c d e f g h i j k l m n o p", 31L),  // bucket 0 (+1)
      (11L, "a b c d e f g h i j k l m n o q", 33L)   // bucket 1 (+2)
    ).toDF("doc_id", "text", "n_chars")
    val pairs = TextDedup.lengthBandedJaccardPairs(edge, "doc_id", "text",
      "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)))
  }

  test("minhash signatures are identical for identical text, and LSH finds near-dups") {
    val sigs = TextDedup.minhashSignatures(docs, "doc_id", "text", numHashes = 32)
    val s = sigs.select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(4L))
    val pairs = TextDedup.minhashDedupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, minJaccardE4 = 5000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash: identical text => distance 0; near dup close; unrelated far") {
    val sh = TextDedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) == 0)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("minLabelClusters: local union-find and distributed sweeps agree") {
    // two components {1,2,3,10} (chained, diameter 3) and {7,8}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 10L), (7L, 8L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 7L -> 7L, 8L -> 7L)
    val local = TextDedup.minLabelClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = TextDedup.minLabelClusters(pairs, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == expected)
    assert(dist == expected)
  }

  test("hash sampling is deterministic, monotone in rate, and salt-independent") {
    import graft.operators.Sampling
    val ids = (0L until 400L).toDF("doc_id")
    def keep(rateE4: Long, salt: String = "samp") =
      Sampling.hashSample(ids, "doc_id", lit(rateE4), salt)
        .as[Long].collect().toSet
    val s30 = keep(3000)
    // deterministic: same subset on re-evaluation
    assert(keep(3000) == s30)
    // monotone: raising the rate only adds rows
    assert(s30.subsetOf(keep(7000)))
    // roughly calibrated (uniform hash): 30% +- 7pp of 400
    assert(math.abs(s30.size - 120) < 28, s"got ${s30.size}")
    // a different salt draws an (almost surely) different subset
    assert(keep(3000, "other") != s30)
  }

  test("cosineTopK is exact on hand-checkable vectors") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 2)
      .select("rank", "nbr_id").as[(Int, Long)].collect().toMap
    assert(out(1) == 1L) // closest: (0.9, 0.1)
    assert(out(2) == 2L) // orthogonal beats opposite
  }

  test("embedding near-dup: exact pairs and LSH variant both find the " +
    "planted near-identical pair, neither invents orthogonal ones") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f)), // near-dup of 0
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(-1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      lit(true), minCosE6 = 900000L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact === Set((0L, 1L)))
    val lsh = Similarity.embedNearDupPairs(emb, "vec_id", "embedding",
      minCosE6 = 900000L, dim = 4, nBits = 16, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // near-identical vectors agree on every hyperplane sign => must collide
    assert(lsh === Set((0L, 1L)))
  }

  test("embedNearDupPairs: hot-bucket cap bounds pair explosion; plan " +
    "construction runs no Spark job") {
    // 8 identical vectors land in the SAME bucket of every band — the
    // worst-case hot bucket a near-dup-heavy corpus produces
    val hot = (0L until 8L).map(i => (i, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val uncapped = Similarity.embedNearDupPairs(hot, "vec_id", "embedding",
      minCosE6 = 900000L, dim = 4, maxBucketSize = 0)
    assert(uncapped.count() == 28) // 8 choose 2
    val capped = Similarity.embedNearDupPairs(hot, "vec_id", "embedding",
      minCosE6 = 900000L, dim = 4, maxBucketSize = 4)
    // every bucket holds all 8 ids > cap => dropped, zero pair rows
    assert(capped.count() == 0)

    // plan construction must not execute a job (dim is a parameter now,
    // not a first() discovery): count job starts around a pure plan build,
    // using a marker action to flush the listener bus
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    // the async bus may still deliver events from earlier actions: wait
    // until the counter is quiet before taking the baseline
    def quiesce(): Int = {
      var last = -1
      var cur = jobs
      while (cur != last) { last = cur; Thread.sleep(200); cur = jobs }
      cur
    }
    try {
      // calibrate: how many jobs does the marker action itself post?
      val base0 = quiesce()
      spark.range(1).count()
      val markerJobs = quiesce() - base0
      val before = jobs
      Similarity.embedNearDupPairs(hot, "vec_id", "embedding",
        minCosE6 = 900000L, dim = 4) // plan only, no action
      spark.range(1).count() // marker to flush the bus
      assert(quiesce() == before + markerJobs,
        "plan construction ran unexpected job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("jaccard stop-list drops hot boilerplate shingles and bounds pair rows") {
    // 12 docs share ONE boilerplate shingle ("common boiler plate") and are
    // otherwise disjoint: every pair's overlap is exactly the hot shingle.
    val boiler = (0L until 12L).map { i =>
      (i, s"common boiler plate u${i}a u${i}b u${i}c", 40L)
    }.toDF("doc_id", "text", "n_chars")
    def pairs(cap: Int) =
      TextDedup.lengthBandedJaccardPairs(boiler, "doc_id", "text", "n_chars",
        bucketWidth = 32, maxDelta = 32, minJaccardE4 = 1000,
        maxShingleDocFreq = cap)
    // unguarded: the hot shingle alone emits 12² joined rows => 66 pairs
    assert(pairs(0).count() == 66)
    // guarded (df 12 > cap 8): the posting list is stop-listed before the
    // join — zero pair rows, the f² blow-up never materializes
    assert(pairs(8).count() == 0)
    // a cap above the hottest doc-freq changes nothing (test-scale identity)
    assert(pairs(100).count() == 66)
  }

  test("containment stop-list drops hot shingles and bounds pair rows") {
    // same planted-hot-shingle shape as the jaccard guard test: the only
    // overlap of every pair is the boilerplate shingle, and containment
    // has NO length banding, so the guard is the only thing between a
    // hot shingle and df² pair rows
    val boiler = (0L until 12L).map { i =>
      (i, s"common boiler plate u${i}a u${i}b u${i}c", 40L)
    }.toDF("doc_id", "text", "n_chars")
    def pairs(cap: Int) = TextDedup.containmentPairs(boiler, "doc_id",
      "text", minContainE4 = 1000, maxShingleDocFreq = cap)
    assert(pairs(0).count() == 66)  // unguarded: 12 choose 2
    assert(pairs(8).count() == 0)   // df 12 > cap 8: stop-listed
    assert(pairs(100).count() == 66) // cap above hottest df: identity
  }

  test("ds stratified exact-N equals the per-stratum hash-rank definition") {
    val d = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val got = graft.operators.Sampling.stratifiedSampleN(d, "doc_id", "lang", n = 5)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
    // matches the window/rank formulation exactly
    val h = graft.operators.TextDedup.md5Long(
      concat(lit("samp#"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(h, col("doc_id"))
    val expected = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("lang", "doc_id")
      .as[(String, Long)].collect().toSet
    assert(got.toSet === expected)
  }

  test("jaccard stop-list: numerator AND denominator use the surviving sets") {
    // "common boiler plate" is hot (doc-freq 6 > cap 4); docs 0/1 share it
    // plus 3 genuine shingles out of 5 each. Filtered sets: |A'|=|B'|=4,
    // inter'=3 => floor(3/5 * 1e4) = 6000. A pre-filter denominator would
    // score 3/(5+5-3) = 4285 — BELOW the 5000 threshold, so the bias
    // would falsely drop the pair the guard is supposed to preserve.
    val corpus = (Seq(
      (0L, "common boiler plate x1 x2 x3 x4", 40L),
      (1L, "common boiler plate x1 x2 x3 x5", 40L)) ++
      (10L until 14L).map(i => (i, s"common boiler plate u${i}a u${i}b u${i}c", 40L))
    ).toDF("doc_id", "text", "n_chars")
    val got = TextDedup.lengthBandedJaccardPairs(corpus, "doc_id", "text",
      "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000,
      maxShingleDocFreq = 4)
      .select("id_a", "id_b", "jaccard_e4").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((0L, 1L, 6000L)))
  }

  test("guarded pair sets compose into one action (observe names unique)") {
    // Observed-metric names must be unique per plan; two stop-listed /
    // capped invocations unioned into ONE action used to fail analysis.
    val boiler = (0L until 6L).map { i =>
      (i, s"common boiler plate u${i}a u${i}b u${i}c", 40L)
    }.toDF("doc_id", "text", "n_chars")
    def jp() = TextDedup.lengthBandedJaccardPairs(boiler, "doc_id", "text",
      "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 1000,
      maxShingleDocFreq = 4)
    assert(jp().union(jp()).count() == 0)
    val hot = (0L until 8L).map(i => (i, Array(1f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    def ep() = Similarity.embedNearDupPairs(hot, "vec_id", "embedding",
      minCosE6 = 900000L, dim = 4, maxBucketSize = 4)
    assert(ep().union(ep()).count() == 0)
  }

  test("decontaminate counts distinct shared shingles against the eval set") {
    val train = Seq(
      (1L, "alpha beta gamma delta"), // shares 2 of the eval 3-grams
      (2L, "foo bar baz qux"),        // clean — must not appear
      (3L, "alpha beta gamma")        // shares exactly 1
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val got = TextDedup.decontaminate(train, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 3L -> 1L))
    // non-broadcast path computes the identical result
    val shuffled = TextDedup.decontaminate(train, bench, "doc_id", "text",
      broadcastEval = false).as[(Long, Long)].collect().toMap
    assert(shuffled === got)
  }

  test("round-6 operators tolerate empty and degenerate inputs") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noLang = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    val oneDoc = Seq((1L, "just one document here")).toDF("doc_id", "text")
    assert(TextAnalysis.tfidfTopK(noDocs, "doc_id", "text", 3).count() == 0)
    assert(TextAnalysis.tokenize(noDocs, "doc_id", "text", 5).count() == 0)
    assert(TextAnalysis.duplicateChunks(noDocs, "doc_id", "text", 6, 6).count() == 0)
    assert(graft.operators.Sampling.temperatureSample(noLang, "doc_id", "lang")
      .count() == 0)
    assert(graft.operators.Sampling.stratifiedSampleN(noLang, "doc_id", "lang", 5)
      .count() == 0)
    assert(TextAnalysis.percentileRankByValue(
      Seq.empty[(Long, Long)].toDF("doc_id", "score"), "score").count() == 0)
    // single doc: no pairs, all-zero percentile, full self-vocabulary
    assert(TextDedup.containmentPairs(oneDoc, "doc_id", "text").count() == 0)
    assert(TextDedup.incrementalNearDupFilter(oneDoc, noDocs, "doc_id", "text")
      .count() == 1)
    val pr = TextAnalysis.percentileRankByValue(
      Seq((1L, 7L), (2L, 7L)).toDF("doc_id", "score"), "score")
      .select("pct_e4").as[Long].collect()
    assert(pr.toSeq == Seq(0L, 0L)) // one distinct value => everyone at 0
    // a stratum smaller than n yields all its rows, no padding
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "lang")
    val sn = graft.operators.Sampling.stratifiedSampleN(tiny, "doc_id", "lang", 5)
      .select("lang").as[String].collect()
    assert(sn.count(_ == "x") == 2 && sn.count(_ == "y") == 1)
  }

  test("containmentPairs catches a short doc embedded in a long one " +
    "that Jaccard misses") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = s"$short one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    val d = Seq((1L, short, short.length.toLong), (2L, long, long.length.toLong),
      (3L, "totally unrelated words here made up", 37L))
      .toDF("doc_id", "text", "n_chars")
    val cp = TextDedup.containmentPairs(d, "doc_id", "text", minContainE4 = 9000)
      .select("id_a", "id_b", "contain_e4").as[(Long, Long, Long)].collect()
    // all of the short doc's shingles appear in the long one => 10000
    assert(cp.toSeq == Seq((1L, 2L, 10000L)))
    // jaccard on the same pair is far below its threshold (lengths differ
    // so the banded tier wouldn't even form the pair)
    val jp = TextDedup.lengthBandedJaccardPairs(d, "doc_id", "text", "n_chars",
      bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000)
    assert(jp.count() == 0)
    // the uncapped self-join path computes the identical pair set
    val cp2 = TextDedup.containmentPairs(d, "doc_id", "text",
      minContainE4 = 9000, maxShingleDocFreq = 0)
      .select("id_a", "id_b", "contain_e4").as[(Long, Long, Long)].collect()
    assert(cp2.toSeq == cp.toSeq)
  }

  test("incremental dedup drops exact and near dups vs the seen corpus, keeps the rest") {
    val seen = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines shuffle data across the cluster nodes")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
      (3L, "the quick brown fox jumps over the lazy cat"),  // near dup of 0
      (5L, "completely unrelated text about garden vegetables here"),
      (7L, "spark engines shuffle data across the cluster racks") // near dup of 2
    ).toDF("doc_id", "text")
    def run(bcast: Boolean) = TextDedup.incrementalNearDupFilter(
      fresh, seen, "doc_id", "text", broadcastNew = bcast)
      .select("doc_id").as[Long].collect().toSet
    assert(run(true) == Set(5L))
    // the shuffled-probe variant computes the identical survivor set
    assert(run(false) == Set(5L))
    // idempotence: surviving docs re-filtered against the same corpus survive
    val survivors = fresh.filter(col("doc_id") === 5L)
    assert(TextDedup.incrementalNearDupFilter(survivors, seen, "doc_id", "text")
      .count() == 1L)
    // an empty seen corpus keeps the whole batch
    assert(TextDedup.incrementalNearDupFilter(fresh, seen.limit(0), "doc_id", "text")
      .count() == 4L)
  }

  test("SignBands fused expression is bit-identical to the unfused " +
    "per-bit VectorDot formulation it replaced") {
    import graft.functions.SignBands
    val nBits = 24; val bands = 3; val dim = 16
    // deterministic pseudo-random vectors, including sign-boundary-ish
    // magnitudes (tiny components make the dot hover near 0, the case a
    // fold-order or sign-convention bug would flip)
    val vecs = (0 until 40).map { r =>
      (r.toLong, (0 until dim).map { j =>
        val h = (r * 2654435761L + j * 40503L) % 2003
        (h - 1001).toDouble / (if (r % 3 == 0) 1e6 else 1e3)
      }.toArray)
    }
    val df = vecs.toDF("id", "v")
    val fused = SignBands.signBands(col("v"), nBits, bands)
    // the OLD formulation, reconstructed: literal plane arrays, the
    // codegen'd VectorDot fold, per-bit when(...), little-endian packing
    def plane(i: Int) = array((0 until dim).map { j =>
      val h = java.lang.Long.rotateLeft((i.toLong * 0x9E3779B97F4A7C15L) ^
        (j.toLong * 0xC2B2AE3D27D4EB4FL), 31) * 0x165667B19E3779F9L
      lit((h >>> 11).toDouble / (1L << 52).toDouble - 1.0)
    }: _*)
    val bpb = nBits / bands
    val unfused = array((0 until bands).map { b =>
      (0 until bpb).map { i =>
        when(graft.operators.Similarity.dot(col("v"),
          plane(b * bpb + i)) >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i)
      }.reduce(_ + _)
    }: _*)
    val rows = df.select(col("id"), fused.as("f"), unfused.as("u"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    rows.foreach { case (id, f, u) => assert(f == u, s"vector $id") }
  }

  test("indexed incremental dedup is decision-identical to the inline " +
    "path, and the index never re-reads seen text") {
    val seen = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines shuffle data across the cluster nodes")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 0
      (3L, "the quick brown fox jumps over the lazy cat"),  // near dup of 0
      (5L, "completely unrelated text about garden vegetables here"),
      (7L, "spark engines shuffle data across the cluster racks") // near dup of 2
    ).toDF("doc_id", "text")
    val index = TextDedup.nearDupIndex(seen, "doc_id", "text")
    // the index is self-contained: fp, band buckets, shingle hashes
    assert(index.columns.toSet == Set("doc_id", "__fp", "__buckets", "__hl"))
    def inline() = TextDedup.incrementalNearDupFilter(
      fresh, seen, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    def indexed(bcast: Boolean) = TextDedup.incrementalNearDupFilterIndexed(
      fresh, index, "doc_id", "text", broadcastNew = bcast)
      .select("doc_id").as[Long].collect().toSet
    assert(indexed(true) == inline())
    assert(indexed(false) == inline())
    // a MATERIALIZED (persisted) index gives the same answers — this is
    // the warehouse path where the index is a table, not a plan
    val stage = "/root/repo/target/neardup_index_spec"
    index.write.mode("overwrite").parquet(stage)
    val stored = spark.read.parquet(stage)
    assert(TextDedup.incrementalNearDupFilterIndexed(
      fresh, stored, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == inline())
    // appending a batch's index rows extends the seen corpus: re-probing
    // the survivors against (seen + survivors) drops nothing new
    val survivors = fresh.filter(col("doc_id") === 5L)
    val extended = stored.unionByName(
      TextDedup.nearDupIndex(survivors, "doc_id", "text"))
    assert(TextDedup.incrementalNearDupFilterIndexed(
      Seq((9L, "completely unrelated text about garden vegetables here"))
        .toDF("doc_id", "text"),
      extended, "doc_id", "text").count() == 0) // now a dup of indexed 5
  }

  test("change-feed signature index: increments through an append, a " +
    "rewrite, and a deletion-vector delete track the docs table — the " +
    "maintained index makes the same decisions as one built from the " +
    "final corpus, and replays are no-ops") {
    import spark.implicits._
    val D1 = java.sql.Date.valueOf("2024-01-01")
    val root = java.nio.file.Files.createTempDirectory("graft-sigfeed").toString
    val wh = new graft.tableops.TxWarehouse(root)
    val docsT = wh.tablePath("c", "docs")
    val idxT = wh.tablePath("i", "sig")
    def incr() = TextDedup.nearDupIndexIncremental(spark, wh, idxT,
      docsT, "doc_id", "text", "app")
    val seen0 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engines shuffle data between cluster racks"))
      .toDF("doc_id", "text").withColumn("date", lit(D1))
    wh.append(spark, seen0, docsT)
    assert(incr())
    assert(!incr(), "at head: no-op")
    // append a doc, rewrite doc 2's text entirely, vector-delete doc 0
    wh.append(spark, Seq((4L, "gardens grow vegetables in quiet rows"))
      .toDF("doc_id", "text").withColumn("date", lit(D1)), docsT)
    wh.mergeInto(spark,
      Seq((2L, "entirely different content now lives here"))
        .toDF("doc_id", "text").withColumn("date", lit(D1)),
      docsT, Seq("doc_id"))
    wh.deleteWhereMor(spark, docsT, col("doc_id") === 0L)
    assert(incr())
    // reference: index built from the FINAL corpus
    val ref = TextDedup.nearDupIndex(
      wh.read(spark, docsT).select("doc_id", "text"), "doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // dup of DELETED 0
      (3L, "spark engines shuffle data between cluster racks"), // dup of OLD 2
      (5L, "gardens grow vegetables in quiet rows"), // dup of appended 4
      (7L, "entirely different content now lives here") // dup of NEW 2
    ).toDF("doc_id", "text")
    def kept(ix: org.apache.spark.sql.DataFrame) =
      TextDedup.incrementalNearDupFilterIndexed(fresh, ix, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet
    val maintained = kept(wh.read(spark, idxT))
    assert(maintained == kept(ref), s"maintained=$maintained ref=${kept(ref)}")
    // the decisions prove each increment landed: 1 and 3 survive (their
    // twins are gone), 5 and 7 are dropped (their twins are current)
    assert(maintained == Set(1L, 3L))
  }

  test("duplicateChunks flags shared windows and leaves unique spans alone") {
    val boiler = "standard copyright header all rights reserved"  // 6 tokens
    val d = Seq(
      (1L, s"$boiler unique article text one two three"),
      (2L, s"$boiler different body entirely four five"),
      (3L, "no shared content in this document at all")
    ).toDF("doc_id", "text")
    // 6-token windows, stride 6: chunk 0 of docs 1 and 2 is the header
    val hits = TextAnalysis.duplicateChunks(d, "doc_id", "text",
      chunkTokens = 6, stride = 6)
      .select("doc_id", "chunk_idx", "n_docs").as[(Long, Long, Long)].collect()
    assert(hits.toSet == Set((1L, 0L, 2L), (2L, 0L, 2L)))
    // a window repeated WITHIN one doc does not count as cross-doc
    val selfRep = Seq((9L, s"$boiler $boiler")).toDF("doc_id", "text")
    assert(TextAnalysis.duplicateChunks(selfRep, "doc_id", "text",
      chunkTokens = 6, stride = 6).count() == 0)
  }

  test("keywordsRake: hand-computed degree/frequency scores; stopwords " +
    "and punctuation break phrases; identical phrases aggregate " +
    "corpus-wide") {
    val d = Seq(
      (1L, "The quick brown fox, and a quick fox."),
      (2L, "quick fox!")
    ).toDF("doc_id", "text")
    // phrases: d1 "quick brown fox" (len 3), "quick fox" (len 2);
    //          d2 "quick fox" (len 2).
    // freq/deg: quick 3/7, fox 3/7 -> (7e6 div 3) = 2_333_333;
    //           brown 1/3 -> 3_000_000.
    // scores: "quick brown fox" = 2_333_333 + 3_000_000 + 2_333_333;
    //         "quick fox" = 2 * 2_333_333, twice in the corpus.
    val out = TextAnalysis.keywordsRake(d, "doc_id", "text", k = 25)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("quick brown fox", 1L, 7666666L),
      ("quick fox", 2L, 4666666L)))
  }

  test("cdcDuplicateChunks: content-defined cuts re-synchronize after a " +
    "prefix shift, so a shared tail dedups where fixed strides desync; " +
    "identical docs share every chunk") {
    // non-periodic shared tail (numbered tokens: no window of it ever
    // equals another at a different offset)
    val tail = (1 to 60).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, "XX " + tail),    // prefixes differ in BOTH token count (1 vs
      (2L, "y y y " + tail)  // 3) and char length: fixed token strides
    ).toDF("doc_id", "text") // and fixed char strides both desynchronize
    val dup = TextAnalysis.cdcDuplicateChunks(d, "doc_id", "text")
    assert(dup.filter(col("n_docs") === 2L).count() >= 1,
      "the shared shifted tail produced no common chunk")
    // the fixed-stride counterpart misses ALL of it at these offsets
    assert(TextAnalysis.duplicateChunks(d, "doc_id", "text",
      chunkTokens = 8, stride = 8).count() == 0)
    // identical documents agree on every chunk
    val same = Seq((1L, tail), (2L, tail)).toDF("doc_id", "text")
    val allDup = TextAnalysis.cdcDuplicateChunks(same, "doc_id", "text",
      minLen = 1)
    assert(allDup.count() >= 1)
    assert(allDup.filter(col("n_docs") =!= 2L).count() == 0)
  }

  test("boilerplateStrip rewrites docs without their cross-document " +
    "windows, preserving order across the gap") {
    val d = Seq(
      (1L, "w x y z aa bb cc dd m n o p"), // boiler in the MIDDLE
      (2L, "aa bb cc dd q r s t"),
      (3L, "unique content here only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateStrip(d, "doc_id", "text",
      chunkTokens = 4, minDocs = 2)
      .select("doc_id", "n_chunks", "n_kept_chunks", "n_kept_tokens",
        "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(out == Set(
      (1L, 3L, 2L, 8L, "w x y z m n o p"),
      (2L, 2L, 1L, 4L, "q r s t"),
      (3L, 1L, 1L, 4L, "unique content here only")))
  }

  test("boilerplateStrip: an all-boilerplate doc survives with empty " +
    "clean_text; a window repeated WITHIN one doc is not boilerplate") {
    val d = Seq(
      (1L, "aa bb cc dd tail one two three"),
      (2L, "aa bb cc dd other body here now"),
      (4L, "aa bb cc dd") // nothing but the shared window
    ).toDF("doc_id", "text")
    val gone = TextAnalysis.boilerplateStrip(d, "doc_id", "text",
      chunkTokens = 4, minDocs = 2)
      .filter(col("doc_id") === 4L)
      .select("n_chunks", "n_kept_chunks", "n_kept_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(gone == Seq((1L, 0L, 0L, "")))
    // self-repetition alone (one distinct doc) keeps both windows
    val selfRep = Seq((9L, "aa bb cc dd aa bb cc dd")).toDF("doc_id", "text")
    val kept = TextAnalysis.boilerplateStrip(selfRep, "doc_id", "text",
      chunkTokens = 4, minDocs = 2)
      .select("n_kept_chunks", "clean_text")
      .as[(Long, String)].collect().toSeq
    assert(kept == Seq((2L, "aa bb cc dd aa bb cc dd")))
  }

  test("semanticDedup keeps the lowest id per in-cluster near pair, " +
    "and never drops across clusters") {
    val emb = Seq(
      (0L, Array(1f, 0f)),        // centroid A
      (1L, Array(0.99f, 0.01f)),  // near 0 => dropped
      (2L, Array(0.7f, 0.3f)),    // in A's cluster but below threshold
      (50L, Array(0f, 1f)),       // centroid B
      (51L, Array(0.01f, 0.99f))  // near 50 => dropped
    ).toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") % 50 === 0)
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", minCosE6 = 990000L)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 50L))
    // identical survivors through the shuffled anti-join variant
    val kept2 = Similarity.semanticDedup(emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", minCosE6 = 990000L, broadcastDrops = false)
      .select("vec_id").as[Long].collect().toSet
    assert(kept2 == kept)
  }

  test("knnGraph ranks in-cluster neighbors and never crosses clusters") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.95f, 0.05f)), (2L, Array(0.9f, 0.1f)),
      (50L, Array(0f, 1f)), (51L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") % 50 === 0)
    val g = Similarity.knnGraph(emb, "vec_id", "embedding",
      cents, "vec_id", "embedding", k = 2)
      .select("query_id", "nbr_id", "rank").as[(Long, Long, Int)].collect()
    val byQuery = g.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    // vector 1's nearest in-cluster neighbor is 0 (cos highest), then 2
    assert(byQuery(1L) == Seq(0L, 2L))
    // cluster B members only see each other
    assert(byQuery(50L) == Seq(51L) && byQuery(51L) == Seq(50L))
    // no edge crosses the cluster boundary
    assert(!g.exists(e => (e._1 < 50) != (e._2 < 50)))
  }

  test("temperatureSample keeps the smallest stratum whole and " +
    "downsamples larger strata toward sqrt proportions") {
    val rows = (1L to 400L).map(i => (i, if (i <= 100) "small" else "big"))
      .toDF("doc_id", "lang")
    val kept = graft.operators.Sampling.temperatureSample(rows, "doc_id", "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // rate(small) = sqrt(100/100) = 1.0 => all 100 kept
    assert(kept("small") == 100L)
    // rate(big) = sqrt(100/300) ≈ 0.577 => expect ~173 of 300; the hash
    // filter is deterministic, so assert a generous band around it
    assert(kept("big") > 120L && kept("big") < 230L)
  }

  test("temperatureSampleTau laws: tau=1 identity, tau=1/2 matches " +
    "temperatureSample, kept sets nest as tau falls") {
    import graft.operators.Sampling
    val rows = (1L to 400L).map(i => (i, if (i <= 100) "small" else "big"))
      .toDF("doc_id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet
    // tau = 1: natural proportions — every rate is 10000, nothing dropped
    assert(ids(Sampling.temperatureSampleTau(rows, "doc_id", "lang", tau = 1.0))
      == (1L to 400L).toSet)
    // tau = 1/2 reproduces the declarative sqrt path row-for-row
    assert(ids(Sampling.temperatureSampleTau(rows, "doc_id", "lang", tau = 0.5))
      == ids(Sampling.temperatureSample(rows, "doc_id", "lang")))
    // monotone nesting: the same row hash meets a smaller rate threshold
    // only if it met the larger one, so kept(tau') ⊆ kept(tau) for
    // tau' <= tau — the subset chain IS the monotone-rates law
    val taus = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val chain = taus.map(t =>
      ids(Sampling.temperatureSampleTau(rows, "doc_id", "lang", tau = t)))
    chain.sliding(2).foreach { case Seq(lo, hi) => assert(lo.subsetOf(hi)) }
    // tau = 0 flattens toward uniform: the big stratum keeps ~min rows
    val t0 = Sampling.temperatureSampleTau(rows, "doc_id", "lang", tau = 0.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(t0("small") == 100L && t0("big") > 60L && t0("big") < 140L)
  }

  test("temperatureSampleTau: non-string strata (timestamp) and null " +
    "strata sample instead of vanishing through the rate join") {
    import graft.operators.Sampling
    // java.sql.Timestamp.toString appends ".0" where Spark's cast-to-
    // string does not — rate keys built from driver-side toString would
    // match NO row of a timestamp stratum and silently drop them all
    val ts = (1L to 60L).map { i =>
      (i, java.sql.Timestamp.valueOf(s"2024-06-0${1 + (i % 3)} 00:00:00"))
    }.toDF("doc_id", "day")
    assert(Sampling.temperatureSampleTau(ts, "doc_id", "day", tau = 1.0)
      .count() == 60L)
    // a null stratum is a real group: it survives tau=1 whole too
    val withNull = (1L to 40L)
      .map(i => (i, if (i % 4 == 0) null else s"l${i % 3}"))
      .toDF("doc_id", "lang")
    val kept = Sampling.temperatureSampleTau(withNull, "doc_id", "lang", tau = 1.0)
    assert(kept.count() == 40L)
    assert(kept.filter(col("lang").isNull).count() == 10L)
  }

  test("retention cohorts and ordered funnel: hand-checkable semantics, " +
    "out-of-order steps excluded") {
    import graft.operators.EventAnalytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "view"),
      ("u1", ts("2024-01-09 10:00:00"), "click"),    // next week: offset 1
      ("u2", ts("2024-01-01 09:00:00"), "click"),    // click BEFORE view
      ("u2", ts("2024-01-02 09:00:00"), "view"),
      ("u2", ts("2024-01-03 09:00:00"), "purchase"), // no qualifying click
      ("u3", ts("2024-01-05 09:00:00"), "view"),
      ("u3", ts("2024-01-05 10:00:00"), "click"),
      ("u3", ts("2024-01-05 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val cohorts = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect().toSet
    // u1+u2 share cohort 01-01 (u1 active again in week 1); u3 is its own
    assert(cohorts == Set(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 2L),
      (java.sql.Date.valueOf("2024-01-01"), 1L, 1L),
      (java.sql.Date.valueOf("2024-01-05"), 0L, 1L)))

    val f = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    // 3 viewed; u2's click precedes its view, so only u1+u3 convert;
    // only u3 purchases after a qualifying click
    assert(f == Seq((0, "view", 3L), (1, "click", 2L), (2, "purchase", 1L)))

    // repeated steps: "view → view" needs a SECOND view strictly after
    // the first — u1 and u3 have one view each, u2 has exactly one too,
    // so only a user with 2+ views converts (none here); add one
    val ev2 = ev.union(Seq(("u3", ts("2024-01-05 09:30:00"), "view"))
      .toDF("user_id", "ts", "event_type"))
    val fr = EventAnalytics.funnel(ev2, "user_id", "ts", "event_type",
      Seq("view", "view"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(fr == Seq((0, "view", 3L), (1, "view", 1L)))

    // a NULL user can enter the funnel (step 0, SQL GROUP BY keeps the
    // null group) but never chains a per-user sequence (equi-join
    // semantics from step 1 on) — the oracle SQL's exact behavior
    val evNull = ev.union(Seq(
      (null.asInstanceOf[String], ts("2024-01-06 09:00:00"), "view"),
      (null.asInstanceOf[String], ts("2024-01-06 10:00:00"), "click"))
      .toDF("user_id", "ts", "event_type"))
    val fn = EventAnalytics.funnel(evNull, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(fn == Seq((0, "view", 4L), (1, "click", 2L), (2, "purchase", 1L)))
  }

  test("transition counts: consecutive steps per user, timestamp ties " +
    "broken by event id, singleton users contribute nothing") {
    import graft.operators.EventAnalytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00"), "view"),
      (2L, "u1", ts("2024-01-01 10:01:00"), "click"),
      (3L, "u1", ts("2024-01-01 10:02:00"), "view"),
      (4L, "u2", ts("2024-01-01 09:00:00"), "view"),
      (5L, "u2", ts("2024-01-01 09:05:00"), "click"),
      // u3: two events at the SAME timestamp — id order decides src→dst
      (7L, "u3", ts("2024-01-02 08:00:00"), "purchase"),
      (6L, "u3", ts("2024-01-02 08:00:00"), "click"),
      // u4: a single event — no transition
      (8L, "u4", ts("2024-01-03 08:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = EventAnalytics.transitionCounts(ev, "user_id", "ts",
      "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("view", "click", 2L, 2L),   // u1 and u2
      ("click", "view", 1L, 1L),   // u1
      ("click", "purchase", 1L, 1L) // u3 — id 6 before id 7 despite equal ts
    ))
  }

  test("noveltyScores: fully-shared docs score 0, partial overlap " +
    "scores the exact novel fraction") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "aa bb cc dd ee"),      // unique 3-grams → novelty 1
      (2L, "xx yy zz ww"),         // all shared with 3
      (3L, "xx yy zz ww"),
      (4L, "aa bb cc qq rr ss tt") // shares 'aa bb cc' with 1, rest unique
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: 3 shingles, 'aa bb cc' shared with doc 4 → 2/3 novel
    assert(out(1L) === (1L, 3L, 2L, math.floor(10000.0 * 2 / 3).toLong))
    assert(out(2L)._4 === 0L && out(3L)._4 === 0L)
    assert(out(4L)._2 === 5L && out(4L)._3 === 4L)
  }

  test("tokenEntropy: degenerate text scores 0, uniform text scores " +
    "ln(n_distinct); the whole statistic is shuffle-free") {
    import graft.operators.TextAnalysis
    val docs2 = Seq(
      (1L, "a a a a"),          // one distinct token → entropy 0
      (2L, "a b c d"),          // uniform over 4 → ln(4)
      (3L, "a a b"),            // 2/3·ln(3/2) + 1/3·ln(3)
      (4L, ""),                 // no tokens
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenEntropy(docs2, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === (1L, 4L, 1L, 0L))
    val ln4 = math.floor(1e6 * (1.0 / 4) * math.log(4.0)).toLong * 4
    assert(out(2L) === (2L, 4L, 4L, ln4))
    val e3 = math.floor(1e6 * (2.0 / 3) * math.log(3.0 / 2)).toLong +
      math.floor(1e6 * (1.0 / 3) * math.log(3.0)).toLong
    assert(out(3L) === (3L, 3L, 2L, e3))
    assert(out(4L) === (4L, 0L, 0L, 0L))
    assert(out(5L) === (5L, 0L, 0L, 0L))
    // map-only: no exchange anywhere in the plan
    val plan = TextAnalysis.tokenEntropy(docs2, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("embedIncrementalFilter: batch vectors near an archived one are " +
    "dropped, far ones survive, and only same-cluster pairs compare") {
    import graft.operators.Similarity
    val archive = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // cluster of centroid 1 (e1)
      (2L, Array(0.0f, 1.0f, 0.0f)),   // cluster of centroid 2 (e2)
      (3L, Array(0.95f, 0.05f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = archive.filter(col("vec_id") <= 2L)
    val batch = Seq(
      (10L, Array(0.97f, 0.03f, 0.0f)), // near archive 1/3 → dropped
      (11L, Array(0.0f, 0.9f, 0.44f)),  // e2 cluster, cos vs 2 ≈ 0.90 → dropped
      (12L, Array(0.0f, 0.1f, 0.99f))   // e2 cluster but nearly ⊥ archive 2 → kept
    ).toDF("vec_id", "embedding")
    val kept = Similarity.embedIncrementalFilter(batch, archive,
      "vec_id", "embedding", cents, "vec_id", "embedding",
      minCosE6 = 800000L).as[Long].collect().toSet
    assert(kept === Set(12L))
    // a batch vector near an ARCHIVE vector of a DIFFERENT cluster is
    // invisible to the filter (the blocking trade): 13 sits in e1's
    // cluster (cos .71 vs e1 > cos 0 vs e2) but its only close archive
    // vector is 2 (e2's cluster) — it survives
    val cross = Seq((13L, Array(0.71f, 0.7f, 0.0f))).toDF("vec_id", "embedding")
    val kept2 = Similarity.embedIncrementalFilter(cross, archive,
      "vec_id", "embedding", cents, "vec_id", "embedding",
      minCosE6 = 990000L).as[Long].collect().toSet
    assert(kept2 === Set(13L))
  }

  test("anomalyDays: a spiked day is flagged with the hand-computed z; " +
    "flat series are skipped (zero variance)") {
    import graft.operators.EventAnalytics
    def ev(day: Int, n: Int, typ: String) = (1 to n).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-02-$day%02d 10:00:00"), typ))
    // "view": 5 days of 10 plus one day of 40; "ping": perfectly flat
    val events = ((1 to 5).flatMap(d => ev(d, 10, "view")) ++ ev(6, 40, "view") ++
      (1 to 6).flatMap(d => ev(d, 7, "ping"))).toDF("ts", "event_type")
    val out = EventAnalytics.anomalyDays(events, "ts", "event_type", 1500L)
      .as[(String, java.sql.Date, Long, Long)].collect()
    // hand-compute: n=6, x=40, s1=90, s2=2100; num=6*40-90=150;
    // den2=6*2100-8100=4500; z = 1000*150/sqrt(4500) = 2236.0…
    assert(out.toSeq == Seq(("view", java.sql.Date.valueOf("2024-02-06"),
      40L, math.floor(1000.0 * 150.0 / math.sqrt(4500.0)).toLong)))
    // the flat type produced no row despite den2 = 0 (skipped, no NaN)
    assert(!out.exists(_._1 == "ping"))
  }

  test("dauWau: WAU covers exactly the trailing 7 days; repeat events " +
    "collapse to one active-day; idle days emit no row") {
    import graft.operators.EventAnalytics
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-03-01 10:00:00")),
      ("u1", ts("2024-03-01 11:00:00")), // same (user, day): one active-day
      ("u2", ts("2024-03-01 10:00:00")),
      ("u1", ts("2024-03-08 10:00:00")), // 7 days later: out of 03-01's window
      ("u3", ts("2024-03-05 10:00:00"))
    ).toDF("user_id", "ts")
    val out = EventAnalytics.dauWau(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toString -> (r._2, r._3)).toMap
    // 03-01: dau 2 (u1,u2); wau = users active in [02-24, 03-01] = 2
    assert(out("2024-03-01") === (2L, 2L))
    // 03-05: dau 1 (u3); wau = active in [02-28, 03-05] = u1,u2,u3 = 3
    assert(out("2024-03-05") === (1L, 3L))
    // 03-08: dau 1 (u1); wau = active in [03-02, 03-08] = u3,u1 = 2
    //        (03-01 activity is 7 days back — outside the window)
    assert(out("2024-03-08") === (1L, 2L))
    // idle days in between emit nothing
    assert(out.size === 3)
  }

  test("sourceDrift: identically-distributed sources score identically; " +
    "an exclusive-vocabulary source scores strictly higher") {
    import graft.operators.TextAnalysis
    // s1 and s2 share one distribution (symmetric, so their KL against
    // the s3-diluted corpus is equal); s3 is pure drift vocabulary
    val docs = Seq(
      ("s1", "x x y"), ("s1", "x y z"),
      ("s2", "x x y"), ("s2", "x y z"),
      ("s3", "q q q r")
    ).toDF("source", "text")
    val out = TextAnalysis.sourceDrift(docs, "source", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // s1 ≡ s2: same counts, same n_terms
    assert(out("s1") === out("s2"))
    // s3's tokens are exclusive to it: p_s(t)/p(t) = N/N_s > 1 for every
    // term, so KL is strictly positive and large
    assert(out("s3")._2 > 0L)
    assert(out("s3")._2 > out("s1")._2)
    assert(out("s3")._1 === 2L) // q, r
    // floor-quantization bounds: kl_e9 ≥ −n_terms even at zero true KL
    out.values.foreach { case (terms, kl) => assert(kl >= -terms) }
  }

  test("CSV round trip is lossless on every adversarial string shape") {
    import graft.sources.CsvLossless
    val rows = Seq(
      (1L, "plain text"),
      (2L, null.asInstanceOf[String]),          // null must stay null
      (3L, ""),                                  // empty must stay empty
      (4L, "line one\nline two"),                // embedded newline
      (5L, "\\N"),                               // literally the null token
      (6L, "\\\\N"),                             // backslash-backslash-N
      (7L, "\\anything else with a lead slash"),
      (8L, "has \"quotes\" and, commas"),
      (9L, "trailing backslash \\")
    )
    val df = rows.toDF("id", "text")
    val stage = "/root/repo/target/csv_lossless_spec"
    CsvLossless.write(df, stage)
    val back = CsvLossless.read(spark, df.schema, stage)
      .as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
    // null vs empty specifically: both present, distinct
    val byId = back.toMap
    assert(byId(2L) == null && byId(3L) == "")
  }

  test("sessionizePresplit equals sessionize on a hot-user corpus and " +
    "bounds per-task group sizes") {
    import graft.operators.Sessions
    val gap = java.time.Duration.ofMinutes(30)
    val bucket = java.time.Duration.ofHours(2)
    // one user owns ~60% of events; increments are a deterministic mix
    // of intra-session (< gap) and session-breaking (> gap) steps, so
    // sessions repeatedly straddle the 2 h bucket edges the presplit
    // path must merge across
    def stream(user: String, n: Int, seed: Long): Seq[(String, java.sql.Timestamp)] = {
      var t = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
      (1 to n).map { i =>
        val r = (i * 7919L + seed * 104729L) % 97
        t += (if (r < 60) r * 30 * 1000L          // ≤ ~30 min: same session
              else (31 + r) * 60 * 1000L)          // > gap: new session
        (user, new java.sql.Timestamp(t))
      }
    }
    val events = (stream("hot", 300, 1) ++ stream("u1", 80, 2) ++
      stream("u2", 80, 3) ++ stream("u3", 40, 4)).toDF("user_id", "ts")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "session_idx", "session_start", "session_end",
        "n_events").collect().map(_.toSeq).toSet
    val plain = canon(Sessions.sessionize(events, "user_id", "ts", gap))
    val split = canon(Sessions.sessionizePresplit(events, "user_id", "ts",
      gap, bucket))
    assert(split == plain)
    // the guard's point: no (user, bucket) event group approaches the
    // hot user's total — the per-task sort in pass 1 is bounded by the
    // bucket span, not by the user's full history
    val maxGroup = events
      .groupBy(col("user_id"),
        floor(unix_micros(col("ts")) / lit(bucket.toNanos / 1000)))
      .count().agg(max("count")).as[Long].head()
    assert(maxGroup < 40L, s"largest (user,bucket) group = $maxGroup")
  }

  test("tokenize maps positions to vocab ranks with OOV -> 0") {
    val d = Seq(
      (1L, "the the the fox fox rare"),
      (2L, "the fox")
    ).toDF("doc_id", "text")
    // vocab k=2: the(5) -> 1, fox(3) -> 2; "rare" is OOV
    val got = TextAnalysis.tokenize(d, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 2L), (1L, 5L, 2L),
      (1L, 6L, 0L), (2L, 1L, 1L), (2L, 2L, 2L)))
  }

  test("percentileRankByValue: ties share a rank, strictly-below counting") {
    val d = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L))
      .toDF("doc_id", "score")
    val got = TextAnalysis.percentileRankByValue(d, "score")
      .select("doc_id", "pct_e4").as[(Long, Long)].collect().toMap
    // 0 of 4 below 10 => 0; 2 of 4 below 20 => 5000; 3 of 4 below 30 => 7500
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 5000L, 4L -> 7500L))
  }

  test("tfidfTopK ranks rare-but-frequent terms above common ones") {
    val docs = Seq(
      (1L, "zebra zebra zebra the the"),
      (2L, "the quick fox"),
      (3L, "the lazy dog")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .select("doc_id", "token", "rank").as[(Long, String, Int)].collect()
    val d1 = top.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    // "zebra" (tf=3, df=1) outscores "the" (tf=2, df=3)
    assert(d1.head == "zebra")
    // every doc gets exactly k=2 ranked terms (3 distinct tokens each)
    assert(top.groupBy(_._1).forall(_._2.length == 2))
  }

  test("ivfTopK probes only the query's centroid bucket at nprobe=1, " +
    "and nprobe=2 widens to the next-nearest bucket") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.95f, 0.05f)), (2L, Array(0.9f, 0.1f)),
      (50L, Array(0f, 1f)), (51L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") % 50 === 0)
    def probe(np: Int) = Similarity.ivfTopK(emb, "vec_id", "embedding", cents,
      "vec_id", "embedding", col("vec_id") === 1, k = 10, nprobe = np)
      .select("nbr_id").as[Long].collect().toSet
    // bucket of centroid 0 holds {0,1,2}; 50/51 are in the other bucket
    assert(probe(1) == Set(0L, 2L))
    // second probe reaches the (0,1) bucket too
    assert(probe(2) == Set(0L, 2L, 50L, 51L))
  }

  test("ivf nprobe is a recall knob: monotone, exact when probing all buckets") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.filter(col("vec_id") % 50 === 0)
    val nCents = cents.count().toInt
    val truth = Similarity.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 10, k = 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    def recall(np: Int): Double = {
      val got = Similarity.ivfTopK(emb, "vec_id", "embedding", cents,
        "vec_id", "embedding", col("vec_id") < 10, k = 5, nprobe = np)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r1 <= r3, s"recall must not drop as nprobe grows: $r1 -> $r3")
    // probing every bucket scores every candidate — identical to brute force
    assert(recall(nCents) == 1.0)
  }

  test("corpus pipeline composes quality, repetition, dedup, decontamination") {
    val train = Seq(
      // near-dup pair: 31 is 30 plus one appended token (jaccard 7/8);
      // min-id representative 30 must survive, 31 must not
      (30L, "alpha beta gamma delta epsilon zeta eta theta the", 40L),
      (31L, "alpha beta gamma delta epsilon zeta eta theta the iota", 44L),
      // quality gate: one token repeated => distinct ratio 500 < 4000
      (32L, Seq.fill(20)("spam").mkString(" "), 99L),
      // repetition gate: 20-token cycle twice => quality 5000 passes but
      // rep3 = floor(18/38*1e4) = 4736 > 500
      (33L, ((0 until 20) ++ (0 until 20)).map(i => s"c$i").mkString(" "), 120L),
      // decontamination: shares 3 trigrams with eval doc 100 (>= 2)
      (40L, "foo bar baz qux quux grault the", 31L),
      // clean survivor
      (50L, "hello world this is a fine document the end", 44L)
    ).toDF("doc_id", "text", "n_chars")
    val evalDocs = Seq((100L, "foo bar baz qux quux corge the", 30L))
      .toDF("doc_id", "text", "n_chars")
    val out = CorpusPipeline.clean(train, evalDocs)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(30L, 50L))
    // survivors carry the quality score for downstream filtering/weighting
    assert(out.columns.contains("quality_e4"))
  }

  test("repetition ratio flags templated text, zero for all-distinct") {
    val docs = Seq(
      // w=4: 3 bigram occurrences, 1 distinct => rep2 = floor(2/3*1e4);
      //      2 trigram occurrences, 1 distinct => rep3 = 5000
      (1L, "spam spam spam spam"),
      (2L, "all tokens are different here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(docs, "text")
      .select("doc_id", "rep2_e4", "rep3_e4").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(1L -> (6666L, 5000L), 2L -> (0L, 0L)))
  }

  test("language-id & quality are deterministic and sane") {
    val out = docs.select(col("doc_id"),
      TextAnalysis.langPredict(col("text")).as("pred"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(5L) == "de")
    val q = TextAnalysis.qualityFeatures(docs, "text")
    assert(q.filter($"doc_id" === 1L).select("n_tokens").as[Long].head() == 9L)
  }

  test("multimodal: batched decode plumbing preserves ids and is deterministic") {
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    assert(media.schema("media").dataType.typeName == "binary")
    val decoded = Multimodal.extractFeatures(media, batchSize = 2)
    val rows = decoded.collect()
    assert(rows.map(_.media_id).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // identical payloads decode identically
    val byId = rows.map(r => r.media_id -> (r.width, r.height, r.nFrames)).toMap
    assert(byId(1L) == byId(2L))
    // sizeBytes round-trips the payload length
    assert(rows.find(_.media_id == 1L).get.sizeBytes == 43L)
    val resized = Multimodal.resize(decoded, maxDim = 256)
    assert(resized.filter(col("out_width") > 256 || col("out_height") > 256).count() == 0)
  }

  test("multimodal REAL image path: ImageIO decode returns actual " +
    "dimensions + luma features distributed; resizeEncode scales the " +
    "long side down, never upscales, and passes non-images through " +
    "byte-identical") {
    import spark.implicits._
    // in-memory PNG/JPEG fixtures: a 200x100 gradient and a 40x60 solid
    def png(w: Int, h: Int, solid: Option[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, solid.getOrElse((x * 255 / w) << 16 | (y * 255 / h)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val garbage = "definitely not an image".getBytes("UTF-8")
    val media = Seq(
      (1L, png(200, 100, None)),
      (2L, png(40, 60, Some(0xffffff))),
      (3L, garbage)
    ).toDF("media_id", "media")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("image/png").as("mimeType"),
        org.apache.spark.sql.functions.octet_length(col("media"))
          .cast("long").as("sizeBytes")))

    val decoded = Multimodal.extractFeatures(media, batchSize = 2)
      .collect().map(r => r.media_id -> r).toMap
    // real dimensions, not the stub's byte-derived pseudo-dims
    assert((decoded(1L).width, decoded(1L).height) == (200, 100))
    assert((decoded(2L).width, decoded(2L).height) == (40, 60))
    // the all-white image's luma histogram concentrates in the top bucket
    assert(decoded(2L).feature(7) > 0.99f)
    // non-image bytes fall back to the stub (pipeline keeps every row)
    assert(decoded.contains(3L))

    val resized = Multimodal.resizeEncode(media, maxDim = 100)
      .collect().map(r => r.media_id -> r).toMap
    assert((resized(1L).out_width, resized(1L).out_height) == (100, 50))
    assert(resized(1L).resized)
    // re-encoded bytes decode to the claimed dimensions
    val round = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(1L).media))
    assert(round.getWidth == 100 && round.getHeight == 50)
    // already-small image: untouched bytes, real dims, no upscale
    assert(!resized(2L).resized &&
      (resized(2L).out_width, resized(2L).out_height) == (40, 60))
    // non-image: byte-identical pass-through, flagged
    assert(!resized(3L).resized &&
      java.util.Arrays.equals(resized(3L).media, garbage))
  }

  test("multimodal REAL audio path: RIFF/WAV chunk walk decodes exact " +
    "integer stats, skips unknown (and odd-sized) chunks, rejects " +
    "malformed containers, and the distributed operator drops non-WAV " +
    "rows") {
    import spark.implicits._
    // hand-computed: sumSq = 100²+200²+300²+0+1 = 140001; sign changes
    // at (100,-200) and (-200,300) only (zero never crosses); peak 300;
    // 5 mono frames at 8 kHz floor to 0 ms
    val samples = Array[Short](100, -200, 300, 0, -1)
    val wav = Multimodal.encodeWav(samples, sampleRate = 8000)
    val m = Multimodal.decodeWav(wav).get
    assert((m.sampleRate, m.nChannels, m.bitsPerSample) == (8000, 1, 16))
    assert((m.nSamples, m.durationMs) == (5L, 0L))
    assert((m.sumSq, m.zeroCrossings, m.peakAbs) == (140001L, 2L, 300))

    // stereo: frames = samples / channels drives duration
    val st = Multimodal.decodeWav(
      Multimodal.encodeWav(Array.fill[Short](44100 * 2)(7), 44100,
        nChannels = 2)).get
    assert((st.nChannels, st.nSamples, st.durationMs) == (2, 88200L, 1000L))

    // odd-sized unknown chunk before `data`: the walker must consume
    // the word-alignment pad byte or it misreads everything after it
    def splice(base: Array[Byte]): Array[Byte] = {
      val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
      val dataAt = base.indexOfSlice("data".getBytes)
      val out = base.take(dataAt) ++ junk ++ base.drop(dataAt)
      val riffSz = out.length - 8
      java.nio.ByteBuffer.wrap(out)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4, riffSz)
      out
    }
    assert(Multimodal.decodeWav(splice(wav)).get.sumSq == 140001L)

    // malformed: truncated header, wrong magic, compressed format tag,
    // and a chunk whose declared size overruns the payload
    assert(Multimodal.decodeWav(wav.take(8)).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    val mulaw = wav.clone() // format tag 7 at fmt offset 20
    mulaw(20) = 7
    assert(Multimodal.decodeWav(mulaw).isEmpty)
    val overrun = wav.clone()
    java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(wav.indexOfSlice("data".getBytes) + 4, Int.MaxValue)
    assert(Multimodal.decodeWav(overrun).isEmpty)

    // distributed: WAV rows decode, garbage rows drop (modality dispatch)
    val media = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val out = Multimodal.extractAudioMeta(media)
      .select("media_id", "sum_sq", "zero_crossings", "peak_abs")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 140001L, 2L, 300)))
  }

  test("multimodal REAL video path: ISO-BMFF box walk parses " +
    "mvhd/tkhd/stsd through the full nesting (mdat before moov, free " +
    "box, largesize), rejects malformed containers, and the " +
    "distributed operator drops non-MP4 rows") {
    import spark.implicits._
    val mp4 = Multimodal.encodeMp4(timescale = 700, durationUnits = 2500L,
      tracks = Seq(("avc1", 320, 240), ("mp4a", 0, 0)),
      mdat = "payload".getBytes("UTF-8"))
    val m = Multimodal.decodeMp4(mp4).get
    assert((m.timescale, m.durationUnits, m.durationMs) == (700, 2500L, 3571L))
    assert((m.nTracks, m.width, m.height, m.codec) == (2, 320, 240, "avc1"))

    // 64-bit largesize spelling of the free box: size32 == 1 + 8-byte
    // size — a walker that only reads size32 misparses everything after
    val freeAt = mp4.indexOfSlice("free".getBytes) - 4
    val freeSz = java.nio.ByteBuffer.wrap(mp4, freeAt, 4).getInt
    val large = mp4.take(freeAt) ++
      Array[Byte](0, 0, 0, 1) ++ "free".getBytes ++
      java.nio.ByteBuffer.allocate(8).putLong(freeSz + 8L).array() ++
      mp4.slice(freeAt + 8, freeAt + freeSz) ++ mp4.drop(freeAt + freeSz)
    assert(Multimodal.decodeMp4(large).get.codec == "avc1")

    // malformed: truncated, no moov, box overrun
    assert(Multimodal.decodeMp4(mp4.take(6)).isEmpty)
    assert(Multimodal.decodeMp4(mp4.take(freeAt)).isEmpty) // ftyp+nothing
    val overrun = mp4.clone()
    val moovAt = overrun.indexOfSlice("moov".getBytes) - 4
    java.nio.ByteBuffer.wrap(overrun, moovAt, 4).putInt(Int.MaxValue)
    assert(Multimodal.decodeMp4(overrun).isEmpty)

    // distributed: MP4 rows parse, garbage rows drop (modality dispatch)
    val media = Seq((1L, mp4), (2L, "not video".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val out = Multimodal.extractVideoMeta(media)
      .select("media_id", "n_tracks", "width", "height", "codec")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq((1L, 2, 320, 240, "avc1")))
  }

  test("multimodal near-dup: identical payloads pair at cos 1.0 via the feature path") {
    import spark.implicits._
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media)
      .toDF().select(col("media_id"), col("feature"))
    val pairs = Similarity.cosineNearDupPairs(feats, "media_id", "feature",
      lit(true), minCosE6 = 999990L)
      .select("id_a", "id_b", "cos_e6").as[(Long, Long, Long)].collect()
    // docs 1 and 2 are byte-identical payloads => identical stub features
    // (cos_e6 may floor to 999999: dot/(sqrt(s)*sqrt(s)) != 1 exactly)
    val dup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(dup.exists(_._3 >= 999990L))
  }
}
