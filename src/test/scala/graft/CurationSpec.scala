package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Packing, TextAnalysis}

/** Curation-layer operators: sequence packing, quality quotas, split
  * assignment, mixture reporting, normalization, PII scrub, chunking.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  // 40 docs with varied lengths; lengths chosen so bins mix doc counts
  private val docs = (1L to 40L)
    .map(i => (i, 10L + (i * 7) % 90, if (i % 3 == 0) "de" else "en"))
    .toDF("doc_id", "n_tokens", "lang")

  test("packGreedy: every doc placed exactly once") {
    val out = Packing.packGreedy(docs, "doc_id", "n_tokens",
      budgetTokens = 128L, nShards = 4)
    assert(out.count() == 40L)
    assert(out.select("doc_id").distinct().count() == 40L)
  }

  test("packGreedy: multi-doc bins respect the budget; offsets are contiguous") {
    val out = Packing.packGreedy(docs, "doc_id", "n_tokens",
      budgetTokens = 128L, nShards = 4)
      .select("doc_id", "shard", "bin", "bin_offset", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byBin = out.groupBy(r => (r._2, r._3))
    byBin.foreach { case (_, rows) =>
      val total = rows.map(_._5).sum
      if (rows.length > 1) assert(total <= 128L)
      // offsets = prefix sums of lengths in ascending doc_id order
      val sorted = rows.sortBy(_._1)
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r._4 == expect, s"offset mismatch for doc ${r._1}")
        expect + r._5
      }
    }
  }

  test("packGreedy: an oversize doc occupies a bin alone") {
    val withBig = docs.union(Seq((99L, 500L, "en")).toDF("doc_id", "n_tokens", "lang"))
    val out = Packing.packGreedy(withBig, "doc_id", "n_tokens",
      budgetTokens = 128L, nShards = 2)
      .select("doc_id", "shard", "bin").as[(Long, Long, Long)].collect()
    val bigBin = out.find(_._1 == 99L).map(r => (r._2, r._3)).get
    assert(out.count(r => (r._2, r._3) == bigBin) == 1)
  }

  test("packGreedy: result is a pure function of ids+lengths (partitioning-independent)") {
    val a = Packing.packGreedy(docs.repartition(1), "doc_id", "n_tokens",
      budgetTokens = 128L, nShards = 4).collect().toSet
    val b = Packing.packGreedy(docs.repartition(13), "doc_id", "n_tokens",
      budgetTokens = 128L, nShards = 4).collect().toSet
    assert(a == b)
  }

  test("weightedSampleN: matches a driver-side exponential-clock " +
    "recompute; heavier rows win more often; zero-weight rows excluded") {
    import graft.operators.{Sampling, TextDedup}
    val data = (1L to 60L).map(i =>
      (i, if (i % 2 == 0) "a" else "b",
        if (i % 10 == 0) 0L else 1L + (i % 7) * 100L))
    val df = data.toDF("doc_id", "lang", "w")
    val k = 5
    val out = Sampling.weightedSampleN(df, "doc_id", "lang", col("w"), k)
      .as[(String, Long, Long, Int)].collect()

    // driver-side recompute: u from the SAME md5 hash (via the expression
    // evaluated through a one-row frame), clock = floor(1e9*(-ln u)/w)
    val hashes = df
      .select(col("doc_id"), TextDedup.md5Long(
        concat(lit("wsamp#"), col("doc_id").cast("string"))).as("h"))
      .as[(Long, Long)].collect().toMap
    val clocks = data.filter(_._3 > 0).map { case (id, g, w) =>
      val u = (hashes(id) % 1000000L + 1L).toDouble / 1000000.0
      (g, id, math.floor(1e9 * -math.log(u) / w.toDouble).toLong)
    }
    clocks.groupBy(_._1).foreach { case (g, rows) =>
      val expect = rows.sortBy(t => (t._3, t._2)).take(k)
        .map(t => (t._2, t._3)).toSeq
      val got = out.filter(_._1 == g).sortBy(_._4).map(t => (t._2, t._3)).toSeq
      assert(got === expect, s"stratum $g")
    }
    // zero-weight rows never appear
    assert(!out.exists(_._2 % 10 == 0))

    // weighting direction: across many salts, the heaviest weight class
    // is sampled far more often than the lightest
    val heavy = (1L to 200L).map(i => (i, "s", if (i <= 100) 600L else 1L))
      .toDF("doc_id", "lang", "w")
    val picks = (1 to 8).flatMap { s =>
      Sampling.weightedSampleN(heavy, "doc_id", "lang", col("w"), 10,
        salt = s"ws$s").as[(String, Long, Long, Int)].collect().map(_._2)
    }
    val heavyShare = picks.count(_ <= 100).toDouble / picks.size
    assert(heavyShare > 0.8, s"heavy share $heavyShare")
  }

  test("uniformSampleN: exactly n rows, partitioning-independent, prefix-consistent") {
    val s20 = graft.operators.Sampling.uniformSampleN(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.size == 20)
    val reparted = graft.operators.Sampling.uniformSampleN(
      docs.repartition(11), "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(reparted == s20)
    // growing the sample only ADDS rows (hash order is a fixed total
    // order, so samples are nested prefixes of it)
    val s30 = graft.operators.Sampling.uniformSampleN(docs, "doc_id", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(s20.subsetOf(s30))
  }

  test("quotaTopK matches the window formulation exactly") {
    val scored = docs.withColumn("score", (col("doc_id") * 37) % 11)
    val viaAgg = Curation.quotaTopK(scored, "lang", "doc_id", "score", quota = 5)
      .select("lang", "doc_id", "score", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val viaWindow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("lang", "doc_id", "score", "rank")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("assignSplits: total partition, deterministic, weights validated") {
    val out = Curation.assignSplits(docs, "doc_id",
      Seq("train" -> 8000L, "val" -> 1000L, "test" -> 1000L))
    assert(out.count() == 40L)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 40L)
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.getOrElse("train", 0L) > counts.getOrElse("val", 0L))
    // same (salt, key) => same split on a reshuffled frame
    val again = Curation.assignSplits(docs.repartition(7), "doc_id",
      Seq("train" -> 8000L, "val" -> 1000L, "test" -> 1000L))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again == first)
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "doc_id", Seq("a" -> 5000L, "b" -> 4000L))
    }
  }

  test("domainMixture: shares are floor-exact fractions of the grand total") {
    val mix = Curation.domainMixture(docs, "lang", "lang", col("n_tokens"))
      .select("n_docs", "n_tokens", "share_e6").as[(Long, Long, Long)].collect()
    val total = mix.map(_._2).sum
    mix.foreach { case (_, t, share) =>
      assert(share == math.floor(t * 1000000.0 / total).toLong)
    }
    assert(mix.map(_._1).sum == 40L)
  }

  test("normalizeText: NFC-composes, lowercases, collapses whitespace") {
    // "e" + combining acute (U+0301) must compose to U+00E9
    val df = Seq(
      (1L, "Café  du   Monde"),
      (2L, "  ALREADY   nfc  ")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextAnalysis.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "café du monde")
    assert(out(2L) == "already nfc")
    // idempotent
    val twice = df.select(col("id"),
      TextAnalysis.normalizeText(TextAnalysis.normalizeText(col("text"))).as("n"))
      .as[(Long, String)].collect().toMap
    assert(twice == out)
  }

  test("piiRedact: planted emails and IPs are counted and redacted") {
    val df = Seq(
      (1L, "contact alice@example.com or 10.0.0.1 now"),
      (2L, "no pii here at all"),
      (3L, "two mails: a@b.io c.d@e-f.org and 192.168.1.254")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(df, "text")
      .select("doc_id", "n_emails", "n_ips", "redacted")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1L && out(1L)._3 == 1L)
    assert(out(1L)._4 == "contact <EMAIL> or <IP> now")
    assert(out(2L)._2 == 0L && out(2L)._3 == 0L && out(2L)._4 == "no pii here at all")
    assert(out(3L)._2 == 2L && out(3L)._3 == 1L)
    assert(!out(3L)._4.contains("a@b.io") && !out(3L)._4.contains("192.168.1.254"))
  }

  test("commonTokenRatio: corpus-frequent tokens score high, noise scores 0") {
    val df = Seq(
      (1L, "the cat and the dog and the cat"),
      (2L, "the dog and the cat"),
      (3L, "zq9x jkw7 vv0p qqa3")  // tokens that appear once each
    ).toDF("doc_id", "text")
    // k=4 vocabulary is {the, and, cat, dog} (freqs 5,3,3,2); noise tokens
    // appear once and lose the (n desc, token asc) cut deterministically
    val out = TextAnalysis.commonTokenRatio(df, "doc_id", "text", k = 4)
      .select("doc_id", "n_tokens", "common_ratio_e4")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 10000L && out(2L)._3 == 10000L)
    assert(out(3L)._3 == 0L)
    assert(out(3L)._2 == 4L)
  }

  test("chunkFixed: windows tile the token stream with the given stride") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = TextAnalysis.chunkFixed(df, "doc_id", "text",
      chunkTokens = 32, stride = 24)
      .select("chunk_idx", "chunk_start", "n_chunk_tokens", "chunk_fp")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // starts 0,24,48,72,96 => 5 chunks
    assert(out.map(_._2).toSeq == Seq(0L, 24L, 48L, 72L, 96L))
    assert(out.map(_._3).toSeq == Seq(32L, 32L, 32L, 28L, 4L))
    // first chunk fingerprint = md5 of tokens 1..32
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 32).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.head._4 == expected)
  }

  // ---- Gopher rule-set filter ----

  private def gopherRow(text: String): Map[String, Any] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val row = TextAnalysis.gopherQuality(df, "text").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopherQuality: a clean prose document passes every rule") {
    // 52 alphabetic words incl. >=2 required stopwords, mean len in [3,10]
    val words = Seq("the", "with", "have") ++
      (1 to 49).map(i => s"word${i % 7}abc")
    val m = gopherRow(words.mkString(" "))
    assert(m("keep") == true, s"expected keep, got $m")
    assert(m("n_tokens") == 52L)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words", "r_stopwords")
      .foreach(r => assert(m(r) == true, s"$r failed: $m"))
  }

  test("gopherQuality: each rule trips on its own violation") {
    // too few words
    assert(gopherRow("the with just a few little words")("r_word_count") == false)
    // mean word length out of [3,10]
    val longWords = (1 to 60).map(_ => "supercalifragilistic").mkString(" ")
    assert(gopherRow(longWords)("r_mean_word_len") == false)
    // symbol ratio: >10% hash marks
    val hashy = (1 to 60).map(i => if (i % 2 == 0) "#" else "word").mkString(" ")
    assert(gopherRow(hashy)("r_symbol_ratio") == false)
    // bullet lines: every line starts with a bullet
    val bullets = (1 to 10).map(i => s"- item $i with the usual words here")
      .mkString("\n")
    assert(gopherRow(bullets)("r_bullet_lines") == false)
    // ellipsis line endings above 30%
    val ells = (1 to 10).map(i =>
      if (i <= 5) s"line $i trails off..." else s"line $i is complete")
      .mkString("\n")
    assert(gopherRow(ells)("r_ellipsis_lines") == false)
    // alphabetic-word share below 80%
    val nums = (1 to 60).map(i => if (i % 2 == 0) "12345" else "word").mkString(" ")
    assert(gopherRow(nums)("r_alpha_words") == false)
    // fewer than 2 required stopwords
    val noStops = (1 to 60).map(i => s"token${i}xyz").mkString(" ")
    assert(gopherRow(noStops)("r_stopwords") == false)
  }

  test("gopherQuality: ellipsis symbol counting is non-overlapping and " +
    "exact at boundaries (exactly 10% symbols passes)") {
    // 60 words, 6 of them "..." => 6*10 <= 60 passes; 7 would fail
    val pass = ((1 to 54).map(_ => "word") ++ (1 to 6).map(_ => "...")).mkString(" ")
    assert(gopherRow(pass)("r_symbol_ratio") == true)
    val fail = ((1 to 53).map(_ => "word") ++ (1 to 7).map(_ => "...")).mkString(" ")
    assert(gopherRow(fail)("r_symbol_ratio") == false)
  }

  // ---- DSIR importance weights ----

  test("dsirWeights: target-distinctive tokens score above raw-typical " +
    "ones, and the score is partitioning-invariant") {
    // target (en) docs speak "alpha", raw background speaks "beta"
    val docs = ((1L to 10L).map(i => (i, "alpha " * 20 + "shared", "en")) ++
      (11L to 30L).map(i => (i, "beta " * 20 + "shared", "de"))).toSeq
      .toDF("doc_id", "text", "lang")
    val w = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en")
    val byDoc = w.select("doc_id", "dsir_avg_e4").as[(Long, Long)]
      .collect().toMap
    assert(byDoc(1L) > byDoc(11L),
      s"alpha doc should outscore beta doc: $byDoc")
    assert(byDoc(1L) == byDoc(5L) && byDoc(11L) == byDoc(20L))
    // exact integers => identical at any partitioning
    val w2 = Curation.dsirWeights(docs.repartition(7), "doc_id", "text",
      col("lang") === "en").select("doc_id", "dsir_avg_e4")
      .as[(Long, Long)].collect().toMap
    assert(w2 == byDoc)
    assert(w.select("n_tokens").as[Long].collect().forall(_ == 21L))
  }

  test("dsirWeights: uniform corpus (target == raw distribution) gives " +
    "every doc the same weight near 1e4") {
    val docs = (1L to 20L)
      .map(i => (i, "same text for everyone", if (i % 2 == 0) "en" else "de"))
      .toSeq.toDF("doc_id", "text", "lang")
    // small bucket count so add-1 smoothing doesn't dominate an
    // 80-token corpus (production default 4096 assumes real volume)
    val avg = Curation.dsirWeights(docs, "doc_id", "text",
      col("lang") === "en", nBuckets = 16)
      .select("dsir_avg_e4").as[Long].collect().distinct
    assert(avg.length == 1, s"uniform corpus must weight uniformly: ${avg.toSeq}")
    // p_t ≈ p_r modulo smoothing => ratio ≈ 1e4 (within smoothing slack)
    assert(avg.head > 8000L && avg.head < 12000L, s"got ${avg.head}")
  }

  test("bigramLift: hand-computed lift on a toy corpus; hapax pruning; " +
    "tie-break on bigram text") {
    // corpus: "a b" x3, "a c" x2, "c c" x1  -> N = 12 tokens
    // counts: a=5, b=3, c=4; bigrams: "a b"=3, "a c"=2, "c c"=1
    val df = (Seq.fill(3)("a b") ++ Seq.fill(2)("a c") ++ Seq("c c"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLift(df, "doc_id", "text",
      minCount = 2L, k = 10)
      .as[(String, Long, Long)].collect()
    // lift(a b) = 3*1e6*12 div (5*3) = 2400000
    // lift(a c) = 2*1e6*12 div (5*4) = 1200000; "c c" pruned (support 1)
    assert(got.toSeq == Seq(("a b", 3L, 2400000L), ("a c", 2L, 1200000L)))
  }

  test("vocabCoverage: hand-computed curve with rank ties broken by " +
    "token text; ks larger than the vocab saturate") {
    // tokens: x x x y y z -> counts x=3, y=2, z=1; N=6
    val df = Seq((1L, "x x x y y z")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(df, "text", ks = Seq(1, 2, 100))
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 3L, 6L, 500000L),
      (2, 5L, 6L, 833333L),
      (100, 6L, 6L, 1000000L)))
  }

  test("waterFillAllocation: hand-computed cap, full-coverage branch, " +
    "and the <= k-1 unspent remainder bound") {
    // strata sizes 2, 5, 9, 30; budget 20:
    // sorted prefix: i=1 (n=2,P=2): 0+4*2=8 <= 20; i=2 (n=5,P=7):
    // 2+3*5=17 <= 20; i=3 (n=9,P=16): 7+2*9=25 > 20 -> cap=(20-7)//2=6
    // allocs: 2, 5, 6, 6 (total 19, remainder 1 <= k-1)
    val rows = Seq.tabulate(2)(i => ("w", i)) ++ Seq.tabulate(5)(i => ("x", i)) ++
      Seq.tabulate(9)(i => ("y", i)) ++ Seq.tabulate(30)(i => ("z", i))
    val df = rows.toDF("src", "j")
    val got = Curation.waterFillAllocation(df, "src", budget = 20L)
      .select(col("src"), col("cap"), col("alloc"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("w") == ((6L, 2L)) && got("x") == ((6L, 5L)))
    assert(got("y") == ((6L, 6L)) && got("z") == ((6L, 6L)))
    // full coverage: budget >= total -> cap = max stratum, alloc = n
    val full = Curation.waterFillAllocation(df, "src", budget = 1000L)
      .select(col("src"), col("cap"), col("alloc"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(full("z") == ((30L, 30L)) && full("w") == ((30L, 2L)))
  }

  test("globalShuffleOrder: pos is exactly the rank under " +
    "(xxhash64(id), id) — checked against a one-window formulation") {
    val ids = spark.range(0, 1000).select(col("id").as("doc_id"))
    val got = Curation.globalShuffleOrder(ids, "doc_id")
      .select(col("doc_id"), col("pos"))
      .as[(Long, Long)].collect().toMap
    val want = ids.withColumn("h", xxhash64(col("doc_id")))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("h").asc, col("doc_id").asc)).cast("long") - 1L)
      .select(col("doc_id"), col("pos"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalShuffleOrder: pure function of the id set — bucket width " +
    "and input partitioning change nothing; pos is a 0-based permutation") {
    val ids = spark.range(0, 500).select(col("id").as("doc_id"))
    val a = Curation.globalShuffleOrder(ids, "doc_id")
      .select(col("doc_id"), col("pos")).as[(Long, Long)].collect().toMap
    val b = Curation.globalShuffleOrder(ids.repartition(13), "doc_id",
      bucketBits = 3)
      .select(col("doc_id"), col("pos")).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 500L))
  }

  test("readability: hand-computed Flesch micro-grid values; total on " +
    "empty/unpunctuated text") {
    val df = Seq((1L, "Hello world. This is fun!"), (2L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1: 5 words, 2 sentences, vowel groups e|o|o|i|i|u = 6:
    // 206835000 - (1015000*5) div 2 - (84600000*6) div 5 = 102777500
    assert(got(1L) == ((5L, 2L, 6L, 102777500L)))
    // doc 2: all counts floored at 1, zero vowels -> syllables = words
    assert(got(2L) == ((1L, 1L, 1L, 206835000L - 1015000L - 84600000L)))
  }

  test("leakage-safe split: every near-dup pair lands in ONE split " +
    "(no cluster ever spans splits), singletons split like the plain " +
    "doc-id assignment would on their own key") {
    import graft.operators.{GraphAlgos, TextDedup}
    // three near-dup clusters of 3 + 20 singletons, all same length band
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    def mutate(seed: Int) = ((1 to 37).map(i => s"w$i") ++
      (1 to 3).map(i => s"m$seed$i")).mkString(" ")
    val docs = (
      (0 until 3).flatMap(c => (0 until 3).map(m =>
        (c * 10L + m, if (m == 0) base + s" c$c c$c c$c" else mutate(c) + s" c$c c$c c$c"))) ++
      (100L until 120L).map(i => (i, (1 to 40).map(j => s"u${i}x$j").mkString(" ")))
    ).toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val pairs = TextDedup.lengthBandedJaccardPairs(docs, "doc_id", "text",
      "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L)
      .localCheckpoint(true)
    assert(pairs.count() >= 3, "fixture must produce near-dup pairs")
    val labels = GraphAlgos.connectedComponents(pairs)
    val assigned = graft.operators.Curation.assignSplits(
      docs.select(col("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("leak_key", coalesce(col("label"), col("doc_id"))),
      "leak_key", Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
      .select("doc_id", "leak_key", "split")
      .localCheckpoint(true)
    // THE property: both endpoints of every pair share one split
    val crossSplit = pairs
      .join(assigned.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(assigned.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossSplit == 0L, "a near-dup pair crossed splits")
    // singletons: leak_key == own id, so the split equals the plain form
    val single = assigned.filter(col("doc_id") >= 100L)
    assert(single.filter(col("leak_key") =!= col("doc_id")).count() == 0)
    val plain = graft.operators.Curation.assignSplits(
      docs.filter(col("doc_id") >= 100L).select("doc_id"), "doc_id",
      Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
    assert(single.select("doc_id", "split").as[(Long, String)].collect().toSet
      == plain.select("doc_id", "split").as[(Long, String)].collect().toSet)
  }
}
