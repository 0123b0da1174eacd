package graft

import graft.operators.GraphAlgos

/** Integer-exact PageRank power iteration (hand-computed expectations). */
class GraphAlgosSpec extends SparkTestBase {
  import spark.implicits._

  private val S = 1000000000000L

  private def ranks(edges: Seq[(String, String, Long)], iters: Int) =
    GraphAlgos.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters = iters)
      .as[(String, Long)].collect().toMap

  test("symmetric 2-cycle is a fixed point at rank = scale/2") {
    val r = ranks(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 3)
    assert(r == Map("a" -> S / 2, "b" -> S / 2))
  }

  test("single edge: source decays to teleport, sink follows one step " +
    "behind (hand-computed, dangling mass dropped)") {
    // N=2: base = 5e11, teleport = (15 * 5e11) div 100 = 7.5e10
    val r1 = ranks(Seq(("a", "b", 1L)), iters = 1)
    assert(r1 == Map("a" -> 75000000000L, "b" -> 500000000000L))
    // iter 2: contrib(b) = rank(a) = 7.5e10;
    // rank(b) = 7.5e10 + (85 * 7.5e10) div 100 = 138_750_000_000
    val r2 = ranks(Seq(("a", "b", 1L)), iters = 2)
    assert(r2 == Map("a" -> 75000000000L, "b" -> 138750000000L))
  }

  test("weights split a node's rank proportionally, truncating — " +
    "hand-computed 3-node fan-out") {
    // a->b w=3, a->c w=1. N=3: base = 333_333_333_333,
    // teleport = (15 * base) div 100 = 49_999_999_999.
    // contrib(b) = (base*3) div 4 = 249_999_999_999 -> damped 212_499_999_999
    // contrib(c) =  base    div 4 =  83_333_333_333 -> damped  70_833_333_333
    val r = ranks(Seq(("a", "b", 3L), ("a", "c", 1L)), iters = 1)
    assert(r == Map(
      "a" -> 49999999999L,
      "b" -> 262499999998L,
      "c" -> 120833333332L))
  }

  test("parallel edges add their weights; non-positive weights drop") {
    // duplicate a->b rows act as one edge of weight 2 out of outw 4:
    // same split as the fan-out test's w=3/w=1 replaced by 2/2.
    val r = ranks(Seq(("a", "b", 1L), ("a", "b", 1L), ("a", "c", 2L),
      ("a", "c", 0L), ("a", "c", -5L)), iters = 1)
    // contrib each = (base*2) div 4 = 166_666_666_666 -> damped
    // (85 * 166_666_666_666) div 100 = 141_666_666_666
    assert(r("b") == 49999999999L + 141666666666L)
    assert(r("b") == r("c"))
  }

  test("total rank mass never exceeds scale and is conserved up to " +
    "truncation + dangling decay") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 4L),
      ("b", "a", 3L), ("d", "a", 1L)) // d is a source-only node
    for (it <- Seq(1, 3, 5)) {
      val total = ranks(edges, it).values.sum
      assert(total <= S && total > S / 2)
    }
  }

  test("checkpointEvery: a 30-iteration run is bit-identical to the lazy " +
    "plan, returns a single-leaf plan, and leaves only its own " +
    "checkpoint cached") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 4L),
      ("b", "a", 3L), ("d", "a", 1L), ("c", "d", 2L))
    val df = edges.toDF("src", "dst", "w")
    // integer-exactness means the checkpointed run must be BIT-equal —
    // any partitioning/lineage effect would show up here
    val lazyRanks = GraphAlgos.pageRank(df, "src", "dst", "w", iters = 30)
      .as[(String, Long)].collect().toMap
    spark.catalog.clearCache() // drop the lazy run's support caches
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val cpDf = GraphAlgos.pageRank(df, "src", "dst", "w", iters = 30,
      checkpointEvery = 5)
    val cpRanks = cpDf.as[(String, Long)].collect().toMap
    assert(cpRanks == lazyRanks)
    // plan depth bounded: after the final checkpoint the plan is one leaf
    assert(cpDf.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      s"plan not truncated:\n${cpDf.queryExecution.logical.treeString}")
    // lifecycle: the node/edge caches and every intermediate checkpoint
    // were released — at most the final checkpoint's RDD is new
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"cached frames left behind: ${leaked.size} new persistent RDDs")
  }

  // ---- connectedComponents: large-star/small-star ----

  private def cc(pairs: Seq[(Long, Long)], maxRounds: Int = 30) =
    GraphAlgos.connectedComponents(pairs.toDF("id_a", "id_b"), maxRounds)
      .as[(Long, Long)].collect().toMap

  test("connectedComponents: two components plus an isolated pair, " +
    "labels are component minima") {
    val got = cc(Seq((5L, 3L), (3L, 9L), (9L, 5L), (20L, 21L), (7L, 4L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 4L -> 4L, 7L -> 4L))
  }

  test("connectedComponents: 120-node path converges within the " +
    "logarithmic round budget (a min-label sweep would need ~120)") {
    val path = (0L until 119L).map(i => (i, i + 1))
    // log2(120) ≈ 7; star contraction has small constants — 12 rounds
    // is generous for the budget and far below the path's diameter
    val got = cc(path, maxRounds = 12)
    assert(got.size == 120 && got.values.forall(_ == 0L))
  }

  test("connectedComponents: matches minLabelClusters on a seeded " +
    "random graph (duplicate and reversed input pairs included)") {
    val rnd = new scala.util.Random(1313)
    val base = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    // inject duplicates and reversals: both entry points must canonicalize
    val pairs = base ++ base.take(40).map(_.swap) ++ base.take(20)
    val viaCc = cc(pairs)
    val viaSweep = graft.operators.TextDedup
      .minLabelClusters(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(viaCc == viaSweep)
  }

  test("connectedComponents: string ids order by UTF-8 bytes like the " +
    "distributed min, and a star input is already a fixpoint") {
    import org.apache.spark.sql.functions.col
    val pairs = Seq(("zz", "aa"), ("aa", "mm"), ("q1", "q2"))
      .toDF("id_a", "id_b")
    val got = GraphAlgos.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("aa" -> "aa", "mm" -> "aa", "zz" -> "aa",
      "q1" -> "q1", "q2" -> "q1"))
    // star input: one round to verify, nothing to contract
    val star = Seq((10L, 1L), (5L, 1L), (7L, 1L)).toDF("id_a", "id_b")
    val lbl = GraphAlgos.connectedComponents(star, maxRounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(lbl == Map(1L -> 1L, 5L -> 1L, 7L -> 1L, 10L -> 1L))
  }

  private val bridgedTriangles = Seq(
    ("a", "b", 10L), ("b", "c", 10L), ("a", "c", 10L),
    ("d", "e", 10L), ("e", "f", 10L), ("d", "f", 10L),
    ("c", "d", 1L))

  test("labelPropagation: two heavy triangles across a weak bridge " +
    "settle into two communities, deterministically") {
    val got = GraphAlgos.labelPropagation(
      bridgedTriangles.toDF("src", "dst", "w"), "src", "dst", "w", iters = 4)
      .as[(String, String)].collect().toMap
    // hand-rolled sync rounds (max weight, max-label ties): both
    // triangles collapse onto their max-id member by round 3
    assert(got == Map("a" -> "c", "b" -> "c", "c" -> "c",
      "d" -> "f", "e" -> "f", "f" -> "f"))
  }

  test("labelPropagation: partitioning-independent, and checkpointEvery " +
    "changes nothing but lineage") {
    val base = bridgedTriangles.toDF("src", "dst", "w")
    val a = GraphAlgos.labelPropagation(base, "src", "dst", "w", iters = 4)
      .as[(String, String)].collect().toMap
    val b = GraphAlgos.labelPropagation(base.repartition(7), "src", "dst",
      "w", iters = 4, checkpointEvery = 2)
      .as[(String, String)].collect().toMap
    assert(a == b)
  }

  test("triangleCounts: hand-built graph — one triangle, a pendant, an " +
    "isolated edge; hubs don't inflate counts") {
    // triangle a-b-c; pendant d off c; isolated edge e-f
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("c", "d", 1L), ("e", "f", 1L),
      ("a", "a", 9L), ("b", "a", 1L)) // self-loop + reverse dup: no effect
      .toDF("src", "dst", "w")
    val got = GraphAlgos.triangleCounts(edges, "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L,
      "e" -> 0L, "f" -> 0L))
  }

  test("triangleCounts: K4 has C(3,2)=3 per node and 4 total; " +
    "partitioning-independent") {
    val vs = Seq("p", "q", "r", "s")
    val k4 = (for { a <- vs; b <- vs if a < b } yield (a, b, 1L))
      .toDF("src", "dst", "w")
    val got = GraphAlgos.triangleCounts(k4.repartition(5), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(got == vs.map(_ -> 3L).toMap)
  }

  test("clusteringCoefficients: hand-computed non-clique graph — " +
    "partial neighborhoods, degree-1 zeros, truncating e6 grid") {
    // triangle a-b-c plus pendant d off a: deg a=3,b=2,c=2,d=1
    // cc(a) = 2*1*1e6 div (3*2) = 333333; cc(b)=cc(c)=1e6; cc(d)=0
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L),
      ("a", "d", 1L)).toDF("src", "dst", "w")
    val got = GraphAlgos.clusteringCoefficients(edges, "src", "dst")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "a" -> ((3L, 1L, 333333L)),
      "b" -> ((2L, 1L, 1000000L)),
      "c" -> ((2L, 1L, 1000000L)),
      "d" -> ((1L, 0L, 0L))))
  }

  test("personalized pageRank: mass concentrates at the seed; nodes " +
    "unreachable from it hold exactly zero (hand-computed 1 iteration)") {
    // s -> t (w=1); u -> s: u never receives anything (no in-edges from
    // the seed side), s holds teleport + u's pushed mass
    val edges = Seq(("s", "t", 1L), ("u", "s", 1L)).toDF("src", "dst", "w")
    val r1 = GraphAlgos.pageRank(edges, "src", "dst", "w", iters = 1,
      seedNode = Some("s")).as[(String, Long)].collect().toMap
    // r0: s=1e12, t=0, u=0. contrib: t += s's 1e12; s += u's 0.
    // r1(s) = 15e10 + 0; r1(t) = 0 + (85 * 1e12) div 100; r1(u) = 0.
    assert(r1 == Map("s" -> 150000000000L, "t" -> 850000000000L, "u" -> 0L))
    val r2 = GraphAlgos.pageRank(edges, "src", "dst", "w", iters = 2,
      seedNode = Some("s")).as[(String, Long)].collect().toMap
    // iter2: contrib(t) = r1(s) = 15e10 -> damped 1275e8; s gets u's 0
    assert(r2 == Map("s" -> 150000000000L, "t" -> 127500000000L, "u" -> 0L))
    intercept[IllegalArgumentException] {
      GraphAlgos.pageRank(edges, "src", "dst", "w", iters = 1,
        seedNode = Some("nope"))
    }
  }

  test("labelPropagation: self-loops and non-positive weights are " +
    "dropped; parallel + reverse edges sum") {
    // a<->b with two parallel halves (2+3) vs a-c with 4: b's label
    // wins at a (5 > 4); ties elsewhere resolve to max label
    val edges = Seq(("a", "b", 2L), ("b", "a", 3L), ("a", "c", 4L),
      ("a", "a", 99L), ("b", "c", 0L), ("c", "b", -1L))
      .toDF("src", "dst", "w")
    val got = GraphAlgos.labelPropagation(edges, "src", "dst", "w", iters = 1)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "b", "b" -> "a", "c" -> "a"))
  }

  private def harmonic(edges: Seq[(String, String)], iters: Int = 8) =
    GraphAlgos.harmonicCentrality(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("harmonicCentrality: hand-computed path a-b-c — the center is " +
    "most central; contributions are exact integer divisions") {
    val got = harmonic(Seq(("a", "b"), ("b", "c")))
    // b: two at distance 1 → 2_000_000; a,c: 1 + 1/2 → 1_500_000
    assert(got == Map("a" -> ((2L, 1500000L)), "b" -> ((2L, 2000000L)),
      "c" -> ((2L, 1500000L))))
  }

  test("harmonicCentrality: disconnected components never contribute — " +
    "well-defined where closeness is not; n_reachable counts only the " +
    "component") {
    val got = harmonic(Seq(("a", "b"), ("x", "y"), ("y", "z")))
    assert(got("a") == ((1L, 1000000L)))
    assert(got("y") == ((2L, 2000000L)))
    assert(got("x") == ((2L, 1500000L)))
  }

  test("harmonicCentrality: rounds below the diameter truncate the " +
    "horizon; at the diameter the fixpoint is exact and further rounds " +
    "change nothing (checkpointEvery bit-identical)") {
    val path = (0 until 6).map(i => (s"n$i", s"n${i + 1}")) // diameter 6
    val at2 = harmonic(path, iters = 2)
    // n0 at 2 rounds: sees n1 (1) and n2 (1/2) only
    assert(at2("n0") == ((2L, 1500000L)))
    val at6 = harmonic(path, iters = 6)
    assert(at6("n0") == ((6L,
      1000000L + 500000L + 333333L + 250000L + 200000L + 166666L)))
    assert(harmonic(path, iters = 9) == at6)
    val cp = GraphAlgos.harmonicCentrality(path.toDF("src", "dst"),
      "src", "dst", iters = 6, checkpointEvery = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cp == at6)
  }

  private def coreness(edges: Seq[(String, String)], iters: Int = 8) =
    GraphAlgos.kCoreness(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(String, Long)].collect().toMap

  test("kCoreness: K4 with a pendant tail — clique members sit in the " +
    "3-core, the attachment survives only the 1-core") {
    // K4 on a,b,c,d; tail d-e-f
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d")
      if x < y
    } yield (x, y)
    val got = coreness(k4 ++ Seq(("d", "e"), ("e", "f")))
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "e" -> 1L, "f" -> 1L))
  }

  test("kCoreness: a path is everywhere coreness 1 but needs one round " +
    "per layer from the ends (the H-iteration's worst case); a cycle " +
    "is everywhere 2 and a fixpoint from round 1") {
    val path = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    // 31 nodes: the center is 15 hops from an end — 8 rounds is NOT
    // enough (inner estimates stay 2), 16 is
    assert(coreness(path, iters = 8).values.toSet == Set(1L, 2L))
    assert(coreness(path, iters = 16).values.toSet == Set(1L))
    val cycle = (0 until 12).map(i => (f"c$i%02d", f"c${(i + 1) % 12}%02d"))
    assert(coreness(cycle, iters = 2).values.toSet == Set(2L))
  }

  test("kCoreness: matches the sequential min-degree peel on a seeded " +
    "random graph, and 8 rounds reach the fixpoint (round 8 == round 12)") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for (_ <- 0 until 160) yield {
      val a = rnd.nextInt(n); val b = rnd.nextInt(n)
      (f"v$a%02d", f"v$b%02d")
    }).filter { case (a, b) => a != b }.distinct
    // reference: textbook peel — repeatedly remove min-degree nodes
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var want = Map.empty[String, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val peel = adj.filter(_._2.size <= k).keySet
      if (peel.isEmpty) k += 1
      else {
        want = want ++ peel.map(_ -> k)
        adj = (adj -- peel).map { case (v, ns) => v -> (ns -- peel) }
      }
    }
    assert(coreness(edges, iters = 8) == want)
    assert(coreness(edges, iters = 12) == want)
  }

  test("kCoreness: 6 rounds reach the fixpoint on the real sf0.001 " +
    "near-dup graph (dd_kcoreness's round budget is not a truncation)") {
    val pairs = graft.operators.TextDedup.lengthBandedJaccardPairs(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", "n_chars", bucketWidth = 32, maxDelta = 32,
      minJaccardE4 = 5000L)
      .select("id_a", "id_b").localCheckpoint(true)
    val at6 = GraphAlgos.kCoreness(pairs, "id_a", "id_b", iters = 6)
      .as[(String, Long)].collect().toMap
    val at12 = GraphAlgos.kCoreness(pairs, "id_a", "id_b", iters = 12)
      .as[(String, Long)].collect().toMap
    assert(at6 == at12)
    assert(at6.nonEmpty)
  }

  test("kCoreness: checkpointEvery run is bit-identical, self-loops " +
    "and duplicate/reverse edge rows collapse") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
      ("b", "c"), ("c", "a"))
    val lazyRun = coreness(edges, iters = 6)
    val cpRun = GraphAlgos.kCoreness(edges.toDF("src", "dst"), "src", "dst",
      iters = 6, checkpointEvery = 2).as[(String, Long)].collect().toMap
    assert(lazyRun == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    assert(cpRun == lazyRun)
  }

  test("harmonicHyperBall: on a 400-node star (balls well above the " +
    "linear-counting cutover) the estimates land within the published " +
    "HLL error of the exact harmonic; output is partition-independent " +
    "and saturates bit-identically past the diameter") {
    // star: hub h — leaf li. Exact: hub sees 400 at d=1 -> 400e6;
    // each leaf sees 1 at d=1 + 399 at d=2 -> 1e6 + 199.5e6
    val edges = (0 until 400).map(i => ("h", s"l$i"))
    val df = edges.toDF("src", "dst")
    val got = GraphAlgos.harmonicHyperBall(df, "src", "dst",
      iters = 2, p = 6, checkpointEvery = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = GraphAlgos.harmonicCentrality(df, "src", "dst", iters = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // est_ball approximates the component size (401); harmonic within
    // ~2.7 sigma of the 1.04/sqrt(64)=13% HLL error at p=6. The small
    // round-0/round-1 balls sit in the raw estimator's biased low-
    // cardinality regime (the class doc's documented caller-side
    // correction zone), so the tolerance covers bias + sampling.
    def within(est: Long, truth: Long, tol: Double) =
      math.abs(est - truth) <= tol * truth
    assert(within(got("h")._1, 401L, 0.35), got("h"))
    assert(within(got("h")._2, exact("h")._2, 0.35), (got("h"), exact("h")))
    assert(within(got("l7")._1, 401L, 0.35), got("l7"))
    assert(within(got("l7")._2, exact("l7")._2, 0.45), (got("l7"), exact("l7")))
    // deterministic + partition-independent: bit-identical on a reshuffle
    val got7 = GraphAlgos.harmonicHyperBall(df.repartition(7), "src", "dst",
      iters = 2, p = 6, checkpointEvery = 2)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got7 == got)
    // past the diameter the registers are saturated: rounds add nothing
    val got4 = GraphAlgos.harmonicHyperBall(df, "src", "dst",
      iters = 4, p = 6)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got4 == got)
  }
}
