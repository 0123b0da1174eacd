package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-13 iterative graph operators
  * ([[graft.operators.GraphAlgos.kCoreness]] and
  * [[graft.operators.GraphAlgos.harmonicCentrality]]): measured runtime
  * exponent across three decades of edge count on a synthetic
  * power-law-ish graph (hub-heavy, like real transition/near-dup
  * graphs).
  *
  * The claims under test, matched to each operator's documented scale
  * contract:
  *  - k-coreness rounds are |E|-bounded equi-join + window work with
  *    |V|-row state — nodes AND edges grow a decade per tier, and the
  *    measured decade-over-decade exponent should stay ≲ linear;
  *  - harmonic centrality runs on SMALL-|V| quotient graphs fed by
  *    arbitrarily large raw inputs (ev_harmonic: 1.9M events → 5 event
  *    types) — so its tiers grow the RAW edge rows a decade at a time
  *    over a FIXED 2,000-node domain, pinning that cost tracks the one
  *    |E_raw| dedup scan plus bounded-size rounds, never |V|².
  *
  * Usage: runMain graft.GraphProbe   Prints one JSON line per decade;
  * recorded in BASELINE.md.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(mk: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val c = mk().count()
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        ((System.nanoTime() - t0) / 1e9, c)
      }
      once() // warm
      val (t1, c) = once(); val (t2, _) = once()
      (math.min(t1, t2), c)
    }

    // deterministic hub-heavy edges (no RNG): src zipf-ish via the
    // squared-id band, dst uniform via a Knuth-multiplier walk
    def writeEdges(dir: String, nEdges: Long, srcDom: Long,
        dstDom: Long): org.apache.spark.sql.DataFrame = {
      spark.range(nEdges).selectExpr(
        s"concat('n', (id * id) % $srcDom) AS src",
        s"concat('n', (id * 2654435761) % $dstDom) AS dst")
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }

    def tier(name: String, nEdges: Long): String = {
      val nNodes = nEdges / 8 // k-core graph grows with the tier
      val core = writeEdges(s"/root/repo/target/graphprobe_c_$name",
        nEdges, nNodes / 16, nNodes)
      // harmonic quotient graph: FIXED 2k-node domain, growing raw rows
      val quot = writeEdges(s"/root/repo/target/graphprobe_h_$name",
        nEdges, 2000L, 2000L)
      val (tCore, nCore) = timed(() => graft.operators.GraphAlgos
        .kCoreness(core, "src", "dst", iters = 6))
      val (tHarm, nHarm) = timed(() => graft.operators.GraphAlgos
        .harmonicCentrality(quot, "src", "dst", iters = 4))
      s"""{"tier":"$name","edges":$nEdges,"kcore_nodes":$nCore,""" +
        f""""kcore_sec":$tCore%.2f,"harmonic_sec":$tHarm%.2f,""" +
        s""""harmonic_nodes":$nHarm}"""
    }

    println(tier("e100k", 100000L))
    println(tier("e1m", 1000000L))
    println(tier("e10m", 10000000L))

    // HUB TIER: one node owns 30% of all edges — the shape that made
    // the old row_number k-coreness pay an O(d log d) single-task sort
    // per round on the hub's neighbor list. The histogram H-index form
    // ships only the hub's distinct-estimate histogram through the
    // exchange, so hub_sec should track the SAME-|E| uniform tier
    // (ratio ~1x), not blow up on the last reducer.
    def hubTier(name: String, nEdges: Long): String = {
      val nNodes = nEdges / 8
      val dir = s"/root/repo/target/graphprobe_hub_$name"
      spark.range(nEdges).selectExpr(
        s"CASE WHEN id % 10 < 3 THEN 'hub' " +
          s"ELSE concat('n', (id * id) % ${nNodes / 16}) END AS src",
        s"concat('n', (id * 2654435761) % $nNodes) AS dst")
        .write.mode("overwrite").parquet(dir)
      val hub = spark.read.parquet(dir)
      val (tHub, nHub) = timed(() => graft.operators.GraphAlgos
        .kCoreness(hub, "src", "dst", iters = 6))
      s"""{"tier":"$name","edges":$nEdges,"kcore_nodes":$nHub,""" +
        f""""kcore_hub_sec":$tHub%.2f}"""
    }
    println(hubTier("hub1m", 1000000L))
    println(hubTier("hub10m", 10000000L))

    // HYPERBALL TIER: approximate harmonic centrality on ONE giant
    // component whose exact APSP pairs table cannot exist (|V|² pairs:
    // 1.6e10 rows at the first tier, 1.6e12 at the second — the exact
    // form's state). HyperBall state is |V|·2^p bytes (8 MB / 80 MB at
    // p=6); each round is one join + one register-max re-merge, so the
    // decade-over-decade cost should track |E|, not |V|².
    def hyperballTier(name: String, nEdges: Long): String = {
      val nNodes = nEdges / 8
      val dir = s"/root/repo/target/graphprobe_b_$name"
      // ring backbone (id % nNodes covers every node) + Knuth-walk
      // chords: one giant component, deterministically
      spark.range(nEdges).selectExpr(
        s"concat('n', id % $nNodes) AS src",
        s"concat('n', (id * 2654435761) % $nNodes) AS dst")
        .write.mode("overwrite").parquet(dir)
      val g = spark.read.parquet(dir)
      val (tHb, nHb) = timed(() => graft.operators.GraphAlgos
        .harmonicHyperBall(g, "src", "dst", iters = 3, p = 6,
          checkpointEvery = 1))
      s"""{"tier":"$name","edges":$nEdges,"hyperball_nodes":$nHb,""" +
        f""""hyperball_sec":$tHb%.2f,""" +
        s""""exact_pairs_would_be":${nHb * nHb}}"""
    }
    println(hyperballTier("b1m", 1000000L))
    println(hyperballTier("b10m", 10000000L))
    spark.stop()
  }
}
