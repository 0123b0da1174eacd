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
    spark.stop()
  }
}
