package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the [[graft.functions.HllRegisters]] sketch: the
  * claim under test is the SHUFFLE/STATE CONTRACT — a distinct count
  * whose aggregation state is 2^p bytes per group regardless of
  * cardinality, where exact count-distinct must move every distinct id
  * to its reducer (state and shuffle grow linearly with cardinality).
  *
  * Stream shape (deterministic, analytic truth): N rows over 8 groups,
  * id i → group pmod(i, 8), value i — every row distinct within its
  * group, so per-group cardinality is exactly N/8 and grows 10× with N.
  * This is the adversarial regime for exact distinct (no duplicates to
  * collapse map-side) and the natural one for the sketch.
  *
  * Records, at 1×, 10×, 100×:
  *  - sketch runtime vs exact count-distinct runtime (min of `reps`);
  *  - the sketch's per-group estimate error vs the exact truth (must
  *    stay inside 3σ = 3·1.04/√512 ≈ 13.8% at p=9 — accuracy does NOT
  *    degrade with scale, the registers just saturate deeper);
  *  - nnz ≤ m observed (the state bound, observed not assumed).
  *
  * The honest caveat the artifact records: at local[32] scale the
  * exact distinct also fits in memory, so runtime parity is expected —
  * the contract that matters at 100 TB is the 512-byte aggregation
  * buffer crossing the shuffle instead of the id stream, which is a
  * property of the plan (ObjectHashAggregate partial+final over a
  * fixed-width buffer), not of this host.
  *
  * Usage: runMain graft.HllProbe [N] [reps]
  */
object HllProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stream(rows: Long) = spark.range(rows).select(
      pmod(col("id"), lit(8)).cast("string").as("g"), col("id"))

    def time[T](f: => T): (Double, T) = {
      var best = Double.MaxValue
      var out: Option[T] = None
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        out = Some(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, out.get)
    }

    for (mult <- Seq(1L, 10L, 100L)) {
      val rows = n * mult
      val df = stream(rows)
      val (tSketch, sk) = time {
        df.select(col("g"), xxhash64(col("id")).as("h"))
          .groupBy(col("g"))
          .agg(graft.functions.HllRegisters.hllRegisters(col("h"), 9).as("sk"))
          .select(col("g"), col("sk.nnz"), col("sk.est_raw"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      }
      val (tExact, ex) = time {
        df.groupBy(col("g")).agg(countDistinct(col("id")).as("d"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
      }
      val exact = ex.toMap
      val errs = sk.map { case (g, nnz, est) =>
        require(nnz <= 512, s"state bound violated: nnz=$nnz")
        math.abs(est - exact(g)).toDouble / exact(g)
      }
      val maxErr = errs.max
      require(maxErr < 0.138,
        f"estimate left 3 sigma at ${rows}: $maxErr%.4f")
      println(f"[probe] hll rows=$rows%d perGroupDistinct=${rows / 8}%d " +
        f"sketch=$tSketch%.2fs exact=$tExact%.2fs maxErr=${maxErr * 100}%.2f%% " +
        f"maxNnz=${sk.map(_._2).max}%d")
    }
    spark.stop()
  }
}
