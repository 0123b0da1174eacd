package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the [[graft.functions.CmsCounters]] sketch: the
  * claim under test is the SHUFFLE/STATE CONTRACT — per-item frequency
  * estimation whose aggregation state is a fixed 8·d·w-byte grid per
  * group regardless of item cardinality, where the exact per-item
  * count must shuffle every distinct (group, item) pair.
  *
  * Stream shape (deterministic, analytic truth): N rows over 8 groups;
  * row i → group pmod(i, 8), item pmod(i, K·mult) with K scaling with
  * the stream — distinct items per group grow 10× per decade while
  * each item keeps ~N/(8·K) ≈ constant true frequency per group. The
  * heavy item 0 appears an extra N/64 times in group 0 so the probe
  * also checks a true heavy hitter's estimate.
  *
  * Records, at 1×, 10×, 100×:
  *  - sketch build runtime vs exact groupBy-item count runtime (min of
  *    `reps`);
  *  - the CMS guarantee observed: every probe estimate ≥ exact
  *    (REQUIRED — under-estimation is impossible by construction), and
  *    the observed max over-estimate printed next to the paper's
  *    per-query 2n/w bound (w=2048). The bound holds per query with
  *    probability 1−2^−d ≈ 94%, so the MAX over tens of thousands of
  *    probes legitimately lands a small factor above it — the record
  *    shows the tail, it does not assert the per-query bound on it;
  *  - grid nnz ≤ d·w (the state bound, observed not assumed).
  *
  * Same honest caveat as [[HllProbe]]: at local[32] the exact path
  * also fits in memory; the 100 TB contract is the fixed-width grid
  * crossing the shuffle instead of the (group, item) stream — a plan
  * property (ObjectHashAggregate partial+final), not a host one.
  *
  * Usage: runMain graft.CmsProbe [N] [reps]
  */
object CmsProbe {
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

    val d = 4
    val logW = 11 // w = 2048
    val w = 1 << logW

    def stream(rows: Long, items: Long) = spark.range(rows).select(
      pmod(col("id"), lit(8)).cast("string").as("g"),
      when(pmod(col("id"), lit(64)) === 0, lit(0L))
        .otherwise(pmod(col("id"), lit(items))).as("item"))

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
      val items = 1000L * mult // distinct items grow with the stream
      val df = stream(rows, items)
      val (tSketch, grid) = time {
        df.select(col("g"), xxhash64(col("item")).as("h"))
          .groupBy(col("g"))
          .agg(graft.functions.CmsCounters
            .cmsCounters(col("h"), d, logW).as("sk"))
          .select(col("g"), col("sk.n_total"),
            explode(col("sk.counters")).as("c"))
          .select(col("g"), col("n_total"), col("c.row").as("r"),
            col("c.idx").as("i"), col("c.cnt").as("cnt"))
          .collect()
          .map(x => ((x.getString(0), x.getInt(2), x.getInt(3)),
            (x.getLong(1), x.getLong(4))))
      }
      val (tExact, exact) = time {
        df.groupBy(col("g"), col("item")).agg(count(lit(1)).as("n"))
          .collect()
          .map(x => ((x.getString(0), x.getLong(1)), x.getLong(2)))
      }
      val cells = grid.map { case (k, (_, cnt)) => k -> cnt }.toMap
      val nTotal = grid.map { case ((g, _, _), (nt, _)) => g -> nt }.toMap
      require(grid.length <= 8 * d * w, "state bound violated")
      // probe every exact (g, item): estimate >= exact, over <= 2n/w
      val hashes = spark.range(items).select(col("id"),
        xxhash64(col("id")).as("h")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      var maxOver = 0L
      exact.foreach { case ((g, item), truth) =>
        val h = hashes(item)
        val a = h >>> 32
        val b = (h & 0xffffffffL) | 1L
        val est = (0 until d).map(i =>
          cells.getOrElse((g, i, ((a + i * b) & (w - 1)).toInt), 0L)).min
        require(est >= truth, s"under-estimate for ($g, $item)")
        maxOver = math.max(maxOver, est - truth)
      }
      val bound = 2L * nTotal.values.max / w
      println(f"[probe] cms rows=$rows%d itemsPerGroup=${items / 8}%d " +
        f"sketch=$tSketch%.2fs exact=$tExact%.2fs " +
        f"maxOver=$maxOver%d bound2nw=$bound%d " +
        f"gridCells=${grid.length}%d cap=${8 * d * w}%d")
    }
    spark.stop()
  }
}
