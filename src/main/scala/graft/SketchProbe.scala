package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the [[graft.functions.FrequentItems]] sketch: the
  * claim under test is the MEMORY CONTRACT — at most `capacity`
  * counters per buffer regardless of stream cardinality — and that the
  * certified error interval plus guaranteed-presence threshold hold on
  * a stream whose distinct count is far beyond capacity.
  *
  * Stream shape (deterministic, analytic truth): 3 of every 4 rows
  * draw from 24 hot tokens (`pmod(id, 32)` restricted to ids ≢ 0 mod 4
  * — the 24 residues not divisible by 4, 625 k hits each at 20 M
  * rows), 1 of 4 is a singleton — so at N rows there are ≈ N/4 + 24
  * distinct items. Capacity 256 ≪ distinct, the regime an exact
  * groupBy cannot bound.
  *
  * Checks, at 1× and 10×:
  *  - output ≤ capacity rows (the bound, observed not assumed);
  *  - every hot token retained with its interval bracketing the exact
  *    count (computed by groupBy on the same frame);
  *  - runtime of sketch vs exact groupBy+top — the sketch's advantage
  *    is MEMORY, not time; the probe records both so the artifact says
  *    what is and is not claimed.
  *
  * Usage: runMain graft.SketchProbe [N] [reps]
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stream(rows: Long) = spark.range(rows).select(
      when(col("id") % 4 =!= 0, concat(lit("hot"), pmod(col("id"), lit(32))))
        .otherwise(concat(lit("rare"), col("id"))).as("item"))

    def time(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var out = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        out = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, out)
    }

    Seq(n, n * 10).foreach { rows =>
      val df = stream(rows)
      val capacity = 256
      val (tSketch, kept) = time {
        df.agg(graft.functions.FrequentItems.frequentItems(col("item"), capacity).as("fi"))
          .select(explode(col("fi")).as("e"))
          .select("e.item", "e.cnt_lo", "e.cnt_hi").count()
      }
      val (tExact, _) = time {
        df.groupBy("item").count().orderBy(col("count").desc).limit(capacity).count()
      }
      // correctness of the guarantees on this run
      val out = df.agg(graft.functions.FrequentItems
          .frequentItems(col("item"), capacity).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select(col("e.item"), col("e.cnt_lo"), col("e.cnt_hi"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val truth = df.filter(col("item").startsWith("hot"))
        .groupBy("item").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val hotOk = truth.forall { case (t, c) =>
        out.exists(e => e._1 == t && e._2 <= c && c <= e._3)
      }
      val boundOk = out.length <= capacity
      println(f"rows=$rows%d distinct≈${rows / 4 + 24}%d kept=$kept%d " +
        f"sketch=${tSketch}%.2fs exactTop=${tExact}%.2fs " +
        f"hot_bracketed=$hotOk bound_held=$boundOk")
      require(hotOk && boundOk, "sketch guarantee violated")
    }
    spark.stop()
  }
}
