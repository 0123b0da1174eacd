package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key dedup probe (round-9 verdict #6): one id owns ~30% of a
  * day's rows — the poison layout for the window-form keep-set dedup,
  * whose per-hash-partition sort serializes the hot key into one task.
  * Times [[graft.operators.Dedup.keepLatest]] (window) against
  * [[graft.operators.Dedup.keepLatestForSkew]] (hash-aggregate winners
  * + left-semi join back) on the same skewed frame and verifies both
  * keep the same row count.
  *
  * What the executed plans show (and this probe asserts structurally):
  * the join form is skew-immune WITHOUT any AQE skew splitting, for two
  * stacked reasons.
  *
  *  - The winners aggregate partially aggregates map-side, so the hot
  *    GROUP ships one pre-combined row per map partition.
  *  - The semi join's equi-keys are (id-nullsafe, version): Catalyst
  *    folds the `orderKey === __max_order_key` equality INTO the join
  *    hash, so the hot id's rows spread over the whole version domain
  *    in the shuffle — the skewed partition the window form serializes
  *    on never exists in the join form. (AQE's skew splitter stays
  *    idle because there is nothing to split; on the narrow tier AQE
  *    instead converts the join-back to a runtime broadcast.)
  *
  * Two tiers: `narrow` (few distinct ids — winner set broadcasts,
  * window form competitive because the hot partition is small) and
  * `wide` (millions of ids, the 100 TB shape — sort-merge on the
  * diffused keys, window form pays the single-task hot sort).
  *
  * Usage: runMain graft.SkewProbe   Prints one JSON line per tier;
  * recorded in BASELINE.md.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tier(name: String, n: Long, nIds: Long): String = {
      val hot = n * 3 / 10
      val dir = s"/root/repo/target/skewprobe_$name"
      spark.range(n).selectExpr(
        s"CASE WHEN id < $hot THEN 'hot-id' ELSE concat('id-', id % $nIds) END AS id",
        "id AS version",
        "CAST(date_add('2024-01-01', 0) AS DATE) AS date")
        .write.mode("overwrite").parquet(dir)
      val day = spark.read.parquet(dir)

      def timed(mk: () => DataFrame): (Double, Long, String) = {
        def once(): (Double, Long) = {
          val d = mk()
          val t0 = System.nanoTime()
          val c = d.count()
          ((System.nanoTime() - t0) / 1e9, c)
        }
        once() // warm
        val rs = (1 to 3).map(_ => once())
        require(rs.map(_._2).distinct.size == 1)
        // count() executes a derived plan, so the frame's own
        // AdaptiveSparkPlan never finalizes — drive THIS frame's
        // execution through toRdd to read the post-AQE plan (runtime
        // broadcast conversions only exist there)
        val d = mk()
        d.queryExecution.toRdd.count(): Unit
        (rs.map(_._1).min, rs.head._2, d.queryExecution.executedPlan.toString)
      }

      val (tWin, nWin, _) = timed(() =>
        graft.operators.Dedup.keepLatest(day, Seq("id"), col("version")))
      val (tSkew, nSkew, planSkew) = timed(() =>
        graft.operators.Dedup.keepLatestForSkew(day, Seq("id"), col("version")))
      require(nWin == nSkew, s"semantics diverged: $nWin vs $nSkew")
      val strategy =
        if (planSkew.contains("BroadcastHashJoin")) "broadcast"
        else if (planSkew.contains("SortMergeJoin")) "sortmerge"
        else "other"
      // the structural skew immunity: version must ride the join hash
      val diffused = strategy == "broadcast" ||
        "SortMergeJoin \\[[^\\]]*version".r.findFirstIn(planSkew).nonEmpty

      f"""{"metric":"skew","tier":"$name","rows":$n,"distinct_ids":$nIds,""" +
        f""""hot_share":0.3,"survivors":$nWin,""" +
        f""""window_sec":$tWin%.2f,"skewjoin_sec":$tSkew%.2f,""" +
        f""""ratio":${tWin / tSkew}%.2f,"join":"$strategy",""" +
        f""""hot_key_diffused":$diffused}"""
    }

    val narrow = tier("narrow", 4000000L, 100000L)
    val wide = tier("wide", 24000000L, 6000000L)
    println(narrow)
    println(wide)
    spark.stop()
  }
}
