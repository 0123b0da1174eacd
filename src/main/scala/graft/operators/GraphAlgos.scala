package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph computations over edge DataFrames — the piece a
  * training-data pipeline needs the moment it treats its corpus as a
  * graph: host/domain quality ranking (Common Crawl pipelines weight
  * documents by host-graph PageRank), event-type importance over the
  * user-journey transition matrix, and citation/link authority for
  * curation mixtures. Edge-relation power iteration, not a vertex-
  * program framework: at 100 TB the edge list is a table and each
  * iteration is one join + one aggregate — exactly the shape Catalyst
  * and AQE already know how to partition, skew-split, and spill.
  */
object GraphAlgos {

  /** Weighted PageRank by integer-exact power iteration (Page et al.
    * 1999, "The PageRank Citation Ranking"), damping d = `dampE2`/100:
    *
    *   rank₀(v)    = scale div N
    *   rankₖ₊₁(v)  = ((100−d)·(scale div N)) div 100
    *               + (d · Σ_{u→v} (rankₖ(u)·w(u→v)) div outw(u)) div 100
    *
    * ALL arithmetic is 64-bit integer (ranks live on a fixed-point
    * `scale` grid, default 10¹²) with truncating division — the same
    * value in any engine at any partitioning, because integer sums are
    * order-independent while float sums are not. The truncation drops
    * at most ~|E|/scale of total mass per iteration: at the default
    * scale that is a 10⁻¹² relative error per edge — far below float64
    * accumulation noise — in exchange for bit-exact reproducibility
    * (the property every other oracled operator here builds on).
    *
    * Semantics: dangling nodes (no out-edges) keep receiving rank but
    * redistribute none — their mass decays to teleport, the standard
    * "remove dangling mass" simplification; nodes with no in-edges hold
    * exactly the teleport term. Ranks therefore sum to ≤ `scale`.
    *
    * Scale shape: state is ONE |V|-row frame; each iteration is an
    * equi-join of ranks onto the edge list (shuffle keyed by src — or a
    * broadcast when |V| is small, AQE's call) followed by a map-side-
    * combined sum keyed by dst, then a left join back onto the node set
    * so zero-indegree nodes survive. The edge list (with its
    * pre-computed out-weight) and the node set are persisted once and
    * re-read by every iteration instead of being re-derived. N itself
    * is one scalar aggregate, never a row collect.
    *
    * Lifecycle: with `checkpointEvery` = 0 (default) the result is a
    * LAZY frame whose plan nests all `iters` iterations and whose two
    * support frames stay cached — fine for the oracled few-iteration
    * query shape, and the caller controls evaluation. With
    * `checkpointEvery` = k > 0 the ranks are eagerly local-checkpointed
    * every k iterations (lineage truncated, so analysis cost and plan
    * depth stay O(k) instead of O(iters)), each checkpoint's blocks are
    * released as soon as the next one is materialized, and on return
    * the node/edge caches and every intermediate checkpoint are
    * unpersisted — the ONLY retained storage is the final result's own
    * checkpoint blocks, and the returned plan is a single leaf. This is
    * the production knob for dozens-of-iterations runs on big graphs
    * (convergence for ranking use is typically ≤ a few dozen); local
    * checkpoints live in executor storage, so a cluster run that must
    * survive executor loss should still write ranks to a table between
    * restarts.
    *
    * Overflow: rankₖ ≤ scale, so the hottest product rankₖ·w needs
    * scale · max(w) < 2⁶³ — the default 10¹² supports edge weights to
    * ~9.2·10⁶. Heavier multigraph counts: lower `scale` or pre-bucket
    * weights. Spark 4's ANSI mode turns any miss into a loud
    * ARITHMETIC_OVERFLOW rather than a silent wrap.
    *
    * @param edges one row per directed edge; (srcCol, dstCol) need not
    *        be distinct (parallel edges just add their weights)
    * @param wCol positive integral edge weight (rows with w ≤ 0 are
    *        dropped; a count column from an upstream aggregate is the
    *        typical input)
    * @return (node, rank) — rank on the `scale` fixed-point grid
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int, scale: Long = 1000000000000L,
      dampE2: Int = 85, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampE2 >= 0 && dampE2 <= 100, "dampE2 is a percentage")
    require(scale > 0, "scale must be positive")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")

    val e = edges.select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"),
        col(wCol).cast("long").as("__w"))
      .filter(col("__w") > 0L)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One scalar per run — the teleport denominator, not a row collect.
    val n = nodes.count()
    require(n > 0, "graph has no edges with positive weight")
    val base = scale / n
    val teleport = ((100L - dampE2) * base) / 100L

    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__outw"))
    val edgesN = e.join(outw, "__src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // release a local checkpoint's storage once it is no longer the
    // live seed — lineage is truncated, so an unpersisted checkpoint is
    // unrecoverable by design; callers only ever hold the final one
    def releaseCheckpoint(df: DataFrame): Unit = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false); ()
      case _ => ()
    }

    var ranks = nodes.select(col("node"), lit(base).as("rank"))
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contrib = ranks
        .join(edgesN, ranks("node") === edgesN("__src"))
        .select(col("__dst").as("node"),
          expr("(rank * __w) div __outw").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampE2 * coalesce(__s, 0L)) div 100")).as("rank"))
      if (checkpointEvery > 0 &&
        (i % checkpointEvery == 0 || i == iters)) {
        // eager: materializes the k iterations since the previous
        // checkpoint (no recomputation — the seed's blocks are live),
        // then the previous checkpoint's blocks can go
        val cp = ranks.localCheckpoint(true)
        lastCp.foreach(releaseCheckpoint)
        lastCp = Some(cp)
        ranks = cp
      }
    }
    if (checkpointEvery > 0) {
      // the result is materialized in its own checkpoint blocks: the
      // support caches are dead weight from here on
      nodes.unpersist(false)
      edgesN.unpersist(false)
    }
    ranks
  }
}
