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

  /** Gates for the driver fast paths of the small-quotient-graph
    * centrality operators (harmonicCentrality, hyperBallState): under
    * these bounds the per-round driver work is O((V+E)·state) — trivial
    * — while the distributed form pays `iters` rounds of join + agg +
    * persist jobs to move a few hundred rows. Above them the
    * distributed path runs unchanged (the 100 TB shape).
    *
    * LAZINESS CONTRACT (applies to every operator with a
    * `localEdgeThreshold` parameter, and to [[connectedComponents]]'
    * convergence loop at any size): construction is EAGER — declaring
    * or composing the query runs the gate's edge count, and under the
    * gate the collect + driver compute, before any action on the
    * returned frame. Plan capture of the fast path therefore shows a
    * LocalTableScan/LogicalRDD leaf (PlanDump documents the same).
    * Pass `localEdgeThreshold = 0` to force the distributed plan.
    */
  private val smallGraphEdgeLimit = 1L << 16
  private val smallGraphNodeLimit = 1 << 11

  /** Release a local checkpoint's storage once it is no longer the live
    * seed — lineage is truncated, so an unpersisted checkpoint is
    * unrecoverable by design; callers only ever hold the final one.
    */
  private def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false); ()
      case _ => ()
    }

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
      dampE2: Int = 85, checkpointEvery: Int = 0,
      seedNode: Option[String] = None): DataFrame = {
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
    // PERSONALIZED variant (Page et al. §6 / Haveliwala 2002): with a
    // seed, both the initial mass and the teleport term concentrate on
    // the seed node — ranks become proximity-to-seed scores, the
    // "journeys reachable from purchase" weighting. Same integer grid,
    // same iteration shape; only the two distribution vectors change.
    seedNode.foreach { s =>
      require(nodes.filter(col("node") === s).count() == 1L,
        s"seed node '$s' is not in the graph")
    }
    val base = scale / n
    val teleport = ((100L - dampE2) * base) / 100L

    val outw = e.groupBy(col("__src")).agg(sum(col("__w")).as("__outw"))
    val edgesN = e.join(outw, "__src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    def releaseCheckpoint(df: DataFrame): Unit =
      GraphAlgos.releaseLocalCheckpoint(df)

    def baseCol = seedNode match {
      case Some(s) => when(col("node") === s, lit(scale)).otherwise(lit(0L))
      case None => lit(base)
    }
    def teleportCol = seedNode match {
      case Some(s) =>
        when(col("node") === s,
          lit(((100L - dampE2) * scale) / 100L)).otherwise(lit(0L))
      case None => lit(teleport)
    }
    var ranks = nodes.select(col("node"), baseCol.as("rank"))
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val contrib = ranks
        .join(edgesN, ranks("node") === edgesN("__src"))
        .select(col("__dst").as("node"),
          expr("(rank * __w) div __outw").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (teleportCol +
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

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond"): every node labeled with its component's MINIMUM id —
    * the same output contract as [[TextDedup.minLabelClusters]], but
    * converging in O(log n) rounds instead of O(diameter) sweeps. At
    * 100 TB the difference is the whole ballgame: near-dup clusters of
    * chain-shaped similarity (doc A ~ B ~ C ~ ... through sliding
    * boilerplate) have diameter proportional to cluster SIZE, so a
    * label-propagation sweep does thousands of shuffle rounds where
    * star-contraction does ~40 for 2⁴⁰ nodes.
    *
    * Round k: large-star points every node's LARGER neighbors at the
    * minimum of its closed neighborhood (one symmetrize-explode + one
    * map-side-combined min + one join), then small-star re-points each
    * child's parent set at the overall min (one min + one join). Both
    * halves preserve connectivity and strictly shrink a potential
    * function, so the edge set reaches a fixpoint: a forest of stars
    * (child → component-min). Convergence is tested EXACTLY — equal
    * cardinality plus an empty anti-join — never by a hash signature
    * that could terminate early on a collision.
    *
    * Output rows cover exactly the nodes that appear in `pairs` —
    * singleton documents never enter the pair graph, matching
    * [[TextDedup.minLabelClusters]]. The returned frame is small
    * (one row per clustered node) and fully materialized by the
    * convergence loop's final comparison.
    *
    * @param pairs (id_a, id_b) rows, any orderable id type; need not
    *        be distinct or oriented
    * @param maxRounds star-contraction rounds before giving up —
    *        components of 2^maxRounds nodes converge comfortably
    *        (the bound is logarithmic with small constants)
    * @return (id, label) — label = min id of the node's component. The
    *         frame is an eager local checkpoint (single-leaf plan, own
    *         storage blocks); long-lived callers release it with
    *         `spark.catalog.clearCache()` when done.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 30,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = pairs.sparkSession
    // Lineage discipline: every round's edge set is an EAGER local
    // checkpoint. Each round consumes the previous set at least three
    // times (symmetrize, re-point join, fixpoint anti-join), so a lazy
    // plan would double in size per reuse — exponential tree growth that
    // overflows plan analysis within ~10 rounds. Checkpointing makes
    // each round's plan O(1) deep and the convergence counts free
    // (the blocks are already materialized). Previous rounds' blocks
    // are released as soon as they stop being the live seed — the same
    // contract as [[pageRank]]'s checkpointEvery.
    //
    // Orient the input once: (child = max, parent = min), no self
    // loops; both star phases maintain this orientation, so the
    // fixpoint comparison is over canonical directed edges.
    var edges = pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("c"),
        least(col("id_a"), col("id_b")).as("p"))
      .distinct()
      .localCheckpoint(true)
    // Hybrid fast path (the [[TextDedup.minLabelClusters]] precedent,
    // VERDICT-audited): under the same edge threshold the oriented edge
    // set — already materialized by the checkpoint above — collects to
    // the driver and a union-find labels every node with its component
    // min in one pass, instead of ~O(log n) star-contraction rounds of
    // 4 jobs each (round-16 listener audit: 39 jobs / dd_cluster_cc).
    // Identical output contract: same (id, label) rows, same types
    // (integral ids round-trip through Long and cast back; strings
    // compare by UTF-8 bytes to match Spark's min). Above the
    // threshold — the 100 TB path — nothing changes.
    val idType = edges.schema.fields.head.dataType
    val localizable = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.StringType).contains(idType)
    if (localEdgeThreshold > 0 && localizable && edges.count() <= localEdgeThreshold) {
      import spark.implicits._
      val out =
        if (idType == org.apache.spark.sql.types.StringType) {
          val es = edges.as[(String, String)].collect()
          implicit val utf8Order: Ordering[String] =
            (a: String, b: String) =>
              org.apache.spark.unsafe.types.UTF8String.fromString(a)
                .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
          TextDedup.unionFindMinLabel(es).toDF("id", "label")
        } else {
          val es = edges.select(col("c").cast("long"), col("p").cast("long"))
            .as[(Long, Long)].collect()
          TextDedup.unionFindMinLabel(es).toDF("id", "label")
            .select(col("id").cast(idType), col("label").cast(idType))
        }
      // same return contract as the distributed path: an eager local
      // checkpoint with single-leaf lineage and its own storage
      val cp = out.localCheckpoint(true)
      releaseLocalCheckpoint(edges)
      return cp
    }
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // ---- large-star: for each node u, m = min(Γ(u) ∪ {u}); emit
      //      (v, m) for every neighbor v > u. Every edge is emitted by
      //      its smaller endpoint, so no adjacency is lost; outputs stay
      //      (bigger, smaller)-oriented because m ≤ u < v.
      val sym = edges.select(explode(array(
          struct(col("c").as("u"), col("p").as("v")),
          struct(col("p").as("u"), col("c").as("v")))).as("e"))
        .select(col("e.u"), col("e.v"))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      // checkpointed: consumed twice below (per-child min + re-point
      // join) — lazily the whole large-star chain would run twice
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("c"), col("m").as("p"))
        .distinct()
        .localCheckpoint(true)
      // ---- small-star: per child c over its parent set P(c) (all < c),
      //      m = min(P(c)); re-point c and every non-min parent at m.
      val pmins = ls.groupBy("c").agg(min(col("p")).as("m"))
      val next = ls.join(pmins, "c")
        .select(explode(array(
          struct(col("c").as("c2"), col("m").as("p2")),
          struct(col("p").as("c2"), col("m").as("p2")))).as("e"))
        .select(col("e.c2").as("c"), col("e.p2").as("p"))
        .filter(col("c") =!= col("p"))
        .distinct()
        .localCheckpoint(true)
      // exact fixpoint test: |next| == |edges| AND next \ edges = ∅ —
      // never a hash signature that could converge early on a collision
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("c", "p"), "left_anti").isEmpty
      releaseLocalCheckpoint(ls)
      releaseLocalCheckpoint(edges)
      edges = next
      round += 1
    }
    if (!converged)
      System.err.println(s"[connectedComponents] WARNING: not converged " +
        s"after $maxRounds rounds — labels are an upper bound, not minima")
    // at the fixpoint every non-min node points DIRECTLY at its
    // component min; the mins label themselves
    val labels = edges.select(col("c").as("id"), col("p").as("label"))
      .union(edges.select(col("p").as("id"), col("p").as("label")).distinct())
      .distinct()
      .localCheckpoint(true)
    releaseLocalCheckpoint(edges)
    labels
  }

  /** Community detection by SYNCHRONOUS weighted label propagation
    * (Raghavan et al. 2007, "Near linear time algorithm to detect
    * community structures in large-scale networks"), made fully
    * deterministic: labels start as the node's own id, every iteration
    * replaces each node's label with the label carrying the MAXIMUM
    * incident edge weight among its neighbors' current labels — ties
    * broken toward the LEXICOGRAPHICALLY LARGEST label (one struct-max,
    * no random visit order, no random tie coin: the published
    * algorithm's two nondeterminism sources are exactly what a
    * reproducible pipeline and a cross-engine oracle cannot admit).
    * Synchronous update (all nodes flip on the frozen previous round)
    * rather than the paper's asynchronous sweep, for the same reason.
    *
    * Edges are treated as UNDIRECTED: each input row (src, dst, w)
    * contributes w to both endpoints' views; parallel edges sum.
    * Isolated semantics: a node with no neighbors keeps its own id as
    * label (cannot happen on edge-derived node sets, kept total via
    * the left join).
    *
    * Scale shape: state is ONE |V|-row (node, label) frame. Each
    * iteration is label-onto-edges equi-join (keyed by the neighbor
    * endpoint — broadcast when |V| small, AQE's call), a map-side-
    * combined sum keyed by (node, label), a struct-max keyed by node,
    * and a left join back onto the node set. The symmetrized weighted
    * edge list is persisted once. Same lineage/checkpoint contract as
    * [[pageRank]]: `checkpointEvery` = k > 0 bounds plan depth and
    * releases support caches; 0 leaves them cached for inspection.
    *
    * Output: (node, label) strings. Fixed `iters` (no convergence test)
    * so the result is a pure function of the input — unrollable by any
    * SQL oracle.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iters: Int, checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")

    val e = edges.select(col(srcCol).cast("string").as("__src"),
        col(dstCol).cast("string").as("__dst"),
        col(wCol).cast("long").as("__w"))
      .filter(col("__w") > 0L && col("__src") =!= col("__dst"))
    // symmetrize + merge parallel edges once; every iteration re-reads
    val und = e.select(explode(array(
        struct(col("__src").as("a"), col("__dst").as("b"), col("__w").as("w")),
        struct(col("__dst").as("a"), col("__src").as("b"), col("__w").as("w")))).as("e"))
      .select(col("e.a"), col("e.b"), col("e.w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = und.select(col("a").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col("node"), col("node").as("label"))
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      // neighbor b's label flows to a with weight w(a,b)
      val scores = und.join(labels, und("b") === labels("node"))
        .groupBy(col("a"), col("label")).agg(sum(col("w")).as("__lw"))
      val winners = scores
        .groupBy(col("a"))
        .agg(max(struct(col("__lw"), col("label"))).as("__win"))
        .select(col("a").as("node"), col("__win.label").as("__new"))
      // coalesce arm is provably dead on edge-derived node sets (every
      // node has ≥ 1 neighbor) but keeps the operator total; falling
      // back to the node's OWN id (= its initial label) instead of the
      // previous round's label keeps `labels` single-consumption per
      // iteration — linear lineage, not doubling
      labels = nodes.join(winners, Seq("node"), "left")
        .select(col("node"), coalesce(col("__new"), col("node")).as("label"))
      if (checkpointEvery > 0 &&
        (i % checkpointEvery == 0 || i == iters)) {
        val cp = labels.localCheckpoint(true)
        lastCp.foreach(releaseLocalCheckpoint)
        lastCp = Some(cp)
        labels = cp
      }
    }
    if (checkpointEvery > 0) {
      und.unpersist(false)
      nodes.unpersist(false)
    }
    labels
  }

  /** Exact per-node triangle counts by degree-ordered orientation
    * (the MapReduce-classic of Suri & Vassilvitskii 2011, "Counting
    * Triangles and the Curse of the Last Reducer"): orient every
    * undirected edge from its (degree, label)-SMALLER endpoint to the
    * larger, making the graph a DAG in which each triangle {a,b,c}
    * (ordered a<b<c) appears as exactly the wedge a→b, a→c plus the
    * closing edge b→c — counted ONCE, with the wedge fan-out generated
    * at the LOW-degree endpoint. That orientation is the whole
    * scale story: a naive wedge join fans out quadratically at hub
    * nodes (the "last reducer" holding a celebrity's neighbor list);
    * degree-ordering bounds per-node out-degree by O(√|E|), so the
    * wedge set — the only intermediate — is O(|E|^{3/2}) worst case
    * and tiny in practice.
    *
    * Plan shape: one degree aggregate joined back (symmetrized edges,
    * map-side combined), one self-join of the oriented edge list on the
    * wedge apex, one semi-ish equi-join against the oriented edges to
    * close, then an explode of each triangle to its three corners and a
    * count keyed by node. Edge weights are ignored (a triangle is
    * topology); self-loops and parallel/reverse duplicates collapse in
    * the symmetrize-distinct.
    *
    * Output: (node, n_triangles) for EVERY node of the graph, zeros
    * included (the left join back onto the node set).
    *
    * @param materialize true (default) eagerly local-checkpoints the
    *        result and releases the two support caches — the
    *        [[pageRank]] checkpointEvery contract; false returns the
    *        LAZY plan with the caches left cached (plan inspection,
    *        composition into a larger uncomputed query) — the caller
    *        owns `spark.catalog.clearCache()`.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String, materialize: Boolean = true,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame =
    triangleCore(edges, srcCol, dstCol, materialize, localEdgeThreshold,
      _.select(col("node"), col("n_triangles")))

  /** Local clustering coefficient per node on the e6 integer grid:
    * `cc_e6 = 2·T(v)·10⁶ div (d(v)·(d(v)−1))`, zero for degree < 2 —
    * how close each node's neighborhood is to a clique, the standard
    * companion statistic to [[triangleCounts]] (same pipeline, the
    * degree table joined back instead of dropped).
    *
    * @return (node, degree, n_triangles, cc_e6).
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String, materialize: Boolean = true,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame =
    triangleCore(edges, srcCol, dstCol, materialize, localEdgeThreshold,
      _.select(col("node"), col("degree"), col("n_triangles"),
        when(col("degree") < 2L, lit(0L))
          .otherwise(expr(
            "(2 * n_triangles * 1000000) div (degree * (degree - 1))"))
          .as("cc_e6")))

  private def triangleCore(edges: DataFrame, srcCol: String,
      dstCol: String, materialize: Boolean, localEdgeThreshold: Long,
      shape: DataFrame => DataFrame): DataFrame = {
    val e = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hybrid fast path (the harmonicCentrality/kCoreness precedent):
    // per-node triangle counts are a pure function of the edge set —
    // under the size gates (plus a Σdeg² work bound, since the local
    // count enumerates neighbor pairs) each node counts its adjacent
    // neighbor pairs directly on the driver. Identical values: a
    // triangle {x,y,z} increments all three members by exactly 1 in
    // both forms; `shape` then applies the same integer-grid
    // projection. Above the gates the degree-oriented distributed
    // enumeration is untouched.
    if (localEdgeThreshold > 0 && und.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val esArr = und.as[(String, String)].collect()
      val nodesArr = esArr.iterator.map(_._1).toArray.distinct
      val adjL: Map[String, Set[String]] =
        esArr.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val work = adjL.valuesIterator.map(s => s.size.toLong * s.size).sum
      if (nodesArr.length <= smallGraphNodeLimit && work <= (1L << 26)) {
        val rows = nodesArr.toSeq.map { v =>
          val nb = adjL(v).toArray
          var t = 0L
          var i = 0
          while (i < nb.length) {
            var j = i + 1
            while (j < nb.length) {
              if (adjL(nb(i)).contains(nb(j))) t += 1
              j += 1
            }
            i += 1
          }
          (v, nb.length.toLong, t)
        }
        und.unpersist(false)
        val local = shape(rows.toDF("node", "degree", "n_triangles"))
        return if (materialize) local.localCheckpoint(true) else local
      }
    }
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val nodes = deg.select(col("u").as("node"), col("d").as("degree"))
    // orient u→v iff (deg(u), u) < (deg(v), v): struct comparison IS
    // the lexicographic order, shared verbatim with the SQL oracle
    val oriented = und
      .join(deg.select(col("u"), col("d").as("du")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dv")), "v")
      .filter(struct(col("du"), col("u")) < struct(col("dv"), col("v")))
      .select(col("u").as("lo"), col("v").as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.lo") === col("e2.lo"))
      .filter(col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("x"), col("e1.hi").as("y"),
        col("e2.hi").as("z"))
    // close the wedge: the (y,z) edge exists in SOME orientation — both
    // y→z and z→y are possible since (deg,label) order need not align
    // with the label order used to dedupe the wedge pair
    val closing = oriented.select(col("lo").as("y"), col("hi").as("z"))
      .union(oriented.select(col("hi").as("y"), col("lo").as("z")))
    val triangles = wedges.join(closing, Seq("y", "z"))
    val perNode = triangles
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val lazyOut = shape(nodes.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles")))
    if (!materialize) lazyOut
    else {
      val out = lazyOut.localCheckpoint(true)
      und.unpersist(false)
      oriented.unpersist(false)
      out
    }
  }

  /** k-core decomposition by iterated neighborhood H-index (Lü, Zhou,
    * Zhang & Stanley 2016, "The H-index of a network node and its
    * relation to degree and coreness"): every node starts at its
    * degree and each synchronous round replaces its estimate with the
    * H-index of its neighbors' current estimates — the largest h such
    * that ≥ h neighbors hold an estimate ≥ h. The sequence is
    * non-increasing and converges to the node's CORENESS (the largest
    * k for which the node survives k-core peeling). Unlike the
    * textbook sequential min-degree peel, every round here is a pure
    * function of the previous one — synchronous, order-free — which is
    * what makes it both shuffle-parallel and replayable by a SQL
    * oracle at a FIXED round count.
    *
    * H-index per node via the (node, estimate)-HISTOGRAM, never a
    * per-neighbor ranking: count neighbors per distinct estimate value
    * (map-side combining — a hub's degree collapses before the
    * exchange), then H = max over distinct values t of
    * `least(t, cum(t))` where `cum(t)` = neighbors holding ≥ t,
    * computed by one descending fold over the ≤ max-coreness distinct
    * values. Equivalent to ranking each estimate descending and taking
    * `max(least(rank, est))` (the identity both directions of the
    * H-index definition satisfy; the SQL oracle replays that rank
    * form), but the per-node work is O(distinct estimates), not
    * O(degree) in one task — the earlier `row_number` form sorted a
    * hub's full neighbor list in a single window partition every
    * round, the same last-reducer [[triangleCounts]] engineers away
    * with degree orientation.
    *
    * Edges are undirected and deduplicated; self-loops dropped. Output
    * covers nodes with ≥ 1 edge (an isolated node's coreness is 0 and
    * it never appears in an edge-derived node set).
    *
    * Scale shape: state is ONE |V|-row (node, est) frame; each round is
    * an estimate-onto-edges equi-join, a partially-aggregated
    * (node, est)-histogram count, and one fold over each node's
    * histogram array (rows per node bounded by distinct estimate
    * values ≤ max coreness — a 10⁸-degree hub contributes 10⁸ rows to
    * the map side but only its distinct-value histogram to the
    * exchange and NO sort anywhere). The dedup'd edge list is
    * persisted once. Same lineage/checkpoint contract as [[pageRank]].
    *
    * @return (node, coreness) — exact coreness once `iters` reaches the
    *         fixpoint (small: the H-operator contracts in a handful of
    *         rounds on real graphs; specs assert fixpoint at test scale).
    */
  /** Harmonic centrality (Marchiori & Latora 2000; the closeness
    * variant Boldi & Vigna 2014 recommend precisely because it is
    * well-defined on DISCONNECTED graphs): for every node,
    *
    *   harmonic_e6(v) = Σ_{u ≠ v reachable} 10⁶ div d(u, v)
    *
    * over unweighted undirected hop distances. Distances come from
    * `iters` rounds of synchronous min-plus frontier expansion — the
    * all-pairs BFS as a relational fixpoint: the (src, node, dist)
    * table starts at d(v,v) = 0 and each round min-merges
    * d(src, w) ≤ d(src, v) + 1 over edges (v, w). After `iters` rounds
    * the table holds exact distances up to `iters` hops; pairs farther
    * apart contribute nothing yet, so `iters` must cover the diameter
    * for exactness (specs assert the fixpoint at test scale — the
    * reduction-oriented use cases here run on small quotient graphs
    * like event types or near-dup clusters, never raw 100 TB rows).
    *
    * Scale shape: state is the reachable-pairs table — O(Σ component²)
    * rows, the inherent APSP output size; each round is one equi-join
    * onto the (persisted) edge list + a min aggregate keyed by (src,
    * node). Same checkpoint contract as [[pageRank]]. Integer division
    * keeps every contribution exact cross-engine. For components too
    * large to hold the pairs table, use [[harmonicHyperBall]] — the
    * approximate form whose state is one HLL ball per node.
    *
    * @return (node, n_reachable, harmonic_e6) — n_reachable excludes
    *         the node itself
    */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 0,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")
    val e = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hybrid fast path (the connectedComponents/minLabelClusters
    // precedent): this operator is scoped by scaladoc to SMALL quotient
    // graphs (event types, near-dup clusters) — on one of those, the
    // relational APSP pays ~iters rounds of join+agg+persist jobs to
    // move a few hundred rows. Under the size gates the symmetrized
    // edge set collects and bounded-depth BFS runs per source on the
    // driver: same hop distances, same `10⁶ div d` integer
    // contributions, same (node, n_reachable, harmonic_e6) rows (the
    // pair table is symmetric, so per-source tallies equal the
    // distributed per-destination group-by). Above the gates — the
    // scale path — nothing changes.
    if (localEdgeThreshold > 0 && und.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = und.as[(String, String)].collect()
      val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      if (nodes.length <= smallGraphNodeLimit) {
        val adj = es.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        val rows = nodes.iterator.map { src =>
          val dist = scala.collection.mutable.HashMap[String, Int](src -> 0)
          var frontier: Array[String] = Array(src)
          var d = 0
          while (frontier.nonEmpty && d < iters) {
            d += 1
            frontier = frontier
              .flatMap(n => adj.getOrElse(n, Array.empty[String]))
              .distinct.filterNot(dist.contains)
            frontier.foreach(v => dist(v) = d)
          }
          val reach = dist.view.filter(_._2 > 0).toSeq
          (src, reach.size.toLong,
            reach.iterator.map(kv => 1000000L / kv._2).sum)
        }.toSeq
        und.unpersist(false)
        return rows.toDF("node", "n_reachable", "harmonic_e6")
      }
    }
    // Reflexive edge set: the carry-over row (src, node, d) is exactly
    // the min-plus expansion along a self-loop of weight 0, so adding
    // (w, w) edges makes each round ONE join + ONE min aggregate with
    // `dist` referenced ONCE — the former carry ∪ expansion referenced
    // it twice, which without per-round materialization doubles the
    // plan per round (2^iters subtree copies; the round-16 ev_harmonic
    // 20 s-of-task-deserialization disease). Linear lineage needs no
    // per-round persist at all; `checkpointEvery` still bounds plan
    // depth eagerly for dozens-of-rounds production runs.
    val nodes = und.select(col("u")).distinct()
    val undSelf = und
      .unionByName(nodes.select(col("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var dist = nodes
      .select(col("u").as("src"), col("u").as("node"), lit(0L).as("d"))
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      var next = dist.join(undSelf, dist("node") === undSelf("u"))
        .select(col("src"), col("v").as("node"),
          (col("d") + when(col("u") === col("v"), lit(0L))
            .otherwise(lit(1L))).as("d"))
        .groupBy(col("src"), col("node")).agg(min(col("d")).as("d"))
      if (checkpointEvery > 0 &&
        (i % checkpointEvery == 0 || i == iters)) {
        val cp = next.localCheckpoint(true)
        lastCp.foreach(releaseLocalCheckpoint)
        lastCp = Some(cp)
        next = cp
      }
      dist = next
    }
    if (checkpointEvery > 0) { und.unpersist(false); undSelf.unpersist(false) }
    else {
      // the returned (lazy) plan may be consumed by several actions;
      // persist the final pairs table so they share one materialization
      // — the same cache-lifetime contract the per-round persists had
      dist = dist.persist(StorageLevel.MEMORY_AND_DISK)
    }
    dist.filter(col("d") > 0L)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_reachable"),
        sum(expr("1000000 div d")).as("harmonic_e6"))
  }

  /** APPROXIMATE harmonic centrality via HyperBall (Boldi & Vigna
    * 2013/2014, "In-core computation of geometric centralities with
    * HyperBall: a hundred billion nodes and beyond") — the scale path
    * [[harmonicCentrality]]'s exact form cannot take: the exact APSP
    * state is O(Σ component²) pairs (inherent — it IS the output), so
    * a 10⁸-node component is simply unrepresentable. HyperBall
    * replaces each node's reachable-set with one HLL register array:
    *
    *   B₀(v)   = sketch({v})
    *   Bₜ(v)   = merge(Bₜ₋₁(v), Bₜ₋₁(w) for (v,w) ∈ E)   — register max
    *   harmonic_e6(v) ≈ Σ_t (|Bₜ(v)| − |Bₜ₋₁(v)|) · 10⁶ div t
    *
    * using the raw integer-grid estimator |B| = est_raw of
    * [[graft.functions.HllRegisters]] — registers only grow, S only
    * shrinks, so the floored estimate is monotone non-decreasing and
    * every per-round increment is a non-negative int64. The whole
    * round is ONE join + ONE register-max re-merge aggregate
    * ([[graft.functions.HllMergeRegisters]] — the same merge a
    * warehouse applies to persisted day sketches), and state is
    * |V| · 2^p bytes at ANY component size or diameter — at p=6 that
    * is 64 registers/node, 6.4 GB for 10⁸ nodes, vs the exact form's
    * 10¹⁶ pairs. Standard error ≈ 1.04/√2^p per ball (13% at p=6);
    * estimates — not just samples — are bit-reproducible in any
    * engine because the estimator never leaves the integer grid
    * (BigInteger division, exactly the `ev_hll` family's rule).
    *
    * Same symmetrized-dedup'd edge handling and checkpoint/lineage
    * contract as [[harmonicCentrality]]; `iters` must cover the
    * diameter for the ball to saturate (the sum simply stops growing
    * after that).
    *
    * @return (node, est_ball — the final ball-size estimate,
    *         harmonic_e6 — the accumulated estimate increments)
    */
  def harmonicHyperBall(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, p: Int = 6, checkpointEvery: Int = 0,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame =
    hyperBallState(edges, srcCol, dstCol, iters, p, checkpointEvery,
      localEdgeThreshold)
      .select(col("node"), col("sk.est_raw").as("est_ball"),
        col("harm").as("harmonic_e6"))

  /** APPROXIMATE closeness centrality from the SAME HyperBall registers
    * (Boldi & Vigna 2014 §3 — harmonic, closeness, and the
    * neighbourhood function are all readouts of one ball evolution):
    * `sum_dist(v) = Σ_t t·(|Bₜ(v)| − |Bₜ₋₁(v)|)` approximates the sum
    * of distances from v, and `closeness_e6 = (|B∞(v)| − 1)·10⁶ div
    * sum_dist` is Lin-style reachable-count-over-distance-sum closeness
    * on the integer grid (0 for isolated nodes). Every term derives
    * from the per-round floored estimates, so the approximation is
    * bit-reproducible cross-engine — same contract as
    * [[harmonicHyperBall]], same O(|V|·2^p) state.
    */
  def hyperBallCloseness(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, p: Int = 6, checkpointEvery: Int = 0,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame =
    hyperBallState(edges, srcCol, dstCol, iters, p, checkpointEvery,
      localEdgeThreshold)
      .select(col("node"), col("sk.est_raw").as("est_ball"),
        expr("aggregate(sequence(1, size(ests) - 1), 0L, " +
          "(acc, t) -> acc + t * (ests[t] - ests[t-1]))").as("sum_dist"))
      .withColumn("closeness_e6",
        when(col("sum_dist") > 0,
          expr("((est_ball - 1) * 1000000) div sum_dist"))
          .otherwise(lit(0L)))

  /** APPROXIMATE neighbourhood function + effective diameter from the
    * HyperBall ball evolution (Boldi & Vigna's headline readout): one
    * row per round t with `nf = Σ_v |Bₜ(v)|` (the number of reachable
    * pairs within distance t, self-pairs included) and the EFFECTIVE
    * DIAMETER — the smallest t whose nf reaches 90% of the saturated
    * value, compared in exact integers (`10·nf_t ≥ 9·nf_last`) —
    * repeated on every row. `iters` must exceed the true diameter for
    * the 90% quantile to be meaningful (nf stops growing at
    * saturation, which is itself visible in the output).
    */
  def hyperBallNeighborhood(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, p: Int = 6, checkpointEvery: Int = 0,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame = {
    val nf = hyperBallState(edges, srcCol, dstCol, iters, p, checkpointEvery,
      localEdgeThreshold)
      .select(posexplode(col("ests")).as(Seq("t", "est")))
      .groupBy(col("t").cast("long").as("t"))
      .agg(sum(col("est")).as("nf"))
    val last = nf.agg(max(struct(col("t"), col("nf"))).as("m"))
      .select(col("m.nf").as("nf_last"))
    val eff = nf.join(broadcast(last))
      .filter(col("nf") * 10 >= col("nf_last") * 9)
      .agg(min(col("t")).as("eff_diam"))
    nf.join(broadcast(eff))
  }

  /** The shared HyperBall loop: one register-max re-merge per round,
    * |V|·2^p bytes of state; `ests` accumulates the per-round floored
    * ball estimates (index 0 = the singleton ball), `harm` the
    * harmonic increments — both exact-integer readouts of the same
    * register evolution.
    */
  private def hyperBallState(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int, p: Int, checkpointEvery: Int,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")
    val e = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hybrid fast path (same gates and precedent as harmonicCentrality):
    // the register evolution is a pure function of the edge set, and
    // every piece of its arithmetic is the SHARED implementation the
    // distributed aggregates call — HllRegisters.observe/mergeInto/
    // stats for the registers and the integer-grid estimator,
    // XxHash64Function for the node hash (what Spark's xxhash64
    // compiles to, seed 42) — so the driver evolution is bit-identical
    // by construction, not by reimplementation. Output schema matches
    // the distributed frame exactly: (node, sk struct, harm, ests).
    if (localEdgeThreshold > 0 && und.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val es = und.as[(String, String)].collect()
      val nodes = es.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      if (nodes.length <= smallGraphNodeLimit) {
        val m = 1 << p
        val adj = es.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        var regs: Map[String, Array[Byte]] = nodes.iterator.map { n =>
          val b = new Array[Byte](m)
          graft.functions.HllRegisters.observe(b,
            org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
              org.apache.spark.unsafe.types.UTF8String.fromString(n),
              org.apache.spark.sql.types.StringType, 42L), p)
          n -> b
        }.toMap
        val ests = scala.collection.mutable.HashMap[String,
          scala.collection.mutable.ArrayBuffer[Long]]()
        val harm = scala.collection.mutable.HashMap[String, Long]()
        nodes.foreach { n =>
          ests(n) = scala.collection.mutable.ArrayBuffer(
            graft.functions.HllRegisters.stats(regs(n), p)._2)
          harm(n) = 0L
        }
        for (t <- 1 to iters) {
          regs = nodes.iterator.map { n =>
            val b = regs(n).clone()
            adj.getOrElse(n, Array.empty[String])
              .foreach(v => graft.functions.HllRegisters.mergeInto(b, regs(v)))
            n -> b
          }.toMap
          nodes.foreach { n =>
            val est = graft.functions.HllRegisters.stats(regs(n), p)._2
            harm(n) += (est - ests(n).last) * 1000000L / t
            ests(n) += est
          }
        }
        val skType = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("nnz",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("est_raw",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("registers",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("bucket",
                  org.apache.spark.sql.types.IntegerType, nullable = false),
                org.apache.spark.sql.types.StructField("register",
                  org.apache.spark.sql.types.IntegerType, nullable = false))),
              containsNull = false), nullable = false)))
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("sk", skType,
            nullable = false),
          org.apache.spark.sql.types.StructField("harm",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("ests",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType, containsNull = false),
            nullable = false)))
        val rows: java.util.List[org.apache.spark.sql.Row] =
          new java.util.ArrayList()
        nodes.foreach { n =>
          val b = regs(n)
          val pairs = (0 until m).iterator.filter(i => b(i) > 0)
            .map(i => org.apache.spark.sql.Row(i, b(i).toInt)).toSeq
          val (nnz, est) = graft.functions.HllRegisters.stats(b, p)
          rows.add(org.apache.spark.sql.Row(n,
            org.apache.spark.sql.Row(nnz, est, pairs), harm(n),
            ests(n).toSeq))
        }
        und.unpersist(false)
        return spark.createDataFrame(rows, schema)
      }
    }
    // Reflexive edge set (the harmonicCentrality trick): the "own
    // sketch + carried accumulators" row IS the contribution along a
    // self-loop, so each round becomes ONE join + ONE merge aggregate
    // with `st` referenced ONCE — the former nbr ∪ own union referenced
    // it twice, which without per-round materialization doubles the
    // plan per round (round-17 probe on the distributed path: 324 jobs,
    // 8339 tasks, 45 s of task deserialization and a 9353-line plan for
    // 6 rounds at sf0.1 — the round-16 ev_harmonic disease, inherited).
    // The carried (harm, ests) still ride through the aggregate on the
    // single self row (null on neighbor rows; max() recovers them
    // order-independently); prev_est comes from the carried ests tail.
    val nodes = und.select(col("u")).distinct()
    val undSelf = und
      .unionByName(nodes.select(col("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var st = nodes
      .select(col("u").as("node"), xxhash64(col("u")).as("h"))
      .groupBy(col("node"))
      .agg(graft.functions.HllRegisters.hllRegisters(col("h"), p).as("sk"))
      .withColumn("harm", lit(0L))
      .withColumn("ests", array(col("sk.est_raw")))
    var lastCp: Option[DataFrame] = None
    for (t <- 1 to iters) {
      var next = undSelf.join(st, undSelf("v") === st("node"))
        .select(col("u").as("n2"), col("sk.registers").as("regs"),
          when(col("u") === col("v"), col("harm")).as("harm0"),
          when(col("u") === col("v"), col("ests")).as("ests0"))
        .withColumnRenamed("n2", "node")
        .groupBy(col("node"))
        .agg(graft.functions.HllRegisters
            .hllMergeRegisters(col("regs"), p).as("sk"),
          max(col("harm0")).as("harm0"),
          max(col("ests0")).as("ests0"))
        .select(col("node"), col("sk"),
          (col("harm0") +
            expr(s"((sk.est_raw - element_at(ests0, -1)) * 1000000)" +
              s" div $t")).as("harm"),
          concat(col("ests0"), array(col("sk.est_raw"))).as("ests"))
      if (checkpointEvery > 0 &&
        (t % checkpointEvery == 0 || t == iters)) {
        val cp = next.localCheckpoint(true)
        lastCp.foreach(releaseLocalCheckpoint)
        lastCp = Some(cp)
        next = cp
      }
      st = next
    }
    if (checkpointEvery > 0) { und.unpersist(false); undSelf.unpersist(false) }
    else {
      // several readouts (neighbourhood function, closeness) consume the
      // state more than once; share one materialization, same contract
      // as the per-round persists this replaces
      st = st.persist(StorageLevel.MEMORY_AND_DISK)
    }
    st
  }

  def kCoreness(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 0,
      localEdgeThreshold: Long = smallGraphEdgeLimit): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointEvery >= 0, "checkpointEvery must be >= 0 (0 = off)")
    val e = edges.select(col(srcCol).cast("string").as("a"),
        col(dstCol).cast("string").as("b"))
      .filter(col("a") =!= col("b"))
    val und = e.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Hybrid fast path (the harmonicCentrality/connectedComponents
    // precedent): the synchronous H-index rounds are a pure integer
    // function of the edge set — under the small-graph gates they run
    // on the driver (sorted-neighbor-estimates form of the H-index,
    // the identity the scaladoc cites; same fixed `iters`, same
    // degree seed), instead of `iters` rounds of join + two aggregates.
    // Above the gates the distributed path is untouched.
    if (localEdgeThreshold > 0 && und.count() <= localEdgeThreshold) {
      val spark = edges.sparkSession
      import spark.implicits._
      val esArr = und.as[(String, String)].collect()
      val nodes = esArr.iterator.map(_._1).toArray.distinct
      if (nodes.length <= smallGraphNodeLimit) {
        val adj = esArr.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
        var estM: Map[String, Long] =
          nodes.iterator.map(n => n -> adj(n).length.toLong).toMap
        for (_ <- 1 to iters) {
          estM = nodes.iterator.map { n =>
            val sorted = adj(n).map(estM).sortBy(-_)
            var h = 0L
            var i = 0
            while (i < sorted.length) {
              val cand = math.min(sorted(i), i + 1L)
              if (cand > h) h = cand
              i += 1
            }
            n -> h
          }.toMap
        }
        und.unpersist(false)
        return nodes.toSeq.map(n => (n, estM(n)))
          .toDF("node", "coreness")
      }
    }
    var est = und.groupBy(col("u")).agg(count(lit(1)).as("est"))
      .select(col("u").as("node"), col("est"))
    var lastCp: Option[DataFrame] = None
    for (i <- 1 to iters) {
      est = und.join(est, und("v") === est("node"))
        .select(col("u"), col("est").as("nest"))
        .groupBy(col("u"), col("nest")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(collect_list(struct(col("nest"), col("c"))).as("h"))
        .select(col("u").as("node"),
          // descending fold over the distinct-estimate histogram:
          // H = max over values t of least(t, #neighbors holding >= t)
          expr("aggregate(sort_array(h, false), " +
            "struct(cast(0 as bigint) as cum, cast(0 as bigint) as best), " +
            "(acc, x) -> struct(acc.cum + x.c, " +
            "greatest(acc.best, least(x.nest, acc.cum + x.c))), " +
            "acc -> acc.best)").as("est"))
      if (checkpointEvery > 0 &&
        (i % checkpointEvery == 0 || i == iters)) {
        val cp = est.localCheckpoint(true)
        lastCp.foreach(releaseLocalCheckpoint)
        lastCp = Some(cp)
        est = cp
      }
    }
    if (checkpointEvery > 0) und.unpersist(false)
    est.select(col("node"), col("est").as("coreness"))
  }
}
