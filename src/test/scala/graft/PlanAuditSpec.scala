package graft

/** Physical-plan regression tests: the 100 TB-relevant plan shapes that
  * BASELINE.md's audit table claims (broadcasts on small sides, filter
  * and column pushdown into the scan, bounded top-k instead of global
  * windows/sorts) are asserted here so a refactor that silently degrades
  * a plan — a broadcast falling back to sort-merge, a pruned scan going
  * wide, a TakeOrderedAndProject becoming a global Sort — fails CI, not
  * the next scale-up.
  *
  * Assertions run on the PLANNED (pre-execution) string at sf0.001:
  * queries whose construction executes eager jobs (the clustering
  * fixpoint, staged-write round trips) are exercised by their
  * correctness rows instead.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def planned(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val qe = SparkEntry.queries(name)(spark, dir).queryExecution
    qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q3 star join: both dims broadcast, fact side never sort-merges") {
    val p = planned("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q5 snowflake: every dimension chain broadcasts; the fact side " +
    "reaches the aggregate without a sort-merge join") {
    val p = planned("q5_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q6: join-free scan-and-sum — every predicate pushes into the " +
    "parquet scan, only the two priced columns are read, and the sum " +
    "partial-aggregates before the one-row exchange") {
    val p = planned("q6_forecast_revenue")
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val f = formatted("q6_forecast_revenue")
    assert(f.contains("PushedFilters"), f)
    assert(f.contains("GreaterThanOrEqual(l_shipdate") &&
      f.contains("LessThan(l_quantity"), f)
    // ReadSchema prunes to exactly the referenced columns
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("l_extendedprice") && !read.contains("l_orderkey"), read)
  }

  test("q18: the heavy-hitter order set gates both joins as the " +
    "BROADCAST side — orders and customer never shuffle or sort-merge") {
    val p = planned("q18_large_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q4: the EXISTS gate plans as ONE left-semi join — each order " +
    "counted once regardless of qualifying lineitem multiplicity, both " +
    "filters pushed to their scans") {
    val p = planned("q4_order_priority")
    assert(p.contains("LeftSemi"), p)
    assert("(?i)leftsemi".r.findAllIn(p).size == 1, p)
    val f = formatted("q4_order_priority")
    assert(f.contains("EqualTo(l_returnflag,R)"), f)
    assert(f.contains("GreaterThanOrEqual(o_orderdate"), f)
  }

  test("q14: single broadcast fact-dim join; the conditional aggregate " +
    "partial-aggregates map-side to one row per partition") {
    val p = planned("q14_promo_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q19: the OR-of-ANDs keeps single-side conjuncts at the scans — " +
    "Catalyst extracts the p_brand/p_size and l_quantity disjunction " +
    "envelopes below the broadcast join") {
    val p = planned("q19_brand_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val f = formatted("q19_brand_revenue")
    // the per-side OR envelope reaches each scan's pushed filters:
    // lineitem sees the quantity disjunction, part sees brand/size
    assert(f.contains("PushedFilters"), f)
    assert("Or\\(.*l_quantity".r.findFirstIn(f).nonEmpty ||
      "l_quantity.*Or\\(".r.findFirstIn(f).nonEmpty, f)
    assert(f.contains("Brand#12"), f)
  }

  test("q7: both nation dims and supplier broadcast; the 2-nation IN " +
    "envelope reaches the dim scans") {
    val p = planned("q7_nation_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    val f = formatted("q7_nation_volume")
    assert(f.contains("PushedFilters") && f.contains("NATION_3"), f)
  }

  test("q15: the max resolves as a one-row broadcast joined back — no " +
    "global sort, no window") {
    val p = planned("q15_top_supplier")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!"Sort \\[".r.findFirstIn(p).exists(_ => p.contains("global=true")), p)
  }

  test("q17: the correlated avg decorrelates to a per-part aggregate " +
    "joined back — no window, brand filter pushed, part side broadcast") {
    val p = planned("q17_small_quantity")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    val f = formatted("q17_small_quantity")
    assert(f.contains("EqualTo(p_brand,Brand#23)"), f)
  }

  test("q22: order-less-ness is an anti join; the global-average " +
    "threshold rides a one-row broadcast") {
    val p = planned("q22_idle_customers")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q2: the correlated min decorrelates to a per-part min joined " +
    "back — region-scoped suppliers and the filtered part set " +
    "broadcast; no window, no cartesian, no global sort") {
    val p = planned("q2_min_cost_supplier")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!"Sort \\[".r.findFirstIn(p).exists(_ => p.contains("global=true")), p)
    val f = formatted("q2_min_cost_supplier")
    assert(f.contains("EqualTo(p_size,15)"), f)
  }

  test("q8: one grouped pass computes the nation slice AND the per-year " +
    "total (conditional sum, no second aggregation); part/supplier/" +
    "nation/region all broadcast; no cartesian") {
    val p = planned("q8_market_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val f = formatted("q8_market_share")
    assert(f.contains("EqualTo(p_type,PROMO)"), f)
    assert(f.contains("GreaterThanOrEqual(o_orderdate"), f)
  }

  test("q9: both dimension sides (name-filtered part, supplier→nation) " +
    "broadcast against the fact; the name filter pushes to the part " +
    "scan; no cartesian, no window") {
    val p = planned("q9_product_profit")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    val f = formatted("q9_product_profit")
    assert(f.contains("StringContains(p_name,red)") ||
      f.contains("p_name"), f)
  }

  test("q11: the HAVING-vs-scalar-subquery threshold rides a one-row " +
    "broadcast next to the per-part aggregate — no second scan-side " +
    "shuffle, nation-scoped suppliers broadcast") {
    val p = planned("q11_important_parts")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    // the scoped frame is scanned twice (per-part + grand total): both
    // aggregates partial-aggregate before their exchange
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("q12: the late-shipment CASE aggregation partial-aggregates; the " +
    "ship-date year pushes into the lineitem scan; no cartesian") {
    val p = planned("q12_late_shipments")
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val f = formatted("q12_late_shipments")
    assert(f.contains("GreaterThanOrEqual(l_shipdate"), f)
  }

  test("q16: the supplier deny-list is a broadcast LEFT ANTI (NOT IN " +
    "dual); the filtered part set broadcasts; the distinct count is " +
    "the two-phase aggregate, not a window") {
    val p = planned("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20: the excess-share chain ends in a LEFT SEMI into supplier; " +
    "the name-filtered part set broadcasts; no cartesian, no window") {
    val p = planned("q20_excess_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21: the only-late-supplier condition is semi + anti self-join " +
    "arms on the same order key; the nation-scoped supplier dim " +
    "broadcasts; no cartesian") {
    val p = planned("q21_waiting_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q1: aggregation is partial before the exchange (two HashAggregate levels)") {
    val p = planned("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("as-of annotation join broadcasts the exploded annotation side") {
    val p = planned("j1_asof_all_days")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("date filters reach the parquet scan (PushedFilters)") {
    // s2's date is DERIVED (cast of l_shipdate) so its predicate cannot
    // push below the projection — q3's dimension filters sit on raw
    // parquet columns and must reach the scan
    val f = formatted("q3_shipping_priority")
    assert(f.contains("PushedFilters"))
    assert(f.contains("GreaterThan(l_shipdate") || f.contains("LessThan(o_orderdate"))
  }

  test("column pruning reaches the scan: q3 reads only the needed lineitem columns") {
    val f = formatted("q3_shipping_priority")
    // the lineitem scan must NOT read all 16 columns — the ReadSchema for
    // the fact table carries exactly the join key + filter + measure cols
    val readSchemas = "ReadSchema: struct<[^>]*l_orderkey[^>]*>".r.findAllIn(f).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(s => !s.contains("l_comment") && !s.contains("l_tax")))
  }

  test("vocabulary top-k plans as TakeOrderedAndProject, not a global window") {
    val p = planned("tx_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Window"))
  }

  test("tokenize: bounded vocab broadcast onto the corpus, encode side map-only") {
    val p = planned("tx_tokenize")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("incremental dedup: every index probe is a broadcast join, " +
    "anti-joins build on the batch-derived side") {
    val p = planned("dd_incremental")
    // tree-form rendering: "BroadcastHashJoin [...], [...], LeftAnti, BuildRight"
    assert("LeftAnti".r.findAllIn(p).size >= 2)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("cosine top-k: per-query top-k is the map-side-combining aggregate, " +
    "not a rank window over all scored rows") {
    val p = planned("sim_cosine_topk")
    assert(p.contains("top_k_by_score"))
    assert(!p.contains("Window"))
  }

  test("quality percentile: histogram window is the only window, corpus side " +
    "joins broadcast") {
    val p = planned("tx_quality_rank")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("sequence packing: ONE shard-key exchange, greedy fold in-partition") {
    val p = planned("ds_pack_sequences")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(p.contains("MapPartitions"))
  }

  test("temperature resampling: rate table broadcasts, corpus never shuffles") {
    val p = planned("ds_temperature_sample")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!"Exchange hashpartitioning.*doc_id".r.findFirstIn(p).isDefined)
  }

  test("sessionization: one user-key exchange shared by windows and aggregate") {
    val p = planned("ev_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("centroid sums: partial aggregation before the exchange") {
    val p = planned("emb_centroids")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("exact-N sample: bounded-heap top-k, no global Sort stage") {
    val p = planned("ds_sample_exact_n")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!"Sort \\[".r.findFirstIn(p).isDefined)
  }

  test("general-tau resampling: rate LITERALS broadcast, keep decision " +
    "is a map-side filter — corpus never shuffles") {
    val p = planned("ds_temperature_sample_tau")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!"Exchange hashpartitioning.*doc_id".r.findFirstIn(p).isDefined)
    // the rate table is a local literal relation, not a recomputed
    // aggregate of the corpus (the counts were collected once driver-side)
    assert(p.contains("LocalTableScan"))
  }

  test("retention cohorts: day-grain dedup before any window — three " +
    "bounded exchanges, no join") {
    val p = planned("ev_retention_cohorts")
    // distinct to (user, day), window on user, final (cohort, offset)
    // agg — raw events cross at most the first exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3)
    assert(p.contains("Window"))
    assert(!p.contains("Join"))
  }

  test("funnel: ONE scan of the events relation — the strictly-after " +
    "fold runs as array expressions after a single user-keyed aggregate, " +
    "not per-step self-joins re-reading events") {
    val p = planned("ev_funnel")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"))
  }

  test("embedding-LSH near-dup: bucket shuffle carries ids only — the " +
    "vectors stay out of the exchange and join back by id") {
    val f = formatted("dd_embed_neardup_lsh")
    // every hash-exchange in the plan moves (band, bucket, id)-shaped
    // rows; no exchange partition expression mentions the vector column
    val exchanges = "Arguments: hashpartitioning\\([^)]*\\)".r.findAllIn(f).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(e => !e.contains("embedding") && !e.contains("v#")))
  }

  test("ivf top-k: query norm is computed on the broadcast side, not " +
    "re-folded per scored candidate row") {
    val p = planned("sim_ivf_topk")
    // the scored projection divides by q_nrm * nbr_nrm; a regression
    // re-inlining norm(q_vec) would show a q_vec self-dot in the
    // cos_e6 expression (an O(dim) fold per candidate row)
    val cosLines = p.linesIterator.filter(_.contains("cos_e6")).toSeq
    assert(cosLines.nonEmpty)
    assert(cosLines.forall(!_.matches(".*vector_dot\\((q_vec#\\d+), \\1\\).*")))
    assert(cosLines.exists(_.contains("q_nrm")))
  }

  test("PQ ADC top-k: codebook and LUT broadcast, no sort-merge joins, " +
    "the trained codebook is computed once and cache-shared, and the " +
    "scored stream does no vector math") {
    val p = planned("sim_pq_topk")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin"))
    // encode side and LUT side both consume the persisted codebook —
    // two InMemoryTableScans, not two training subtrees (a regression
    // would re-run the Lloyd iteration per consumer)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2)
    // ADC scoring sums LUT integers: the adist aggregation must not
    // evaluate vector_sqdist (that fold belongs to the tiny LUT side)
    val adistLines = p.linesIterator.filter(_.contains("adist_e6")).toSeq
    assert(adistLines.nonEmpty)
    assert(adistLines.forall(!_.contains("vector_sqdist")))
  }

  test("PQ top-k ships through the bounded-heap aggregate, not a " +
    "rank window over the scored stream") {
    val p = planned("sim_pq_topk")
    // the only Window in the plan is the ksub-row init ranking inside
    // the (cached) training subtree; the candidate ranking itself is
    // TopKByScore (ObjectHashAggregate), so no Window sees the full
    // (query × candidate) stream
    assert(p.contains("ObjectHashAggregate"))
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(!_.contains("adist_e6")))
  }

  test("IVF-PQ: all joins broadcast (codebook, LUT, centroids, the " +
    "tiny cent_id join-back), scored stream integer-only") {
    val p = planned("sim_ivfpq_topk")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin"))
    val adistLines = p.linesIterator.filter(_.contains("adist_e6")).toSeq
    assert(adistLines.nonEmpty)
    assert(adistLines.forall(!_.contains("vector_sqdist")))
  }

  test("ranked dedup (w2): min_by aggregate with map-side partial combine " +
    "— no Window, and every sort is keys-only (never the full ordering)") {
    val p = planned("w2_dedup_ranked")
    assert(!p.contains("Window"), p)
    // row-carrying min_by plans as SortAggregate: partial before the
    // exchange (the shuffle carries one candidate per key per map task)
    assert("SortAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_min_by"), p)
    // the aggregate's required sort is the GROUP keys, not the 7-column
    // ordering the window form sorted by
    val sortLines = p.linesIterator.filter(_.trim.startsWith("+- Sort ")).toSeq
    assert(sortLines.nonEmpty && sortLines.forall(!_.contains("parser_time")), p)
  }

  test("BPE pair counts: the ranking window's input is the aggregated " +
    "pair table, never the corpus scan") {
    val p = planned("tx_bpe_pairs")
    // corpus → vocabulary → pairs: two aggregate levels below any Window
    val winIdx = p.linesIterator.indexWhere(_.contains("Window"))
    assert(winIdx >= 0)
    val below = p.linesIterator.drop(winIdx).mkString("\n")
    assert(below.contains("HashAggregate"),
      "window must sit above the pair aggregation, not the raw scan")
  }

  test("unigram encode: map-only application — the codegen'd expression " +
    "carries the piece table as a plan reference (no join anywhere), " +
    "and the ranking window's input is the aggregated subword table") {
    val p = planned("tx_unigram_encode")
    assert(!p.contains("Join"), p)
    assert(p.contains("unigram_encode"), p)
    // partial+final aggregate below the window: the shuffle carries
    // combined (piece, count) cells, never the exploded subword stream
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    val winIdx = p.linesIterator.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, p)
    assert(p.linesIterator.drop(winIdx).mkString("\n")
      .contains("HashAggregate"), p)
    // the top-40 filter plans as a bounded TakeOrderedAndProject under
    // the window, never a global sort of the piece table
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("unigram score: pure map — one Project over the pruned scan, " +
    "no join, no exchange, no aggregate") {
    val p = planned("tx_unigram_score")
    assert(p.contains("unigram_cost"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("HashAggregate"), p)
  }

  test("n-gram LM: count tables broadcast into the scoring joins — the " +
    "corpus trigram stream never sort-merges") {
    val p = planned("tx_ngram_lm")
    assert(p.contains("BroadcastHashJoin") || !p.contains("SortMergeJoin"), p)
  }

  test("q10: top-20 plans as TakeOrderedAndProject (bounded per-partition " +
    "heaps), dims broadcast, no global sort") {
    val p = planned("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("hybrid RRF: both arms top out through the bounded heap — no " +
    "Window anywhere; probe sides broadcast") {
    val p = planned("tx_hybrid_rrf")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("margin mining: per-vector top-k sums ride the bounded heap — " +
    "no Window, no cartesian; every pair/denominator join is an " +
    "equi-join (AQE picks hash/broadcast at runtime)") {
    val p = planned("sim_margin_pairs")
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("centroid outliers: the centroid table broadcasts back and the " +
    "per-label top-k is the bounded heap, not a window sort") {
    val p = planned("emb_outlier_topk")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("weighted sample: clocks are map-side — no corpus Sort, no " +
    "Window; selection is the bounded heap") {
    val p = planned("ds_weighted_sample")
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("source drift: everything past the one tokenization pass is " +
    "vocabulary-scale aggregation — no window, no cartesian beyond the " +
    "one-row total") {
    val p = planned("tx_source_drift")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("RAKE keywords: word scores broadcast back onto the phrase " +
    "frame, the only window is the per-(doc, segment) island scan, and " +
    "the corpus top-k is a bounded TakeOrdered, never a global sort") {
    val p = planned("tx_rake_keywords")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // exactly one Window (the stopword-island cumsum), keyed by doc+seg
    assert("(?<!Spec)Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("CDC chunk dedup: the cut list is the codegen'd cdc_cuts " +
    "expression — no join anywhere, no window, no sort; the only " +
    "exchange is the map-side-combined fingerprint aggregate") {
    val p = planned("dd_cdc_chunks")
    assert(p.contains("cdc_cuts"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("Gopher filter: pure map-side projection — no join, no window, " +
    "no exchange of any kind; every rule fuses into the scan stage") {
    val p = planned("tx_gopher_quality")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sort"), p)
  }

  test("DSIR weights: the bucket-ratio table rides back as a BROADCAST " +
    "join (never sort-merge — it is O(nBuckets) by construction), the " +
    "per-doc sum partial-aggregates, and nothing cartesian touches the " +
    "token stream") {
    val p = planned("ds_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // partial + final for the per-doc aggregate (plus the bucket pass)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("SQ8 top-k: quantization is literal-array expression work fused " +
    "into the scan (the trained bounds fold in as literals, no stats " +
    "join), queries broadcast, candidates reduce through the bounded " +
    "TopKByScore aggregate — no window, no global sort") {
    // construction runs the one dim-bounded training job; the planned
    // search plan is what must stay shaped
    val p = planned("sim_sq8_topk")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p) // TopKByScore partial+final
  }

  test("readability: pure map-side projection — three regex counts fuse " +
    "into the scan stage; no join, window, exchange, or sort") {
    val p = planned("tx_readability")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Sort"), p)
    val f = formatted("tx_readability")
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("text") && !read.contains("lang"), read)
  }

  test("HLL registers: ONE aggregate pass (ObjectHashAggregate partial + " +
    "final — m bytes per group cross the shuffle, never the id stream); " +
    "no join, no window, no sort") {
    val p = planned("ev_hll_users")
    assert(p.contains("ObjectHashAggregate"), p)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p) // partial+final
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("triangles: degree-ordered wedge join — no cartesian anywhere, " +
    "and the corpus scan reads only the transition columns (lazy plan: " +
    "the query form eagerly checkpoints, so inspect materialize=false)") {
    // localEdgeThreshold = 0 forces the DISTRIBUTED path — this pin
    // audits the scale shape; the small-graph driver fast path (which
    // the declared query takes on this fixture) has no plan to audit
    val qe = graft.operators.GraphAlgos.triangleCounts(
      graft.operators.EventAnalytics.transitionCounts(
        graft.sources.Tables.events(spark, dir), "user_id", "ts",
        "event_type", "event_id"),
      "src", "dst", materialize = false,
      localEdgeThreshold = 0L).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    val f = qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("event_type") && !read.contains("props"), read)
    spark.catalog.clearCache()
  }

  test("water-fill quota: the corpus is touched by exactly one " +
    "count aggregate — every window and join runs on the k-row stratum " +
    "table; the scan prunes to the stratum column") {
    val p = planned("ds_waterfill_quota")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    val f = formatted("ds_waterfill_quota")
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("source") && !read.contains("text"), read)
  }

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("bigram lift: the shared unigram-count stage is REUSED at " +
    "runtime (AQE defers exchange reuse to stage materialization, so " +
    "the pin reads the final plan); top-k is the bounded TakeOrdered, " +
    "no cartesian on the bigram stream") {
    val p = finalPlan("tx_bigram_lift")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("vocab coverage: one count aggregate feeds both the total and " +
    "the top-k (runtime stage reuse); the ordered structure is a " +
    "bounded TakeOrdered, and the rank window runs post-limit") {
    val p = finalPlan("tx_vocab_coverage")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cms frequency: the sketch is an object-hash aggregate (fixed " +
    "grid buffer crossing the shuffle, partial+final), the probe join " +
    "broadcasts, and nothing degenerates to cartesian/sort-merge") {
    val p = planned("ev_cms_freq")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cms union: per-type sketches and the re-merge are both " +
    "object-hash aggregates; no join at all in the plan") {
    val p = planned("ev_cms_union")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("hdr quantiles: the bucket histogram partial-aggregates before " +
    "its exchange, the cumulative window is hash-partitioned by group " +
    "(never a single-partition sort), and the scan reads only the two " +
    "referenced columns") {
    val p = planned("tx_len_hdr")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("hashpartitioning"), p)
    val f = formatted("tx_len_hdr")
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("n_chars") && !read.contains("text"), read)
  }

  test("multi-probe LSH: the query-side probe set broadcasts onto the " +
    "banded corpus (equi-join on band+bucket, never cartesian), and " +
    "the final top-k is the bounded-heap aggregate, not a window sort") {
    val p = planned("sim_lsh_multiprobe")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("k-coreness: every H-index round is hub-safe — an equi-join + " +
    "a partially-aggregated (node, est)-histogram + a histogram fold; " +
    "NO per-neighbor-list sort survives anywhere (no Window, no Sort " +
    "keyed by node), and the only single-partition exchange in the " +
    "whole plan is the pair miner's one-row corpus-stats aggregate") {
    // localEdgeThreshold = 0 forces the DISTRIBUTED rounds — this pin
    // audits the scale shape; the declared query takes the small-graph
    // driver fast path on this fixture (no distributed plan to audit)
    val p = graft.operators.GraphAlgos.kCoreness(
      graft.operators.TextDedup.lengthBandedJaccardPairs(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text",
        "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L),
      "id_a", "id_b", iters = 6, localEdgeThreshold = 0L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the old row_number form put a window (and its per-node sort) in
    // every round — a degree-d hub paid an O(d log d) single-task sort;
    // the histogram form must plan NO window and NO node-keyed sort
    assert(!"windowspecdefinition\\(u#".r.findAllIn(p).nonEmpty, p)
    assert(!"Sort \\[u#".r.findAllIn(p).nonEmpty,
      p.linesIterator.filter(_.contains("Sort ")).mkString("\n"))
    assert(!"Sort \\[node#".r.findAllIn(p).nonEmpty,
      p.linesIterator.filter(_.contains("Sort ")).mkString("\n"))
    // the histogram count keys by (node, est): partial aggregation
    // collapses a hub's degree map-side before the exchange
    assert(p.contains("hashpartitioning(u#"), p)
    assert("HashAggregate\\(keys=\\[u#\\d+, nest#".r.findAllIn(p).nonEmpty, p)
    // exactly one distinct single-partition exchange, and it is the
    // support pipeline's scalar aggregate, not a per-round funnel
    val spIds = "Exchange SinglePartition[^\\[]*\\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(spIds.size <= 1, s"single-partition exchanges: $spIds")
  }

  test("attribution: last-touch runs as ONE user-key window pass — a " +
    "single user_id exchange feeds the window, never the purchase x " +
    "touch interval self-join (no cartesian, no extra join), and the " +
    "scan reads only the four event columns") {
    val p = planned("ev_attribution")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Join"), p) // one window pass, zero joins
    assert("windowspecdefinition\\(user_id#".r.findAllIn(p).nonEmpty, p)
    // exactly one user-key exchange (the window's); the only other
    // exchange is the final tiny channel aggregate
    assert("hashpartitioning\\(user_id#".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
    val f = formatted("ev_attribution")
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("user_id") && read.contains("event_type") &&
      !read.contains("props") && !read.contains("value"), read)
  }

  test("leakage-safe split: near-dup pair mining stays BANDED — " +
    "equi-joins only, never an all-pairs cartesian or nested-loop; the " +
    "final split hash rides the cluster label with no global sort") {
    // the CC labels are eagerly checkpointed inside the query, so the
    // pair miner's plan must be pinned at its own boundary
    val docs = graft.sources.Tables.documents(spark, dir)
    val miner = graft.operators.TextDedup.lengthBandedJaccardPairs(
      docs, "doc_id", "text", "n_chars",
      bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L)
    val mp = miner.queryExecution.executedPlan.toString
    assert(!mp.contains("CartesianProduct"), mp)
    // the only nested-loop is the ONE-ROW doc-freq stop-list broadcast
    // (hot_hs) crossed onto the scan — never a doc x doc pair join
    val bnlj = mp.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.size <= 1 && bnlj.forall(_.contains("hot_hs")), mp)
    assert(mp.contains("hashpartitioning"), mp)
    // the visible tail: labels join back by doc_id and the split CASE
    // folds in — no cartesian, no sort of any kind
    val p = planned("ds_leakage_safe_split")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!"rangepartitioning".r.findAllIn(p).nonEmpty, p.linesIterator
      .filter(_.contains("rangepartitioning")).mkString("\n"))
    assert(!"Sort \\[".r.findAllIn(p).nonEmpty, p)
  }

  test("rollup revenue: one Expand feeds a partial+final aggregate — " +
    "the shuffle carries pre-combined grouping-set cells (never the " +
    "fact stream ×4), and no join degenerates") {
    val p = planned("q23_rollup_revenue")
    assert(p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // partial aggregation must sit BETWEEN the grouping-set exchange
    // (above) and Expand (below) in the printed top-down plan — i.e.
    // the map side combines expanded cells before they cross the wire
    val lines = p.linesIterator.toSeq
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    val exchangeAbove = lines.take(expandIdx).lastIndexWhere(
      _.contains("Exchange"))
    assert(exchangeAbove >= 0, p)
    assert(lines.slice(exchangeAbove + 1, expandIdx)
      .exists(_.contains("HashAggregate")), p)
  }

  test("storage-partitioned join: the co-bucketed scans declare the " +
    "hash partitioning — NO Exchange on either join key anywhere in " +
    "the plan (the only shuffle is the group-by above the join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planned("s25_bucket_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      // exactly the aggregation's exchange survives
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
      assert(p.contains("Bucketed: true"), p)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("deletion-vector read: a DV-free table plans the IDENTICAL scan " +
    "(no anti-join, no metadata columns) — merge-on-read costs nothing " +
    "until a vector exists") {
    val p = planned("s15_delete_where") // CoW table: never has vectors
    assert(!p.contains("__graft_dv"), p)
    // the DV query's vectored stage reads through the anti-join; its
    // folded stage must NOT (compaction retired the vectors)
    val q = planned("s24_delete_vectors")
    assert(q.contains("_metadata") || !q.contains("__graft_dv"), q)
  }

  test("cube + grouping sets share the rollup plan shape: one Expand " +
    "feeds a map-side-combined partial aggregate (8 resp. 4 grouping " +
    "sets in one pass, never a self-union per grain), no degenerate join") {
    Seq("q24_cube_revenue", "q25_grouping_sets").foreach { q =>
      val p = planned(q)
      assert(p.contains("Expand"), p)
      assert("HashAggregate".r.findAllIn(p).size >= 2, p)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("Union"), p)
      val lines = p.linesIterator.toSeq
      val expandIdx = lines.indexWhere(_.contains("Expand"))
      val exchangeAbove = lines.take(expandIdx).lastIndexWhere(
        _.contains("Exchange"))
      assert(exchangeAbove >= 0, p)
      assert(lines.slice(exchangeAbove + 1, expandIdx)
        .exists(_.contains("HashAggregate")), p)
    }
  }

  test("exact-substring spans: anchor dedup is aggregate-gated — the " +
    "duplicate set comes from a partial+final count per fingerprint " +
    "(map-side combine collapses corpus-hot boilerplate anchors), the " +
    "join back is an equi-join, the island window partitions by doc " +
    "(never one partition), and no pair expansion exists anywhere") {
    val p = planned("dd_substring")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("Window"), p)
    // the anchor stream shuffles 16-byte md5 fingerprints, not window
    // text: every exchange keys on fp or doc, none carries `text`
    assert(!p.linesIterator.filter(_.contains("Exchange"))
      .exists(_.contains("text")), p)
  }

  test("exact-substring strip: the canonical occurrence is a map-side-" +
    "combined min(struct) aggregate — NO window function in the whole " +
    "plan (a row_number over a corpus-hot fingerprint would sort its " +
    "million occurrences in one task), and no cartesian/nested-loop") {
    val p = planned("dd_substring_strip")
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("shuffle order: the global index never plans a one-partition " +
    "sort — the window partitions by hash bucket (hash-partitioned " +
    "exchange), and offsets fold in as a literal CASE") {
    val p = planned("ds_shuffle_order")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(!p.contains("rangepartitioning"), p.linesIterator
      .filter(_.contains("rangepartitioning")).mkString("\n"))
    assert(p.contains("hashpartitioning"), p)
    val f = formatted("ds_shuffle_order")
    val read = f.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && !read.contains("text"), read)
  }
}
