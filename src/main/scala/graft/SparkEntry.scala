package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CmsCounters, HllRegisters, KmvMergeVals}
import graft.operators.{AnnotationJoin, Curation, Dedup, EventAnalytics, GraphAlgos, Multimodal, Packing, ProductQuantization, Sampling, Sessions, Similarity, TextAnalysis, TextDedup}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a scale
  * extension), expressed Spark-first; `oracleSql` carries the equivalent
  * DuckDB SQL over the same parquet tables. Column names/aliases match
  * between the two exactly — the driver's compare hashes values under
  * name-sorted columns.
  */
object SparkEntry {

  /** Flagship: generalized as-of annotation join (the reference's hallmark
    * operation, cloud/bq/ops.go:234-253). Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    AnnotationJoin.annotateAsOf(
      Tables.measurementsDaily(spark, dir),
      Tables.annotationsDaily(spark, dir))
  }

  // The single faithful job date used by partition-scoped ops; chosen for
  // non-trivial row counts at sf0.01 (41 measurement rows on 1995-08-09).
  private val JobDate = LocalDate.parse("1995-08-09")
  private val JobDateSql = "DATE '1995-08-09'"
  private val JobDatePrevSql = "DATE '1995-08-08'"

  private def mMonthly(s: SparkSession, dir: String) = Tables.measurementsMonthly(s, dir)
  private def mDaily(s: SparkSession, dir: String) = Tables.measurementsDaily(s, dir)
  private def ann(s: SparkSession, dir: String) = Tables.annotationsDaily(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- W1 + J2: v2 keep-set dedup (cloud/bq/ops.go:184-218) ----
    "w1_dedup_keepset" -> ((s, dir) =>
      Dedup.keepLatest(mMonthly(s, dir), Seq("id", "date"), col("parser_time"))),
    "j2_dedup_deleted_set" -> ((s, dir) =>
      Dedup.deletedSet(mMonthly(s, dir), Seq("id", "date"), col("parser_time"))),

    // ---- J3: explicit runtime bloom-filter semi join — the 100 TB
    //      fact-reduction shape. The urgent-order key set is too big to
    //      broadcast at scale, so a 1 MiB deterministic bloom of its
    //      keys pre-filters the lineitem scan BEFORE the exchange; the
    //      exact semi join on the survivors removes false positives, so
    //      rows are bit-identical to the plain semi join while the
    //      fact-side shuffle shrinks to ~the dim selectivity ----
    "j3_bloom_semijoin" -> ((s, dir) =>
      graft.operators.RuntimeFilter.bloomSemiJoin(
        Tables.lineitem(s, dir),
        Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity") * 100).cast("long")).cast("long")
            .as("sum_qty_e2"),
          count(lit(1)).as("n_lines"))),

    // same keep-set semantics, skew-resistant physical shape
    // (agg + AQE-splittable semi-join instead of a window sort)
    "w1_dedup_keepset_skew" -> ((s, dir) =>
      Dedup.keepLatestForSkew(mMonthly(s, dir), Seq("id", "date"), col("parser_time"))),

    // ---- W2: legacy ranked dedup, multi-key mixed-direction priority
    //      order (cloud/bq/dedup.go:23-38). Aggregate form: the total
    //      ordering over non-null columns lets min_by replace the
    //      windowed row_number sort — one map-side-combined hash
    //      aggregate instead of shuffling and sorting every row ----
    "w2_dedup_ranked" -> ((s, dir) =>
      Dedup.rankedFirstAgg(
        mMonthly(s, dir),
        Seq(col("id"), col("date")),
        Seq(col("l_quantity").desc, col("l_returnflag").asc,
          col("parser_time").desc, col("l_orderkey").asc, col("l_linenumber").asc))),

    // ---- duplicate-stats pre-check: groups a keep-set dedup would
    //      shrink — the "very cheap if no duplicates" gate
    //      (cloud/bq/ops.go:188) as a first-class query ----
    "w5_duplicate_stats" -> ((s, dir) =>
      Dedup.duplicateStats(mMonthly(s, dir), Seq("id", "date"),
        col("parser_time"))),

    // ---- P5: compound key-equality on NESTED fields — dedup keyed by
    //      parser.Time inside a STRUCT, as the reference's templates do
    //      (cloud/bq/ops.go:200-203,214-217) ----
    "p5_dedup_nested_key" -> ((s, dir) => {
      val m = mMonthly(s, dir)
        .withColumn("parser", struct(col("parser_time").as("Time")))
      Dedup.keepLatest(m, Seq("id", "date"), col("parser.Time")).drop("parser")
    }),

    // ---- W4: legacy traceroute dedup — stringified-timestamp concat key,
    //      latest-parse-wins (cloud/bq/dedup.go:55-68) ----
    "w4_dedup_ts_concat_key" -> ((s, dir) =>
      Dedup.rankedFirst(
        Tables.events(s, dir),
        Seq(concat(date_trunc("hour", col("ts")).cast("string"), lit("|"),
          col("user_id").cast("string"))),
        Seq(col("ts").desc, col("event_id").asc))),

    // ---- S1: schema'd newline-delimited-JSON scan (cloud/bq/ops.go:130-155,
    //      SourceFormat=JSON). Stages the documents table as JSONL under
    //      target/ (idempotent overwrite), then reads it back with an
    //      explicit schema — the load path's scan; oracle reads the
    //      original parquet, so the JSON round trip must be lossless ----
    "s1_load_json" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stage = s"/root/repo/target/s1_stage/${new java.io.File(dir).getName}"
      docs.write.mode("overwrite").json(stage)
      s.read.schema(docs.schema).json(stage)
    }),

    // ---- S1 dual: delimited-text (CSV) scan — same load path as the
    //      JSON scan, second wire format; oracle reads the original
    //      parquet, so the CSV round trip must be lossless. Losslessness
    //      needs three non-default options — multiLine=true on the read
    //      (an embedded newline in a quoted text field must not split
    //      the record) and a distinct nullValue token on BOTH sides so
    //      a null text and an empty-string text survive the trip as
    //      themselves — plus the backslash escape CsvLossless applies,
    //      without which a data value literally equal to the null token
    //      would be read back as null (quoting does not protect it) ----
    "s1_load_csv" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stage = s"/root/repo/target/s1_stage_csv/${new java.io.File(dir).getName}"
      graft.sources.CsvLossless.write(docs, stage)
      graft.sources.CsvLossless.read(s, docs.schema, stage)
    }),

    // ---- S1 dual: gzip-compressed JSONL — the reference's archives are
    //      gzipped; Spark's text source decodes per file transparently
    //      (.gz is unsplittable: one task per file, so archives must be
    //      many small files — exactly the reference's layout) ----
    "s1_load_json_gz" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stage = s"/root/repo/target/s1_stage_gz/${new java.io.File(dir).getName}"
      docs.write.mode("overwrite").option("compression", "gzip").json(stage)
      s.read.schema(docs.schema).json(stage)
    }),

    // ---- S1 dual: columnar ORC scan — third wire format through the
    //      same load path ----
    "s1_load_orc" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stage = s"/root/repo/target/s1_stage_orc/${new java.io.File(dir).getName}"
      docs.write.mode("overwrite").orc(stage)
      s.read.schema(docs.schema).orc(stage)
    }),

    // ---- S1 dual: bzip2-compressed JSONL — the one SPLITTABLE text
    //      codec in the stock codec set: unlike .gz (one task per file),
    //      a single large .bz2 archive file still fans out across tasks
    //      at block granularity — the codec to reach for when an archive
    //      arrives as one big file instead of the reference's many-small
    //      layout ----
    "s1_load_json_bz2" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val stage = s"/root/repo/target/s1_stage_bz2/${new java.io.File(dir).getName}"
      docs.write.mode("overwrite").option("compression", "bzip2").json(stage)
      s.read.schema(docs.schema).json(stage)
    }),

    // ---- W3: legacy concat-composite-key dedup (cloud/bq/dedup.go:41-53) ----
    "w3_dedup_concat_key" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      Dedup.rankedFirst(
        li,
        Seq(concat(col("l_returnflag"), lit("|"), (col("l_partkey") % 50).cast("string"))),
        Seq(col("l_shipdate").desc, col("l_orderkey").asc, col("l_linenumber").asc))
    }),

    // ---- J1 + S4: faithful single-partition annotation join
    //      (cloud/bq/ops.go:234-253) ----
    "j1_annotation_join" -> ((s, dir) =>
      AnnotationJoin.annotatePartition(mDaily(s, dir), ann(s, dir), JobDate)),

    // ---- J1 generalized: as-of annotation of every partition ----
    "j1_asof_all_days" -> ((s, dir) =>
      AnnotationJoin.annotateAsOf(mDaily(s, dir), ann(s, dir))),

    // ---- P1/S2: partition-date equality filter = partition copy content
    //      (cloud/bq/ops.go:158-176,192) ----
    "s2_copy_partition" -> ((s, dir) =>
      mDaily(s, dir).filter(col("date") === lit(java.sql.Date.valueOf(JobDate)))),

    // ---- S3: partition delete — the surviving complement ----
    "s3_delete_remaining" -> ((s, dir) =>
      mDaily(s, dir).filter(col("date") =!= lit(java.sql.Date.valueOf(JobDate)))),

    // ---- P2: as-of window range filter (cloud/bq/ops.go:247) ----
    "p2_asof_window" -> ((s, dir) =>
      ann(s, dir).filter(col("date").between(
        lit(java.sql.Date.valueOf(JobDate.minusDays(1))),
        lit(java.sql.Date.valueOf(JobDate))))),

    // ---- P3: projection with column exclusion (SELECT * EXCEPT(...)) ----
    "p3_select_except" -> ((s, dir) =>
      mMonthly(s, dir).drop("parser_time", "l_linenumber", "l_suppkey")),

    // ---- S6: manifest-stats data skipping — stage lineitem into a tx
    //      warehouse table range-clustered on l_orderkey (8 files with
    //      disjoint key ranges), then answer a key-range aggregate
    //      through readWhere: the per-file min/max recorded in the
    //      commit log prove 7 of the 8 files empty for the predicate
    //      BEFORE Spark opens a footer. The oracle computes the same
    //      aggregate from the raw parquet — pruning must be invisible
    //      in the result. Staged ONCE per warehouse root (the committed
    //      tx version is the guard — an interrupted stage left version
    //      0 and restages), so like dd_incremental_indexed the measured
    //      time is the steady-state PROBE against the maintained
    //      layout, which is the part that scales: at archive depth the
    //      query cost follows the files that OVERLAP the range, not
    //      the table's file count ----
    "s6_stats_prune" -> ((s, dir) => {
      val root = s"/root/repo/target/s6_txstats/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "lineitem")
      if (wh.currentVersion(s, tbl) == 0L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        wh.append(s,
          Tables.lineitem(s, dir)
            .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"),
              col("l_shipdate"))
            .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
            .repartitionByRange(8, col("l_orderkey")), tbl)
      }
      wh.readWhere(s, tbl, col("l_orderkey").between(1000L, 5000L))
        .groupBy(col("l_returnflag"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- S7: incremental change-feed export — the CONSUMER of the tx
    //      manifest's CDF (readChangesBetween + IncrementalExport's
    //      exactly-once cursor chain). Staged once per warehouse root:
    //      orders arrive in two commits (a 2:1 hash split), and the
    //      export syncs after EACH — so the second sync reads only the
    //      second commit's files, O(new files) not a rescan. The query
    //      aggregates the export's content, which for an append-only
    //      table must equal the full table — the oracle computes the
    //      same aggregate from the raw parquet, so a double-exported or
    //      dropped increment breaks the hash. Like s6, the steady-state
    //      run is the PROBE against the already-built export, which is
    //      the part that scales: each poll costs the increment, never
    //      the archive ----
    "s7_changes_export" -> ((s, dir) => {
      val root = s"/root/repo/target/s7_txfeed/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      val ex = s"$root/export"
      if (graft.tableops.IncrementalExport.exportedVersion(s, ex) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s, o.filter(col("o_orderkey") % 3 =!= 0), tbl) // v1
        graft.tableops.IncrementalExport.sync(s, wh, tbl, ex)    // (0,1]
        wh.append(s, o.filter(col("o_orderkey") % 3 === 0), tbl) // v2
        graft.tableops.IncrementalExport.sync(s, wh, tbl, ex)    // (1,2]
      }
      graft.tableops.IncrementalExport.readExport(s, ex)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S9: TIME TRAVEL through the tx manifest — the table is staged
    //      as v1 (day 1) → v2 (day 2) → v3 (DELETE day 1), and the query
    //      reads AS OF v2: the aggregate must resurrect the day the
    //      CURRENT version deleted, exactly matching an oracle over the
    //      raw parquet both days derive from. If readAt ever leaked
    //      current-version state, day 1's group would vanish and the
    //      row/hash gates fail. Metadata-only resolution: the v2 live
    //      set comes from the manifest replay, no data rewrite ----
    "s9_time_travel" -> ((s, dir) => {
      val (wh, tbl) = stageTimeTravelTable(s, dir)
      wh.readAt(s, tbl, 2L)
        .groupBy(col("date"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S10: the retraction-aware snapshot diff (CDF dual of the
    //      change feed) over the same staged history: v1 → v3 must
    //      report day 2 as inserts and the deleted day 1 as deletes,
    //      file-granular from the manifests' live-set diff, value-
    //      matched against the raw parquet split ----
    "s10_snapshot_diff" -> ((s, dir) => {
      val (wh, tbl) = stageTimeTravelTable(s, dir)
      wh.diffSnapshots(s, tbl, 1L, 3L)
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("sum_key"))
    }),

    // ---- S11: keyed MERGE (upsert + delete) through the tx manifest —
    //      the table lands range-clustered on the key (v1), then ONE
    //      merge applies a disjoint change set derived arithmetically
    //      from orders: keys ≡0 (mod 13) among the loaded rows are
    //      DELETED, loaded keys ≡0 (mod 10) are UPDATED (status 'M',
    //      price +1), and the held-out keys ≡0 (mod 7) are INSERTED
    //      (status 'I', price +1). The oracle recomputes the merged
    //      table from raw parquet with the same arithmetic, so a
    //      dropped delete, double-applied upsert, or a file the stats
    //      pruning wrongly skipped all break the hash. Staged once per
    //      root (committed version ≥2 guards); the steady-state run is
    //      the read of the merged table ----
    // ---- S15: copy-on-write predicate DELETE (the GDPR/right-to-
    //      erasure path): orders staged range-clustered (8 files), then
    //      deleteWhere removes one status' residue class — stats prune
    //      the untouched key ranges, only hit files rewrite, and the
    //      readback must equal the oracle's NOT(predicate) over raw
    //      parquet. Snapshot/conflict semantics spec'd in
    //      DeleteWhereSpec; staged once per root ----
    "s15_delete_where" -> ((s, dir) => {
      val root = s"/root/repo/target/s15_delete/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s, o.repartitionByRange(8, col("o_orderkey")), tbl) // v1
        wh.deleteWhere(s, tbl, // v2
          col("o_orderstatus") === "F" &&
            pmod(col("o_orderkey"), lit(10)) === 3)
      }
      wh.read(s, tbl)
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S19: zero-rewrite schema evolution (column mapping): half
    //      the orders land, the price column is RENAMED (metadata-only
    //      — no file rewritten), the other half lands under the NEW
    //      name, a scratch column is DROPPED (tombstoned) — and the
    //      readback under the final names must equal raw parquet.
    //      Physical-name invariants, time travel, tombstones, pruning
    //      under rename: ColumnMappingSpec ----
    "s19_rename_evolve" -> ((s, dir) => {
      val root = s"/root/repo/target/s19_ddl/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 4L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("scratch", lit("tmp"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s, // v1: first half under the ORIGINAL name
          o.filter(pmod(col("o_orderkey"), lit(2)) === 0), tbl)
        wh.renameColumn(s, tbl, "o_totalprice", "price_usd") // v2
        wh.append(s, // v3: second half under the NEW logical name
          o.filter(pmod(col("o_orderkey"), lit(2)) === 1)
            .withColumnRenamed("o_totalprice", "price_usd"), tbl)
        wh.dropColumn(s, tbl, "scratch") // v4
      }
      wh.read(s, tbl)
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("price_usd") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S23: PARTITION-SPEC EVOLUTION (day→month, zero rewrite):
    //      v1 = January orders at DAY grain (one file per day), v2 =
    //      setPartitionSpec month (one metadata commit, no file
    //      touched), v3 = February orders at MONTH grain (one file).
    //      The readback is a date-range query SPANNING both
    //      generations — each file prunes under its own then-spec
    //      (files-opened pinned in PartitionEvolveSpec) and the result
    //      must equal the raw-parquet replay ----
    "s23_partition_evolve" -> ((s, dir) => {
      val root = s"/root/repo/target/s23_evolve/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 3L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .withColumn("date",
            date_add(lit(java.sql.Date.valueOf("2024-01-01")),
              pmod(col("o_orderkey"), lit(59)).cast("int")))
        wh.append(s, // v1: January generation, day grain
          o.filter(pmod(col("o_orderkey"), lit(59)) < 31), tbl)
        wh.setPartitionSpec(s, tbl, "month") // v2: evolve, no rewrite
        wh.append(s, // v3: February generation, month grain
          o.filter(pmod(col("o_orderkey"), lit(59)) >= 31), tbl)
      }
      wh.readWhere(s, tbl, col("date").between(
          lit(java.sql.Date.valueOf("2024-01-30")),
          lit(java.sql.Date.valueOf("2024-02-03"))))
        .groupBy(col("date"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long"))
            .as("sum_price_e2"))
    }),

    // ---- S24: merge-on-read DELETION VECTORS — the O(deleted rows)
    //      predicate delete. History: v1 = append, v2 = deleteWhereMor
    //      commits each hit file's row ordinals as a `D` manifest line
    //      (no data file touched), v3 = compact folds the vectors back
    //      into data bytes. The query reads BOTH states — time travel
    //      to v2 exercises the read-time (file, ordinal) anti-join,
    //      the current read proves the fold is row-identical — so one
    //      oracle gate pins vector application AND compaction folding ----
    "s24_delete_vectors" -> ((s, dir) => {
      val root = s"/root/repo/target/s24_dv/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 3L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s, o.repartitionByRange(8, col("o_orderkey")), tbl) // v1
        wh.deleteWhereMor(s, tbl, // v2: vectors only, zero rewrite
          col("o_orderstatus") === "F" &&
            pmod(col("o_orderkey"), lit(10)) === 3)
        wh.compact(s, tbl, smallBytes = 1L): Unit // v3: fold vectors
      }
      def agg(df: org.apache.spark.sql.DataFrame, stage: String) =
        df.groupBy(col("o_orderstatus").as("o_status"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_orderkey")).as("sum_key"),
            sum(floor(col("o_totalprice") * 100).cast("long"))
              .as("sum_price_e2"))
          .withColumn("stage", lit(stage))
      agg(wh.readAt(s, tbl, 2L), "mor")
        .unionByName(agg(wh.read(s, tbl), "folded"))
    }),

    // ---- S25: bucketed layout + STORAGE-PARTITIONED JOIN — both
    //      tables hash-clustered on their join key at write time
    //      (setBucketSpec: pmod(murmur3, 8) dir level + Spark's bucket
    //      file-name convention), so the fact-fact join runs with NO
    //      Exchange on either side: the shuffle was paid once at
    //      ingest, not per query. The plan pin asserts the elision;
    //      this oracle gate pins the VALUES (co-bucketing must place
    //      every key on both sides in the same bucket id or rows
    //      silently vanish — the hash-function-parity hazard) ----
    "s25_bucket_join" -> ((s, dir) => {
      val root = s"/root/repo/target/s25_bucket/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val to = wh.tablePath("bench", "orders")
      val tl = wh.tablePath("bench", "lineitem")
      if (wh.currentVersion(s, to) < 2L || wh.currentVersion(s, tl) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val d = java.sql.Date.valueOf("2024-01-01")
        wh.setBucketSpec(s, to, "o_orderkey", 8) // v1
        wh.append(s, Tables.orders(s, dir) // v2
          .select(col("o_orderkey"), col("o_orderstatus"))
          .withColumn("date", lit(d)), to)
        wh.setBucketSpec(s, tl, "l_orderkey", 8) // v1
        wh.append(s, Tables.lineitem(s, dir) // v2
          .select(col("l_orderkey"), col("l_quantity"),
            col("l_extendedprice"))
          .withColumn("date", lit(d)), tl)
      }
      wh.readBucketed(s, to)
        .join(wh.readBucketed(s, tl),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"),
          sum(floor(col("l_extendedprice") * 100).cast("long"))
            .as("sum_price_e2"))
    }),

    // ---- S20: RESTORE TABLE — the metadata-only undo. History: v1 =
    //      even-key day 1, v2 = odd-key day 2, v3 = day 1 deleted (the
    //      "oops"), v4 = restoreTo(2) resurrecting it in one manifest
    //      commit, no data rewrite. The current read must equal the
    //      FULL key set again; the undone delete stays visible to time
    //      travel underneath ----
    "s20_restore" -> ((s, dir) => {
      val root = s"/root/repo/target/s20_restore/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 4L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
        wh.append(s, o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))), tbl)
        wh.append(s, o.filter(col("o_orderkey") % 2 =!= 0)
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-02"))), tbl)
        wh.deletePartition(s, tbl, LocalDate.parse("2024-01-01")) // v3
        wh.restoreTo(s, tbl, 2L) // v4: undo the delete, zero rewrite
      }
      wh.read(s, tbl)
        .groupBy(col("date"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S22: zero-copy SHALLOW CLONE + fork isolation: clone the
    //      staged table AT v1 (before day 2 existed), run a predicate
    //      DELETE on the fork — the rewrite lands in the fork's own
    //      dir, the source keeps every row. One row proves both: the
    //      fork's surviving aggregate AND the untouched source count ----
    "s22_shallow_clone" -> ((s, dir) => {
      val root = s"/root/repo/target/s22_clone/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val src = wh.tablePath("bench", "orders")
      val fork = wh.tablePath("bench", "orders_fork")
      if (wh.currentVersion(s, fork) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir).select(col("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
        wh.append(s, o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))), src)
        wh.append(s, o.filter(col("o_orderkey") % 2 =!= 0)
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-02"))), src)
        wh.cloneTo(s, src, fork, version = 1L) // day-1 snapshot, no copy
        wh.deleteWhere(s, fork, col("o_orderkey") % 3 === 0) // fork-only
      }
      val srcRows = wh.read(s, src).count()
      wh.read(s, fork)
        .agg(count(lit(1)).as("fork_rows"),
          sum(col("o_orderkey")).as("fork_sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long"))
            .as("fork_sum_price_e2"))
        .withColumn("src_rows", lit(srcRows))
    }),

    // ---- S21: aggregate pushdown to METADATA — count(*)/count(col)/
    //      min/max answered from the manifest's per-file footer stats
    //      alone (zero file opens at any table size; the planner/ops
    //      "what key range does this table span" question for free).
    //      Runs over s9's staged history, so the numbers must reflect
    //      the LIVE set only (day 1 was deleted) ----
    "s21_fast_minmax" -> ((s, dir) => {
      val (wh, tbl) = stageTimeTravelTable(s, dir)
      val st = wh.fastColumnStats(s, tbl, "o_orderkey")
        .getOrElse(sys.error("manifest stats must cover the staged table"))
      import s.implicits._
      Seq((st.rows, st.nonNull, st.min.get, st.max.get))
        .toDF("n_rows", "n_keys", "min_key", "max_key")
    }),

    // ---- S18: incremental view maintenance: a grouped sum/count view
    //      kept current across append -> predicate DELETE -> predicate
    //      UPDATE by applying O(changed files) deltas (diffSnapshots
    //      CDC; file-granular insert/delete pairs cancel in linear
    //      aggregates), each application one atomic exactly-once
    //      mergeIntoTxn commit. The readback must equal the oracle's
    //      from-scratch aggregate over the final state ----
    "s18_incr_agg" -> ((s, dir) => {
      val root = s"/root/repo/target/s18_ivm/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val src = wh.tablePath("bench", "orders")
      val view = wh.tablePath("bench", "orders_by_status")
      val D = LocalDate.parse("2024-01-01")
      if (wh.currentVersion(s, view) < 3L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"),
            floor(col("o_totalprice") * 100).cast("long").as("p_e2"))
          .withColumn("date", lit(java.sql.Date.valueOf(D)))
        def maintain(): Unit = {
          graft.tableops.IncrementalAgg.maintainSumView(s, wh, src, view,
            Seq("o_orderstatus"), "n_rows",
            Seq("sum_key" -> "o_orderkey", "sum_price_e2" -> "p_e2"),
            "ivm_s18", D)
          ()
        }
        wh.append(s, o.repartitionByRange(8, col("o_orderkey")), src) // v1
        maintain() // bootstrap
        wh.deleteWhere(s, src, col("o_orderstatus") === "F" && // v2
          pmod(col("o_orderkey"), lit(10)) === 3)
        maintain() // incremental: one partition's churn
        wh.updateWhere(s, src, col("o_orderstatus") === "O" && // v3
          pmod(col("o_orderkey"), lit(7)) === 2,
          Map("o_orderstatus" -> lit("U")))
        maintain() // group-moving churn; survivors cancel
      }
      wh.read(s, view)
        .select(col("o_orderstatus").as("o_status"), col("n_rows"),
          col("sum_key"), col("sum_price_e2"))
    }),

    // ---- S16: copy-on-write predicate UPDATE (deleteWhere's sibling):
    //      orders staged range-clustered, then updateWhere rewrites one
    //      status' residue class (two SET columns, old-row scope) —
    //      stats prune untouched key ranges, only hit files rewrite,
    //      readback equals the oracle's CASE-mapped raw parquet. SET
    //      scope/typing/partition-move semantics in UpdateWhereSpec ----
    "s16_update_where" -> ((s, dir) => {
      val root = s"/root/repo/target/s16_update/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s, o.repartitionByRange(8, col("o_orderkey")), tbl) // v1
        wh.updateWhere(s, tbl, // v2
          col("o_orderstatus") === "O" &&
            pmod(col("o_orderkey"), lit(7)) === 2,
          Map("o_orderstatus" -> lit("U"),
            "o_totalprice" -> (col("o_totalprice") + lit(5.0))))
      }
      wh.read(s, tbl)
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S17: bin-packing compaction (OPTIMIZE): orders land as 16
    //      small appends (the streaming-ingest small-file shape), then
    //      compact packs each partition manifest-only-planned +
    //      coalesce (no shuffle) — the readback must equal raw parquet,
    //      proving the swap is rows-identical. Layout/fence/time-travel
    //      invariants in CompactSpec ----
    "s17_compact" -> ((s, dir) => {
      val root = s"/root/repo/target/s17_compact/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 17L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
          .cache()
        (0 until 16).foreach { i => // v1..v16: 16 small files
          wh.append(s,
            o.filter(pmod(col("o_orderkey"), lit(16)) === i).coalesce(1), tbl)
        }
        o.unpersist()
        wh.compact(s, tbl) // v17: one packed file
      }
      wh.read(s, tbl)
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    "s11_merge_upsert" -> ((s, dir) => {
      val (wh, tbl) = stageMergeTable(s, dir)
      wh.read(s, tbl)
        .groupBy(col("o_orderstatus").as("o_status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S13: ROW-level change-data-feed — rowDiff classifies each
    //      key across the s11 merge (v1 → v2) as insert/delete/update,
    //      reading ONLY the files the merge touched (O(churn)); the
    //      merge's unchanged survivors re-landed in the rewritten files
    //      appear on both sides value-equal and MUST drop out — an
    //      over-report breaks the row gate, a mis-classification the
    //      hash. Oracle derives the three classes arithmetically ----
    "s13_row_diff" -> ((s, dir) => {
      val (wh, tbl) = stageMergeTable(s, dir)
      wh.rowDiff(s, tbl, 1L, 2L, Seq("o_orderkey"))
        .groupBy(col("_change_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("o_orderkey")).as("sum_key"))
    }),

    // ---- S12: BLOOM-FILTER data skipping — the scattered-key point
    //      probe min/max ranges cannot prune. orders lands HASH-
    //      distributed across 16 files (every file's key range spans
    //      the domain — range skipping provably inert) with the bloom
    //      property on o_orderkey, and the query answers a 5-key IN
    //      probe through readWhere: only bloom-positive files are
    //      opened (~5 of 16 at fpp 0.01). The oracle runs the same IN
    //      over raw parquet — a false NEGATIVE (wrongly pruned file)
    //      would drop a row and break the hash. Staged once per root ----
    "s12_bloom_point" -> ((s, dir) => {
      val root = s"/root/repo/target/s12_bloom/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) < 2L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        wh.setBloomFilter(s, tbl, "o_orderkey", // v1
          expectedItemsPerFile = 200000L, fpp = 0.01)
        wh.append(s, // v2
          Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
            .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
            .repartition(16, col("o_orderkey")), tbl)
      }
      wh.readWhere(s, tbl,
          col("o_orderkey").isin(11L, 22L, 33L, 44L, 55L))
        .select(col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100).cast("long").as("price_e2"))
    }),

    // ---- S14: TIMESTAMP-stats skipping — the event-time dual of s6:
    //      orders land range-clustered on o_orderdate (8 files with
    //      disjoint time ranges, written TIMESTAMP_MICROS), and a
    //      one-year window aggregate runs through readWhere: the
    //      manifest's micros min/max prove most files empty before any
    //      footer opens. The oracle computes the same window over raw
    //      parquet — pruning must be invisible in the result ----
    "s14_time_prune" -> ((s, dir) => {
      val root = s"/root/repo/target/s14_timeprune/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "orders")
      if (wh.currentVersion(s, tbl) == 0L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        wh.append(s,
          Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_orderdate"), col("o_totalprice"))
            .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
            .repartitionByRange(8, col("o_orderdate")), tbl)
      }
      wh.readWhere(s, tbl,
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("sum_price_e2"))
    }),

    // ---- S8: Z-ORDER layout + manifest-stats skipping — the
    //      multi-dimensional dual of s6. lineitem lands z-clustered on
    //      (l_orderkey, l_partkey) (ZOrder.layout: quantile-bucketed
    //      bit interleave, 16 files each covering a tight box in BOTH
    //      keys), then a 2-D box aggregate runs through readWhere: the
    //      per-file min/max prove most files empty for the box — a
    //      lexicographic layout would only ever prune on the leading
    //      key. The oracle computes the same aggregate from the raw
    //      parquet, so the interleave + pruning must be invisible in
    //      the result. Staged once per warehouse root (committed tx
    //      version guards, like s6); the measured steady state is the
    //      probe against the maintained layout — at archive scale the
    //      box query opens O(files overlapping the box), ~N^(1/2) of N
    //      for a 2-D layout, not O(table) ----
    "s8_zorder_prune" -> ((s, dir) => {
      val root = s"/root/repo/target/s8_txz/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val tbl = wh.tablePath("bench", "lineitem")
      if (wh.currentVersion(s, tbl) == 0L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
            col("l_quantity"))
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
        wh.append(s,
          graft.tableops.ZOrder.layout(li, Seq("l_orderkey", "l_partkey"), 16),
          tbl)
      }
      wh.readWhere(s, tbl,
          col("l_orderkey").between(1000L, 3000L) &&
          col("l_partkey").between(100L, 400L))
        .groupBy(col("l_returnflag"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"),
          count(lit(1)).as("n_rows"),
          sum(col("l_partkey")).as("sum_part"))
    }),

    // ---- S5: partition stats (listing/metrics analog,
    //      tracker/job.go:124-149) ----
    "s5_partition_stats" -> ((s, dir) =>
      mDaily(s, dir).groupBy(col("date"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("id")).as("n_ids"),
          // Sums over doubles use floor-scaled integers: exact,
          // order-independent, and identical across engines.
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"))),

    // ---- Headline aggregation (bench + oracle; scaled-integer-exact sums) ----
    "q1_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(floor(col("l_quantity") * 100).cast("long")).as("sum_qty_e2"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_base_price_e2"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long")).as("sum_disc_price_e2"),
          count(lit(1)).as("count_order"))
    }),

    // ---- Multi-way star join: lineitem ⋈ orders ⋈ customer with
    //      selective dimension filters (Catalyst broadcasts the filtered
    //      dims; the fact table never shuffles before the aggregate) ----
    // ---- TPC-H Q5 analog: 6-table star-snowflake join (region →
    //      nation → customer → orders → lineitem ← supplier with the
    //      local-supplier co-nation condition). Declarative joins +
    //      selective dim filters: Catalyst broadcasts every dimension
    //      chain and the fact table reaches the aggregate without a
    //      pre-join shuffle ----
    "q5_local_supplier_volume" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      r.filter(col("r_name") === "ASIA")
        .join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_e2"))
    }),

    // ---- multi-grain OLAP rollup: revenue at (nation, year, month),
    //      (nation, year), (nation), and grand-total grain in ONE pass —
    //      Catalyst plans Expand (4 grouping sets per input row) with
    //      partial aggregation BEFORE the exchange, so the shuffle
    //      carries pre-combined group cells, not the fact stream ×4.
    //      Per-row floor-to-cents before the sum keeps every grain an
    //      exact integer; explicit grouping flags disambiguate a rolled
    //      NULL from a data NULL ----
    "q23_rollup_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      n.join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          month(col("o_orderdate")).cast("int").as("o_month"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("rev"))
        // pre-aggregate to the finest grouping grain BEFORE the Expand:
        // sum and count are re-aggregable, so rolling up partial sums is
        // value-identical, and Expand multiplies ~|nation×year×month|
        // grain rows instead of every join output row (guide §2.3
        // "aggregate before you shuffle" applied to grouping sets)
        .groupBy(col("n_name"), col("o_year"), col("o_month"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("cnt"))
        .rollup(col("n_name"), col("o_year"), col("o_month"))
        .agg(sum(col("rev")).as("revenue_e2"),
          sum(col("cnt")).as("n_rows"),
          grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("o_year")).cast("int").as("g_year"),
          grouping(col("o_month")).cast("int").as("g_month"))
    }),

    // ---- CUBE: all 2³ grain combinations of (nation, year, month) in
    //      ONE pass — same Expand-feeds-partial-aggregate plan shape as
    //      q23's ROLLUP (plan-pinned), 8 grouping sets instead of 4.
    //      Exact-integer measures; grouping flags disambiguate a real
    //      NULL from a rolled-up level ----
    "q24_cube_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      n.join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          month(col("o_orderdate")).cast("int").as("o_month"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("rev"))
        // same pre-aggregate-before-Expand shape as q23: the 8-way CUBE
        // Expand multiplies grain rows, not join output rows
        .groupBy(col("n_name"), col("o_year"), col("o_month"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("cnt"))
        .cube(col("n_name"), col("o_year"), col("o_month"))
        .agg(sum(col("rev")).as("revenue_e2"),
          sum(col("cnt")).as("n_rows"),
          grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("o_year")).cast("int").as("g_year"),
          grouping(col("o_month")).cast("int").as("g_month"))
    }),

    // ---- arbitrary GROUPING SETS: the exact grain list a reporting
    //      layer asks for — (nation, year), (nation), (month), () —
    //      declared in SQL (the Dataset API exposes only rollup/cube;
    //      grouping-set lists are a SQL surface in Spark as in every
    //      engine), still one Expand + one aggregate, no self-union ----
    "q25_grouping_sets" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      n.join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          month(col("o_orderdate")).cast("int").as("o_month"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("rev"))
        // same pre-aggregate-before-Expand shape as q23/q24
        .groupBy(col("n_name"), col("o_year"), col("o_month"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("cnt"))
        .createOrReplaceTempView("q25_f")
      s.sql(
        """SELECT n_name, o_year, o_month,
          |  sum(rev) AS revenue_e2, sum(cnt) AS n_rows,
          |  CAST(grouping(n_name) AS INT) AS g_nation,
          |  CAST(grouping(o_year) AS INT) AS g_year,
          |  CAST(grouping(o_month) AS INT) AS g_month
          |FROM q25_f
          |GROUP BY GROUPING SETS ((n_name, o_year), (n_name),
          |  (o_month), ())""".stripMargin)
    }),

    // ---- TPC-H Q6 analog: the pure scan-efficiency headliner — every
    //      predicate pushes into the parquet scan (PushedFilters), only
    //      two columns are read, and the single global sum partial-
    //      aggregates per partition before a one-row exchange ----
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(floor(col("l_extendedprice") * col("l_discount") * 100)
          .cast("long")).as("revenue_e2"))),

    // ---- TPC-H Q18 analog: large-volume orders — the heavy-hitter
    //      aggregate (map-side-combined sum over the fact table) gates
    //      the join; the surviving order set is tiny, so both joins
    //      broadcast it rather than shuffling orders/customer ----
    "q18_large_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 180)
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          floor(col("o_totalprice") * 100).cast("long").as("total_e2"),
          col("sum_qty"))
    }),

    // ---- TPC-H Q10 analog: top-20 customers by returned-item revenue
    //      in a quarter — selective filters reach both scans, the
    //      customer dim broadcasts, and the top-20 plans as
    //      TakeOrderedAndProject (per-partition bounded heaps + driver
    //      merge, no global sort) ----
    "q10_returned_items" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .join(li.filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_e2"))
        .orderBy(col("revenue_e2").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- TPC-H Q4 analog: order-priority checking — the EXISTS
    //      subquery plans as a LEFT SEMI join (each order counted once
    //      no matter how many qualifying lineitems), with both filters
    //      pushed into their scans ----
    "q4_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      o.filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .join(li.filter(col("l_returnflag") === "R").select(col("l_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // ---- TPC-H Q14 analog: promotion revenue share — ONE fact-dim
    //      broadcast join feeding a conditional aggregate; numerator
    //      and denominator emitted separately (a ratio of floats has no
    //      stable hash) ----
    "q14_promo_revenue" -> ((s, dir) => {
      val rev = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
        .cast("long")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00")))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(0L)).as("promo_e2"),
          sum(rev).as("total_e2"))
    }),

    // ---- TPC-H Q19 analog: discounted revenue under an OR-of-ANDs
    //      predicate spanning BOTH join sides — the disjunction can't
    //      push below the join, but each disjunct's single-side
    //      conjuncts are extracted by Catalyst
    //      (p_brand IN (…) / p_size/l_quantity ranges reach the scans)
    //      and the dim side broadcasts ----
    "q19_brand_revenue" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_e2"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q7 analog: volume between two nations — the nation
    //      dims broadcast into both fact chains; the pair disjunction
    //      filters AFTER the joins (it spans both sides) while the
    //      2-nation IN envelope pushes to each dim scan ----
    "q7_nation_volume" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val su = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val pair = Seq("NATION_3", "NATION_7")
      val n1 = broadcast(n.filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation")))
      val n2 = broadcast(n.filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2k"), col("n_name").as("cust_nation")))
      li.filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .join(broadcast(su), col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("n1k"))
        .join(n2, col("c_nationkey") === col("n2k"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_e2"))
    }),

    // ---- TPC-H Q13 analog: customer order-count distribution — the
    //      LEFT join keeps order-less customers (c_count = 0), then a
    //      second aggregation histograms the counts ----
    "q13_cust_distribution" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))),

    // ---- TPC-H Q15 analog: top supplier(s) by quarter revenue — the
    //      max resolves as a one-row broadcast joined back (the scalar-
    //      subquery shape), never a global sort ----
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("total_e2"))
      rev.join(broadcast(rev.agg(max(col("total_e2")).as("mx"))),
          col("total_e2") === col("mx"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("s_suppkey") === col("l_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_e2"))
    }),

    // ---- TPC-H Q17 analog: small-quantity revenue for one brand — the
    //      correlated `l_quantity < 0.2·avg(per part)` decorrelates to a
    //      per-part aggregate joined back; the threshold compares in
    //      EXACT integers (5·cnt·qty_e2 < sum_qty_e2, the e2-quantized
    //      form of qty < sum/(5·cnt)) so no float average crosses
    //      engines ----
    "q17_small_quantity" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val smallParts = broadcast(Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23").select("p_partkey"))
      val branded = li.join(smallParts, col("l_partkey") === col("p_partkey"))
      val perPart = branded.groupBy(col("l_partkey").as("pk"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("sum_q_e2"),
          count(lit(1)).as("cnt"))
      branded.join(perPart, col("l_partkey") === col("pk"))
        .filter(lit(5L) * col("cnt") * floor(col("l_quantity") * 100).cast("long")
          < col("sum_q_e2"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_price_e2"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- TPC-H Q22 analog: idle above-average-balance customers — the
    //      global average rides as a one-row broadcast (threshold in
    //      exact integers: cnt·bal_e2 > sum_e2), order-less-ness is an
    //      ANTI join ----
    "q22_idle_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val pos = c.filter(col("c_acctbal") > 0.0)
      val stats = broadcast(pos.agg(
        sum(floor(col("c_acctbal") * 100).cast("long")).as("sum_e2"),
        count(lit(1)).as("cnt")))
      pos.crossJoin(stats)
        .filter(col("cnt") * floor(col("c_acctbal") * 100).cast("long")
          > col("sum_e2"))
        .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >=
              lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(floor(col("c_acctbal") * 100).cast("long")).as("totacctbal_e2"))
    }),

    "q3_shipping_priority" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      c.filter(col("c_mktsegment") === "BUILDING")
        .join(o, col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit(java.sql.Date.valueOf("1995-03-15")))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > lit(java.sql.Date.valueOf("1995-03-15")))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_e2"))
    }),

    // ---- TPC-H Q2 analog: minimum-cost supplier — the correlated
    //      scalar-min subquery (cost = MIN over the part's offers)
    //      decorrelates to a per-part min aggregate joined back on
    //      equality. No partsupp in this schema: lineitem stands in as
    //      the (part, supplier, price) offer relation; region-scoped
    //      suppliers and the filtered part set both broadcast, so the
    //      only shuffle is the per-part min and its join-back ----
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eur = broadcast(Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name")))
      val parts = broadcast(Tables.part(s, dir)
        .filter(col("p_size") === 15 && col("p_type") === "SMALL")
        .select(col("p_partkey"), col("p_brand")))
      val offers = Tables.lineitem(s, dir)
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
          floor(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      val minPrice = offers.groupBy(col("p_partkey").as("mp_partkey"))
        .agg(min(col("price_e2")).as("min_e2"))
      offers.join(minPrice, col("p_partkey") === col("mp_partkey") &&
          col("price_e2") === col("min_e2"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
          col("price_e2")).distinct()
    }),

    // ---- TPC-H Q8 analog: national market share — nested aggregation
    //      re-expressed as one pass with a conditional sum (the inner
    //      per-year total and the nation's slice come from the SAME
    //      grouped aggregate; the share stays a pair of exact integers
    //      instead of a float ratio). Two nation joins under different
    //      roles (customer's region gate, supplier's nation tag) ----
    "q8_market_share" -> ((s, dir) => {
      val n = Tables.nation(s, dir)
      val custSide = Tables.customer(s, dir)
        .join(n.select(col("n_nationkey").as("cn_key"),
          col("n_regionkey").as("cn_region")),
          col("c_nationkey") === col("cn_key"))
        .join(Tables.region(s, dir).filter(col("r_name") === "AMERICA"),
          col("cn_region") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = broadcast(Tables.supplier(s, dir)
        .join(n.select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation")),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation")))
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(custSide, col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_7",
            floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
              .cast("long")).otherwise(0L)).as("nation_e2"),
          sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long")).as("total_e2"))
    }),

    // ---- TPC-H Q9 analog: product-type profit by nation and year —
    //      the 5-table join tags every line with its supplier's nation
    //      and order year; profit = revenue − cost uses the part's
    //      retail price as the cost base (no partsupp here), all in
    //      exact scaled integers so negatives cross engines intact ----
    "q9_product_profit" -> ((s, dir) => {
      val greens = broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice")))
      val suppNation = broadcast(Tables.supplier(s, dir)
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      Tables.lineitem(s, dir)
        .join(greens, col("l_partkey") === col("p_partkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long") -
          floor(col("p_retailprice") * 100).cast("long") *
            floor(col("l_quantity")).cast("long")).as("profit_e2"))
    }),

    // ---- TPC-H Q11 analog: important parts — the HAVING-against-a-
    //      scalar-subquery shape: a part qualifies when its value
    //      exceeds 1/2000 of the ENTIRE nation-scoped value. The global
    //      total rides as a one-row broadcast next to the per-part
    //      aggregate; the threshold compares exact integers
    //      (2000·part > total), never a float fraction ----
    "q11_important_parts" -> ((s, dir) => {
      val natSupp = broadcast(Tables.supplier(s, dir)
        .join(Tables.nation(s, dir).filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey")))
      val scoped = Tables.lineitem(s, dir)
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("v_e2"))
      val perPart = scoped.groupBy(col("l_partkey"))
        .agg(sum(col("v_e2")).as("value_e2"))
      perPart.crossJoin(broadcast(scoped.agg(sum(col("v_e2")).as("grand_e2"))))
        .filter(col("value_e2") * 2000L > col("grand_e2"))
        .select(col("l_partkey"), col("value_e2"))
    }),

    // ---- TPC-H Q12 analog: late-shipment priority counts — the
    //      join + dual conditional aggregation shape (high/low priority
    //      split per class). "Late" derives from the dates this schema
    //      carries: shipped >60 days after the order date ----
    "q12_late_shipments" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir)
            .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // ---- TPC-H Q16 analog: supplier diversity per part attribute —
    //      COUNT(DISTINCT) over an anti-joined pair set (suppliers on a
    //      deny-list — negative balance standing in for complaint
    //      comments — are excluded via LEFT ANTI, the NOT IN dual) ----
    "q16_supplier_cnt" -> ((s, dir) => {
      val excluded = broadcast(Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0.0).select(col("s_suppkey")))
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // ---- TPC-H Q20 analog: excess suppliers — the nested-semi-join
    //      chain: suppliers qualify through (a) a semi join against the
    //      (part, supplier) shipment shares that (b) themselves qualify
    //      against a per-part total, over (c) a name-filtered part set.
    //      The 50% threshold is 2·sp > total in exact integers ----
    "q20_excess_suppliers" -> ((s, dir) => {
      val smallParts = broadcast(Tables.part(s, dir)
        .filter(col("p_name").like("small%")).select(col("p_partkey")))
      val y96 = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          floor(col("l_quantity") * 100).cast("long").as("q_e2"))
      val bySupp = y96.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("q_e2")).as("sp_e2"))
      val byPart = y96.groupBy(col("l_partkey").as("tp_key"))
        .agg(sum(col("q_e2")).as("total_e2"))
      val excess = bySupp.join(byPart, col("l_partkey") === col("tp_key"))
        .filter(col("sp_e2") * 2L > col("total_e2"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // ---- TPC-H Q21 analog: suppliers who kept orders waiting — the
    //      anti+semi SELF-join: a late line qualifies only when the
    //      order has ANOTHER supplier's line (semi) and NO other
    //      supplier was late on it (anti). Both self-join arms shuffle
    //      on the same order key, so the exchange is reused; the
    //      nation-scoped supplier dim broadcasts ----
    "q21_waiting_suppliers" -> ((s, dir) => {
      val lo = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .as("late"))
      val l1 = lo.filter(col("late"))
        .join(broadcast(Tables.supplier(s, dir)
          .join(Tables.nation(s, dir).filter(col("n_name") === "NATION_1"),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
      val others = lo.select(col("l_orderkey").as("o2_key"),
        col("l_suppkey").as("o2_supp"), col("late").as("o2_late"))
      l1.join(others, col("l_orderkey") === col("o2_key") &&
          col("l_suppkey") =!= col("o2_supp"), "left_semi")
        .join(others.filter(col("o2_late")),
          col("l_orderkey") === col("o2_key") &&
            col("l_suppkey") =!= col("o2_supp"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }),

    // ---- Events: tumbling-window aggregation (daily batch analog of the
    //      reference's per-day incremental model, SURVEY.md §2.7) ----
    "ev_hourly_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4"))),

    // ---- semi-structured: JSON path extraction from the embedded props
    //      column, aggregated per event type (codegen'd get_json_object —
    //      no decode UDF, no shuffle before the partial agg) ----
    "ev_props_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))),

    // ---- sliding-window aggregation: 1 h windows every 15 min (each
    //      event lands in 4 overlapping windows) ----
    "ev_sliding_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4"))
        .select(col("window.start").as("window_start"), col("n_events"),
          col("n_users"), col("sum_value_e4"))),

    // ======== scale extensions (SURVEY.md §7.5) ========

    // ---- text analysis ----
    "tx_token_count" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        col("n_chars"))),

    // BPE-ish subword tokens: letter runs / digit runs / single punctuation
    // (lookahead-free so the regex is portable to the RE2-based oracle)
    "tx_token_count_bpe" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit(TextAnalysis.BpeishPattern), lit(0))).cast("long").as("n_subtokens"))),

    "tx_language_id" -> ((s, dir) =>
      TextAnalysis.languageId(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang").as("lang_label"), col("text")),
        "text").drop("text")),

    "tx_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text")
        .select("doc_id", "n_tokens", "mean_tok_len_e2", "distinct_ratio_e4",
          "stopword_ratio_e4", "quality_e4")),

    // Gopher-style duplicate-n-gram repetition signal
    "tx_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(Tables.documents(s, dir), "text")
        .select("doc_id", "rep2_e4", "rep3_e4")),

    // ---- the published Gopher rule-set FILTER (Rae et al. 2021 A1.1):
    //      named per-rule flags + keep verdict, exact integer
    //      comparisons throughout — map-only, fused into the scan ----
    "tx_gopher_quality" -> ((s, dir) =>
      TextAnalysis.gopherQuality(Tables.documents(s, dir), "text")
        .select(Seq(col("doc_id"), col("n_tokens"), col("mean_word_len_e2")) ++
          Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
            "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
            "r_stopwords", "keep").map(f => col(f).cast("long").as(f)): _*)),

    "tx_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))),

    // ---- dedup family ----
    "dd_exact" -> ((s, dir) =>
      TextDedup.exactDedup(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")),

    "dd_ngram_jaccard" -> ((s, dir) =>
      TextDedup.lengthBandedJaccardPairs(Tables.documents(s, dir), "doc_id",
        "text", "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L)),

    // ---- asymmetric containment: |A∩B|/min(|A|,|B|) catches a short doc
    //      embedded in a long one, which Jaccard scores near 0 ----
    "dd_containment" -> ((s, dir) =>
      TextDedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        minContainE4 = 6000)),

    // hash-based tiers: not SQL-portable => rows-only driver check
    "dd_minhash_lsh" -> ((s, dir) =>
      TextDedup.minhashDedupPairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 32, bands = 8, minJaccardE4 = 5000L)),

    "dd_simhash" -> ((s, dir) =>
      TextDedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 6)),

    // ---- minhash sketch CALIBRATION: every LSH candidate pair with
    //      exact jaccard AND the 32-lane agreement estimate + abs
    //      error — the empirical 1/√n sketch-noise check on the corpus
    //      the tier dedups (the minhash analog of sim_ann_recall) ----
    "dd_minhash_calibration" -> ((s, dir) =>
      TextDedup.minhashCalibrationPairs(Tables.documents(s, dir), "doc_id",
        "text", numHashes = 32, bands = 8)),

    // ---- curation QA: near-dup rate per source — which source is
    //      duplicate-heavy (docs appearing in ≥1 qualifying pair / docs) ----
    "dd_dup_rate_by_source" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = TextDedup.lengthBandedJaccardPairs(docs, "doc_id", "text",
        "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L)
      val dupIds = pairs.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
        .distinct()
      docs.join(dupIds.withColumn("__dup", lit(1L)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("__dup"), lit(0L))).as("n_dup_docs"))
        .withColumn("dup_rate_e4",
          floor(col("n_dup_docs") * lit(10000.0) / col("n_docs")).cast("long"))
    }),

    // ---- classifier QA: language-ID confusion matrix (label vs pred) ----
    "tx_lang_confusion" -> ((s, dir) =>
      TextAnalysis.languageId(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang").as("lang_label"), col("text")),
        "text")
        .groupBy(col("lang_label"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))),

    // ---- benchmark decontamination: n-gram overlap vs an eval set ----
    // every 100th doc plays the benchmark; the rest are "training"
    "dd_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextDedup.decontaminate(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0),
        "doc_id", "text")
    }),

    // ---- incremental dedup: a new ingest batch filtered against the
    //      already-ingested corpus (fingerprint anti-join + cross-corpus
    //      MinHash-LSH; odd doc_ids play the new batch) ----
    "dd_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextDedup.incrementalNearDupFilter(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // ---- the same filter probing a MATERIALIZED signature index (the
    //      warehouse-scale path: the index is a table appended as
    //      batches archive, so a daily increment never re-reads the
    //      accumulated corpus' text — O(batch) not O(corpus)).
    //      Decision-identical to dd_incremental; same oracle SQL. The
    //      index is STAGED to parquet once per scale dir (like the s1
    //      load entries stage their wire format): passing the building
    //      plan directly would re-derive the seen signatures once per
    //      probe branch, and rebuilding per call would charge the
    //      archive-time build to every increment — in the warehouse the
    //      index pre-exists (copyToRaw maintains it) and the steady
    //      state this query models is the PROBE. The stage path carries
    //      a format version: bump it when nearDupIndex's schema or hash
    //      family changes, so a stale staged copy from older code can
    //      never satisfy the exists check ----
    "dd_incremental_indexed" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // the stage key carries the SOURCE file's identity (size + mtime)
      // alongside the scale-dir name, so regenerated testdata — or two
      // dirs sharing a basename — can never satisfy the build-once
      // check with an index of different data
      val srcFile = new java.io.File(s"$dir/documents.parquet")
      val stageRoot = new java.io.File("/root/repo/target/neardup_index_v1")
      val key = s"${new java.io.File(dir).getName}_${srcFile.length()}_${srcFile.lastModified()}"
      val stage = s"$stageRoot/$key"
      if (!new java.io.File(s"$stage/_SUCCESS").exists()) {
        // regenerated testdata gets a fresh key — drop this scale dir's
        // stale siblings so staged copies never accumulate unboundedly
        Option(stageRoot.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith(
            new java.io.File(dir).getName + "_") && f.getName != key)
          .foreach { old =>
            java.nio.file.Files.walk(old.toPath)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(p => { java.nio.file.Files.delete(p); () })
          }
        TextDedup.nearDupIndex(docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text").write.mode("overwrite").parquet(stage)
      }
      TextDedup.incrementalNearDupFilterIndexed(
        docs.filter(col("doc_id") % 2 === 1), s.read.parquet(stage),
        "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // ---- the signature index as a LIVE tx table maintained by the
    //      docs table's change feed: day-1 seed, day-2 append, then a
    //      deletion-vector correction — each increment merges only the
    //      changed documents' signature rows (O(changed files),
    //      watermarked exactly-once). The probe then runs against the
    //      maintained index; the oracle recomputes the decisions from
    //      the FINAL seen corpus, so an index that drifted (kept a
    //      deleted doc's signatures, missed an appended day) changes
    //      the kept-set and hash-fails ----
    "dd_incremental_feed" -> ((s, dir) => {
      val root = s"/root/repo/target/dd_incr_feed/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val docsT = wh.tablePath("corpus", "docs")
      val idxT = wh.tablePath("index", "signatures")
      val App = "sigidx"
      val docs = Tables.documents(s, dir)
      if (wh.lastTxn(s, idxT, App) < 3L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val seen = docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"))
        wh.append(s, seen.filter(col("doc_id") < 300) // v1: day 1
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))),
          docsT)
        graft.operators.TextDedup.nearDupIndexIncremental(s, wh, idxT,
          docsT, "doc_id", "text", App) // full build
        wh.append(s, seen.filter(col("doc_id") >= 300) // v2: day 2
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-02"))),
          docsT)
        wh.deleteWhereMor(s, docsT, // v3: MoR correction
          pmod(col("doc_id"), lit(10)) === 6)
        graft.operators.TextDedup.nearDupIndexIncremental(s, wh, idxT,
          docsT, "doc_id", "text", App) // v1 -> v3 increment
      }
      graft.operators.TextDedup.incrementalNearDupFilterIndexed(
        docs.filter(col("doc_id") % 2 === 1), wh.read(s, idxT),
        "doc_id", "text")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // ---- dedup family: embedding-cosine near-dup ----
    // exact within a predicate-bounded subset (oracled); the scale path is
    // the random-hyperplane LSH below (rows-only driver check — the
    // hyperplane hash mix needs wrapping 64-bit arithmetic the SQL oracle
    // lacks; exactness where buckets collide is spec-enforced)
    "dd_embed_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("vec_id") < 500, minCosE6 = 350000L)),

    // threshold is corpus-relative: the synthetic embeddings are near-
    // orthogonal (max pairwise cosine ~0.51), so 0.45 plays the "near
    // dup" band here; real corpora would run 0.95+ with the same plan.
    // Sizing keeps the operator's 8-bits-per-band discipline (256
    // buckets/band — sub-quadratic candidate growth; see the operator
    // scaladoc) and buys back the recall the fixture's low cosine band
    // costs with more bands: at p = 1−θ/π ≈ 0.65 (cos 0.45), 28 bands of
    // 8 bits give ~0.60 pair recall vs the old 16/4 sizing's ~0.54,
    // without its N²/8 bucket blow-up. Real corpora (cos ≥ 0.95 ⇒
    // p ≈ 0.90) reach 0.99 recall with the plain 64/8 defaults.
    "dd_embed_neardup_lsh" -> ((s, dir) =>
      Similarity.embedNearDupPairs(Tables.embeddings(s, dir), "vec_id",
        "embedding", minCosE6 = 450000L, dim = 64, nBits = 224, bands = 28)),

    // ---- similarity search ----
    "sim_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") < 10, k = 5)),

    // ---- multi-probe sign-LSH top-k (Lv et al. 2007): each query
    //      probes its band buckets plus all Hamming-1 bit flips —
    //      recall bought with query-side probes instead of more
    //      corpus-side tables; candidates exact-re-ranked. The
    //      candidate set itself is deterministic and replayed by the
    //      oracle, not just the final ranks ----
    "sim_lsh_multiprobe" -> ((s, dir) =>
      Similarity.lshMultiprobeTopK(Tables.embeddings(s, dir), "vec_id",
        "embedding", col("vec_id") < 10, k = 5)),

    // ---- MMR diversified top-k (Carbonell & Goldstein 1998): greedy
    //      λ·relevance − (1−λ)·max-sim-to-selected re-selection of 5
    //      from the 20-nearest shortlist — the retrieval-side dual of
    //      near-dup dedup (each pick must differ from what's shown).
    //      k unrolled distributed rounds over the persisted m²-pair
    //      sims; corpus touched only by the shortlist phase ----
    "sim_mmr_topk" -> ((s, dir) =>
      Similarity.mmrTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") < 10, m = 20, k = 5, lambdaPct = 70)),

    // ---- SQ8 scalar quantization: 4×-compressed byte codes, ranking by
    //      EXACT integer code distance (dim-bounded driver collect for
    //      the per-dimension bounds; everything else map-side) ----
    "sim_sq8_topk" -> ((s, dir) =>
      Similarity.sq8TopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") < 10, k = 5)),

    "sim_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        col("vec_id") < 10, k = 5)
    }),

    // ---- IVF over the MATERIALIZED assignment index — value-identical
    //      to sim_ivf_topk (same centroids, same probe order, same
    //      oracle SQL), staged as two ingest days (even/odd vectors:
    //      per-vector assignment composes across days) range-clustered
    //      on cent_id, so the probe reads only the index files of the
    //      queries' own clusters — O(files of probed clusters) at any
    //      archive depth, never a corpus re-assignment ----
    "sim_ivf_indexed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = emb.filter(col("vec_id") % 50 === 0)
      val root = s"/root/repo/target/ivf_index/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val assign = wh.tablePath("index", "ivf")
      if (!wh.exists(s, assign) || wh.dates(s, assign).size < 2) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        Similarity.indexEmbeddings(s, wh, assign,
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          cents, "vec_id", "embedding",
          java.time.LocalDate.parse("2024-01-01"))
        Similarity.indexEmbeddings(s, wh, assign,
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding",
          cents, "vec_id", "embedding",
          java.time.LocalDate.parse("2024-01-02"))
      }
      Similarity.ivfTopKIndexed(s, wh, assign, "vec_id",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        cents, "vec_id", "embedding", k = 5)
    }),

    // ---- the recall knob exercised: nprobe=2 probes each query's two
    //      nearest buckets (candidates ≈ 2/C of the corpus); the oracle
    //      replays the probe list, pinning multi-probe semantics —
    //      dedup-free because every corpus vector lives in exactly one
    //      bucket ----
    "sim_ivf_topk_np2" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        col("vec_id") < 10, k = 5, nprobe = 2)
    }),

    // ---- ANN quality report: per-query recall of the IVF probe against
    //      the exact brute-force top-k — the approximation MEASURED, not
    //      assumed (the number a pipeline watches when tuning nprobe /
    //      centroid count). Both sides are existing operators; the
    //      comparison is |probes|·k rows ----
    "sim_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val exact = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 5).select(col("query_id"), col("nbr_id"))
      val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        col("vec_id") < 10, k = 5).select(col("query_id"), col("nbr_id"))
      val hits = exact.join(approx, Seq("query_id", "nbr_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_exact"),
          floor(lit(10000.0) * coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_exact").cast("double")).cast("long").as("recall_e4"))
    }),

    // ---- semantic dedup (SemDeDup): cluster-bucketed embedding near-dup
    //      removal, lowest id per near pair survives ----
    "dd_semantic" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        minCosE6 = 350000L)
    }),

    // ---- kNN graph: every vector's top-3 neighbors within its IVF
    //      cluster (the self-join dual of sim_ivf_topk) ----
    "sim_knn_graph" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.knnGraph(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", k = 3)
    }),

    // ---- product quantization (PQ): the memory-light ANN tier — m=8
    //      subspaces × 16 codes over the 64-dim embeddings, one Lloyd
    //      iteration from the deterministic lowest-id init. Three oracled
    //      stages: trained codebook components, the encoded corpus (the
    //      m-bytes-per-vector index), and ADC top-k over it ----
    "emb_pq_codebooks" -> ((s, dir) =>
      ProductQuantization.trainCodebookComponents(Tables.embeddings(s, dir),
        "vec_id", "embedding", m = 8, dim = 64, ksub = 16, iters = 1)),

    "sim_pq_codes" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = ProductQuantization.assembleCodebook(
        ProductQuantization.trainCodebookComponents(emb, "vec_id", "embedding",
          m = 8, dim = 64, ksub = 16, iters = 1))
      ProductQuantization.encode(emb, "vec_id", "embedding", cb, m = 8, dim = 64)
    }),

    "sim_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = ProductQuantization.assembleCodebook(
        ProductQuantization.trainCodebookComponents(emb, "vec_id", "embedding",
          m = 8, dim = 64, ksub = 16, iters = 1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val codes = ProductQuantization.encode(emb, "vec_id", "embedding", cb,
        m = 8, dim = 64)
      ProductQuantization.adcTopK(emb, "vec_id", "embedding", codes, cb,
        col("vec_id") < 10, k = 5, m = 8, dim = 64)
    }),

    // ---- two-stage retrieval: ADC shortlist (compressed-domain, no
    //      corpus vector math) -> exact e6 distances on the shortlist
    //      only -> final top-k. The production ANN split: full vectors
    //      read for |queries|x shortlist rows, never the corpus ----
    "sim_pq_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = ProductQuantization.assembleCodebook(
        ProductQuantization.trainCodebookComponents(emb, "vec_id", "embedding",
          m = 8, dim = 64, ksub = 16, iters = 1))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val codes = ProductQuantization.encode(emb, "vec_id", "embedding", cb,
        m = 8, dim = 64)
      ProductQuantization.pqRerankTopK(emb, "vec_id", "embedding", codes, cb,
        col("vec_id") < 10, k = 5, shortlist = 20, m = 8, dim = 64)
    }),

    // ---- IVF-PQ: coarse max-cosine buckets + PQ on residuals, queries
    //      probe their 2 nearest buckets with per-probe residual LUTs —
    //      the inverted-file-with-ADC layout (billion-scale ANN) ----
    "sim_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      ProductQuantization.ivfPqTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        col("vec_id") < 10, k = 5, m = 8, dim = 64, ksub = 16,
        iters = 1, nprobe = 2)
    }),

    // ---- temperature-flattened mixture resampling (τ = 1/2 over lang) ----
    "ds_temperature_sample" -> ((s, dir) =>
      Sampling.temperatureSample(Tables.documents(s, dir), "doc_id", "lang")
        .select("doc_id", "lang", "source")),

    // ---- general-τ variant at τ = 0 (flatten toward uniform). τ = 0 is
    //      the one general-τ point an SQL oracle reproduces bit-
    //      identically: its rate is floor(10000·min/n) — plain IEEE-754
    //      division both engines round identically, where a general pow
    //      is only within-1-ulp. The τ-law specs (identity at 1, ≡ sqrt
    //      path at 1/2, nested kept-sets) pin the rest of the range. ----
    "ds_temperature_sample_tau" -> ((s, dir) =>
      Sampling.temperatureSampleTau(Tables.documents(s, dir), "doc_id", "lang",
        tau = 0.0).select("doc_id", "lang", "source")),

    // ---- sessionization: gap-based event sessions (30 min) ----
    "ev_sessionize" -> ((s, dir) =>
      Sessions.sessionize(Tables.events(s, dir), "user_id", "ts")
        .withColumn("session_idx", col("session_idx").cast("long"))),

    // ---- inter-event-gap histogram: per-user consecutive gaps bucketed
    //      by floor(log2(gap_seconds + 1)) — the diagnostic that sizes
    //      the sessionization gap threshold (a bimodal histogram's
    //      valley IS the threshold). One user-key exchange (the
    //      sessionize window), then a bounded-domain count ----
    "ev_gap_hist" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(floor(log2(
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))).cast("double")
            + lit(1.0))).cast("long").as("gap_bucket"))
        .groupBy(col("gap_bucket")).agg(count(lit(1)).as("n_gaps"))
    }),

    // ---- engagement: DAU + trailing-7-day WAU per event-bearing day.
    //      One (user, day) distinct off the event stream, then day-grain
    //      cover-explode — no event-scale windowed distinct ----
    "ev_dau_wau" -> ((s, dir) =>
      EventAnalytics.dauWau(Tables.events(s, dir), "user_id", "ts")),

    // ---- ingest-volume anomalies: days ≥ 1.5σ from their event type's
    //      mean daily count (exact integer moment forms; z floor-
    //      quantized to e3). Everything past the scan is |types|·|days|
    //      rows ----
    "ev_anomaly_days" -> ((s, dir) =>
      EventAnalytics.anomalyDays(Tables.events(s, dir), "ts", "event_type",
        zE3Threshold = 1500L)),

    // ---- first-order Markov transitions: consecutive event-type steps
    //      per user, counted globally with per-transition user reach.
    //      One user-key exchange + local sort (the sessionize shape);
    //      output bounded by |event_types|² ----
    "ev_transitions" -> ((s, dir) =>
      EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
        "ts", "event_type", "event_id")),

    // ---- PageRank over the event-type transition graph: 3 integer-
    //      exact power iterations on the Markov edges above (weight =
    //      transition count) — the authority score a curation mixture
    //      would weight journeys by. Bit-exact in any engine: all
    //      arithmetic on a 1e12 fixed-point grid ----
    "ev_pagerank" -> ((s, dir) =>
      GraphAlgos.pageRank(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", "n_transitions", iters = 3)
        .select(col("node").as("event_type"), col("rank").as("rank_e12"))),

    // ---- PERSONALIZED PageRank: teleport + initial mass concentrated
    //      on the 'purchase' node — ranks become integer-exact
    //      proximity-to-purchase scores over the journey graph (the
    //      "which behaviors funnel into conversion" weighting). Same
    //      fixed-point grid and iteration shape as ev_pagerank ----
    "ev_ppr_purchase" -> ((s, dir) =>
      GraphAlgos.pageRank(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", "n_transitions", iters = 3,
        seedNode = Some("purchase"))
        .select(col("node").as("event_type"), col("rank").as("ppr_e12"))),

    // ---- exact triangle counts by degree-ordered orientation (Suri &
    //      Vassilvitskii 2011): wedges generated at the low-degree
    //      endpoint so no hub node fans out quadratically — the
    //      clustering-coefficient numerator per event type ----
    "ev_triangles" -> ((s, dir) =>
      GraphAlgos.triangleCounts(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst")
        .select(col("node").as("event_type"), col("n_triangles"))),

    // ---- local clustering coefficient per event type: 2·T(v)·10⁶ div
    //      (d·(d−1)) on the same degree-ordered triangle pipeline ----
    "ev_clustering_coef" -> ((s, dir) =>
      GraphAlgos.clusteringCoefficients(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst")
        .select(col("node").as("event_type"), col("degree"),
          col("n_triangles"), col("cc_e6"))),

    // ---- last-touch attribution with a 7-day lookback: each purchase
    //      credits the user's most recent non-purchase event, 'direct'
    //      when none lands inside the window. ONE window pass per user
    //      (running last-touch via IGNORE NULLS last_value) — never the
    //      purchase×touch interval join, which materializes every
    //      same-user pair before the range filter (the AnnotationJoin
    //      degenerate-pair trap, fatal at 100 TB event volume) ----
    "ev_attribution" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .withColumn("lt", last(
          when(col("event_type") =!= "purchase",
            struct(col("ts").as("t_ts"), col("event_id").as("t_id"),
              col("event_type").as("t_type"))),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("lt").isNull ||
            col("lt.t_ts") < col("ts") - expr("INTERVAL 7 DAYS"), lit("direct"))
            .otherwise(col("lt.t_type")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"))
    }),

    // ---- harmonic centrality over the same journey graph: Σ 10⁶ div
    //      hop-distance via 6 synchronous min-plus BFS rounds (exact
    //      once rounds cover the diameter; spec'd at fixpoint) — the
    //      disconnected-safe closeness (Boldi & Vigna 2014), ranking
    //      which event types sit nearest to ALL journey behavior ----
    "ev_harmonic" -> ((s, dir) =>
      GraphAlgos.harmonicCentrality(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        // checkpointEvery=2: without lineage truncation the 6-round
        // unrolled plan made every task closure carry the full tree —
        // round-16 listener audit measured 20 s of aggregate task
        // DESERIALIZATION per warm run against 0.13 s of execution
        "src", "dst", iters = 6, checkpointEvery = 2)
        .select(col("node").as("event_type"), col("n_reachable"),
          col("harmonic_e6"))),

    // ---- HyperBall approximate harmonic centrality over the SAME
    //      journey graph — the 100 TB path the exact form cannot take
    //      (exact APSP state is O(Σ component²) pairs; HyperBall is one
    //      2^p-byte HLL ball per node at any component size). Oracled
    //      on the integer register grid: per-round ball estimates and
    //      the Σ increment/t accumulation are BigInteger-exact, so the
    //      approximation itself is bit-reproducible cross-engine ----
    "ev_harmonic_approx" -> ((s, dir) =>
      GraphAlgos.harmonicHyperBall(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", iters = 6, p = 6, checkpointEvery = 2)
        .select(col("node").as("event_type"), col("est_ball"),
          col("harmonic_e6"))),

    // ---- closeness centrality from the SAME HyperBall registers
    //      (Boldi-Vigna: harmonic, closeness, and the neighbourhood
    //      function are all readouts of one ball evolution) — sum of
    //      distances as Σ t·(ball growth at t), integer grid ----
    "ev_closeness_approx" -> ((s, dir) =>
      GraphAlgos.hyperBallCloseness(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", iters = 6, p = 6, checkpointEvery = 2)
        .select(col("node").as("event_type"), col("est_ball"),
          col("sum_dist"), col("closeness_e6"))),

    // ---- neighbourhood function + effective diameter (HyperBall's
    //      headline readout): nf(t) = Σ ball sizes per round, effective
    //      diameter = min t with 10·nf(t) ≥ 9·nf(last) — the "how far
    //      apart is this graph" scalar at |V|·2^p state ----
    "ev_diameter_approx" -> ((s, dir) =>
      GraphAlgos.hyperBallNeighborhood(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", iters = 6, p = 6, checkpointEvery = 2)),

    // ---- community detection over the same Markov edges: 4 rounds of
    //      deterministic synchronous weighted label propagation (struct-
    //      max tie-break, no random sweep order) — the cheap "which
    //      event types form one behavioral module" companion to the
    //      PageRank authority score ----
    "ev_label_propagation" -> ((s, dir) =>
      GraphAlgos.labelPropagation(
        EventAnalytics.transitionCounts(Tables.events(s, dir), "user_id",
          "ts", "event_type", "event_id"),
        "src", "dst", "n_transitions", iters = 4)
        .select(col("node").as("event_type"), col("label").as("community"))),

    // ---- Count-min frequency sketch per event type (d=4 × w=1024
    //      long counters per group crossing the shuffle instead of the
    //      user stream; merge = elementwise add): build the grid over
    //      user ids, then point-estimate the true top-5 users per type
    //      by the min-over-rows rule — plain codegen'd probe arithmetic
    //      (Kirsch–Mitzenmacher indexes from the same xxhash64), est ≥
    //      exact always, within 2n/w whp. The exact column is the
    //      verification column; a production read keeps the sketch ----
    "ev_cms_freq" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"))
      val grid = ev
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(CmsCounters.cmsCounters(col("h"), 4, 10).as("sk"))
        .select(col("event_type"), explode(col("sk.counters")).as("c"))
        .select(col("event_type"), col("c.row").as("row"),
          col("c.idx").as("idx"), col("c.cnt").as("cnt"))
      val probes = ev.groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_exact"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))
            .orderBy(col("n_exact").desc, col("user_id"))))
        .filter(col("rk") <= 5).drop("rk")
        .withColumn("h", xxhash64(col("user_id")))
        .withColumn("a", shiftrightunsigned(col("h"), 32))
        .withColumn("b",
          col("h").bitwiseAND(lit(0xffffffffL)).bitwiseOR(lit(1L)))
        .select(col("event_type"), col("user_id"), col("n_exact"),
          explode(array((0 until 4).map { i =>
            struct(lit(i).as("row"),
              (col("a") + lit(i.toLong) * col("b"))
                .bitwiseAND(lit(1023L)).cast("int").as("idx"))
          }: _*)).as("pi"))
        .select(col("event_type"), col("user_id"), col("n_exact"),
          col("pi.row").as("row"), col("pi.idx").as("idx"))
      // broadcast the PROBE side (k·d rows per group); the grid side is
      // bounded too (d·w per group) but is the larger stream at scale
      grid.join(broadcast(probes), Seq("event_type", "row", "idx"))
        .groupBy(col("event_type"), col("user_id"), col("n_exact"))
        .agg(min(col("cnt")).as("est"))
    }),

    // ---- CMS re-merge: the per-type sketches UNION back into the
    //      global grid by counter addition (associative+commutative) —
    //      the property that makes the sketch a warehouse object.
    //      Oracle computes the global grid directly from the raw
    //      stream; a mismatch would mean the merge aggregate broke
    //      additivity ----
    "ev_cms_union" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(CmsCounters.cmsCounters(col("h"), 4, 10).as("sk"))
        .agg(CmsCounters.cmsMergeCounters(col("sk.counters"), 4, 10).as("m"))
        .select(explode(col("m.counters")).as("c"))
        .select(col("c.row").as("row"), col("c.idx").as("idx"),
          col("c.cnt").as("cnt"))),

    // ---- HyperLogLog distinct-user sketch per event type (p=9, 512
    //      byte registers per group crossing the shuffle instead of the
    //      user stream): the nonzero registers, exploded — the sketch a
    //      warehouse persists and re-merges across days ----
    "ev_hll_users" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), xxhash64(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(HllRegisters.hllRegisters(col("h"), 9).as("sk"))
        .select(col("event_type"), explode(col("sk.registers")).as("r"))
        .select(col("event_type"), col("r.bucket").as("bucket"),
          col("r.register").as("register"))),

    // ---- the HLL estimate vs exact truth: raw integer-grid estimator
    //      (alpha·m²·2⁶⁴ div S, all BigInteger — bit-identical in any
    //      engine) with the exact distinct count and e4 relative error
    //      alongside. event_id's per-type cardinality (~2000) sits
    //      ABOVE the 2.5m linear-counting cutover at p=9, i.e. in the
    //      raw estimator's published regime (the user_id sketch above
    //      is the below-cutover case: apply m·ln(m/zeros) caller-side
    //      from its nnz). The exact column is the VERIFICATION column;
    //      a production read keeps only the sketch ----
    // ---- KMV/theta sketch: bounded-size distinct sketches that can
    //      INTERSECT (the set op HLL cannot give without error-
    //      amplifying inclusion-exclusion). Estimates "active user-days
    //      doing BOTH purchase and view" from two 256-value bottom-k
    //      sketches on the integer 2⁵² grid — sample counts, θ, the
    //      four estimates and the exact-truth calibration all
    //      bit-exact in any engine ----
    "ev_theta_intersect" -> ((s, dir) =>
      graft.operators.ThetaSketch.intersectEstimate(
        Tables.events(s, dir).select(col("event_type"),
          (col("user_id") * 100000L +
            datediff(to_date(col("ts")),
              lit(java.sql.Date.valueOf("1970-01-01")))).as("user_day")),
        "event_type", "user_day", "purchase", "view", k = 256)),

    // ---- theta-sketch RE-MERGE — the property that completes the
    //      sketch family's warehouse story (HLL re-merges by register
    //      max, CMS by counter add, KMV by union + retain-k-smallest,
    //      which is LOSSLESS): the per-type persisted `vals` arrays
    //      merge into the global sketch, which must bit-equal the one
    //      sketch DuckDB builds directly over all distinct user-days.
    //      Emits the full merged sample (pos, v) plus θ/estimate/exact
    //      so the oracle pins the sketch content, not just the scalar ----
    "ev_theta_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        (col("user_id") * 100000L +
          datediff(to_date(col("ts")),
            lit(java.sql.Date.valueOf("1970-01-01")))).as("user_day"))
      val perType =
        graft.operators.ThetaSketch.kmvSketch(ev, "event_type", "user_day", 256)
      val merged = perType
        .agg(KmvMergeVals.kmvMergeVals(col("vals"), 256).as("mk"))
      val exact = ev.agg(countDistinct(col("user_day")).as("n_exact"))
      merged.crossJoin(exact)
        .select(posexplode(col("mk.vals")).as(Seq("pos", "v")),
          col("mk.theta").as("theta"), col("mk.est").as("est_union"),
          col("n_exact"))
        .select(col("pos").cast("long").as("pos"), col("v"), col("theta"),
          col("est_union"), col("n_exact"),
          expr("(abs(est_union - n_exact) * 10000) div n_exact").as("err_e4"))
    }),

    "ev_hll_estimate" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          xxhash64(col("event_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(HllRegisters.hllRegisters(col("h"), 9).as("sk"),
          countDistinct(col("event_id")).as("n_exact"))
        .select(col("event_type"), col("n_exact"),
          col("sk.nnz").cast("long").as("nnz"),
          col("sk.est_raw").as("est_raw"))
        .withColumn("err_e4",
          expr("(abs(est_raw - n_exact) * 10000) div n_exact"))),

    // ---- sketch RE-MERGE — the property that makes HLL a warehouse
    //      object: the per-type sketches above are merged by register
    //      max (HllMergeRegisters over their materialized register
    //      arrays, exactly as day-partitioned sketches would re-merge
    //      months later) and must equal the one global sketch — which
    //      is what the oracle computes directly. Both frames are one
    //      row; the crossJoin is 1×1 ----
    "ev_hll_union" -> ((s, dir) => {
      val perType = Tables.events(s, dir)
        .select(col("event_type"), xxhash64(col("event_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(HllRegisters.hllRegisters(col("h"), 9).as("sk"))
      val merged = perType
        .agg(HllRegisters.hllMergeRegisters(col("sk.registers"), 9).as("mk"))
        .select(col("mk.nnz").cast("long").as("nnz"),
          col("mk.est_raw").as("est_raw"))
      val exact = Tables.events(s, dir)
        .agg(countDistinct(col("event_id")).as("n_exact"))
      merged.crossJoin(exact)
        .withColumn("err_e4",
          expr("(abs(est_raw - n_exact) * 10000) div n_exact"))
    }),

    // ---- top event paths: most frequent consecutive length-3
    //      event-type sequences with distinct-user reach — one user-key
    //      exchange, |types|³-bounded aggregate, bounded top-k ----
    "ev_top_paths" -> ((s, dir) =>
      EventAnalytics.topPaths(Tables.events(s, dir), "user_id", "ts",
        "event_type", "event_id", k = 20)),

    // ---- retention cohorts: users by first-event date × weekly
    //      activity period ----
    "ev_retention_cohorts" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir), "user_id", "ts")),

    // ---- ordered funnel: view → click → purchase, each step strictly
    //      after the user's previous step time ----
    "ev_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))),

    // ---- corpus vocabulary: top-50 tokens by frequency ----
    "tx_vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabTopK(Tables.documents(s, dir), "text", k = 50)),

    // ---- per-document token entropy, computed entirely IN-ROW (sorted
    //      array + one run-length fold; floor-quantized terms) — no
    //      (doc, token) shuffle for a per-row statistic ----
    "tx_token_entropy" -> ((s, dir) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")),

    // ---- per-document n-gram novelty: the fraction of a doc's distinct
    //      shingles occurring in NO other document — the data-valuation
    //      dual of the dedup tiers (same md5 shingle family, so the
    //      oracle recomputes it bit-identically) ----
    "tx_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyScores(Tables.documents(s, dir), "doc_id", "text")),

    // ---- per-source distribution drift: KL(source ‖ corpus) over token
    //      distributions, terms floor-quantized before the sum — the
    //      drift monitor for a continuously-ingesting multi-source feed.
    //      One tokenization pass; everything downstream is vocabulary-
    //      scale ----
    "tx_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(Tables.documents(s, dir), "source", "text")),

    // ---- bounded-memory frequent tokens through the Misra-Gries
    //      sketch aggregate (capacity 4096 — far above this corpus's
    //      vocabulary, so counts are certified exact: cnt_lo = cnt_hi
    //      and the oracle checks true counts; at a 100 TB vocabulary the
    //      same plan holds capacity counters per buffer instead of a
    //      vocabulary-sized map, trading exactness for the published
    //      (N − Σcnt)/(m+1) error bound) ----
    "tx_frequent_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(coalesce(col("text"), lit("")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .agg(graft.functions.FrequentItems.frequentItems(col("token"), 4096).as("fi"))
        .select(explode(col("fi")).as("e"))
        .select(col("e.item").as("token"), col("e.cnt_lo").as("cnt_lo"),
          col("e.cnt_hi").as("cnt_hi"))
        .filter(col("cnt_lo") >= 50)),

    // ---- BM25 top-k retrieval: the fixed audit query set scored over
    //      the corpus (Lucene-form idf, quantize-before-sum so the
    //      ranking is an exact-integer ordering). Postings restrict to
    //      broadcast query terms immediately; per-query top-k ships
    //      through the bounded TopKByScore heap ----
    "tx_bm25_topk" -> ((s, dir) =>
      graft.operators.Retrieval.bm25TopK(s, Tables.documents(s, dir),
        "doc_id", "text", Bm25Queries, k = 10)),

    // ---- BM25 over the MATERIALIZED inverted index — value-identical
    //      to tx_bm25_topk (same oracle SQL) but the corpus text is
    //      never re-tokenized: the index is staged as two ingest days
    //      (even/odd docs — proving the per-day incremental build
    //      composes to full-corpus statistics), postings range-
    //      clustered on term so the manifest prunes the posting read
    //      to the query terms' files. The steady-state run measures
    //      the PROBE against the maintained index — the part that
    //      scales: a bounded query set costs O(files overlapping its
    //      terms), not O(corpus) ----
    "tx_bm25_indexed" -> ((s, dir) => {
      val root = s"/root/repo/target/bm25_index/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val post = wh.tablePath("index", "postings")
      val stat = wh.tablePath("index", "stats")
      if (!wh.exists(s, post) || wh.dates(s, post).size < 2) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val docs = Tables.documents(s, dir)
        graft.operators.Retrieval.indexDocs(s, wh, post, stat,
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          java.time.LocalDate.parse("2024-01-01"))
        graft.operators.Retrieval.indexDocs(s, wh, post, stat,
          docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text",
          java.time.LocalDate.parse("2024-01-02"))
      }
      graft.operators.Retrieval.bm25TopKIndexed(s, wh, post, stat,
        Bm25Queries, k = 10)
    }),

    // ---- CHANGE-FEED-DRIVEN index maintenance: the postings/stats
    //      index tracks a LIVE tx docs table through its manifest
    //      diff — day-2 append, then a deletion-vector correction —
    //      each increment merging only the changed documents'
    //      postings (O(changed files), watermarked exactly-once on
    //      both tables). The oracle recomputes BM25 over the FINAL
    //      corpus from scratch, so an increment that missed a
    //      vanished term, double-counted a stats delta, or leaked a
    //      deleted doc's postings hash-fails ----
    "tx_bm25_incremental" -> ((s, dir) => {
      val root = s"/root/repo/target/bm25_incr/${new java.io.File(dir).getName}"
      val wh = new graft.tableops.TxWarehouse(root)
      val docsT = wh.tablePath("corpus", "docs")
      val post = wh.tablePath("index", "postings")
      val stat = wh.tablePath("index", "stats")
      val App = "bm25incr"
      if (wh.lastTxn(s, post, App) < 3L) {
        val hp = new org.apache.hadoop.fs.Path(root)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        wh.append(s, docs.filter(col("doc_id") < 300) // v1: day 1
          .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))),
          docsT)
        graft.operators.Retrieval.indexDocsIncremental(s, wh, post, stat,
          docsT, "doc_id", "text", App,
          java.time.LocalDate.parse("2024-01-01")) // full build
        wh.append(s, // v2: day 2
          docs.filter(col("doc_id") >= 300 && col("doc_id") < 500)
            .withColumn("date", lit(java.sql.Date.valueOf("2024-01-02"))),
          docsT)
        wh.deleteWhereMor(s, docsT, // v3: MoR correction across days
          pmod(col("doc_id"), lit(7)) === 0)
        graft.operators.Retrieval.indexDocsIncremental(s, wh, post, stat,
          docsT, "doc_id", "text", App,
          java.time.LocalDate.parse("2024-01-02")) // v1 -> v3 increment
      }
      graft.operators.Retrieval.bm25TopKIndexed(s, wh, post, stat,
        Bm25Queries, k = 10)
    }),

    // ---- hybrid retrieval: reciprocal-rank fusion of the BM25 arm
    //      (probe document's own text as the query, self excluded) and
    //      the dense cosine arm (probe's embedding) — RRF k₀ = 60,
    //      per-arm contributions floor-quantized before the sum so the
    //      fused ranking is an exact-integer ordering. Both arms emit
    //      |probes|·k rows; fusion never touches corpus scale ----
    "tx_hybrid_rrf" -> ((s, dir) =>
      graft.operators.Retrieval.hybridRrfTopK(
        Tables.documents(s, dir), "doc_id", "text",
        Tables.embeddings(s, dir), "vec_id", "embedding",
        probeMax = 8L, kEach = 10, kOut = 10)),

    // ---- count-based n-gram LM quality scoring (CCNet-style): each
    //      document scored by the corpus's own add-one-smoothed trigram
    //      conditionals; per-trigram terms are floor-quantized BEFORE
    //      the sum so the score is an exact integer (engine-portable).
    //      Counts are vocabulary-scale (map-side-combined), scoring is
    //      explode → hash-join on the trigram key → per-doc re-agg ----
    "tx_ngram_lm" -> ((s, dir) =>
      graft.operators.NgramLm.scoreByCorpus(
        Tables.documents(s, dir), "doc_id", "text")),

    // ---- HELD-OUT n-gram LM evaluation: the trigram model is built
    //      from the train split ONLY and scores the val+test docs — the
    //      train/eval discipline (self-scoring, as tx_ngram_lm does, is
    //      the quality signal; this is the generalization measurement,
    //      leak-proof by the disjoint-hash split construction) ----
    "tx_ngram_lm_eval" -> ((s, dir) => {
      val split = Curation.assignSplits(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
      graft.operators.NgramLm.score(
        split.filter(col("split") =!= "train"),
        split.filter(col("split") === "train"),
        "doc_id", "text")
    }),

    // ---- BPE LEARNING itself, value-level oracled: the first 8 merges
    //      learned from the corpus (TextBpe.learnBpe — the driver-side
    //      loop over the bounded word-frequency table). The result is a
    //      tiny literal frame; the oracle UNROLLS the same loop as 8
    //      generated SQL iterations (pair counts over delimiter-wrapped
    //      symbols → deterministic argmax → replace), so every learned
    //      (rank, lhs, rhs, freq) row is checked against an independent
    //      implementation of the algorithm ----
    "tx_bpe_learn" -> ((s, dir) => {
      import s.implicits._
      graft.operators.TextBpe.learnBpe(Tables.documents(s, dir), "text",
          numMerges = 8)
        .zipWithIndex
        .map { case (m, i) => (i + 1, m.lhs, m.rhs, m.freq) }
        .toDF("rank", "lhs", "rhs", "freq")
    }),

    // ---- BPE application through the codegen'd bpe_encode expression
    //      under the fixed well-founded merge list (BpeFixedMerges):
    //      top-40 subwords by corpus frequency. Map-only encode — the
    //      merge table rides the plan as one reference object; the
    //      ranking window's input is the aggregated subword table.
    //      The oracle replays the merges as a rank-order replace chain
    //      over delimiter-wrapped symbols (provably the same
    //      segmentation for a well-founded list) ----
    "tx_bpe_encode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val merges = BpeFixedMerges.map { case (l, r) =>
        graft.operators.TextBpe.Merge(l, r, 0L) }
      val w = Window.orderBy(col("freq").desc, col("subword").asc)
      Tables.documents(s, dir)
        .select(explode(graft.operators.TextBpe.encode(col("text"), merges))
          .as("subword"))
        .groupBy("subword").agg(count(lit(1)).as("freq"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 40)
    }),

    // ---- BPE learning, iteration 1: adjacent code-point pair
    //      frequencies weighted by word frequency — the exact statistic
    //      each merge iteration of TextBpe.learnBpe recomputes, as a
    //      first-class query. Corpus → vocabulary is one map-side-
    //      combined aggregate; the pair expansion runs over DISTINCT
    //      words only and re-aggregates to the alphabet² domain, so the
    //      ranking window input is bounded at any corpus size ----
    "tx_bpe_pairs" -> ((s, dir) =>
      graft.operators.TextBpe.pairCountsTopK(Tables.documents(s, dir),
        "text", k = 50)),

    // ---- UNIGRAM-LM tokenizer training (Kudo 2018, SentencePiece
    //      family), value-level oracled: the full learned vocabulary
    //      after 2 deterministic Viterbi-EM rounds over the bounded
    //      word-frequency table (UnigramLm.learnUnigram — the
    //      TextBpe.learnBpe driver-loop architecture). The oracle
    //      UNROLLS the same rounds as recursive-CTE Viterbi passes
    //      (forward DP + largest-k traceback) over the same quantized
    //      integer cost grid, so every learned (piece, cnt, lp_e4) row
    //      is checked against an independent implementation ----
    "tx_unigram_learn" -> ((s, dir) => {
      import s.implicits._
      graft.operators.UnigramLm.learnUnigram(Tables.documents(s, dir),
          "text", rounds = 2, maxLen = UnigramMaxLen, seedSize = 400,
          vocabSize = 80)
        .zipWithIndex
        .map { case (p, i) => (i + 1, p.piece, p.cnt, p.lpE4) }
        .toDF("rank", "piece", "cnt", "lp_e4")
    }),

    // ---- unigram application through the codegen'd unigram_encode
    //      expression under the fixed piece-cost table (every DP
    //      tie-break exercised — see UnigramFixedPieces). Map-only
    //      encode; the ranking window's input is the aggregated
    //      subword table. The oracle replays the Viterbi as a
    //      recursive CTE over distinct words ----
    "tx_unigram_encode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("freq").desc, col("piece").asc)
      Tables.documents(s, dir)
        .select(explode(graft.operators.UnigramLm.encode(col("text"),
          UnigramFixedPieces, UnigramMaxLen, UnigramCharCost)).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("freq"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 40)
    }),

    // ---- per-document unigram-LM cost (the quality-signal readout of
    //      the unigram family, tx_ngram_lm's map-only dual): total
    //      Viterbi segmentation cost of each doc under the fixed piece
    //      table — one codegen'd expression per row, no join, no
    //      shuffle before the (absent) aggregate. The oracle reuses
    //      the recursive forward-DP CTE and joins each doc's words to
    //      their DP values ----
    "tx_unigram_score" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        size(filter(split(coalesce(col("text"), lit("")), "\\s+"),
          w => length(w) > 0)).cast("long").as("n_words"),
        graft.operators.UnigramLm.scoreCost(col("text"),
          UnigramFixedPieces, UnigramMaxLen, UnigramCharCost)
          .as("cost"))),

    // ---- frequency spectrum ("frequency of frequencies"): how many
    //      tokens occur exactly n times — the Zipf curve behind vocab
    //      sizing and Good-Turing smoothing. Two map-side-combined
    //      aggregates; the second is keyed by frequency (heavy mass at
    //      n=1 collapses map-side, so no hot-key shuffle) ----
    "tx_freq_spectrum" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(coalesce(col("text"), lit("")), "\\s+")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .groupBy(col("freq")).agg(count(lit(1)).as("n_tokens"))),

    // ---- embedding-norm histogram: the collapsed/blown-up-vector
    //      health check (an encoder regression shows up as mass moving
    //      across buckets). Map-side norm + e1-floor bucket, bounded-
    //      domain count — one scan, tiny output ----
    "emb_norm_hist" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .select(floor(Similarity.norm(
          transform(col("embedding"), x => x.cast("double"))) * 10)
          .cast("long").as("norm_e1"))
        .groupBy(col("norm_e1")).agg(count(lit(1)).as("n_vectors"))),

    // ---- per-label centroid accumulators (k-means/IVF training step) ----
    "emb_centroids" -> ((s, dir) =>
      Similarity.centroidSums(Tables.embeddings(s, dir), "label", "embedding")),

    // ---- label-noise audit: the 5 vectors farthest from their own
    //      label's centroid (confident-learning style outlier mining).
    //      Centroid table = one map-side-combined aggregate, broadcast
    //      back; distances map-only; per-label top-k through the bounded
    //      heap — no corpus-scale sort anywhere ----
    "emb_outlier_topk" -> ((s, dir) =>
      Similarity.centroidOutliers(Tables.embeddings(s, dir), "vec_id",
        "label", "embedding", k = 5)),

    // ---- PCA training statistic: the full 64×64 quantized covariance
    //      through the GramMatrix TypedImperativeAggregate — ONE packed
    //      buffer per map task crosses the shuffle (no d² row
    //      explosion); the integer statistic n·G_ij − S_i·S_j is exact,
    //      so the oracle recomputes it value-identically from raw
    //      parquet. Pca.fit eigensolves this same statistic driver-side
    //      (PcaSpec) ----
    // ---- JL random projection 64→16: the TRAINING-FREE dimension
    //      reducer (PCA's stable, shuffle-free, map-only dual — the
    //      projection of a vector never changes as the corpus grows).
    //      Deterministic planes from the sign-LSH generator; components
    //      e6-floored and exploded so the oracle value-compares every
    //      coordinate ----
    "emb_rp_project" -> ((s, dir) =>
      graft.operators.RandomProjection.projectE6(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        outDim = 16, dim = 64)),

    "emb_covariance" -> ((s, dir) => {
      val d = 64
      val iIdx = (0 until d).flatMap(i => (i until d).map(_ => i)).toArray
      val jIdx = (0 until d).flatMap(i => i until d).toArray
      Tables.embeddings(s, dir)
        .select(graft.functions.GramMatrix(col("embedding"), d, 1000.0).as("g"))
        .select(col("g.n").as("n"), col("g.sums").as("s"),
          posexplode(col("g.gram")).as(Seq("t", "gij")))
        .select(
          element_at(lit(iIdx), col("t") + 1).as("i"),
          element_at(lit(jIdx), col("t") + 1).as("j"),
          (col("n") * col("gij") -
            element_at(col("s"), element_at(lit(iIdx), col("t") + 1) + 1) *
            element_at(col("s"), element_at(lit(jIdx), col("t") + 1) + 1))
            .as("cc"))
    }),

    // ---- dual-signal dedup verification: each text near-dup pair
    //      annotated with its embedding cosine (doc_id ≡ vec_id) — the
    //      standard two-signal confirmation before destructive dedup
    //      (lexical overlap + semantic similarity must both clear) ----
    "dd_dual_signal" -> ((s, dir) => {
      val pairs = TextDedup.lengthBandedJaccardPairs(Tables.documents(s, dir),
        "doc_id", "text", "n_chars", bucketWidth = 32, maxDelta = 32,
        minJaccardE4 = 5000L)
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
      pairs
        .join(e.select(col("vec_id").as("id_a"), col("v").as("v_a"),
          col("nrm").as("nrm_a")), "id_a")
        .join(e.select(col("vec_id").as("id_b"), col("v").as("v_b"),
          col("nrm").as("nrm_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("jaccard_e4"),
          floor(Similarity.dot(col("v_a"), col("v_b")) /
            (col("nrm_a") * col("nrm_b")) * 1e6).cast("long").as("cos_e6"))
    }),

    // ---- one full k-means (Lloyd) iteration: nearest-centroid assignment
    //      composed with per-cluster centroid accumulators — the training
    //      step that produces the IVF index the sim_* queries probe ----
    "emb_kmeans_iter" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.centroidSums(
        Similarity.ivfAssign(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding"),
        "cent_id", "v")
    }),

    // ---- incremental embedding dedup: today's batch (vec_id ≥ 450)
    //      filtered against the archived corpus — a batch vector with
    //      any archive neighbor of cos ≥ 0.35 in its IVF cluster is
    //      dropped (the embedding dual of dd_incremental; at warehouse
    //      scale the archive side is the materialized assignment) ----
    "dd_embed_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.embedIncrementalFilter(
        emb.filter(col("vec_id") >= 450), emb.filter(col("vec_id") < 450),
        "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0 && col("vec_id") < 450),
        "vec_id", "embedding", minCosE6 = 350000L)
    }),

    // ---- margin-criterion pair mining (LASER/CCMatrix style): pairs
    //      scored by cosine RELATIVE to both endpoints' top-3 in-cluster
    //      neighborhood average — hub vectors with uniformly-close
    //      neighborhoods are suppressed. IVF-bucketed like sim_knn_graph;
    //      nothing all-pairs ----
    "sim_margin_pairs" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.marginPairs(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        k = 3, minMarginE4 = 10500L)
    }),

    // ---- near-dup clustering: connected components over jaccard pairs ----
    "dd_cluster_minlabel" -> ((s, dir) =>
      TextDedup.minLabelClusters(
        TextDedup.lengthBandedJaccardPairs(Tables.documents(s, dir), "doc_id",
          "text", "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L),
        pairsDistinct = true)),

    // ---- the same clustering through large-star/small-star contraction
    //      (GraphAlgos.connectedComponents) — O(log n) shuffle rounds vs
    //      the min-label sweep's O(diameter), the variant that survives
    //      chain-shaped near-dup clusters at corpus scale. Value-identical
    //      output contract, shared oracle ----
    "dd_cluster_cc" -> ((s, dir) =>
      graft.operators.GraphAlgos.connectedComponents(
        TextDedup.lengthBandedJaccardPairs(Tables.documents(s, dir), "doc_id",
          "text", "n_chars", bucketWidth = 32, maxDelta = 32,
          minJaccardE4 = 5000L))),

    // ---- k-core decomposition of the same near-dup graph: coreness
    //      by 6 synchronous neighborhood-H-index rounds (Lü et al.
    //      2016; starts at degree, converges to true coreness — spec'd
    //      at fixpoint by round 6 at test scale). Coreness separates
    //      DENSE duplicate templates (every member similar to every
    //      member — boilerplate farms, coreness ≈ clique size) from
    //      CHAINS of pairwise-similar revisions (coreness 1), a split
    //      component labels cannot see ----
    "dd_kcoreness" -> ((s, dir) =>
      graft.operators.GraphAlgos.kCoreness(
        TextDedup.lengthBandedJaccardPairs(Tables.documents(s, dir), "doc_id",
          "text", "n_chars", bucketWidth = 32, maxDelta = 32,
          minJaccardE4 = 5000L),
        // checkpointEvery deliberately 0 (round-16 A/B): eager
        // checkpoints at rounds 2/4/6 re-materialized the est frame as
        // 3 extra jobs and measured 2.5 s → 3.6 s; the single lazy
        // 6-round DAG over the persisted edge set is cheaper here
        "id_a", "id_b", iters = 6)
        .select(col("node").cast("long").as("doc_id"), col("coreness"))),

    // ---- dedup tier REPORT: what each tier would remove (docs +
    //      characters) — the decision table for choosing which tiers
    //      pay their cost on a given corpus. Pure composition of the
    //      oracled tiers (exact, md5-minhash-LSH, containment,
    //      SemDeDup), drop rule everywhere = "has a lower-id qualifying
    //      neighbor" ----
    "dd_tier_report" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      def stats(drops: DataFrame, tier: String) =
        docs.join(drops, Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("n_chars")), lit(0L)).as("chars_dropped"))
          .select(lit(tier).as("tier"), col("n_docs"), col("chars_dropped"))
      val exactDrops = docs.join(
        TextDedup.exactDedup(docs, "doc_id", "text").select("doc_id"),
        Seq("doc_id"), "left_anti").select("doc_id")
      val mhDrops = TextDedup.minhashMd5DedupPairs(docs, "doc_id", "text",
          numHashes = 16, bands = 4, minJaccardE4 = 5000L)
        .select(col("id_b").as("doc_id")).distinct()
      val ctDrops = TextDedup.containmentPairs(docs, "doc_id", "text",
          minContainE4 = 6000)
        .select(col("id_b").as("doc_id")).distinct()
      val semDrops = emb.select(col("vec_id").as("doc_id")).join(
        Similarity.semanticDedup(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          minCosE6 = 350000L).select(col("vec_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      stats(exactDrops, "exact")
        .unionByName(stats(mhDrops, "minhash"))
        .unionByName(stats(ctDrops, "containment"))
        .unionByName(stats(semDrops, "semantic"))
    }),

    // ---- quality-aware cluster representatives: per near-dup cluster,
    //      keep the longest member (ties → lowest id) — the keep-best
    //      policy, as a min_by aggregate with map-side combine ----
    "dd_cluster_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextDedup.bestRepresentatives(
        TextDedup.minLabelClusters(
          TextDedup.lengthBandedJaccardPairs(docs, "doc_id", "text",
            "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L),
          pairsDistinct = true),
        docs, "doc_id", "n_chars")
        .withColumnRenamed("score", "n_chars")
    }),

    // ---- md5-family verification tiers: same algorithms as the xxhash64
    //      minhash/simhash above, hash family the oracle can recompute ----
    "dd_minhash_lsh_md5" -> ((s, dir) =>
      TextDedup.minhashMd5DedupPairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 16, bands = 4, minJaccardE4 = 5000L)),

    "dd_simhash_md5" -> ((s, dir) =>
      TextDedup.simhashMd5Pairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 6)),

    // ---- per-stratum length distribution: discrete (value-at-rank)
    //      percentiles over a per-(lang, length) histogram — no stratum
    //      ever sorts in one task (see valueAtRankQuantiles scaladoc) ----
    "tx_len_quantiles" -> ((s, dir) =>
      TextAnalysis.valueAtRankQuantiles(
        Tables.documents(s, dir).select(col("lang"), col("n_chars")),
        "lang", "n_chars",
        Seq("median_chars" -> 0.5, "p90_chars" -> 0.9), "n_docs")),

    // ---- the scale-path dual of tx_len_quantiles: HDR log-histogram
    //      quantiles — ≤ ~1,900 counters per group regardless of value
    //      range (exact rank state is one row per distinct value), rel
    //      err ≤ 1/32, integer-exact bucket arithmetic both engines
    //      replay from the value's binary digits ----
    "tx_len_hdr" -> ((s, dir) =>
      TextAnalysis.hdrQuantiles(
        Tables.documents(s, dir).select(col("lang"), col("n_chars")),
        "lang", "n_chars",
        Seq("p50_lb" -> 5000, "p90_lb" -> 9000, "p99_lb" -> 9900),
        "n_docs")),

    // ---- deterministic stratified sampling (down-sample dominant lang) ----
    "ds_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 3000L, "zh" -> 6000L), defaultRateE4 = 1500L)
        .select("doc_id", "lang", "source")),

    // ---- the full corpus-hygiene pipeline: quality → repetition →
    //      near-dup dedup (min-id representative) → decontamination ----
    // ---- deterministic distributed logistic regression: a hashed
    //      bag-of-words quality classifier whose 2-iteration full-batch
    //      GD training is bit-reproducible (integer margins/gradients,
    //      e6-quantized sigmoid) — the DuckDB oracle REPLAYS the whole
    //      training loop and must land on the same weights exactly ----
    "tx_quality_logreg" -> ((s, dir) =>
      graft.operators.QualityModel.trainLogRegE6(s,
        Tables.documents(s, dir), "doc_id", "text",
        col("lang") === "en", dim = 8, iters = 2)),

    // ---- model APPLY: per-doc exact-integer margin under the trained
    //      weights — top-20 by predicted quality; oracle chains the
    //      training replay into the scoring join ----
    "tx_quality_logreg_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = graft.operators.QualityModel.trainLogRegE6(s, docs,
        "doc_id", "text", col("lang") === "en", dim = 8, iters = 2)
      graft.operators.QualityModel.scoreLogRegE6(docs, "doc_id", "text",
          w, dim = 8)
        .orderBy(col("margin_e6").desc, col("doc_id").asc)
        .limit(20)
    }),

    // ---- per-column data profile: null count + exact distinct per
    //      column in ONE aggregate (Catalyst's Expand handles the
    //      multi-distinct), unpivoted to a row per column — the
    //      ingest-audit query every pipeline runs before trusting a new
    //      feed ----
    "ds_profile" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity")
      val aggs = cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
          countDistinct(col(c)).as(s"__d_$c"))
      }
      val one = li.agg(aggs.head, aggs.drop(1): _*)
      val stacked = cols.map { c =>
        one.select(lit(c).as("column"), col(s"__n_$c").as("n_nulls"),
          col(s"__d_$c").as("n_distinct"))
      }.reduce(_ unionByName _)
      stacked
    }),

    "ds_corpus_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.CorpusPipeline.clean(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0))
        .select("doc_id", "lang", "quality_e4")
    }),

    // ---- THE end-to-end training-data preparation pipeline as ONE
    //      declarative plan: hygiene (quality → repetition → near-dup →
    //      decontamination) → train-split carve-out → greedy packing
    //      into 256-token sequences. What a user of this library ships. ----
    "ds_prepare_training" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val cleaned = graft.operators.CorpusPipeline.clean(
        docs.filter(col("doc_id") % 100 =!= 0),
        docs.filter(col("doc_id") % 100 === 0))
      val train = Curation.assignSplits(cleaned, "doc_id",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
        .filter(col("split") === "train")
      Packing.packGreedy(
        train.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 256L, nShards = 8, salt = "prep")
    }),

    // ---- kNN classification: majority label of the 5 cosine-nearest
    //      neighbors (ties → smallest label) ----
    "emb_knn_classify" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val topk = Similarity.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 5)
      val votes = topk
        .join(emb.select(col("vec_id").as("nbr_id"), col("label")), "nbr_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("label").asc)
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("query_id"), col("label").as("label_pred"), col("votes"))
    }),

    // ---- sequence packing: sharded greedy next-fit into 256-token
    //      training sequences (see Packing scaladoc for the scale shape) ----
    "ds_pack_sequences" -> ((s, dir) =>
      Packing.packGreedy(
        Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budgetTokens = 256L, nShards = 8)),

    // ---- chunk -> pack composition: context windows packed into
    //      256-token training sequences (chunk_id = doc_id·100 + idx) ----
    "ds_pack_chunks" -> ((s, dir) => {
      val chunks = TextAnalysis.chunkFixed(Tables.documents(s, dir),
        "doc_id", "text", chunkTokens = 32, stride = 24)
        .select((col("doc_id") * 100 + col("chunk_idx")).as("chunk_id"),
          col("n_chunk_tokens"))
      Packing.packGreedy(chunks, "chunk_id", "n_chunk_tokens",
        budgetTokens = 256L, nShards = 8, salt = "packc")
    }),

    // ---- per-language quality quotas: top-30 docs per lang by quality,
    //      via the map-side-combining TopKByScore aggregate (no stratum
    //      ever sorts in one task) ----
    "ds_quota_curate" -> ((s, dir) =>
      Curation.quotaTopK(
        TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text")
          .select(col("doc_id"), col("lang"), col("quality_e4")),
        "lang", "doc_id", "quality_e4", quota = 30)),

    // ---- exactly-100 uniform sample: distributed top-k by salted hash
    //      (TakeOrderedAndProject — no global sort, no shuffle) ----
    "ds_sample_exact_n" -> ((s, dir) =>
      Sampling.uniformSampleN(Tables.documents(s, dir), "doc_id", n = 100)
        .select("doc_id", "lang", "source")),

    // ---- exactly-20-per-language sample: bounded per-stratum heaps via
    //      TopKByScore (balanced eval carve-out; no stratum-wide sort) ----
    "ds_stratified_exact_n" -> ((s, dir) =>
      Sampling.stratifiedSampleN(Tables.documents(s, dir), "doc_id", "lang",
        n = 20)),

    // ---- weight-proportional sampling WITHOUT replacement: 10 docs per
    //      language, inclusion odds ∝ n_chars (exponential-clocks /
    //      Efraimidis-Spirakis; clocks are a map-side expression, the
    //      per-stratum min-k ships through the bounded heap) ----
    "ds_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSampleN(Tables.documents(s, dir), "doc_id", "lang",
        col("n_chars"), k = 10).withColumnRenamed("stratum", "lang")),

    // ---- deterministic train/val/test hash split (90/5/5) ----
    "ds_split_assign" -> ((s, dir) =>
      Curation.assignSplits(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
        .select("doc_id", "lang", "split")),

    // ---- LEAKAGE-SAFE splits: hash-split on the near-dup CLUSTER
    //      label instead of the doc id, so every member of a near-dup
    //      cluster lands in the SAME split — the guard against the
    //      classic contamination where a test document's near-copy
    //      sits in train and the eval silently measures memorization.
    //      Composition of the oracled cluster components and the
    //      oracled split hash; singletons behave exactly like
    //      ds_split_assign ----
    "ds_leakage_safe_split" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val labels = graft.operators.GraphAlgos.connectedComponents(
        TextDedup.lengthBandedJaccardPairs(docs, "doc_id", "text",
          "n_chars", bucketWidth = 32, maxDelta = 32, minJaccardE4 = 5000L))
      Curation.assignSplits(
        docs.select(col("doc_id"))
          .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("leak_key", coalesce(col("label"), col("doc_id"))),
        "leak_key",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
        .select("doc_id", "leak_key", "split")
    }),

    // ---- curated-corpus export: the split assignment written out
    //      partitioned by split (the training-delivery layout) and read
    //      back — the S4 partitioned-sink path for the curation layer ----
    "ds_export_splits" -> ((s, dir) => {
      val stage = s"/root/repo/target/ds_export/${new java.io.File(dir).getName}"
      Curation.assignSplits(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 9000L, "val" -> 500L, "test" -> 500L))
        .select(col("doc_id"), col("lang"), col("split"))
        .write.mode("overwrite").partitionBy("split").parquet(stage)
      s.read.parquet(stage).select("doc_id", "lang", "split")
    }),

    // ---- data-mixture report: token/doc share per (source, lang) ----
    "ds_domain_mix" -> ((s, dir) =>
      Curation.domainMixture(Tables.documents(s, dir), "source", "lang",
        TextAnalysis.tokenCount(col("text")))),

    // ---- DSIR importance weights: hashed-unigram distribution match
    //      against the English subset as target — two corpus passes,
    //      one 4096-row bucket shuffle, ratio table broadcast back ----
    "ds_dsir_weights" -> ((s, dir) =>
      Curation.dsirWeights(Tables.documents(s, dir), "doc_id", "text",
        col("lang") === "en")),

    // ---- integer water-filling mixture balance: one common cap per
    //      source chosen so Σ min(n_i, cap) fits the budget — caps the
    //      dominant sources at an equal share, small sources keep
    //      everything; all arithmetic on k stratum rows ----
    "ds_waterfill_quota" -> ((s, dir) =>
      Curation.waterFillAllocation(Tables.documents(s, dir), "source",
        budget = 120L)),

    // ---- deterministic global training-shuffle order: rank under
    //      (xxhash64(doc_id), doc_id) with the global index assembled
    //      from hash-bucket offsets (64 bounded counts + a 64-way
    //      partitioned window), never a one-partition global sort ----
    "ds_shuffle_order" -> ((s, dir) =>
      Curation.globalShuffleOrder(
        Tables.documents(s, dir).select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("h"), col("pos"))),

    // ---- canonical normalization: NFC (custom codegen'd expression) +
    //      lowercase + whitespace collapse ----
    "tx_normalize" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("norm_text"))
        .withColumn("n_norm_chars", length(col("norm_text")).cast("long"))),

    // ---- bigram collocations by integer LIFT (log-free PMI surrogate
    //      — same ranking, no cross-engine float): bigrams built inside
    //      the token array (zip_with of shifted slices, no positional
    //      self-join), hapax tail pruned before the word-count join,
    //      top-k via the bounded TakeOrdered ----
    "tx_bigram_lift" -> ((s, dir) =>
      TextAnalysis.bigramLift(Tables.documents(s, dir), "doc_id", "text",
        minCount = 5L, k = 25)),

    // ---- vocabulary coverage curve: share of all corpus tokens
    //      covered by the top-k vocab for k ∈ {100, 1k, 10k} — the
    //      tokenizer-vocab sizing table; one count aggregate, a bounded
    //      TakeOrdered, rank window on ≤ 10k rows ----
    "tx_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text",
        ks = Seq(100, 1000, 10000))),

    // ---- Flesch reading-ease on the exact 10⁶ integer grid: three
    //      regex counts + two integer divisions, map-only, whole-stage
    //      codegen'd — the classic prose-vs-word-salad quality axis ----
    "tx_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir), "doc_id", "text")),

    // ---- corpus-adaptive quality: share of tokens in the corpus's own
    //      top-200 vocabulary (integer-exact unigram-LM stand-in) ----
    "tx_common_ratio" -> ((s, dir) =>
      TextAnalysis.commonTokenRatio(Tables.documents(s, dir), "doc_id",
        "text", k = 200)),

    // ---- quality-score calibration: global percentile rank via the
    //      bounded-domain value histogram (no corpus sort) ----
    "tx_quality_rank" -> ((s, dir) =>
      TextAnalysis.percentileRankByValue(
        TextAnalysis.qualityFeatures(Tables.documents(s, dir), "text")
          .select(col("doc_id"), col("quality_e4")),
        "quality_e4", cacheInput = true)
        .select("doc_id", "quality_e4", "pct_e4")),

    // ---- per-doc top-3 tf·idf terms (keyword extraction; log-free idf
    //      so the oracle reproduces scores bit for bit) ----
    "tx_tfidf_topk" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir), "doc_id", "text", k = 3)),

    // ---- RAKE keyword extraction: corpus top-25 candidate phrases
    //      scored by degree/frequency on the e6 integer grid (word
    //      scores broadcast; top-k via TakeOrdered) ----
    "tx_rake_keywords" -> ((s, dir) =>
      TextAnalysis.keywordsRake(Tables.documents(s, dir), "doc_id", "text",
        k = 25)),

    // ---- PII scrub: email/IPv4 counts + redacted-text fingerprint ----
    "tx_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"),
          md5(col("redacted")).as("redacted_fp"))),

    // ---- vocab-id encoding: top-20 corpus vocabulary, OOV -> 0 ----
    "tx_tokenize" -> ((s, dir) =>
      TextAnalysis.tokenize(Tables.documents(s, dir), "doc_id", "text",
        vocabSize = 20)),

    // ---- context-window chunking: 32-token windows, stride 24 ----
    "tx_chunk" -> ((s, dir) =>
      TextAnalysis.chunkFixed(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 32, stride = 24)),

    // ---- span-granular dedup: context windows duplicated across ≥2
    //      distinct documents (boilerplate detection) ----
    "dd_chunk_dups" -> ((s, dir) =>
      TextAnalysis.duplicateChunks(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 32, stride = 24)),

    // ---- shift-robust span dedup: content-defined chunk boundaries
    //      (rolling-window fingerprint cuts), duplicate chunks across
    //      ≥2 distinct documents ----
    "dd_cdc_chunks" -> ((s, dir) =>
      TextAnalysis.cdcDuplicateChunks(Tables.documents(s, dir), "doc_id",
        "text")),

    // ---- C4-style boilerplate excision: rewrite every document with
    //      its cross-document-repeated 16-token windows removed ----
    "dd_boilerplate_strip" -> ((s, dir) =>
      TextAnalysis.boilerplateStrip(Tables.documents(s, dir), "doc_id",
        "text", chunkTokens = 16, minDocs = 2)),

    // ---- EXACT-substring dedup (Lee et al. 2022 ExactSubstr, k-gram-
    //      anchor form): maximal spans of ≥8 tokens whose text occurs
    //      anywhere else in the corpus ----
    "dd_substring" -> ((s, dir) =>
      TextDedup.duplicateSubstringSpans(Tables.documents(s, dir), "doc_id",
        "text", k = 8)),

    // ---- EXACT-substring dedup, keep-one rewrite: strip every token
    //      covered by a non-canonical duplicated 8-token window (the
    //      canonical occurrence = corpus-min (doc, pos) survives) ----
    "dd_substring_strip" -> ((s, dir) =>
      TextDedup.duplicateSubstringStrip(Tables.documents(s, dir), "doc_id",
        "text", k = 8)),

    // ---- multimodal plumbing (decode stubbed; see Multimodal scaladoc) ----
    "mm_decode_meta" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.mediaFromText(Tables.documents(s, dir), "doc_id", "text"))
        .toDF().select("media_id", "sizeBytes", "width", "height", "nFrames")),

    "mm_resize_plan" -> ((s, dir) =>
      Multimodal.resize(
        Multimodal.extractFeatures(
          Multimodal.mediaFromText(Tables.documents(s, dir), "doc_id", "text")),
        maxDim = 256)
        .select("media_id", "width", "height", "scale_e4", "out_width", "out_height")),

    // media near-dup dedup: the decode stub's feature vectors fed into
    // the embedding near-dup operator — image/video dedup as the same
    // pipeline shape as text dedup (decode → feature → pair → threshold);
    // swapping the stub for a real perceptual embedding changes nothing
    // downstream
    "mm_neardup" -> ((s, dir) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.mediaFromText(Tables.documents(s, dir), "doc_id", "text"))
        .toDF().select(col("media_id"), col("feature"))
      Similarity.cosineNearDupPairs(feats, "media_id", "feature",
        col("media_id") < 500, minCosE6 = 999990L)
    }),

    // the stub feature vector itself (floor-scaled): verifies the
    // mapPartitions decode path end-to-end, not just the metadata
    "mm_feature_vec" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.mediaFromText(Tables.documents(s, dir), "doc_id", "text"))
        .toDF().select(col("media_id"), posexplode(col("feature")))
        .select(col("media_id"), col("pos").cast("int").as("dim"),
          floor(col("col") * 1e6).cast("long").as("feat_e6"))),

    // exploded to scalar rows: the driver's compare sorts values with
    // pandas, which cannot sort/hash array cells
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSamplePlan(
        Multimodal.extractFeatures(
          Multimodal.mediaFromText(Tables.documents(s, dir), "doc_id", "text")),
        stride = 3)
        .select(col("media_id"), explode(col("frame_indices")).as("frame_idx"))
        .withColumn("frame_idx", col("frame_idx").cast("long"))),

    // ---- REAL audio decode: the fixture builder serializes genuine
    //      RIFF/WAVE containers (fmt + LIST/INFO + data chunks) whose
    //      PCM16 samples are a pure integer function of each doc's
    //      text; the operator chunk-walks and decodes them. The oracle
    //      computes the SAME statistics directly from the text — so a
    //      parser bug (wrong chunk offset, endianness, sign extension)
    //      hash-fails, which is what makes the decode verifiable ----
    "mm_audio_meta" -> ((s, dir) =>
      Multimodal.extractAudioMeta(
        Multimodal.wavFromText(Tables.documents(s, dir), "doc_id", "text"))),

    // ---- REAL video container metadata: the fixture builder
    //      serializes genuine ISO-BMFF/MP4 containers (ftyp + free +
    //      mdat-before-moov + full moov/trak/mdia/minf/stbl box trees)
    //      whose every field is a pure integer function of the doc;
    //      the operator box-walks them. The oracle recomputes the same
    //      metadata from the text — a walker bug (wrong nesting, bad
    //      offset, endianness, 16.16 fixed-point) hash-fails ----
    "mm_video_meta" -> ((s, dir) =>
      Multimodal.extractVideoMeta(
        Multimodal.mp4FromText(Tables.documents(s, dir), "doc_id", "text")))
  )

  private val M = Tables.measurementsMonthlySql
  private val D = Tables.measurementsDailySql
  private val A = Tables.annotationsDailySql

  // ---- DuckDB fragments for the extension oracles (single source of
  //      truth: generated from the same constants the Spark side uses) ----

  /** DuckDB tokens expression (parity with TextAnalysis.tokens). */
  private val W = raw"string_split_regex(text, '\s+')"

  /** Fixed, well-founded BPE merge list for the encode query: each
    * merge's parts are base characters or products of earlier merges,
    * so rank-order sequential application (the oracle's replace chain)
    * and BpeEncode's greedy lowest-rank-first application provably
    * segment identically.
    */
  private[graft] val BpeFixedMerges: Seq[(String, String)] = Seq(
    ("e", "s"), ("es", "t"), ("t", "h"), ("th", "e"),
    ("i", "n"), ("a", "n"), ("an", "d"), ("e", "r"))

  /** Fixed unigram piece-cost table for the encode query (costs are
    * `-floor(10⁴·ln p)`-scale integers, hand-set to exercise every
    * tie-break on the real corpus): "table" at 75000 exactly equals
    * tab+le (36000+39000) so the fewer-pieces rule decides; "small"
    * segments [sm][all] vs [sma][ll] at identical (cost, n) so the
    * longest-LAST-piece traceback decides; "e" is in-vocabulary at
    * 60000, COSTLIER than the 50000 character fallback, so the
    * fallback arm must compete even for known characters; "dup" is
    * fully out-of-vocabulary and segments as characters.
    */
  private[graft] val UnigramFixedPieces: Seq[(String, Long)] = Seq(
    ("table", 75000L), ("tab", 36000L), ("le", 39000L),
    ("sm", 40000L), ("all", 45000L), ("sma", 45000L), ("ll", 40000L),
    ("a", 30000L), ("e", 60000L), ("row", 33000L),
    ("win", 37000L), ("dow", 37000L), ("or", 41000L), ("der", 43000L),
    ("qu", 42000L), ("ery", 44000L), ("join", 28000L),
    ("ha", 46000L), ("sh", 46000L))
  private[graft] val UnigramCharCost = 50000L
  private[graft] val UnigramMaxLen = 5

  /** Fixed audit/eval query set for the BM25 retrieval query — terms
    * drawn from the synthetic corpus vocabulary.
    */
  private[graft] val Bm25Queries: Seq[(Int, String)] = Seq(
    (1, "spark join table"), (2, "window agg batch"),
    (3, "slow query filter"), (4, "hash value"))

  /** DuckDB BM25: the same statistics and the same float evaluation
    * ORDER as Retrieval.bm25TopK (left-associative products, `e0`
    * literals so DuckDB computes in DOUBLE, not DECIMAL) — the
    * quantize-before-sum contributions then match bit-for-bit.
    */
  private def bm25Sql(k: Int, k1: String = "1.2e0", b: String = "0.75e0",
      corpus: String = "documents"): String = {
    val qvals = Bm25Queries.flatMap { case (qid, text) =>
      text.split("\\s+").filter(_.nonEmpty).distinct.map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH corpus AS (SELECT * FROM $corpus),
       |t AS (SELECT doc_id, unnest($W) AS term FROM corpus),
       |tt AS (SELECT doc_id, term FROM t WHERE length(term) > 0),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tt GROUP BY doc_id),
       |nn AS (SELECT count(DISTINCT doc_id) AS n FROM corpus),
       |al AS (SELECT count(*) AS tot FROM tt),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q(query_id, term) AS (VALUES $qvals),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor(10000e0 *
       |      ln(1e0 + (nn.n - dfq.df + 0.5e0) / (dfq.df + 0.5e0)) *
       |      ((tf.tf * ($k1 + 1)) /
       |       (tf.tf + $k1 * (1e0 - $b +
       |        $b * dl.dl / (CAST(al.tot AS DOUBLE) / nn.n))))) AS BIGINT) AS c
       |  FROM tf JOIN q USING (term) JOIN dfq USING (term)
       |  JOIN dl USING (doc_id) CROSS JOIN nn CROSS JOIN al),
       |agg AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_e4
       |        FROM sc GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, score_e4,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY score_e4 DESC, doc_id) AS INT) AS rank
       |FROM agg QUALIFY rank <= $k""".stripMargin
  }

  /** DuckDB hybrid RRF: replays BOTH arms — the BM25 statistics in the
    * exact float evaluation order of [[bm25Sql]] (query terms drawn from
    * the probe documents themselves, self-match excluded) and the dense
    * cosine ranks — then fuses with the same per-arm floor-quantized
    * `floor(1e6/(60+rank))` contributions [[graft.operators.Retrieval
    * .hybridRrfTopK]] sums, so fused scores match value-for-value.
    */
  private def hybridRrfSql(probeMax: Long, kEach: Int, kOut: Int,
      rrfK: Int = 60): String = {
    val cos = cosE6Sql("dq.qv", "e.embedding")
    s"""WITH t AS (SELECT doc_id, unnest($W) AS term FROM documents),
       |tt AS (SELECT doc_id, term FROM t WHERE length(term) > 0),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tt GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tt GROUP BY doc_id),
       |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
       |al AS (SELECT count(*) AS tot FROM tt),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |q AS (SELECT DISTINCT doc_id AS query_id, term FROM tt
       |      WHERE doc_id < $probeMax),
       |sc AS (SELECT q.query_id, tf.doc_id,
       |    CAST(floor(10000e0 *
       |      ln(1e0 + (nn.n - dfq.df + 0.5e0) / (dfq.df + 0.5e0)) *
       |      ((tf.tf * (1.2e0 + 1)) /
       |       (tf.tf + 1.2e0 * (1e0 - 0.75e0 +
       |        0.75e0 * dl.dl / (CAST(al.tot AS DOUBLE) / nn.n))))) AS BIGINT) AS c
       |  FROM tf JOIN q USING (term) JOIN dfq USING (term)
       |  JOIN dl USING (doc_id) CROSS JOIN nn CROSS JOIN al
       |  WHERE tf.doc_id <> q.query_id),
       |agg AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_e4
       |        FROM sc GROUP BY query_id, doc_id),
       |sr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |         ORDER BY score_e4 DESC, doc_id) AS r FROM agg QUALIFY r <= $kEach),
       |dq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
       |       WHERE vec_id < $probeMax),
       |dsc AS (SELECT dq.query_id, e.vec_id AS doc_id, $cos AS cos_e6
       |        FROM embeddings e JOIN dq ON dq.query_id <> e.vec_id),
       |dr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |         ORDER BY cos_e6 DESC, doc_id) AS r FROM dsc QUALIFY r <= $kEach),
       |u AS (SELECT coalesce(s.query_id, d.query_id) AS query_id,
       |             coalesce(s.doc_id, d.doc_id) AS doc_id,
       |             coalesce(CAST(floor(1000000e0 / ($rrfK + s.r)) AS BIGINT), 0) +
       |             coalesce(CAST(floor(1000000e0 / ($rrfK + d.r)) AS BIGINT), 0)
       |               AS rrf_e6
       |      FROM sr s FULL JOIN dr d
       |        ON s.query_id = d.query_id AND s.doc_id = d.doc_id)
       |SELECT query_id, doc_id, rrf_e6,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_e6 DESC, doc_id) AS INT) AS rank
       |FROM u QUALIFY rank <= $kOut""".stripMargin
  }

  /** DuckDB BPE LEARNING: the merge loop unrolled as `n` generated SQL
    * iterations over the word-frequency table — iteration k computes
    * adjacent-pair counts from the current delimiter-wrapped symbol
    * strings, picks the deterministic argmax (freq DESC, lhs, rhs), and
    * rewrites the table with that merge via `replace` (per-symbol
    * chr(31) wrappers: no shared boundaries, exactly the expression's
    * left-to-right scan). Mirrors TextBpe.learnBpe minus its two
    * non-binding-at-this-scale bounds (the maxWords cap and the
    * freq ≥ 2 early stop).
    */
  private def bpeLearnSql(n: Int): String = {
    val D = "chr(31)"
    // adjacent pairs of iteration k's symbol table, weighted by wfreq
    def pairs(k: Int) =
      s"""p$k AS MATERIALIZED (SELECT t[CAST(i AS INT)] AS lhs, t[CAST(i AS INT) + 1] AS rhs,
         |  sum(wfreq) AS freq
         |  FROM (SELECT string_split(trim(sym, $D), $D||$D) AS t, wfreq FROM s$k),
         |       unnest(range(1, len(t))) AS r(i)
         |  GROUP BY lhs, rhs)""".stripMargin
    def best(k: Int) =
      s"b$k AS (SELECT lhs, rhs, freq FROM p$k ORDER BY freq DESC, lhs, rhs LIMIT 1)"
    def next(k: Int) =
      s"""s${k + 1} AS MATERIALIZED (SELECT replace(sym,
         |  $D||(SELECT lhs FROM b$k)||$D||$D||(SELECT rhs FROM b$k)||$D,
         |  $D||(SELECT lhs FROM b$k)||(SELECT rhs FROM b$k)||$D) AS sym,
         |  wfreq FROM s$k)""".stripMargin
    val iters = (0 until n).map { k =>
      if (k < n - 1) Seq(pairs(k), best(k), next(k)).mkString(",\n")
      else Seq(pairs(k), best(k)).mkString(",\n")
    }.mkString(",\n")
    val out = (0 until n)
      .map(k => s"SELECT ${k + 1} AS rank, lhs, rhs, CAST(freq AS BIGINT) AS freq FROM b$k")
      .mkString("\nUNION ALL\n")
    s"""WITH w AS (SELECT unnest($W) AS word FROM documents),
       |wc AS (SELECT word, count(*) AS wfreq FROM w
       |       WHERE length(word) >= 2 GROUP BY word),
       |s0 AS MATERIALIZED (SELECT list_aggregate(list_transform(
       |         regexp_split_to_array(word, ''), c -> $D||c||$D),
       |         'string_agg', '') AS sym, wfreq FROM wc),
       |$iters
       |$out""".stripMargin
  }

  /** DuckDB BPE application: each symbol wrapped in its own chr(31)
    * delimiters (no shared boundaries, so adjacent merge sites both
    * fire exactly like the expression's left-to-right scan), one
    * `replace` per merge in rank order, then split back to subwords.
    */
  private def bpeEncodeSql: String = {
    val D = "chr(31)"
    def tok(s: String) = s"$D||'$s'||$D"
    val stages = BpeFixedMerges.zipWithIndex.map { case ((l, r), i) =>
      s"s${i + 1} AS (SELECT replace(sym, ${tok(l)}||${tok(r)}, " +
        s"${tok(l + r)}) AS sym, wfreq FROM s$i)"
    }.mkString(",\n")
    s"""WITH w AS (SELECT unnest($W) AS word FROM documents),
       |wc AS (SELECT word, count(*) AS wfreq FROM w
       |       WHERE length(word) > 0 GROUP BY word),
       |s0 AS (SELECT list_aggregate(list_transform(
       |         regexp_split_to_array(word, ''), c -> $D||c||$D),
       |         'string_agg', '') AS sym, wfreq FROM wc),
       |$stages,
       |sub AS (SELECT unnest(string_split(trim(sym, $D), $D||$D)) AS subword,
       |        wfreq FROM s${BpeFixedMerges.length}),
       |c AS (SELECT subword, CAST(sum(wfreq) AS BIGINT) AS freq
       |      FROM sub GROUP BY subword)
       |SELECT subword, freq,
       |       CAST(row_number() OVER (ORDER BY freq DESC, subword) AS INT)
       |         AS rank
       |FROM c QUALIFY rank <= 40""".stripMargin
  }

  /** Recursive-CTE Viterbi (forward DP + largest-k traceback) over the
    * distinct-word table `wc(word, wfreq)` under the piece-cost map CTE
    * `pm(m)` — the DuckDB replay of [[graft.functions.UnigramSegment]]'s
    * DP spec: state list `d` holds `best(i) = {c, n}` structs (struct
    * comparison is lexicographic, exactly the (cost, nPieces) order),
    * candidates are in-map pieces of length 1..maxLen PLUS the always-
    * present k=1 fallback at `charCost`, and the traceback takes the
    * LARGEST k whose candidate reproduces `best(i)`. Emits
    * `cnt$tag(piece, cnt)` = frequency-weighted piece counts.
    */
  private def unigramViterbiCtes(tag: String, pm: String, maxLen: Int,
      charCost: Long): String =
    s"""dp$tag(word, wfreq, i, d) AS (
       |  SELECT word, wfreq, 0,
       |         [{'c': CAST(0 AS BIGINT), 'n': CAST(0 AS BIGINT)}] FROM wc
       |  UNION ALL
       |  SELECT word, wfreq, i+1,
       |    list_append(d, list_min(
       |      [{'c': d[i-k+2].c + map_extract(m, substr(word, i-k+2, k))[1],
       |        'n': d[i-k+2].n + 1}
       |       for k in range(1, least($maxLen, i+1)+1)
       |       if len(map_extract(m, substr(word, i-k+2, k))) > 0] ||
       |      [{'c': d[i+1].c + $charCost, 'n': d[i+1].n + 1}]))
       |  FROM dp$tag, $pm WHERE i < length(word)
       |),
       |fdp$tag AS (SELECT word, wfreq, d FROM dp$tag
       |            WHERE i = length(word)),
       |tb$tag(word, wfreq, i, piece) AS (
       |  SELECT word, wfreq, CAST(length(word) AS INT),
       |         CAST(NULL AS VARCHAR) FROM fdp$tag
       |  UNION ALL
       |  SELECT s.word, s.wfreq, CAST(s.i - s.kstar AS INT),
       |         substr(s.word, CAST(s.i - s.kstar + 1 AS INT),
       |                CAST(s.kstar AS INT))
       |  FROM (SELECT t.word, t.wfreq, t.i,
       |          list_max(
       |            [k for k in range(1, least($maxLen, t.i)+1)
       |             if (len(map_extract(m, substr(t.word, t.i-k+1, k))) > 0
       |                 AND f.d[t.i-k+1].c + map_extract(m,
       |                       substr(t.word, t.i-k+1, k))[1] = f.d[t.i+1].c
       |                 AND f.d[t.i-k+1].n + 1 = f.d[t.i+1].n)
       |                OR (k = 1 AND f.d[t.i].c + $charCost = f.d[t.i+1].c
       |                    AND f.d[t.i].n + 1 = f.d[t.i+1].n)]) AS kstar
       |        FROM tb$tag t JOIN fdp$tag f USING (word) CROSS JOIN $pm
       |        WHERE t.i > 0) s
       |),
       |cnt$tag AS (SELECT piece, CAST(sum(wfreq) AS BIGINT) AS cnt
       |            FROM tb$tag WHERE piece IS NOT NULL GROUP BY piece)""".stripMargin

  /** DuckDB unigram-EM replay: seed substring counts → quantized cost
    * map → (Viterbi E-step, capped+smoothed M-step) × `rounds` — each
    * round one [[unigramViterbiCtes]] block, each M-step the exact
    * top-`vocabSize`-plus-character-coverage rule of
    * `UnigramLm.learnUnigram`, every log-prob on the shared
    * `floor(10⁴·ln(cnt/total))` integer grid.
    */
  private def unigramLearnSql(rounds: Int, maxLen: Int, seedSize: Int,
      vocabSize: Int): String = {
    val unk = graft.functions.UnigramSegment.UnkCost
    def lp(tbl: String) =
      s"CAST(floor(1e4 * ln(CAST(cnt AS DOUBLE) / " +
        s"(SELECT CAST(sum(cnt) AS BIGINT) FROM $tbl))) AS BIGINT)"
    def pmOf(v: String, pm: String) =
      s"$pm AS (SELECT map(list(piece ORDER BY piece), " +
        s"list(cost ORDER BY piece)) AS m FROM $v)"
    val roundCtes = (1 to rounds).map { r =>
      val prev = r - 1
      s"""${unigramViterbiCtes(r.toString, s"pm$prev", maxLen, unk)},
         |top$r AS (SELECT piece, cnt FROM cnt$r
         |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece)
         |    <= $vocabSize),
         |vc$r AS (SELECT coalesce(t.piece, c.piece) AS piece,
         |    CAST(coalesce(t.cnt, 0) +
         |      CASE WHEN length(coalesce(t.piece, c.piece)) = 1
         |           THEN 1 ELSE 0 END AS BIGINT) AS cnt
         |  FROM top$r t FULL JOIN chars c ON t.piece = c.piece),
         |v$r AS (SELECT piece, cnt, -${lp(s"vc$r")} AS cost FROM vc$r),
         |${pmOf(s"v$r", s"pm$r")}""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |w AS (SELECT unnest($W) AS word FROM documents),
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq FROM w
       |       WHERE length(word) > 0 GROUP BY word),
       |pos AS (SELECT word, wfreq,
       |          unnest(range(1, length(word) + 1)) AS i FROM wc),
       |sub AS (SELECT word, wfreq, i, unnest(range(1,
       |          least($maxLen, length(word) - i + 1) + 1)) AS k FROM pos),
       |seedc AS (SELECT substr(word, CAST(i AS INT), CAST(k AS INT))
       |            AS piece, CAST(sum(wfreq) AS BIGINT) AS cnt
       |          FROM sub GROUP BY piece),
       |seed AS (SELECT piece, cnt FROM seedc
       |  WHERE cnt >= 2 OR length(piece) = 1
       |  QUALIFY row_number() OVER (ORDER BY cnt DESC, piece) <= $seedSize
       |          OR length(piece) = 1),
       |chars AS (SELECT piece FROM seed WHERE length(piece) = 1),
       |v0 AS (SELECT piece, cnt, -${lp("seed")} AS cost FROM seed),
       |${pmOf("v0", "pm0")},
       |$roundCtes
       |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT)
       |    AS rank, piece, cnt, ${lp(s"vc$rounds")} AS lp_e4
       |FROM vc$rounds""".stripMargin
  }

  /** DuckDB per-document unigram cost: the same forward-DP CTE chain
    * (the traceback CTEs go unreferenced and unevaluated), each word's
    * DP value joined back to the document's word stream.
    */
  private def unigramScoreSql: String = {
    val keys = UnigramFixedPieces.map(p => s"'${p._1}'").mkString(", ")
    val costs = UnigramFixedPieces
      .map(p => s"CAST(${p._2} AS BIGINT) ").mkString(", ")
    s"""WITH RECURSIVE
       |w AS (SELECT unnest($W) AS word FROM documents),
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq FROM w
       |       WHERE length(word) > 0 GROUP BY word),
       |pmf AS (SELECT map([$keys], [$costs]) AS m),
       |${unigramViterbiCtes("S", "pmf", UnigramMaxLen, UnigramCharCost)},
       |wcost AS (SELECT word,
       |            d[CAST(length(word) AS INT) + 1].c AS c FROM fdpS),
       |docw AS (SELECT doc_id, unnest($W) AS word FROM documents),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |          CAST(sum(c) AS BIGINT) AS cost
       |        FROM (SELECT doc_id, word FROM docw WHERE length(word) > 0)
       |        JOIN wcost USING (word) GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(agg.n_words, 0) AS n_words,
       |       coalesce(agg.cost, 0) AS cost
       |FROM (SELECT DISTINCT doc_id FROM documents) d
       |LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** DuckDB unigram application under the fixed literal piece table —
    * one [[unigramViterbiCtes]] Viterbi over DISTINCT words, regrouped
    * by corpus word frequency.
    */
  private def unigramEncodeSql: String = {
    val keys = UnigramFixedPieces.map(p => s"'${p._1}'").mkString(", ")
    val costs = UnigramFixedPieces
      .map(p => s"CAST(${p._2} AS BIGINT)").mkString(", ")
    s"""WITH RECURSIVE
       |w AS (SELECT unnest($W) AS word FROM documents),
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq FROM w
       |       WHERE length(word) > 0 GROUP BY word),
       |pmf AS (SELECT map([$keys], [$costs]) AS m),
       |${unigramViterbiCtes("F", "pmf", UnigramMaxLen, UnigramCharCost)}
       |SELECT piece, cnt AS freq,
       |  CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INT) AS rank
       |FROM cntF QUALIFY rank <= 40""".stripMargin
  }

  /** DuckDB 3-gram shingle expression over a token-list column `w`
    * (parity with TextDedup.shingles). */
  private val ShingleSql =
    """(CASE WHEN len(w) >= 3
      | THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |                     for i in range(1, len(w)-1)])
      | ELSE list_distinct(w) END)""".stripMargin

  private def markerListSql(lang: String): String =
    TextAnalysis.langMarkers(lang).map(m => s"'$m'").mkString("[", ", ", "]")

  /** DuckDB literal list of ALL language markers (the stopword set of
    * qualityFeatures). */
  private val AllMarkersSql: String =
    TextAnalysis.langMarkers.values.flatten.toSeq.distinct
      .map(m => s"'$m'").mkString("[", ", ", "]")

  private def langScoreSql(lang: String): String =
    s"""CAST(floor(len(list_filter($W, x -> list_contains(${markerListSql(lang)}, x)))
       | * 10000.0 / len($W)) AS BIGINT)""".stripMargin

  /** Stub-decode arithmetic shared by the multimodal oracles
    * (parity with Multimodal.decodeStub). */
  private val MmN = "octet_length(CAST(text AS BLOB))"
  private val MmFirst = "ascii(substr(text, 1, 1))"
  private val MmWidth = s"CAST(16 + ($MmN % 640) AS INT)"
  private val MmHeight = s"CAST(16 + (($MmN * 31 + $MmFirst) % 480) AS INT)"
  private val MmFrames = s"CAST(1 + ($MmFirst % 30) AS INT)"

  /** DuckDB double-precision left-fold cosine (parity with Similarity:
    * list_reduce starts from the first element, and 0.0 + x == x exactly,
    * so the fold matches Spark's aggregate-with-zero-init bit for bit). */
  private def cosE6Sql(a: String, b: String): String =
    s"""CAST(floor(
       |  list_reduce([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |               for i in range(1, len($a)+1)], (x, y) -> x + y)
       |  / (sqrt(list_reduce([CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)
       |                       for i in range(1, len($a)+1)], (x, y) -> x + y))
       |   * sqrt(list_reduce([CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
       |                       for i in range(1, len($b)+1)], (x, y) -> x + y)))
       |  * 1000000.0) AS BIGINT)""".stripMargin

  /** DuckDB analog of [[graft.operators.TextDedup.md5Long]]: 60-bit hash
    * from the first 15 hex chars of md5 — bit-identical to Spark's
    * conv(substring(md5(x),1,15),16,10).
    */
  /** Staged tx fixture shared by s9/s10 (guarded on the committed
    * version, so whichever query runs first stages and the other reuses
    * it): v1 = day 1 (even order keys), v2 = day 2 (odd), v3 = DELETE
    * day 1 — a history with both additive and retiring commits.
    */
  private def stageTimeTravelTable(s: SparkSession, dir: String)
      : (graft.tableops.TxWarehouse, String) = {
    val root = s"/root/repo/target/s9_timetravel/${new java.io.File(dir).getName}"
    val wh = new graft.tableops.TxWarehouse(root)
    val tbl = wh.tablePath("bench", "orders")
    if (!wh.exists(s, tbl) || wh.currentVersion(s, tbl) < 3L) {
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val o = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      wh.append(s, o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01"))), tbl)
      wh.append(s, o.filter(col("o_orderkey") % 2 =!= 0)
        .withColumn("date", lit(java.sql.Date.valueOf("2024-01-02"))), tbl)
      wh.deletePartition(s, tbl, java.time.LocalDate.parse("2024-01-01"))
    }
    (wh, tbl)
  }

  /** s11/s13's staged merge history: v1 = orders with keys ≢0 (mod 7),
    * range-clustered; v2 = ONE mergeInto deleting loaded keys ≡0 (mod
    * 13), updating loaded keys ≡0 (mod 10) (status 'M', price+1), and
    * inserting the held-out keys ≡0 (mod 7) (status 'I', price+1).
    */
  private def stageMergeTable(s: SparkSession, dir: String)
      : (graft.tableops.TxWarehouse, String) = {
    val root = s"/root/repo/target/s11_merge/${new java.io.File(dir).getName}"
    val wh = new graft.tableops.TxWarehouse(root)
    val tbl = wh.tablePath("bench", "orders")
    if (wh.currentVersion(s, tbl) < 2L) {
      val hp = new org.apache.hadoop.fs.Path(root)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("date", lit(java.sql.Date.valueOf("2024-01-01")))
      val k = col("o_orderkey")
      wh.append(s, o.filter(k % 7 =!= 0)
        .repartitionByRange(8, col("o_orderkey")), tbl) // v1
      val changes = o.filter(k % 7 =!= 0 && k % 13 === 0)
        .withColumn("del", lit(true))
        .unionByName(o.filter(k % 7 =!= 0 && k % 13 =!= 0 && k % 10 === 0)
          .withColumn("o_orderstatus", lit("M"))
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("del", lit(false)))
        .unionByName(o.filter(k % 7 === 0)
          .withColumn("o_orderstatus", lit("I"))
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("del", lit(false)))
      wh.mergeInto(s, changes, tbl, Seq("o_orderkey"), Some("del")) // v2
    }
    (wh, tbl)
  }

  /** Shared CTE chain replaying the deterministic logistic-regression
    * training (dim 8, 2 iterations, lang='en' labels — the
    * tx_quality_logreg configuration) up to the final weights `w2(j,
    * w_e6)`, with the feature table `fx` still in scope for the scoring
    * oracle.
    */
  private lazy val logRegCte: String = {
    val h = md5LongSql("w")
    s"""t AS (SELECT doc_id, unnest($W) AS w FROM documents),
       |tt AS (SELECT doc_id, w FROM t WHERE length(w) > 0),
       |fx AS (SELECT doc_id, CAST($h % 8 AS INT) AS j, count(*) AS x
       |         FROM tt GROUP BY 1, 2
       |       UNION ALL SELECT doc_id, 8, 1 FROM documents),
       |y AS (SELECT doc_id,
       |        CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS y_e6
       |      FROM documents),
       |nn AS (SELECT count(*) AS n FROM documents),
       |g0 AS (SELECT j, CAST(sum((500000 - y_e6) * x) AS BIGINT) AS g
       |       FROM fx JOIN y USING (doc_id) GROUP BY j),
       |w1 AS (SELECT j,
       |         CAST(0 - floor(CAST(g AS DOUBLE) / (n * 1000e0)) AS BIGINT)
       |           AS w_e6
       |       FROM g0 CROSS JOIN nn),
       |m1 AS (SELECT doc_id, CAST(sum(w_e6 * x) AS BIGINT) AS m_e6
       |       FROM fx JOIN w1 USING (j) GROUP BY doc_id),
       |p1 AS (SELECT doc_id,
       |         CAST(floor(1000000e0 /
       |           (1e0 + exp(-(CAST(m_e6 AS DOUBLE) / 1000000e0)))) AS BIGINT)
       |           AS p_e6
       |       FROM m1),
       |g1 AS (SELECT j, CAST(sum((p_e6 - y_e6) * x) AS BIGINT) AS g
       |       FROM fx JOIN p1 USING (doc_id) JOIN y USING (doc_id)
       |       GROUP BY j),
       |w2 AS (SELECT w1.j,
       |         CAST(w1.w_e6 - floor(CAST(g1.g AS DOUBLE) / (n * 1000e0))
       |           AS BIGINT) AS w_e6
       |       FROM w1 JOIN g1 USING (j) CROSS JOIN nn)""".stripMargin
  }

  /** Shared oracle for sim_ivf_topk AND sim_ivf_indexed (nprobe=1,
    * queries vec_id < 10, k = 5): the index materialization must be
    * invisible in the results.
    */
  private lazy val ivfTopKSql: String = {
    val cosAssign = cosE6Sql("e.embedding", "c.embedding")
    val cosScore = cosE6Sql("q.qv", "n.v")
    s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
       |           WHERE vec_id % 50 = 0),
       |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
       |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
       |assign AS (SELECT vec_id, cent_id, v FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, cent_id, v AS qv FROM assign
       |      WHERE vec_id < 10),
       |scored AS (SELECT q.qid AS query_id, n.vec_id AS nbr_id, $cosScore AS cos_e6
       |           FROM assign n JOIN q ON n.cent_id = q.cent_id
       |           WHERE q.qid <> n.vec_id),
       |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY cos_e6 DESC, nbr_id ASC) AS INT) AS rank FROM scored)
       |SELECT query_id, nbr_id, cos_e6, rank FROM ranked WHERE rank <= 5""".stripMargin
  }

  private def md5LongSql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 15)) AS BIGINT)"

  /** Shared CTE chain for [[graft.operators.Packing.packGreedy]] oracles:
    * shards `srcCte`(idCol, lenCol) by the salted hash, then folds each
    * shard's id-ordered row chain through the greedy next-fit recurrence.
    * Ends in `rec(shard, rn, pid, plen, bin, bin_offset, fill)`; callers
    * must open WITH RECURSIVE.
    *
    * `pk` is MATERIALIZED: the recursive `rec` joins it once per
    * recursion step, and DuckDB inlines plain CTEs — with an expensive
    * `srcCte` upstream (ds_prepare_training's whole hygiene chain) every
    * step would re-evaluate it (observed: the sf0.1 oracle ran 30+ min
    * before the hint, seconds after).
    */
  private def packRecSql(srcCte: String, idCol: String, lenCol: String,
      budget: Long, shards: Int, salt: String): String =
    s"""pk0 AS (SELECT $idCol AS pid, $lenCol AS plen,
       |         (${md5LongSql(s"concat('$salt#', CAST($idCol AS VARCHAR))")}
       |          % $shards) AS shard
       |       FROM $srcCte),
       |pk AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY shard
       |        ORDER BY pid) AS rn FROM pk0),
       |rec(shard, rn, pid, plen, bin, bin_offset, fill) AS (
       |  SELECT shard, rn, pid, plen, CAST(0 AS BIGINT),
       |         CAST(0 AS BIGINT), plen
       |  FROM pk WHERE rn = 1
       |  UNION ALL
       |  SELECT pk.shard, pk.rn, pk.pid, pk.plen,
       |    CASE WHEN r.fill + pk.plen <= $budget THEN r.bin ELSE r.bin + 1 END,
       |    CASE WHEN r.fill + pk.plen <= $budget THEN r.fill
       |         ELSE CAST(0 AS BIGINT) END,
       |    CASE WHEN r.fill + pk.plen <= $budget THEN r.fill + pk.plen
       |         ELSE pk.plen END
       |  FROM rec r JOIN pk ON pk.shard = r.shard AND pk.rn = r.rn + 1)""".stripMargin

  /** Length-banded jaccard pair CTE chain ending in `p(id_a, id_b,
    * jaccard_e4)` — shared by dd_ngram_jaccard, dd_cluster_minlabel and
    * ds_corpus_clean (which runs it over a filtered CTE instead of the
    * raw table).
    */
  private def jaccardPairCtes(src: String): String =
    s"""t AS (SELECT doc_id, n_chars, $W AS w FROM $src),
       |s AS (SELECT doc_id, n_chars, $ShingleSql AS sh,
       |        CAST(floor(n_chars / 32.0) AS BIGINT) AS b0 FROM t),
       |bl AS (SELECT s.*, u.bucket FROM s,
       |        unnest([s.b0, s.b0 + 1]) AS u(bucket)),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(floor(len(list_intersect(a.sh, b.sh)) * 10000.0
       |    / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) AS jaccard_e4
       |  FROM bl a JOIN bl b ON a.bucket = b.bucket
       |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 32
       |    AND a.bucket = greatest(a.b0, b.b0))""".stripMargin

  /** Oracle for `ev_label_propagation`: `iters` rounds of synchronous
    * weighted label propagation over the symmetrized Markov transition
    * edges, unrolled (each round = score join + max-weight + max-label
    * tie-break — the same struct-max contract as
    * [[graft.operators.GraphAlgos.labelPropagation]]). Fixed iteration
    * count makes the result a pure function of the input, which is what
    * lets a SQL engine replay it at all.
    */
  /** Oracle for `sim_mmr_topk`: the greedy MMR selection unrolled to
    * `k` picks — shortlist by brute cosine rank, precomputed candidate-
    * pair sims, then per pick an anti-join against the cumulative
    * selected set, the max-sim penalty, and a (mmr DESC, id ASC)
    * row_number argmax. Integer λ-percent arithmetic matches
    * [[graft.operators.Similarity.mmrTopK]] exactly.
    */
  private def mmrSql(m: Int, k: Int, lambdaPct: Int): String = {
    val lam = lambdaPct
    val oml = 100 - lambdaPct
    val rounds = (1 to k).map { i =>
      val prev = s"s${i - 1}"
      s"""cand$i AS (SELECT s.* FROM sh s WHERE NOT EXISTS (
         |  SELECT 1 FROM $prev p
         |  WHERE p.query_id = s.query_id AND p.nbr_id = s.nbr_id)),
         |ms$i AS (SELECT ps.query_id, ps.id_x AS nbr_id,
         |    max(ps.sim_e6) AS msim
         |  FROM ps JOIN $prev p ON p.query_id = ps.query_id
         |    AND p.nbr_id = ps.id_y
         |  GROUP BY ps.query_id, ps.id_x),
         |sc$i AS (SELECT c.query_id, c.nbr_id,
         |    $lam * c.cos_e6 - $oml * coalesce(m.msim, 0) AS mmr_e8
         |  FROM cand$i c LEFT JOIN ms$i m
         |    ON m.query_id = c.query_id AND m.nbr_id = c.nbr_id),
         |s$i AS (SELECT * FROM $prev UNION ALL
         |  SELECT query_id, nbr_id, mmr_e8, CAST($i AS INT) AS rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY mmr_e8 DESC, nbr_id ASC) AS rn FROM sc$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |           WHERE vec_id < 10),
       |scored AS (SELECT q.qid AS query_id, e.vec_id AS nbr_id,
       |    ${cosE6Sql("q.qv", "e.embedding")} AS cos_e6
       |  FROM embeddings e JOIN q ON q.qid <> e.vec_id),
       |sh AS (SELECT query_id, nbr_id, cos_e6 FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_e6 DESC, nbr_id ASC) AS rn FROM scored)
       |  WHERE rn <= $m),
       |ps AS (SELECT x.query_id, x.nbr_id AS id_x, y.nbr_id AS id_y,
       |    ${cosE6Sql("ex.embedding", "ey.embedding")} AS sim_e6
       |  FROM sh x JOIN sh y ON x.query_id = y.query_id
       |    AND x.nbr_id <> y.nbr_id
       |  JOIN embeddings ex ON ex.vec_id = x.nbr_id
       |  JOIN embeddings ey ON ey.vec_id = y.nbr_id),
       |s0 AS (SELECT query_id, nbr_id, CAST(0 AS BIGINT) AS mmr_e8,
       |         CAST(0 AS INT) AS rank FROM sh WHERE false),
       |$rounds
       |SELECT query_id, nbr_id, CAST(mmr_e8 AS BIGINT) AS mmr_e8, rank
       |FROM s$k""".stripMargin
  }

  /** Oracle for `ev_harmonic`: `iters` unrolled synchronous min-plus
    * BFS rounds over the symmetrized transition edges, then
    * Σ 10⁶ div d per node — the SQL replay of
    * [[graft.operators.GraphAlgos.harmonicCentrality]].
    */
  private def harmonicSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"d${i - 1}"
      s"""d$i AS (SELECT src, node, min(d) AS d FROM (
         |  SELECT src, node, d FROM $prev
         |  UNION ALL
         |  SELECT p.src, und.v AS node, p.d + 1 AS d
         |  FROM $prev p JOIN und ON und.u = p.node)
         |  GROUP BY src, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH o AS (SELECT user_id, event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
       |  FROM events),
       |e0 AS (SELECT src AS a, dst AS b FROM o
       |       WHERE dst IS NOT NULL AND src <> dst),
       |und AS (SELECT DISTINCT u, v FROM (
       |    SELECT a AS u, b AS v FROM e0
       |    UNION ALL SELECT b AS u, a AS v FROM e0)),
       |d0 AS (SELECT DISTINCT u AS src, u AS node, CAST(0 AS BIGINT) AS d
       |       FROM und),
       |$rounds
       |SELECT node AS event_type, count(*) AS n_reachable,
       |  CAST(sum(1000000 // d) AS BIGINT) AS harmonic_e6
       |FROM d$iters WHERE d > 0 GROUP BY node""".stripMargin
  }

  /** Oracle for `dd_kcoreness`: `iters` unrolled neighborhood-H-index
    * rounds over the symmetrized near-dup pair graph — each round ranks
    * a node's incoming neighbor estimates descending and takes
    * `max(least(rank, est))`, exactly
    * [[graft.operators.GraphAlgos.kCoreness]]'s window form. Fixed
    * round count = pure function of the input, replayable by any SQL
    * engine.
    */
  private def kCorenessSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      s"""s$i AS (SELECT und.u, c.est AS nest FROM und
         |  JOIN $prev c ON c.node = und.v),
         |r$i AS (SELECT u, nest, row_number() OVER (PARTITION BY u
         |  ORDER BY nest DESC) AS rn FROM s$i),
         |c$i AS (SELECT u AS node, max(least(rn, nest)) AS est
         |  FROM r$i GROUP BY u)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${jaccardPairCtes("documents")},
       |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
       |und AS (SELECT id_a AS u, id_b AS v FROM pr
       |        UNION SELECT id_b AS u, id_a AS v FROM pr),
       |c0 AS (SELECT u AS node, count(*) AS est FROM und GROUP BY u),
       |$rounds
       |SELECT CAST(node AS BIGINT) AS doc_id, CAST(est AS BIGINT) AS coreness
       |FROM c$iters""".stripMargin
  }

  private def labelPropagationSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""s$i AS (SELECT u.a AS node, l.label, sum(u.w) AS lw
         |  FROM und u JOIN $prev l ON l.node = u.b GROUP BY u.a, l.label),
         |m$i AS (SELECT node, max(lw) AS mw FROM s$i GROUP BY node),
         |l$i AS (SELECT s$i.node, max(s$i.label) AS label FROM s$i
         |  JOIN m$i ON m$i.node = s$i.node AND s$i.lw = m$i.mw
         |  GROUP BY s$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH o AS (SELECT user_id, event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
       |  FROM events),
       |e AS (SELECT src, dst, count(*) AS w FROM o
       |      WHERE dst IS NOT NULL GROUP BY src, dst),
       |e2 AS (SELECT src, dst, w FROM e WHERE src <> dst),
       |und AS (SELECT a, b, sum(w) AS w FROM (
       |    SELECT src AS a, dst AS b, w FROM e2
       |    UNION ALL SELECT dst AS a, src AS b, w FROM e2)
       |  GROUP BY a, b),
       |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
       |$rounds
       |SELECT node AS event_type, label AS community FROM l$iters""".stripMargin
  }

  /** Connected components of the jaccard pair graph: min reachable id
    * per node via a recursive CTE. Shared by dd_cluster_minlabel (Spark
    * side: min-label sweep) and dd_cluster_cc (Spark side: large-star/
    * small-star contraction) — the label is a property of the graph.
    */
  private lazy val minReachableLabelSql: String =
    s"""WITH RECURSIVE ${jaccardPairCtes("documents")},
       |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
       |e AS (SELECT id_a AS a, id_b AS b FROM pr
       |      UNION SELECT id_b AS a, id_a AS b FROM pr),
       |reach(n, m) AS (
       |  SELECT a, a FROM e
       |  UNION
       |  SELECT r.n, e2.b FROM reach r JOIN e e2 ON e2.a = r.m)
       |SELECT n AS id, CAST(min(m) AS BIGINT) AS label
       |FROM reach GROUP BY n""".stripMargin

  private val mCols =
    """id, "date", parser_time, l_orderkey, l_partkey, l_suppkey, l_linenumber,
      | l_quantity, l_extendedprice, l_returnflag, l_linestatus""".stripMargin

  /** Shared incremental-dedup oracle: odd doc_ids are the new batch;
    * `seenCond(col)` scopes the SEEN corpus (the materialized-index
    * variants evolve it through appends and deletes).
    */
  private def ddIncrementalSql(seenCond: String => String): String =
    s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
       |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
       |h AS (SELECT doc_id, list_transform(sh, x -> ${md5LongSql("x")}) AS hl
       |      FROM s),
       |sg AS (SELECT doc_id,
       |        [list_min(list_transform(hl, x -> CAST(concat('0x',
       |           substr(md5(concat(CAST(i // 2 AS VARCHAR), '#',
       |                             CAST(x AS VARCHAR))),
       |                  1 + 15 * (i % 2), 15)) AS BIGINT)))
       |         for i in range(0, 16)] AS sig
       |       FROM h),
       |b AS (SELECT doc_id, u.b AS band,
       |        array_to_string(sig[u.b * 4 + 1 : u.b * 4 + 4], ',') AS bucket
       |      FROM sg, unnest([0, 1, 2, 3]) AS u(b)),
       |seenfp AS (SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents
       |           WHERE ${seenCond("doc_id")}),
       |cand AS (SELECT DISTINCT n.doc_id AS new_id, sn.doc_id AS seen_id
       |         FROM b n JOIN b sn ON n.band = sn.band AND n.bucket = sn.bucket
       |         WHERE n.doc_id % 2 = 1 AND ${seenCond("sn.doc_id")}),
       |bad AS (SELECT DISTINCT c.new_id FROM cand c
       |        JOIN h ha ON ha.doc_id = c.new_id
       |        JOIN h hb ON hb.doc_id = c.seen_id
       |        WHERE CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 /
       |          (len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl))))
       |          AS BIGINT) >= 5000)
       |SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE doc_id % 2 = 1
       |  AND md5(lower(trim(text))) NOT IN (SELECT fp FROM seenfp)
       |  AND doc_id NOT IN (SELECT new_id FROM bad)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "w1_dedup_keepset" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time = max_t""".stripMargin,

    "j2_dedup_deleted_set" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time <> max_t""".stripMargin,

    "j3_bloom_semijoin" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_e2,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = lineitem.l_orderkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "w1_dedup_keepset_skew" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time = max_t""".stripMargin,

    "w2_dedup_ranked" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, row_number() OVER (PARTITION BY id, "date"
         |  ORDER BY l_quantity DESC, l_returnflag ASC, parser_time DESC,
         |           l_orderkey ASC, l_linenumber ASC) AS rn FROM m)
         |SELECT $mCols FROM r WHERE rn = 1""".stripMargin,

    "w5_duplicate_stats" ->
      s"""WITH m AS ($M)
         |SELECT id, "date", count(*) AS rows,
         |       count(DISTINCT parser_time) AS versions
         |FROM m GROUP BY id, "date"
         |HAVING count(DISTINCT parser_time) > 1""".stripMargin,

    "p5_dedup_nested_key" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time = max_t""".stripMargin,

    "w4_dedup_ts_concat_key" ->
      """WITH r AS (SELECT *, row_number() OVER (
        |  PARTITION BY concat(CAST(date_trunc('hour', ts) AS VARCHAR), '|',
        |               CAST(user_id AS VARCHAR))
        |  ORDER BY ts DESC, event_id ASC) AS rn FROM events)
        |SELECT event_id, ts, user_id, event_type, value, props
        |FROM r WHERE rn = 1""".stripMargin,

    "s1_load_json" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "s1_load_csv" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "s1_load_orc" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "s1_load_json_gz" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "s1_load_json_bz2" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",

    "dd_cdc_chunks" -> {
      // the SAME window dot product the Spark expression computes —
      // powers shared via TextAnalysis.CdcPowers, so cuts agree bit-exactly
      val terms = TextAnalysis.CdcPowers.zipWithIndex.map { case (p, j) =>
        s"CAST(ascii(substr(text, i + $j, 1)) AS BIGINT) * $p"
      }.mkString(" + ")
      val w = TextAnalysis.CdcWindow
      s"""WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
         |    length(coalesce(text, '')) AS n FROM documents),
         |pos AS (SELECT doc_id, text, n,
         |          unnest(range(1, n - $w + 2)) AS i FROM d WHERE n >= $w),
         |h AS (SELECT doc_id, i, ($terms) AS s FROM pos),
         |cuts AS (SELECT doc_id, i + $w - 1 AS cut FROM h WHERE s % 32 = 0),
         |ca AS (SELECT doc_id, list_sort(list(cut)) AS cl FROM cuts
         |       GROUP BY doc_id),
         |bounds AS (SELECT d.doc_id, d.text,
         |             -- list_distinct does NOT preserve order: re-sort
         |             list_sort(list_distinct(
         |               list_append(coalesce(ca.cl, []), d.n))) AS ends
         |           FROM d LEFT JOIN ca USING (doc_id)),
         |ch AS (SELECT doc_id, text, ends,
         |         unnest(range(1, len(ends) + 1)) AS ci FROM bounds),
         |chunks AS (SELECT doc_id,
         |             CASE WHEN ci = 1 THEN 1 ELSE ends[ci - 1] + 1 END
         |               AS cstart,
         |             ends[ci] AS cend, text FROM ch),
         |fp AS (SELECT doc_id,
         |         md5(substr(text, cstart, cend - cstart + 1)) AS chunk_fp,
         |         CAST(cend - cstart + 1 AS BIGINT) AS chunk_len
         |       FROM chunks WHERE cend >= cstart)
         |SELECT chunk_fp, CAST(max(chunk_len) AS BIGINT) AS chunk_len,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_occurrences
         |FROM fp GROUP BY chunk_fp
         |HAVING count(DISTINCT doc_id) >= 2 AND max(chunk_len) >= 8""".stripMargin
    },

    "dd_chunk_dups" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |c AS (SELECT doc_id, len(w) AS n, w,
         |        unnest(list_transform(
         |          range(0, CAST(floor((len(w) - 1) / 24) AS BIGINT) + 1),
         |          i -> i * 24)) AS chunk_start
         |      FROM t),
         |ch AS (SELECT doc_id, CAST(chunk_start // 24 AS BIGINT) AS chunk_idx,
         |         md5(array_to_string(w[chunk_start + 1 : chunk_start + 32], ' '))
         |           AS chunk_fp
         |       FROM c),
         |g AS (SELECT chunk_fp, count(DISTINCT doc_id) AS n_docs FROM ch
         |      GROUP BY chunk_fp HAVING count(DISTINCT doc_id) >= 2)
         |SELECT ch.doc_id, ch.chunk_idx, ch.chunk_fp, g.n_docs
         |FROM ch JOIN g USING (chunk_fp)""".stripMargin,

    "dd_boilerplate_strip" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |c AS (SELECT doc_id, len(w) AS nw, w,
         |        unnest(list_transform(
         |          range(0, CAST(floor((len(w) - 1) / 16) AS BIGINT) + 1),
         |          i -> i * 16)) AS s
         |      FROM t),
         |ch AS (SELECT doc_id, CAST(s // 16 AS BIGINT) AS idx,
         |         CAST(least(nw - s, 16) AS BIGINT) AS ntok,
         |         array_to_string(w[s + 1 : s + 16], ' ') AS ctext
         |       FROM c),
         |hot AS (SELECT md5(ctext) AS fp FROM ch
         |        GROUP BY md5(ctext)
         |        HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT ch.*, (hot.fp IS NOT NULL) AS is_hot
         |      FROM ch LEFT JOIN hot ON hot.fp = md5(ch.ctext))
         |SELECT doc_id, count(*) AS n_chunks,
         |       CAST(sum(CASE WHEN NOT is_hot THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_kept_chunks,
         |       CAST(coalesce(sum(CASE WHEN NOT is_hot THEN ntok END), 0)
         |         AS BIGINT) AS n_kept_tokens,
         |       coalesce(string_agg(CASE WHEN NOT is_hot THEN ctext END,
         |         ' ' ORDER BY idx), '') AS clean_text
         |FROM f GROUP BY doc_id""".stripMargin,

    "dd_substring" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |p AS (SELECT doc_id, unnest(range(0, len(w) - 8 + 1)) AS pos, w
         |      FROM t WHERE len(w) >= 8),
         |wf AS (SELECT doc_id, pos,
         |         md5(array_to_string(w[pos + 1 : pos + 8], ' ')) AS fp
         |       FROM p),
         |hot AS (SELECT fp FROM wf GROUP BY fp HAVING count(*) >= 2),
         |dd AS (SELECT doc_id, pos FROM wf JOIN hot USING (fp)),
         |g AS (SELECT doc_id, pos,
         |        CASE WHEN pos - lag(pos) OVER
         |          (PARTITION BY doc_id ORDER BY pos) <= 8
         |        THEN 0 ELSE 1 END AS brk FROM dd),
         |i AS (SELECT doc_id, pos, sum(brk) OVER
         |        (PARTITION BY doc_id ORDER BY pos) AS isl FROM g)
         |SELECT doc_id, min(pos) + 1 AS span_start,
         |  max(pos) - min(pos) + 8 AS span_len,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM i GROUP BY doc_id, isl""".stripMargin,

    "dd_substring_strip" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |p AS (SELECT doc_id, unnest(range(0, len(w) - 8 + 1)) AS pos, w
         |      FROM t WHERE len(w) >= 8),
         |wf AS (SELECT doc_id, pos,
         |         md5(array_to_string(w[pos + 1 : pos + 8], ' ')) AS fp
         |       FROM p),
         |c AS (SELECT fp, count(*) AS cnt, min(ROW(doc_id, pos)) AS canon
         |      FROM wf GROUP BY fp HAVING count(*) >= 2),
         |nc AS (SELECT wf.doc_id, wf.pos FROM wf JOIN c USING (fp)
         |       WHERE ROW(wf.doc_id, wf.pos) <> c.canon),
         |cov AS (SELECT DISTINCT doc_id,
         |          unnest(range(pos + 1, pos + 8 + 1)) AS ti FROM nc),
         |ca AS (SELECT doc_id, list_sort(list(ti)) AS cl FROM cov
         |       GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(len(ca.cl), 0) AS BIGINT) AS n_removed_tokens,
         |  coalesce(array_to_string(
         |    [w[CAST(i AS INT)] for i in range(1, len(w) + 1)
         |     if NOT list_contains(coalesce(ca.cl, []), i)], ' '), '')
         |    AS clean_text
         |FROM t LEFT JOIN ca USING (doc_id)""".stripMargin,

    "ev_pagerank" ->
      """WITH o AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events),
        |e AS (SELECT src, dst, count(*) AS w FROM o
        |      WHERE dst IS NOT NULL GROUP BY src, dst),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |          UNION SELECT DISTINCT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY src),
        |r0 AS (SELECT node, (1000000000000 // nn.n) AS r
        |       FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r0 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.node,
        |         (15 * (1000000000000 // nn.n)) // 100
        |           + (85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn
        |       LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r1 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.node,
        |         (15 * (1000000000000 // nn.n)) // 100
        |           + (85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn
        |       LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r2 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.node,
        |         (15 * (1000000000000 // nn.n)) // 100
        |           + (85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn
        |       LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node AS event_type, r AS rank_e12 FROM r3""".stripMargin,

    "ev_label_propagation" -> labelPropagationSql(4),

    "ev_harmonic" -> harmonicSql(6),
    "ev_harmonic_approx" -> XxOracleSql.harmonicApprox(6, 6),

    "ev_closeness_approx" -> XxOracleSql.closenessApprox(6, 6),

    "ev_diameter_approx" -> XxOracleSql.diameterApprox(6, 6),

    "ev_attribution" ->
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts2,
        |    event_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN
        |        struct_pack(t_ts := CAST(ts AS TIMESTAMP),
        |          t_id := event_id, t_type := event_type) END
        |      IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP), event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM events)
        |SELECT CASE WHEN lt IS NULL
        |         OR lt.t_ts < ts2 - INTERVAL 7 DAY THEN 'direct'
        |       ELSE lt.t_type END AS channel,
        |  count(*) AS n_conversions
        |FROM o WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "ev_ppr_purchase" ->
      """WITH o AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events),
        |e AS (SELECT src, dst, count(*) AS w FROM o
        |      WHERE dst IS NOT NULL GROUP BY src, dst),
        |nodes AS (SELECT DISTINCT src AS node FROM e
        |          UNION SELECT DISTINCT dst FROM e),
        |ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY src),
        |r0 AS (SELECT node, CASE WHEN node = 'purchase'
        |         THEN 1000000000000 ELSE 0 END AS r FROM nodes),
        |c1 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r0 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r1 AS (SELECT nodes.node,
        |         CASE WHEN nodes.node = 'purchase'
        |           THEN (15 * 1000000000000) // 100 ELSE 0 END
        |           + (85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r1 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r2 AS (SELECT nodes.node,
        |         CASE WHEN nodes.node = 'purchase'
        |           THEN (15 * 1000000000000) // 100 ELSE 0 END
        |           + (85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, CAST(sum((r.r * e.w) // ow.outw) AS BIGINT) AS s
        |       FROM e JOIN r2 r ON r.node = e.src
        |       JOIN ow ON ow.src = e.src GROUP BY e.dst),
        |r3 AS (SELECT nodes.node,
        |         CASE WHEN nodes.node = 'purchase'
        |           THEN (15 * 1000000000000) // 100 ELSE 0 END
        |           + (85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM nodes LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node AS event_type, CAST(r AS BIGINT) AS ppr_e12 FROM r3""".stripMargin,

    "ev_triangles" ->
      """WITH o AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events),
        |e0 AS (SELECT src AS a, dst AS b FROM o
        |       WHERE dst IS NOT NULL AND src <> dst),
        |und AS (SELECT DISTINCT u, v FROM (
        |    SELECT a AS u, b AS v FROM e0
        |    UNION ALL SELECT b AS u, a AS v FROM e0)),
        |deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
        |orient AS (SELECT und.u AS lo, und.v AS hi FROM und
        |  JOIN deg du ON du.u = und.u JOIN deg dv ON dv.u = und.v
        |  WHERE (du.d, und.u) < (dv.d, und.v)),
        |wed AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        |        FROM orient e1 JOIN orient e2
        |        ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |closing AS (SELECT lo AS y, hi AS z FROM orient
        |            UNION ALL SELECT hi, lo FROM orient),
        |tri AS (SELECT x, y, z FROM wed JOIN closing USING (y, z)),
        |pern AS (SELECT node, count(*) AS nt FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT deg.u AS event_type,
        |       CAST(coalesce(pern.nt, 0) AS BIGINT) AS n_triangles
        |FROM deg LEFT JOIN pern ON pern.node = deg.u""".stripMargin,

    "ev_clustering_coef" ->
      """WITH o AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events),
        |e0 AS (SELECT src AS a, dst AS b FROM o
        |       WHERE dst IS NOT NULL AND src <> dst),
        |und AS (SELECT DISTINCT u, v FROM (
        |    SELECT a AS u, b AS v FROM e0
        |    UNION ALL SELECT b AS u, a AS v FROM e0)),
        |deg AS (SELECT u, count(*) AS d FROM und GROUP BY u),
        |orient AS (SELECT und.u AS lo, und.v AS hi FROM und
        |  JOIN deg du ON du.u = und.u JOIN deg dv ON dv.u = und.v
        |  WHERE (du.d, und.u) < (dv.d, und.v)),
        |wed AS (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
        |        FROM orient e1 JOIN orient e2
        |        ON e1.lo = e2.lo AND e1.hi < e2.hi),
        |closing AS (SELECT lo AS y, hi AS z FROM orient
        |            UNION ALL SELECT hi, lo FROM orient),
        |tri AS (SELECT x, y, z FROM wed JOIN closing USING (y, z)),
        |pern AS (SELECT node, count(*) AS nt FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT deg.u AS event_type, CAST(deg.d AS BIGINT) AS degree,
        |       CAST(coalesce(pern.nt, 0) AS BIGINT) AS n_triangles,
        |       CAST(CASE WHEN deg.d < 2 THEN 0
        |         ELSE (2 * coalesce(pern.nt, 0) * 1000000)
        |              // (deg.d * (deg.d - 1)) END AS BIGINT) AS cc_e6
        |FROM deg LEFT JOIN pern ON pern.node = deg.u""".stripMargin,

    "ds_waterfill_quota" ->
      """WITH c AS (SELECT source, count(*) AS n_items FROM documents
        |           GROUP BY source),
        |r AS (SELECT *,
        |        row_number() OVER (ORDER BY n_items, source) AS i,
        |        sum(n_items) OVER (ORDER BY n_items, source) AS p,
        |        count(*) OVER () AS k FROM c),
        |capped AS (SELECT (120 - (p - n_items)) // (k - i + 1) AS capv
        |           FROM r WHERE (p - n_items) + (k - i + 1) * n_items > 120
        |           ORDER BY i LIMIT 1),
        |yfull AS (SELECT max(n_items) AS capfull FROM c),
        |cap AS (SELECT coalesce((SELECT capv FROM capped),
        |                        (SELECT capfull FROM yfull)) AS cap)
        |SELECT c.source, c.n_items, CAST(cap.cap AS BIGINT) AS cap,
        |       CAST(least(c.n_items, cap.cap) AS BIGINT) AS alloc
        |FROM c, cap""".stripMargin,

    "ev_cms_freq" -> XxOracleSql.cmsFreq(4, 10),
    "ev_cms_union" -> XxOracleSql.cmsUnion(4, 10),
    "ev_hll_users" -> XxOracleSql.hllUsers(9),

    "ev_theta_intersect" ->
      XxOracleSql.thetaIntersect(256, "purchase", "view"),

    "ev_theta_union" -> XxOracleSql.thetaUnion(256),

    "ev_hll_estimate" -> XxOracleSql.hllEstimate(9),

    "ev_hll_union" -> XxOracleSql.hllUnion(9),

    "ds_shuffle_order" -> XxOracleSql.shuffleOrder(),

    "tx_bigram_lift" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |                x -> x <> '') AS w FROM documents),
        |u AS (SELECT unnest(w) AS tok FROM t),
        |cx AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
        |nn AS (SELECT count(*) AS n FROM u),
        |bg AS (SELECT unnest(list_transform(range(1, len(w)),
        |         i -> w[i] || ' ' || w[i + 1])) AS b FROM t),
        |cxy AS (SELECT b, count(*) AS n_pair FROM bg GROUP BY b
        |        HAVING count(*) >= 5),
        |j AS (SELECT cxy.b, cxy.n_pair, x1.c AS c1, x2.c AS c2 FROM cxy
        |      JOIN cx x1 ON x1.tok = split_part(cxy.b, ' ', 1)
        |      JOIN cx x2 ON x2.tok = split_part(cxy.b, ' ', 2))
        |SELECT b AS bigram, n_pair,
        |       CAST((n_pair * 1000000 * nn.n) // (c1 * c2) AS BIGINT)
        |         AS lift_e6
        |FROM j, nn ORDER BY lift_e6 DESC, bigram LIMIT 25""".stripMargin,

    "tx_vocab_coverage" ->
      """WITH u AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
        |nn AS (SELECT count(*) AS n FROM u),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rnk
        |      FROM c),
        |ks AS (SELECT unnest([100, 1000, 10000]) AS k)
        |SELECT CAST(ks.k AS INT) AS k,
        |       CAST(sum(r.c) AS BIGINT) AS covered_tokens,
        |       CAST(nn.n AS BIGINT) AS total_tokens,
        |       CAST((sum(r.c) * 1000000) // nn.n AS BIGINT) AS coverage_e6
        |FROM ks, r, nn WHERE r.rnk <= ks.k
        |GROUP BY ks.k, nn.n""".stripMargin,

    "tx_readability" ->
      """WITH c AS (SELECT doc_id,
        |    greatest(len(regexp_extract_all(text, '\S+')), 1) AS n_words,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS nv
        |  FROM documents)
        |SELECT doc_id, n_words, n_sentences,
        |       greatest(nv, n_words) AS n_syllables,
        |       206835000 - (1015000 * n_words) // n_sentences
        |         - (84600000 * greatest(nv, n_words)) // n_words AS fre_micro
        |FROM c""".stripMargin,

    "w3_dedup_concat_key" ->
      s"""WITH r AS (SELECT *, row_number() OVER (
         |  PARTITION BY concat(l_returnflag, '|', CAST(l_partkey % 50 AS VARCHAR))
         |  ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC) AS rn
         |  FROM lineitem)
         |SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         |       l_shipdate
         |FROM r WHERE rn = 1""".stripMargin,

    "j1_annotation_join" ->
      s"""WITH m AS ($D), a AS ($A)
         |SELECT m.id, m."date", m.parser_time,
         |       a.ann_orderkey, a.ann_status, a.ann_totalprice, a.ann_priority,
         |       m.l_orderkey, m.l_partkey, m.l_suppkey, m.l_linenumber,
         |       m.l_quantity, m.l_extendedprice, m.l_returnflag, m.l_linestatus
         |FROM (SELECT * FROM m WHERE "date" = $JobDateSql) m
         |LEFT JOIN (SELECT * FROM a
         |           WHERE "date" BETWEEN $JobDatePrevSql AND $JobDateSql) a
         |USING (id)""".stripMargin,

    "j1_asof_all_days" ->
      s"""WITH m AS ($D), a AS ($A)
         |SELECT m.id, m."date", m.parser_time,
         |       a.ann_orderkey, a.ann_status, a.ann_totalprice, a.ann_priority,
         |       m.l_orderkey, m.l_partkey, m.l_suppkey, m.l_linenumber,
         |       m.l_quantity, m.l_extendedprice, m.l_returnflag, m.l_linestatus
         |FROM m LEFT JOIN a
         |  ON m.id = a.id AND a."date" BETWEEN m."date" - 1 AND m."date"""".stripMargin,

    "s2_copy_partition" ->
      s"""WITH m AS ($D) SELECT * FROM m WHERE "date" = $JobDateSql""",

    "s3_delete_remaining" ->
      s"""WITH m AS ($D) SELECT * FROM m WHERE "date" <> $JobDateSql""",

    "p2_asof_window" ->
      s"""WITH a AS ($A)
         |SELECT * FROM a WHERE "date" BETWEEN $JobDatePrevSql AND $JobDateSql""".stripMargin,

    "p3_select_except" ->
      s"""WITH m AS ($M)
         |SELECT id, "date", l_orderkey, l_partkey, l_quantity,
         |       l_extendedprice, l_returnflag, l_linestatus FROM m""".stripMargin,

    "s6_stats_prune" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_e2,
        |  count(*) AS n_rows
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 5000
        |GROUP BY l_returnflag""".stripMargin,

    "s7_changes_export" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "s9_time_travel" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN DATE '2024-01-01'
        |            ELSE DATE '2024-01-02' END AS date,
        |  count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders GROUP BY 1""".stripMargin,

    "s10_snapshot_diff" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'delete'
        |            ELSE 'insert' END AS _change_type,
        |  count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM orders GROUP BY 1""".stripMargin,

    // fork = day-1 snapshot (even keys) minus the fork-side delete
    // (%3); src_rows = the full staged table, untouched by the fork DML
    "s22_shallow_clone" ->
      """SELECT count(*) AS fork_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS fork_sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS fork_sum_price_e2,
        |  (SELECT count(*) FROM orders) AS src_rows
        |FROM orders
        |WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0""".stripMargin,

    // the staged table's live set is day 2 only (odd keys)
    "s21_fast_minmax" ->
      """SELECT count(*) AS n_rows, count(o_orderkey) AS n_keys,
        |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE o_orderkey % 2 <> 0""".stripMargin,

    // post-restore the table holds BOTH days again — same shape as s9's
    // oracle but over the current read, proving the delete was undone
    "s20_restore" ->
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN DATE '2024-01-01'
        |            ELSE DATE '2024-01-02' END AS date,
        |  count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders GROUP BY 1""".stripMargin,

    "s15_delete_where" ->
      """SELECT o_orderstatus AS o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        |GROUP BY o_orderstatus""".stripMargin,

    "s19_rename_evolve" ->
      """SELECT o_orderstatus AS o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "s18_incr_agg" ->
      """WITH f AS (
        |  SELECT CASE WHEN o_orderstatus = 'O' AND o_orderkey % 7 = 2
        |              THEN 'U' ELSE o_orderstatus END AS o_status,
        |         o_orderkey,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS p_e2
        |  FROM orders
        |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        |)
        |SELECT o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(p_e2) AS BIGINT) AS sum_price_e2
        |FROM f GROUP BY o_status""".stripMargin,

    "s17_compact" ->
      """SELECT o_orderstatus AS o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "s16_update_where" ->
      """WITH f AS (
        |  SELECT CASE WHEN o_orderstatus = 'O' AND o_orderkey % 7 = 2
        |              THEN 'U' ELSE o_orderstatus END AS o_status,
        |         o_orderkey,
        |         CASE WHEN o_orderstatus = 'O' AND o_orderkey % 7 = 2
        |              THEN o_totalprice + 5.0
        |              ELSE o_totalprice END AS p
        |  FROM orders
        |)
        |SELECT o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(p * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM f GROUP BY o_status""".stripMargin,

    "s11_merge_upsert" ->
      """WITH f AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'I'
        |              WHEN o_orderkey % 10 = 0 THEN 'M'
        |              ELSE o_orderstatus END AS o_status,
        |         o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0 OR o_orderkey % 10 = 0
        |              THEN o_totalprice + 1.0 ELSE o_totalprice END AS p
        |  FROM orders
        |  WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 <> 0
        |)
        |SELECT o_status, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(p * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM f GROUP BY o_status""".stripMargin,

    "s13_row_diff" ->
      """SELECT _change_type, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 7 = 0 THEN 'insert'
        |             WHEN o_orderkey % 13 = 0 THEN 'delete'
        |             WHEN o_orderkey % 10 = 0 THEN 'update' END AS _change_type
        |      FROM orders)
        |WHERE _change_type IS NOT NULL
        |GROUP BY _change_type""".stripMargin,

    "s23_partition_evolve" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    DATE '2024-01-01' + CAST(o_orderkey % 59 AS INT) AS date
        |  FROM orders)
        |SELECT date, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM o
        |WHERE date BETWEEN DATE '2024-01-30' AND DATE '2024-02-03'
        |GROUP BY date""".stripMargin,

    "s24_delete_vectors" ->
      """WITH base AS (SELECT o_orderstatus AS o_status,
        |    count(*) AS n_rows,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_price_e2
        |  FROM orders
        |  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
        |  GROUP BY o_orderstatus)
        |SELECT o_status, n_rows, sum_key, sum_price_e2, 'mor' AS stage
        |FROM base
        |UNION ALL
        |SELECT o_status, n_rows, sum_key, sum_price_e2, 'folded' AS stage
        |FROM base""".stripMargin,

    "s25_bucket_join" ->
      """SELECT o_orderstatus AS o_status, count(*) AS n_lines,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_e2,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,

    "s14_time_prune" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
        |  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderstatus""".stripMargin,

    "s12_bloom_point" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS price_e2
        |FROM orders WHERE o_orderkey IN (11, 22, 33, 44, 55)""".stripMargin,

    "s8_zorder_prune" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_e2,
        |  count(*) AS n_rows,
        |  CAST(sum(l_partkey) AS BIGINT) AS sum_part
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 3000
        |  AND l_partkey BETWEEN 100 AND 400
        |GROUP BY l_returnflag""".stripMargin,

    "s5_partition_stats" ->
      s"""WITH m AS ($D)
         |SELECT "date", count(*) AS n_rows, count(DISTINCT id) AS n_ids,
         |       CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
         |         AS sum_qty_e2
         |FROM m GROUP BY "date"""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_e2,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_base_price_e2,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS sum_disc_price_e2,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,

    "q23_rollup_revenue" ->
      """WITH f AS (SELECT n_name,
        |    CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(month(o_orderdate) AS INT) AS o_month,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) AS rev
        |  FROM nation
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey)
        |SELECT n_name, o_year, o_month,
        |  CAST(sum(rev) AS BIGINT) AS revenue_e2,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(o_year) AS INT) AS g_year,
        |  CAST(GROUPING(o_month) AS INT) AS g_month
        |FROM f GROUP BY ROLLUP(n_name, o_year, o_month)""".stripMargin,

    "q24_cube_revenue" ->
      """WITH f AS (SELECT n_name,
        |    CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(month(o_orderdate) AS INT) AS o_month,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) AS rev
        |  FROM nation
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey)
        |SELECT n_name, o_year, o_month,
        |  CAST(sum(rev) AS BIGINT) AS revenue_e2,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(o_year) AS INT) AS g_year,
        |  CAST(GROUPING(o_month) AS INT) AS g_month
        |FROM f GROUP BY CUBE(n_name, o_year, o_month)""".stripMargin,

    "q25_grouping_sets" ->
      """WITH f AS (SELECT n_name,
        |    CAST(year(o_orderdate) AS INT) AS o_year,
        |    CAST(month(o_orderdate) AS INT) AS o_month,
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) AS rev
        |  FROM nation
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey)
        |SELECT n_name, o_year, o_month,
        |  CAST(sum(rev) AS BIGINT) AS revenue_e2,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(o_year) AS INT) AS g_year,
        |  CAST(GROUPING(o_month) AS INT) AS g_month
        |FROM f GROUP BY GROUPING SETS ((n_name, o_year), (n_name),
        |  (o_month), ())""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 180)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS total_e2, sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_nationkey
        |ORDER BY revenue_e2 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND n1.n_name IN ('NATION_3', 'NATION_7')
        |  AND n2.n_name IN ('NATION_3', 'NATION_7')
        |  AND n1.n_name <> n2.n_name
        |GROUP BY 1, 2, 3""".stripMargin,

    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)) AS BIGINT) AS total_e2
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_e2
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_e2 = (SELECT max(total_e2) FROM rev)""".stripMargin,

    "q17_small_quantity" ->
      """WITH branded AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#23'),
        |pp AS (SELECT l_partkey AS pk,
        |    CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_q_e2,
        |    count(*) AS cnt
        |  FROM branded GROUP BY l_partkey)
        |SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_e2,
        |  count(*) AS n_rows
        |FROM branded JOIN pp ON l_partkey = pk
        |WHERE 5 * cnt * CAST(floor(l_quantity * 100) AS BIGINT) < sum_q_e2""".stripMargin,

    "q22_idle_customers" ->
      """WITH pos AS (SELECT * FROM customer WHERE c_acctbal > 0.0),
        |st AS (SELECT
        |    CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_e2,
        |    count(*) AS cnt FROM pos)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS totacctbal_e2
        |FROM pos, st
        |WHERE cnt * CAST(floor(c_acctbal * 100) AS BIGINT) > sum_e2
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_nationkey""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_e2,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_e2
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-03-01 00:00:00'""".stripMargin,

    "q19_brand_revenue" ->
      """SELECT
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2,
        |  count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_e2
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < DATE '1995-03-15'
        |  AND l_shipdate > DATE '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |pts AS (SELECT p_partkey, p_brand FROM part
        |  WHERE p_size = 15 AND p_type = 'SMALL'),
        |off AS (
        |  SELECT p_partkey, p_brand, s_name, n_name,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS price_e2
        |  FROM lineitem JOIN pts ON l_partkey = p_partkey
        |  JOIN eur ON l_suppkey = s_suppkey),
        |mn AS (SELECT p_partkey AS mp, min(price_e2) AS min_e2
        |  FROM off GROUP BY 1)
        |SELECT DISTINCT p_partkey, p_brand, s_name, n_name, price_e2
        |FROM off JOIN mn ON p_partkey = mp AND price_e2 = min_e2""".stripMargin,

    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_7'
        |    THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT) ELSE 0 END) AS BIGINT) AS nation_e2,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS total_e2
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT s_suppkey, n_name AS supp_nation
        |      FROM supplier JOIN nation ON s_nationkey = n_nationkey) sn
        |  ON l_suppkey = sn.s_suppkey
        |WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(sum(
        |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |    - CAST(floor(p_retailprice * 100) AS BIGINT)
        |      * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS profit_e2
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      """WITH scoped AS (
        |  SELECT l_partkey,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS v_e2
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'),
        |pp AS (SELECT l_partkey, CAST(sum(v_e2) AS BIGINT) AS value_e2
        |  FROM scoped GROUP BY 1)
        |SELECT l_partkey, value_e2 FROM pp
        |WHERE value_e2 * 2000 >
        |  (SELECT CAST(sum(v_e2) AS BIGINT) FROM scoped)""".stripMargin,

    "q12_late_shipments" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH y96 AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(floor(l_quantity * 100) AS BIGINT) AS q_e2
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
        |sp AS (SELECT l_partkey, l_suppkey, CAST(sum(q_e2) AS BIGINT) AS sp_e2
        |  FROM y96 GROUP BY 1, 2),
        |tp AS (SELECT l_partkey, CAST(sum(q_e2) AS BIGINT) AS total_e2
        |  FROM y96 GROUP BY 1)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND s_suppkey IN (SELECT sp.l_suppkey FROM sp
        |    JOIN tp ON sp.l_partkey = tp.l_partkey
        |    WHERE sp_e2 * 2 > total_e2)""".stripMargin,

    "q21_waiting_suppliers" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM lo l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1' AND l1.late
        |  AND EXISTS (SELECT 1 FROM lo l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY 1""".stripMargin,

    "ev_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
        |    AS sum_value_e4
        |FROM events GROUP BY 1""".stripMargin,

    "ev_props_extract" ->
      """WITH e AS (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |           FROM events)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type""".stripMargin,

    "ds_export_splits" -> {
      val h = md5LongSql("concat('split#', CAST(doc_id AS VARCHAR))")
      s"""SELECT doc_id, lang,
         |  CASE WHEN ($h % 10000) < 9000 THEN 'train'
         |       WHEN ($h % 10000) < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    "ev_sliding_agg" ->
      """WITH w AS (SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |             - k.k * INTERVAL '15 minutes' AS window_start,
        |           user_id, value
        |           FROM events, unnest([0, 1, 2, 3]) AS k(k))
        |SELECT window_start, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
        |    AS sum_value_e4
        |FROM w GROUP BY window_start""".stripMargin,

    "tx_quality_rank" ->
      s"""WITH q AS (SELECT doc_id,
         |  CAST(floor(len(list_distinct($W)) * 10000.0 / len($W))
         |    + (CASE WHEN floor(len(list_filter($W, x -> list_contains(
         |        $AllMarkersSql, x))) * 10000.0 / len($W)) > 0
         |       THEN 500 ELSE 0 END)
         |    - (CASE WHEN floor((length(text) - len($W) + 1) * 100.0 / len($W)) > 1200
         |       THEN 1000 ELSE 0 END) AS BIGINT) AS quality_e4
         |  FROM documents),
         |r AS (SELECT doc_id, quality_e4,
         |        rank() OVER (ORDER BY quality_e4) AS rk,
         |        count(*) OVER () AS n FROM q)
         |SELECT doc_id, quality_e4,
         |  CAST(floor(10000.0 * (rk - 1) / n) AS BIGINT) AS pct_e4
         |FROM r""".stripMargin,

    "tx_token_count" ->
      s"""SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens, n_chars
         |FROM documents""".stripMargin,

    "tx_language_id" -> {
      val scoreCols = TextAnalysis.langOrder
        .map(l => s"${langScoreSql(l)} AS score_${l}_e4").mkString(",\n  ")
      val best = TextAnalysis.langOrder.map(l => s"score_${l}_e4")
        .reduce((a, b) => s"greatest($a, $b)")
      val cases = TextAnalysis.langOrder
        .map(l => s"WHEN score_${l}_e4 = $best THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang AS lang_label, $scoreCols FROM documents)
         |SELECT *, CASE WHEN $best <= 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
         |FROM s""".stripMargin
    },

    "tx_quality" ->
      s"""SELECT doc_id,
         |  CAST(len($W) AS BIGINT) AS n_tokens,
         |  CAST(floor((length(text) - len($W) + 1) * 100.0 / len($W)) AS BIGINT)
         |    AS mean_tok_len_e2,
         |  CAST(floor(len(list_distinct($W)) * 10000.0 / len($W)) AS BIGINT)
         |    AS distinct_ratio_e4,
         |  CAST(floor(len(list_filter($W, x -> list_contains(
         |      $AllMarkersSql,
         |      x))) * 10000.0 / len($W)) AS BIGINT) AS stopword_ratio_e4,
         |  CAST(floor(len(list_distinct($W)) * 10000.0 / len($W))
         |    + (CASE WHEN floor(len(list_filter($W, x -> list_contains(
         |        $AllMarkersSql,
         |        x))) * 10000.0 / len($W)) > 0 THEN 500 ELSE 0 END)
         |    - (CASE WHEN floor((length(text) - len($W) + 1) * 100.0 / len($W)) > 1200
         |        THEN 1000 ELSE 0 END) AS BIGINT) AS quality_e4
         |FROM documents""".stripMargin,

    // Gopher rule-set filter: every rule re-derived in DuckDB from the
    // same splits/regexes, flags on an exact 0/1 integer grid
    "tx_gopher_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $W AS w,
         |             string_split(text, chr(10)) AS l FROM documents),
         |f AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(floor(list_sum(list_transform(w, x -> len(x))) * 100.0
         |    / len(w)) AS BIGINT) AS mean_word_len_e2,
         |  CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
         |    + CAST((len(text) - len(replace(text, '...', ''))) // 3 AS BIGINT)
         |    AS symbols,
         |  CAST(len(list_filter(l, x -> regexp_matches(x, '^[-*•]')))
         |    AS BIGINT) AS bullet_lines,
         |  CAST(len(list_filter(l, x -> regexp_matches(x, '\\.\\.\\.$$')))
         |    AS BIGINT) AS ellipsis_lines,
         |  CAST(len(l) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
         |    AS BIGINT) AS alpha_words,
         |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
         |    s -> list_contains(w, s))) AS BIGINT) AS stop_hits
         | FROM t),
         |r AS (SELECT doc_id, n_tokens, mean_word_len_e2,
         |  CASE WHEN n_tokens >= 50 AND n_tokens <= 100000 THEN 1 ELSE 0 END
         |    AS r_word_count,
         |  CASE WHEN mean_word_len_e2 >= 300 AND mean_word_len_e2 <= 1000
         |    THEN 1 ELSE 0 END AS r_mean_word_len,
         |  CASE WHEN symbols * 10 <= n_tokens THEN 1 ELSE 0 END AS r_symbol_ratio,
         |  CASE WHEN bullet_lines * 10 <= n_lines * 9 THEN 1 ELSE 0 END
         |    AS r_bullet_lines,
         |  CASE WHEN ellipsis_lines * 10 <= n_lines * 3 THEN 1 ELSE 0 END
         |    AS r_ellipsis_lines,
         |  CASE WHEN alpha_words * 5 >= n_tokens * 4 THEN 1 ELSE 0 END
         |    AS r_alpha_words,
         |  CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r_stopwords
         | FROM f)
         |SELECT doc_id, n_tokens, mean_word_len_e2,
         |  CAST(r_word_count AS BIGINT) AS r_word_count,
         |  CAST(r_mean_word_len AS BIGINT) AS r_mean_word_len,
         |  CAST(r_symbol_ratio AS BIGINT) AS r_symbol_ratio,
         |  CAST(r_bullet_lines AS BIGINT) AS r_bullet_lines,
         |  CAST(r_ellipsis_lines AS BIGINT) AS r_ellipsis_lines,
         |  CAST(r_alpha_words AS BIGINT) AS r_alpha_words,
         |  CAST(r_stopwords AS BIGINT) AS r_stopwords,
         |  CAST(r_word_count * r_mean_word_len * r_symbol_ratio *
         |       r_bullet_lines * r_ellipsis_lines * r_alpha_words *
         |       r_stopwords AS BIGINT) AS keep
         |FROM r""".stripMargin,

    "tx_fingerprint" ->
      "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents",

    "tx_repetition" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |c AS (SELECT doc_id,
         |  CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE len(w) END AS t2,
         |  CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE len(w) END AS t3,
         |  len(CASE WHEN len(w) >= 2
         |      THEN list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
         |      ELSE list_distinct(w) END) AS d2,
         |  len($ShingleSql) AS d3
         |  FROM t)
         |SELECT doc_id,
         |  CAST(floor((t2 - d2) * 10000.0 / t2) AS BIGINT) AS rep2_e4,
         |  CAST(floor((t3 - d3) * 10000.0 / t3) AS BIGINT) AS rep3_e4
         |FROM c""".stripMargin,

    "dd_exact" ->
      """WITH r AS (SELECT *, min(doc_id) OVER (
        |    PARTITION BY md5(lower(trim(text)))) AS keep_id FROM documents)
        |SELECT doc_id, lang, source, n_chars FROM r WHERE doc_id = keep_id""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""WITH ${jaccardPairCtes("documents")}
         |SELECT * FROM p WHERE jaccard_e4 >= 5000""".stripMargin,

    "dd_containment" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |sz AS (SELECT doc_id, len(sh) AS sz FROM s),
         |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |  CAST(floor(inter * 10000.0 / least(za.sz, zb.sz)) AS BIGINT)
         |    AS contain_e4
         |FROM p JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
         |WHERE floor(inter * 10000.0 / least(za.sz, zb.sz)) >= 6000""".stripMargin,

    "dd_dup_rate_by_source" ->
      s"""WITH ${jaccardPairCtes("documents")},
         |pr AS (SELECT * FROM p WHERE jaccard_e4 >= 5000),
         |ids AS (SELECT DISTINCT doc_id FROM (
         |  SELECT id_a AS doc_id FROM pr UNION ALL SELECT id_b FROM pr)),
         |d AS (SELECT d.source,
         |        CASE WHEN ids.doc_id IS NULL THEN 0 ELSE 1 END AS dup
         |      FROM documents d LEFT JOIN ids ON ids.doc_id = d.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(dup) AS BIGINT) AS n_dup_docs,
         |  CAST(floor(sum(dup) * 10000.0 / count(*)) AS BIGINT) AS dup_rate_e4
         |FROM d GROUP BY source""".stripMargin,

    "tx_lang_confusion" -> {
      val best = TextAnalysis.langOrder.map(l => s"score_${l}_e4")
        .reduce((a, b) => s"greatest($a, $b)")
      val scoreCols = TextAnalysis.langOrder
        .map(l => s"${langScoreSql(l)} AS score_${l}_e4").mkString(",\n  ")
      val cases = TextAnalysis.langOrder
        .map(l => s"WHEN score_${l}_e4 = $best THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT lang AS lang_label, $scoreCols FROM documents),
         |pred AS (SELECT lang_label,
         |  CASE WHEN $best <= 0 THEN 'und' $cases ELSE 'und' END AS lang_pred
         |  FROM s)
         |SELECT lang_label, lang_pred, count(*) AS n_docs
         |FROM pred GROUP BY lang_label, lang_pred""".stripMargin
    },

    // train/eval shingle overlap; the Spark side joins on xxhash64 of the
    // shingle rather than the string (identical counts modulo a ~2^-64
    // collision, same trade the jaccard tier documents)
    "dd_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |ev AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 100 = 0),
         |tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 100 <> 0)
         |SELECT tr.doc_id, count(*) AS n_hits
         |FROM tr JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id""".stripMargin,

    // connected components of the jaccard pair graph: min reachable id
    // per node via a recursive CTE (the Spark side iterates min-label
    // propagation to the same fixpoint)
    "dd_cluster_minlabel" -> minReachableLabelSql,

    "dd_kcoreness" -> kCorenessSql(6),

    // identical contract computed by star contraction on the Spark side:
    // same recursive-CTE oracle — labels are a property of the GRAPH,
    // not the algorithm
    "dd_cluster_cc" -> minReachableLabelSql,

    // tier report: the four tiers' oracle chains composed, each reduced
    // to its drop set and joined to the doc lengths
    "dd_tier_report" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosPair = cosE6Sql("a.v", "b.v")
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5LongSql("x")}) AS hl
         |      FROM s),
         |sg AS (SELECT doc_id,
         |        [list_min(list_transform(hl, x -> CAST(concat('0x',
         |           substr(md5(concat(CAST(i // 2 AS VARCHAR), '#',
         |                             CAST(x AS VARCHAR))),
         |                  1 + 15 * (i % 2), 15)) AS BIGINT)))
         |         for i in range(0, 16)] AS sig
         |       FROM h),
         |b AS (SELECT doc_id, u.b AS band,
         |        array_to_string(sig[u.b * 4 + 1 : u.b * 4 + 4], ',') AS bucket
         |      FROM sg, unnest([0, 1, 2, 3]) AS u(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |         FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket
         |           AND a.doc_id < b2.doc_id),
         |j AS (SELECT c.id_a, c.id_b,
         |        CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 /
         |          (len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl))))
         |          AS BIGINT) AS jaccard_e4
         |      FROM cand c JOIN h ha ON ha.doc_id = c.id_a
         |                  JOIN h hb ON hb.doc_id = c.id_b),
         |mh_drops AS (SELECT DISTINCT id_b AS doc_id FROM j
         |             WHERE jaccard_e4 >= 5000),
         |sz AS (SELECT doc_id, len(sh) AS sz FROM s),
         |ee AS (SELECT doc_id, unnest(sh) AS g FROM s),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |      FROM ee a JOIN ee b ON a.g = b.g AND a.doc_id < b.doc_id
         |      GROUP BY 1, 2),
         |ct_drops AS (SELECT DISTINCT id_b AS doc_id
         |  FROM p JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
         |  WHERE floor(inter * 10000.0 / least(za.sz, zb.sz)) >= 6000),
         |ex_drops AS (SELECT d.doc_id FROM documents d WHERE EXISTS (
         |  SELECT 1 FROM documents d2 WHERE d2.text = d.text
         |    AND d2.doc_id < d.doc_id)),
         |c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |      WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |sem_drops AS (SELECT DISTINCT b.vec_id AS doc_id FROM assign a
         |  JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         |  WHERE $cosPair >= 350000),
         |dd AS (SELECT doc_id, n_chars FROM documents)
         |SELECT 'exact' AS tier, count(*) AS n_docs,
         |  COALESCE(CAST(sum(n_chars) AS BIGINT), 0) AS chars_dropped
         |FROM dd JOIN ex_drops USING (doc_id)
         |UNION ALL
         |SELECT 'minhash', count(*),
         |  COALESCE(CAST(sum(n_chars) AS BIGINT), 0)
         |FROM dd JOIN mh_drops USING (doc_id)
         |UNION ALL
         |SELECT 'containment', count(*),
         |  COALESCE(CAST(sum(n_chars) AS BIGINT), 0)
         |FROM dd JOIN ct_drops USING (doc_id)
         |UNION ALL
         |SELECT 'semantic', count(*),
         |  COALESCE(CAST(sum(n_chars) AS BIGINT), 0)
         |FROM dd JOIN sem_drops USING (doc_id)""".stripMargin
    },

    "dd_cluster_best" ->
      s"""WITH RECURSIVE ${jaccardPairCtes("documents")},
         |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
         |e AS (SELECT id_a AS a, id_b AS b FROM pr
         |      UNION SELECT id_b AS a, id_a AS b FROM pr),
         |reach(n, m) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT r.n, e2.b FROM reach r JOIN e e2 ON e2.a = r.m),
         |lab AS (SELECT n AS id, CAST(min(m) AS BIGINT) AS label
         |        FROM reach GROUP BY n),
         |j AS (SELECT lab.label, lab.id, d.n_chars FROM lab
         |      JOIN documents d ON d.doc_id = lab.id),
         |r AS (SELECT label, id, n_chars,
         |        row_number() OVER (PARTITION BY label
         |          ORDER BY n_chars DESC, id) AS rn,
         |        count(*) OVER (PARTITION BY label) AS cluster_size FROM j)
         |SELECT label, id AS keep_id, n_chars,
         |       CAST(cluster_size AS BIGINT) AS cluster_size
         |FROM r WHERE rn = 1""".stripMargin,

    "ev_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e),
        |n AS (SELECT user_id, ts,
        |        CASE WHEN prev IS NULL
        |               OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |             THEN 1 ELSE 0 END AS is_new FROM g),
        |s AS (SELECT user_id, ts,
        |        CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM n)
        |SELECT user_id, session_idx, min(ts) AS session_start,
        |       max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "emb_norm_hist" ->
      """SELECT CAST(floor(sqrt(list_reduce(
        |    [CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |     for i in range(1, len(embedding)+1)], (x, y) -> x + y)) * 10)
        |  AS BIGINT) AS norm_e1, count(*) AS n_vectors
        |FROM embeddings GROUP BY 1""".stripMargin,

    "ev_gap_hist" ->
      """WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events)
        |SELECT CAST(floor(log2(CAST(
        |    CAST(floor(epoch(ts)) AS BIGINT) -
        |    CAST(floor(epoch(prev)) AS BIGINT) AS DOUBLE) + 1.0))
        |  AS BIGINT) AS gap_bucket, count(*) AS n_gaps
        |FROM o WHERE prev IS NOT NULL GROUP BY 1""".stripMargin,

    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        |            FROM events),
        |dau AS (SELECT day, count(DISTINCT u) AS dau FROM ud GROUP BY day),
        |cov AS (SELECT DISTINCT u, day + CAST(i AS INT) AS day
        |        FROM ud, range(0, 7) r(i)),
        |wau AS (SELECT day, count(*) AS wau FROM cov GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau FROM dau JOIN wau USING (day)""".stripMargin,

    "ev_anomaly_days" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY event_type, day),
        |s AS (SELECT event_type, count(*) AS nd,
        |    CAST(sum(n_events) AS BIGINT) AS s1,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS s2
        |  FROM d GROUP BY event_type)
        |SELECT event_type, day, n_events, z_e3 FROM (
        |  SELECT d.event_type, d.day, d.n_events,
        |    CAST(floor(1000e0 * abs(s.nd * d.n_events - s.s1) /
        |      sqrt(CAST(s.nd * s.s2 - s.s1 * s.s1 AS DOUBLE))) AS BIGINT) AS z_e3
        |  FROM d JOIN s USING (event_type)
        |  WHERE s.nd * s.s2 - s.s1 * s.s1 > 0)
        |WHERE z_e3 >= 1500""".stripMargin,

    "ev_transitions" ->
      """WITH o AS (SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events)
        |SELECT src, dst, count(*) AS n_transitions,
        |       count(DISTINCT user_id) AS n_users
        |FROM o WHERE dst IS NOT NULL GROUP BY src, dst""".stripMargin,

    "ev_top_paths" ->
      """WITH o AS (SELECT user_id AS u, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS e3
        |  FROM events)
        |SELECT e1, e2, e3, count(*) AS n_paths,
        |       count(DISTINCT u) AS n_users
        |FROM o WHERE e3 IS NOT NULL GROUP BY e1, e2, e3
        |ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20""".stripMargin,

    "ev_retention_cohorts" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_date FROM d GROUP BY user_id)
        |SELECT c.cohort_date,
        |  CAST(floor(date_diff('day', c.cohort_date, d.d) / 7) AS BIGINT)
        |    AS period_offset,
        |  count(DISTINCT d.user_id) AS n_users
        |FROM d JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events),
        |s0 AS (SELECT user_id, min(ts) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s0 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id)
        |SELECT 0 AS step_idx, 'view' AS step, count(*) AS n_users FROM s0
        |UNION ALL SELECT 1, 'click', count(*) FROM s1
        |UNION ALL SELECT 2, 'purchase', count(*) FROM s2""".stripMargin,

    "tx_freq_spectrum" ->
      s"""WITH t AS (SELECT unnest($W) AS token FROM documents),
         |c AS (SELECT token, count(*) AS freq FROM t GROUP BY token)
         |SELECT freq, count(*) AS n_tokens FROM c GROUP BY freq""".stripMargin,

    "tx_vocab_topk" ->
      s"""WITH t AS (SELECT unnest($W) AS token FROM documents),
         |c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
         |SELECT token, n, rank FROM (
         |  SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token ASC)
         |    AS INT) AS rank FROM c) r
         |WHERE rank <= 50""".stripMargin,

    // token entropy: the oracle computes the same floor-quantized
    // per-run terms RELATIONALLY ((doc, token) counts) — integer terms
    // make the in-row and relational summation orders agree exactly
    "tx_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($W) AS tok FROM documents),
         |tt AS (SELECT doc_id, tok FROM t WHERE length(tok) > 0),
         |c AS (SELECT doc_id, tok, count(*) AS c FROM tt GROUP BY doc_id, tok),
         |l AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |        count(*) AS nd FROM c GROUP BY doc_id),
         |e AS (SELECT c.doc_id,
         |    CAST(sum(CAST(floor(1e6 * (CAST(c.c AS DOUBLE) / l.n_tokens) *
         |      ln(CAST(l.n_tokens AS DOUBLE) / c.c)) AS BIGINT)) AS BIGINT)
         |      AS entropy_e6
         |  FROM c JOIN l USING (doc_id) GROUP BY c.doc_id)
         |SELECT d.doc_id, COALESCE(l.n_tokens, 0) AS n_tokens,
         |  COALESCE(l.nd, 0) AS n_distinct,
         |  COALESCE(e.entropy_e6, 0) AS entropy_e6
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN l USING (doc_id)
         |LEFT JOIN e ON e.doc_id = d.doc_id""".stripMargin,

    "tx_novelty" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |u AS (SELECT doc_id, ${md5LongSql("x")} AS h
         |      FROM (SELECT doc_id, unnest(sh) AS x FROM s)),
         |dfq AS (SELECT h, count(*) AS df FROM u GROUP BY h),
         |per AS (SELECT doc_id, count(*) AS n_shingles,
         |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM u JOIN dfq USING (h) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  COALESCE(per.n_shingles, 0) AS n_shingles,
         |  COALESCE(per.n_novel, 0) AS n_novel,
         |  COALESCE(CAST(floor(10000e0 * per.n_novel /
         |    CAST(per.n_shingles AS DOUBLE)) AS BIGINT), 0) AS novelty_e4
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN per USING (doc_id)""".stripMargin,

    "tx_source_drift" -> {
      val p = "(CAST(c_st AS DOUBLE) / n_s)"
      val q = "(CAST(c_t AS DOUBLE) / n_tot)"
      s"""WITH t AS (SELECT source, unnest($W) AS token FROM documents),
         |tt AS (SELECT source, token FROM t WHERE length(token) > 0),
         |cst AS (SELECT source, token, count(*) AS c_st FROM tt
         |        GROUP BY source, token),
         |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM cst
         |       GROUP BY source),
         |ct AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM cst
         |       GROUP BY token),
         |tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS n_tot FROM cst),
         |terms AS (SELECT cst.source,
         |    CAST(floor(1e9 * $p * ln($p / $q)) AS BIGINT) AS term_e9
         |  FROM cst JOIN ns USING (source) JOIN ct USING (token)
         |  CROSS JOIN tot)
         |SELECT source, count(*) AS n_terms,
         |       CAST(sum(term_e9) AS BIGINT) AS kl_e9
         |FROM terms GROUP BY source""".stripMargin
    },

    // frequent_items runs in its exact regime here (capacity ≥ corpus
    // vocabulary): cnt_lo = cnt_hi = the true count, so the oracle is
    // the plain frequency filter
    "tx_frequent_tokens" ->
      s"""WITH t AS (SELECT unnest($W) AS token FROM documents),
         |c AS (SELECT token, count(*) AS cnt FROM t
         |      WHERE length(token) > 0 GROUP BY token)
         |SELECT token, cnt AS cnt_lo, cnt AS cnt_hi FROM c
         |WHERE cnt >= 50""".stripMargin,

    "tx_ngram_lm" ->
      s"""WITH w AS (SELECT doc_id, $W AS t FROM documents),
         |g AS (SELECT doc_id,
         |        t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1] AS ctx,
         |        t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1] || ' ' ||
         |          t[CAST(i AS INT)+2] AS tri
         |      FROM w, unnest(range(1, len(t) - 1)) AS r(i)),
         |c3 AS (SELECT tri, ctx, count(*) AS c3 FROM g GROUP BY tri, ctx),
         |c2 AS (SELECT ctx, sum(c3) AS c2 FROM c3 GROUP BY ctx),
         |v AS (SELECT count(DISTINCT u.w) AS vocab
         |      FROM (SELECT unnest(t) AS w FROM w) u WHERE length(u.w) > 0),
         |sc AS (SELECT g.doc_id,
         |        CAST(floor(10000.0 * ln((COALESCE(x.c3, 0) + 1) /
         |          (COALESCE(c2.c2, 0) + v.vocab))) AS BIGINT) AS lp_e4
         |      FROM g
         |      LEFT JOIN (SELECT tri, c3 FROM c3) x USING (tri)
         |      LEFT JOIN c2 USING (ctx), v),
         |agg AS (SELECT doc_id, count(*) AS n_ngrams,
         |        CAST(sum(lp_e4) AS BIGINT) AS lp_sum_e4
         |        FROM sc GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(agg.n_ngrams, 0) AS n_ngrams,
         |       COALESCE(agg.lp_sum_e4, 0) AS lp_sum_e4
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN agg USING (doc_id)""".stripMargin,

    // held-out LM eval: the tx_ngram_lm chain with the model CTEs
    // restricted to the hash-train split and scoring restricted to its
    // complement
    "tx_ngram_lm_eval" -> {
      val h = md5LongSql("concat('split#', CAST(doc_id AS VARCHAR))")
      s"""WITH w AS (SELECT doc_id, ($h % 10000) < 9000 AS is_train,
         |           $W AS t FROM documents),
         |g AS (SELECT doc_id, is_train,
         |        t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1] AS ctx,
         |        t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT)+1] || ' ' ||
         |          t[CAST(i AS INT)+2] AS tri
         |      FROM w, unnest(range(1, len(t) - 1)) AS r(i)),
         |c3 AS (SELECT tri, ctx, count(*) AS c3 FROM g WHERE is_train
         |       GROUP BY tri, ctx),
         |c2 AS (SELECT ctx, sum(c3) AS c2 FROM c3 GROUP BY ctx),
         |v AS (SELECT count(DISTINCT u.w) AS vocab
         |      FROM (SELECT unnest(t) AS w FROM w WHERE is_train) u
         |      WHERE length(u.w) > 0),
         |sc AS (SELECT g.doc_id,
         |        CAST(floor(10000.0 * ln((COALESCE(x.c3, 0) + 1) /
         |          (COALESCE(c2.c2, 0) + v.vocab))) AS BIGINT) AS lp_e4
         |      FROM g
         |      LEFT JOIN (SELECT tri, c3 FROM c3) x USING (tri)
         |      LEFT JOIN c2 USING (ctx), v
         |      WHERE NOT g.is_train),
         |agg AS (SELECT doc_id, count(*) AS n_ngrams,
         |        CAST(sum(lp_e4) AS BIGINT) AS lp_sum_e4
         |        FROM sc GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(agg.n_ngrams, 0) AS n_ngrams,
         |       COALESCE(agg.lp_sum_e4, 0) AS lp_sum_e4
         |FROM (SELECT DISTINCT doc_id FROM w WHERE NOT is_train) d
         |LEFT JOIN agg USING (doc_id)""".stripMargin
    },

    "tx_bm25_topk" -> bm25Sql(10),

    // the indexed variant must reproduce the inline ranking EXACTLY —
    // one oracle serves both
    "tx_bm25_indexed" -> bm25Sql(10),

    // the incrementally-maintained index must equal a from-scratch
    // BM25 over the FINAL corpus: days 1+2 minus the MoR-deleted ids
    "tx_bm25_incremental" -> bm25Sql(10, corpus =
      "(SELECT * FROM documents WHERE doc_id < 500 AND doc_id % 7 <> 0)"),

    "tx_hybrid_rrf" -> hybridRrfSql(probeMax = 8L, kEach = 10, kOut = 10),

    "tx_bpe_encode" -> bpeEncodeSql,

    "tx_bpe_learn" -> bpeLearnSql(8),

    "tx_unigram_learn" ->
      unigramLearnSql(rounds = 2, maxLen = UnigramMaxLen, seedSize = 400,
        vocabSize = 80),

    "tx_unigram_encode" -> unigramEncodeSql,

    "tx_unigram_score" -> unigramScoreSql,

    "tx_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($W) AS word FROM documents),
         |wc AS (SELECT word, count(*) AS wfreq FROM w
         |       WHERE length(word) >= 2 GROUP BY word),
         |p AS (SELECT substr(word, CAST(i AS INT), 1) AS lhs,
         |             substr(word, CAST(i AS INT) + 1, 1) AS rhs, wfreq
         |      FROM wc, unnest(range(1, length(word))) AS t(i)),
         |c AS (SELECT lhs, rhs, CAST(sum(wfreq) AS BIGINT) AS freq
         |      FROM p GROUP BY lhs, rhs)
         |SELECT lhs, rhs, freq,
         |       CAST(row_number() OVER (ORDER BY freq DESC, lhs, rhs) AS INT)
         |         AS rank
         |FROM c QUALIFY rank <= 50""".stripMargin,

    "dd_dual_signal" -> {
      val cos = cosE6Sql("ea.embedding", "eb.embedding")
      s"""WITH ${jaccardPairCtes("documents")},
         |pr AS (SELECT * FROM p WHERE jaccard_e4 >= 5000)
         |SELECT pr.id_a, pr.id_b, pr.jaccard_e4, $cos AS cos_e6
         |FROM pr JOIN embeddings ea ON ea.vec_id = pr.id_a
         |        JOIN embeddings eb ON eb.vec_id = pr.id_b""".stripMargin
    },

    "emb_kmeans_iter" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1)
         |SELECT cent_id, CAST(i - 1 AS INT) AS dim,
         |  CAST(sum(CAST(floor(CAST(v[i] AS DOUBLE) * 1000000.0)
         |    AS BIGINT)) AS BIGINT) AS sum_e6,
         |  count(*) AS n
         |FROM assign, range(1, 65) r(i)
         |GROUP BY cent_id, dim""".stripMargin
    },

    "emb_rp_project" -> XxOracleSql.rpProject(outDim = 16, dim = 64),

    "emb_covariance" ->
      """WITH q AS (SELECT list_transform(embedding,
        |  x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |nn AS (SELECT count(*) AS n FROM q),
        |s AS (SELECT CAST(i AS INT) - 1 AS dim,
        |        CAST(sum(qv[CAST(i AS INT)]) AS BIGINT) AS s
        |      FROM q, unnest(range(1, 65)) r(i) GROUP BY dim),
        |g AS (SELECT CAST(i AS INT) - 1 AS di, CAST(j AS INT) - 1 AS dj,
        |        CAST(sum(qv[CAST(i AS INT)] * qv[CAST(j AS INT)]) AS BIGINT) AS g
        |      FROM q, unnest(range(1, 65)) r(i), unnest(range(1, 65)) r2(j)
        |      WHERE j >= i GROUP BY di, dj)
        |SELECT g.di AS i, g.dj AS j,
        |       CAST(nn.n * g.g - si.s * sj.s AS BIGINT) AS cc
        |FROM g
        |JOIN s si ON si.dim = g.di
        |JOIN s sj ON sj.dim = g.dj
        |CROSS JOIN nn""".stripMargin,

    "emb_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS dim,
        |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
        |    AS BIGINT)) AS BIGINT) AS sum_e6,
        |  count(*) AS n
        |FROM embeddings e, range(1, 65) r(i)
        |GROUP BY label, dim""".stripMargin,

    // centroid-distance outliers: the same e6 quantize-first centroid
    // statistic, then per-dim floor((w − s/n)²) terms summed as exact
    // integers — every float op is a single correctly-rounded IEEE step,
    // so dist2_e12 matches the Spark expression value-for-value
    "emb_outlier_topk" ->
      """WITH w AS (SELECT vec_id, label, CAST(i AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000e0) AS BIGINT) AS wi
        |  FROM embeddings, range(1, 65) r(i)),
        |s AS (SELECT label, dim, CAST(sum(wi) AS BIGINT) AS s, count(*) AS n
        |      FROM w GROUP BY label, dim),
        |dev AS (SELECT w.vec_id, w.label,
        |    CAST(floor((w.wi - CAST(s.s AS DOUBLE) / s.n) *
        |               (w.wi - CAST(s.s AS DOUBLE) / s.n)) AS BIGINT) AS t
        |  FROM w JOIN s ON w.label = s.label AND w.dim = s.dim),
        |d2 AS (SELECT vec_id, label, CAST(sum(t) AS BIGINT) AS dist2_e12
        |       FROM dev GROUP BY vec_id, label)
        |SELECT label, vec_id, dist2_e12,
        |  CAST(row_number() OVER (PARTITION BY label
        |    ORDER BY dist2_e12 DESC, vec_id) AS INT) AS rank
        |FROM d2 QUALIFY rank <= 5""".stripMargin,

    // xx-family tiers: DuckDB recomputes Spark's xxhash64 bit for bit
    // via the staged HUGEINT arithmetic in XxOracleSql (multi-statement
    // scripts: macro prelude + temp-table stages + final SELECT)
    "dd_minhash_lsh" -> XxOracleSql.minhash(W, ShingleSql),

    "dd_minhash_calibration" ->
      XxOracleSql.minhashCalibration(W, ShingleSql),
    "dd_simhash" -> XxOracleSql.simhash(W, ShingleSql),
    "dd_embed_neardup_lsh" -> XxOracleSql.embedNearDup(cosE6Sql("a.v", "c.v")),

    "dd_simhash_md5" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5LongSql("x")}) AS hl
         |      FROM s),
         |f AS (SELECT doc_id, CAST(list_sum([
         |        CASE WHEN list_sum(list_transform(hl,
         |               x -> CASE WHEN ((x >> i) & 1) = 1 THEN 1 ELSE -1 END)) > 0
         |          THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END
         |        for i in range(0, 60)]) AS BIGINT) AS fp FROM h),
         |b AS (SELECT doc_id, fp, u.band, ((fp >> (u.band * 15)) & 32767) AS bucket
         |      FROM f, unnest([0, 1, 2, 3]) AS u(band)),
         |p AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
         |        CAST(bit_count(xor(a.fp, b2.fp)) AS INT) AS hamming
         |      FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket
         |        AND a.doc_id < b2.doc_id)
         |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 6""".stripMargin,

    "dd_minhash_lsh_md5" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |s AS (SELECT doc_id, $ShingleSql AS sh FROM t),
         |h AS (SELECT doc_id, list_transform(sh, x -> ${md5LongSql("x")}) AS hl
         |      FROM s),
         |sg AS (SELECT doc_id,
         |        [list_min(list_transform(hl, x -> CAST(concat('0x',
         |           substr(md5(concat(CAST(i // 2 AS VARCHAR), '#',
         |                             CAST(x AS VARCHAR))),
         |                  1 + 15 * (i % 2), 15)) AS BIGINT)))
         |         for i in range(0, 16)] AS sig
         |       FROM h),
         |b AS (SELECT doc_id, u.b AS band,
         |        array_to_string(sig[u.b * 4 + 1 : u.b * 4 + 4], ',') AS bucket
         |      FROM sg, unnest([0, 1, 2, 3]) AS u(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
         |         FROM b a JOIN b b2 ON a.band = b2.band AND a.bucket = b2.bucket
         |           AND a.doc_id < b2.doc_id),
         |j AS (SELECT c.id_a, c.id_b,
         |        CAST(floor(len(list_intersect(ha.hl, hb.hl)) * 10000.0 /
         |          (len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl))))
         |          AS BIGINT) AS jaccard_e4
         |      FROM cand c JOIN h ha ON ha.doc_id = c.id_a
         |                  JOIN h hb ON hb.doc_id = c.id_b)
         |SELECT id_a, id_b, jaccard_e4 FROM j WHERE jaccard_e4 >= 5000""".stripMargin,

    // incremental dedup: odd doc_ids are the new batch, even the seen
    // corpus; a new doc is dropped on an exact-fingerprint match or a
    // band-bucket collision whose md5-shingle Jaccard clears the bar
    "dd_incremental" -> ddIncrementalSql(c => s"$c % 2 = 0"),

    // the indexed variant makes the SAME decisions as dd_incremental (the
    // index stores exactly the signatures the inline path derives), so
    // its oracle is the same query
    "dd_incremental_indexed" -> ddIncrementalSql(c => s"$c % 2 = 0"),

    // maintained-index variant: the seen corpus evolved through an
    // append and a deletion-vector correction — final seen set is
    // even ids minus (id % 10 == 6)
    "dd_incremental_feed" ->
      ddIncrementalSql(c => s"$c % 2 = 0 AND $c % 10 <> 6"),

    // DuckDB quoted strings keep backslashes literal, so the shared
    // pattern embeds verbatim
    "tx_token_count_bpe" ->
      s"""SELECT doc_id, CAST(len(regexp_extract_all(text,
         |  '${TextAnalysis.BpeishPattern}')) AS BIGINT)
         |  AS n_subtokens FROM documents""".stripMargin,

    "dd_embed_cosine" -> {
      val cos = cosE6Sql("a.v", "b.v")
      s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings
         |           WHERE vec_id < 500)
         |SELECT a.id AS id_a, b.id AS id_b, $cos AS cos_e6
         |FROM e a JOIN e b ON a.id < b.id
         |WHERE $cos >= 350000""".stripMargin
    },

    // SQ8: DuckDB retrains the per-dim bounds and replays the affine
    // byte quantization; distances are pure integers from there on
    "sim_sq8_topk" ->
      s"""WITH d AS (SELECT CAST(e.embedding[t.i] AS DOUBLE) AS x, t.i
         |           FROM embeddings e, range(1, 65) t(i)),
         |st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM d GROUP BY i),
         |bounds AS (SELECT list(mn ORDER BY i) AS m,
         |             list(mx - mn ORDER BY i) AS s FROM st),
         |q8 AS (SELECT vec_id,
         |         [CASE WHEN b.s[i] <= 0 THEN 0
         |               ELSE least(255, greatest(0,
         |                 CAST(floor((CAST(embedding[i] AS DOUBLE) - b.m[i])
         |                   * 255.0 / b.s[i]) AS BIGINT))) END
         |          for i in range(1, len(embedding) + 1)] AS code
         |       FROM embeddings, bounds b),
         |sc AS (SELECT q.vec_id AS query_id, e.vec_id AS nbr_id,
         |         CAST(list_sum([(q.code[i] - e.code[i]) * (q.code[i] - e.code[i])
         |           for i in range(1, 65)]) AS BIGINT) AS sqdist_q8
         |       FROM q8 q JOIN q8 e ON e.vec_id <> q.vec_id
         |       WHERE q.vec_id < 10),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY sqdist_q8 ASC, nbr_id ASC) AS INT) AS rank
         |           FROM sc)
         |SELECT query_id, nbr_id, sqdist_q8, rank FROM ranked
         |WHERE rank <= 5""".stripMargin,

    "sim_cosine_topk" -> {
      val cos = cosE6Sql("q.qv", "e.embedding")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id < 10),
         |scored AS (SELECT q.qid AS query_id, e.vec_id AS nbr_id, $cos AS cos_e6
         |           FROM embeddings e JOIN q ON q.qid <> e.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_e6 DESC, nbr_id ASC) AS INT) AS rank FROM scored)
         |SELECT query_id, nbr_id, cos_e6, rank FROM ranked WHERE rank <= 5""".stripMargin
    },

    "sim_mmr_topk" -> mmrSql(m = 20, k = 5, lambdaPct = 70),

    "sim_lsh_multiprobe" ->
      XxOracleSql.embedMultiprobeTopK(cosE6Sql("a.v", "c.v"),
        nQueries = 10, k = 5),

    // product quantization: DuckDB replays train/encode/ADC with the
    // same e6-canonical centroids and ascending-index distance folds
    // (PqOracleSql) — full value-level parity, no fixture fallback
    "emb_pq_codebooks" -> PqOracleSql.codebooks(m = 8, dsub = 8, ksub = 16),
    "sim_pq_codes" -> PqOracleSql.codes(m = 8, dsub = 8, ksub = 16),
    "sim_pq_topk" -> PqOracleSql.topK(m = 8, dsub = 8, ksub = 16, nQueries = 10, k = 5),
    "sim_pq_rerank" -> PqOracleSql.rerankTopK(m = 8, dsub = 8, ksub = 16,
      nQueries = 10, k = 5, shortlist = 20),
    "sim_ivfpq_topk" -> PqOracleSql.ivfPqTopK(m = 8, dsub = 8, ksub = 16,
      dim = 64, centMod = 50, nQueries = 10, k = 5, nprobe = 2),

    "emb_knn_classify" -> {
      val cos = cosE6Sql("q.qv", "e.embedding")
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |           WHERE vec_id < 10),
         |scored AS (SELECT q.qid AS query_id, e.vec_id AS nbr_id, e.label,
         |             $cos AS cos_e6
         |           FROM embeddings e JOIN q ON q.qid <> e.vec_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_e6 DESC, nbr_id ASC) AS rank FROM scored),
         |votes AS (SELECT query_id, label, count(*) AS votes FROM ranked
         |          WHERE rank <= 5 GROUP BY query_id, label),
         |best AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY votes DESC, label ASC) AS rn FROM votes)
         |SELECT query_id, label AS label_pred, votes FROM best
         |WHERE rn = 1""".stripMargin
    },

    "sim_ivf_topk" -> ivfTopKSql,

    // the indexed variant must reproduce the in-memory IVF exactly —
    // one oracle serves both
    "sim_ivf_indexed" -> ivfTopKSql,

    // IVF with nprobe=2: the oracle replays the per-query probe LIST
    // (top-2 centroids by the assignment order), then scores the union
    // of both buckets — each corpus vector lives in exactly one bucket,
    // so the probe join emits no duplicates to dedup
    "sim_ivf_topk_np2" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosScore = cosE6Sql("qp.qv", "n.v")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |qp0 AS (SELECT e.vec_id AS qid, e.embedding AS qv, c.cent_id,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c
         |  WHERE e.vec_id < 10),
         |qp AS (SELECT qid, qv, cent_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM qp0)
         |  WHERE rn <= 2),
         |scored AS (SELECT qp.qid AS query_id, n.vec_id AS nbr_id,
         |             $cosScore AS cos_e6
         |           FROM assign n JOIN qp ON n.cent_id = qp.cent_id
         |           WHERE qp.qid <> n.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_e6 DESC, nbr_id ASC) AS INT) AS rank
         |           FROM scored)
         |SELECT query_id, nbr_id, cos_e6, rank FROM ranked
         |WHERE rank <= 5""".stripMargin
    },

    // ANN recall: compose the brute-force and IVF oracles, semi-join the
    // ranked lists, count per-query overlap
    "sim_ann_recall" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosScore = cosE6Sql("q.qv", "n.v")
      val cosBrute = cosE6Sql("bq.qv", "e.embedding")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, cent_id, v AS qv FROM assign
         |      WHERE vec_id < 10),
         |iscored AS (SELECT q.qid AS query_id, n.vec_id AS nbr_id,
         |             $cosScore AS cos_e6
         |           FROM assign n JOIN q ON n.cent_id = q.cent_id
         |           WHERE q.qid <> n.vec_id),
         |iranked AS (SELECT query_id, nbr_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, nbr_id ASC) AS rank FROM iscored)
         |  WHERE rank <= 5),
         |bq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |       WHERE vec_id < 10),
         |bscored AS (SELECT bq.qid AS query_id, e.vec_id AS nbr_id,
         |              $cosBrute AS cos_e6
         |            FROM embeddings e JOIN bq ON bq.qid <> e.vec_id),
         |branked AS (SELECT query_id, nbr_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, nbr_id ASC) AS rank FROM bscored)
         |  WHERE rank <= 5),
         |hits AS (SELECT b.query_id, count(*) AS n_hits FROM branked b
         |         JOIN iranked a ON a.query_id = b.query_id
         |           AND a.nbr_id = b.nbr_id
         |         GROUP BY b.query_id),
         |ex AS (SELECT query_id, count(*) AS n_exact FROM branked
         |       GROUP BY query_id)
         |SELECT ex.query_id, COALESCE(hits.n_hits, 0) AS n_hits, ex.n_exact,
         |  CAST(floor(10000e0 * COALESCE(hits.n_hits, 0) / ex.n_exact)
         |    AS BIGINT) AS recall_e4
         |FROM ex LEFT JOIN hits USING (query_id)""".stripMargin
    },

    "dd_semantic" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosPair = cosE6Sql("a.v", "b.v")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |drops AS (SELECT DISTINCT b.vec_id FROM assign a
         |          JOIN assign b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
         |          WHERE $cosPair >= 350000)
         |SELECT vec_id, cent_id FROM assign
         |WHERE vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
    },

    "sim_knn_graph" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosPair = cosE6Sql("a.v", "b.v")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
         |             $cosPair AS cos_e6
         |           FROM assign a JOIN assign b ON a.cent_id = b.cent_id
         |             AND a.vec_id <> b.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_e6 DESC, nbr_id ASC) AS INT) AS rank FROM scored)
         |SELECT query_id, nbr_id, cos_e6, rank FROM ranked WHERE rank <= 3""".stripMargin
    },

    // incremental embedding dedup: replay both sides' assignments to the
    // archive's centroid set, form in-cluster batch×archive pairs, drop
    // batch ids with any hit
    "dd_embed_incremental" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosPair = cosE6Sql("b.v", "a.v")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0 AND vec_id < 450),
         |arc0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c
         |  WHERE e.vec_id < 450),
         |arc AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM arc0)
         |  WHERE rn = 1),
         |bat0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c
         |  WHERE e.vec_id >= 450),
         |bat AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM bat0)
         |  WHERE rn = 1),
         |hit AS (SELECT DISTINCT b.vec_id FROM bat b
         |        JOIN arc a ON b.cent_id = a.cent_id
         |        WHERE $cosPair >= 350000)
         |SELECT vec_id FROM embeddings WHERE vec_id >= 450
         |  AND vec_id NOT IN (SELECT vec_id FROM hit)""".stripMargin
    },

    // margin mining: replay of the sim_knn_graph assignment + in-cluster
    // pair scores; each avgK is ONE division of the exact integer top-k
    // sum by its count, and the margin is the same multiply-divide chain
    // floor-quantized to e4 — value-identical across engines
    "sim_margin_pairs" -> {
      val cosAssign = cosE6Sql("e.embedding", "c.embedding")
      val cosPair = cosE6Sql("a.v", "b.v")
      s"""WITH c AS (SELECT vec_id AS cent_id, embedding FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |assign0 AS (SELECT e.vec_id, c.cent_id, e.embedding AS v,
         |    $cosAssign AS cos_e6 FROM embeddings e CROSS JOIN c),
         |assign AS (SELECT vec_id, cent_id, v FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_e6 DESC, cent_id ASC) AS rn FROM assign0)
         |  WHERE rn = 1),
         |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS nbr_id,
         |             $cosPair AS cos_e6
         |           FROM assign a JOIN assign b ON a.cent_id = b.cent_id
         |             AND a.vec_id <> b.vec_id),
         |topk AS (SELECT query_id, cos_e6 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_e6 DESC, nbr_id ASC) AS rn FROM scored)
         |  WHERE rn <= 3),
         |den AS (SELECT query_id AS id,
         |          CAST(CAST(sum(cos_e6) AS BIGINT) AS DOUBLE) / count(*) AS den
         |        FROM topk GROUP BY query_id),
         |p AS (SELECT query_id AS id_a, nbr_id AS id_b, cos_e6 FROM scored
         |      WHERE query_id < nbr_id)
         |SELECT * FROM (
         |  SELECT p.id_a, p.id_b, p.cos_e6,
         |    CAST(floor(20000e0 * p.cos_e6 / (da.den + db.den)) AS BIGINT)
         |      AS margin_e4
         |  FROM p JOIN den da ON p.id_a = da.id JOIN den db ON p.id_b = db.id
         |  WHERE da.den > 0 AND db.den > 0)
         |WHERE margin_e4 >= 10500""".stripMargin
    },

    "ds_temperature_sample" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |mn AS (SELECT min(n) AS min_n FROM cnt),
         |r AS (SELECT lang, CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n) * 10000)
         |        AS BIGINT) AS rate_e4 FROM cnt, mn)
         |SELECT doc_id, lang, source FROM documents JOIN r USING (lang)
         |WHERE (${md5LongSql("concat('temp#', CAST(doc_id AS VARCHAR))")}
         |       % 10000) < rate_e4""".stripMargin,

    "ds_temperature_sample_tau" ->
      s"""WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |mn AS (SELECT min(n) AS min_n FROM cnt),
         |r AS (SELECT lang, CAST(floor((CAST(min_n AS DOUBLE) / n) * 10000)
         |        AS BIGINT) AS rate_e4 FROM cnt, mn)
         |SELECT doc_id, lang, source FROM documents JOIN r USING (lang)
         |WHERE (${md5LongSql("concat('temp#', CAST(doc_id AS VARCHAR))")}
         |       % 10000) < rate_e4""".stripMargin,

    "tx_len_quantiles" ->
      """WITH r AS (SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n FROM documents)
        |SELECT lang,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_chars END)
        |    AS median_chars,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_chars END)
        |    AS p90_chars,
        |  CAST(max(n) AS BIGINT) AS n_docs
        |FROM r GROUP BY lang""".stripMargin,

    "tx_len_hdr" ->
      """WITH v AS (SELECT lang, CAST(n_chars AS BIGINT) AS v FROM documents),
        |b AS (SELECT lang,
        |    CASE WHEN v < 64 THEN v
        |         ELSE (length(bin(v)) - 5) * 32
        |              + (v >> (length(bin(v)) - 6)) - 32 END AS b
        |  FROM v),
        |h AS (SELECT lang, b, count(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (SELECT lang, b, c,
        |    sum(c) OVER (PARTITION BY lang ORDER BY b) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n,
        |    CASE WHEN b < 64 THEN b
        |         ELSE (32 + b % 32)
        |              * (1::BIGINT << CAST(b // 32 - 1 AS INTEGER)) END AS lb
        |  FROM h)
        |SELECT lang,
        |  CAST(min(CASE WHEN cum * 10000 >= n * 5000 THEN lb END) AS BIGINT)
        |    AS p50_lb,
        |  CAST(min(CASE WHEN cum * 10000 >= n * 9000 THEN lb END) AS BIGINT)
        |    AS p90_lb,
        |  CAST(min(CASE WHEN cum * 10000 >= n * 9900 THEN lb END) AS BIGINT)
        |    AS p99_lb,
        |  CAST(max(n) AS BIGINT) AS n_docs
        |FROM cum GROUP BY lang""".stripMargin,

    "ds_stratified_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE (${md5LongSql("concat('samp#', CAST(doc_id AS VARCHAR))")}
         |       % 10000) <
         |  CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 6000 ELSE 1500 END""".stripMargin,

    // the hygiene pipeline, stage by stage: quality+repetition gates →
    // jaccard clusters over the survivors (min-id representative kept) →
    // eval-overlap decontamination of the representatives
    "tx_quality_logreg" ->
      s"""WITH $logRegCte
         |SELECT j, w_e6 FROM w2""".stripMargin,

    "tx_quality_logreg_score" ->
      s"""WITH $logRegCte,
         |m2 AS (SELECT doc_id, CAST(sum(w_e6 * x) AS BIGINT) AS margin_e6
         |       FROM fx JOIN w2 USING (j) GROUP BY doc_id)
         |SELECT doc_id, margin_e6 FROM m2
         |ORDER BY margin_e6 DESC, doc_id LIMIT 20""".stripMargin,

    "ds_profile" ->
      """SELECT 'l_returnflag' AS "column",
        |  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  count(DISTINCT l_returnflag) AS n_distinct FROM lineitem
        |UNION ALL
        |SELECT 'l_linestatus',
        |  CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_linestatus) FROM lineitem
        |UNION ALL
        |SELECT 'l_shipdate',
        |  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_shipdate) FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity',
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT l_quantity) FROM lineitem""".stripMargin,

    "ds_corpus_clean" ->
      s"""WITH RECURSIVE
         |q0 AS (SELECT doc_id, text, lang, n_chars, $W AS w FROM documents
         |       WHERE doc_id % 100 <> 0),
         |q1 AS (SELECT doc_id, text, lang, n_chars, w,
         |  CAST(floor(len(list_distinct(w)) * 10000.0 / len(w))
         |    + (CASE WHEN floor(len(list_filter(w, x -> list_contains(
         |        $AllMarkersSql, x))) * 10000.0 / len(w)) > 0
         |       THEN 500 ELSE 0 END)
         |    - (CASE WHEN floor((length(text) - len(w) + 1) * 100.0 / len(w)) > 1200
         |       THEN 1000 ELSE 0 END) AS BIGINT) AS quality_e4,
         |  CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE len(w) END AS t3,
         |  len($ShingleSql) AS d3
         |  FROM q0),
         |q AS (SELECT doc_id, text, lang, n_chars, quality_e4 FROM q1
         |      WHERE quality_e4 >= 4000
         |        AND CAST(floor((t3 - d3) * 10000.0 / t3) AS BIGINT) <= 500),
         |${jaccardPairCtes("q")},
         |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
         |e AS (SELECT id_a AS a, id_b AS b FROM pr
         |      UNION SELECT id_b AS a, id_a AS b FROM pr),
         |reach(n, m) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT r.n, e2.b FROM reach r JOIN e e2 ON e2.a = r.m),
         |lab AS (SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS label
         |        FROM reach GROUP BY n),
         |dd AS (SELECT q.* FROM q LEFT JOIN lab USING (doc_id)
         |       WHERE label IS NULL OR label = doc_id),
         |ew AS (SELECT doc_id, $W AS w FROM documents WHERE doc_id % 100 = 0),
         |ev AS (SELECT DISTINCT unnest($ShingleSql) AS g FROM ew),
         |tw AS (SELECT doc_id, $W AS w FROM dd),
         |tr AS (SELECT doc_id, unnest($ShingleSql) AS g FROM tw),
         |hits AS (SELECT tr.doc_id, count(*) AS n_hits FROM tr
         |         JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id)
         |SELECT dd.doc_id, dd.lang, dd.quality_e4
         |FROM dd LEFT JOIN hits USING (doc_id)
         |WHERE coalesce(n_hits, 0) < 2""".stripMargin,

    // the composed preparation pipeline: hygiene chain (as ds_corpus_clean,
    // text carried through) → split hash < 9000 → greedy packing
    "ds_prepare_training" -> {
      val splitH = md5LongSql("concat('split#', CAST(doc_id AS VARCHAR))")
      s"""WITH RECURSIVE
         |q0 AS (SELECT doc_id, text, lang, n_chars, $W AS w FROM documents
         |       WHERE doc_id % 100 <> 0),
         |q1 AS (SELECT doc_id, text, lang, n_chars, w,
         |  CAST(floor(len(list_distinct(w)) * 10000.0 / len(w))
         |    + (CASE WHEN floor(len(list_filter(w, x -> list_contains(
         |        $AllMarkersSql, x))) * 10000.0 / len(w)) > 0
         |       THEN 500 ELSE 0 END)
         |    - (CASE WHEN floor((length(text) - len(w) + 1) * 100.0 / len(w)) > 1200
         |       THEN 1000 ELSE 0 END) AS BIGINT) AS quality_e4,
         |  CASE WHEN len(w) >= 3 THEN len(w) - 2 ELSE len(w) END AS t3,
         |  len($ShingleSql) AS d3
         |  FROM q0),
         |q AS (SELECT doc_id, text, lang, n_chars, quality_e4 FROM q1
         |      WHERE quality_e4 >= 4000
         |        AND CAST(floor((t3 - d3) * 10000.0 / t3) AS BIGINT) <= 500),
         |${jaccardPairCtes("q")},
         |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
         |e AS (SELECT id_a AS a, id_b AS b FROM pr
         |      UNION SELECT id_b AS a, id_a AS b FROM pr),
         |reach(n, m) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT r.n, e2.b FROM reach r JOIN e e2 ON e2.a = r.m),
         |lab AS (SELECT n AS doc_id, CAST(min(m) AS BIGINT) AS label
         |        FROM reach GROUP BY n),
         |dd AS MATERIALIZED (SELECT q.* FROM q LEFT JOIN lab USING (doc_id)
         |       WHERE label IS NULL OR label = doc_id),
         |ew AS (SELECT doc_id, $W AS w FROM documents WHERE doc_id % 100 = 0),
         |ev AS (SELECT DISTINCT unnest($ShingleSql) AS g FROM ew),
         |tw AS (SELECT doc_id, $W AS w FROM dd),
         |tr AS (SELECT doc_id, unnest($ShingleSql) AS g FROM tw),
         |hits AS (SELECT tr.doc_id, count(*) AS n_hits FROM tr
         |         JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id),
         |kept AS (SELECT dd.doc_id, dd.text
         |         FROM dd LEFT JOIN hits USING (doc_id)
         |         WHERE coalesce(n_hits, 0) < 2),
         |src AS (SELECT doc_id,
         |          CAST(len($W) AS BIGINT) AS n_tokens
         |        FROM kept WHERE ($splitH % 10000) < 9000),
         |${packRecSql("src", "doc_id", "n_tokens", 256L, 8, "prep")}
         |SELECT pid AS doc_id, shard, CAST(bin AS BIGINT) AS bin,
         |       bin_offset, plen AS n_tokens FROM rec""".stripMargin
    },

    // sharded greedy next-fit packing: the per-shard sequential fold is a
    // single-arm recursive CTE along the shard's row_number chain
    "ds_pack_sequences" ->
      s"""WITH RECURSIVE
         |src AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens
         |        FROM documents),
         |${packRecSql("src", "doc_id", "n_tokens", 256L, 8, "pack")}
         |SELECT pid AS doc_id, shard, CAST(bin AS BIGINT) AS bin,
         |       bin_offset, plen AS n_tokens FROM rec""".stripMargin,

    // chunk -> pack composition: the 32-token context windows of tx_chunk
    // packed into 256-token training sequences
    "ds_pack_chunks" ->
      s"""WITH RECURSIVE
         |tch AS (SELECT doc_id, $W AS w FROM documents),
         |cch AS (SELECT doc_id, len(w) AS n,
         |          unnest(list_transform(
         |            range(0, CAST(floor((len(w) - 1) / 24) AS BIGINT) + 1),
         |            i -> i * 24)) AS chunk_start
         |        FROM tch),
         |src AS (SELECT doc_id * 100 + (chunk_start // 24) AS chunk_id,
         |          CAST(least(n - chunk_start, 32) AS BIGINT) AS n_chunk_tokens
         |        FROM cch),
         |${packRecSql("src", "chunk_id", "n_chunk_tokens", 256L, 8, "packc")}
         |SELECT pid AS chunk_id, shard, CAST(bin AS BIGINT) AS bin,
         |       bin_offset, plen AS n_chunk_tokens FROM rec""".stripMargin,

    "ds_quota_curate" ->
      s"""WITH q AS (SELECT doc_id, lang,
         |  CAST(floor(len(list_distinct($W)) * 10000.0 / len($W))
         |    + (CASE WHEN floor(len(list_filter($W, x -> list_contains(
         |        $AllMarkersSql, x))) * 10000.0 / len($W)) > 0
         |       THEN 500 ELSE 0 END)
         |    - (CASE WHEN floor((length(text) - len($W) + 1) * 100.0 / len($W)) > 1200
         |       THEN 1000 ELSE 0 END) AS BIGINT) AS quality_e4
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang
         |        ORDER BY quality_e4 DESC, doc_id ASC) AS rank FROM q)
         |SELECT lang, doc_id, quality_e4, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 30""".stripMargin,

    "ds_sample_exact_n" ->
      s"""SELECT doc_id, lang, source FROM documents
         |ORDER BY ${md5LongSql("concat('samp#', CAST(doc_id AS VARCHAR))")},
         |         doc_id
         |LIMIT 100""".stripMargin,

    "ds_stratified_exact_n" ->
      s"""WITH r AS (SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |  ORDER BY ${md5LongSql("concat('samp#', CAST(doc_id AS VARCHAR))")},
         |           doc_id) AS rn FROM documents)
         |SELECT lang, doc_id FROM r WHERE rn <= 20""".stripMargin,

    "ds_weighted_sample" -> {
      val h = md5LongSql("concat('wsamp#', CAST(doc_id AS VARCHAR))")
      s"""WITH c AS (SELECT lang, doc_id,
         |    CAST(floor(1e9 * (-ln((($h % 1000000) + 1) / 1000000e0)) /
         |      CAST(n_chars AS DOUBLE)) AS BIGINT) AS key_e9
         |  FROM documents WHERE n_chars > 0)
         |SELECT lang, doc_id, key_e9,
         |  CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY key_e9, doc_id) AS INT) AS rank
         |FROM c QUALIFY rank <= 10""".stripMargin
    },

    "ds_split_assign" -> {
      val h = md5LongSql("concat('split#', CAST(doc_id AS VARCHAR))")
      s"""SELECT doc_id, lang,
         |  CASE WHEN ($h % 10000) < 9000 THEN 'train'
         |       WHEN ($h % 10000) < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin
    },

    "ds_leakage_safe_split" -> {
      val h = md5LongSql("concat('split#', CAST(leak_key AS VARCHAR))")
      s"""WITH RECURSIVE ${jaccardPairCtes("documents")},
         |pr AS (SELECT id_a, id_b FROM p WHERE jaccard_e4 >= 5000),
         |e AS (SELECT id_a AS a, id_b AS b FROM pr
         |      UNION SELECT id_b AS a, id_a AS b FROM pr),
         |reach(n, m) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT r.n, e2.b FROM reach r JOIN e e2 ON e2.a = r.m),
         |lbl AS (SELECT n AS id, CAST(min(m) AS BIGINT) AS label
         |        FROM reach GROUP BY n),
         |lk AS (SELECT d.doc_id,
         |         coalesce(l.label, d.doc_id) AS leak_key
         |       FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
         |SELECT doc_id, leak_key,
         |  CASE WHEN ($h % 10000) < 9000 THEN 'train'
         |       WHEN ($h % 10000) < 9500 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lk""".stripMargin
    },

    "ds_domain_mix" ->
      s"""WITH a AS (SELECT source, lang, count(*) AS n_docs,
         |             CAST(sum(CAST(len($W) AS BIGINT)) AS BIGINT) AS n_tokens
         |           FROM documents GROUP BY source, lang),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM a)
         |SELECT source, lang, n_docs, n_tokens,
         |  CAST(floor(n_tokens * 1000000.0 / total) AS BIGINT) AS share_e6
         |FROM a, t""".stripMargin,

    // DSIR weights: identical smoothed e9/e4 integer grids, identical
    // md5 bucket hash, truncating division — `//` floors and every
    // operand is nonnegative, so it matches Spark's `div` exactly
    "ds_dsir_weights" ->
      s"""WITH tok AS (SELECT doc_id, lang = 'en' AS tgt, unnest($W) AS tok
         |            FROM documents),
         |bk AS (SELECT doc_id, tgt, ${md5LongSql("tok")} % 4096 AS b FROM tok),
         |c AS (SELECT b, CAST(count(*) AS BIGINT) AS r,
         |        CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS t
         |      FROM bk GROUP BY b),
         |tot AS (SELECT CAST(sum(r) AS BIGINT) AS rr,
         |          CAST(sum(t) AS BIGINT) AS tt FROM c),
         |rt AS (SELECT b,
         |         (((t + 1) * 1000000000) // (tt + 4096)) * 10000
         |           // greatest((((r + 1) * 1000000000) // (rr + 4096)), 1)
         |           AS ratio_e4
         |       FROM c, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(ratio_e4) AS BIGINT) AS dsir_sum_e4,
         |  CAST(sum(ratio_e4) // count(*) AS BIGINT) AS dsir_avg_e4
         |FROM bk JOIN rt USING (b) GROUP BY doc_id""".stripMargin,

    "tx_normalize" -> {
      val norm =
        raw"regexp_replace(lower(trim(nfc_normalize(text))), '\s+', ' ', 'g')"
      s"""SELECT doc_id, $norm AS norm_text,
         |  CAST(length($norm) AS BIGINT) AS n_norm_chars
         |FROM documents""".stripMargin
    },

    "tx_common_ratio" ->
      s"""WITH tk AS (SELECT unnest($W) AS token FROM documents),
         |c AS (SELECT token, count(*) AS n FROM tk GROUP BY token),
         |v AS (SELECT list(token ORDER BY n DESC, token ASC) AS vocab
         |      FROM (SELECT token, n FROM c
         |            ORDER BY n DESC, token ASC LIMIT 200))
         |SELECT doc_id, CAST(len($W) AS BIGINT) AS n_tokens,
         |  CAST(floor(len(list_filter($W, x -> list_contains(v.vocab, x)))
         |    * 10000.0 / len($W)) AS BIGINT) AS common_ratio_e4
         |FROM documents, v""".stripMargin,

    "tx_tfidf_topk" ->
      s"""WITH tk AS (SELECT doc_id, unnest($W) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tk
         |       GROUP BY doc_id, token),
         |dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf,
         |         tf.tf * CAST(floor(n.n_docs * 10000.0 / dfq.df) AS BIGINT)
         |           AS score_e4
         |       FROM tf JOIN dfq USING (token), n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score_e4 DESC, token ASC) AS INT) AS rank FROM sc)
         |SELECT doc_id, token, tf, score_e4, rank FROM r WHERE rank <= 3""".stripMargin,

    "tx_rake_keywords" -> {
      // the SAME stopword set the Spark operator defaults to
      val stop = TextAnalysis.langMarkers.values.flatten.toSeq.distinct
        .map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(lower(coalesce(text, '')), '[^a-z0-9 ]+')
         |      AS segs
         |  FROM documents),
         |seg AS (SELECT doc_id, unnest(range(1, len(segs) + 1)) AS seg_pos,
         |          segs FROM t),
         |sw AS (SELECT doc_id, seg_pos,
         |         string_split_regex(segs[seg_pos], ' +') AS ws0 FROM seg),
         |w0 AS (SELECT doc_id, seg_pos,
         |         unnest(range(1, len(ws0) + 1)) AS word_pos, ws0 FROM sw),
         |w1 AS (SELECT doc_id, seg_pos, word_pos, ws0[word_pos] AS w
         |       FROM w0 WHERE ws0[word_pos] <> ''),
         |w2 AS (SELECT *, CASE WHEN w IN ($stop) THEN 1 ELSE 0 END AS is_stop
         |       FROM w1),
         |w3 AS (SELECT *, sum(is_stop) OVER (PARTITION BY doc_id, seg_pos
         |         ORDER BY word_pos) AS island FROM w2),
         |pw AS (SELECT doc_id, seg_pos, island, word_pos, w FROM w3
         |       WHERE is_stop = 0),
         |ph AS (SELECT doc_id, seg_pos, island,
         |         array_to_string(list(w ORDER BY word_pos), ' ') AS phrase,
         |         CAST(count(*) AS BIGINT) AS plen
         |       FROM pw GROUP BY doc_id, seg_pos, island),
         |wstat AS (SELECT pw.w, CAST(count(*) AS BIGINT) AS freq,
         |            CAST(sum(ph.plen) AS BIGINT) AS deg
         |          FROM pw JOIN ph USING (doc_id, seg_pos, island)
         |          GROUP BY pw.w),
         |wsc AS (SELECT w, (deg * 1000000) // freq AS wscore FROM wstat),
         |occ AS (SELECT ph.doc_id, ph.seg_pos, ph.island, ph.phrase,
         |          CAST(sum(wsc.wscore) AS BIGINT) AS score_e6
         |        FROM pw JOIN ph USING (doc_id, seg_pos, island)
         |          JOIN wsc ON pw.w = wsc.w
         |        GROUP BY 1, 2, 3, 4)
         |SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
         |  CAST(max(score_e6) AS BIGINT) AS score_e6
         |FROM occ GROUP BY phrase
         |ORDER BY score_e6 DESC, phrase ASC LIMIT 25""".stripMargin
    },

    "tx_pii_redact" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text,
         |    '${TextAnalysis.Ipv4Pattern}')) AS BIGINT) AS n_ips,
         |  md5(regexp_replace(regexp_replace(text,
         |    '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g')) AS redacted_fp
         |FROM documents""".stripMargin,

    "tx_tokenize" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |tk AS (SELECT unnest(w) AS token FROM t),
         |c AS (SELECT token, count(*) AS n FROM tk GROUP BY token),
         |v0 AS (SELECT token, row_number() OVER (ORDER BY n DESC, token ASC)
         |         AS token_id FROM c),
         |v AS (SELECT * FROM v0 WHERE token_id <= 20),
         |px AS (SELECT doc_id, unnest(range(1, len(w)+1)) AS pos,
         |         unnest(w) AS token FROM t)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |  CAST(coalesce(v.token_id, 0) AS BIGINT) AS token_id
         |FROM px LEFT JOIN v USING (token)""".stripMargin,

    "tx_chunk" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         |c AS (SELECT doc_id, len(w) AS n, w,
         |        unnest(list_transform(
         |          range(0, CAST(floor((len(w) - 1) / 24) AS BIGINT) + 1),
         |          i -> i * 24)) AS chunk_start
         |      FROM t)
         |SELECT doc_id, CAST(chunk_start // 24 AS BIGINT) AS chunk_idx,
         |  CAST(chunk_start AS BIGINT) AS chunk_start,
         |  CAST(least(n - chunk_start, 32) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(w[chunk_start + 1 : chunk_start + 32], ' '))
         |    AS chunk_fp
         |FROM c""".stripMargin,

    "mm_decode_meta" ->
      s"""SELECT doc_id AS media_id,
         |  CAST($MmN AS BIGINT) AS "sizeBytes",
         |  $MmWidth AS width, $MmHeight AS height, $MmFrames AS "nFrames"
         |FROM documents""".stripMargin,

    "mm_frame_sample" ->
      s"""SELECT doc_id AS media_id,
         |  unnest(range(0, CAST($MmFrames AS BIGINT), 3)) AS frame_idx
         |FROM documents""".stripMargin,

    "mm_neardup" -> {
      val cos = cosE6Sql("a.v", "b.v")
      s"""WITH f AS (SELECT doc_id AS media_id,
         |    [CAST(CAST((($MmN * i + $MmFirst) % 997) AS FLOAT)
         |       / CAST(997 AS FLOAT) AS FLOAT) for i in range(1, 9)] AS v
         |  FROM documents WHERE doc_id < 500)
         |SELECT a.media_id AS id_a, b.media_id AS id_b, $cos AS cos_e6
         |FROM f a JOIN f b ON a.media_id < b.media_id
         |WHERE $cos >= 999990""".stripMargin
    },

    // float32 division of identical integers is bit-identical across
    // engines; the widen-to-double and floor-scale then match exactly
    "mm_feature_vec" ->
      s"""SELECT doc_id AS media_id, CAST(i - 1 AS INT) AS dim,
         |  CAST(floor(CAST(CAST((($MmN * i + $MmFirst) % 997) AS FLOAT)
         |    / CAST(997 AS FLOAT) AS DOUBLE) * 1000000.0) AS BIGINT) AS feat_e6
         |FROM documents, range(1, 9) r(i)""".stripMargin,

    "mm_resize_plan" ->
      s"""WITH m AS (SELECT doc_id AS media_id, $MmWidth AS width,
         |                  $MmHeight AS height FROM documents),
         |s AS (SELECT *, CASE WHEN greatest(width, height) <= 256 THEN CAST(10000 AS BIGINT)
         |        ELSE CAST(floor(256 * 10000.0 / greatest(width, height)) AS BIGINT) END
         |        AS scale_e4 FROM m)
         |SELECT media_id, width, height, scale_e4,
         |  CAST(floor(width * scale_e4 / 10000.0) AS INT) AS out_width,
         |  CAST(floor(height * scale_e4 / 10000.0) AS INT) AS out_height
         |FROM s""".stripMargin,

    // verifies the REAL WAV decoder end-to-end: the Spark side round-
    // trips text -> PCM16 WAV container -> chunk-walking parser ->
    // integer stats; the oracle computes the same stats from the text
    // directly (sample i = ((codepoint_i mod 256) - 128) * 256, rate =
    // 8000 + (id mod 8) * 1000 Hz mono), so any parser defect diverges
    "mm_audio_meta" ->
      """WITH t AS (SELECT doc_id AS media_id, coalesce(text, '') AS tx
        |           FROM documents),
        |sq AS (SELECT media_id,
        |         unnest(range(1, len(tx) + 1)) AS i, tx FROM t),
        |sm AS (SELECT media_id, i,
        |         ((unicode(tx[CAST(i AS INT)]) % 256) - 128) * 256 AS s
        |       FROM sq),
        |w AS (SELECT media_id, s, i,
        |        lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
        |      FROM sm),
        |z AS (SELECT media_id,
        |        CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq,
        |        CAST(coalesce(sum(CASE WHEN prev * s < 0 THEN 1 ELSE 0
        |          END), 0) AS BIGINT) AS zc,
        |        CAST(max(abs(s)) AS INT) AS peak,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM w GROUP BY media_id)
        |SELECT t.media_id,
        |  CAST(8000 + (t.media_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
        |  coalesce(z.n, 0) AS n_samples,
        |  coalesce(z.n, 0) * 1000
        |    // (8000 + (t.media_id % 8) * 1000) AS duration_ms,
        |  coalesce(z.sum_sq, 0) AS sum_sq,
        |  coalesce(z.zc, 0) AS zero_crossings,
        |  coalesce(z.peak, 0) AS peak_abs
        |FROM t LEFT JOIN z USING (media_id)""".stripMargin,

    // verifies the REAL MP4 box walker end-to-end: the Spark side
    // round-trips text -> ISO-BMFF container -> box-walking parser ->
    // integer metadata; the oracle recomputes the same fields from the
    // text directly (every field is a pure integer function of
    // (doc_id, length(text)) by the fixture's construction)
    "mm_video_meta" ->
      """WITH t AS (SELECT doc_id AS media_id,
        |             length(coalesce(text, '')) AS n FROM documents)
        |SELECT media_id,
        |  CAST(600 + (media_id % 4) * 100 AS INT) AS timescale,
        |  CAST(n * 25 AS BIGINT) AS duration_units,
        |  CAST((n * 25 * 1000) // (600 + (media_id % 4) * 100)
        |    AS BIGINT) AS duration_ms,
        |  CAST(1 + (media_id % 2) AS INT) AS n_tracks,
        |  CAST(160 + (n % 480) AS INT) AS width,
        |  CAST(120 + (media_id % 240) AS INT) AS height,
        |  CASE CAST((media_id + n) % 3 AS INT)
        |    WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1' ELSE 'vp09'
        |  END AS codec
        |FROM t""".stripMargin
  )
}
