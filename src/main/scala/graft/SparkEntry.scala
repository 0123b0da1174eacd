package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnotationJoin, Dedup}
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

    // ---- W2: legacy ranked dedup, multi-key mixed-direction priority
    //      order (cloud/bq/dedup.go:23-38) ----
    "w2_dedup_ranked" -> ((s, dir) =>
      Dedup.rankedFirst(
        mMonthly(s, dir),
        Seq(col("id"), col("date")),
        Seq(col("l_quantity").desc, col("l_returnflag").asc,
          col("parser_time").desc, col("l_orderkey").asc, col("l_linenumber").asc))),

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

    // ---- Events: tumbling-window aggregation (daily batch analog of the
    //      reference's per-day incremental model, SURVEY.md §2.7) ----
    "ev_hourly_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 10000).cast("long")).as("sum_value_e4")))
  )

  private val M = Tables.measurementsMonthlySql
  private val D = Tables.measurementsDailySql
  private val A = Tables.annotationsDailySql

  private val mCols =
    """id, "date", parser_time, l_orderkey, l_partkey, l_suppkey, l_linenumber,
      | l_quantity, l_extendedprice, l_returnflag, l_linestatus""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "w1_dedup_keepset" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time = max_t""".stripMargin,

    "j2_dedup_deleted_set" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, max(parser_time) OVER (PARTITION BY id, "date") AS max_t FROM m)
         |SELECT $mCols FROM r WHERE parser_time <> max_t""".stripMargin,

    "w2_dedup_ranked" ->
      s"""WITH m AS ($M),
         |r AS (SELECT *, row_number() OVER (PARTITION BY id, "date"
         |  ORDER BY l_quantity DESC, l_returnflag ASC, parser_time DESC,
         |           l_orderkey ASC, l_linenumber ASC) AS rn FROM m)
         |SELECT $mCols FROM r WHERE rn = 1""".stripMargin,

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

    "s5_partition_stats" ->
      s"""WITH m AS ($D)
         |SELECT "date", count(*) AS n_rows, count(DISTINCT id) AS n_ids,
         |       sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS sum_qty_e2
         |FROM m GROUP BY "date"""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS sum_qty_e2,
        |  sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_e2,
        |  sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
        |    AS sum_disc_price_e2,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "ev_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  sum(CAST(floor(value * 10000) AS BIGINT)) AS sum_value_e4
        |FROM events GROUP BY 1""".stripMargin
  )
}
