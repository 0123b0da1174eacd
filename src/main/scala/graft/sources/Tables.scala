package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided synthetic tables (TESTDATA.md) plus the
  * canonical "gardener views" that re-key them into the reference's
  * measurement/annotation row shape (FIXTURES.md §2):
  *
  *   id     STRING   — dedup key     (reference: cloud/bq/ops.go:76)
  *   date   DATE     — partition col (reference: cloud/bq/ops.go:74)
  *   parser STRUCT<Time: TIMESTAMP>  — dedup order key (cloud/bq/ops.go:200-203)
  *   ...payload columns
  *
  * The views are deterministic projections so a DuckDB oracle can reproduce
  * them with plain SQL on the same parquet files.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** events.parquet has shipped `ts` two ways across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's vectorized reader
    * only accepts as a raw long — and TIMESTAMP(MICROS) without UTC
    * adjustment, which Spark infers as TIMESTAMP_NTZ. Normalize both to
    * session-zone TIMESTAMP so downstream operators see one type:
    * nanos truncate by integer division (epoch nanos exceed double
    * precision; DuckDB truncates ns→us the same way), and NTZ is a
    * value-preserving cast because every entrypoint pins
    * spark.sql.session.timeZone=UTC.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Measurement view at MONTH partition grain (dedup volume testing).
    *
    * id   = l_orderkey % 1000 (string)         — induces duplicate ids
    * date = month of l_shipdate (DATE)          — partition column
    * parser.Time = l_shipdate + l_linenumber s  — parse-order key
    *
    * Flat `parser_time` column alongside the nested struct so oracle-facing
    * queries can stay struct-free.
    */
  def measurementsMonthly(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
    val pt = expr("l_shipdate + make_interval(0,0,0,0,0,0,l_linenumber)")
    li.select(
      (col("l_orderkey") % 1000).cast("string").as("id"),
      date_trunc("month", col("l_shipdate")).cast("date").as("date"),
      pt.as("parser_time"),
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_returnflag"), col("l_linestatus")
    )
  }

  /** The DuckDB-equivalent FROM clause for [[measurementsMonthly]]. */
  val measurementsMonthlySql: String =
    """SELECT CAST(l_orderkey % 1000 AS VARCHAR) AS id,
      |       CAST(date_trunc('month', l_shipdate) AS DATE) AS date,
      |       l_shipdate + l_linenumber * INTERVAL 1 SECOND AS parser_time,
      |       l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |       l_extendedprice, l_returnflag, l_linestatus
      |FROM lineitem""".stripMargin

  /** Measurement view at DAY partition grain (faithful single-partition ops). */
  def measurementsDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
    li.select(
      (col("l_orderkey") % 1000).cast("string").as("id"),
      col("l_shipdate").cast("date").as("date"),
      col("l_shipdate").as("parser_time"),
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_returnflag"), col("l_linestatus")
    )
  }

  val measurementsDailySql: String =
    """SELECT CAST(l_orderkey % 1000 AS VARCHAR) AS id,
      |       CAST(l_shipdate AS DATE) AS date,
      |       l_shipdate AS parser_time,
      |       l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |       l_extendedprice, l_returnflag, l_linestatus
      |FROM lineitem""".stripMargin

  /** Annotation view from orders (right side of the annotation join;
    * reference: FIXTURES.md §2.1). Shares the id key space with the
    * measurement views so USING(id) joins hit.
    */
  def annotationsDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val o = orders(spark, sfDir)
    o.select(
      (col("o_orderkey") % 1000).cast("string").as("id"),
      col("o_orderdate").cast("date").as("date"),
      col("o_orderkey").as("ann_orderkey"),
      col("o_orderstatus").as("ann_status"),
      col("o_totalprice").as("ann_totalprice"),
      col("o_orderpriority").as("ann_priority")
    )
  }

  val annotationsDailySql: String =
    """SELECT CAST(o_orderkey % 1000 AS VARCHAR) AS id,
      |       CAST(o_orderdate AS DATE) AS date,
      |       o_orderkey AS ann_orderkey,
      |       o_orderstatus AS ann_status,
      |       o_totalprice AS ann_totalprice,
      |       o_orderpriority AS ann_priority
      |FROM orders""".stripMargin
}
