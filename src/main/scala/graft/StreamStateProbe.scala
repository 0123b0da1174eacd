package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming state-scale probe: the watermarked interval join
  * ([[graft.streaming.Streams.annotateStream]]) claims its state store
  * tracks the WATERMARK HORIZON, not stream length — rows are retired
  * once the watermark passes their join window, so a week-long stream
  * holds the same state as an hour-long one at equal rates. This probe
  * drives a long stream (many micro-batches, event time advancing one
  * batch interval per batch) and records per-batch state-store rows
  * from the query progress.
  *
  * Pass criterion: `state_rows_max` plateaus at ≈ rate × (lateness +
  * maxAge + one batch interval) — the horizon bound printed alongside —
  * while `rows_in` grows linearly with the batch count; the final few
  * batches' state must not exceed the plateau established in the first
  * few horizons. A state store that tracked stream length instead would
  * grow ~linearly to rows_in on BOTH sides of the join.
  *
  * Usage: runMain graft.StreamStateProbe [batches] [rowsPerBatch]
  * (defaults 60 × 500+500 — event time spans 10 h at 10 min/batch
  * against a 10 min lateness + 30 min maxAge horizon).
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.length > 0) args(0).toInt else 60
    val perBatch = if (args.length > 1) args(1).toInt else 500
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8") // keyed state, tiny rows
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val meas = MemoryStream[(Long, java.sql.Timestamp)]
    val anns = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = graft.streaming.Streams.annotateStream(
      meas.toDF().toDF("id", "ts"),
      anns.toDF().toDF("ann_id", "ann_ts", "geo"),
      lateness = "10 minutes", maxAge = "30 minutes")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-streamstate").toString
    // default micro-batch trigger: the loop below drives one batch per
    // addData + processAllAvailable (AvailableNow would terminate the
    // query after draining the first batch)
    val q = joined.writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val batchIntervalSec = 600L // event time advances 10 min per batch
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    var rowsIn = 0L
    val stateRows = new scala.collection.mutable.ArrayBuffer[Long]()
    (0 until nBatches).foreach { b =>
      val base = t0 + b * batchIntervalSec * 1000L
      meas.addData((0 until perBatch).map(i =>
        (i.toLong % 97, new java.sql.Timestamp(base + i))): _*)
      anns.addData((0 until perBatch).map(i =>
        (i.toLong % 97, new java.sql.Timestamp(base + i), s"g$b")): _*)
      rowsIn += 2L * perBatch
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty)
        stateRows += p.stateOperators.map(_.numRowsTotal).sum
    }
    q.stop()

    // horizon bound: rows alive = both sides' rows within
    // (lateness + maxAge + 1 batch) of the max event time
    val horizonBatches =
      math.ceil((10 * 60 + 30 * 60).toDouble / batchIntervalSec).toInt + 1
    val horizonBound = 2L * perBatch * horizonBatches
    val maxState = if (stateRows.nonEmpty) stateRows.max else 0L
    val lastState = if (stateRows.nonEmpty) stateRows.last else 0L
    val tailMax = if (stateRows.size > 10) stateRows.takeRight(10).max else maxState
    println(s"""{"metric":"stream_state","batches":$nBatches,""" +
      s""""rows_in":$rowsIn,"state_rows_max":$maxState,""" +
      s""""state_rows_final":$lastState,"state_rows_tail_max":$tailMax,""" +
      s""""horizon_bound":$horizonBound,""" +
      s""""bounded":${tailMax <= 2 * horizonBound}}""")
    spark.stop()
  }
}
