package graft.tableops

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

/** Incremental view maintenance: model equivalence across churn,
  * exactly-once application, group death, and rewrite-cancellation
  * (compaction churn nets to zero delta).
  */
class IncrementalAggSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val VD = LocalDate.parse("2024-09-30")

  private def fresh(tag: String): (TxWarehouse, String, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "src"), wh.tablePath("d", "view"))
  }

  private def maintain(wh: TxWarehouse, src: String, view: String) =
    IncrementalAgg.maintainSumView(spark, wh, src, view,
      Seq("g"), "n_rows", Seq("sum_v" -> "v"), "ivm_t", VD)

  private def viewRows(wh: TxWarehouse, view: String): Map[String, (Long, Long)] =
    wh.read(spark, view).select("g", "n_rows", "sum_v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private def model(wh: TxWarehouse, src: String): Map[String, (Long, Long)] =
    wh.read(spark, src).groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("bootstrap equals the from-scratch aggregate; each subsequent " +
    "churn (append, predicate delete, update moving groups) converges " +
    "the view to the model") {
    val (wh, src, view) = fresh("ivm1")
    wh.append(spark, Seq(("a", 1L, D1), ("a", 2L, D1), ("b", 10L, D1))
      .toDF("g", "v", "date"), src)
    assert(maintain(wh, src, view).contains((0L, 1L)))
    assert(viewRows(wh, view) == model(wh, src))

    wh.append(spark, Seq(("b", 5L, D1), ("c", 7L, D1)).toDF("g", "v", "date"), src)
    assert(maintain(wh, src, view).contains((1L, 2L)))
    assert(viewRows(wh, view) == model(wh, src))

    wh.deleteWhere(spark, src, col("v") === 2L)
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))

    // update moves a row from group b to group a: survivors of the
    // rewritten file appear as delete+insert and must cancel
    wh.updateWhere(spark, src, col("v") === 10L, Map("g" -> lit("a")))
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))
  }

  test("exactly-once: a second maintain at the same source version is " +
    "None and leaves the view untouched (txn marker)") {
    val (wh, src, view) = fresh("ivm2")
    wh.append(spark, Seq(("a", 3L, D1)).toDF("g", "v", "date"), src)
    assert(maintain(wh, src, view).isDefined)
    val vv = wh.currentVersion(spark, view)
    assert(maintain(wh, src, view).isEmpty)
    assert(wh.currentVersion(spark, view) == vv)
  }

  test("group death: deleting a group's last row deletes its view row") {
    val (wh, src, view) = fresh("ivm3")
    wh.append(spark, Seq(("a", 1L, D1), ("b", 2L, D1)).toDF("g", "v", "date"), src)
    maintain(wh, src, view)
    wh.deleteWhere(spark, src, col("g") === "b")
    maintain(wh, src, view)
    assert(viewRows(wh, view) == Map("a" -> ((1L, 1L))))
  }

  test("streaming composition: a MemoryStream lands exactly-once via " +
    "the txn sink, maintain folds each micro-batch's delta, and a " +
    "replayed batch neither double-appends nor double-counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (wh, src, view) = fresh("ivm5")
    val mem = MemoryStream[(String, Long)]
    val sink = graft.streaming.Streams.exactlyOnceSink(wh, src, "ivm5app")
    val q = mem.toDS().toDF("g", "v")
      .withColumn("date", lit(D1))
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("ivm5-ck").toString)
      .start()
    mem.addData(("a", 1L), ("b", 2L))
    q.processAllAvailable()
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))
    mem.addData(("a", 3L))
    q.processAllAvailable()
    maintain(wh, src, view)
    q.stop()
    val converged = viewRows(wh, view)
    assert(converged == model(wh, src))
    assert(converged == Map("a" -> ((2L, 4L)), "b" -> ((1L, 2L))))
    // crash-replay simulation: re-deliver batch 1 by hand — the txn
    // watermark skips the append, so a maintain after it is a no-op
    val replay = Seq(("a", 3L)).toDF("g", "v").withColumn("date", lit(D1))
    assert(!wh.appendTxn(spark, replay, src, "ivm5app", batchId = 1L))
    assert(maintain(wh, src, view).isEmpty)
    assert(viewRows(wh, view) == converged)
  }

  test("merge-on-read retraction: a deletion-vector delete surfaces " +
    "through diffSnapshots as a changed file and the maintained view " +
    "converges to the model — no silent divergence, no group leak") {
    val (wh, src, view) = fresh("ivmdv")
    wh.append(spark, Seq(("a", 1L, D1), ("a", 2L, D1), ("b", 10L, D1),
      ("c", 5L, D1)).toDF("g", "v", "date").coalesce(1), src)
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))
    // vector-delete one of a's rows and ALL of c's (group death via DV)
    wh.deleteWhereMor(spark, src, col("v") === 2L || col("g") === "c")
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))
    assert(viewRows(wh, view) == Map("a" -> (1L, 1L), "b" -> (1L, 10L)))
    // fold the vector; the rewrite churn must net to zero delta
    wh.compact(spark, src, smallBytes = 1L): Unit
    maintain(wh, src, view)
    assert(viewRows(wh, view) == model(wh, src))
  }

  test("rewrite cancellation: compaction churn nets to zero — maintain " +
    "returns None (no merge commit), view identical") {
    val (wh, src, view) = fresh("ivm4")
    (1L to 4L).foreach { i =>
      wh.append(spark,
        Seq(("a", i, D1)).toDF("g", "v", "date").coalesce(1), src)
    }
    maintain(wh, src, view)
    val before = viewRows(wh, view)
    val vv = wh.currentVersion(spark, view)
    assert(wh.compact(spark, src)._1 == 4)
    assert(maintain(wh, src, view).isEmpty)
    assert(wh.currentVersion(spark, view) == vv)
    assert(viewRows(wh, view) == before)
  }
}
