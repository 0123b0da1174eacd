package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.cmd.Gardener
import graft.gardenerops.{Action, Monitor}
import graft.model._
import graft.persistence.MemorySaver
import graft.tableops.{ConcurrentCommitException, RacingOverwriteWarehouse, TxWarehouse}
import graft.tracker.Tracker

/** The tx backend's conflict typing end-to-end through the monitor
  * (VERDICT r8 #1): a write-write conflict detected at commit time must
  * reach the gardener's Outcome mapping as the DEDICATED
  * ConcurrentCommitException and land in Retry (stay in state, backoff,
  * re-run against fresh state) — never terminal Failed, which would park
  * the job until the historical re-sweep.
  */
class ConflictOutcomeSpec extends SparkTestBase {
  import spark.implicits._

  private def until(m: Monitor, timeoutMs: Long = 30000)(p: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!p && System.currentTimeMillis() < deadline) {
      m.tick(); Thread.sleep(10)
    }
    p
  }

  test("copyToRaw losing a tx commit race maps to Retry, stays in state, " +
    "and drains on the re-run — never Failed") {
    val root = Files.createTempDirectory("graft-race").toString
    val date = LocalDate.parse("2024-05-01")
    val d = java.sql.Date.valueOf(date)
    // the "other driver": commits a row for the same raw date between
    // this driver's planning read and its commit
    val wh = new RacingOverwriteWarehouse(root,
      _.endsWith("/raw_exp/ndt7"), (_, _) => {
        val other = new TxWarehouse(root)
        other.append(spark, Seq(("zz", d, 99L)).toDF("id", "date", "v"),
          other.tablePath("raw_exp", "ndt7"))
      })
    // tmp already loaded+deduped for the date
    wh.append(spark, Seq(("m1", d, 1L), ("m2", d, 2L)).toDF("id", "date", "v"),
      wh.tablePath("tmp_exp", "ndt7"))

    var now = 0L
    val tk = new Tracker(new MemorySaver, clock = () => now)
    val copy = Gardener.tableAction(spark, wh)(ops => { ops.copyToRaw(); () })
    val m = new Monitor(tk,
      Seq(Action.unconditional(State.Copying, copy, State.Deleting)),
      retryMillis = 1000, clock = () => now)
    val j = Job("b", "exp", "ndt7", date,
      datasets = Datasets("tmp_exp", "raw_exp", ""))
    tk.addJob(j)
    tk.setStatus(j.key, State.Copying)

    // first attempt: the race fires, the commit conflicts, the outcome is
    // Retry — the job STAYS in Copying with a retrying detail
    assert(until(m) {
      tk.getState().get(j.key).exists(_._2.detail.startsWith("retrying:"))
    })
    assert(tk.getState()(j.key)._2.state == State.Copying)
    assert(wh.conflicts.get() == 1)

    // past the backoff, the re-run sees fresh state and succeeds
    now += 2000
    assert(until(m) {
      tk.getState().get(j.key).exists(_._2.state == State.Deleting)
    })
    // the job's history never touched Failed
    assert(!tk.getState()(j.key)._2.history.exists(_.state == State.Failed))
    // replace semantics converged: raw's date partition equals tmp's
    // (the racer's row was superseded by the retried copy)
    val raw = wh.readPartition(spark, wh.tablePath("raw_exp", "ndt7"), date)
    assert(raw.select("id").as[String].collect().toSet == Set("m1", "m2"))
  }

  test("a lease-takeover duplicate load commits exactly once: the tx " +
    "append is txn-fenced on the entry version") {
    val root = Files.createTempDirectory("graft-race3").toString
    val src = Files.createTempDirectory("graft-race3-src")
    java.nio.file.Files.write(src.resolve("part.json"), java.util.List.of(
      """{"id":"m1","date":"2024-05-03","parser":{"Time":"2024-05-03T10:00:00Z"},"val":1}""",
      """{"id":"m2","date":"2024-05-03","parser":{"Time":"2024-05-03T11:00:00Z"},"val":2}"""))
    val wh = new TxWarehouse(root)
    val date = LocalDate.parse("2024-05-03")
    val job = Job("b", "exp", "ndt7", date,
      datasets = Datasets("tmp_exp", "raw_exp", ""))
    val glob = s"$src/*.json"
    // the takeover shape: two drivers run the SAME load concurrently —
    // both capture the same tmp-table entry version before either
    // commits, so exactly one append may win
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => stats.add(
        new graft.tableops.TableOps(spark, job, wh).loadToTmp(glob).rowsOut))
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    val tmpPath = wh.tablePath("tmp_exp", "ndt7")
    assert(wh.readPartition(spark, tmpPath, date).count() == 2,
      s"duplicate load doubled the partition (stats: ${stats.toArray.toSeq})")
    assert(stats.toArray.toSeq.map(_.asInstanceOf[Long]).sorted == Seq(0L, 2L))
    // a legitimate redo after deleteTmp observes a later version and loads
    val ops = new graft.tableops.TableOps(spark, job, wh)
    ops.deleteTmp()
    assert(ops.loadToTmp(glob).rowsOut == 2L)
    assert(wh.readPartition(spark, tmpPath, date).count() == 2)
  }

  test("publish-time conflicts carry the dedicated retryable type " +
    "(commitReplace throws ConcurrentCommitException, not a generic CME)") {
    val root = Files.createTempDirectory("graft-race2").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    val d = java.sql.Date.valueOf("2024-05-02")
    wh.append(spark, Seq((1L, d)).toDF("v", "date"), path)
    val (_, token) = wh.stageSelfReplace(spark,
      Seq((10L, d)).toDF("v", "date"), path, LocalDate.parse("2024-05-02"))
    wh.append(spark, Seq((2L, d)).toDF("v", "date"), path)
    intercept[ConcurrentCommitException] {
      wh.publishSelfReplace(spark, path, LocalDate.parse("2024-05-02"), token)
    }
  }
}
