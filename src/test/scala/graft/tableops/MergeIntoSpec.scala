package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE on the tx backend: upsert/delete semantics, file-level
  * stats pruning (untouched files survive byte-identical), logical
  * conflict detection against concurrent commits, schema evolution
  * through the merge, and the txn-marker idempotence streaming CDC
  * apply rides on.
  */
class MergeIntoSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D = java.sql.Date.valueOf("2024-09-01")

  private def base(ks: Range): DataFrame =
    ks.map(k => (k.toLong, s"v$k", D)).toDF("k", "s", "date")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("m", "t"))
  }

  private def contents(wh: TxWarehouse, path: String): Map[Long, String] =
    wh.read(spark, path).select("k", "s").as[(Long, String)].collect().toMap

  test("upsert + delete in one change set: updates replace, inserts " +
    "append, deletes remove; one commit; stats are accurate") {
    val (wh, path) = fresh("mg1")
    wh.append(spark, base(1 to 100), path) // v1
    val changes = Seq(
      (5L, "V5", D, false),   // update
      (200L, "V200", D, false), // insert
      (7L, "", D, true)       // delete
    ).toDF("k", "s", "date", "del")
    val st = wh.mergeInto(spark, changes, path, Seq("k"), Some("del"))
    assert(wh.currentVersion(spark, path) == 2L)
    assert(st.rowsUpserted == 2L && st.deleteKeys == 1L)
    val got = contents(wh, path)
    assert(got.size == 100) // 100 - 1 deleted + 1 inserted
    assert(got(5L) == "V5" && got(200L) == "V200" && !got.contains(7L))
    assert(got(6L) == "v6") // untouched row survives
  }

  test("manifest-stats pruning: a merge whose keys land in one of 8 " +
    "range-clustered files rewrites exactly that file; the other 7 " +
    "survive as the SAME physical files") {
    val (wh, path) = fresh("mg2")
    wh.append(spark,
      base(0 until 800).repartitionByRange(8, col("k")), path)
    val before = wh.partitionFiles(spark, path, D.toLocalDate).map(_._1).toSet
    assert(before.size == 8)
    // keys 10..19 sit in the first range bucket only
    val changes = (10 until 20).map(k => (k.toLong, "X", D)).toDF("k", "s", "date")
    val st = wh.mergeInto(spark, changes, path, Seq("k"))
    assert(st.filesRewritten == 1 && st.filesKept == 7,
      s"expected 1 rewritten / 7 kept, got $st")
    val after = wh.partitionFiles(spark, path, D.toLocalDate).map(_._1).toSet
    assert((before & after).size == 7, "kept files must be byte-identical (same paths)")
    val got = contents(wh, path)
    assert(got.size == 800 && got(10L) == "X" && got(9L) == "v9")
  }

  test("compound-key pruning: a low-cardinality LEADING key prunes " +
    "nothing, the trailing key's [min,max] conjunct still confines the " +
    "rewrite to the one overlapping file") {
    val (wh, path) = fresh("mgc")
    val rows = (0 until 800).map(k => ("a", k.toLong, s"v$k", D))
      .toDF("g", "k", "s", "date")
    wh.append(spark, rows.repartitionByRange(8, col("k")), path)
    val changes = (10 until 20).map(k => ("a", k.toLong, "X", D))
      .toDF("g", "k", "s", "date")
    val st = wh.mergeInto(spark, changes, path, Seq("g", "k"))
    assert(st.filesRewritten == 1 && st.filesKept == 7,
      s"trailing-key range conjunct must prune: $st")
    val got = wh.read(spark, path).select("k", "s").as[(Long, String)]
      .collect().toMap
    assert(got(10L) == "X" && got(9L) == "v9" && got.size == 800)
  }

  test("empty change set is a no-op (no commit); duplicate change keys " +
    "and a key-valued deleteCol are rejected loudly") {
    val (wh, path) = fresh("mg3")
    wh.append(spark, base(1 to 10), path)
    val v = wh.currentVersion(spark, path)
    val st = wh.mergeInto(spark, base(1 to 0), path, Seq("k"))
    assert(st.rowsWritten == 0L && wh.currentVersion(spark, path) == v)
    val dup = Seq((1L, "a", D), (1L, "b", D)).toDF("k", "s", "date")
    val e = intercept[IllegalArgumentException] {
      wh.mergeInto(spark, dup, path, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    intercept[IllegalArgumentException] {
      wh.mergeInto(spark, base(1 to 1), path, Seq("k"), deleteCol = Some("k"))
    }
  }

  test("null delete flags read as false (upsert); merge into a " +
    "not-yet-created table bootstraps it from the upsert rows") {
    val (wh, path) = fresh("mg4")
    val changes = Seq(
      (1L, "a", D, null.asInstanceOf[java.lang.Boolean]),
      (2L, "b", D, java.lang.Boolean.TRUE)
    ).toDF("k", "s", "date", "del")
    val st = wh.mergeInto(spark, changes, path, Seq("k"), Some("del"))
    assert(st.rowsUpserted == 1L && st.deleteKeys == 1L)
    assert(contents(wh, path) == Map(1L -> "a"))
    assert(wh.currentVersion(spark, path) == 1L)
  }

  test("schema evolution through the merge: changes carrying a new " +
    "column null-fill the kept base rows and evolve the recorded schema") {
    val (wh, path) = fresh("mg5")
    wh.append(spark, base(1 to 4), path)
    val changes = Seq((2L, "B", D, "en")).toDF("k", "s", "date", "lang")
    wh.mergeInto(spark, changes, path, Seq("k"))
    val got = wh.read(spark, path)
    assert(got.columns.contains("lang"))
    val langs = got.select("k", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(langs(2L).contains("en") && langs(1L).isEmpty)
  }

  test("logical conflict detection: a concurrent commit OVERLAPPING the " +
    "change keys between plan and commit throws " +
    "ConcurrentCommitException; a key-DISJOINT concurrent commit is " +
    "absorbed and both writes survive") {
    val (wh, path) = fresh("mg6")
    wh.append(spark,
      base(0 until 800).repartitionByRange(8, col("k")), path)
    val changes = Seq((10L, "X", D)).toDF("k", "s", "date")
    // overlapping racer: commits a row with the SAME key the merge is
    // changing — its file's stats contain key 10, so the plan's overlap
    // set grew and blind commit would silently shadow the racer's write.
    // (A racer on a DIFFERENT key in the same range bucket is provably
    // disjoint by ITS file stats and absorbs cleanly — that's the
    // key-level precision of the conflict check, covered below.)
    intercept[ConcurrentCommitException] {
      wh.mergeIntoHooked(spark, changes, path, Seq("k"), None,
        () => wh.append(spark, Seq((10L, "race", D)).toDF("k", "s", "date"), path))
    }
    // the retry path: a fresh plan sees the racer's file, rewrites BOTH
    // carriers of key 10, and converges to one row for the key
    val st = wh.mergeInto(spark, changes, path, Seq("k"))
    assert(st.filesRewritten >= 2)
    assert(contents(wh, path)(10L) == "X")
    assert(wh.read(spark, path).filter(col("k") === 10L).count() == 1L)
    // disjoint racer: appends key 5000 — ITS file stats prove it outside
    // the change set, so the merge absorbs it and both writes survive
    val changes2 = Seq((20L, "Y", D)).toDF("k", "s", "date")
    val st2 = wh.mergeIntoHooked(spark, changes2, path, Seq("k"), None,
      () => wh.append(spark, Seq((5000L, "far", D)).toDF("k", "s", "date"), path))
    assert(st2.rowsWritten >= 1L)
    val got = contents(wh, path)
    assert(got(20L) == "Y" && got(5000L) == "far")
    assert(got.size == 801) // 800 base + the disjoint racer's row
  }

  test("two racing merges: disjoint key ranges both land without a " +
    "conflict; overlapping merges serialize through the retry loop and " +
    "converge") {
    val (wh, path) = fresh("mgr")
    wh.append(spark,
      base(0 until 800).repartitionByRange(8, col("k")), path)
    def mergeWithRetry(changes: org.apache.spark.sql.DataFrame): MergeStats = {
      var out: Option[MergeStats] = None
      var attempts = 0
      while (out.isEmpty) {
        try out = Some(wh.mergeInto(spark, changes, path, Seq("k")))
        catch {
          case _: ConcurrentCommitException =>
            attempts += 1
            require(attempts < 20, "livelock")
        }
      }
      out.get
    }
    def race(c1: org.apache.spark.sql.DataFrame,
        c2: org.apache.spark.sql.DataFrame): Unit = {
      val t1 = new Thread(() => { mergeWithRetry(c1); () })
      val t2 = new Thread(() => { mergeWithRetry(c2); () })
      t1.start(); t2.start(); t1.join(30000); t2.join(30000)
      assert(!t1.isAlive && !t2.isAlive, "merge threads hung")
    }
    // disjoint ranges (separate range files)
    race(Seq((10L, "A", D)).toDF("k", "s", "date"),
      Seq((790L, "B", D)).toDF("k", "s", "date"))
    val g1 = contents(wh, path)
    assert(g1(10L) == "A" && g1(790L) == "B" && g1.size == 800)
    // overlapping: both touch key 50's file; retries must converge with
    // BOTH effects applied (different keys, same file)
    race(Seq((50L, "C", D)).toDF("k", "s", "date"),
      Seq((51L, "D", D)).toDF("k", "s", "date"))
    val g2 = contents(wh, path)
    assert(g2(50L) == "C" && g2(51L) == "D" && g2.size == 800)
    assert(wh.read(spark, path).groupBy("k").count()
      .filter(col("count") > 1).count() == 0L, "no duplicated keys")
  }

  test("mergeIntoTxn: a replayed micro-batch is a NO-OP (None) and the " +
    "table content is exactly-once; the next batch id applies") {
    val (wh, path) = fresh("mg7")
    wh.append(spark, base(1 to 10), path)
    val b0 = Seq((1L, "B0", D, false), (10L, "", D, true))
      .toDF("k", "s", "date", "del")
    val r1 = wh.mergeIntoTxn(spark, b0, path, Seq("k"), Some("del"), "cdc", 0L)
    assert(r1.nonEmpty)
    val snap = contents(wh, path)
    assert(snap(1L) == "B0" && !snap.contains(10L))
    val v = wh.currentVersion(spark, path)
    // restart replays batch 0: must skip without writing
    val r2 = wh.mergeIntoTxn(spark, b0, path, Seq("k"), Some("del"), "cdc", 0L)
    assert(r2.isEmpty && wh.currentVersion(spark, path) == v)
    assert(contents(wh, path) == snap)
    // batch 1 applies on top
    val b1 = Seq((2L, "B1", D, false)).toDF("k", "s", "date", "del")
    assert(wh.mergeIntoTxn(spark, b1, path, Seq("k"), Some("del"), "cdc", 1L).nonEmpty)
    assert(contents(wh, path)(2L) == "B1")
    assert(wh.lastTxn(spark, path, "cdc") == 1L)
  }

  test("rowDiff: one row per changed key (insert/update/delete), " +
    "survivors re-landed by the rewrite drop out, and an added all-null " +
    "evolved column does not flag them") {
    val (wh, path) = fresh("mgd")
    wh.append(spark,
      base(0 until 100).repartitionByRange(4, col("k")), path) // v1
    // changes carry a NEW column: update 3, delete 7, insert 200
    val changes = Seq(
      (3L, "X", D, "en", false),
      (7L, "", D, null.asInstanceOf[String], true),
      (200L, "new", D, "de", false)
    ).toDF("k", "s", "date", "lang", "del")
    wh.mergeInto(spark, changes, path, Seq("k"), Some("del")) // v2
    val diff = wh.rowDiff(spark, path, 1L, 2L, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(diff == Map(3L -> "update", 7L -> "delete", 200L -> "insert"),
      s"got $diff")
    // empty diff: same version on both sides
    assert(wh.rowDiff(spark, path, 2L, 2L, Seq("k")).count() == 0L)
  }

  test("rowDiff no-churn: table-typed key schema, analysis error on a " +
    "misspelled key, string-typed degrade only on a truly empty table") {
    val (wh, path) = fresh("mgd2")
    wh.append(spark, base(0 until 10), path) // v1
    val noChurn = wh.rowDiff(spark, path, 1L, 1L, Seq("k"))
    assert(noChurn.count() == 0L)
    assert(noChurn.schema.fieldNames.toSeq == Seq("k", "_change_type"))
    // key typed AS IN THE TABLE, exactly like the churn path — not the
    // string fallback (round-11 regression: a swallowed analysis error
    // silently degraded every no-churn diff to string keys)
    assert(noChurn.schema("k").dataType ==
      org.apache.spark.sql.types.LongType, noChurn.schema.treeString)
    // a misspelled key on a NON-empty table must raise like the churn
    // path would, not silently return a string-typed empty frame
    intercept[org.apache.spark.sql.AnalysisException] {
      wh.rowDiff(spark, path, 1L, 1L, Seq("no_such_col"))
    }
    // truly empty table (no commits): no schema exists anywhere — the
    // documented string-typed degrade applies
    val (whE, pathE) = fresh("mgd2e")
    val empty = whE.rowDiff(spark, pathE, 0L, 0L, Seq("k"))
    assert(empty.count() == 0L)
    assert(empty.schema("k").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("writeData restores spark.sql.parquet.outputTimestampType: a " +
    "caller's preset value survives the append, and the default is " +
    "back after an append with nothing preset") {
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.get(key) // registered conf: default INT96
    try {
      spark.conf.set(key, "TIMESTAMP_MILLIS")
      val (wh, path) = fresh("mgc")
      wh.append(spark, base(0 until 5), path)
      assert(spark.conf.get(key) == "TIMESTAMP_MILLIS",
        "warehouse write must not leak its TIMESTAMP_MICROS override")
      spark.conf.unset(key)
      wh.append(spark, base(5 until 10), path)
      assert(spark.conf.get(key) == before,
        "with nothing preset the default must be back after the write")
      // OVERLAPPING warehouse writes must not corrupt each other's
      // save/restore (the naive pair leaked MICROS: writer 2 "saved"
      // writer 1's override and restored it as the caller's value)
      val (whB, pathB) = fresh("mgc2")
      val threads = (0 until 4).map { i =>
        new Thread(() =>
          whB.append(spark, base(i * 10 until i * 10 + 10), pathB))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(spark.conf.get(key) == before,
        "concurrent warehouse writes leaked the MICROS override")
      assert(whB.read(spark, pathB).count() == 40L)
    } finally spark.conf.unset(key)
  }

  test("fastPartitionRowCounts: an unparsable manifest date degrades " +
    "the whole per-partition fast path to None (recount) instead of " +
    "silently dropping the file from the sums") {
    val (wh, path) = fresh("mgfbad")
    wh.append(spark, base(0 until 10), path) // v1
    assert(wh.fastPartitionRowCounts(spark, path).nonEmpty)
    // forge v2: a live file under an unparsable date string, carrying a
    // valid stats payload (reused from v1's commit) so ONLY the date is
    // at fault
    val logDir = java.nio.file.Paths.get(path, "_graft_log")
    val v1 = java.nio.file.Files.readString(
      logDir.resolve(f"v${1L}%020d.txt"))
    val sPayload = v1.linesIterator.find(_.startsWith("S "))
      .map(_.substring(2).split(" ")(0)).get
    java.nio.file.Files.writeString(logDir.resolve(f"v${2L}%020d.txt"),
      s"A not-a-date forged.parquet\nS $sPayload forged.parquet\nE\n")
    assert(wh.fastPartitionRowCounts(spark, path).isEmpty,
      "an unparsable date must degrade the fast path, not drop the file")
    // the total (date-free) fast count still works: every live file has
    // stats
    assert(wh.fastRowCount(spark, path).nonEmpty)
  }

  test("replay cache stays coherent: a commit through ANOTHER warehouse " +
    "handle is visible to a handle that already cached the prior " +
    "version, and time travel across cached versions resolves each " +
    "version's own state") {
    val (whA, path) = fresh("mgrc")
    whA.append(spark, base(0 until 10), path) // v1
    // populate A's cache at v1, twice (second read is the cache hit)
    assert(whA.read(spark, path).count() == 10L)
    assert(whA.read(spark, path).count() == 10L)
    // an independent handle on the same root commits v2
    val whB = new TxWarehouse(whA.root)
    whB.append(spark, base(10 until 25), path) // v2
    // A's next read must see v2 — the per-call log listing is the
    // invalidation check; the (path, version) cache key must not pin v1
    assert(whA.read(spark, path).count() == 25L)
    assert(whA.currentVersion(spark, path) == 2L)
    // time travel back to v1 through the SAME handle that has both
    // versions cached: distinct keys, distinct states
    assert(whA.readAt(spark, path, 1L).count() == 10L)
    assert(whA.readAt(spark, path, 2L).count() == 25L)
    // merge through B (rewrites files), then A again — no stale file list
    val changes = Seq((3L, "X", D, true)).toDF("k", "s", "date", "del")
    whB.mergeInto(spark, changes, path, Seq("k"), Some("del")) // v3
    assert(whA.read(spark, path).count() == 24L)
  }

  test("fastRowCount: exact counts from the manifest alone, tracking " +
    "appends, merges and deletes without a data read") {
    val (wh, path) = fresh("mgf")
    wh.append(spark, base(0 until 100).repartitionByRange(4, col("k")), path)
    assert(wh.fastRowCount(spark, path).contains(100L))
    val changes = Seq((3L, "X", D, false), (7L, "", D, true),
      (200L, "n", D, false)).toDF("k", "s", "date", "del")
    wh.mergeInto(spark, changes, path, Seq("k"), Some("del"))
    assert(wh.fastRowCount(spark, path).contains(100L)) // -1 del +1 ins
    assert(wh.fastRowCount(spark, path).get ==
      wh.read(spark, path).count())
    wh.deletePartition(spark, path, D.toLocalDate)
    assert(wh.fastRowCount(spark, path).contains(0L))
    // per-partition form agrees
    val (wh2, path2) = fresh("mgf2")
    wh2.append(spark, base(0 until 10), path2)
    wh2.append(spark,
      (0 until 5).map(k => (k + 100L, "b", java.sql.Date.valueOf("2024-09-02")))
        .toDF("k", "s", "date"), path2)
    assert(wh2.fastPartitionRowCounts(spark, path2).contains(Map(
      D.toLocalDate -> 10L,
      java.time.LocalDate.parse("2024-09-02") -> 5L)))
  }

  test("AS OF TIMESTAMP: versionAt resolves from commit mtimes, " +
    "readAsOf replays the snapshot, pre-table instants are None") {
    val (wh, path) = fresh("mgt")
    val t0 = System.currentTimeMillis() - 5000
    wh.append(spark, base(1 to 10), path) // v1
    Thread.sleep(1100)
    val t1 = System.currentTimeMillis()
    Thread.sleep(1100)
    wh.append(spark, base(11 to 20), path) // v2
    assert(wh.versionAt(spark, path, t0).isEmpty)
    intercept[IllegalArgumentException] { wh.readAsOf(spark, path, t0) }
    assert(wh.versionAt(spark, path, t1).contains(1L))
    assert(wh.readAsOf(spark, path, t1).count() == 10L)
    assert(wh.versionAt(spark, path, System.currentTimeMillis())
      .contains(2L))
    assert(wh.readAsOf(spark, path, System.currentTimeMillis()).count() == 20L)
  }

  test("time travel and the change feed see through the merge: readAt " +
    "resurrects the pre-merge snapshot; diffSnapshots reports the " +
    "rewrite file-granular") {
    val (wh, path) = fresh("mg8")
    wh.append(spark,
      base(0 until 100).repartitionByRange(4, col("k")), path) // v1
    val changes = Seq((3L, "X", D, false), (7L, "", D, true))
      .toDF("k", "s", "date", "del")
    wh.mergeInto(spark, changes, path, Seq("k"), Some("del")) // v2
    val v1 = wh.readAt(spark, path, 1L).select("k", "s")
      .as[(Long, String)].collect().toMap
    assert(v1(3L) == "v3" && v1.contains(7L)) // pre-merge state intact
    val diff = wh.diffSnapshots(spark, path, 1L, 2L)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    // one of four range files rewritten: its rows delete+reinsert
    assert(diff("delete") == 25L && diff("insert") == 24L)
  }
}
