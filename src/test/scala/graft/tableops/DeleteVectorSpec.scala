package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors: O(deleted rows) predicate DELETE
  * whose positions ride `D` manifest lines and are subtracted at every
  * read path — plus folding by compaction, time travel/restore/clone
  * semantics, fast-count exactness, CDC visibility, and the
  * cumulative-vector commit discipline.
  */
class DeleteVectorSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")
  private val D2 = java.sql.Date.valueOf("2024-09-02")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  private def rows(wh: TxWarehouse, path: String): Set[(Long, String)] =
    wh.read(spark, path).select("k", "s").as[(Long, String)].collect().toSet

  test("codec: round-trip, cardinality, merge, malformed rejection") {
    val ps = Array(0L, 1L, 7L, 128L, 129L, 1000000L, 1000001L)
    val enc = FileDv.encode(ps)
    assert(!enc.contains(" "))
    assert(FileDv.decode(enc).toSeq == ps.toSeq)
    assert(FileDv.cardinality(enc) == ps.length.toLong)
    assert(FileDv.decode(FileDv.merge(Some(enc), Array(5L, 128L))).toSeq ==
      (ps.toSeq :+ 5L).sorted)
    intercept[IllegalArgumentException](FileDv.encode(Array.empty[Long]))
    intercept[IllegalArgumentException](FileDv.encode(Array(3L, 2L)))
  }

  test("MoR delete removes rows from every read path without touching " +
    "a data file; NULL predicate keeps (SQL semantics); count returned") {
    val (wh, path) = fresh("dv1")
    wh.append(spark, Seq(
      (1L, "keep", D1), (2L, "drop", D1), (3L, "keep", D2),
      (4L, "drop", D2), (5L, null.asInstanceOf[String], D2)
    ).toDF("k", "s", "date"), path)
    val before = wh.read(spark, path).inputFiles.toSet
    assert(wh.deleteWhereMor(spark, path, col("s") === "drop") == 2L)
    // zero rewrite: identical physical file set
    assert(wh.read(spark, path).inputFiles.toSet == before)
    assert(rows(wh, path) == Set((1L, "keep"), (3L, "keep"),
      (5L, null.asInstanceOf[String])))
    // readWhere both on a prunable predicate and the evolved-fallback path
    assert(wh.readWhere(spark, path, col("k") >= 1L)
      .select("k").as[Long].collect().toSet == Set(1L, 3L, 5L))
    assert(wh.readPartition(spark, path, D1.toLocalDate)
      .select("k").as[Long].collect().toSet == Set(1L))
    // relation surface honors the vector too
    assert(wh.readRelation(spark, path)
      .select("k").as[Long].collect().toSet == Set(1L, 3L, 5L))
    // idempotent re-run: nothing matches, no commit
    val v = wh.currentVersion(spark, path)
    assert(wh.deleteWhereMor(spark, path, col("s") === "drop") == 0L)
    assert(wh.currentVersion(spark, path) == v)
  }

  test("vectors are CUMULATIVE per file: a second delete unions with " +
    "the first; fast row counts subtract exactly; column stats degrade") {
    val (wh, path) = fresh("dv2")
    wh.append(spark, (1L to 100L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    assert(wh.fastRowCount(spark, path).contains(100L))
    assert(wh.deleteWhereMor(spark, path, col("k") % 10 === 0L) == 10L)
    assert(wh.deleteWhereMor(spark, path, col("k") % 7 === 0L) == 13L)
    // 10 multiples of 10, 14 of 7, minus 70 counted once = 23 deleted
    assert(rows(wh, path).size == 77)
    assert(wh.fastRowCount(spark, path).contains(77L))
    assert(wh.fastPartitionRowCounts(spark, path)
      .contains(Map(D1.toLocalDate -> 77L)))
    // min/max can no longer be proven from footers: degrade, never lie
    assert(wh.fastColumnStats(spark, path, "k").isEmpty)
    assert(wh.deletionVectorStats(spark, path).values.sum == 23L)
  }

  test("time travel reads rows back below the delete; RESTORE rolls the " +
    "vector back; clone carries it") {
    val (wh, path) = fresh("dv3")
    wh.append(spark, Seq((1L, "a", D1), (2L, "gone", D1))
      .toDF("k", "s", "date"), path)
    val v1 = wh.currentVersion(spark, path)
    wh.deleteWhereMor(spark, path, col("s") === "gone")
    assert(rows(wh, path) == Set((1L, "a")))
    assert(wh.readAt(spark, path, v1).select("k").as[Long]
      .collect().toSet == Set(1L, 2L))
    // clone AT the deleted version sees the vector
    val dest = Files.createTempDirectory("graft-dv3c").toString + "/d/t"
    wh.cloneTo(spark, path, dest)
    assert(wh.read(spark, dest).select("k").as[Long]
      .collect().toSet == Set(1L))
    // restore below the delete: the row is back (D - line), and a
    // second restore forward is not needed for reads to be consistent
    wh.restoreTo(spark, path, v1)
    assert(rows(wh, path) == Set((1L, "a"), (2L, "gone")))
  }

  test("rowDiff reports a MoR delete as 'delete' even though no file " +
    "membership changed; survivors cancel") {
    val (wh, path) = fresh("dv4")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D1), (3L, "c", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    val v1 = wh.currentVersion(spark, path)
    wh.deleteWhereMor(spark, path, col("k") === 2L)
    val v2 = wh.currentVersion(spark, path)
    val d = wh.rowDiff(spark, path, v1, v2, Seq("k"))
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    assert(d == Set((2L, "delete")))
    // diffSnapshots: deleted row appears only on the delete side
    val ds = wh.diffSnapshots(spark, path, v1, v2)
      .groupBy(col("_change_type")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(ds == Map("insert" -> 2L, "delete" -> 3L))
  }

  test("compaction folds the vector into data bytes: the DV'd file " +
    "qualifies regardless of size, rows are unchanged, debt drops to 0") {
    val (wh, path) = fresh("dv5")
    wh.append(spark, (1L to 50L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.deleteWhereMor(spark, path, col("k") <= 5L)
    assert(wh.deletionVectorStats(spark, path).nonEmpty)
    val expected = rows(wh, path)
    // smallBytes=1: nothing qualifies by size — only the DV rule fires
    val (retired, added) = wh.compact(spark, path, smallBytes = 1L)
    assert(retired == 1 && added >= 1)
    assert(wh.deletionVectorStats(spark, path).isEmpty)
    assert(rows(wh, path) == expected)
    assert(wh.fastColumnStats(spark, path, "k").map(_.min).contains(Some(6L)))
  }

  test("CoW DML and merge on a vectored file honor the vector (no " +
    "resurrection) and retire it with the rewrite") {
    val (wh, path) = fresh("dv6")
    wh.append(spark, Seq((1L, "a", D1), (2L, "b", D1), (3L, "x", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.deleteWhereMor(spark, path, col("k") === 1L)
    // CoW update touches the file: must rewrite only live rows
    assert(wh.updateWhere(spark, path, col("s") === "x",
      Map("s" -> lit("y"))) == 1L)
    assert(wh.deletionVectorStats(spark, path).isEmpty)
    assert(rows(wh, path) == Set((2L, "b"), (3L, "y")))
    // merge upsert over a fresh vectored file
    wh.deleteWhereMor(spark, path, col("k") === 2L)
    wh.mergeInto(spark, Seq((4L, "new", D1)).toDF("k", "s", "date"),
      path, Seq("k"))
    assert(rows(wh, path) == Set((3L, "y"), (4L, "new")))
  }

  test("keyed MoR delete: a key frame deletes by id without rewriting, " +
    "prunes candidates by key range, merges with existing vectors, and " +
    "composes with bloom skipping") {
    val (wh, path) = fresh("dvk1")
    wh.setBloomFilter(spark, path, "k", 1000, 0.01)
    // two files with disjoint key ranges
    wh.append(spark, (1L to 100L).map(k => (k, s"v$k", D1))
      .toDF("k", "s", "date").coalesce(1), path)
    wh.append(spark, (1000L to 1100L).map(k => (k, s"v$k", D2))
      .toDF("k", "s", "date").coalesce(1), path)
    val before = wh.read(spark, path).inputFiles.toSet
    // keys hitting only the first file, one absent key
    val n = wh.deleteKeysMor(spark,
      Seq(5L, 7L, 50L, 999999L).toDF("k"), path, Seq("k"))
    assert(n == 3L)
    assert(wh.read(spark, path).inputFiles.toSet == before)
    assert(wh.fastRowCount(spark, path).contains(198L))
    // second keyed delete on the same file merges vectors
    assert(wh.deleteKeysMor(spark, Seq(5L, 9L).toDF("k"), path,
      Seq("k")) == 1L) // 5 already gone
    assert(wh.read(spark, path).filter(col("k") < 1000L).count() == 96L)
    // empty key frame: no-op, no commit
    val v = wh.currentVersion(spark, path)
    assert(wh.deleteKeysMor(spark, Seq.empty[Long].toDF("k"), path,
      Seq("k")) == 0L)
    assert(wh.currentVersion(spark, path) == v)
  }

  test("guard: a delete bigger than maxDeleteRows refuses with a " +
    "pointer at the CoW path instead of collecting the table") {
    val (wh, path) = fresh("dv7")
    wh.append(spark, (1L to 100L).map(k => (k, "d", D1))
      .toDF("k", "s", "date"), path)
    val e = intercept[IllegalArgumentException](
      wh.deleteWhereMor(spark, path, col("s") === "d", maxDeleteRows = 10L))
    assert(e.getMessage.contains("deleteWhere"))
    assert(rows(wh, path).size == 100)
  }

  test("checkpoint round-trips vectors: state replayed from a " +
    "checkpoint seed still subtracts them") {
    val (wh0, _) = fresh("dv8")
    val wh = new TxWarehouse(wh0.root, checkpointEvery = 2)
    val path = wh.tablePath("d", "t")
    wh.append(spark, Seq((1L, "a", D1), (2L, "gone", D1))
      .toDF("k", "s", "date"), path) // v1
    wh.deleteWhereMor(spark, path, col("s") === "gone") // v2 -> checkpoint
    // a FRESH handle replays from the checkpoint file
    val wh2 = new TxWarehouse(wh0.root)
    assert(wh2.read(spark, path).select("k").as[Long]
      .collect().toSet == Set(1L))
    assert(wh2.fastRowCount(spark, path).contains(1L))
  }
}
