package graft.tableops

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Zero-rewrite rename/drop via column mapping: metadata-only (files
  * byte-identical), logical reads/writes after a rename, rename
  * chains, time-travel-correct names, stats pruning surviving the
  * rename, tombstone semantics for drop, and the DML surface
  * (deleteWhere/merge/IVM) working on renamed columns.
  */
class ColumnMappingSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")

  private def fresh(tag: String): (TxWarehouse, String) = {
    val wh = new TxWarehouse(Files.createTempDirectory(s"graft-$tag").toString)
    (wh, wh.tablePath("d", "t"))
  }

  test("rename is metadata-only: same physical files before and after; " +
    "reads show the new name; old name gone") {
    val (wh, path) = fresh("cm1")
    wh.append(spark, Seq((1L, "x", D1)).toDF("k", "s", "date"), path)
    val before = wh.read(spark, path).inputFiles.toSet
    wh.renameColumn(spark, path, "s", "label")
    val df = wh.read(spark, path)
    assert(df.inputFiles.toSet == before, "no file may be rewritten")
    assert(df.columns.toSet == Set("k", "label", "date"))
    assert(df.select("label").as[String].head() == "x")
  }

  test("writes after a rename use the logical name and land under the " +
    "physical one — old and new files merge into one logical view") {
    val (wh, path) = fresh("cm2")
    wh.append(spark, Seq((1L, 10L, D1)).toDF("k", "v", "date"), path)
    wh.renameColumn(spark, path, "v", "value")
    wh.append(spark, Seq((2L, 20L, D1)).toDF("k", "value", "date"), path)
    assert(wh.read(spark, path).select("k", "value")
      .as[(Long, Long)].collect().toSet == Set((1L, 10L), (2L, 20L)))
    // both files physically carry `v`
    val phys = spark.read.parquet(wh.read(spark, path).inputFiles: _*)
    assert(phys.columns.contains("v") && !phys.columns.contains("value"))
  }

  test("rename chain a->b->c resolves; renaming to a live name or a " +
    "missing source rejects") {
    val (wh, path) = fresh("cm3")
    wh.append(spark, Seq((1L, 5L, D1)).toDF("a", "k", "date"), path)
    wh.renameColumn(spark, path, "a", "b")
    wh.renameColumn(spark, path, "b", "c")
    assert(wh.read(spark, path).columns.toSet == Set("c", "k", "date"))
    assert(wh.read(spark, path).select("c").as[Long].head() == 1L)
    intercept[IllegalArgumentException] {
      wh.renameColumn(spark, path, "c", "k") // live target
    }
    intercept[IllegalArgumentException] {
      wh.renameColumn(spark, path, "b", "z") // b no longer exists
    }
  }

  test("time travel shows each version under its then-current names") {
    val (wh, path) = fresh("cm4")
    wh.append(spark, Seq((1L, "x", D1)).toDF("k", "s", "date"), path)
    val v1 = wh.currentVersion(spark, path)
    wh.renameColumn(spark, path, "s", "label")
    assert(wh.readAt(spark, path, v1).columns.contains("s"))
    assert(!wh.readAt(spark, path, v1).columns.contains("label"))
    assert(wh.read(spark, path).columns.contains("label"))
  }

  test("stats pruning survives the rename: a point readWhere on the " +
    "NEW name still opens only the matching file") {
    val (wh, path) = fresh("cm5")
    wh.append(spark, (1L to 50L).map(k => (k, D1)).toDF("k", "date")
      .coalesce(1), path)
    wh.append(spark, (1000L to 1050L).map(k => (k, D1)).toDF("k", "date")
      .coalesce(1), path)
    wh.renameColumn(spark, path, "k", "key")
    val probed = wh.readWhere(spark, path, col("key") === 1010L)
    assert(probed.inputFiles.length == 1, "stats must prune under rename")
    assert(probed.count() == 1)
  }

  test("drop tombstones: column hidden now, visible via time travel, " +
    "re-introducing the name rejected, dropping date rejected") {
    val (wh, path) = fresh("cm6")
    wh.append(spark, Seq((1L, "secret", D1)).toDF("k", "s", "date"), path)
    val v1 = wh.currentVersion(spark, path)
    wh.dropColumn(spark, path, "s")
    assert(wh.read(spark, path).columns.toSet == Set("k", "date"))
    assert(wh.readAt(spark, path, v1).columns.contains("s"))
    intercept[IllegalArgumentException] {
      wh.append(spark, Seq((2L, "again", D1)).toDF("k", "s", "date"), path)
    }
    intercept[IllegalArgumentException] {
      wh.dropColumn(spark, path, "date")
    }
  }

  test("drop of a RENAMED column tombstones its physical name") {
    val (wh, path) = fresh("cm7")
    wh.append(spark, Seq((1L, 7L, D1)).toDF("k", "v", "date"), path)
    wh.renameColumn(spark, path, "v", "value")
    wh.dropColumn(spark, path, "value")
    assert(wh.read(spark, path).columns.toSet == Set("k", "date"))
    // neither the logical nor the physical name may return
    intercept[IllegalArgumentException] {
      wh.append(spark, Seq((2L, 8L, D1)).toDF("k", "v", "date"), path)
    }
  }

  test("DML on renamed columns: deleteWhere and IVM operate on the " +
    "logical name end-to-end") {
    val (wh, path) = fresh("cm8")
    wh.append(spark, Seq((1L, "keep", D1), (2L, "drop", D1))
      .toDF("k", "status", "date"), path)
    wh.renameColumn(spark, path, "status", "st")
    assert(wh.deleteWhere(spark, path, col("st") === "drop") == 1L)
    assert(wh.read(spark, path).select("k", "st")
      .as[(Long, String)].collect().toSet == Set((1L, "keep")))
    // IVM over the renamed group column
    val view = wh.tablePath("d", "v")
    IncrementalAgg.maintainSumView(spark, wh, path, view, Seq("st"),
      "n_rows", Seq("sum_k" -> "k"), "ivm_cm", D1.toLocalDate)
    assert(wh.read(spark, view).select("st", "n_rows", "sum_k")
      .as[(String, Long, Long)].collect().toSet == Set(("keep", 1L, 1L)))
  }

  test("CHECK constraint guard: renaming a constrained column rejects " +
    "until the constraint is dropped") {
    val (wh, path) = fresh("cm9")
    wh.append(spark, Seq((1L, 5L, D1)).toDF("k", "v", "date"), path)
    wh.addCheckConstraint(spark, path, "pos", "v > 0")
    intercept[IllegalArgumentException] {
      wh.renameColumn(spark, path, "v", "value")
    }
    wh.dropCheckConstraint(spark, path, "pos")
    wh.renameColumn(spark, path, "v", "value")
    assert(wh.read(spark, path).columns.contains("value"))
  }
}
