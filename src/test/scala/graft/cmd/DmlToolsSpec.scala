package graft.cmd

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The new DML/DDL ops CLIs end-to-end through their main()s (the
  * underlying APIs carry their own specs; this pins the argv parsing
  * and wiring — SQL predicate strings, col=expr SET clauses, the
  * metadata-only rename path).
  */
class DmlToolsSpec extends graft.SparkTestBase {
  import spark.implicits._

  private val D1 = java.sql.Date.valueOf("2024-09-01")

  private def fresh(tag: String): (graft.tableops.TxWarehouse, String) = {
    val root = Files.createTempDirectory(s"graft-$tag").toString
    val wh = new graft.tableops.TxWarehouse(root)
    wh.append(spark, Seq(
      (1L, "keep", 10L, D1), (2L, "drop", 20L, D1), (3L, "bump", 30L, D1)
    ).toDF("k", "s", "v", "date"), wh.tablePath("d", "t"))
    (wh, root)
  }

  test("DeleteWhereTool: SQL predicate string deletes the matching rows") {
    val (wh, root) = fresh("dtool")
    DeleteWhereTool.main(Array(root, "d", "t", "s = 'drop'"))
    assert(wh.read(spark, wh.tablePath("d", "t"))
      .select("k").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("UpdateWhereTool: col=expr SET clauses apply with old-row scope") {
    val (wh, root) = fresh("utool")
    UpdateWhereTool.main(Array(root, "d", "t", "s = 'bump'",
      "v=v + 5,s='bumped'"))
    val got = wh.read(spark, wh.tablePath("d", "t"))
      .filter(col("k") === 3L).select("s", "v")
      .as[(String, Long)].head()
    assert(got == (("bumped", 35L)))
  }

  test("CloneTool: argv fork at a version, fully isolated from source") {
    val (wh, root) = fresh("ctool")
    val tbl = wh.tablePath("d", "t")
    DeleteWhereTool.main(Array(root, "d", "t", "s = 'drop'")) // v2
    CloneTool.main(Array(root, "d", "t", "d", "t2", "1"))
    val fork = wh.tablePath("d", "t2")
    assert(wh.read(spark, fork).count() == 3L, "fork is the v1 snapshot")
    UpdateWhereTool.main(Array(root, "d", "t2", "k = 1", "s='forked'"))
    assert(wh.read(spark, tbl).filter(col("s") === "forked").count() == 0)
  }

  test("RestoreTool: version argv restores the pre-DML snapshot") {
    val (wh, root) = fresh("restool")
    val tbl = wh.tablePath("d", "t")
    val want = wh.read(spark, tbl).select("k").as[Long].collect().toSet
    DeleteWhereTool.main(Array(root, "d", "t", "k > 0"))
    assert(wh.read(spark, tbl).count() == 0)
    RestoreTool.main(Array(root, "d", "t", "1"))
    assert(wh.read(spark, tbl).select("k").as[Long].collect().toSet == want)
  }

  test("Rename/DropColumnTool: metadata-only evolution through argv") {
    val (wh, root) = fresh("rtool")
    val tbl = wh.tablePath("d", "t")
    val files = wh.read(spark, tbl).inputFiles.toSet
    RenameColumnTool.main(Array(root, "d", "t", "v", "value"))
    DropColumnTool.main(Array(root, "d", "t", "s"))
    val df = wh.read(spark, tbl)
    assert(df.columns.toSet == Set("k", "value", "date"))
    assert(df.inputFiles.toSet == files, "no data file may be rewritten")
    assert(df.select("value").as[Long].collect().toSet == Set(10L, 20L, 30L))
  }
}
