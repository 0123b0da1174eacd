package graft

import java.nio.file.{Files, Path}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.model.{Datasets, Job}
import graft.tableops.{TableOps, TxWarehouse, Warehouse}

/** End-to-end slice (SURVEY.md §7.2): JSONL fixture → loadToTmp → dedup →
  * copyToRaw → deleteTmp → join, asserting the reference's partition-grain
  * semantics — parameterized over BOTH warehouse backends (plain
  * partitioned parquet with JVM locks, and the transactional manifest-log
  * format), which must be behaviorally identical through the whole
  * pipeline. Backend-specific crash semantics get their own tests at the
  * bottom.
  */
class TableOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeJsonl(dir: Path, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.asJava)
  }

  private def mkJob(root: String, datatype: String, date: String, join: String = "joined") =
    Job("bucket", "exp", datatype, LocalDate.parse(date),
      datasets = Datasets(tmp = "tmp_exp", raw = "raw_exp", join = join))

  private val backends: Seq[(String, String => Warehouse)] = Seq(
    "path" -> (root => Warehouse(root)),
    "tx" -> (root => new TxWarehouse(root)))

  for ((backend, mkWh) <- backends) {

    test(s"[$backend] full pipeline: load, dedup (ties survive), copy, delete, join") {
      val root = Files.createTempDirectory("graft-wh").toString
      val src = Files.createTempDirectory("graft-src")
      val wh = mkWh(root)
      def table(ds: String, dt: String) = wh.read(spark, wh.tablePath(ds, dt))

      // ndt7 measurements for 2024-01-01: id m1 has old+new, id m2 has a tie,
      // plus a row of a DIFFERENT date in the same load (must be untouched).
      writeJsonl(src, "meas.json", Seq(
        """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T10:00:00Z"},"val":1}""",
        """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T12:00:00Z"},"val":2}""",
        """{"id":"m2","date":"2024-01-01","parser":{"Time":"2024-01-01T11:00:00Z"},"val":3}""",
        """{"id":"m2","date":"2024-01-01","parser":{"Time":"2024-01-01T11:00:00Z"},"val":4}""",
        """{"id":"m3","date":"2024-01-02","parser":{"Time":"2024-01-02T09:00:00Z"},"val":5}"""
      ))
      // annotation2 rows: m1 annotated on date and date-1 (row multiplication!),
      // m2 has no annotation (LEFT JOIN null check).
      writeJsonl(src, "ann.json", Seq(
        """{"id":"m1","date":"2024-01-01","parser":{"Time":"2024-01-01T01:00:00Z"},"geo":"US"}""",
        """{"id":"m1","date":"2023-12-31","parser":{"Time":"2023-12-31T01:00:00Z"},"geo":"DE"}""",
        """{"id":"zz","date":"2024-01-01","parser":{"Time":"2024-01-01T01:00:00Z"},"geo":"FR"}"""
      ))

      val job = mkJob(root, "ndt7", "2024-01-01")
      val ops = new TableOps(spark, job, wh)

      // S1 load
      val load = ops.loadToTmp(s"$src/meas.json")
      assert(load.rowsOut == 5)

      // W1 dedup: m1 keeps latest only; m2 ties BOTH survive; m3 (other date) untouched
      val dd = ops.dedup()
      assert(dd.rowsIn == 4)  // only the 2024-01-01 partition
      assert(dd.rowsOut == 3) // m1(new) + m2 tie1 + m2 tie2
      val tmpAfter = table("tmp_exp", "ndt7")
      assert(tmpAfter.count() == 4) // 3 kept + m3 other date
      assert(tmpAfter.filter($"date" === lit(java.sql.Date.valueOf("2024-01-02"))).count() == 1)
      assert(tmpAfter.filter($"id" === "m2").count() == 2)

      // dedup is idempotent (clean pre-check path)
      val dd2 = ops.dedup()
      assert(dd2.rowsIn == 3 && dd2.rowsOut == 3)

      // S2 copy to raw (partition truncate)
      val cp = ops.copyToRaw()
      assert(cp.rowsOut == 3)
      assert(ops.rawPartitionCount() == 3)
      // re-copy converges (idempotent truncate)
      ops.copyToRaw()
      assert(ops.rawPartitionCount() == 3)

      // S3 delete tmp partition; other dates survive
      ops.deleteTmp()
      val tmpLeft = table("tmp_exp", "ndt7")
      assert(tmpLeft.count() == 1)
      assert(tmpLeft.select("id").as[String].head() == "m3")

      // annotation2 pipeline for the same date
      val annJob = mkJob(root, "annotation2", "2024-01-01", join = "")
      val annOps = new TableOps(spark, annJob, wh)
      annOps.loadToTmp(s"$src/ann.json")
      annOps.dedup()
      annOps.copyToRaw()
      // the 2023-12-31 partition is its own job (one job per date)
      val annJobPrev = mkJob(root, "annotation2", "2023-12-31", join = "")
      val annOpsPrev = new TableOps(spark, annJobPrev, wh)
      annOpsPrev.dedup()
      annOpsPrev.copyToRaw()
      // ann raw now has 2023-12-31 and 2024-01-01 partitions
      assert(table("raw_exp", "annotation2").count() == 3)

      // S4/J1 join: m1 matches TWO ann rows (as-of window d-1..d => row
      // multiplication), m2 gets nulls
      val jn = ops.join()
      assert(jn.rowsOut == 4) // m1 x2 + m2 tie rows x1 each (null ann)
      // the tx join table is born with requirePartitionFilter
      // (reference: cloud/bq/ops.go:283-287) — read it per-day
      val joined = wh.readPartition(spark, wh.tablePath("joined", "ndt7"),
        java.time.LocalDate.parse("2024-01-01"))
      assert(joined.filter($"id" === "m1").count() == 2)
      assert(joined.filter($"id" === "m2" && $"geo".isNull).count() == 2)
      // key-columns-first output order (cloud/bq/ops.go:250-251). `date`
      // is excluded from the check: it IS a key column, but the path
      // backend's partitionBy-read appends it last (storage artifact)
      // while the tx backend keeps it in the reference position
      assert(joined.columns.filterNot(_ == "date").take(2).toSeq ==
        Seq("id", "parser"))
      // join skip rule: Datasets.Join == "" => success no-op
      assert(annOps.join().rowsOut == 0)
    }

    test(s"[$backend] load quarantines malformed lines instead of failing the day") {
      val root = Files.createTempDirectory("graft-whq").toString
      val src = Files.createTempDirectory("graft-srcq")
      val wh = mkWh(root)
      writeJsonl(src, "m.json", Seq(
        """{"id":"a","date":"2024-03-01","parser":{"Time":"2024-03-01T10:00:00Z"},"v":1}""",
        """{"id":"b","date":"2024-03-01","parser":{"Time":"2024-03-01T11:00:00Z"},"v":2""", // truncated
        """this is not json""",
        """{"id":"c","date":"2024-03-01","parser":{"Time":"2024-03-01T12:00:00Z"},"v":3}"""))
      val job = mkJob(root, "ndt7", "2024-03-01")
      val ops = new TableOps(spark, job, wh)
      val st = ops.loadToTmp(s"$src/m.json")
      assert(st.rowsIn == 4 && st.rowsOut == 2) // 2 good, 2 quarantined
      val tmp = wh.read(spark, wh.tablePath("tmp_exp", "ndt7"))
      assert(tmp.count() == 2)
      assert(!tmp.columns.contains("_corrupt_record"))
      val q = wh.read(spark, wh.tablePath("tmp_exp", "ndt7") + "__quarantine")
      assert(q.count() == 2)
      val raws = q.select("raw").as[String].collect().toSet
      assert(raws.exists(_.contains("this is not json")))
      assert(raws.exists(_.startsWith("""{"id":"b"""")))
      // quarantine rows are attributed to the job's date partition
      assert(q.filter($"date" === lit(java.sql.Date.valueOf("2024-03-01"))).count() == 2)

      // all lines malformed: schema inference sees no data shape at all —
      // the whole file quarantines as raw text, zero rows load
      writeJsonl(src, "bad.json", Seq("x", "{broken"))
      val st2 = ops.loadToTmp(s"$src/bad.json")
      assert(st2.rowsIn == 2 && st2.rowsOut == 0)
      assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7") + "__quarantine")
        .count() == 4)

      // a pinned schema captures (not nulls-out) the malformed lines too
      val root2 = Files.createTempDirectory("graft-whq2").toString
      val wh2 = mkWh(root2)
      val ops2 = new TableOps(spark, mkJob(root2, "ndt7", "2024-03-01"), wh2)
      val schema = spark.read.json(s"$src/m.json").drop("_corrupt_record").schema
      val st3 = ops2.loadToTmp(s"$src/m.json", Some(schema))
      assert(st3.rowsIn == 4 && st3.rowsOut == 2)
      assert(wh2.read(spark, wh2.tablePath("tmp_exp", "ndt7") + "__quarantine")
        .count() == 2)
    }

    test(s"[$backend] quarantine replay: corrupt load, fix, replay, " +
      "converged table") {
      val root = Files.createTempDirectory("graft-whr").toString
      val src = Files.createTempDirectory("graft-srcr")
      val wh = mkWh(root)
      writeJsonl(src, "m.json", Seq(
        """{"id":"a","date":"2024-03-01","parser":{"Time":"2024-03-01T10:00:00Z"},"v":1}""",
        """{"id":"b","date":"2024-03-01","parser":{"Time":"2024-03-01T11:00:00Z"},"v":2""", // truncated
        """this is not json""",
        """{"id":"c","date":"2024-03-01","parser":{"Time":"2024-03-01T12:00:00Z"},"v":3}"""))
      val job = mkJob(root, "ndt7", "2024-03-01")
      val ops = new TableOps(spark, job, wh)
      assert(ops.loadToTmp(s"$src/m.json").rowsOut == 2)
      val qp = wh.tablePath("tmp_exp", "ndt7") + "__quarantine"

      // nothing fixed yet: a replay re-parses, lands nothing, changes
      // nothing
      val st0 = ops.replayQuarantine()
      assert(st0.rowsIn == 2 && st0.rowsOut == 0)
      assert(wh.read(spark, qp).count() == 2)
      assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == 2)

      // the operator fix: restore b's truncated brace in the quarantine
      // partition (ReplayQuarantineTool's by-hand-repair workflow); the
      // not-json line stays broken
      val fixedRows = Seq(
        """{"id":"b","date":"2024-03-01","parser":{"Time":"2024-03-01T11:00:00Z"},"v":2}""",
        """this is not json""")
        .toDF("raw")
        .withColumn("date", lit(java.sql.Date.valueOf("2024-03-01")))
      wh.overwritePartition(spark, fixedRows, qp,
        java.time.LocalDate.parse("2024-03-01"))

      val st = ops.replayQuarantine()
      assert(st.rowsIn == 2 && st.rowsOut == 1)
      val tmp = wh.read(spark, wh.tablePath("tmp_exp", "ndt7"))
      assert(tmp.count() == 3, "the fixed line converged into tmp")
      assert(tmp.filter($"id" === "b" && $"v" === 2L).count() == 1)
      val qLeft = wh.read(spark, qp)
      assert(qLeft.count() == 1)
      assert(qLeft.select("raw").as[String].head() == "this is not json")

      // replay again: the still-bad line stays, tmp does not double
      val st2 = ops.replayQuarantine()
      assert(st2.rowsIn == 1 && st2.rowsOut == 0)
      assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == 3)
    }

    test(s"[$backend] crash-retry re-load: tx fences it to the drain " +
      "epoch (no duplicate rows); plain path appends (documented " +
      "limitation); reprocessing after the drain loads again") {
      val root = Files.createTempDirectory("graft-wh2").toString
      val src = Files.createTempDirectory("graft-src2")
      val wh = mkWh(root)
      writeJsonl(src, "m.json", Seq(
        """{"id":"x","date":"2024-02-01","parser":{"Time":"2024-02-01T10:00:00Z"},"v":1}"""
      ))
      val job = mkJob(root, "ndt7", "2024-02-01")
      val ops = new TableOps(spark, job, wh)
      ops.loadToTmp(s"$src/m.json")
      // crash-retry / takeover re-delivery of the SAME processing's load:
      // on tx the load txn is keyed to the drain epoch, so the re-run is
      // a no-op — an exact-duplicate append would TIE on parser.Time and
      // the tie-preserving dedup would keep both copies into raw (the
      // multi-driver race's lost-lease shape). Plain path has no txn
      // markers: the duplicate lands and dedup keeps ties by design.
      ops.loadToTmp(s"$src/m.json")
      val expected = if (backend == "tx") 1L else 2L
      val tmp = wh.read(spark, wh.tablePath("tmp_exp", "ndt7"))
      assert(tmp.count() == expected)
      ops.dedup() // exact duplicate rows tie on Time => keep-set keeps both
      assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == expected)
      ops.copyToRaw()
      ops.copyToRaw() // partition truncate: no double counting
      assert(ops.rawPartitionCount() == expected)

      // REPROCESSING: the drain (deleteTmp) advances the epoch in the
      // same commit that empties the partition — a new end-to-end run of
      // the same job must load again, exactly once
      ops.deleteTmp()
      // the tx manifest keeps the schema, so a fully-drained table is
      // readable as empty; plain parquet with zero files cannot infer
      if (backend == "tx")
        assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == 0)
      ops.loadToTmp(s"$src/m.json")
      assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == 1)
      if (backend == "tx") {
        // and the reprocessing's own retry is fenced again
        ops.loadToTmp(s"$src/m.json")
        assert(wh.read(spark, wh.tablePath("tmp_exp", "ndt7")).count() == 1)
      }
    }

    test(s"[$backend] opt-in content tier drops near-dup texts, keeping the min-id representative") {
      val root = Files.createTempDirectory("graft-wh5").toString
      val src = Files.createTempDirectory("graft-src5")
      val wh = mkWh(root)
      val base = "the quick brown fox jumps over the lazy dog again and again " * 3
      writeJsonl(src, "m.json", Seq(
        s"""{"id":"a1","date":"2024-05-01","parser":{"Time":"2024-05-01T10:00:00Z"},"text":"$base"}""",
        s"""{"id":"a2","date":"2024-05-01","parser":{"Time":"2024-05-01T11:00:00Z"},"text":"${base}tail"}""",
        s"""{"id":"b1","date":"2024-05-01","parser":{"Time":"2024-05-01T10:00:00Z"},"text":"completely different content about spark engines and catalyst planning here today"}"""
      ))
      val job = mkJob(root, "textlog", "2024-05-01", join = "")
      val spec = graft.tableops.DatatypeSpec(Seq("id", "date"), "parser.Time",
        contentDedup = Some(graft.tableops.ContentDedupSpec("text", minJaccardE4 = 8000L)))
      val ops = new TableOps(spark, job, wh, specOverride = Some(spec))
      ops.loadToTmp(s"$src/m.json")
      val dd = ops.dedup()
      assert(dd.rowsIn === 3 && dd.rowsOut === 2) // a2 near-dups a1, a1 kept
      val tmp = wh.read(spark, wh.tablePath("tmp_exp", "textlog"))
      assert(tmp.select("id").as[String].collect().toSet === Set("a1", "b1"))
    }

    test(s"[$backend] vsRawCorpus content tier drops a re-swept day's content the " +
      "archive already holds, and no-ops before raw exists") {
      val root = Files.createTempDirectory("graft-wh6").toString
      val src = Files.createTempDirectory("graft-src6")
      val base = "the quick brown fox jumps over the lazy dog again and again " * 3
      writeJsonl(src, "d1.json", Seq(
        s"""{"id":"d1a","date":"2024-06-01","parser":{"Time":"2024-06-01T10:00:00Z"},"text":"$base"}"""
      ))
      writeJsonl(src, "d2.json", Seq(
        s"""{"id":"d2a","date":"2024-06-02","parser":{"Time":"2024-06-02T10:00:00Z"},"text":"${base}tail"}""",
        s"""{"id":"d2b","date":"2024-06-02","parser":{"Time":"2024-06-02T09:00:00Z"},"text":"fresh content about catalyst planning and shuffle exchanges entirely new today"}"""
      ))
      val spec = graft.tableops.DatatypeSpec(Seq("id", "date"), "parser.Time",
        contentDedup = Some(graft.tableops.ContentDedupSpec("text",
          minJaccardE4 = 8000L, vsRawCorpus = true)))
      val wh = mkWh(root)
      val day1 = new TableOps(spark,
        mkJob(root, "textlog", "2024-06-01", join = ""), wh, specOverride = Some(spec))
      // day 1: raw does not exist yet -> incremental tier is a no-op
      day1.loadToTmp(s"$src/d1.json")
      val dd1 = day1.dedup()
      assert(dd1.rowsIn === 1 && dd1.rowsOut === 1)
      day1.copyToRaw(); day1.deleteTmp()
      // the archive copy also materialized the day's signature-index
      // slice — day 2's dedup probes THIS, not the archive's text
      val idx = wh.read(spark,
        wh.tablePath("raw_exp", "textlog") + "__neardup_index")
      assert(idx.count() === 1)
      assert(idx.columns.toSet == Set("id", "__fp", "__buckets", "__hl", "date"))
      // day 2: d2a near-dups the archived d1a -> dropped; d2b survives
      val day2 = new TableOps(spark,
        mkJob(root, "textlog", "2024-06-02", join = ""), wh, specOverride = Some(spec))
      day2.loadToTmp(s"$src/d2.json")
      val dd2 = day2.dedup()
      assert(dd2.rowsIn === 2 && dd2.rowsOut === 1)
      val tmp = wh.read(spark, wh.tablePath("tmp_exp", "textlog"))
      assert(tmp.select("id").as[String].collect().toSet === Set("d2b"))
    }

    test(s"[$backend] incremental tier falls back to raw text when the " +
      "index does not cover the archive (pre-index warehouse)") {
      val root = Files.createTempDirectory("graft-wh11").toString
      val src = Files.createTempDirectory("graft-src11")
      val base = "the quick brown fox jumps over the lazy dog again and again " * 3
      writeJsonl(src, "d1.json", Seq(
        s"""{"id":"d1a","date":"2024-06-01","parser":{"Time":"2024-06-01T10:00:00Z"},"text":"$base"}"""
      ))
      writeJsonl(src, "d2.json", Seq(
        s"""{"id":"d2a","date":"2024-06-02","parser":{"Time":"2024-06-02T10:00:00Z"},"text":"${base}tail"}""",
        s"""{"id":"d2b","date":"2024-06-02","parser":{"Time":"2024-06-02T09:00:00Z"},"text":"fresh content about catalyst planning and shuffle exchanges entirely new today"}"""
      ))
      val spec = graft.tableops.DatatypeSpec(Seq("id", "date"), "parser.Time",
        contentDedup = Some(graft.tableops.ContentDedupSpec("text",
          minJaccardE4 = 8000L, vsRawCorpus = true)))
      val wh = mkWh(root)
      val day1 = new TableOps(spark,
        mkJob(root, "textlog", "2024-06-01", join = ""), wh, specOverride = Some(spec))
      day1.loadToTmp(s"$src/d1.json")
      day1.dedup(); day1.copyToRaw(); day1.deleteTmp()
      // simulate a warehouse archived BEFORE the index feature existed:
      // remove the index table entirely — an existence-only check would
      // now silently probe nothing and re-admit d2a
      def rmTree(p: Path): Unit = if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
      rmTree(Path.of(wh.tablePath("raw_exp", "textlog") + "__neardup_index"))
      val day2 = new TableOps(spark,
        mkJob(root, "textlog", "2024-06-02", join = ""), wh, specOverride = Some(spec))
      day2.loadToTmp(s"$src/d2.json")
      val dd2 = day2.dedup()
      assert(dd2.rowsIn === 2 && dd2.rowsOut === 1) // raw-text fallback engaged
      assert(wh.read(spark, wh.tablePath("tmp_exp", "textlog"))
        .select("id").as[String].collect().toSet === Set("d2b"))
    }

    test(s"[$backend] small-file compaction merges a fragmented partition " +
      "and leaves compact ones alone") {
      val root = Files.createTempDirectory("graft-wh13").toString
      val wh = mkWh(root)
      val rawPath = wh.tablePath("raw_exp", "ndt7")
      // five appends = five physical files in one date partition
      (1 to 5).foreach { i =>
        wh.append(spark,
          Seq((s"r$i", java.sql.Date.valueOf("2024-12-01"), i.toLong))
            .toDF("id", "date", "v"),
          rawPath)
      }
      assert(wh.readPartition(spark, rawPath,
        LocalDate.parse("2024-12-01")).inputFiles.length == 5)
      val ops = new TableOps(spark,
        mkJob(root, "ndt7", "2024-12-01"), wh)
      val st = ops.compactRaw() // default 128 MB target => 1 file
      assert(st.rowsIn == 5 && st.rowsOut == 5)
      val after = wh.readPartition(spark, rawPath, LocalDate.parse("2024-12-01"))
      assert(after.inputFiles.length == 1)
      assert(after.select("v").as[Long].collect().toSet == (1L to 5L).toSet)
      // already compact: a second run is the cheap no-op path
      val st2 = ops.compactRaw()
      assert(st2.rowsIn == 5 && st2.rowsOut == 5)
      assert(wh.readPartition(spark, rawPath, LocalDate.parse("2024-12-01"))
        .inputFiles.length == 1)
    }

    test(s"[$backend] array-of-struct payload and added columns survive the pipeline " +
      "(schema evolution, cloud/bq/ops.go:280-282)") {
      val root = Files.createTempDirectory("graft-wh3").toString
      val src = Files.createTempDirectory("graft-src3")
      // day 1: tcpinfo-style repeated snapshots payload
      writeJsonl(src, "d1.json", Seq(
        """{"id":"a","date":"2024-03-01","parser":{"Time":"2024-03-01T10:00:00Z"},"snaps":[{"x":1},{"x":2}]}"""
      ))
      // day 2: same datatype gained a field (schema evolves across days)
      writeJsonl(src, "d2.json", Seq(
        """{"id":"a","date":"2024-03-02","parser":{"Time":"2024-03-02T10:00:00Z"},"snaps":[{"x":3}],"extra":"new"}"""
      ))
      val wh = mkWh(root)
      val d1 = new TableOps(spark, mkJob(root, "tcp", "2024-03-01", join = ""), wh)
      val d2 = new TableOps(spark, mkJob(root, "tcp", "2024-03-02", join = ""), wh)
      d1.loadToTmp(s"$src/d1.json")
      d2.loadToTmp(s"$src/d2.json")
      // dedup + copy of day 2 must SEE the day-2-only column even though
      // older footers in the same tmp table lack it
      d2.dedup()
      d2.copyToRaw()
      d1.dedup()
      d1.copyToRaw()
      val raw = wh.read(spark, wh.tablePath("raw_exp", "tcp"))
      assert(raw.columns.contains("extra"))
      val day2 = raw.filter($"id" === "a" && $"extra" === "new")
      assert(day2.count() == 1)
      // the ARRAY<STRUCT> payload round-trips intact
      assert(day2.select(expr("snaps[0].x")).head().getLong(0) == 3L)
      // day-1 rows read as null for the later column
      assert(raw.filter($"extra".isNull).count() == 1)
    }
  }

  // ---- backend-specific crash semantics ----

  test("[path] dedup recovers a crashed partition swap (staging holds the day)") {
    val root = Files.createTempDirectory("graft-wh4").toString
    val src = Files.createTempDirectory("graft-src4")
    writeJsonl(src, "m.json", Seq(
      """{"id":"x","date":"2024-04-01","parser":{"Time":"2024-04-01T10:00:00Z"},"v":1}""",
      """{"id":"x","date":"2024-04-01","parser":{"Time":"2024-04-01T11:00:00Z"},"v":2}"""
    ))
    val job = mkJob(root, "ndt7", "2024-04-01")
    val ops = new TableOps(spark, job, Warehouse(root))
    ops.loadToTmp(s"$src/m.json")
    // Simulate a crash BETWEEN the swap's delete and rename: the deduped
    // day sits in staging, the tmp partition is gone. Without recovery a
    // re-run sees an empty (clean) partition and the day's rows are lost.
    val tmpTable = Path.of(s"$root/tmp_exp/ndt7")
    val staging = Path.of(s"$root/tmp_exp/ndt7.__dedup_staging_date_2024-04-01")
    Files.createDirectories(staging)
    Files.move(tmpTable.resolve("date=2024-04-01"),
      staging.resolve("date=2024-04-01"))
    val dd = ops.dedup()
    assert(dd.rowsIn == 2 && dd.rowsOut == 1) // recovered, then deduped
    val tmp = spark.read.parquet(tmpTable.toString)
    assert(tmp.count() == 1)
    assert(tmp.select("v").as[Long].head() == 2L)
    assert(!Files.exists(staging))
  }

  test("[tx] uncommitted data files are invisible; partition delete is " +
    "metadata-only; commits collide safely") {
    val root = Files.createTempDirectory("graft-wh7").toString
    val src = Files.createTempDirectory("graft-src7")
    writeJsonl(src, "m.json", Seq(
      """{"id":"x","date":"2024-07-01","parser":{"Time":"2024-07-01T10:00:00Z"},"v":1}""",
      """{"id":"y","date":"2024-07-02","parser":{"Time":"2024-07-02T10:00:00Z"},"v":2}"""
    ))
    val wh = new TxWarehouse(root)
    val job = mkJob(root, "ndt7", "2024-07-01")
    val ops = new TableOps(spark, job, wh)
    ops.loadToTmp(s"$src/m.json")
    val tablePath = wh.tablePath("tmp_exp", "ndt7")
    assert(wh.read(spark, tablePath).count() == 2)

    // partition pruning happens at the MANIFEST: the two dates landed in
    // two physical files, and a partition read opens exactly one — no
    // footer reads of other days, the property that keeps a years-deep
    // table's daily ops O(day) instead of O(table)
    assert(wh.read(spark, tablePath).inputFiles.length == 2)
    assert(wh.readPartition(spark, tablePath, LocalDate.parse("2024-07-01"))
      .inputFiles.length == 1)

    // a crashed writer's files (written but never committed) are invisible
    val orphanDir = Path.of(s"$tablePath/_graft_data/orphan/__p_date=2024-07-01")
    Seq((99L, java.sql.Date.valueOf("2024-07-01"))).toDF("v", "date")
      .write.parquet(orphanDir.toString)
    assert(wh.read(spark, tablePath).count() == 2)
    assert(wh.read(spark, tablePath).filter($"v" === 99).count() == 0)

    // partition delete retires manifest entries without touching bytes:
    // the data files all still exist on disk afterwards
    def dataFiles() = java.nio.file.Files.walk(Path.of(s"$tablePath/_graft_data"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
    val before = dataFiles()
    ops.deleteTmp()
    assert(dataFiles() == before)                       // bytes untouched
    val left = wh.read(spark, tablePath)
    assert(left.count() == 1)                           // 07-01 gone
    assert(left.select("id").as[String].head() == "y")

    // optimistic concurrency: a commit that loses the version race
    // recomputes and lands on the next number — simulate the collision
    // by pre-creating the version the next commit will try first
    val logDir = Path.of(s"$tablePath/_graft_log")
    val versions0 = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("v")).toSeq.sorted
    val next = versions0.last.stripPrefix("v").stripSuffix(".txt").toLong + 1
    // squatter: a committed (terminated) no-op manifest occupying the
    // version number the next commit will try first
    Files.writeString(logDir.resolve(f"v$next%020d.txt"), "E\n")
    ops.loadToTmp(s"$src/m.json")                       // must retry past it
    assert(wh.read(spark, tablePath)
      .filter($"date" === lit(java.sql.Date.valueOf("2024-07-01"))).count() == 1)
  }

  test("[tx] concurrent writers: parallel commits all land, versions stay " +
    "contiguous, no rows lost") {
    val root = Files.createTempDirectory("graft-wh9").toString
    val wh = new TxWarehouse(root)
    val tablePath = wh.tablePath("tmp_exp", "ndt7")
    // 8 uncoordinated writers × 3 appends each, racing the version
    // counter — the optimistic retry must serialize them without locks
    // (this is the multi-driver scenario the path backend cannot survive)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futures = (0 until 8).map { w =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (0 until 3).foreach { b =>
          wh.append(spark,
            Seq((w * 100L + b, java.sql.Date.valueOf("2024-09-01")))
              .toDF("v", "date"),
            tablePath)
        }
      })
    }
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val out = wh.read(spark, tablePath)
    assert(out.count() == 24)
    assert(out.select("v").as[Long].collect().toSet ==
      (for (w <- 0 until 8; b <- 0 until 3) yield w * 100L + b).toSet)
    // every commit owned exactly one version: contiguous 1..24
    assert(wh.currentVersion(spark, tablePath) == 24L)
    val logDir = Path.of(s"$tablePath/_graft_log")
    val versions = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toLong).toSeq.sorted
    assert(versions == (1L to 24L))
  }

  test("[path] recoverAllSelfReplace heals every crashed partition swap " +
    "in one sweep (out-of-band compaction crash)") {
    val root = Files.createTempDirectory("graft-wh14").toString
    val wh = Warehouse(root)
    val rawPath = wh.tablePath("raw_exp", "ndt7")
    Seq(("a", java.sql.Date.valueOf("2024-03-01"), 1L),
      ("b", java.sql.Date.valueOf("2024-03-02"), 2L))
      .toDF("id", "date", "v")
      .write.partitionBy("date").parquet(rawPath)
    // simulate a compaction crash between delete and rename on BOTH dates
    Seq("2024-03-01", "2024-03-02").foreach { d =>
      val staging = Path.of(s"$rawPath.__dedup_staging_date_$d")
      Files.createDirectories(staging)
      Files.move(Path.of(s"$rawPath/date=$d"), staging.resolve(s"date=$d"))
    }
    wh.recoverAllSelfReplace(spark, rawPath)
    val back = wh.read(spark, rawPath)
    assert(back.count() == 2)
    assert(back.select("v").as[Long].collect().toSet == Set(1L, 2L))
    assert(!Files.exists(Path.of(s"$rawPath.__dedup_staging_date_2024-03-01")))
  }

  test("[tx] a partition replace staged against stale state is refused, " +
    "not silently committed over a concurrent writer's rows") {
    val root = Files.createTempDirectory("graft-wh12").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    def row(v: Long) =
      Seq((v, java.sql.Date.valueOf("2024-11-01"))).toDF("v", "date")
    wh.append(spark, row(1), path)
    // a dedup-style rewrite stages against the current snapshot…
    val (_, token) = wh.stageSelfReplace(spark, row(10), path,
      LocalDate.parse("2024-11-01"))
    // …then a concurrent writer (e.g. the streaming sink) commits more
    // rows for the same date before the publish
    wh.append(spark, row(2), path)
    // blind retire-whatever-is-live would drop v=2 forever; the publish
    // must detect the lost update instead
    intercept[java.util.ConcurrentModificationException] {
      wh.publishSelfReplace(spark, path, LocalDate.parse("2024-11-01"), token)
    }
    // nothing was committed: both writers' rows are intact
    assert(wh.read(spark, path).select("v").as[Long].collect().toSet
      == Set(1L, 2L))
    // a restage against fresh state succeeds
    val (_, token2) = wh.stageSelfReplace(spark, row(10), path,
      LocalDate.parse("2024-11-01"))
    wh.publishSelfReplace(spark, path, LocalDate.parse("2024-11-01"), token2)
    assert(wh.read(spark, path).select("v").as[Long].collect().toSet
      == Set(10L))
  }

  test("[tx] readChangesBetween feeds incremental consumers: only the " +
    "files that became live in the range, never a rescan") {
    val root = Files.createTempDirectory("graft-wh16").toString
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    def rows(d: String, vs: Long*) =
      vs.map(v => (v, java.sql.Date.valueOf(d))).toDF("v", "date")
    wh.append(spark, rows("2024-09-01", 1, 2), path)     // v1
    wh.append(spark, rows("2024-09-02", 3), path)        // v2
    // v3: dedup-style replace of 09-01 (retires v1's file, adds new)
    wh.overwritePartition(spark, rows("2024-09-01", 10), path,
      LocalDate.parse("2024-09-01"))
    def changes(from: Long, to: Long): Set[Long] =
      wh.readChangesBetween(spark, path, from, to)
        .select("v").as[Long].collect().toSet
    // pure append increment
    assert(changes(1, 2) == Set(3L))
    // replace increment: the rewritten partition's rows are the change;
    // the retired rows are absent (no retraction semantics)
    assert(changes(2, 3) == Set(10L))
    // from 0 = the full table at `to`
    assert(changes(0, 3) == Set(3L, 10L))
    // a file added AND retired within the range never surfaces
    assert(changes(0, 3) == changes(0, 3) -- Set(1L, 2L))
    // empty increment reads as zero rows
    assert(wh.readChangesBetween(spark, path, 3, 3).count() == 0)
    // unresolvable endpoints fail with readAt's clean contract (log
    // truncation lowers the reachable fromVersion the same way)
    intercept[IllegalArgumentException] {
      wh.readChangesBetween(spark, path, 1, 4)
    }

    // the retraction-aware dual: both sides of the live-set diff, tagged
    def diff(from: Long, to: Long): Set[(Long, String)] =
      wh.diffSnapshots(spark, path, from, to)
        .select("v", "_change_type").as[(Long, String)].collect().toSet
    // pure append: inserts only
    assert(diff(1, 2) == Set((3L, "insert")))
    // replace: the retired file's rows come back as deletes
    assert(diff(2, 3) == Set((10L, "insert"), (1L, "delete"), (2L, "delete")))
    // from 0: the full snapshot as inserts, nothing to retract
    assert(diff(0, 3) == Set((3L, "insert"), (10L, "insert")))
    // empty range: empty frame
    assert(wh.diffSnapshots(spark, path, 3, 3).count() == 0)
  }

  test("[tx] truncateLog bounds _graft_log to O(checkpointEvery + kept " +
    "checkpoints); history below the horizon fails cleanly") {
    val root = Files.createTempDirectory("graft-wh15").toString
    val wh = new TxWarehouse(root, checkpointEvery = 3)
    val tablePath = wh.tablePath("m", "t")
    // > 2 × checkpointEvery commits: v1..v13, checkpoints c3 c6 c9 c12
    (1 to 13).foreach { i =>
      wh.append(spark,
        Seq((i.toLong, java.sql.Date.valueOf("2024-10-01"))).toDF("v", "date"),
        tablePath)
    }
    val logDir = Path.of(s"$tablePath/_graft_log")
    def logNames = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".txt")).toSeq.sorted
    assert(logNames.length == 13 + 4)
    // age guard: nothing young enough to have drained readers is touched
    assert(wh.truncateLog(spark, tablePath,
      minAgeMillis = 24L * 3600 * 1000) == 0L)
    assert(logNames.length == 13 + 4)
    // aged out (test clock: everything qualifies): horizon is the newest
    // checkpoint leaving keepCheckpoints=2 at or above it → c9; deltas
    // v1..v9 and checkpoints c3 c6 go, leaving c9 c12 v10..v13
    assert(wh.truncateLog(spark, tablePath, keepCheckpoints = 2,
      minAgeMillis = 0L) == 9L + 2L)
    assert(logNames ==
      Seq("c00000000000000000009.txt", "c00000000000000000012.txt",
        "v00000000000000000010.txt", "v00000000000000000011.txt",
        "v00000000000000000012.txt", "v00000000000000000013.txt"))
    // live reads and retained time travel unaffected
    assert(wh.read(spark, tablePath).count() == 13)
    assert(wh.currentVersion(spark, tablePath) == 13L)
    assert(wh.readAt(spark, tablePath, 9L).count() == 9)
    // below the horizon: the clean "no version" failure HistoryTool
    // degrades to an "archived" line on
    intercept[IllegalArgumentException] { wh.readAt(spark, tablePath, 8L) }
    // the table keeps working: the next append commits v14
    wh.append(spark,
      Seq((14L, java.sql.Date.valueOf("2024-10-01"))).toDF("v", "date"),
      tablePath)
    assert(wh.read(spark, tablePath).count() == 14)
    // idempotent at the same horizon: re-run deletes nothing more
    assert(wh.truncateLog(spark, tablePath, keepCheckpoints = 2,
      minAgeMillis = 0L) == 0L)
  }

  test("[tx] checkpoints bound replay cost and allow log truncation") {
    val root = Files.createTempDirectory("graft-wh10").toString
    val wh = new TxWarehouse(root, checkpointEvery = 3)
    val tablePath = wh.tablePath("m", "t")
    (1 to 7).foreach { i =>
      wh.append(spark,
        Seq((i.toLong, java.sql.Date.valueOf("2024-10-01"))).toDF("v", "date"),
        tablePath)
    }
    val logDir = Path.of(s"$tablePath/_graft_log")
    def logFiles(prefix: String) = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(prefix)).toSeq.sorted
    // full-state snapshots landed at every 3rd commit
    assert(logFiles("c").map(_.stripPrefix("c").stripSuffix(".txt").toLong)
      == Seq(3L, 6L))
    assert(wh.read(spark, tablePath).count() == 7)
    // checkpoint-seeded state equals pure-delta replay
    val cps = logFiles("c")
    cps.foreach(n => Files.move(logDir.resolve(n), logDir.resolve(s"x$n")))
    assert(wh.read(spark, tablePath).count() == 7)
    cps.foreach(n => Files.move(logDir.resolve(s"x$n"), logDir.resolve(n)))
    // delta segments at or below the newest checkpoint can be archived
    // away — reads seed from c6 and apply only v7
    logFiles("v").filter(_.stripPrefix("v").stripSuffix(".txt").toLong <= 6)
      .foreach(n => Files.delete(logDir.resolve(n)))
    assert(wh.read(spark, tablePath).count() == 7)
    assert(wh.currentVersion(spark, tablePath) == 7L)
    // history below the truncation horizon is explicitly gone
    intercept[IllegalArgumentException] { wh.readAt(spark, tablePath, 4L) }
    // and the table keeps working: another append commits v8
    wh.append(spark,
      Seq((8L, java.sql.Date.valueOf("2024-10-01"))).toDF("v", "date"),
      tablePath)
    assert(wh.read(spark, tablePath).count() == 8)
  }

  test("[tx] time travel reads any retained version; vacuum reclaims " +
    "retired and orphan files and bounds history") {
    val root = Files.createTempDirectory("graft-wh8").toString
    val src = Files.createTempDirectory("graft-src8")
    // 08-01 holds a true duplicate (forces a dedup rewrite commit),
    // 08-02 a single row that stays live throughout
    writeJsonl(src, "m.json", Seq(
      """{"id":"x","date":"2024-08-01","parser":{"Time":"2024-08-01T10:00:00Z"},"v":1}""",
      """{"id":"x","date":"2024-08-01","parser":{"Time":"2024-08-01T11:00:00Z"},"v":2}""",
      """{"id":"y","date":"2024-08-02","parser":{"Time":"2024-08-02T10:00:00Z"},"v":3}"""
    ))
    val wh = new TxWarehouse(root)
    val ops = new TableOps(spark, mkJob(root, "ndt7", "2024-08-01"), wh)
    val tablePath = wh.tablePath("tmp_exp", "ndt7")
    ops.loadToTmp(s"$src/m.json")   // v1: 3 rows
    ops.dedup()                     // v2: rewrite drops the stale dup -> 2 rows
    ops.deleteTmp()                 // v3: 08-01 retired -> 1 row
    assert(wh.currentVersion(spark, tablePath) == 3L)
    assert(wh.readAt(spark, tablePath, 1L).count() == 3)
    assert(wh.readAt(spark, tablePath, 2L).count() == 2)
    assert(wh.read(spark, tablePath).count() == 1)
    intercept[IllegalArgumentException] {
      wh.readAt(spark, tablePath, 9L)
    }

    // an uncommitted orphan from a "crashed" writer
    val orphan = Path.of(s"$tablePath/_graft_data/orphan/__p_date=2024-08-01")
    Seq((99L, java.sql.Date.valueOf("2024-08-01"))).toDF("v", "date")
      .write.parquet(orphan.toString)

    def parquets() = java.nio.file.Files.walk(Path.of(s"$tablePath/_graft_data"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet")).toSet
    val before = parquets()
    // age guard first: nothing young enough to be an in-flight write dies
    assert(wh.vacuum(spark, tablePath, keepVersions = 1,
      minAgeMillis = 3600_000) == 0L)
    assert(parquets() == before)
    // age 0: retired rewrite inputs + the orphan go, the live file stays
    val deleted = wh.vacuum(spark, tablePath, keepVersions = 1, minAgeMillis = 0L)
    assert(deleted > 0L)
    val after = parquets()
    assert(after.subsetOf(before) && !after.exists(_.toString.contains("orphan")))
    assert(wh.read(spark, tablePath).count() == 1)      // latest unaffected
    // vacuumed history is gone: the v1 manifest references deleted files
    intercept[Exception] {
      wh.readAt(spark, tablePath, 1L).count()
    }
  }

  test("[tx] datatype-spec governance: copyToRaw ensures the configured " +
    "bloom key and CHECK constraints on the raw table; bad rows are " +
    "rejected before commit, point probes prune") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-wh8").toString
    val src = Files.createTempDirectory("graft-src8")
    writeJsonl(src, "m.json",
      (0 until 32).map(i =>
        s"""{"id":"id$i","date":"2024-08-01","parser":{"Time":"2024-08-01T10:00:00Z"},"v":${i + 1}}"""))
    val wh = new TxWarehouse(root)
    val spec = graft.tableops.DatatypeSpec(Seq("id", "date"), "parser.Time",
      bloomKey = Some("id"), checks = Seq("positive_v" -> "v > 0"))
    val ops = new TableOps(spark, mkJob(root, "ndt7", "2024-08-01"),
      wh, specOverride = Some(spec))
    ops.loadToTmp(s"$src/m.json")
    ops.copyToRaw()
    val raw = wh.tablePath("raw_exp", "ndt7")
    // properties landed exactly once, idempotent on a second copy
    assert(wh.checkConstraintSql(spark, raw, "positive_v").contains("v > 0"))
    val v = wh.currentVersion(spark, raw)
    ops.copyToRaw()
    assert(wh.currentVersion(spark, raw) == v + 1) // only the data commit
    // the check gates later writes
    intercept[graft.tableops.ConstraintViolationException] {
      wh.append(spark,
        Seq(("zz", -5L, java.sql.Date.valueOf("2024-08-02")))
          .toDF("id", "v", "date"), raw)
    }
    // the bloom property harvested on the copy's own files: a point
    // probe on the string key opens fewer files than the partition holds
    val rewrite = wh.read(spark, raw)
      .repartition(4, col("id")) // scatter so ranges are inert
    wh.overwritePartition(spark, rewrite, raw, LocalDate.parse("2024-08-01"))
    val total = wh.read(spark, raw).inputFiles.length
    val probe = wh.readWhere(spark, raw, col("id") === "id7")
    assert(probe.inputFiles.length < total,
      s"bloom should prune: ${probe.inputFiles.length} of $total")
    assert(probe.select("v").as[Long].collect().toSeq == Seq(8L))
  }
}
