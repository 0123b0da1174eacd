package graft.tableops

import java.nio.file.Files
import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.model.{Datasets, Job}

/** Z-order clustering: the interleaved address itself (Morton order on
  * an exact grid), the layout's pruning advantage over lexicographic
  * range clustering on trailing dimensions, and the compaction wiring
  * (`compactRaw(interleave = true)`).
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("address is the Morton code on an exact power-of-two grid") {
    // 8×8 grid, one row per cell, bits = 3: the sampled quantile
    // boundaries resolve each coordinate to itself, so the address must
    // equal the classic Morton interleave (x even bits, y odd bits)
    val grid = for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)
    val df = grid.toDF("x", "y")
    val got = df.withColumn("z",
        ZOrder.zAddress(df, Seq("x", "y"), bits = 3))
      .select("x", "y", "z").as[(Int, Int, Long)].collect().toSeq
    def morton(x: Int, y: Int): Long =
      (0 until 3).foldLeft(0L) { (z, i) =>
        z | (((x >> i) & 1).toLong << (2 * i)) |
          (((y >> i) & 1).toLong << (2 * i + 1))
      }
    got.foreach { case (x, y, z) =>
      assert(z == morton(x, y), s"($x,$y)")
    }
  }

  test("z layout prunes trailing-dimension predicates; range layout cannot") {
    val n = 64
    val rows = for { x <- 0 until n; y <- 0 until n }
      yield (x.toLong, y.toLong, Date.valueOf("2024-01-01"))
    val df = rows.toDF("x", "y", "date")

    val root = Files.createTempDirectory("graft-z").toString
    val wh = new TxWarehouse(root)
    val lex = wh.tablePath("ds", "lex")
    val zed = wh.tablePath("ds", "zed")
    wh.append(spark,
      df.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions(col("x"), col("y")), lex)
    wh.append(spark, ZOrder.layout(df, Seq("x", "y"), 16), zed)
    assert(wh.read(spark, lex).inputFiles.length == 16)
    assert(wh.read(spark, zed).inputFiles.length == 16)

    // trailing-dimension band: 1/8 of the y domain. Lexicographic files
    // each span all of y within an x slice — nothing prunes. Z files
    // cover boxes — most of them provably miss the band.
    val band = col("y") >= 0L && col("y") < 8L
    val lexKept = wh.readWhere(spark, lex, band).inputFiles.length
    val zKept = wh.readWhere(spark, zed, band).inputFiles.length
    assert(lexKept == 16, s"lexicographic layout cannot prune y-band: $lexKept")
    assert(zKept <= 8, s"z layout must prune most files for a 1/8 band: $zKept")

    // box on both dimensions: z opens a corner, not a stripe
    val box = col("x") < 16L && col("y") < 16L
    assert(wh.readWhere(spark, zed, box).inputFiles.length <= 4)

    // pruning is invisible in the result
    for (pred <- Seq(band, box)) {
      val exact = wh.read(spark, zed).filter(pred)
        .agg(count(lit(1)), sum(col("x") * 1000 + col("y")))
        .as[(Long, Long)].head()
      assert(wh.readWhere(spark, zed, pred)
        .agg(count(lit(1)), sum(col("x") * 1000 + col("y")))
        .as[(Long, Long)].head() == exact)
    }
  }

  test("maintenance sweeper applies the per-datatype interleaved layout") {
    val root = Files.createTempDirectory("graft-zs").toString
    val wh = new TxWarehouse(root)
    val raw = wh.tablePath("raw_exp", "grid")
    val n = 32
    for (s <- 0 until 8) {
      val rows = for { x <- 0 until n; y <- 0 until n; if (x + y) % 8 == s }
        yield (x.toLong, y.toLong, Date.valueOf("2024-01-01"))
      wh.append(spark, rows.toDF("x", "y", "date").coalesce(1), raw)
    }
    object NoopSaver extends graft.persistence.NamedSaver {
      def save(name: String, contents: String): Unit = ()
      def load(name: String): Option[String] = None
    }
    val tracker = new graft.tracker.Tracker(NoopSaver)
    val job = Job("bucket", "exp", "grid", LocalDate.parse("2024-01-01"),
      datasets = Datasets(tmp = "tmp_exp", raw = "raw_exp", join = ""))
    assert(tracker.addJob(job).isRight)
    assert(tracker.setStatus(job.key, graft.model.State.Complete).isRight)
    val totalBytes = wh.partitionFiles(spark, raw, job.date).map(_._2).sum
    val sweeper = new graft.gardenerops.MaintenanceSweeper(spark, wh, tracker,
      targetFileBytes = totalBytes / 4, minAgeMillis = 0L,
      clusterBy = Map("grid" -> Seq("x", "y")), interleaved = Set("grid"))
    assert(sweeper.sweep() == 1)
    val files = wh.read(spark, raw).inputFiles.length
    assert(files > 1 && files <= 5, s"files=$files")
    val kept = wh.readWhere(spark, raw, col("y") < 4L).inputFiles.length
    assert(kept < files, s"sweeper layout must prune the y band: $kept/$files")
    assert(wh.readWhere(spark, raw, col("y") < 4L).count() == n.toLong * 4)
  }

  test("compactRaw(interleave) rewrites a fragmented day z-clustered") {
    val root = Files.createTempDirectory("graft-zc").toString
    val wh = new TxWarehouse(root)
    val job = Job("bucket", "exp", "grid", LocalDate.parse("2024-01-01"),
      datasets = Datasets(tmp = "tmp_exp", raw = "raw_exp", join = ""))
    val raw = wh.tablePath("raw_exp", "grid")
    // 16 fragmented appends, each scattered across the whole (x, y)
    // space — the worst layout for stats pruning
    val n = 48
    for (s <- 0 until 16) {
      val rows = for { x <- 0 until n; y <- 0 until n; if (x + y) % 16 == s }
        yield (x.toLong, y.toLong, Date.valueOf("2024-01-01"))
      wh.append(spark, rows.toDF("x", "y", "date").coalesce(1), raw)
    }
    assert(wh.read(spark, raw).inputFiles.length == 16)
    val before = wh.readWhere(spark, raw, col("y") < 6L).inputFiles.length
    assert(before == 16, "fragmented appends overlap everywhere")

    val ops = new TableOps(spark, job, wh)
    val totalBytes = wh.partitionFiles(spark, raw, job.date).map(_._2).sum
    val stats = ops.compactRaw(targetFileBytes = totalBytes / 8,
      clusterBy = Seq("x", "y"), interleave = true)
    assert(stats.rowsOut == n.toLong * n)

    val files = wh.read(spark, raw).inputFiles.length
    assert(files <= 9 && files > 1, s"compacted to $files")
    val after = wh.readWhere(spark, raw, col("y") < 6L).inputFiles.length
    assert(after < files, s"z-compacted layout must prune the y band: $after/$files")
    assert(wh.readWhere(spark, raw, col("y") < 6L).count() == n.toLong * 6)
  }
}
