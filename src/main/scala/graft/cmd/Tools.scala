package graft.cmd

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.model.{Datasets, Job}
import graft.tableops.{TableOps, Warehouse}

/** Debug CLIs mirroring the reference's cmd/load/load.go and
  * cmd/copy/copy.go: run a single table op against a warehouse without the
  * orchestrator — for backfills and by-hand debugging.
  */
private[cmd] object ToolSession {
  def spark(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def job(datatype: String, date: String, tmp: String, raw: String,
      join: String): Job =
    Job("cli", "cli", datatype, LocalDate.parse(date),
      datasets = Datasets(tmp, raw, join))
}

/** Usage: LoadTool <warehouseRoot> <datatype> <YYYY-MM-DD> <jsonGlob> [tmpDataset] */
object LoadTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date, glob) = args.take(4)
    val tmp = if (args.length > 4) args(4) else s"tmp_cli"
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, tmp, "raw_cli", ""), Warehouse(whRoot))
    val stats = ops.loadToTmp(glob)
    println(s"loaded ${stats.detail}")
  }
}

/** Usage: CopyTool <warehouseRoot> <datatype> <YYYY-MM-DD> <tmpDataset> <rawDataset> */
object CopyTool {
  def main(args: Array[String]): Unit = {
    val Array(whRoot, datatype, date, tmp, raw) = args.take(5)
    val ops = new TableOps(ToolSession.spark(),
      ToolSession.job(datatype, date, tmp, raw, ""), Warehouse(whRoot))
    val stats = ops.copyToRaw()
    println(s"copied ${stats.detail}")
  }
}
