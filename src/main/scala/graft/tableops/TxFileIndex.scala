package graft.tableops

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** The tx manifest as a Spark [[FileIndex]] — the native integration
  * point file-based tables plug into Catalyst (the same seam Delta's
  * log-backed index uses). Instead of the explicit
  * [[TxWarehouse.readWhere]] call, ANY plan over
  * [[TxWarehouse.readRelation]] pushes its data filters into
  * `listFiles`, where the manifest's per-file min/max stats and key
  * blooms prune BEFORE Spark lists or opens a footer; parquet reading,
  * vectorization, row-group pushdown and column pruning all come from
  * the stock ParquetFileFormat underneath. File sizes come from the
  * manifest's `F` lines, so planning statistics (sizeInBytes — the
  * broadcast-join decision) are metadata-only too.
  *
  * Snapshot semantics: the index pins the manifest version current at
  * construction (the snapshot-isolation contract readers get
  * everywhere else); `refresh()` re-replays to the latest version.
  */
final class TxFileIndex(spark: SparkSession, wh: TxWarehouse, path: String)
    extends FileIndex {

  private case class Snap(files: Seq[(String, Long)],
      stats: Map[String, String], blooms: Map[String, String])

  @volatile private var snap: Snap = load()

  private def load(): Snap = {
    val (live, stats, blooms, sizes, _) = wh.indexSnapshot(spark, path)
    // files lacking an `F` length (pre-F commits) pay one status call —
    // they age out with their next rewrite
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = live.toSeq.sorted.map { rel =>
      rel -> sizes.getOrElse(rel,
        fs.getFileStatus(new Path(s"$path/$rel")).getLen)
    }
    Snap(files, stats, blooms)
  }

  override def rootPaths: Seq[Path] = Seq(new Path(path))

  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val s = snap
    val kept =
      if (dataFilters.isEmpty) s.files
      else {
        val pred = dataFilters.reduce(And)
        s.files.filter { case (rel, _) =>
          (s.stats.get(rel).flatMap(FileStats.decode) match {
            case Some(p) => FileStats.mayMatch(p, pred)
            case None => true
          }) && s.blooms.get(rel).forall(FileBloom.mayMatch(_, pred))
        }
      }
    val statuses = kept.map { case (rel, len) =>
      new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        new Path(s"$path/$rel"))
    }.toArray
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  }

  override def inputFiles: Array[String] =
    snap.files.map { case (rel, _) => s"$path/$rel" }.toArray

  override def refresh(): Unit = { snap = load() }

  override def sizeInBytes: Long = snap.files.map(_._2).sum
}

object TxFileIndex {

  /** The relation over the index: explicit data schema (the manifest's
    * recorded cumulative schema when present — resolves evolved columns
    * without a footer sweep — else one footer-merging read), stock
    * parquet format underneath.
    */
  def relation(spark: SparkSession, wh: TxWarehouse, path: String,
      bucketSpec: Option[org.apache.spark.sql.catalyst.catalog.BucketSpec] =
        None): DataFrame = {
    val idx = new TxFileIndex(spark, wh, path)
    val schema = wh.recordedSchema(spark, path)
      .getOrElse(wh.read(spark, path).schema)
    // with a bucketSpec the scan DECLARES HashPartitioning(col, n) and
    // groups files into one task per bucket via their name suffix —
    // the stock storage-partitioned-join seam (readBucketed validates
    // every live file was written under the spec before calling)
    val rel = HadoopFsRelation(idx, new StructType(), schema, bucketSpec,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    val df =
      org.apache.spark.sql.graftshim.RelationBridge.toDataFrame(spark, rel)
    // merge-on-read: subtract the snapshot's deletion vectors — same
    // (basename, row ordinal) anti-join as every warehouse read; the
    // DV-free table adds nothing to the plan
    val (live, _, _, _, dvs) = wh.indexSnapshot(spark, path)
    wh.applyDv(spark, df, dvs.view.filterKeys(live).toMap)
  }
}
