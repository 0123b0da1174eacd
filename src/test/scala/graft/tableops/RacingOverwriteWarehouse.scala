package graft.tableops

import java.time.LocalDate
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test shim reproducing the multi-driver interleaving the tx backend's
  * conflict detection exists for: another writer commits rows for the
  * same partition AFTER this overwrite captured the live file set its
  * replace was planned against and BEFORE its commit. `race` fires once,
  * on the first overwrite of a path matching `racePath` — later attempts
  * (the monitor's Retry re-run) see fresh state and succeed, exactly the
  * production recovery path. Delegates everything else to a real
  * [[TxWarehouse]] (which stays final).
  */
final class RacingOverwriteWarehouse(root: String,
    racePath: String => Boolean, race: (String, LocalDate) => Unit)
    extends Warehouse {
  private val inner = new TxWarehouse(root)
  val conflicts = new AtomicInteger(0)
  private val fired = new AtomicBoolean(false)

  override def overwritePartition(spark: SparkSession, df: DataFrame,
      path: String, date: LocalDate): Long = {
    val expected = inner.liveOfDate(spark, path, date)
    if (racePath(path) && fired.compareAndSet(false, true)) race(path, date)
    try inner.overwritePartitionExpecting(spark, df, path, date, expected)
    catch {
      case e: ConcurrentCommitException =>
        conflicts.incrementAndGet(); throw e
    }
  }

  def tablePath(dataset: String, datatype: String): String =
    inner.tablePath(dataset, datatype)
  def read(spark: SparkSession, path: String): DataFrame =
    inner.read(spark, path)
  override def readWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): DataFrame =
    inner.readWhere(spark, path, predicate)
  override def readPartition(spark: SparkSession, path: String,
      date: LocalDate): DataFrame = inner.readPartition(spark, path, date)
  def exists(spark: SparkSession, path: String): Boolean =
    inner.exists(spark, path)
  override def setRequirePartitionFilter(spark: SparkSession, path: String,
      required: Boolean): Unit =
    inner.setRequirePartitionFilter(spark, path, required)
  override def requiresPartitionFilter(spark: SparkSession,
      path: String): Boolean = inner.requiresPartitionFilter(spark, path)
  def dates(spark: SparkSession, path: String): Set[LocalDate] =
    inner.dates(spark, path)
  def append(spark: SparkSession, df: DataFrame, path: String): Unit =
    inner.append(spark, df, path)
  def deletePartition(spark: SparkSession, path: String, date: LocalDate): Unit =
    inner.deletePartition(spark, path, date)
  def stageSelfReplace(spark: SparkSession, df: DataFrame, path: String,
      date: LocalDate): (Long, String) =
    inner.stageSelfReplace(spark, df, path, date)
  def publishSelfReplace(spark: SparkSession, path: String, date: LocalDate,
      token: String): Unit =
    inner.publishSelfReplace(spark, path, date, token)
  def partitionFiles(spark: SparkSession, path: String,
      date: LocalDate): Seq[(String, Long)] =
    inner.partitionFiles(spark, path, date)
  def partitionFileCounts(spark: SparkSession,
      path: String): Map[LocalDate, Int] =
    inner.partitionFileCounts(spark, path)
  def recoverSelfReplace(spark: SparkSession, path: String,
      date: LocalDate): Unit = inner.recoverSelfReplace(spark, path, date)
  def recoverAllSelfReplace(spark: SparkSession, path: String): Unit =
    inner.recoverAllSelfReplace(spark, path)
  def withTableLocks[T](reads: Seq[String], writes: Seq[String])(body: => T): T =
    inner.withTableLocks(reads, writes)(body)
}
