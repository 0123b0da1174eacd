package graft.tableops

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}

/** A local filesystem masquerading as an object store: scheme `fakeobj`,
  * no registered commit publisher. Hadoop instantiates it by reflection
  * from `fs.fakeobj.impl`, so it must be a public top-level class.
  */
class FakeObjectStoreFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fakeobj"
  override def getUri: URI = URI.create("fakeobj:///")

  // RawLocalFileSystem's statuses load permissions LAZILY by building a
  // java.io.File from the status path's URI — which rejects any scheme
  // but file:. Materialize harmless permissions up front instead.
  private def solid(s: org.apache.hadoop.fs.FileStatus) =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
      s.getReplication, s.getBlockSize, s.getModificationTime,
      s.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getFileDefault,
      "test", "test", s.getPath)
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    solid(super.getFileStatus(f))
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(solid)
}

/** A second fake scheme that NOTHING ever registers a publisher for —
  * the rejection test's scheme must stay unregistered regardless of
  * test order (the routing test permanently registers `fakeobj` in the
  * process-global registry).
  */
class UnpublishableFileSystem extends FakeObjectStoreFileSystem {
  override def getScheme: String = "fakeobj2"
  override def getUri: URI = URI.create("fakeobj2:///")
}

/** The object-store publish seam (VERDICT r8 #6): tryCommit used to
  * assume atomic no-overwrite rename for every non-`file` scheme — true
  * on HDFS, silently WRONG on raw object stores. Now the publisher is
  * per-scheme and unknown schemes fail fast instead of losing races.
  */
class LogPublisherSpec extends graft.SparkTestBase {
  import spark.implicits._

  private def fakeRoot(scheme: String, cls: Class[_]): String = {
    spark.sparkContext.hadoopConfiguration.set(s"fs.$scheme.impl",
      cls.getName)
    // RawLocalFileSystem paths are plain local paths under the scheme
    s"$scheme:" + Files.createTempDirectory(s"graft-$scheme").toString
  }

  test("a scheme with no registered publisher is rejected loudly at the " +
    "first commit — never optimistically renamed") {
    // fakeobj2 is NEVER registered by anything, so this test holds in
    // any order relative to the routing test below
    val root = fakeRoot("fakeobj2", classOf[UnpublishableFileSystem])
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    val e = intercept[IllegalArgumentException] {
      wh.append(spark,
        Seq((1L, java.sql.Date.valueOf("2024-06-01"))).toDF("v", "date"), path)
    }
    assert(e.getMessage.contains("fakeobj2"))
    assert(e.getMessage.contains("conditional-put"))
    // nothing was committed
    assert(wh.currentVersion(spark, path) == 0L)
  }

  test("a registered conditional-put publisher routes the commit and the " +
    "table works end-to-end on the foreign scheme") {
    val root = fakeRoot("fakeobj", classOf[FakeObjectStoreFileSystem])
    val used = new AtomicInteger(0)
    // a stand-in conditional put: exists-check + rename is fine on the
    // LOCAL store backing the fake scheme; the point under test is the
    // ROUTING, not the store's atomicity
    LogPublisher.register("fakeobj", new LogPublisher {
      def publish(f: FileSystem, tmp: Path, dest: Path): Boolean = {
        used.incrementAndGet()
        if (f.exists(dest)) false else f.rename(tmp, dest)
      }
    })
    val wh = new TxWarehouse(root)
    val path = wh.tablePath("m", "t")
    val d = java.sql.Date.valueOf("2024-06-01")
    wh.append(spark, Seq((1L, d), (2L, d)).toDF("v", "date"), path)
    wh.append(spark, Seq((3L, d)).toDF("v", "date"), path)
    assert(used.get() >= 2, "commits did not route through the publisher")
    assert(wh.read(spark, path).count() == 3)
    assert(wh.currentVersion(spark, path) == 2L)
    // metadata-only delete commits through the same seam
    wh.deletePartition(spark, path, java.time.LocalDate.parse("2024-06-01"))
    assert(wh.read(spark, path).count() == 0)
  }
}
