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

/** A third fake scheme reserved for the conditional-put end-to-end runs
  * (contract race below + MultiDriverE2ESpec), so its registration
  * can't collide with the routing test's stand-in publisher.
  */
class CasObjectStoreFileSystem extends FakeObjectStoreFileSystem {
  override def getScheme: String = "casobj"
  override def getUri: URI = URI.create("casobj:///")
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

  test("conditional-put contract: of N concurrent publishes of one " +
    "version, exactly one wins and the landed bytes are the winner's") {
    val dir = Files.createTempDirectory("graft-casput")
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .getRawFileSystem
    val publisher = new ConditionalPutPublisher(new InMemoryCasKeySpace)
    val dest = new Path(s"$dir/_log/000042.commit")
    fs.mkdirs(dest.getParent)
    val n = 16
    val tmps = (0 until n).map { i =>
      val t = new Path(s"$dir/tmp-$i")
      val out = fs.create(t)
      out.write(s"writer-$i".getBytes("UTF-8")); out.close()
      t
    }
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        start.await()
        if (publisher.publish(fs, tmps(i), dest)) { wins.add(i); () }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(wins.size == 1, s"winners: $wins — the CAS must admit exactly one")
    val winner = wins.peek()
    val in = fs.open(dest)
    val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(body == s"writer-$winner", "losing bytes landed at the destination")
    // replays of the same version lose forever
    assert(!publisher.publish(fs, tmps((winner + 1) % n), dest))
  }

  test("conditional-put second fence: a destination that pre-exists on " +
    "the store turns a fresh claim into a loss, never an overwrite") {
    val dir = Files.createTempDirectory("graft-casput2")
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .getRawFileSystem
    val dest = new Path(s"$dir/000007.commit")
    val out = fs.create(dest); out.write("earlier process".getBytes("UTF-8")); out.close()
    val tmp = new Path(s"$dir/tmp")
    val o2 = fs.create(tmp); o2.write("late writer".getBytes("UTF-8")); o2.close()
    // a FRESH key space (this JVM never saw the earlier commit) grants
    // the claim — the create(overwrite=false) fence must still refuse
    val publisher = new ConditionalPutPublisher(new InMemoryCasKeySpace)
    assert(!publisher.publish(fs, tmp, dest))
    val in = fs.open(dest)
    val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(body == "earlier process")
  }
}
