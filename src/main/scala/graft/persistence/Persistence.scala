package graft.persistence

import java.nio.file.{Files, Path, StandardCopyOption}

/** Named JSON-blob persistence (reference: persistence/persistence.go:9-44).
  * Writers persist state BEFORE advancing (save-before-advance crash
  * semantics, job-service/iterators.go:23-28): a restart re-does work,
  * never skips it.
  */
trait NamedSaver {
  def save(name: String, json: String): Unit
  def load(name: String): Option[String]
}

/** Local-file saver: one `<dir>/<name>.json` per name; atomic via temp+move. */
final class LocalNamedSaver(dir: Path) extends NamedSaver {
  Files.createDirectories(dir)

  override def save(name: String, json: String): Unit = {
    val tmp = dir.resolve(s"$name.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, dir.resolve(s"$name.json"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  override def load(name: String): Option[String] = {
    val p = dir.resolve(s"$name.json")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }
}

/** In-memory saver for tests (analog of the reference's fake savers). */
final class MemorySaver extends NamedSaver {
  private val map = new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def save(name: String, json: String): Unit = map.put(name, json)
  override def load(name: String): Option[String] = Option(map.get(name))
  def saveCount: Int = map.size()
}

/** Saver that always fails — for crash-path tests. */
final class FailSaver extends NamedSaver {
  override def save(name: String, json: String): Unit =
    throw new java.io.IOException("FailSaver")
  override def load(name: String): Option[String] = None
}
