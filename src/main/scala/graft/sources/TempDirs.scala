package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** The one recursive-delete / scratch-directory idiom, shared by every
  * engine-owned temp location (sink roundtrip, IVF index root, silver
  * point layout, JSON fixtures) and the specs — previously six
  * hand-rolled copies of the same walk-and-delete snippet, each a
  * separate place to fix. */
object TempDirs {

  /** STRICT recursive delete: a missing tree or concurrently-vanished
    * entries are fine (`deleteIfExists`), but real I/O failures
    * propagate — callers that need the space actually freed (e.g. a
    * pre-publish cleanup before an atomic rename) must see the true
    * cause here, not a confusing DirectoryNotEmptyException later. */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }

  /** Shutdown-hook variant: several exits can race on one tree and
    * there is nobody left to handle a failure, so it is swallowed. */
  def deleteTreeQuietly(p: Path): Unit =
    try deleteTree(p) catch { case _: java.io.IOException => () }

  /** Fresh temp directory removed on JVM exit: concurrent PROCESSES
    * get distinct dirs so they cannot race on a fixed path, and
    * nothing accumulates across runs. */
  def scratchDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook(deleteTreeQuietly(p))
    p
  }
}
