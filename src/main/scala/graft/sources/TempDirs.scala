package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/** The one recursive-delete / scratch-directory idiom, shared by every
  * engine-owned temp location (sink roundtrip, IVF index root, silver
  * point layout, JSON fixtures) and the specs — previously six
  * hand-rolled copies of the same walk-and-delete snippet, each a
  * separate place to fix. */
object TempDirs {

  /** Delete a directory tree, tolerating entries that vanish
    * concurrently (shutdown hooks from several exits can race). */
  def deleteTree(p: Path): Unit =
    try {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    } catch { case _: java.io.IOException => () }

  /** Fresh temp directory removed on JVM exit: concurrent PROCESSES
    * get distinct dirs so they cannot race on a fixed path, and
    * nothing accumulates across runs. */
  def scratchDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook(deleteTree(p))
    p
  }
}
