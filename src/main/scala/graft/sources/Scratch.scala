package graft.sources

import java.nio.file.{Files, Path}
import java.util.Comparator

/**
 * Self-cleaning scratch directories for queries that must round-trip
 * through a filesystem sink (format round-trips, partitioned-sink gates,
 * streaming runs): every directory is registered for recursive deletion
 * on JVM exit, so repeated gate/bench invocations don't accumulate table
 * copies in the system temp dir.
 */
object Scratch {

  /** A fresh temp directory, recursively deleted when the JVM exits. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p)))
    p.toString
  }

  /** Eagerly delete a scratch dir that is known dead before JVM exit
   * (e.g. a retired q51 bucketed-table generation in a bench loop). The
   * exit hook tolerates the already-deleted path. */
  def deleteNow(dir: String): Unit = delete(Path.of(dir))

  private def delete(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}
