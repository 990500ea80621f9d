package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * S6 — dump-acquisition idempotence guard (SURVEY.md §2.1), the
 * engine-side analog of the reference's downloader
 * (/root/reference/src/main/python/download.py:37-44, 97-100): each dump
 * is identified by its upstream timestamp; a history file records every
 * timestamp already landed, a re-acquisition of a known timestamp is a
 * no-op "Already in download history" exit, and the timestamp is appended
 * only AFTER the dump lands completely — so a failed copy is retried, a
 * completed one never duplicates. The monthly-operator bug class this
 * kills: double-ingesting the same dump into the snapshot pipeline.
 *
 * The HTTP/CSRF/login half of the reference script is deployment
 * machinery outside the engine (and this environment has zero egress);
 * the source here is any local path (the dump zip or an extracted dir).
 *
 * Usage: runMain graft.tools.GcdAcquire <dumpPath> <timestamp> <landingDir>
 */
object GcdAcquire {

  val HistoryFile = "download_history.txt"

  /** Landed dump name for a timestamp (download.py:76 naming). */
  def dumpName(timestamp: String): String =
    s"gcd-dump-${timestamp.replace(' ', '_')}.zip"

  def history(landingDir: Path): Seq[String] = {
    val f = landingDir.resolve(HistoryFile)
    if (Files.exists(f)) Files.readAllLines(f).asScala.toSeq.map(_.trim)
      .filter(_.nonEmpty)
    else Seq.empty
  }

  /**
   * Land `dump` under `landingDir` unless `timestamp` is already in the
   * history. Returns true if the dump was landed, false if skipped.
   */
  def acquire(dump: Path, timestamp: String, landingDir: Path): Boolean = {
    Files.createDirectories(landingDir)
    if (history(landingDir).contains(timestamp)) {
      println(s"Already in download history: $timestamp")
      return false
    }
    val dest = landingDir.resolve(dumpName(timestamp))
    // land via temp + atomic move so a crash mid-copy never leaves a
    // partial file that looks landed; clean the temp on ANY failure so
    // retries don't accumulate .part debris in the landing dir
    val tmp = Files.createTempFile(landingDir, ".landing-", ".part")
    try {
      Files.copy(dump, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    Files.writeString(landingDir.resolve(HistoryFile), s"$timestamp\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(s"Landed ${dest.getFileName}")
    true
  }

  def main(args: Array[String]): Unit = {
    val Array(dumpPath, timestamp, landingDir) = args
    // exit 1 on skip — the same signal the reference emits (download.py:74)
    if (!acquire(Paths.get(dumpPath), timestamp, Paths.get(landingDir)))
      sys.exit(1)
  }
}
