package graft.tools

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** S6 acquisition guard: the history-file idempotence the reference's
 * downloader enforces (download.py:37-44, 97-100). */
class AcquireSpec extends AnyFunSuite {

  test("acquire lands once, skips on re-acquisition, appends history") {
    val landing = Files.createTempDirectory("gcd_landing")
    val dump = Files.createTempFile("gcd_dump", ".zip")
    Files.writeString(dump, "dump-bytes-v1")
    val ts = "2026-08-01 03:14:00"

    assert(GcdAcquire.acquire(dump, ts, landing))
    val landed = landing.resolve(GcdAcquire.dumpName(ts))
    assert(Files.exists(landed))
    assert(Files.readString(landed) == "dump-bytes-v1")
    assert(GcdAcquire.history(landing) == Seq(ts))

    // same timestamp again → refused, nothing rewritten
    Files.writeString(dump, "dump-bytes-DIFFERENT")
    assert(!GcdAcquire.acquire(dump, ts, landing))
    assert(Files.readString(landed) == "dump-bytes-v1")
    assert(GcdAcquire.history(landing) == Seq(ts))

    // a NEW timestamp lands alongside and extends the history
    val ts2 = "2026-09-01 03:14:00"
    assert(GcdAcquire.acquire(dump, ts2, landing))
    assert(GcdAcquire.history(landing) == Seq(ts, ts2))
    assert(Files.readString(landing.resolve(GcdAcquire.dumpName(ts2))) ==
      "dump-bytes-DIFFERENT")
    // no stray .part temp files after success
    val parts = Files.list(landing).filter(_.getFileName.toString
      .endsWith(".part")).count()
    assert(parts == 0)
  }
}
