package graft

import scala.collection.mutable

/**
 * One-time SETUP cost accounting for the per-JVM cached builds behind
 * the gated queries. Several gates share committed artifacts (the
 * streamed near-dup ingest feeds q108/q110/q111; the curated store
 * feeds q115/p05; …) built once per JVM and re-served by every rep —
 * the right measurement split (reps time the SERVE path, the artifact
 * is built once like a real pipeline would), but the round-13 verdict
 * showed its accounting hole: the build cost lands inside whichever
 * rep runs first and the median DROPS it, so ~59 s of real executed
 * work was invisible in the bench headline while the gates WITHOUT a
 * cache paid their ingest 3×.
 *
 * The fix has two halves, and this registry is the meeting point:
 * [[Bench]] triggers each gate's cached build BEFORE its timed reps
 * (via the [[graft.queries.Q.setup]] thunk — so no rep ever contains a
 * first-rep build artifact), every cache build site wraps itself in
 * [[time]] (so the cost is attributed to the CACHE that paid it, once,
 * no matter which gate triggered it), and the bench emits an explicit
 * `{"metric":"setup"}` line plus a `setup` field in the final summary:
 * the headline is serve total + setup total, with nothing dropped by
 * the median and nothing paid per-rep.
 */
object SetupTimer {

  /** One build's evidence: accumulated wall seconds, plus the FIRST
   * call's start stamp (epoch seconds) and 1-min loadavg — the same
   * per-query contention evidence the timed reps carry (r17 verdict
   * #2: the driver run's 116 s `curation_store` had no per-build load
   * stamp, so its attribution leaned on the run-level I/O canary). */
  private final case class Build(secs: Double, ts: Long, load: Double)

  private val walls = mutable.LinkedHashMap.empty[String, Build]

  /** 1-min loadavg, -1.0 when unreadable — the ONE copy of the probe
   * and its sentinel convention; [[Bench]] samples per-query loads
   * through this same helper so the setup_high_load comparison against
   * the query-load median can never desynchronize. */
  def loadavg(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Run `body`, recording its wall seconds under the cache name.
   * Call from INSIDE the cache's getOrElseUpdate so the cost is
   * recorded exactly once per JVM, by whichever gate built it. */
  def time[T](cache: String)(body: => T): T = {
    val ts = System.currentTimeMillis() / 1000
    val load = loadavg()
    val t0 = System.nanoTime()
    val r = body
    val secs = (System.nanoTime() - t0) / 1e9
    synchronized {
      walls(cache) = walls.get(cache) match {
        case Some(b) => b.copy(secs = b.secs + secs)
        case None    => Build(secs, ts, load)
      }
    }
    r
  }

  /** Sum of every recorded one-time build, seconds. */
  def total: Double = synchronized { walls.values.map(_.secs).sum }

  /** JSON object {cache: secs}; empty object when nothing built. */
  def json: String = synchronized {
    walls.map { case (c, b) =>
      "\"" + c + "\":" + BigDecimal(b.secs)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
  }

  /** JSON object {cache: {"ts": epochSecs, "load": loadavg}} — the
   * build-start stamps the detail artifact pairs with `setup_builds`,
   * mirroring the queries' rep_ts/load fields. */
  def metaJson: String = synchronized {
    walls.map { case (c, b) =>
      "\"" + c + "\":{\"ts\":" + b.ts + ",\"load\":" +
        BigDecimal(b.load).setScale(2, BigDecimal.RoundingMode.HALF_UP) +
        "}"
    }.mkString("{", ",", "}")
  }

  /** (cache, load) pairs for the bench's high-load self-labeling. */
  def loads: Seq[(String, Double)] = synchronized {
    walls.map { case (c, b) => (c, b.load) }.toSeq
  }
}
