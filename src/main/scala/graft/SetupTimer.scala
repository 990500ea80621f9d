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

  private val walls = mutable.LinkedHashMap.empty[String, Double]

  /** Run `body`, recording its wall seconds under the cache name.
   * Call from INSIDE the cache's getOrElseUpdate so the cost is
   * recorded exactly once per JVM, by whichever gate built it. */
  def time[T](cache: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val secs = (System.nanoTime() - t0) / 1e9
    synchronized { walls(cache) = walls.getOrElse(cache, 0.0) + secs }
    r
  }

  /** Sum of every recorded one-time build, seconds. */
  def total: Double = synchronized { walls.values.sum }

  /** JSON object {cache: secs}; empty object when nothing built. */
  def json: String = synchronized {
    walls.map { case (c, v) =>
      "\"" + c + "\":" + BigDecimal(v)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
  }
}
