package graft

import scala.collection.mutable

/**
 * Per-stage wall clocks for multi-stage gate queries. A persisted-
 * artifact gate (g03/g04: snapshot-store init + maintain) pays its
 * artifact's BUILD price inside one bench entry; a single end-to-end
 * number can't distinguish "the serve path regressed" from "the
 * once-per-store init is priced in". Gates record their stages here and
 * [[Bench]] writes the map into the committed bench detail artifact, so
 * a round-over-round diff can attribute movement to the stage that
 * moved. Records the most recent rep's wall per (query, stage) — the
 * bench's median loop overwrites in place, and attribution needs a
 * representative split, not another median.
 */
object StageTimer {

  private val walls =
    mutable.LinkedHashMap.empty[String, mutable.LinkedHashMap[String, Double]]

  /** Run `body`, recording its wall seconds under (query, stage). */
  def time[T](query: String, stage: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val secs = (System.nanoTime() - t0) / 1e9
    synchronized {
      walls.getOrElseUpdate(query,
        mutable.LinkedHashMap.empty[String, Double])(stage) = secs
    }
    r
  }

  /** JSON object {query: {stage: secs}} for queries that recorded
   * stages; empty object when none ran. */
  def json: String = synchronized {
    walls.map { case (q, ss) =>
      "\"" + q + "\":" + ss.map { case (st, v) =>
        "\"" + st + "\":" + BigDecimal(v)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP)
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
  }
}
