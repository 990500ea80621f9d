package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bucketed time-range join: pair each left row with the right rows of the
 * same key whose timestamp falls in `[leftTs + loUs, leftTs + hiUs)`
 * (microsecond offsets) — the "events within N minutes before the error"
 * / "readings inside the interval" shape.
 *
 * Spark only executes an inequality join as a broadcast-nested-loop or a
 * per-key theta join — O(|key group|²) on a busy key. The scale path
 * quantizes time into buckets of the window width: a left row's window
 * then overlaps at most TWO buckets, so candidates come from an
 * EQUALITY join on (key, bucket) — one ordinary shuffle, partition-sized
 * by data volume, not by key fan-out — and the exact range predicate
 * filters the candidates.
 *
 * Bucket arithmetic uses `floor(µs / width)` in double precision, exact
 * while |µs| < 2^53 (epoch-µs stays below that until year 2255 —
 * nanosecond inputs would NOT be safe; convert to µs first, as
 * `sources.Tables` does).
 */
object RangeJoin {

  /**
   * @param leftTsUs / rightTsUs epoch-microsecond long columns
   * @return left row + right row pairs (columns prefixed `l_` / `r_`
   *         collisions avoided by the caller's projection)
   */
  def timeWindowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, loUs: Long, hiUs: Long)
      : DataFrame = {
    require(hiUs > loUs, "window must be non-empty")
    val w = hiUs - loUs
    // window [lTs+lo, lTs+hi) spans at most 2 width-w buckets
    val b0 = floor((col(leftTsUs) + lit(loUs)) / lit(w)).cast("long")
    val b1 = floor((col(leftTsUs) + lit(hiUs) - 1) / lit(w)).cast("long")
    val l = left.withColumn("__bucket",
      explode(array_distinct(array(b0, b1))))
    val r = right.withColumn("__bucket",
      floor(col(rightTsUs) / lit(w)).cast("long"))
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      l("__bucket") === r("__bucket") &&
      r(rightTsUs) >= l(leftTsUs) + lit(loUs) &&
      r(rightTsUs) < l(leftTsUs) + lit(hiUs)
    l.join(r, cond, "inner").drop("__bucket")
  }
}
