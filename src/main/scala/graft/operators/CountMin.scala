package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
 * summary: the count-min sketch and its applications", 2005): a d×w
 * integer counter grid where every key increments one counter per hash
 * row, and a key's frequency estimate is the MIN of its d counters —
 * always ≥ the true count, within εN with probability 1−δ for
 * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
 *
 * Scale shape: building the sketch is ONE aggregation whose group count
 * is d·w — a few thousand groups regardless of input size — so the
 * shuffle carries bounded partial sums and the finished sketch is a
 * broadcastable few-KB table (the whole point at 100 TB: frequency
 * queries without a full groupBy over the key space, and sketches from
 * disjoint partitions/days merge by cell-wise addition). Hashing is the
 * repo's engine-portable md5-prefix pattern (same as the q24 split and
 * s02 hyperplanes), so a DuckDB oracle reproduces every counter
 * bit-for-bit — the estimates are exact integers, not approximations of
 * the gate.
 */
object CountMin {

  /** Row-i bucket of `key` in a width-`w` sketch: top-60-bit md5 of
   * "i:key", mod w. Engine-portable (DuckDB: CAST('0x'||substr(md5(..),
   * 1,15) AS BIGINT) % w). */
  def bucket(key: Column, i: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 15),
      16, 10).cast("long") % width

  /** Build the d×w counter table `(i, b, n)` from one pass over `df`.
   * One aggregation, d·w bounded groups, map-side combined. */
  def counters(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame =
    df.select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"),
          bucket(col(keyCol), i, width).as("b"))): _*)).as("ib"))
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(count(lit(1)).as("n"))

  /** Point-estimate every key of `keys` against a finished counter
   * table: est(key) = min_i counters(i, h_i(key)) — the counter grid
   * broadcasts (d·w rows), so this is a map-side join at any key count.
   * The join is LEFT outer with absent cells coalesced to 0: a counter
   * row missing from the table means no key hashed there (count 0), so
   * a never-sketched probe key correctly estimates 0 instead of taking
   * min over fewer than d counters — or vanishing from the output. */
  def estimate(keys: DataFrame, keyCol: String, counterTab: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val exploded = keys.select(col(keyCol),
      explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"),
          bucket(col(keyCol), i, width).as("b"))): _*)).as("ib"))
    exploded
      .join(broadcast(counterTab),
        exploded("ib.i") === counterTab("i") &&
          exploded("ib.b") === counterTab("b"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_est"))
  }
}
