package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Snapshot/table diff: classify every key of two table versions as
 * `added` / `removed` / `changed` / `unchanged` — the month-over-month
 * dump-comparison a GCD operator runs after each acquisition (the
 * reference re-snapshots the full dump monthly, Main.java:54-60 date arg;
 * diffing consecutive `snapshot=YYYYMMDD` partitions is the natural audit
 * on top of `GcdSink`'s layout).
 *
 * Scale shape: ONE full-outer shuffle join on the key columns — both
 * sides shuffle-partition identically, so at 100 TB this is two scans +
 * one co-partitioned exchange each. Row comparison is a null-safe
 * equality conjunction over the value columns (`<=>`), evaluated inside
 * codegen — no string serialization, no hashing, no driver round-trips,
 * and double columns compare by value without cross-engine formatting
 * hazards.
 */
object SnapshotDiff {

  /**
   * Diff `newer` against `older` on `keys`. Output: key columns +
   * `change_type` string. Value columns = all non-key columns the two
   * sides share (checked); extra columns on either side are ignored.
   */
  def diff(older: DataFrame, newer: DataFrame, keys: Seq[String])
      : DataFrame = {
    val valueCols = older.columns.filterNot(keys.contains)
      .filter(newer.columns.contains).toSeq
    require(valueCols.nonEmpty, "no shared value columns to compare")

    val o = older.withColumn("__o_present", lit(true)).as("o")
    val n = newer.withColumn("__n_present", lit(true)).as("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k"))
      .reduce(_ && _)
    // presence markers, not key-null probes: a side with a genuinely NULL
    // key value must still count as present
    val oExists = col("o.__o_present").isNotNull
    val nExists = col("n.__n_present").isNotNull
    val same: Column = valueCols
      .map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduce(_ && _)

    o.join(n, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) :+
          when(!oExists, lit("added"))
            .when(!nExists, lit("removed"))
            .when(same, lit("unchanged"))
            .otherwise(lit("changed")).as("change_type"): _*)
  }

  /** Aggregate census of a diff: one row per change_type. */
  def census(d: DataFrame): DataFrame =
    d.groupBy(col("change_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("change_type"))
}
