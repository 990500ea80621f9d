package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, classic}

/**
 * The one `private[sql]` doorway [[graft.Frames.cp]] needs: rebuild a
 * DataFrame from an (already materialized) frame's INTERNAL row RDD,
 * so the resulting LogicalRDD carries fresh default statistics without
 * paying the InternalRow → external Row → InternalRow round-trip that
 * `createDataFrame(df.rdd, schema)` costs on every downstream read
 * (round-13 advice: the external conversion taxed each of the 2×
 * per-iteration joins re-reading a connected-components checkpoint).
 *
 * Lives under `org.apache.spark.sql` solely to reach
 * `internalCreateDataFrame` — public Spark artifact, no internals
 * copied. The input must be an eager `localCheckpoint()` result: its
 * plan is already a LogicalRDD over cached rows, so `toRdd` is a
 * per-partition unsafe projection over the cache, not a recompute.
 */
object InternalFrames {

  /** `df` rebuilt over its internal RDD with scan-default stats. */
  def statsResetCopy(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
