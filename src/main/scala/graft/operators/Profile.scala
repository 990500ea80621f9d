package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Table profiling: one output row per profiled column — row count, null
 * count, exact distinct count — the first query anyone runs against an
 * unfamiliar table.
 *
 * Shape: a single aggregate pass computes count/nulls for ALL columns at
 * once (one scan, no shuffle beyond the final singleton aggregate);
 * exact distinct counts run as one grouped aggregate per column on a
 * shared cached scan. Exact ndv per column is inherently one shuffle
 * each — at 100 TB swap `exactDistinct = false` to use HLL
 * (`approx_count_distinct`) and the whole profile is ONE pass, no
 * shuffle of data at all.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    // internal stat columns are keyed by POSITION, and the readable name
    // re-enters only as an escaped literal — so column names that aren't
    // bare identifiers (dashes, spaces, quotes) profile fine
    val counts = df.select(
      count(lit(1)).as("__n") +:
        cols.zipWithIndex.flatMap { case (c, i) => Seq(
          count(when(col(c).isNull, 1)).as(s"__null_$i"),
          (if (exactDistinct) count_distinct(col(c))
           else approx_count_distinct(col(c))).as(s"__ndv_$i"))
        }: _*)
    // unpivot the single stats row into (col_name, n, n_null, n_distinct)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      val escaped = c.replace("\\", "\\\\").replace("'", "\\'")
      s"'$escaped', __n, __null_$i, __ndv_$i"
    }.mkString(", ")
    counts.selectExpr(
      s"stack(${cols.size}, $stacked) AS (col_name, n, n_null, n_distinct)")
  }
}
