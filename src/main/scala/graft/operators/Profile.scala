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
    val counts = df.select(
      count(lit(1)).as("__n") +:
        cols.flatMap(c => Seq(
          count(when(col(c).isNull, 1)).as(s"__null_$c"),
          (if (exactDistinct) count_distinct(col(c))
           else approx_count_distinct(col(c))).as(s"__ndv_$c"))): _*)
    // unpivot the single stats row into (col_name, n, n_null, n_distinct)
    val stacked = cols.map(c =>
      s"'$c', __n, __null_$c, __ndv_$c").mkString(", ")
    counts.selectExpr(
      s"stack(${cols.size}, $stacked) AS (col_name, n, n_null, n_distinct)")
  }
}
