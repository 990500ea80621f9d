package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Generic as-of join: for each left row, the LATEST right row of the same
 * key with `rightTs < leftTs` (strict, default) or `≤` (non-strict) —
 * quotes-for-trade, last-state-before-event, attribution.
 *
 * Implementation is the union + ordered-window trick, NOT a theta join:
 * both sides are tagged and unioned, ONE shuffle partitions by key and
 * orders by (ts, side, tiebreak), and a running `last(right_row)` window
 * carries the newest preceding right row onto every left row. Cost is a
 * single exchange + sort over |left| + |right| — no per-key quadratic
 * candidate set, no broadcast requirement, and skew behaves like any
 * window (AQE-splittable), which is why this shape survives 100 TB where
 * `left JOIN right ON key AND rts < lts` (a per-key nested loop) does not.
 *
 * Output: every left column, plus an `asof` struct of the matched right
 * row (null when no right row precedes). Equal-timestamp semantics are
 * decided by the side sort; ties among right rows break by `tieBreak`
 * ascending (any orderable type), so "latest" is the greatest
 * (ts, tieBreak). NULL keys follow join semantics: they never match, so
 * a null-keyed left row gets a null `asof`.
 */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, tieBreak: String,
      strict: Boolean = true): DataFrame = {
    val rType = StructType(right.schema.fields)
    val lType = StructType(left.schema.fields)

    // strict: left sorts BEFORE right at equal ts (side 0) so an
    // equal-ts right row is not yet visible; non-strict: right first.
    val (lSide, rSide) = if (strict) (0, 1) else (1, 0)
    val tieType = right.schema(tieBreak).dataType
    val l = left.select(
      keys.map(col) :+ col(leftTs).as("__t") :+ lit(lSide).as("__side") :+
        lit(null).cast(tieType).as("__tie") :+
        struct(left.columns.map(col): _*).as("__lv") :+
        lit(null).cast(rType).as("__rv"): _*)
    // join semantics: a NULL key never matches — drop null-keyed right
    // rows (the window's partitionBy would otherwise group nulls together
    // and hand null-keyed left rows a bogus match)
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) :+ col(rightTs).as("__t") :+ lit(rSide).as("__side") :+
          col(tieBreak).as("__tie") :+
          lit(null).cast(lType).as("__lv") :+
          struct(right.columns.map(col): _*).as("__rv"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === lSide && col("__lv").isNotNull)
      .select(col("__lv.*"), col("__asof").as("asof"))
  }
}
