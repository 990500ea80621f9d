package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact interpolated percentiles per group with BOUNDED aggregation
 * state — the scale-safe replacement for Spark's `percentile()`, whose
 * `TypedImperativeAggregate` buffers a per-group map of every distinct
 * value (unbounded on a continuous domain: a 100× run on raw doubles
 * holds ~all input values in executor memory at the final merge).
 *
 * The q68 cell-grid decomposition applied to percentile selection:
 *
 *   1. one pass builds a tiny per-(group, cell) histogram over a
 *      256-cell monotone value grid (a pure function of the value —
 *      no sampling, no partition-id dependence) → running offsets +
 *      per-group totals, all on a ~(groups × 256)-row table;
 *   2. the interpolation positions `p·(n−1)` resolve — on that tiny
 *      table alone — to at most TWO global ranks per percentile, and
 *      each rank to the single cell whose offset range covers it;
 *   3. only the handful of needed cells are rank-sorted (row_number
 *      within (group, cell), ~N/256 rows per cell, parallel across
 *      cells); every other row is never sorted at all;
 *   4. the fetched rank values combine with Spark's own interpolation
 *      tree — `v_lo` when the position is integral, else
 *      `(hi − pos)·v_lo + (pos − lo)·v_hi` — so results are
 *      bit-identical to `percentile()` (each step is a single
 *      correctly-rounded IEEE op on exact integer-derived operands).
 *
 * Peak state: the histogram (bounded by groups × nCells) plus one
 * sorted cell per task — never a per-group value map. Adversarially
 * constant values collapse cells (same documented limit as q68); the
 * degenerate single-cell sort is still per-(group, cell)-keyed.
 */
object GridPercentile {

  /**
   * One row per group: `groupCol` plus one double column per `(name, p)`
   * in `pcts`, each the exact interpolated p-percentile of `valueCol`
   * (nulls ignored, like `percentile()`/`quantile_cont`).
   */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[(String, Double)], nCells: Int = 256): DataFrame = {
    require(pcts.nonEmpty)
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    val bounds = vals.agg(min(col("__v")).as("mn"), max(col("__v")).as("mx"))
    val cellExpr = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(
        floor((col("__v") - col("mn")) * nCells / (col("mx") - col("mn")))
          .cast("long"),
        lit(nCells - 1L)))
    val withCell = vals.crossJoin(broadcast(bounds))
      .withColumn("__cell", cellExpr)
      .select(col("__g"), col("__v"), col("__cell"))
    // tiny per-(group, cell) histogram → running offsets + group totals
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__cell"))
    val offs = withCell.groupBy(col("__g"), col("__cell"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col("__g"))))
    // interpolation positions per (group, percentile): pos = p·(n−1)
    // (the exact multiplication percentile() performs), bracketed by the
    // floor/ceil ranks — all derived from the tiny totals
    val pctArr = array(pcts.map { case (nm, p) =>
      struct(lit(nm).as("__pname"), lit(p).as("__p")) }: _*)
    val needs = offs.select(col("__g"), col("__n")).distinct()
      .select(col("__g"), col("__n"), explode(pctArr).as("__pc"))
      .select(col("__g"), col("__pc.__pname").as("__pname"),
        (col("__pc.__p") * (col("__n") - 1).cast("double")).as("__pos"))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    // the (1-based) ranks to fetch, and the one cell covering each rank
    val needRanks = needs.select(col("__g"),
      explode(array(col("__lo") + 1, col("__hi") + 1)).as("__rn"))
      .distinct()
    val cellOff = needRanks.alias("r")
      .join(offs.alias("o"), col("r.__g") === col("o.__g") &&
        col("r.__rn") > col("o.__off") &&
        col("r.__rn") <= col("o.__off") + col("o.__c"))
      .select(col("o.__g").as("__g"), col("__cell"), col("__off"))
      .distinct()
    // rank ONLY the needed cells (row_number within (group, cell))
    val wLoc = Window.partitionBy(col("__g"), col("__cell"))
      .orderBy(col("__v"))
    val vAt = withCell.join(broadcast(cellOff), Seq("__g", "__cell"))
      .withColumn("__rn",
        col("__off") + row_number().over(wLoc).cast("long"))
      .join(broadcast(needRanks), Seq("__g", "__rn"), "left_semi")
      .select(col("__g"), col("__rn"), col("__v"))
    // percentile()'s interpolation tree, bit-for-bit
    val res = needs.alias("n")
      .join(vAt.alias("lo"), col("n.__g") === col("lo.__g") &&
        col("n.__lo") + 1 === col("lo.__rn"))
      .join(vAt.alias("hi"), col("n.__g") === col("hi.__g") &&
        col("n.__hi") + 1 === col("hi.__rn"))
      .select(col("n.__g").as("__g"), col("__pname"),
        when(col("__hi") === col("__lo"), col("lo.__v"))
          .otherwise(
            (col("__hi").cast("double") - col("__pos")) * col("lo.__v") +
              (col("__pos") - col("__lo").cast("double")) * col("hi.__v"))
          .as("__val"))
    res.groupBy(col("__g"))
      .agg(pcts.head match { case (nm, _) =>
          max(when(col("__pname") === nm, col("__val"))).as(nm) },
        pcts.tail.map { case (nm, _) =>
          max(when(col("__pname") === nm, col("__val"))).as(nm) }: _*)
      .withColumnRenamed("__g", groupCol)
  }
}
