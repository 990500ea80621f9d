package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SCD type-2 dimension build (Kimball): turn a change log into
 * versioned attribute history — a new version opens only when the
 * attribute CHANGES (lag-compare), versions carry
 * `[valid_from, valid_to)` microsecond intervals via lead(), and the
 * open version is flagged current.
 *
 * Plan shape: one window pass keyed by the dimension key (change flag +
 * running version number ride the same sort), one aggregate per
 * version, one lead() window over the per-version table — shuffles
 * scale with key count, not history length. All timestamps are integer
 * microseconds end-to-end (the cross-engine-exact domain; DuckDB
 * surfaces parquet TIMESTAMP(NANOS) at µs precision).
 *
 * [[maintain]] is the incremental-maintenance counterpart: apply a new
 * event batch to an existing SCD2 table by recomputing ONLY the touched
 * keys (their full history) and carrying every untouched key's rows
 * over verbatim — the standard partition-upsert strategy. Correctness
 * contract (hash-gated in q70): maintain(build(old), batch) ≡
 * build(old ∪ batch).
 */
object Scd2 {

  /** Build the SCD2 table from a change log. Output:
   * `(key, ver, attr, valid_from_us, valid_to_us, n_events, is_current)`
   * with caller-facing column names taken from the input columns. */
  def build(events: DataFrame, keyCol: String, attrCol: String,
      usCol: String, idCol: String): DataFrame = {
    val k = col(keyCol)
    val w = Window.partitionBy(k).orderBy(col(usCol), col(idCol))
    val flagged = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col(attrCol),
          lit(1)).otherwise(lit(0)))
      .withColumn("ver", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = flagged.groupBy(k, col("ver"))
      .agg(min(col(attrCol)).as(attrCol),
        min(col(usCol)).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(k).orderBy(col("ver"))
    versions
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wv))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(k, col("ver"), col(attrCol), col("valid_from_us"),
        col("valid_to_us"), col("n_events"), col("is_current"))
  }

  /**
   * Incrementally apply `batch` (new change-log events) to an existing
   * SCD2 table built from `baseEvents`: keys with batch activity are
   * rebuilt from their full event history (base ∪ batch — at scale this
   * reads only the touched keys' partitions), all other keys' version
   * rows carry over untouched. Equals a from-scratch [[build]] over
   * base ∪ batch — the property the q70 gate hash-proves.
   */
  def maintain(baseScd: DataFrame, baseEvents: DataFrame,
      batch: DataFrame, keyCol: String, attrCol: String, usCol: String,
      idCol: String): DataFrame = {
    val touched = batch.select(col(keyCol)).distinct()
    val untouched = baseScd.join(touched, Seq(keyCol), "left_anti")
    val rebuilt = build(
      baseEvents.join(touched, Seq(keyCol), "left_semi")
        .unionByName(batch),
      keyCol, attrCol, usCol, idCol)
    untouched.unionByName(rebuilt)
  }
}
