package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Deterministic sampling / splitting / ordering for training-data
 * pipelines. Everything derives from the md5-based [[TF.hash60]] of a key
 * — no RNG state, so any engine (and any rerun, at any parallelism)
 * produces the same sample, the same train/val split, and the same
 * shuffle order. At 100 TB this is the property that matters: splits
 * stay stable across reruns and engines, and the operators are pure
 * narrow projections/filters (no shuffle except an explicit sort).
 */
object Sampling {

  /** Uniform hash-bucket of a key in [0, buckets). */
  def hashBucket(key: Column, buckets: Int): Column =
    TF.hash60(key.cast("string")) % buckets

  /** Deterministic p-percent sample: keep rows whose key hashes into the
   * first `percent` of 100 buckets. */
  def sample(df: DataFrame, keyCol: String, percent: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), 100) < percent)

  /** Stable train/val/test split label from the key hash. Fractions are
   * integer percents; remainder goes to the last label. */
  def splitLabel(key: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.map(_._2).sum == 100, "split percents must total 100")
    val b = hashBucket(key, 100)
    val (expr, _) = splits.init.foldLeft((when(lit(false), lit("")), 0)) {
      case ((acc, lo), (name, pct)) =>
        (acc.when(b < lo + pct, lit(name)), lo + pct)
    }
    expr.otherwise(lit(splits.last._1))
  }

  /** Deterministic global shuffle: order by the key hash (then the key,
   * for total order). One range-partitioned sort — the standard
   * "randomize training order reproducibly" pass. */
  def deterministicShuffle(df: DataFrame, keyCol: String): DataFrame =
    df.orderBy(TF.hash60(col(keyCol).cast("string")), col(keyCol))
}
