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

  /**
   * Deterministic stratified sample: a different keep-percentage per
   * stratum (e.g. downsample English to 10%, keep low-resource languages
   * whole — the standard corpus-rebalancing pass). Rows in strata absent
   * from `percents` fall back to `defaultPercent`.
   *
   * Pure narrow filter: the per-stratum rate is a broadcast map lookup
   * and the keep decision is the same seedless hash-bucket as [[sample]]
   * — no shuffle, no RNG, stable under reruns/engines/parallelism, and
   * the stratum column never has to be shuffled to sample within it.
   */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      percents: Map[String, Int], defaultPercent: Int): DataFrame = {
    val rate = percents.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0))) { case (acc, (s, p)) =>
        acc.when(col(stratumCol) === s, lit(p))
      }.otherwise(lit(defaultPercent))
    df.filter(hashBucket(col(keyCol), 100) < rate)
  }
}
