package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Skew mitigation for hot keys. AQE's skew-join handling splits oversized
 * partitions at runtime, but two shapes still need explicit salting:
 * aggregations with a dominant key (one reducer owns the hot key no
 * matter how AQE splits scans) and broadcast-infeasible joins against a
 * skewed fact side. The salt derives from [[TF.hash60]] of a
 * disambiguating column — deterministic, so results are reproducible and
 * engine-portable, never `rand()`.
 */
object Skew {

  /** Deterministic salt in [0, factor) from any per-row column (use a
   * high-cardinality column such as the row's id). NULL salt sources land
   * in bucket 0 — a NULL salt would otherwise null the `__salt` equality
   * and silently drop matching rows from [[saltedJoin]]. */
  def salt(c: Column, factor: Int): Column =
    coalesce(TF.hash60(c.cast("string")) % factor, lit(0L))

  /**
   * Two-phase salted count: groupBy (key, salt) partial-counts spread the
   * hot key across `factor` reducers, then a tiny second aggregation
   * merges the salted partials. Result ≡ `df.groupBy(key).count()`.
   */
  def saltedCount(df: DataFrame, keyCol: String, saltFrom: String,
      factor: Int): DataFrame =
    df.withColumn("__salt", salt(col(saltFrom), factor))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("count"))

  /**
   * Salted equi-join of a skewed `big` side against a `small` side that
   * is too large to broadcast: each big row gets a deterministic salt,
   * the small side is replicated `factor` ways, and the join key becomes
   * (key, salt) — the hot key's rows land on `factor` different
   * reducers instead of one. Row-for-row equivalent to the plain join.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltFrom: String, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", salt(col(saltFrom), factor))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) &&
        salted("__salt") === replicated("__salt"),
      "inner").drop("__salt")
  }
}
