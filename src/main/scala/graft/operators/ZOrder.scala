package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) clustering: interleave the bits of two columns so
 * that sorting by the single z-value co-locates rows that are close in
 * BOTH dimensions. Written with that layout, parquet row-group min/max
 * stats become selective for predicates on EITHER column — the standard
 * multi-dimensional data-skipping trick (Delta/Iceberg `ZORDER BY`) that a
 * single-column sort cannot give. At 100 TB this turns "scan everything
 * for a (partkey, suppkey) box query" into "prune all but the few tiles
 * the box overlaps".
 *
 * The z-value is a static expression tree of shift/mask/add terms (bits
 * are disjoint, so `+` ≡ `|`) — whole-stage-codegen'd, engine-portable
 * integer math, no UDF. [[zSql]] emits the identical arithmetic as SQL so
 * an external engine (the DuckDB oracle, or any reader of the written
 * layout) computes the same curve.
 */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
   * positions) into a `2·bits`-wide z-value. Callers pass NON-NEGATIVE
   * already-bounded columns (use `pmod` / `% (1 << bits)` upstream);
   * `bits ≤ 30` keeps the result well inside int64. */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 30, "bits must be in [1, 30]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** z-value of two non-negative long columns, each bounded to `bits` bits
   * by modulus (rank- or min-max-normalize upstream for arbitrary ranges). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    interleave(pmod(x, lit(1L << bits)), pmod(y, lit(1L << bits)), bits)

  /** The identical z-value arithmetic as engine-portable SQL, including the
   * same pmod bounding [[zValue]] applies — `zSql(x, y, b)` ≡
   * `zValue(col(x), col(y), b)` for ALL inputs, negatives included
   * (`%` alone is remainder in both engines, so the double-mod idiom
   * spells pmod portably). */
  def zSql(x: String, y: String, bits: Int): String = {
    val m = 1L << bits
    val xb = s"((($x) % $m + $m) % $m)"
    val yb = s"((($y) % $m + $m) % $m)"
    (0 until bits).map { i =>
      s"(($xb >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($yb >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
  }

  /**
   * Layout operator: range-partition by z-value and sort within partitions,
   * so each output file / row group covers one compact z-range (a small
   * 2-D tile). `repartitionByRange` samples quantiles — balanced output
   * files even when the key distribution is skewed.
   */
  def cluster(df: DataFrame, x: String, y: String, bits: Int,
      numPartitions: Int): DataFrame = {
    // Collision-free temp name: a caller's own "__z" (or "__z0"…) column
    // must survive the round-trip untouched.
    val tmp = Iterator.from(0).map(i => if (i == 0) "__z" else s"__z$i")
      .find(n => !df.columns.contains(n)).get
    val withZ = df.withColumn(tmp, zValue(col(x), col(y), bits))
    withZ.repartitionByRange(numPartitions, col(tmp))
      .sortWithinPartitions(col(tmp))
      .drop(tmp)
  }
}
