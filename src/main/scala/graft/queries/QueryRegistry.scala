package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * One verifiable query: a Spark implementation plus (when the semantics are
 * ANSI-SQL-expressible) an equivalent DuckDB oracle. The driver hash-compares
 * the two result sets per round (CORRECTNESS_r{N}.json), so every column is
 * aliased identically on both sides and every query has a deterministic
 * total order.
 */
/**
 * @param setup optional one-time artifact build this query serves from
 *   (a per-JVM cache accessor). [[graft.Bench]] invokes it BEFORE the
 *   timed reps so no rep carries a first-rep build artifact — the
 *   build's cost is recorded once by [[graft.SetupTimer]] at the cache
 *   site and surfaces in the bench's explicit setup metric instead.
 *   [[graft.Verify]] ignores it (the run function hits the same cache
 *   on demand).
 */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    setup: Option[(SparkSession, String) => Unit] = None)

/**
 * Cross-engine exact arithmetic: double aggregation is order-dependent
 * (floating-point addition doesn't associate), so any SUM/AVG that must
 * hash-match DuckDB is computed on DECIMAL (exact, order-independent) and
 * only then cast back to double. The decimal cast of a double rounds to 6
 * fractional digits identically in Spark and DuckDB.
 */
object Exact {
  /** Exact fixed-point view of a double column (scale 6). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent SUM(double) that any engine reproduces bit-for-bit. */
  def dsum(c: Column): Column = F.sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG(double): exact decimal sum / count, in doubles. */
  def davg(c: Column): Column =
    F.sum(dec(c)).cast(DoubleType) / F.count(c)

  /** DuckDB spelling of [[dec]]. */
  def sqlDec(expr: String): String = s"CAST($expr AS DECIMAL(18,6))"
  /** DuckDB spelling of [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(${sqlDec(expr)}) AS DOUBLE)"
  /** DuckDB spelling of [[davg]]. */
  def sqlDavg(expr: String): String =
    s"CAST(SUM(${sqlDec(expr)}) AS DOUBLE) / COUNT($expr)"
}
