package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Embedding-vector math over `array<float>` columns using Spark
 * higher-order functions (`zip_with`, `aggregate`) — fully codegen'd, no
 * UDF boxing, so similarity scans stream through Tungsten at full width.
 * All math is carried out in double precision regardless of input type.
 */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — a codegen'd tight loop ([[DotProductExpr]]); same
   * left-to-right double summation the HOF form (and the DuckDB oracle)
   * computes, ~50× faster inside pair-scoring joins. */
  def dot(a: Column, b: Column): Column =
    VectorExpressions.dotProduct(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine(a, b) with zero-vector guard (0.0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), l2Norm(a), l2Norm(b))

  /** Cosine from precomputed parts. Pair-scoring joins should project each
   * side's norm ONCE per row and pass it here — the values are identical
   * doubles to inline computation (same fold, same operands), but the two
   * norm scans drop out of the O(pairs) loop. */
  def cosineFromParts(dot: Column, na: Column, nb: Column): Column = {
    val n = na * nb
    when(n > 0, dot / n).otherwise(lit(0.0))
  }

  /** Squared euclidean distance Σ (aᵢ−bᵢ)². */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0).cast(DoubleType),
      (acc, v) => acc + v)

  /**
   * Deterministic random-hyperplane LSH signature (`nBits` sign bits packed
   * into a long). Plane weights derive from the portable 60-bit md5 hash of
   * "(bit,dim)" — reproducible across engines and runs, no RNG state to
   * ship. At cluster scale this is the bucketing key that replaces the
   * O(n²) cosine cross join.
   */
  def hyperplaneSig(vec: Column, dim: Int, nBits: Int): Column =
    // one codegen'd pass accumulating every projection; the Column-tree
    // form ([[hyperplaneSigCols]]) builds nBits×dim element_at terms
    VectorExpressions.hyperplaneSig(vec,
      for (b <- 0 until nBits; i <- 0 until dim) yield planeWeight(b, i),
      dim, nBits)

  /** Column-tree reference formulation of [[hyperplaneSig]] — kept as the
   * semantics oracle in TextVectorSpec. Bit-identical for vectors of
   * length ≥ dim; for SHORTER vectors both raise under ANSI mode (the
   * engine's pinned configuration), but with ANSI off this form would
   * yield signature 0 (null element_at) where the codegen form still
   * raises — the codegen form's behavior is the contract. */
  private[graft] def hyperplaneSigCols(vec: Column, dim: Int,
      nBits: Int): Column = {
    val v = asDouble(vec)
    val bits = (0 until nBits).map { b =>
      // weight(b, i) in [-1, 1]: md5-derived plan-time constant, portable
      val proj = (0 until dim).map { i =>
        element_at(v, i + 1) * lit(planeWeight(b, i))
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** md5-derived pseudo-random weight in [-1, 1] for hyperplane `b`, dim `i`
   * — same value any engine computes from md5("plane:b:i"). */
  def planeWeight(b: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane:$b:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    ((java.lang.Long.parseLong(hex, 16) % 2000001L) - 1000000L) / 1000000.0
  }
}
