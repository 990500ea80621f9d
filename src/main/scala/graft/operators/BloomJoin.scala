package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge => B}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-filter semi-join reduction — the runtime-filter shape that makes
 * selective joins survive 100 TB. When a join's build side is selective but
 * too large to broadcast as rows, a Bloom filter OF ITS KEYS still fits in
 * a few MB: build it with one partial-aggregated pass, ship it to every
 * probe-side task, and drop non-matching probe rows IN THE SCAN — before
 * they are shuffled. The exchange then carries only
 * `matches + ε·non-matches` (ε = false-positive rate) instead of the whole
 * fact table; the exact join afterwards removes the ε.
 *
 * Built on Spark's own sketch expressions (`BloomFilterAggregate` /
 * `BloomFilterMightContain` — the same pair Catalyst's InjectRuntimeFilter
 * rule uses), so the probe-side test is a codegen'd O(1) predicate, not a
 * UDF. The builder materializes ONE aggregated scalar (the serialized
 * sketch) on the driver — identical to how a scalar-subquery runtime
 * filter executes; no row data ever reaches the driver.
 *
 * The reference has no analog (its one "filter" is the SQL WHERE pushed
 * into MySQL, /root/reference/src/main/java/org/gcd/etl/Main.java:134-216);
 * this is part of the beyond-reference scale toolkit.
 */
object BloomJoin {

  /**
   * Serialized Bloom filter over `key` (any type — hashed to 64 bits
   * first). `expectedItems` sizes the sketch: Spark allocates ~
   * `-n·ln(fpp)/ln(2)²` bits, so 1M keys at the default 3% fpp is ~0.9 MB
   * — size it to the build side's distinct-key estimate, NOT the probe
   * side. Returns None when the build side is empty.
   */
  def buildBloom(build: DataFrame, key: Column,
      expectedItems: Long): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      B.toExpression(xxhash64(key)), expectedItems)
    val row = build
      .agg(B.toColumn(agg.toAggregateExpression()).as("bloom"))
      .head()
    Option(row.getAs[Array[Byte]](0))
  }

  /** Probe-side reduction: keep rows whose key MIGHT be in the sketch
   * (no false negatives — never drops a real match). Empty build side →
   * nothing can match. */
  def mightContain(probe: DataFrame, key: Column,
      bloom: Option[Array[Byte]]): DataFrame =
    bloom match {
      case Some(bytes) =>
        probe.filter(B.toColumn(new BloomFilterMightContain(
          Literal(bytes, BinaryType), B.toExpression(xxhash64(key)))))
      case None => probe.filter(lit(false))
    }

  /**
   * Inner equi-join with the probe side Bloom-reduced before the join:
   * exact results (the join removes false positives), but the probe-side
   * shuffle carries only candidate rows. At 100 TB this is the difference
   * between shuffling the full fact table and shuffling ~the match set.
   */
  def bloomJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long): DataFrame = {
    val bloom = buildBloom(build, col(buildKey), expectedItems)
    val reduced = mightContain(probe, col(probeKey), bloom)
    // Resolve each key against its own side: with bare col(...) both names
    // would resolve in the JOINED plan, which is ambiguous whenever
    // probeKey == buildKey (the common case) or either name exists on the
    // other side.
    reduced.join(build, reduced(probeKey) === build(buildKey))
  }
}
