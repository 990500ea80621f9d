package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Pins the mergeability contract behind q73. The HLL register state
 * depends only on the SET of hashed values (never on grouping, order,
 * or partitioning), but Datasketches abandons its HIP estimator when
 * sketches are unioned and falls back to the composite estimator — so
 * merged-vs-single-pass estimates are EXACTLY equal while the sketch is
 * still sparse (it still holds the raw hash set) and only
 * bounded-close once dense. q73's gate flag carries 5% slack for
 * exactly this reason; these tests pin both regimes.
 */
class HllMergeSpec extends SparkSpec {
  import spark.implicits._

  test("sparse mode: union of partial sketches == whole-set sketch, exactly") {
    // 97 distinct values spread over 7 groups — well inside sparse mode
    val ids = (1L to 500L).map(i => (i % 7, i * 31 % 97))
    val df = ids.toDF("part", "v")
    val merged = df.groupBy(col("part"))
      .agg(hll_sketch_agg(col("v"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val whole = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("est"))
      .head().getLong(0)
    assert(merged === whole)
    assert(merged === 97L)
  }

  test("small-cardinality estimates are exact in sparse mode") {
    val df = (1L to 200L).map(i => i % 50).toDF("v")
    val est = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head().getLong(0)
    assert(est === 50L)
  }

  test("dense mode: any partitioning estimates within the lgK=12 error bound") {
    // 10k distinct forces HLL (dense) mode; single-pass and partitioned
    // runs may take different estimator paths (HIP vs composite) and
    // differ by a few counts — both must stay inside ~2% (theoretical
    // RSE at lgK=12 is 1.04/sqrt(4096) ~ 1.6%). Data and hashes are
    // deterministic, so this is a fixed-value pin, not a flaky bound.
    val df = (1L to 10000L).toDF("v")
    def est(parts: Int): Long = df.repartition(parts)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))))
      .head().getLong(0)
    Seq(est(1), est(13)).foreach { e =>
      assert(math.abs(e - 10000L) <= 200L, s"estimate $e off by >2%")
    }
  }
}
