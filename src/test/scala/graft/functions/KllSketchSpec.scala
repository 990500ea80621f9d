package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import KllAggregate._

/**
 * KLL sketch contract: error-bounded quantiles, mergeability, and the
 * partitioning caveat (compaction is randomized, so only the BOUND is
 * stable across partitionings — never bit-equality; anything gated
 * cross-engine hashes exact columns plus a tolerance flag, the q73
 * pattern).
 */
class KllSketchSpec extends SparkSpec {
  import spark.implicits._

  test("wrong-typed input fails at analysis, not as a mid-job cast error") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("s", "v")
    // kllBuild over a string column: analyzer-time failure
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(kllBuild(col("s"), 200)).queryExecution.analyzed
    }
    assert(e1.getMessage.contains("kll_build"))
    // kllMerge over a non-binary column: analyzer-time failure
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(kllMerge(col("v"))).queryExecution.analyzed
    }
    assert(e2.getMessage.contains("kll_merge"))
  }

  test("below k the sketch is exact: quantiles are true order statistics") {
    // 100 values into a k=200 sketch: no compaction can have occurred
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val sk = df.agg(kllBuild(col("v"), 200).as("sk"))
    val got = sk.select(
      kllQuantile(col("sk"), 0.5).as("p50"),
      kllQuantile(col("sk"), 0.05).as("p05"),
      kllQuantile(col("sk"), 1.0).as("max")).head()
    assert(got.getDouble(0) == 50.0) // inclusive criterion: ceil(0.5*100)
    assert(got.getDouble(1) == 5.0)
    assert(got.getDouble(2) == 100.0)
  }

  test("merge of per-group sketches answers like a single-pass sketch (bounded)") {
    val df = (1 to 10000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    val merged = df.groupBy(col("g")).agg(kllBuild(col("v"), 200).as("sk"))
      .agg(kllMerge(col("sk")).as("m"))
      .select(kllQuantile(col("m"), 0.5)).as[Double].head()
    // k=200 normalized rank error ~1.65%; assert a generous 4% window
    assert(math.abs(merged - 5000.0) <= 400.0,
      s"merged p50 $merged drifted past the rank-error bound")
  }

  test("estimates are partitioning-tolerant, not partitioning-equal") {
    val base = (1 to 20000).map(_.toDouble)
    def p50(parts: Int): Double =
      base.toDF("v").repartition(parts)
        .agg(kllQuantile(kllBuild(col("v"), 200), 0.5)).as[Double].head()
    val a = p50(1)
    val b = p50(13)
    // both inside the bound around 10000 — that is the full contract
    assert(math.abs(a - 10000.0) <= 800.0 && math.abs(b - 10000.0) <= 800.0)
  }

  test("nulls are skipped; an all-null group yields an empty sketch -> null quantile") {
    val df = Seq[(Int, Option[Double])]((1, Some(3.0)), (1, None), (2, None))
      .toDF("g", "v")
    val out = df.groupBy(col("g"))
      .agg(kllQuantile(kllBuild(col("v"), 200), 0.5).as("p50"))
      .orderBy(col("g")).collect()
    assert(out(0).getDouble(1) == 3.0)
    assert(out(1).isNullAt(1))
  }

  test("inclusive quantile over integer-valued doubles returns a retained input") {
    val vals = Seq(10.0, 20.0, 30.0, 40.0, 50.0)
    val got = vals.toDF("v")
      .agg(kllQuantile(kllBuild(col("v"), 200), 0.5)).as[Double].head()
    assert(vals.contains(got))
  }
}
