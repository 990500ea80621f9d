package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import ThetaAggregate._

/**
 * Theta sketch contract: exact mode below nominal entries (where
 * estimates are exact and partitioning-independent — what q79's gate
 * relies on), set-operation correctness, and mergeability.
 */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: estimate equals the true distinct count") {
    val df = (1 to 3000).map(i => i % 1000).toDF("v") // 1000 < 4096
    val est = df.agg(thetaEstimate(thetaBuild(col("v")))).as[Double].head()
    assert(est == 1000.0)
  }

  test("exact mode is partitioning-independent") {
    val base = (1 to 2000).toDF("v")
    def est(parts: Int): Double = base.repartition(parts)
      .agg(thetaEstimate(thetaBuild(col("v")))).as[Double].head()
    assert(est(1) == 2000.0 && est(17) == 2000.0)
  }

  test("intersection estimates the true overlap exactly below k") {
    // A = 1..1500, B = 1001..2500 -> overlap 1001..1500 = 500
    val df = ((1 to 1500).map(("a", _)) ++ (1001 to 2500).map(("b", _)))
      .toDF("g", "v")
    val sk = df.groupBy(col("g")).agg(thetaBuild(col("v")).as("sk"))
    val est = sk.as("x").join(sk.as("y"),
        col("x.g") < col("y.g"))
      .select(thetaEstimate(thetaIntersect(col("x.sk"), col("y.sk"))))
      .as[Double].head()
    assert(est == 500.0)
  }

  test("disjoint sets intersect to zero") {
    val df = ((1 to 100).map(("a", _)) ++ (201 to 300).map(("b", _)))
      .toDF("g", "v")
    val sk = df.groupBy(col("g")).agg(thetaBuild(col("v")).as("sk"))
    val est = sk.as("x").join(sk.as("y"), col("x.g") < col("y.g"))
      .select(thetaEstimate(thetaIntersect(col("x.sk"), col("y.sk"))))
      .as[Double].head()
    assert(est == 0.0)
  }

  test("union of per-group sketches equals the single-pass sketch (exact mode)") {
    val df = (1 to 3000).map(i => (i % 7, i % 2500)).toDF("g", "v")
    val merged = df.groupBy(col("g")).agg(thetaBuild(col("v")).as("sk"))
      .agg(thetaEstimate(thetaUnion(col("sk")))).as[Double].head()
    val single = df.agg(thetaEstimate(thetaBuild(col("v"))))
      .as[Double].head()
    assert(merged == single && merged == 2500.0)
  }

  test("difference estimates the true A-minus-B exactly below k") {
    // A = 1..1500, B = 1001..2500 -> A\B = 1..1000, B\A = 1501..2500
    val df = ((1 to 1500).map(("a", _)) ++ (1001 to 2500).map(("b", _)))
      .toDF("g", "v")
    val sk = df.groupBy(col("g")).agg(thetaBuild(col("v")).as("sk"))
    val ests = sk.as("x").join(sk.as("y"), col("x.g") < col("y.g"))
      .select(thetaEstimate(thetaDiff(col("x.sk"), col("y.sk"))).as("ab"),
        thetaEstimate(thetaDiff(col("y.sk"), col("x.sk"))).as("ba"))
      .head()
    assert(ests.getDouble(0) == 1000.0 && ests.getDouble(1) == 1000.0)
    // the algebra closes: |A| = |A∩B| + |A\B|
    val inter = sk.as("x").join(sk.as("y"), col("x.g") < col("y.g"))
      .select(thetaEstimate(thetaIntersect(col("x.sk"), col("y.sk"))))
      .as[Double].head()
    assert(inter + ests.getDouble(0) == 1500.0)
  }

  test("string values hash distinctly; nulls are skipped") {
    val df = Seq(Some("x"), Some("y"), Some("x"), None).toDF("v")
    val est = df.agg(thetaEstimate(thetaBuild(col("v")))).as[Double].head()
    assert(est == 2.0)
  }
}
