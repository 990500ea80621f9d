package graft

import org.apache.spark.sql.functions._

/** The [[Frames.cp]] contract: content and schema identical to a plain
 * eager localCheckpoint, lineage truncated, and — the reason it exists
 * — the Catalyst sizeInBytes statistic RESET rather than inherited, so
 * a loop folding its checkpoint back into joins keeps a BOUNDED
 * bit-length instead of compounding geometrically (the CcRepro-measured
 * driver stall; see the Frames object doc). */
class FramesSpec extends SparkSpec {

  import spark.implicits._

  test("content and schema survive cp unchanged") {
    val df = Seq((1L, "a", true), (2L, "b", false)).toDF("id", "s", "f")
    val cp = Frames.cp(df)
    assert(cp.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(cp.collect().toSet === df.collect().toSet)
  }

  test("a join loop over cp keeps sizeInBytes bit-length bounded; " +
      "plain localCheckpoint compounds it") {
    def loop(checkpoint: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Int = {
      var labels = checkpoint(
        spark.range(100).select(col("id"), col("id").as("v")))
      (1 to 6).foreach { _ =>
        val other = labels.select(col("id"), col("v").as("v2"))
        labels = checkpoint(
          labels.join(other, Seq("id"))
            .select(col("id"), least(col("v"), col("v2")).as("v")))
      }
      labels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    }
    val reset = loop(Frames.cp)
    val inherited = loop(_.localCheckpoint(true))
    assert(reset <= 64,
      s"Frames.cp let stats grow to $reset bits — the reset is broken")
    // the control proves the test measures the real mechanism: WITHOUT
    // the reset the same loop compounds (~2x bits per iteration —
    // project visitors damp it below a clean doubling, but six rounds
    // separate decisively from the reset's <= 64)
    assert(inherited > 128,
      s"plain localCheckpoint only reached $inherited bits — Spark's " +
        "stats inheritance changed; re-evaluate whether Frames.cp is " +
        "still needed")
  }
}
