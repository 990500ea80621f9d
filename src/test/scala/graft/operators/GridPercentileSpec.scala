package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The grid-rank percentile must reproduce Spark's own `percentile()`
 * BIT-FOR-BIT (same selected ranks, same interpolation tree) — that
 * equality is what lets q23/q27 swap the unbounded value-map aggregate
 * for the bounded histogram without touching their oracles. */
class GridPercentileSpec extends SparkSpec {

  private val pcts = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9,
    "p99" -> 0.99)

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = GridPercentile.exact(df, "g", "v", pcts)
      .orderBy(col("g")).collect()
    val want = df.filter(col("v").isNotNull).groupBy(col("g"))
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.99)").as("p99"))
      .orderBy(col("g")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g: Row, w: Row) =>
      assert(g.getString(0) == w.getString(0))
      (1 to 4).foreach { i =>
        assert(java.lang.Double.doubleToLongBits(g.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(w.getDouble(i)),
          s"group ${g.getString(0)} col $i: ${g.getDouble(i)} != " +
            s"${w.getDouble(i)}")
      }
    }
  }

  test("bit-equal to percentile() on hash-random values across groups") {
    val df = spark.range(20000).select(
      concat(lit("g"), col("id") % 7).as("g"),
      (pmod(xxhash64(col("id")), lit(1000000L)).cast("double") / 97.0)
        .as("v"))
    check(df)
  }

  test("edge shapes: single-row group, constant group, integral positions") {
    // n=1 (pos always 0), all-equal values (every cell collapses to one),
    // and n=101 with v=0..100 (0.25/0.5/0.9 positions land integral)
    val df = spark.range(101).select(lit("ladder").as("g"),
        col("id").cast("double").as("v"))
      .unionByName(spark.range(1).select(lit("solo").as("g"),
        lit(42.5).as("v")))
      .unionByName(spark.range(50).select(lit("const").as("g"),
        lit(7.25).as("v")))
    check(df)
  }

  test("nulls are ignored like percentile()") {
    val df = spark.range(1000).select(
      concat(lit("g"), col("id") % 3).as("g"),
      when(col("id") % 5 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 400).cast("double") / 8.0).as("v"))
    check(df)
  }
}
