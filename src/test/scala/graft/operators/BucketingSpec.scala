package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.{Scratch, Tables}

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the plan
    collect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }.size
  }

  test("bucketed join matches the plain join and removes the exchanges") {
    val dir = sf()
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))

    val base = Scratch.dir("bucketing_spec")
    Bucketing.writeBucketed(o, "spec_bkt_orders", s"$base/o",
      buckets = 4, key = "o_orderkey", sortCols = Seq("o_orderkey"))
    Bucketing.writeBucketed(l, "spec_bkt_lineitem", s"$base/l",
      buckets = 4, key = "l_orderkey", sortCols = Seq("l_orderkey"))

    def agg(odf: org.apache.spark.sql.DataFrame,
        ldf: org.apache.spark.sql.DataFrame) =
      odf.join(ldf, col("o_orderkey") === col("l_orderkey"), "inner")
        .groupBy(col("o_orderkey"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))

    val bucketed = agg(spark.table("spec_bkt_orders"),
      spark.table("spec_bkt_lineitem"))
    val plain = agg(o, l)

    // same rows
    assert(bucketed.except(plain).isEmpty && plain.except(bucketed).isEmpty)

    // the join AND the same-key aggregation run with no shuffle at all on
    // the bucketed layout; the plain plan must exchange at least once (at
    // test SF AQE broadcasts the small side, leaving the agg shuffle; at
    // scale it shuffles both join sides too)
    assert(shuffleCount(bucketed) == 0)
    assert(shuffleCount(plain) >= 1)

    spark.sql("DROP TABLE IF EXISTS spec_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS spec_bkt_lineitem")
  }

  test("q51 retires old bucketed-table generations on re-invocation") {
    // a Verify/Bench loop re-invokes q51 repeatedly; cleanup keeps the
    // NEWEST finished generation alive (a holder of the previous
    // invocation's lazy plan must still read intact tables) and drops
    // everything older — so no matter how many times the gate runs, at
    // most TWO generations (4 tables) are live
    val dir = sf()
    def liveTables(): Seq[String] = spark.catalog
      .listTables().collect().map(_.name).toSeq
      .filter(_.startsWith("graft_bkt_"))
    (1 to 4).foreach { _ =>
      graft.SparkEntry.queries("q51_bucketed_join")(spark, dir).count()
    }
    assert(liveTables().size <= 4,
      s"expected at most two live generations (4 tables), got: ${liveTables()}")
    assert(liveTables().size >= 2,
      s"the just-built generation must be live, got: ${liveTables()}")
  }
}
