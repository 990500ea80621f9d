package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.Analytics
import graft.sources.Tables

class StatsSpec extends SparkSpec {

  test("q54 exact-moment stats agree with Spark's built-in estimators") {
    val dir = sf()
    val got = Analytics.all.find(_.name == "q54_exact_stats").get
      .run(spark, dir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap

    val ref = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mean_x"),
        var_samp(col("l_quantity")).as("var_x"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("covar_xy"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_xy"))
      .collect()

    assert(ref.nonEmpty)
    ref.foreach { r =>
      val g = got(r.getAs[String]("l_returnflag"))
      def close(a: Double, b: Double): Boolean =
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      assert(close(g.getAs[Double]("mean_x"), r.getAs[Double]("mean_x")))
      assert(close(g.getAs[Double]("var_x"), r.getAs[Double]("var_x")))
      assert(close(g.getAs[Double]("covar_xy"), r.getAs[Double]("covar_xy")))
      assert(close(g.getAs[Double]("corr_xy"), r.getAs[Double]("corr_xy")))
    }
  }

  test("q52 gap-fill: grid is dense per user and fill carries last value") {
    val dir = sf()
    val rows = Analytics.all.find(_.name == "q52_gapfill").get
      .run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[Long]("hour_epoch")).sorted
      // dense hourly grid between the user's first and last active hour
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 })
      // first row is real data (grid starts at the user's min hour)
      val first = rs.minBy(_.getAs[Long]("hour_epoch"))
      assert(!first.getAs[Boolean]("is_gap"))
      // gap rows never have events and filled_sum is never null
      rs.foreach { r =>
        if (r.getAs[Boolean]("is_gap")) assert(r.getAs[Long]("n") == 0L)
        assert(!r.isNullAt(r.fieldIndex("filled_sum")))
      }
    }
  }
}
