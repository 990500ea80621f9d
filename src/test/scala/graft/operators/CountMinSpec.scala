package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    graft.sources.Tables.load(spark, sf(), "events")
      .select($"user_id")

  test("cms estimate is never below the exact count (one-sided error)") {
    val cms = CountMin.counters(events, "user_id", depth = 4, width = 64)
    val exact = events.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(exact, "user_id", cms, depth = 4, width = 64)
      .join(exact, "user_id")
      .select($"user_id", $"cms_est", $"exact_n")
      .as[(Long, Long, Long)].collect()
    assert(est.nonEmpty)
    // width 64 over ~50 keys WILL collide — the guarantee must still hold
    est.foreach { case (k, e, x) =>
      assert(e >= x, s"key $k: cms $e < exact $x")
    }
  }

  test("cms is exact when the grid is collision-free for the key set") {
    // 3 distinct keys against a wide grid: at width 4096 and depth 4 a
    // 3-key collision in EVERY row is (3²/4096)⁴-improbable; these fixed
    // keys are verified collision-free by the equality itself
    val small = Seq(1L, 1L, 1L, 2L, 2L, 7L).toDF("user_id")
    val cms = CountMin.counters(small, "user_id", depth = 4, width = 4096)
    val exact = small.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
    val est = CountMin.estimate(exact, "user_id", cms, depth = 4,
        width = 4096)
      .join(exact, "user_id")
      .select($"cms_est", $"exact_n").as[(Long, Long)].collect()
    est.foreach { case (e, x) => assert(e == x) }
  }

  test("probe keys never sketched estimate 0, not min-over-fewer or absent") {
    // keys far outside the sketched set: on a wide grid their cells are
    // (with these fixed keys, verifiably) untouched → est must be 0, and
    // the keys must still APPEAR in the output (left join, not inner)
    val small = Seq(1L, 1L, 2L).toDF("user_id")
    val cms = CountMin.counters(small, "user_id", depth = 4, width = 4096)
    val probes = Seq(900001L, 900002L).toDF("user_id")
    val est = CountMin.estimate(probes, "user_id", cms, depth = 4,
        width = 4096)
      .select($"user_id", $"cms_est").as[(Long, Long)].collect().toMap
    assert(est.keySet == Set(900001L, 900002L),
      s"unseen probe keys missing from estimate output: $est")
    est.foreach { case (k, e) => assert(e == 0L, s"key $k: est $e != 0") }
  }

  test("sketches of disjoint partitions merge by cell-wise addition") {
    val a = events.filter($"user_id" % 2 === 0)
    val b = events.filter($"user_id" % 2 =!= 0)
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] =
      CountMin.counters(df, "user_id", depth = 4, width = 64)
        .select($"i", $"b", $"n").as[(Int, Long, Long)].collect()
        .map { case (i, bb, n) => (i, bb) -> n }.toMap
    val whole = cells(events)
    val merged = (cells(a).toSeq ++ cells(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == whole)
  }
}
