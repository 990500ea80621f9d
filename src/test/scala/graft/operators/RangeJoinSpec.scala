package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed time-window join ≡ naive inequality join") {
    // timestamps straddling bucket boundaries on purpose
    val base = 1700000000000000L // epoch µs
    val left = (0 until 40).map(i =>
      (i.toLong, i.toLong % 3, base + i * 77000001L)).toDF("lid", "k", "lts")
    val right = (0 until 200).map(j =>
      (j.toLong + 1000, j.toLong % 3, base + j * 17000003L))
      .toDF("rid", "k", "rts")
    val lo = -120000000L // [lts - 2min, lts + 1min)
    val hi = 60000000L

    val bucketed = RangeJoin.timeWindowJoin(left, right, Seq("k"),
      "lts", "rts", lo, hi)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right,
        left("k") === right("k") &&
          right("rts") >= left("lts") + lo && right("rts") < left("lts") + hi)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive)
    assert(naive.nonEmpty) // the fixture must actually exercise the window
  }

  test("window edges: inclusive lower, exclusive upper, cross-bucket hits") {
    val left = Seq((1L, 0L, 1000000L)).toDF("lid", "k", "lts")
    val right = Seq(
      (10L, 0L, 900000L),   // == lts + lo → included
      (11L, 0L, 999999L),   // just below lts+hi? (window [900000, 1000000))
      (12L, 0L, 1000000L),  // == upper bound → excluded
      (13L, 0L, 899999L),   // below lower → excluded
      (14L, 1L, 950000L)    // wrong key → excluded
    ).toDF("rid", "k", "rts")
    val got = RangeJoin.timeWindowJoin(left, right, Seq("k"),
      "lts", "rts", -100000L, 0L)
      .select($"rid").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }
}
