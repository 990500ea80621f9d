package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 150L), (4L, "C", 50L)
  ).toDF("trade_id", "sym", "t")
  private lazy val quotes = Seq(
    (10L, "A", 90L), (11L, "A", 100L), (12L, "A", 200L),
    (13L, "B", 150L), (14L, "B", 149L)
  ).toDF("quote_id", "sym", "qt")

  private def run(strict: Boolean): Map[Long, Option[Long]] =
    AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        tieBreak = "quote_id", strict = strict)
      .select($"trade_id", $"asof.quote_id")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("strict: latest right strictly before; no match → null struct") {
    assert(run(strict = true) == Map(
      1L -> Some(10L),  // qt=100 == t → excluded; 90 wins
      2L -> Some(12L),  // 200 < 205
      3L -> Some(14L),  // 150 == t excluded; 149 wins
      4L -> None))      // no C quotes
  }

  test("non-strict: equal timestamps match; tiebreak picks greatest id") {
    assert(run(strict = false) == Map(
      1L -> Some(11L),  // qt=100 == t now visible
      2L -> Some(12L),
      3L -> Some(13L),  // qt=150 == t visible, beats 149
      4L -> None))
  }

  test("null keys never match; non-numeric tiebreak columns work") {
    val l = Seq((Option(1L), 100L, 1L), (Option.empty[Long], 100L, 2L))
      .toDF("sym", "t", "lid")
    val r = Seq((Option(1L), 90L, "qA"), (Option.empty[Long], 95L, "qB"))
      .toDF("sym", "qt", "qref")
    val got = AsofJoin.asofJoin(l, r, Seq("sym"), "t", "qt",
        tieBreak = "qref") // string tiebreak: no long cast may be applied
      .select($"lid", $"asof.qref")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getString(1)))).toMap
    assert(got == Map(1L -> Some("qA"), 2L -> None))
  }

  test("one shuffle: plan has a single exchange before the window") {
    val plan = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "qt",
        tieBreak = "quote_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
  }
}
