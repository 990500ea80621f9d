package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked a-priori pair mining: counts, pruning, exact lift. */
class FrequentPairsSpec extends SparkSpec {
  import spark.implicits._

  private def mine(rows: Seq[(Long, Long)], minSupport: Long, minPair: Long) =
    FrequentPairs.mine(rows.toDF("bk", "item"), "bk", "item",
      minSupport, minPair)

  test("pair count, item counts and lift on a hand-built basket set") {
    // A=1 in baskets {1,2,3}, B=2 in {1,2,3}, D=4 in {3} only.
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L))
    val out = mine(rows, minSupport = 2L, minPair = 2L).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (1L, 2L, 3L, 3L, 3L))
    // lift = pair_n * N / (n1 * n2) = 3*3/(3*3) = 1.0 exactly
    assert(r.getDouble(5) === 1.0)
  }

  test("a-priori pruning removes rare items before pair expansion") {
    // C=3 co-occurs with A=1 twice, but appears in only 2 baskets while
    // minSupport=3 — so (A,C) must not surface even though its pair
    // count would pass minPair.
    val rows = Seq(
      (1L, 1L), (1L, 3L),
      (2L, 1L), (2L, 3L),
      (3L, 1L), (3L, 2L),
      (4L, 1L), (4L, 2L),
      (5L, 2L))
    val out = mine(rows, minSupport = 3L, minPair = 2L)
      .select("p1", "p2").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("duplicate (basket, item) rows collapse before counting") {
    val rows = Seq(
      (1L, 1L), (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 2L), (2L, 2L))
    val out = mine(rows, minSupport = 1L, minPair = 1L).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 2L) // pair_n counts baskets, not rows
  }

  test("minPair drops one-off co-occurrences") {
    val rows = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 1L), (2L, 3L),
      (3L, 2L), (3L, 3L))
    val out = mine(rows, minSupport = 1L, minPair = 2L).collect()
    assert(out.isEmpty)
  }
}
