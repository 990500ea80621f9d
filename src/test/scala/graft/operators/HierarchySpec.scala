package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked pointer-doubling closure for Hierarchy.flatten. */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def flat(nodes: (Long, Long)*): Map[Long, (Long, Long)] =
    Hierarchy.flatten(nodes.toDF("id", "parent"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("forest with two trees: every node gets its root and exact depth") {
    // tree A: 1 <- 2 <- 4, 1 <- 3 ; tree B: 10 <- 11
    val got = flat((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L),
      (10L, 10L), (11L, 10L))
    assert(got === Map(
      1L -> (1L, 0L), 2L -> (1L, 1L), 3L -> (1L, 1L), 4L -> (1L, 2L),
      10L -> (10L, 0L), 11L -> (10L, 1L)))
  }

  test("deep chain: depth 40 resolves within 6 doubling rounds") {
    // 0 <- 1 <- 2 <- ... <- 40 (a pure chain; 2^6 = 64 >= 40 jumps)
    val chain = (0L to 40L).map(i => (i, math.max(i - 1, 0L)))
    val got = flat(chain: _*)
    assert(got(40L) === (0L, 40L))
    assert(got(0L) === (0L, 0L))
    assert(got(17L) === (0L, 17L))
  }

  test("extra rounds past convergence are no-ops") {
    val nodes = Seq((1L, 1L), (2L, 1L), (4L, 2L)).toDF("id", "parent")
    val six = Hierarchy.flatten(nodes, maxIters = 6).collect().toSet
    val ten = Hierarchy.flatten(nodes, maxIters = 10).collect().toSet
    assert(six === ten)
  }
}
