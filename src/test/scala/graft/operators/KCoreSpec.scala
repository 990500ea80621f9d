package graft.operators

import graft.SparkSpec

/** Hand-checked k-core peeling: cascades, idempotence, degeneracy. */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(k: Int, rounds: Int, e: (Long, Long)*): Map[Long, Long] =
    KCore.peel(e.toDF("src", "dst"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // K4 on {1,2,3,4} with a degree-3 satellite: 5 connects to 4 and to
  // two leaves 6, 7 — so 5 starts at deg 3 and only drops under k=3
  // AFTER round 1 peels its leaves. A genuine two-round cascade.
  private val k4sat = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (5L, 7L))

  test("3-core of K4 + satellite is exactly the K4") {
    val c = core(3, rounds = 3, k4sat: _*)
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("extra rounds past the fixpoint are a no-op") {
    assert(core(3, rounds = 8, k4sat: _*) ===
      core(3, rounds = 2, k4sat: _*))
  }

  test("too few rounds stop mid-cascade (fixed-round contract)") {
    // round 1 peels only the leaves 6 and 7 (deg 1); 5 entered the
    // round at deg 3 so it survives, holding just its edge to 4
    val c = core(3, rounds = 1, k4sat: _*)
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
  }

  test("k above the degeneracy empties the graph") {
    assert(core(4, rounds = 4, k4sat: _*) === Map.empty[Long, Long])
  }

  test("long chain peels one end per round from both sides") {
    // path 1-2-3-4-5: every internal degree is 2, so the 2-core of a
    // pure path is empty, but it takes ceil(n/2) rounds to get there
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(core(2, rounds = 3, path: _*) === Map.empty[Long, Long])
    // a cycle is its own 2-core: no vertex ever drops below 2
    val cycle = path :+ (5L, 1L)
    assert(core(2, rounds = 3, cycle: _*) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
  }

  test("direction, duplicates and self-loops are ignored") {
    val c = core(2, rounds = 2,
      (2L, 1L), (1L, 2L), (1L, 1L), // reversed dup + self-loop
      (2L, 3L), (3L, 1L))
    assert(c === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("randomized cross-check against an in-JVM reference fixpoint peel") {
    // rounds = |V| guarantees fixpoint (each pre-fixpoint round removes
    // >= 1 vertex), so the distributed peel must equal the sequential
    // whole-fixpoint reference on any graph
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 6) {
      val n = 8 + rnd.nextInt(4)
      val edges = Seq.fill(2 * n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val k = 2 + rnd.nextInt(2)
      val got = core(k, rounds = n, edges: _*)
      assert(got === refKCore(edges, k), s"trial $trial: k=$k edges=$edges")
    }
  }

  /** Sequential reference: peel to fixpoint on a simple undirected
   * graph, return survivors with their in-core degree. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val alive = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => alive(e._1) && alive(e._2))
      changed = next != es
      es = next
    }
    es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toLong }
  }
}
