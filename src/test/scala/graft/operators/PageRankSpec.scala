package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration matches the hand-computed integer fixed point") {
    // 1→2, 2→1, 3→1: N=3, r0 = 10^12 div 3 = 333333333333 each
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 1)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    val base15 = (15L * (PageRank.Mass / 3)) / 100 // 49999999999
    assert(r(1L) == base15 + (85L * (333333333333L * 2)) / 100)
    assert(r(2L) == base15 + (85L * 333333333333L) / 100)
    assert(r(3L) == base15) // no in-edges: damping base only
  }

  test("cycle members outrank the source-only node; mass bounded") {
    // the 1↔2 cycle oscillates with period 2 (amplitude contracts by
    // 0.85² per round trip), so 1-vs-2 ordering depends on iteration
    // parity — what must hold at ANY iteration: both cycle members
    // outrank node 3 (which receives only the damping base), and
    // integer division only loses mass, never creates it
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 10)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    assert(r(1L) > r(3L) && r(2L) > r(3L))
    assert(r.values.sum <= PageRank.Mass)
    assert(r.values.forall(_ > 0))
  }

  test("dangling redistribution: hand-computed step, mass recovered") {
    // 1→3, 2→3: node 3 is dangling (no out-edges). N=3,
    // r0 = 333333333333 each, D₀ = r0(3).
    val edges = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r = PageRank.run(edges, iterations = 1, redistributeDangling = true)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    val r0 = PageRank.Mass / 3
    val base15 = (15L * r0) / 100
    val share = r0 / 3 // D₀ div N
    assert(r(1L) == base15 + (85L * share) / 100)
    assert(r(2L) == base15 + (85L * share) / 100)
    assert(r(3L) == base15 + (85L * (2 * r0 + share)) / 100)
    // the corrected total must beat the leaky variant's and stay ≤ M
    val leaky = PageRank.run(edges, iterations = 1)
      .agg(sum($"rank")).as[Long].head()
    assert(r.values.sum > leaky && r.values.sum <= PageRank.Mass)
  }

  test("dangling redistribution is a no-op when every node has out-edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val a = PageRank.run(edges, 4).orderBy($"id").collect().toSeq
    val b = PageRank.run(edges, 4, redistributeDangling = true)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("duplicate and self-loop edges are ignored") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 1L), (2L, 1L))
      .toDF("src", "dst")
    val clean = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = PageRank.run(edges, 3).orderBy($"id")
    val b = PageRank.run(clean, 3).orderBy($"id")
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("personalized: hand-computed step, teleport only to the seed") {
    // 1→2, 2→3, 3→1, seed {1}: r0 = (M, 0, 0).
    // Step: in-mass 2←1 = M, others 0; no dangling (cycle).
    //   r(1) = (15·M)/100 + 0, r(2) = (85·M)/100, r(3) = 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r = PageRank.personalized(edges, seeds, iterations = 1)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    assert(r(1L) == (15L * PageRank.Mass) / 100)
    assert(r(2L) == (85L * PageRank.Mass) / 100)
    assert(r(3L) == 0L)
  }

  test("personalized: dangling mass restarts at the seeds") {
    // 1→3 with 3 dangling, seed {1}: r0 = (M, 0).. nodes {1,3}.
    // D₀ = r0(3) = 0, step 1: r(1) = 15%M, r(3) = 85%M.
    // Step 2: D₁ = r(3) = 85%M flows back to seed 1 only:
    //   r(1) = 15%M + 85%·D₁, r(3) = 85%·(in=r(1)₁=15%M... )
    val edges = Seq((1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val r1 = PageRank.personalized(edges, seeds, iterations = 1)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    val m15 = (15L * PageRank.Mass) / 100
    val m85 = (85L * PageRank.Mass) / 100
    assert(r1 === Map(1L -> m15, 3L -> m85))
    val r2 = PageRank.personalized(edges, seeds, iterations = 2)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("rank")).toMap
    assert(r2(1L) == m15 + (85L * m85) / 100) // dangling D₁ back to seed
    assert(r2(3L) == (85L * m15) / 100)       // seed's out-mass
    // mass is conserved up to integer-division loss
    assert(r2.values.sum <= PageRank.Mass && r2.values.sum > 0L)
  }

  test("personalized: seeds outside the graph are ignored") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = PageRank.personalized(edges, Seq(1L, 99L).toDF("id"), 3)
      .orderBy($"id").collect().toSeq
    val b = PageRank.personalized(edges, Seq(1L).toDF("id"), 3)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("personalized with ALL nodes as seeds equals global PageRank") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L).toDF("id")
    val a = PageRank.personalized(edges, seeds, 4).orderBy($"id")
      .collect().toSeq
    val b = PageRank.run(edges, 4, redistributeDangling = true)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }
}
