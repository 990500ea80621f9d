package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core extraction by iterative peeling — the fourth member of the
 * iterative-graph family (with [[Dedup.connectedComponents]]'s label
 * propagation, [[PageRank]]'s power iteration and [[Hierarchy]]'s
 * pointer doubling). The k-core is the maximal subgraph in which every
 * vertex keeps degree ≥ k; it is the standard density filter a
 * training-data pipeline runs over co-occurrence graphs (co-purchase,
 * co-credit — cf. the reference's story-credit fan-out,
 * /root/reference/src/main/java/org/gcd/etl/GcdStoryCredit.java:113-137)
 * to separate a connected population from incidental edges.
 *
 * Peeling is the textbook fixpoint: delete every vertex of degree < k,
 * recompute degrees (removals reduce the survivors' degrees), repeat.
 * Each round is one degree aggregate keyed by vertex plus two semi-join
 * probes keyed by edge endpoint — every shuffle is keyed on the
 * high-cardinality vertex id, nothing is collected to the driver, and
 * per-round work is O(m) with no skew hazard beyond normal key
 * distribution (a hub's edges hash across partitions like any other
 * key's). Lineage is truncated per round with localCheckpoint, the
 * [[PageRank]]/[[Dedup.connectedComponents]] pattern, so the plan does
 * not deepen with the round count.
 *
 * The round count is a FIXED parameter, not a driver-side convergence
 * test: peeling is monotone (the surviving edge set only shrinks) and
 * idempotent at the fixpoint, so running extra rounds past convergence
 * is a no-op — and a fixed count makes the operator's output a pure
 * function of (graph, k, rounds) that a step-at-a-time SQL engine can
 * restate verbatim (the q76 oracle unrolls the same rounds as CTEs).
 * Callers wanting a guaranteed-converged core pick `rounds` ≥ the
 * graph's peel depth (bounded by the vertex count; in practice a few
 * rounds — each round removes every vertex whose degree the PREVIOUS
 * round's removals pushed under k, so the cascade depth is the length
 * of the longest removal chain, and KCoreSpec pins idempotence past
 * it).
 */
object KCore {

  /**
   * Peel `rounds` rounds toward the k-core of an undirected graph given
   * as a (`src`, `dst`) edge list (direction, duplicates and self-loops
   * are ignored). Returns (`id`, `core_deg`): every surviving vertex
   * with its degree in the surviving subgraph — the k-core exactly when
   * `rounds` reaches the cascade's fixpoint.
   */
  def peel(edgesRaw: DataFrame, k: Int, rounds: Int): DataFrame =
    peelCanonical(GraphEdges.canonical(edgesRaw), k, rounds)

  /** As [[peel]], over an ALREADY-canonical (a < b, simple) edge list —
   * the entry point for pipelines that canonicalize once via
   * [[GraphEdges.canonical]] and run several graph operators over the
   * same edge set. */
  def peelCanonical(canon: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1, rounds >= 1; got $k, $rounds")
    // The symmetric orientation of the canonical edges, so one degree
    // aggregate keyed on `s` sees every incidence.
    var sym = canon.select(col("a").as("s"), col("b").as("d"))
      .union(canon.select(col("b").as("s"), col("a").as("d")))
      .localCheckpoint(true)

    for (_ <- 1 to rounds) {
      val alive = sym.groupBy(col("s")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("s").as("id"))
      // Keep only edges with BOTH endpoints alive; the symmetric list
      // stays symmetric because `alive` is consulted for s and d alike.
      // Frames.cp: sym re-enters the next round three times (itself
      // + both alive semi-joins derive from it) — inherited size stats
      // would triple per round and stall the driver (graft.Frames)
      sym = graft.Frames.cp(sym
        .join(alive.select(col("id").as("s")), Seq("s"), "left_semi")
        .join(alive.select(col("id").as("d")), Seq("d"), "left_semi")
        .select(col("s"), col("d")))
    }

    sym.groupBy(col("s").as("id")).agg(count(lit(1)).as("core_deg"))
  }
}
