package graft.operators

import scala.util.chaining._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PageRank with exact integer fixed-point arithmetic — the iterative
 * distributed-graph pattern (beyond [[Dedup.connectedComponents]]'s
 * min-label propagation) in an engine-portable form: ranks are carried
 * as integer mass units (total mass 10^12) and every update is integer
 * division, so each iteration is bit-exact on any engine — a DuckDB
 * oracle can restate N unrolled iterations and hash-match, which a
 * floating-point damping loop never survives (per-iteration double
 * error compounds).
 *
 * Update rule (simplified form; `redistributeDangling = false`):
 *   r₀(v)    = M div N
 *   rₜ₊₁(v) = (15·(M div N)) div 100 + (85·Σ_{u→v} rₜ(u) div outdeg(u)) div 100
 *
 * With `redistributeDangling = true` the textbook correction is applied:
 * the mass held by dangling nodes (no outgoing edges — it would
 * otherwise leak from the system each step) is summed per iteration
 * (Dₜ) and every node receives an equal integer share inside the damped
 * term:
 *   rₜ₊₁(v) = (15·(M div N)) div 100
 *           + (85·(Σ_{u→v} rₜ(u) div outdeg(u) + Dₜ div N)) div 100
 * Dₜ is a one-row broadcast (an anti-join + sum), so the correction
 * adds no per-node state and keeps every update integer-exact.
 *
 * Scale shape per iteration: one join of the edge list with the rank
 * table on src (shuffle keyed by src), one aggregate keyed by dst —
 * the canonical distributed power-iteration; ranks are
 * localCheckpoint'ed so lineage stays O(1) across iterations (driver
 * loop is control flow only, exactly like connectedComponents).
 */
object PageRank {

  val Mass: Long = 1000000000000L // total integer rank mass (10^12)

  /**
   * Run `iterations` power-iteration steps over a directed edge list
   * (`src`, `dst` columns; self-loops and duplicates are removed here).
   * Returns (`id`, `rank`) with rank in integer mass units.
   */
  def run(edgesRaw: DataFrame, iterations: Int,
      redistributeDangling: Boolean = false): DataFrame = {
    val edges = edgesRaw.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))

    // N rides along as a one-row broadcast — the driver never holds it,
    // so the same plan runs at any graph size
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    val base = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr(s"${Mass}L div n_nodes").as("r0"),
        col("n_nodes"))

    var rank = base.select(col("id"), col("r0").as("r"), col("n_nodes"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(rank.select(col("id").as("src"), col("r")), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val withIn = rank
        .join(contrib, rank("id") === contrib("dst"), "left_outer")
      rank = (if (redistributeDangling) {
        // Dₜ = total mass on nodes with no outgoing edges, one row,
        // broadcast into the update — every node gets Dₜ div N back
        val dangling = rank
          .join(outdeg, rank("id") === outdeg("src"), "left_anti")
          .agg(coalesce(sum(col("r")), lit(0L)).as("d_mass"))
        withIn.crossJoin(broadcast(dangling))
          .select(col("id"),
            (expr(s"(15 * (${Mass}L div n_nodes)) div 100") +
              expr("(85 * (coalesce(in_mass, 0L) + (d_mass div n_nodes))) div 100"))
              .as("r"),
            col("n_nodes"))
      } else {
        withIn.select(col("id"),
          (expr(s"(15 * (${Mass}L div n_nodes)) div 100") +
            expr("(85 * coalesce(in_mass, 0L)) div 100")).as("r"),
          col("n_nodes"))
      // Frames.cp: rank re-enters next iteration's joins in 2-3
      // branches — inherited size stats would double per iteration
      // and stall the driver in BigInt stats math (graft.Frames)
      }).pipe(graft.Frames.cp)
    }
    rank.select(col("id"), col("r").as("rank"))
  }

  /**
   * Personalized (topic-sensitive) PageRank: identical power iteration,
   * but the teleport vector is concentrated uniformly on a SEED set
   * instead of all nodes — the "relevance to these starting points"
   * ranking (seed = a creator cohort, a trusted-domain set, a query's
   * click neighborhood). Two changes from [[run]], both exact-integer:
   *
   *   r₀(v)    = [v ∈ S] · (M div |S|)
   *   rₜ₊₁(v) = [v ∈ S] · ((15·(M div |S|)) div 100)
   *           + (85·(Σ_{u→v} rₜ(u) div outdeg(u) + [v ∈ S]·(Dₜ div |S|))) div 100
   *
   * i.e. both the damped teleport AND the dangling mass Dₜ return to the
   * seeds (the standard PPR convention — dangling mass "restarts" like
   * any walk). Seeds outside the graph are ignored; the seed set must be
   * non-empty after that restriction (M div 0 faults under ANSI, as it
   * should). Per-iteration plan shape is [[run]]'s: one src-keyed join,
   * one dst-keyed aggregate, Dₜ and |S| as one-row broadcasts, the seed
   * flag riding the rank table as a 0/1 column.
   */
  def personalized(edgesRaw: DataFrame, seedsRaw: DataFrame,
      iterations: Int): DataFrame = {
    val edges = edgesRaw.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))

    val seeds = seedsRaw.select(col("id")).distinct()
      .join(nodes, Seq("id"), "left_semi")
    val ns = seeds.agg(count(lit(1)).as("n_seeds"))

    var rank = nodes
      .join(seeds.select(col("id"), lit(1L).as("s")), Seq("id"), "left_outer")
      .crossJoin(broadcast(ns))
      .select(col("id"), coalesce(col("s"), lit(0L)).as("is_seed"),
        col("n_seeds"))
      .select(col("id"), col("is_seed"), col("n_seeds"),
        expr(s"is_seed * (${Mass}L div n_seeds)").as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(rank.select(col("id").as("src"), col("r")), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val dangling = rank
        .join(outdeg, rank("id") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("d_mass"))
      rank = rank
        .join(contrib, rank("id") === contrib("dst"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(rank("id"), col("is_seed"), col("n_seeds"),
          (expr(s"is_seed * ((15 * (${Mass}L div n_seeds)) div 100)") +
            expr("(85 * (coalesce(in_mass, 0L) +" +
              " is_seed * (d_mass div n_seeds))) div 100")).as("r"))
        .pipe(graft.Frames.cp) // loop-carried: see run()'s note
    }
    rank.select(col("id"), col("r").as("rank"))
  }
}
