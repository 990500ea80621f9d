package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * SemDeDup-style semantic deduplication over an embedding column (Abbas
 * et al., "SemDeDup: Data-efficient learning at web-scale through semantic
 * deduplication", 2023): cluster the corpus with a coarse quantizer,
 * compare embeddings ONLY within a cluster, and drop every vector that
 * has a more-canonical (lower-id) semantic duplicate above the cosine
 * threshold.
 *
 * This is the scale shape that makes semantic dedup tractable at 100 TB:
 * the candidate pair set is Σ |cluster|² instead of n² — the centroid
 * count is the knob that bounds cluster sizes (at a billion embeddings
 * you run ~100k trained centroids so clusters stay ~10k wide), and the
 * quadratic work is per-cluster, embarrassingly parallel, after ONE
 * bounded centroid broadcast and one shuffle on the cluster key. Nothing
 * here is all-pairs.
 *
 * Deterministic end to end: stride-seeded centroids
 * ([[Similarity.strideCentroids]]), 6dp-rounded cosine assignment with
 * ties to lower cid, and "canonical = lowest id" survivor policy — every
 * step restatable in ANSI SQL for the oracle gate.
 */
object SemanticDedup {

  /**
   * Per-vector keep/drop decision. Output: `cid` (assigned cluster),
   * `vid`, `dup_of` (lowest-id within-cluster duplicate above `minCos`,
   * null if none), `keep` (dup_of is null).
   */
  def dedup(vectors: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int, maxCentroids: Int, minCos: Double): DataFrame = {
    val cent = Similarity.strideCentroids(vectors, idCol, vecCol,
      centroidStride, maxCentroids)
    // materialize the assignment once: it feeds BOTH pair-join legs
    // (those share the cid exchange) and the final keep projection
    // (keyed on vid — a different key, so exchange reuse cannot cover
    // it); without this the O(n·C) centroid argmax runs a third time
    val assigned = Similarity.assignToCentroids(vectors, idCol, vecCol, cent)
      .localCheckpoint(true)

    val l = assigned.select(col("cid"), col("vid").as("aid"),
      col("vv").as("av"), col("vn").as("an"))
    val r = assigned.select(col("cid").as("cid_r"), col("vid").as("bid"),
      col("vv").as("bv"), col("vn").as("bn"))
    // within-cluster ordered pairs; the self-join shuffles both sides on
    // the cluster key once (ReusedExchange: both legs are the same plan)
    val dups = l.join(r, col("cid") === col("cid_r") && col("aid") < col("bid"))
      .select(col("cid"), col("aid"), col("bid"),
        round(VF.cosineFromParts(VF.dot(col("av"), col("bv")),
          col("an"), col("bn")), 6).as("cos"))
      .filter(col("cos") >= minCos)

    val dropped = dups.groupBy(col("bid")).agg(min(col("aid")).as("dup_of"))
    assigned.select(col("cid"), col("vid"))
      .join(dropped, col("vid") === col("bid"), "left_outer")
      .select(col("cid"), col("vid"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
  }
}
