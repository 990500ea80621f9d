package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental connected-components maintenance: fold a batch of NEW
 * edges into an existing labeling without recomputing over the old
 * edge set — the graph-family twin of the storage-side maintain
 * operators (g03/q83/s20): build once, then pay per increment only
 * for what the increment touches.
 *
 * The old GRAPH is never needed — only its labeling. Contracting every
 * old component to its label vertex preserves connectivity, so:
 *
 *   1. CONTRACT: rewrite each new edge over component labels
 *      (an endpoint the labeling hasn't seen keeps its own id, the
 *      label a singleton would have). Edges inside one old component
 *      become self-loops and drop out here — a batch that only adds
 *      intra-component edges costs nothing further.
 *   2. MERGE: run min-label propagation ([[Dedup.connectedComponents]])
 *      on the contracted delta graph alone — O(new edges), never
 *      O(graph): iterations shuffle the batch, not the accumulated
 *      edge set.
 *   3. RELABEL: map old labels through the merge table (identity rows
 *      dropped, so the table holds only components the batch actually
 *      merged — typically tiny and AQE-broadcast-able, making the
 *      relabel of the big labels table a shuffle-free broadcast join),
 *      and label the batch's unseen vertices from the same table.
 *
 * Labels are min-ids, and a min of mins over merged groups is the
 * global min, so maintain(cc(G), E) ≡ cc(G ∪ E) EXACTLY — the q88
 * gate hash-proves it against a full recursive-CTE recompute, and the
 * spec cross-checks randomized graphs. At 100 TB this is the
 * difference between re-walking years of accumulated edges per daily
 * batch and walking the batch: the labeling is the persisted artifact
 * (a columnar (id, cluster) table), and each maintain reads it once
 * through one join.
 */
object IncrementalCC {

  /**
   * @param prevLabels `(id, cluster)` — an existing [[Dedup.connectedComponents]]
   *                   labeling (cluster = min member id)
   * @param newEdgesRaw raw `(src, dst)` batch; canonicalized here
   * @return `(id, cluster)` for every vertex of the grown graph
   */
  def maintain(prevLabels: DataFrame, newEdgesRaw: DataFrame,
      maxIter: Int = 20): DataFrame =
    maintainAnnotated(prevLabels, newEdgesRaw, maxIter)
      .select(col("id"), col("cluster"))

  /** [[maintain]] plus the CHANGED-ROW DELTA — `(full labeling, rows
   * whose (id, cluster) differs from prevLabels)`. The delta is derived
   * from the (typically tiny, broadcast-able) merge table — relabels of
   * merged components plus the batch's fresh vertices — NOT from an
   * O(state) diff join against the previous labeling, so a durable
   * labeling store ([[graft.streaming.ClusterLedger]]) can commit
   * exactly what each batch changed at delta cost. */
  def maintainWithDelta(prevLabels: DataFrame, newEdgesRaw: DataFrame,
      maxIter: Int = 20): (DataFrame, DataFrame) = {
    val ann = maintainAnnotated(prevLabels, newEdgesRaw, maxIter)
    (ann.select(col("id"), col("cluster")),
      ann.filter(col("__changed")).select(col("id"), col("cluster")))
  }

  /** The single-frame form both [[maintain]] and [[maintainWithDelta]]
   * project from: the full grown labeling with a `__changed` flag
   * marking exactly the delta rows. A per-batch consumer that needs
   * BOTH the labeling and the delta ([[graft.streaming.ClusterLedger]])
   * materializes THIS frame once — one localCheckpoint job instead of
   * two separate ones per micro-batch, which is the dominant cost of a
   * maintain loop whose frames are delta-sized (tiny-job scheduling,
   * not data). */
  def maintainAnnotated(prevLabels: DataFrame, newEdgesRaw: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val newEdges = GraphEdges.canonical(newEdgesRaw)
    val la = prevLabels.select(col("id").as("a"), col("cluster").as("__ca"))
    val lb = prevLabels.select(col("id").as("b"), col("cluster").as("__cb"))
    val contracted = newEdges
      .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
      .select(coalesce(col("__ca"), col("a")).as("a"),
        coalesce(col("__cb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
    // merge table over the contracted DELTA graph only; identity rows
    // dropped — what remains is exactly the components this batch merged
    // (its lineage is connectedComponents' own checkpointed labels, so
    // the three consumers below re-read materialized rows, not the
    // iteration)
    val merges = Dedup.connectedComponents(contracted, maxIter)
      .filter(col("cluster") =!= col("id"))
      .select(col("id").as("__old"), col("cluster").as("__new"))
    // a prevLabels row changes iff its cluster is in the merge table —
    // the left join already computes that, so the flag is free
    val relabeled = prevLabels
      .join(merges, prevLabels("cluster") === merges("__old"), "left")
      .select(prevLabels("id"),
        coalesce(col("__new"), prevLabels("cluster")).as("cluster"),
        col("__new").isNotNull.as("__changed"))
    val fresh = newEdges.select(col("a").as("id"))
      .union(newEdges.select(col("b").as("id"))).distinct()
      .join(prevLabels.select(col("id")), Seq("id"), "left_anti")
      .join(merges, col("id") === merges("__old"), "left")
      .select(col("id"), coalesce(col("__new"), col("id")).as("cluster"),
        lit(true).as("__changed"))
    relabeled.unionByName(fresh)
  }
}
