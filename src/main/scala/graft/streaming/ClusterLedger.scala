package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * DURABLE streamed cluster maintenance: fold per-batch near-dup PAIR
 * deltas into a persisted `(id, cluster)` labeling — the transitive-
 * closure state of the arrival-time dedup lifecycle (q110), surviving
 * driver loss like every other persisted artifact (ledger postings,
 * pack totals, sketch stores).
 *
 * Per batch, [[graft.operators.IncrementalCC.maintain]] folds the new
 * pairs into the carried labeling (contracted-delta economics — CC
 * iterations shuffle the batch, never the accumulated pair set), and
 * only the CHANGED rows merge into a [[BucketedUpsert.State]]:
 * relabels of merged components plus the batch's fresh vertices, so
 * the store rewrite is bounded by what the batch actually changed.
 *
 * The combine monoid is `min(cluster)` — a vertex's label only ever
 * DECREASES under min-label propagation (a merge relabels to the
 * minimum member id of the merged group), so min is not just
 * commutative/associative but IDEMPOTENT over replays: a foreachBatch
 * retry of a committed delta re-merges to the identical state, and no
 * `lastOp` token is needed (contrast [[PostingLedger]], whose concat
 * monoid cannot absorb a double fold).
 *
 * The in-memory labeling cache exists only to avoid re-reading the
 * store per batch; the STORE is the truth — [[ClusterLedger.recover]]
 * rebuilds the cache from the committed manifest, and
 * recover → continue ≡ uninterrupted maintenance (spec-pinned). A
 * crash mid-stream therefore never forces the offline fallback
 * (re-mine all pairs + full re-closure) that an in-JVM labeling
 * would — at 100 TB that is the "never re-walk history" economics
 * the incremental-CC family exists for.
 */
object ClusterLedger {

  /** Reattach to a committed labeling root after a driver loss: the
   * live view seeds the in-memory cache and maintenance continues
   * exactly where the last committed batch left it. `retainHistory`
   * must match the build (the manifest pins it and loadManifest
   * rejects a mismatch loudly). */
  def recover(ss: SparkSession, nBuckets: Int, root: String,
      retainHistory: Boolean = false): ClusterLedger = {
    val cl = new ClusterLedger(ss, nBuckets, Some(root), retainHistory)
    cl.store.loadManifest()
    cl.store.gc()
    cl.labels = cl.store.view(ss).localCheckpoint()
    cl
  }
}

final class ClusterLedger(ss: SparkSession, nBuckets: Int,
    root: Option[String] = None, retainHistory: Boolean = false) {

  private def combineMin(df: DataFrame): DataFrame =
    df.groupBy(col("id")).agg(min(col("cluster")).as("cluster"))

  /** The persisted `(id, cluster)` labeling (full
   * [[BucketedUpsert.State]] surface: recovery, vacuum, lookups).
   * LSM mode (r16): the merge VOLUME is already delta-bounded
   * (changed rows only), but uniformly-hashed vertex ids route those
   * deltas to every bucket, so the classic fold still read and
   * rewrote the full labeling per batch. Generations append instead;
   * min(cluster) is an idempotent monoid, so replay safety needs no
   * token and the read-side reduce (view/readAsOf/lookups) serves the
   * same labeling. */
  val store = new BucketedUpsert.State(ss, keyCol = "id",
    payloadCols = Seq("cluster"), nBuckets = nBuckets, root = root,
    combine = Some(combineMin _), retainHistory = retainHistory,
    lsm = true)

  // the companion's recover() reseeds this from the committed view
  private var labels: DataFrame = ss.range(0)
    .select(col("id"), col("id").as("cluster"))
    .localCheckpoint(true)

  /** The current labeling (the in-memory cache — identical to
   * `store.view` after every [[observe]], which the spec pins). */
  def labeling: DataFrame = labels

  /** Fold one batch of near-dup pairs (`a`, `b` columns) into the
   * labeling and commit the CHANGED rows. Replay-idempotent (min
   * monoid); an all-intra-component batch commits nothing. Returns
   * the committed changed-row delta — `(id, cluster)` for the batch's
   * fresh vertices plus every relabeled member of a merged component
   * (a row with `cluster < id` whose label WAS `id` is a demoted
   * cluster representative — the retro-correction evidence a curated
   * downstream store needs, see q115). The delta derives from the
   * cached labeling + the batch, never from the store, so consuming
   * it after the merge is safe. */
  def observe(pairs: DataFrame, opId: Long): DataFrame = {
    // only what the batch changed reaches the store: fresh vertices +
    // relabeled members of merged components, derived from the tiny
    // merge table (never an O(state) diff) — merge rewrites only the
    // buckets those ids route to. The labeling and its delta come off
    // ONE materialized frame (the `__changed` flag): a maintain loop's
    // frames are delta-sized, so its cost is tiny-job scheduling, and
    // a second localCheckpoint per batch was the single largest payer.
    // Frames.cp, NOT plain localCheckpoint: this checkpoint feeds the
    // NEXT batch's joins in several branches, and inherited size stats
    // would compound ~5×/batch until the driver drowns in BigInt
    // stats arithmetic — the ~12-batch cliff CcRepro measured (see
    // graft.Frames)
    val combined = graft.StageTimer.time("clusterledger", "fold") {
      graft.Frames.cp(graft.operators.IncrementalCC.maintainAnnotated(
        labels, pairs.select(col("a").as("src"), col("b").as("dst")),
        maxIter = 100))
    }
    val delta = combined.filter(col("__changed"))
      .select(col("id"), col("cluster"))
    graft.StageTimer.time("clusterledger", "merge") {
      store.merge(delta, opId)
    }
    labels = combined.select(col("id"), col("cluster"))
    delta
  }
}
