package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.Dedup

/**
 * STREAMING MinHash/LSH near-duplicate detection — the arrival-time
 * form of d02's banded Jaccard estimation, completing the streamed
 * dedup family: exact fingerprints (q91), SimHash hamming
 * ([[NearDupLedger]], q108), perceptual hashes (m07), and now the
 * shingle-set similarity the MinHash family measures (the Jaccard
 * near-dup semantics SimHash's bit-vector distance approximates
 * differently).
 *
 * Same persisted posting-store shape as [[NearDupLedger]]: a
 * [[BucketedUpsert.State]] keyed by LSH band value (the classic
 * "agree exactly on one band of the signature" pigeonhole — a pair
 * with Jaccard ≥ t agrees on ≥ 1 of the `bands` bands with
 * probability 1 − (1 − t^(k/bands))^bands), posting arrays of
 * (id, k-element signature) as payload, array-concat monoid combine.
 *
 * [[observe]] uses MERGE-THEN-PROBE: the batch's postings fold in
 * first (guarded by the `lastOp` durable token — a foreachBatch
 * replay of the same opId skips the fold), then ONE self-excluding
 * probe of the batch's band keys against the store yields
 * cross-batch AND within-batch pairs in a single shape — the union
 * over batches is exactly the d02 batch recompute (each pair
 * surfaces once, in the batch that carries its later member), and a
 * replayed batch recomputes the identical result for free. Probe
 * cost is the [[BucketedUpsert.State.lookupJoin]] contract:
 * O(batch + state·k/n), never batch × ledger.
 *
 * The est_sim math is d02's verbatim: matching signature components
 * / k, computed by a codegen'd zip_with/aggregate over the posting's
 * carried signature — so the DuckDB oracle that restates d02
 * restates this ledger's accumulated output too.
 */
object MinHashLedger {
  /** Reattach a ledger to its committed store root. */
  def recover(ss: SparkSession, k: Int, bands: Int, minSim: Double,
      nBuckets: Int, root: String): MinHashLedger = {
    val l = new MinHashLedger(ss, k, bands, minSim, nBuckets, Some(root))
    l.store.loadManifest()
    l.store.gc()
    l
  }
}

final class MinHashLedger(ss: SparkSession, k: Int, bands: Int,
    minSim: Double, nBuckets: Int, root: Option[String] = None) {

  require(k % bands == 0, "bands must divide k")
  private val r = k / bands

  private def combinePostings(df: DataFrame): DataFrame =
    df.groupBy(col("bkey"))
      .agg(flatten(collect_list(col("posting"))).as("posting"))

  /** The persisted band→posting store (full State surface applies). */
  val store = new BucketedUpsert.State(ss, keyCol = "bkey",
    payloadCols = Seq("posting"), nBuckets = nBuckets,
    root = root, combine = Some(combinePostings _), hashKey = true)

  private def bandKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("sig"),
      explode_outer(array((0 until bands).map(b =>
        concat(lit(s"$b|"), Dedup.bandKey(col("sig"), b, r))): _*))
        .as("bkey"))

  /** Ingest one batch of signatures (`id`, `sig`: array of k longs —
   * [[graft.operators.Dedup.minHashDocSigs]]) and return its NEW
   * near-dup pairs (`a` < `b`, `est_sim` ≥ minSim). Merge-then-probe
   * (see class doc); the returned frame is materialized. */
  def observe(sigs: DataFrame, opId: Long): DataFrame = {
    val batch = bandKeys(sigs).localCheckpoint()
    if (!store.token("lastOp").contains(opId.toString)) {
      store.setToken("lastOp", opId.toString)
      store.merge(
        batch.groupBy(col("bkey"))
          .agg(collect_list(struct(col("id"), col("sig")))
            .as("posting")),
        opId)
    }
    // an empty batch on an empty store has nothing to probe (merge
    // committed nothing): schema-stable empty result, not a throw
    if (!store.hasState)
      return batch.limit(0).select(col("id").as("a"),
        col("id").as("b"), lit(0.0).as("est_sim"))
    // the batch is now IN the ledger: one self-excluding probe =
    // cross ∪ within, and a replayed opId recomputes it identically
    val postings = store.lookupJoin(ss, batch.select(col("bkey")))
    batch.join(postings, Seq("bkey"))
      .select(col("id"), col("sig"), explode(col("posting")).as("p"))
      .filter(col("id") =!= col("p.id"))
      .select(
        least(col("id"), col("p.id")).as("a"),
        greatest(col("id"), col("p.id")).as("b"),
        (aggregate(
          zip_with(col("sig"), col("p.sig"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).cast(DoubleType) / k)
          .as("est_sim"))
      .distinct()
      .filter(col("est_sim") >= minSim)
      .localCheckpoint()
  }
}
