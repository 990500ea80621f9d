package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared core of the STREAMING NEAR-DUPLICATE ledgers
 * ([[NearDupLedger]] — SimHash/pHash hamming; [[MinHashLedger]] —
 * MinHash/LSH Jaccard): a persisted posting-list store keyed by LSH
 * band value over a [[BucketedUpsert.State]], with the
 * merge-then-probe arrival loop, offline mining, and compliance
 * forget implemented ONCE. Subclasses contribute only the banding
 * scheme and the pair score (the two places the signature families
 * genuinely differ).
 *
 * The exact-dedup ledgers (q91 fingerprints, m06 pHashes) answer
 * "seen EXACTLY this before?" with a keyed point probe. Near-dup
 * needs a similarity ball query no key equality can serve; the
 * pigeonhole band trick turns it back into key equality (any pair
 * above the similarity bar agrees exactly on ≥ 1 band), so the
 * ledger's key is the band value and its payload the posting array
 * of (id, signature) pairs, merged by the array-concatenation monoid
 * (commutative up to posting order; postings are a SET semantically,
 * so the ledger is batch-order independent — spec-pinned).
 *
 * [[observe]] is MERGE-THEN-PROBE, replay-idempotent under
 * foreachBatch's at-least-once contract: the fold is guarded by a
 * `lastOp` durable token riding the store manifest (the concat
 * monoid cannot make a double fold a no-op, unlike the exact
 * ledgers' min/sum), then ONE self-excluding probe of the batch's
 * band keys against the store — which now contains the batch —
 * yields cross-batch AND within-batch pairs in a single shape. A
 * retried opId skips the fold and recomputes the identical result.
 * Probe cost is [[BucketedUpsert.State.lookupJoin]]'s contract —
 * only the ≤ nBuckets state buckets the batch's band keys route to
 * are read, O(batch + state·k/n), NEVER batch × ledger. Callers
 * make the pair SINK idempotent by writing per-opId (overwrite), as
 * the gates do.
 *
 * `maxPosting` is the hot-band guard for fixed-width signatures
 * (perceptual hashes at LAION scale): each stored posting caps at
 * the `maxPosting` lowest ids (deterministic — sort before slice),
 * the streaming mirror of `hammingPairs(maxBucket=)`: bounded work,
 * recall degrades gracefully on saturated bands only, and a pair
 * loses nothing unless ALL of its bands are saturated.
 *
 * The reference has no streaming story at all (it recomputes the
 * world per monthly dump — Main.java:380-513); this is the shape
 * Flink/Delta users build by hand around a keyed state store.
 */
object PostingLedger {
  /** Per-batch saturation evidence: how many of the batch's bands sit
   * at the `maxPosting` cap after the fold — the observability an
   * operator needs to see WHEN the deliberate recall/cost trade is
   * biting (zero on a healthy corpus; a climbing count says raise the
   * cap or re-shard the hot signature). */
  final case class LedgerMetrics(opId: Long, saturatedBands: Long)
}

abstract class PostingLedger(ss: SparkSession, nBuckets: Int,
    maxPosting: Int, root: Option[String]) {

  /** Soak/ops switch: when true (and a cap is set), [[observe]] also
   * counts the batch's saturated bands — one extra pass over the
   * TOUCHED buckets only, the [[BucketedUpsert.BatchMetrics]] idiom;
   * left off in gated runs. */
  var collectSaturationMetrics: Boolean = false
  val metrics: scala.collection.mutable.ArrayBuffer[PostingLedger.LedgerMetrics] =
    scala.collection.mutable.ArrayBuffer()

  /** One band-key expression per band, over `col("sig")`. */
  protected def bandExprs: Seq[Column]

  /** The band-key ARRAY the scan stage computes — defaults to packing
   * [[bandExprs]]; override when the keys share an expensive common
   * subexpression (e.g. [[EmbeddingLedger]]'s sorted centroid ranking,
   * which per-key expressions would recompute `nProbe` times). */
  protected def bandArray: Column = array(bandExprs: _*)

  /** The pair score for (probe signature, posting signature) —
   * hamming distance, estimated Jaccard, … Names the output column. */
  protected def score(sig: Column, psig: Column): Column
  protected def scoreName: String

  /** Keep predicate over the score column (the similarity bar). */
  protected def keep(s: Column): Column

  /** A zero literal of the score column's exact type (schema-stable
   * empty results). */
  protected def zeroScore: Column

  // posting concatenation is the combine monoid; the optional cap
  // keeps lowest ids deterministically (sort before slice), so a
  // saturated band converges to the same survivors under any order
  private def combinePostings(df: DataFrame): DataFrame = {
    val merged = df.groupBy(col("bkey"))
      .agg(flatten(collect_list(col("posting"))).as("posting"))
    if (maxPosting <= 0) merged
    else merged.withColumn("posting",
      slice(sort_array(col("posting")), 1, maxPosting))
  }

  /** The persisted band→posting store (exposed for recovery/vacuum —
   * the full [[BucketedUpsert.State]] surface applies). LSM mode
   * (r16): uniformly-hashed band keys touch every bucket, so the
   * classic fold rewrote the FULL accumulated posting state per
   * micro-batch — the same linear-arrival trade the exact-substring
   * ledger carried. Generations append per batch and the concat
   * monoid collapses at read; exactly-once appends come from the
   * `lastOp` replay guard in [[observe]] (concat is not idempotent —
   * the guard, not the monoid, is what makes lsm replay-safe here),
   * and the posting CAP keeps its guarantee under partial folds
   * because keep-lowest-k is ASSOCIATIVE (dropping an id outside A's
   * lowest k can never re-enter the lowest k of A ∪ B). Trade: the
   * per-arrival probe ([[BucketedUpsert.State.lookupJoin]]) now pays
   * the reduce over the probed rows, and a hot band's STORED postings
   * exceed the cap until a compaction applies it — bounded-work on
   * hot bands becomes a maintenance cadence property
   * (compact/compactTiered), not a per-write invariant. */
  val store = new BucketedUpsert.State(ss, keyCol = "bkey",
    payloadCols = Seq("posting"), nBuckets = nBuckets,
    root = root, combine = Some(combinePostings _), hashKey = true,
    lsm = true)

  private def bandKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("sig"),
      // outer: the band array is never empty (fixed element count),
      // and the non-outer form's implicit size>0 filter would rebuild
      // the array (d02's explode lesson)
      explode_outer(bandArray).as("bkey"))

  /** The batch's pairs against the rows the CURRENT ledger holds:
   * band-key probe → exact score check, a < b, deduped (a pair
   * agreeing on several bands surfaces once). */
  private def probePairs(batch: DataFrame): DataFrame =
    batch.join(store.lookupJoin(ss, batch.select(col("bkey"))),
        Seq("bkey"))
      .select(col("id"), col("sig"), explode(col("posting")).as("p"))
      .filter(col("id") =!= col("p.id"))
      .select(
        least(col("id"), col("p.id")).as("a"),
        greatest(col("id"), col("p.id")).as("b"),
        score(col("sig"), col("p.sig")).as(scoreName))
      // filter BEFORE distinct: on a hot band most collision
      // candidates fail the score bar, and the dedup exchange must
      // carry only real pairs, not O(candidates)
      .filter(keep(col(scoreName)))
      .distinct()

  /** Ingest one batch of signatures (`id`, `sig` columns — whatever
   * signature family the subclass bands) and return its NEW near-dup
   * pairs (`a` < `b`, score): batch × accumulated-ledger pairs plus
   * within-batch pairs, each pair surfacing exactly once across the
   * stream — in the batch that carries its later member. The result
   * is MATERIALIZED (a lazy frame would read retired state after a
   * later fold). See the class doc for the merge-then-probe replay
   * contract. */
  /** The fold commit itself — a seam so specs can inject a
   * post-commit failure and pin the rollback contract below. */
  protected def foldCommit(posting: DataFrame, opId: Long): Unit =
    store.merge(posting, opId)

  def observe(sigs: DataFrame, opId: Long): DataFrame = {
    val batch = bandKeys(sigs).localCheckpoint()
    // concat is not idempotent — the shared replayGuarded contract
    // (set token, fold in the same commit, resync the token from the
    // committed manifest on failure) carries replay safety
    val replayed = !store.replayGuarded("lastOp", opId) {
      foldCommit(
        batch.groupBy(col("bkey"))
          .agg(collect_list(struct(col("id"), col("sig")))
            .as("posting")),
        opId)
    }
    // an empty batch on an empty store has nothing to probe (the
    // merge committed nothing): schema-stable empty result
    if (!store.hasState)
      return batch.limit(0).select(col("id").as("a"),
        col("id").as("b"), zeroScore.as(scoreName))
    // metric only on the FIRST fold of an opId: a replayed batch's
    // duplicate row would double-count in any per-batch sum (exactly
    // what LedgerSoak computes), misreporting saturation
    if (collectSaturationMetrics && maxPosting > 0 && !replayed)
      metrics += PostingLedger.LedgerMetrics(opId,
        store.lookupJoin(ss, batch.select(col("bkey")))
          .filter(size(col("posting")) >= maxPosting).count())
    probePairs(batch).localCheckpoint()
  }

  /** OFFLINE PAIR MINING over the accumulated ledger — every pair
   * derivable from the CURRENT postings, without touching (or
   * re-hashing) the corpus: candidates are per-band posting
   * self-pairs (the pigeonhole guarantee), checked exactly by the
   * score. The deliberate O(state) batch pass complementing
   * [[observe]]'s bounded per-arrival path. The shuffle_hash hints
   * force both sides through one exchange (ReusedExchange — the
   * posting explode runs once), the same plan pin as
   * `Dedup.hammingPairs`. */
  def minePairs(): DataFrame = {
    val posts = store.view(ss)
      .select(col("bkey"), explode(col("posting")).as("p"))
    val x = posts.hint("shuffle_hash").as("x")
    val y = posts.hint("shuffle_hash").as("y")
    x.join(y, col("x.bkey") === col("y.bkey") &&
        col("x.p.id") < col("y.p.id"))
      .select(col("x.p.id").as("a"), col("y.p.id").as("b"),
        score(col("x.p.sig"), col("y.p.sig")).as(scoreName))
      .filter(keep(col(scoreName)))
      .distinct()
  }

  /** COMPLIANCE FORGET — remove documents from the ledger (the
   * right-to-be-forgotten path the exact stores serve with
   * [[BucketedUpsert.State.delete]]). A forgotten id's postings live
   * in exactly the band keys its SIGNATURE derives, so the rewrite is
   * bounded by the forget batch: the touched band keys' postings are
   * read back (bucket-pruned lookupJoin), the victims filtered out,
   * and the survivors REPLACE the old postings in one commit
   * ([[BucketedUpsert.State.replaceKeys]] — the concat monoid cannot
   * subtract, so replace is the honest primitive; a band emptied by
   * the forget drops its key entirely). Takes (`id`, `sig`) rows —
   * the caller recomputes the signature from the content it is
   * forgetting, the same way it computed it on ingest. Idempotent. */
  def forget(sigs: DataFrame, opId: Long): Unit = {
    // forgetting from an empty ledger (content never ingested) is a
    // legitimate no-op, not a misdirecting lookup error
    if (!store.hasState) return
    val bands = bandKeys(sigs).localCheckpoint()
    val bandKeySet = bands.select(col("bkey")).distinct()
    val touched = store.lookupJoin(ss, bandKeySet)
    val victims = bands
      .select(col("bkey").as("__vbk"), col("id").as("__vid"))
    val survivors = touched
      .select(col("bkey"), explode(col("posting")).as("p"))
      .join(victims,
        col("bkey") === col("__vbk") && col("p.id") === col("__vid"),
        "left_anti")
      .groupBy(col("bkey"))
      .agg(collect_list(col("p")).as("posting"))
    // the replaced key set is the BAND key set, not the store-derived
    // touched set: a band key absent from the store replaces to its
    // (absent) rows — a no-op — and the store-derived set would cost a
    // second bucket scan just to re-learn what the semi-join already
    // pruned. survivors ⊆ bandKeySet holds by construction (survivors
    // group exactly the touched postings, themselves semi-joined on
    // bandKeySet), so the prechecked path skips the stray-rows scan —
    // together these cut forget from three touched-bucket evaluations
    // (strays + key collect + rewrite) to ONE.
    store.replaceKeysPrechecked(survivors, bandKeySet, opId)
  }
}
