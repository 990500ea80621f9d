package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * STREAMING NEAR-DUPLICATE dedup — the arrival-time form of the batch
 * SimHash/pHash pair mining (d06/m05): as document batches stream in,
 * each batch's near-duplicate pairs against EVERYTHING SEEN SO FAR are
 * emitted immediately, without ever re-scanning the accumulated corpus.
 *
 * The exact-dedup ledgers (q91 fingerprints, m06 pHashes) answer "seen
 * EXACTLY this before?" with a keyed point probe. Near-dup needs "seen
 * anything within Hamming distance d?" — a ball query no key equality
 * can serve. The pigeonhole band trick ([[graft.operators.Dedup
 * .hammingPairs]]) turns it back into key equality: split the `bits`-
 * bit signature into `d + 1` bands; any pair within distance d agrees
 * exactly on ≥ 1 band. So the ledger is a PERSISTED POSTING-LIST STORE
 * keyed by band value — a [[BucketedUpsert.State]] whose key is the
 * band key, whose payload is the posting array of (id, signature)
 * pairs, and whose merge is the array-concatenation monoid (commutative
 * up to posting order; postings are a SET semantically, so the merged
 * ledger is batch-order independent — spec-pinned).
 *
 * Per arriving batch of m docs ([[observe]]):
 *   1. m·(d+1) band keys are computed scan-side;
 *   2. candidate postings come from [[BucketedUpsert.State.lookupJoin]]
 *      — only the ≤ nBuckets state buckets those band keys route to
 *      are read, so the probe costs O(batch + state·k/n), NEVER
 *      batch × ledger and never O(ledger);
 *   3. candidates sharing a band key popcount-check exactly
 *      (`bit_count(xor)` ≤ d) → cross-batch pairs; within-batch pairs
 *      come from the same band machinery over the batch alone;
 *   4. the batch's postings fold into the store (bucket-pruned merge,
 *      one manifest commit — the crash contract is [[TxLog]]'s).
 *
 * Scale knobs, inherited from the batch machinery: `bits` must grow
 * with log2(corpus) or unrelated hamming balls overlap (d06's sizing
 * note); a HOT band value (fixed-width perceptual hashes at large n)
 * grows its posting unboundedly — `maxPosting` caps each stored
 * posting at the first-seen `maxPosting` entries (deterministic:
 * lowest ids win), the streaming mirror of `hammingPairs(maxBucket=)`:
 * bounded work, recall degrades gracefully on saturated bands only,
 * and a pair loses nothing unless ALL d+1 of its bands are saturated.
 *
 * The reference has no streaming story at all (it recomputes the world
 * per monthly dump — Main.java:380-513); this is the shape Flink/Delta
 * users build by hand around a keyed state store.
 */
object NearDupLedger {
  /** Reattach a ledger to its committed store root (the recovery half
   * — [[BucketedUpsert.recover]]'s contract: config pins validate,
   * crashed-attempt orphans reclaim). */
  def recover(ss: SparkSession, bits: Int, maxHamming: Int,
      nBuckets: Int, root: String, maxPosting: Int = 0): NearDupLedger = {
    val l = new NearDupLedger(ss, bits, maxHamming, nBuckets,
      maxPosting, Some(root))
    l.store.loadManifest()
    l.store.gc()
    l
  }
}

final class NearDupLedger(ss: SparkSession, bits: Int, maxHamming: Int,
    nBuckets: Int, maxPosting: Int = 0, root: Option[String] = None) {

  private val nBands = maxHamming + 1
  private val bandBits = bits / nBands
  require(bandBits > 0, "bits must exceed maxHamming")

  // posting concatenation is the combine monoid; the optional cap keeps
  // lowest ids deterministically (sort before slice), so a saturated
  // band converges to the same survivors under any batch order
  private def combinePostings(df: DataFrame): DataFrame = {
    val merged = df.groupBy(col("bkey"))
      .agg(flatten(collect_list(col("posting"))).as("posting"))
    if (maxPosting <= 0) merged
    else merged.withColumn("posting",
      slice(sort_array(col("posting")), 1, maxPosting))
  }

  /** The persisted band→posting store (exposed for recovery/vacuum —
   * the full [[BucketedUpsert.State]] surface applies). */
  val store = new BucketedUpsert.State(ss, keyCol = "bkey",
    payloadCols = Seq("posting"), nBuckets = nBuckets,
    root = root, combine = Some(combinePostings _), hashKey = true)

  private def bandKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        concat(lit(s"$b|"),
          shiftright(col("sig"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).cast("string"))
      }: _*)).as("bkey"))

  /** The batch's pairs against the rows the CURRENT ledger holds:
   * band-key probe → exact popcount check, a < b, deduped (a pair
   * agreeing on several bands surfaces once). */
  private def probePairs(batch: DataFrame): DataFrame = {
    val postings = store.lookupJoin(ss, batch.select(col("bkey")))
    batch.join(postings, Seq("bkey"))
      .select(col("id"), col("sig"),
        explode(col("posting")).as("p"))
      .select(
        least(col("id"), col("p.id")).as("a"),
        greatest(col("id"), col("p.id")).as("b"),
        bit_count(col("sig").bitwiseXOR(col("p.sig")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming &&
        col("a") =!= col("b"))
      .distinct()
  }

  /** Ingest one batch of signatures (`id`, `sig` columns — any
   * signature source: text simhash, media pHash) and return its NEW
   * near-dup pairs (`a` < `b`, `hamming`): batch × accumulated-ledger
   * pairs plus within-batch pairs. The union of every batch's result
   * is exactly the batch recompute's pair set — each pair surfaces
   * once, when its later member arrives. The returned frame is
   * MATERIALIZED (the ledger's bucket files are superseded by the
   * fold; a lazy result would read retired state).
   *
   * REPLAY-IDEMPOTENT under foreachBatch's at-least-once contract:
   * the concat monoid cannot make a double fold a no-op (unlike the
   * exact ledgers' min/sum), so the last folded opId rides the store
   * manifest as a durable token — a retried opId skips the fold and
   * recomputes the SAME pair set from the already-folded state (the
   * batch now being IN the ledger, one self-excluding probe yields
   * cross ∪ within in one shape). Callers make the pair SINK
   * idempotent by writing per-opId (overwrite), as the gates do.
   * Under a binding maxPosting cap a replayed batch's saturated-band
   * postings may already be evicted — the documented graceful recall
   * trade, unchanged by replay. */
  def observe(sigs: DataFrame, opId: Long): DataFrame = {
    val batch = bandKeys(sigs).localCheckpoint()
    if (store.token("lastOp").contains(opId.toString)) {
      // replay of an already-folded batch: the ledger contains it, so
      // the self-excluding probe IS cross ∪ within
      return probePairs(batch).localCheckpoint()
    }
    // cross pairs BEFORE the fold: the ledger must not contain the
    // batch while the batch probes it (within-batch pairs are counted
    // once, below)
    val cross =
      if (!store.hasState) batch.limit(0)
        .select(col("id").as("a"), col("id").as("b"),
          lit(0).cast("int").as("hamming"))
      else probePairs(batch)
    val within = graft.operators.Dedup.hammingPairs(
      sigs.select(col("id"), col("sig")), bits, maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("int"))
    val pairs = cross.unionByName(within).localCheckpoint()
    // fold the batch's postings in: one bucket-pruned merge + commit,
    // with the opId marker riding the SAME commit (atomically)
    store.setToken("lastOp", opId.toString)
    store.merge(
      batch.groupBy(col("bkey"))
        .agg(collect_list(struct(col("id"), col("sig")))
          .as("posting")),
      opId)
    pairs
  }

  /** DEEP CLONE of the ledger (the store's [[BucketedUpsert.State
   * .cloneTo]] + reattach): a what-if forget, a speculative compaction
   * — mutations on the clone can never touch the source's files. */
  def cloneTo(newRoot: String): NearDupLedger = {
    store.cloneTo(newRoot)
    NearDupLedger.recover(ss, bits, maxHamming, nBuckets, newRoot,
      maxPosting)
  }

  /** OFFLINE PAIR MINING over the accumulated ledger — the "near-dup
   * mining runs over ledger postings, not raw media" half of the
   * artifact's value: every near-dup pair derivable from the CURRENT
   * postings, without touching (or re-hashing) the corpus. Candidates
   * are per-band posting self-pairs (the pigeonhole guarantee: any
   * pair within distance d shares ≥ 1 band, so its two members sit in
   * at least one common posting), checked exactly by popcount. This
   * is the deliberate O(state) batch pass — [[observe]] is the
   * bounded per-arrival path; together they are the streaming/batch
   * halves d06/m05 gate separately. The shuffle_hash hints force both
   * sides through one exchange (ReusedExchange — the posting explode
   * runs once), the same plan pin as `hammingPairs`. */
  def minePairs(): DataFrame = {
    val posts = store.view(ss)
      .select(col("bkey"), explode(col("posting")).as("p"))
    val x = posts.hint("shuffle_hash").as("x")
    val y = posts.hint("shuffle_hash").as("y")
    x.join(y, col("x.bkey") === col("y.bkey") &&
        col("x.p.id") < col("y.p.id"))
      .select(col("x.p.id").as("a"), col("y.p.id").as("b"),
        bit_count(col("x.p.sig").bitwiseXOR(col("y.p.sig")))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** COMPLIANCE FORGET — remove documents from the ledger (the
   * right-to-be-forgotten path the exact stores serve with
   * [[BucketedUpsert.State.delete]]). A forgotten id's postings live
   * in exactly the `d + 1` band keys its SIGNATURE derives, so the
   * rewrite is bounded by the forget batch — the touched band keys'
   * postings are read back (bucket-pruned [[BucketedUpsert.State
   * .lookupJoin]]), the victims filtered out, and the survivors
   * REPLACE the old postings in one commit ([[BucketedUpsert.State
   * .replaceKeys]] — the concat monoid cannot subtract, so replace is
   * the honest primitive; a band emptied by the forget drops its key
   * entirely). After the call the forgotten ids can never pair again:
   * no posting names them. Takes (`id`, `sig`) rows — the caller
   * recomputes the signature from the content it is forgetting, the
   * same way it computed it on ingest. */
  def forget(sigs: DataFrame, opId: Long): Unit = {
    // forgetting from an empty ledger (content never ingested, or a
    // forget racing the first batch) is a legitimate no-op, not a
    // misdirecting lookup error
    if (!store.hasState) return
    val bands = bandKeys(sigs).localCheckpoint()
    val touched = store.lookupJoin(ss, bands.select(col("bkey")))
    val victims = bands
      .select(col("bkey").as("__vbk"), col("id").as("__vid"))
    val survivors = touched
      .select(col("bkey"), explode(col("posting")).as("p"))
      .join(victims,
        col("bkey") === col("__vbk") && col("p.id") === col("__vid"),
        "left_anti")
      .groupBy(col("bkey"))
      .agg(collect_list(col("p")).as("posting"))
    store.replaceKeys(survivors, touched.select(col("bkey")), opId)
  }
}
