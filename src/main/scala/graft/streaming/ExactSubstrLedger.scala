package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/**
 * STREAMING exact-substring dedup — the arrival-time form of
 * [[graft.operators.Dedup.exactSubstrSpans]] (d12), completing the
 * batch→stream matrix for the last dedup family member: a
 * continuously-ingesting pipeline marks every duplicated token span of
 * ≥ `minLen` tokens, at ANY offset, without ever re-scanning the
 * corpus. Two LSM-generation [[BucketedUpsert.State]] stores
 * (`lsm = true`):
 *
 *  - `firsts`: per batch, each touched fingerprint's earliest
 *    (doc, pos) occurrence IN THAT BATCH, appended as a generation;
 *    the global earliest is the MIN-monoid reduce over generations,
 *    taken at read ([[BucketedUpsert.State.view]]) or folded down at
 *    [[maintain]] time. O(1) payload per fingerprint per touching
 *    batch (a posting list would hold every occurrence of a hot span;
 *    any correctness-preserving cap is impossible since capped
 *    postings ARE victims).
 *  - `victims`: occurrences known to have lost, keyed by (doc, pos)
 *    coordinate; constant payload per key, so replayed appends
 *    collapse at read. Its growth is the duplicated volume itself.
 *
 * ARRIVAL IS BLIND-APPEND — the r15→r16 redesign. The previous ledger
 * read the touched fingerprints' stored minima every batch to compute
 * victims and displacements eagerly; with uniformly-hashed
 * fingerprints every batch touched every bucket, so arrival cost grew
 * LINEARLY with accumulated state (XsubstrSoak measured ratio 2.62
 * over 20× growth). The decomposition that removes the state read:
 *
 *  1. a window that loses to its OWN batch's minimum for the same
 *     fingerprint is a victim REGARDLESS of global state (the global
 *     minimum is ≤ the batch minimum) — computable from the batch
 *     alone, appended to `victims` at arrival;
 *  2. whether a batch MINIMUM ultimately survives is a corpus-order
 *     fact the min-reduce settles WITHOUT arrival-time help: a stored
 *     batch-minimum that exceeds the global minimum of its
 *     fingerprint is a victim, derivable from the `firsts`
 *     generations at read ([[spans]]) — so the eager "displacement"
 *     bookkeeping the old design did per batch is just the read-side
 *     reduce, deferred.
 *
 * Per-batch cost is therefore O(batch windows): fingerprint, one
 * batch-local groupBy, two generation appends, two manifest writes —
 * nothing that scales with the ledger. [[maintain]] amortizes the
 * read side: it FLUSHES the currently-derivable cross-batch victims
 * into the victims store (append, idempotent), THEN compacts both
 * stores' generations (the min-reduce discards losing batch-minima,
 * which is exactly why the flush must commit first — the spec pins
 * the order with a fault-injection seam). A crash between the two
 * re-derives the identical flush on retry (firsts unchanged) and
 * re-merges it as a no-op.
 *
 * Replay safety needs no `lastOp` token (contrast
 * [[PostingLedger.observe]]'s guarded concat): a replayed batch
 * appends duplicate generations, and both stores' read-side reduces
 * are IDEMPOTENT (min / keyed-constant) — the duplicate pair
 * collapses to the single-delivery state, and [[spans]] dedups
 * victim coordinates before the interval merge.
 *
 * End-state contract: after ingesting the whole corpus in ANY batch
 * partitioning and order, with or without any interleaving of
 * [[maintain]] calls, [[spans]] equals the batch operator's output
 * exactly — victims = all occurrences except the per-fingerprint
 * global minimum, which is the batch operator's definition. (The
 * batch operator fingerprints with two independent xxhash64 seeds;
 * here the fingerprint is the md5 of the window text — same 128-bit
 * collision envelope, one string key the store buckets by `hashKey`,
 * the q91 fingerprint-store pattern.)
 */
object ExactSubstrLedger {
  /** Reattach to a committed ledger root. The victims store is
   * recovered only if it ever committed — a corpus whose batches had
   * no batch-local losers (and no flush yet) merges nothing there,
   * which is a legitimate ledger state, not corruption. */
  def recover(ss: SparkSession, minLen: Int, nBuckets: Int,
      root: String): ExactSubstrLedger = {
    val led = new ExactSubstrLedger(ss, minLen, nBuckets, Some(root))
    led.firsts.loadManifest()
    led.firsts.gc()
    if (led.victims.committedToken("key").isDefined) {
      led.victims.loadManifest()
      led.victims.gc()
    }
    led
  }
}

class ExactSubstrLedger(ss: SparkSession, minLen: Int, nBuckets: Int,
    root: Option[String] = None) {
  require(minLen >= 2, s"ExactSubstrLedger: minLen $minLen too small")

  /** fingerprint → earliest (first_doc, first_pos); min-struct monoid,
   * LSM generations (one per touching batch until [[maintain]]). */
  val firsts = new BucketedUpsert.State(ss, keyCol = "fp",
    payloadCols = Seq("first_doc", "first_pos"), nBuckets = nBuckets,
    root = root.map(r => s"$r/firsts"),
    combine = Some(df => df.groupBy(col("fp"))
      .agg(min(struct(col("first_doc"), col("first_pos"))).as("__m"))
      .select(col("fp"), col("__m.first_doc").as("first_doc"),
        col("__m.first_pos").as("first_pos"))),
    hashKey = true, lsm = true)

  /** (doc, pos) coordinate → victim window; payload constant per key,
   * so the default latest-wins combine is deterministic and replayed
   * generations collapse at read. */
  val victims = new BucketedUpsert.State(ss, keyCol = "wk",
    payloadCols = Seq("doc", "pos", "win_end"), nBuckets = nBuckets,
    root = root.map(r => s"$r/victims"), hashKey = true, lsm = true)

  /** Stride-1 window fingerprints of a batch: (doc, pos 1-based, fp). */
  private def windows(docs: DataFrame): DataFrame =
    docs
      .select(col("id").as("doc"), TF.tokens(col("text")).as("__tok"))
      .select(col("doc"), posexplode(
        TF.wordShinglesPositional(col("__tok"), minLen)))
      .select(col("doc"), (col("pos") + 1).as("pos"),
        md5(col("col")).as("fp"))

  private def asVictims(occ: DataFrame): DataFrame =
    occ.select(concat_ws(":", col("doc"), col("pos")).as("wk"),
      col("doc"), col("pos"),
      (col("pos") + lit(minLen - 1)).as("win_end"))

  /** The firsts append commit — a seam so the spec can inject a
   * failure BETWEEN the two commits and pin the recovery contract. */
  protected def commitFirsts(rows: DataFrame, opId: Long): Unit =
    firsts.merge(rows, opId)

  /** The firsts generation fold inside [[maintain]] — a seam so the
   * spec can inject a crash BETWEEN the flush commit and the
   * compaction that discards the flushed losers. */
  protected def compactFirsts(opId: Long): Unit = {
    firsts.compact(opId); ()
  }

  /** Ingest one batch of documents (`id`, `text` columns): the
   * class-doc blind-append loop — batch-local losers to `victims`,
   * per-fingerprint batch minima to `firsts`, no state read. Victims
   * commit first (the same order [[maintain]] needs; here it is
   * convention, not correctness — both appends are independent). */
  def ingest(docs: DataFrame, opId: Long): Unit = {
    val w = windows(docs).localCheckpoint()
    val batchMin = w.groupBy(col("fp"))
      .agg(min(struct(col("doc"), col("pos"))).as("bm"))
      .localCheckpoint()
    // windows losing to their OWN batch minimum: victims regardless of
    // any other batch (global min ≤ batch min) — zero state read
    val lost = w.join(batchMin, Seq("fp"))
      .filter(struct(col("doc"), col("pos")) > col("bm"))
      .select(col("doc"), col("pos"))
    victims.merge(asVictims(lost), opId)
    commitFirsts(
      batchMin.select(col("fp"), col("bm.doc").as("first_doc"),
        col("bm.pos").as("first_pos")),
      opId)
  }

  /** Batch-minima that lose to their fingerprint's GLOBAL minimum —
   * the deferred cross-batch victims, derived from the firsts
   * generations ([[BucketedUpsert.State.rawView]]: the reduce would
   * fold away exactly the losers this needs). Empty right after a
   * [[maintain]] (single generation ⇒ every row is its own global
   * minimum). */
  private def crossBatchVictims(reader: SparkSession): DataFrame =
    losersWithin(firsts.rawView(reader))

  /** Batch-minima rows of `raw` that lose to the per-fingerprint
   * minimum WITHIN `raw` — the one victim-derivation rule, shared by
   * the read path (over all generations), the full-maintain flush,
   * and the tiered fold's subset flush, so the three can never
   * drift. */
  private def losersWithin(raw: DataFrame): DataFrame = {
    val gm = raw.groupBy(col("fp"))
      .agg(min(struct(col("first_doc"), col("first_pos"))).as("gm"))
    raw.join(gm, Seq("fp"))
      .filter(struct(col("first_doc"), col("first_pos")) > col("gm"))
      .select(col("first_doc").as("doc"), col("first_pos").as("pos"))
  }

  /** MAINTENANCE: flush the derivable cross-batch victims into the
   * victims store, then fold both stores' generations down
   * (min-reduce / coordinate dedup). Correctness never depends on
   * calling this — [[spans]] derives in-flight victims on the fly —
   * but the flush MUST commit before the firsts compaction (the
   * min-reduce discards the losing batch-minima the flush reads); a
   * crash between the two re-derives the identical flush on retry.
   * Amortization: each appended row is folded O(compactions) times,
   * so calling this every k batches bounds read amplification at k
   * generations while keeping arrival O(batch). */
  def maintain(opId: Long): Unit = {
    if (!firsts.hasState) return
    // checkpoint the flush ONCE: merge executes its input twice
    // (touched-bucket collect + write), and this derivation is the
    // heaviest read in the maintenance path (full rawView + groupBy +
    // self-join) — the same double-execution guard ingest applies
    victims.merge(
      asVictims(crossBatchVictims(ss)).localCheckpoint(), opId)
    compactFirsts(opId)
    if (victims.hasState) victims.compact(opId)
  }

  /** The SCALE maintenance cadence: size-tiered generation merges
   * ([[BucketedUpsert.State.compactTiered]]) instead of [[maintain]]'s
   * full fold — each call reads only the `fanout` smallest
   * generations per over-long bucket, so periodic maintenance cost is
   * bounded by recent-arrival volume, not accumulated state
   * (amortized O(log batches) rewrites per row; the full maintain's
   * O(state)-per-call bill grew 41→80 s across one XsubstrSoak run).
   * Correct for the SAME reason the flush-then-fold order is: a
   * batch-minimum that loses WITHIN the merged subset loses to an
   * occurrence that is genuinely earlier, so it is a victim
   * regardless of anything outside the subset — the `beforeFold` hook
   * commits exactly those subset losers to the victims store before
   * the fold discards them, and everything not yet derivable stays in
   * the surviving generations for [[spans]]/a later call. */
  def maintainTiered(opId: Long, fanout: Int = 4,
      maxGens: Int = 8): Unit = {
    if (!firsts.hasState) return
    firsts.compactTiered(opId, fanout, maxGens,
      beforeFold = Some { raw =>
        victims.merge(
          asVictims(losersWithin(raw)).localCheckpoint(), opId)
      })
    if (victims.hasState) victims.compactTiered(opId, fanout, maxGens)
  }

  /** Maximal duplicated spans over everything ingested so far —
   * victim coordinates (stored ∪ derived cross-batch) interval-merged
   * per document, the batch operator's output shape:
   * (id, span_start, span_end, span_tokens). */
  def spans(reader: SparkSession): DataFrame = {
    if (!firsts.hasState)
      return reader.range(0).select(col("id"),
        col("id").as("span_start"), col("id").as("span_end"),
        col("id").as("span_tokens"))
    val stored =
      if (victims.hasState)
        victims.view(reader).select(col("doc"), col("pos"))
      else crossBatchVictims(reader).limit(0)
    // a single-generation firsts store (freshly maintained) holds one
    // row per fingerprint, so cross-batch losers are PROVABLY absent —
    // skip the state-sized derivation and serve from victims alone
    // (the post-maintenance serving pattern reads at store cost)
    val all =
      (if (firsts.singleGeneration) stored
       else stored.unionByName(crossBatchVictims(reader))
         .distinct()) // replayed generations may duplicate a coordinate
        .select(col("doc"), col("pos"),
          (col("pos") + lit(minLen - 1)).as("end"))
    graft.operators.Dedup.mergeVictimSpans(all, "id")
  }
}
