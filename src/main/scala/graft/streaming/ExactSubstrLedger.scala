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
 * corpus. The batch operator's suffix-array-free shape (stride-1
 * window fingerprints → first-occurrence-wins → interval merge)
 * decomposes into two persisted [[BucketedUpsert.State]] stores:
 *
 *  - `firsts`: fingerprint → earliest (doc, pos) occurrence, an O(1)
 *    payload per fingerprint under a MIN monoid. This is deliberately
 *    NOT the [[PostingLedger]] concat monoid: a span duplicated a
 *    million times would hold a million postings per window
 *    fingerprint there (the hot-band problem with no cap that
 *    preserves correctness — every capped posting here would be a
 *    LOST victim), where the min payload stays 16 bytes.
 *  - `victims`: every window occurrence that lost to an earlier one,
 *    keyed by its (doc, pos) coordinate — the store IS the output;
 *    its growth is the duplicated volume itself, not a state-design
 *    choice.
 *
 * Per-batch arrival loop (cost O(batch windows + touched buckets),
 * never batch × ledger):
 *
 *  1. fingerprint the batch's stride-1 windows in the scan stage;
 *  2. bucket-pruned lookup of the touched fingerprints' stored minima;
 *  3. the batch's victims = its windows that lose to the merged
 *     (stored ∪ batch) minimum, PLUS stored minima DISPLACED by an
 *     earlier batch occurrence (the retro-correction a directional
 *     dedup needs that the symmetric pair ledgers don't: "first
 *     occurrence" is a corpus-order fact, not an arrival-order fact,
 *     so a late-arriving earlier document must convert the previously
 *     surviving window into a victim);
 *  4. commit the victims fold, THEN the firsts fold.
 *
 * Replay safety needs no `lastOp` token (contrast
 * [[PostingLedger.observe]]'s guarded concat): both folds are
 * IDEMPOTENT monoids — re-merging a min is a no-op, and victims are
 * keyed by coordinate with a constant payload. The commit ORDER in
 * step 4 is the crash contract: the displaced set is computable only
 * while `firsts` still holds the pre-batch minima, so victims land
 * first — a crash between the commits recomputes the identical victim
 * set on retry (firsts unchanged) and re-merges it as a no-op; a
 * crash after both commits recomputes a SUBSET (the displaced minima
 * are no longer visible) whose merge is also a no-op. Pinned in
 * ExactSubstrLedgerSpec with a fault-injection seam.
 *
 * End-state contract: after ingesting the whole corpus in ANY batch
 * partitioning and order, [[spans]] equals the batch operator's
 * output exactly — the min monoid makes `firsts` order-independent,
 * and victims = all occurrences except the per-fingerprint global
 * minimum, which is the batch operator's definition. (The batch
 * operator fingerprints with two independent xxhash64 seeds; here the
 * fingerprint is the md5 of the window text — same 128-bit collision
 * envelope, one string key the store buckets by `hashKey`, the q91
 * fingerprint-store pattern.)
 */
object ExactSubstrLedger {
  /** Reattach to a committed ledger root. The victims store is
   * recovered only if it ever committed — a corpus with no duplicated
   * window merges nothing there (merge skips empty batches), which is
   * a legitimate ledger state, not corruption. */
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

  /** fingerprint → earliest (first_doc, first_pos); min-struct monoid. */
  val firsts = new BucketedUpsert.State(ss, keyCol = "fp",
    payloadCols = Seq("first_doc", "first_pos"), nBuckets = nBuckets,
    root = root.map(r => s"$r/firsts"),
    combine = Some(df => df.groupBy(col("fp"))
      .agg(min(struct(col("first_doc"), col("first_pos"))).as("__m"))
      .select(col("fp"), col("__m.first_doc").as("first_doc"),
        col("__m.first_pos").as("first_pos"))),
    hashKey = true)

  /** (doc, pos) coordinate → victim window; payload constant per key,
   * so the default latest-wins combine is deterministic. */
  val victims = new BucketedUpsert.State(ss, keyCol = "wk",
    payloadCols = Seq("doc", "pos", "win_end"), nBuckets = nBuckets,
    root = root.map(r => s"$r/victims"), hashKey = true)

  /** Stride-1 window fingerprints of a batch: (doc, pos 1-based, fp). */
  private def windows(docs: DataFrame): DataFrame =
    docs
      .select(col("id").as("doc"), TF.tokens(col("text")).as("__tok"))
      .select(col("doc"), posexplode(
        TF.wordShinglesPositional(col("__tok"), minLen)))
      .select(col("doc"), (col("pos") + 1).as("pos"),
        md5(col("col")).as("fp"))

  /** The firsts fold commit — a seam so the spec can inject a failure
   * BETWEEN the two commits and pin the recovery contract. */
  protected def commitFirsts(rows: DataFrame, opId: Long): Unit =
    firsts.merge(rows, opId)

  /** Ingest one batch of documents (`id`, `text` columns). Folds the
   * batch's windows into both stores per the class-doc arrival loop;
   * returns nothing — the accumulated output is [[spans]]. */
  def ingest(docs: DataFrame, opId: Long): Unit = {
    val w = windows(docs).localCheckpoint()
    val batchMin = w.groupBy(col("fp"))
      .agg(min(struct(col("doc"), col("pos"))).as("bm"))
    // pre-fold minima of the touched fingerprints (bucket-pruned);
    // empty-store guard: lookupJoin requires a merged state
    val old =
      if (firsts.hasState)
        firsts.lookupJoin(ss, w.select(col("fp")))
      else batchMin.limit(0).select(col("fp"),
        col("bm.doc").as("first_doc"), col("bm.pos").as("first_pos"))
    val merged = batchMin.join(old, Seq("fp"), "left_outer")
      .select(col("fp"), col("bm"),
        struct(col("first_doc").as("doc"), col("first_pos").as("pos"))
          .as("om"))
      .select(col("fp"), col("bm"), col("om"),
        when(col("om.doc").isNull || col("bm") < col("om"), col("bm"))
          .otherwise(col("om")).as("nm"))
      .localCheckpoint()
    // stored minima displaced by an earlier batch occurrence
    val displaced = merged
      .filter(col("om.doc").isNotNull && col("bm") < col("om"))
      .select(col("om.doc").as("doc"), col("om.pos").as("pos"))
    // batch windows that lose to the merged minimum
    val lost = w.join(merged.select(col("fp"), col("nm")), Seq("fp"))
      .filter(struct(col("doc"), col("pos")) > col("nm"))
      .select(col("doc"), col("pos"))
    val newVictims = displaced.unionByName(lost)
      .select(concat_ws(":", col("doc"), col("pos")).as("wk"),
        col("doc"), col("pos"),
        (col("pos") + lit(minLen - 1)).as("win_end"))
    // victims BEFORE firsts — the crash contract (class doc step 4)
    victims.merge(newVictims, opId)
    commitFirsts(
      merged.select(col("fp"), col("nm.doc").as("first_doc"),
        col("nm.pos").as("first_pos")),
      opId)
  }

  /** Maximal duplicated spans over everything ingested so far —
   * victim windows interval-merged per document, the batch operator's
   * output shape: (id, span_start, span_end, span_tokens). */
  def spans(reader: SparkSession): DataFrame = {
    if (!victims.hasState)
      return reader.range(0).select(col("id"),
        col("id").as("span_start"), col("id").as("span_end"),
        col("id").as("span_tokens"))
    graft.operators.Dedup.mergeVictimSpans(
      victims.view(reader).select(col("doc"), col("pos"),
        col("win_end").as("end")),
      "id")
  }
}
