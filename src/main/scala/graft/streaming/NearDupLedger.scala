package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/**
 * STREAMING NEAR-DUPLICATE dedup over HAMMING-BALL similarity — the
 * arrival-time form of the batch SimHash/pHash pair mining (d06/m05),
 * on the shared [[PostingLedger]] core: split the `bits`-bit signature
 * into `maxHamming + 1` bands ([[graft.operators.Dedup.hammingPairs]]'
 * pigeonhole — any pair within distance d agrees exactly on ≥ 1 band),
 * store postings per band value, score candidates by `bit_count(xor)`.
 *
 * Scale knobs, inherited from the batch machinery: `bits` must grow
 * with log2(corpus) or unrelated hamming balls overlap (d06's sizing
 * note); for FIXED-width signatures (perceptual hashes at LAION
 * scale) the guard is `maxPosting` — see [[PostingLedger]].
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
    nBuckets: Int, maxPosting: Int = 0, root: Option[String] = None)
  extends PostingLedger(ss, nBuckets, maxPosting, root) {

  private val nBands = maxHamming + 1
  private val bandBits = bits / nBands
  require(bandBits > 0, "bits must exceed maxHamming")

  protected def bandExprs: Seq[Column] =
    (0 until nBands).map { b =>
      concat(lit(s"$b|"),
        shiftright(col("sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).cast("string"))
    }

  protected def score(sig: Column, psig: Column): Column =
    bit_count(sig.bitwiseXOR(psig)).cast("int")
  protected def scoreName: String = "hamming"
  protected def keep(s: Column): Column = s <= maxHamming
  protected def zeroScore: Column = lit(0).cast("int")

  /** DEEP CLONE of the ledger (the store's [[BucketedUpsert.State
   * .cloneTo]] + reattach): a what-if forget, a speculative compaction
   * — mutations on the clone can never touch the source's files. */
  def cloneTo(newRoot: String): NearDupLedger = {
    store.cloneTo(newRoot)
    NearDupLedger.recover(ss, bits, maxHamming, nBuckets, newRoot,
      maxPosting)
  }
}
