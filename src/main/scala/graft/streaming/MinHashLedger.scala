package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.operators.Dedup

/**
 * STREAMING MinHash/LSH near-duplicate detection — the arrival-time
 * form of d02's banded Jaccard estimation, on the shared
 * [[PostingLedger]] core, completing the streamed dedup family: exact
 * fingerprints (q91), SimHash hamming ([[NearDupLedger]], q108),
 * perceptual hashes (m07), and the shingle-SET similarity MinHash
 * measures (the Jaccard semantics bit-vector hamming only
 * approximates). Banding is the classic LSH split of the k-element
 * signature into `bands` bands (a pair with Jaccard ≥ t agrees on
 * ≥ 1 band with probability 1 − (1 − t^(k/bands))^bands); the score
 * is d02's est_sim verbatim — matching signature components / k via
 * a codegen'd zip_with/aggregate — so d02's DuckDB oracle restates
 * this ledger's accumulated output too.
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
    minSim: Double, nBuckets: Int, root: Option[String] = None)
  extends PostingLedger(ss, nBuckets, maxPosting = 0, root) {

  require(k % bands == 0, "bands must divide k")
  private val r = k / bands

  protected def bandExprs: Seq[Column] =
    (0 until bands).map(b =>
      concat(lit(s"$b|"), Dedup.bandKey(col("sig"), b, r)))

  protected def score(sig: Column, psig: Column): Column =
    aggregate(
      zip_with(sig, psig, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v).cast(DoubleType) / k
  protected def scoreName: String = "est_sim"
  protected def keep(s: Column): Column = s >= minSim
  protected def zeroScore: Column = lit(0.0)
}
