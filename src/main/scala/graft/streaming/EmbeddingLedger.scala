package graft.streaming

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/**
 * STREAMING EMBEDDING near-duplicate dedup — the arrival-time form of
 * d05/d10 (embedding-cosine pairs / SemDeDup), completing the streamed
 * signature-family matrix: exact (q91), SimHash hamming (q108), pHash
 * (m07), MinHash/LSH Jaccard (q112), and now dense-vector cosine.
 *
 * Rides the shared [[PostingLedger]] core; this class contributes only
 * what makes embeddings different:
 *
 *   - BANDS are the `nProbe` nearest-centroid ids against a FROZEN
 *     coarse quantizer (d10's bounded-centroid machinery — the same
 *     deterministic 6dp-rounded cosine argmax with ties to lower cid,
 *     extended to the top `nProbe` for multi-probe recall, exactly
 *     [[graft.operators.Similarity.probeCentroids]]'s contract). The
 *     quantizer is passed as driver-side literals — the streaming
 *     mirror of the bounded centroid broadcast every IVF operator
 *     here does (s02/s22's frozen-quantizer append rule: a stream
 *     NEVER retrains the quantizer mid-flight, or band keys stop
 *     meaning the same thing across batches).
 *   - the SCORE is the exact 6dp-rounded cosine over the full vectors
 *     (candidates are centroid-bucketed, the check is exact — the
 *     SemDeDup shape: Σ|cluster|² work, never n²).
 *
 * Unlike the pigeonhole families, centroid banding is RECALL-
 * HEURISTIC: a pair above the bar whose members probe disjoint
 * centroid sets is not surfaced (larger `nProbe` trades cost for
 * recall). The gate's oracle restates the identical probe rule, so
 * the equivalence is exact — batch d10 restated over the same
 * quantizer, like d05 restates its LSH buckets.
 */
object EmbeddingLedger {
  /** Reattach to a committed store root (the recovery half). The SAME
   * frozen quantizer must be passed back — band keys are derived from
   * it, and the store's bucketing pins cannot see centroid drift. */
  def recover(ss: SparkSession, centroids: Seq[(Long, Array[Double], Double)],
      nProbe: Int, minCos: Double, nBuckets: Int,
      root: String): EmbeddingLedger = {
    val l = new EmbeddingLedger(ss, centroids, nProbe, minCos, nBuckets,
      Some(root))
    l.store.loadManifest()
    l.store.gc()
    l
  }
}

final class EmbeddingLedger(ss: SparkSession,
    centroids: Seq[(Long, Array[Double], Double)], nProbe: Int,
    minCos: Double, nBuckets: Int, root: Option[String] = None)
  extends PostingLedger(ss, nBuckets, maxPosting = 0, root) {

  require(centroids.nonEmpty, "EmbeddingLedger: no centroids")
  require(nProbe >= 1 && nProbe <= centroids.size,
    s"EmbeddingLedger: nProbe $nProbe out of 1..${centroids.size}")

  // (−cos6, cid) per centroid, ascending struct sort = cosine desc with
  // ties to lower cid — probeCentroids' ordering as a pure scan-stage
  // expression (centroid vectors and norms are bounded literals)
  private def ranked: Column = array_sort(array(centroids.map {
    case (cid, cv, cn) =>
      struct(
        (-round(VF.cosineFromParts(VF.dot(col("sig"), lit(cv)),
          VF.l2Norm(col("sig")), lit(cn)), 6)).as("nc"),
        lit(cid).as("cid"))
  }: _*))

  protected def bandExprs: Seq[Column] =
    (1 to nProbe).map(i => element_at(ranked, i).getField("cid"))

  // one ranking per row, not one per probe slot
  override protected def bandArray: Column =
    transform(slice(ranked, 1, nProbe), c => c.getField("cid"))

  protected def score(sig: Column, psig: Column): Column =
    round(VF.cosineFromParts(VF.dot(sig, psig),
      VF.l2Norm(sig), VF.l2Norm(psig)), 6)
  protected def scoreName: String = "cos"
  protected def keep(s: Column): Column = s >= minCos
  protected def zeroScore: Column = lit(0.0)
}
