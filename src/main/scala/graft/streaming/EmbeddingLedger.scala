package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 *
 * DRIFT LIFECYCLE (round 15 — the streamed mirror of
 * [[graft.operators.AnnIndex.requantize]]/`imbalance`): frozen-
 * quantizer banding decays on a drifting intake — arrivals from a
 * region the quantizer never carved concentrate into a few band keys,
 * the per-band postings grow (probe cost follows), any `maxPosting`
 * cap saturates, and the streamed semantic dedup silently loses
 * recall. [[imbalance]] reads the drift statistic off the band
 * postings alone, [[refitQuantizer]] retrains the coarse quantizer on
 * the corpus the ledger itself accumulated, and [[reband]] rewrites
 * every band key under the refit quantizer in ONE
 * [[BucketedUpsert.State.replaceKeys]] commit — the committed ledger
 * afterwards is indistinguishable from one built from scratch on the
 * refit quantizer (gate-proven). The refit quantizer itself rides the
 * SAME commit as a durable token, so recovery after a reband can
 * never resurrect the stale band scheme: [[EmbeddingLedger.recover]]
 * cross-checks a passed quantizer against the committed one and
 * [[EmbeddingLedger.recoverPersisted]] reattaches from the token
 * alone.
 */
object EmbeddingLedger {
  /** Reattach to a committed store root (the recovery half). The SAME
   * frozen quantizer must be passed back — band keys are derived from
   * it. If the store carries a committed quantizer token (it was
   * [[EmbeddingLedger.reband]]ed at some point), the passed quantizer
   * is verified against it and a mismatch fails loudly: recovering a
   * rebanded ledger with the pre-refit quantizer would probe band
   * keys that no longer exist — a silent empty-result bug otherwise. */
  def recover(ss: SparkSession, centroids: Seq[(Long, Array[Double], Double)],
      nProbe: Int, minCos: Double, nBuckets: Int,
      root: String): EmbeddingLedger = {
    val l = new EmbeddingLedger(ss, centroids, nProbe, minCos, nBuckets,
      Some(root))
    l.store.loadManifest()
    l.store.gc()
    l.store.committedToken(QuantToken).foreach { tok =>
      require(tok == serializeQuantizer(nProbe, centroids),
        s"EmbeddingLedger.recover: the store at $root was rebanded — " +
          "the passed quantizer does not match the committed one " +
          "(use recoverPersisted, or pass the refit quantizer)")
    }
    l
  }

  /** Reattach to a root whose quantizer was PERSISTED by a prior
   * [[EmbeddingLedger.reband]] — the crash-recovery entry point that
   * needs no out-of-band quantizer bookkeeping: the refit centroids
   * rode the reband's own commit as a durable token. */
  def recoverPersisted(ss: SparkSession, minCos: Double, nBuckets: Int,
      root: String): EmbeddingLedger = {
    // token-only probe of the committed manifest (a full State recover
    // would need the combine/hashKey pins this entry point exists to
    // not require)
    val tok = new TxLog(ss, root, retainHistory = false, () => Seq())
      .liveTokens().flatMap(_.get(QuantToken)).getOrElse(
        sys.error(s"recoverPersisted: $root carries no committed " +
          "quantizer token — this ledger was never rebanded; recover " +
          "with the original frozen quantizer instead"))
    val (nProbe, cs) = deserializeQuantizer(tok)
    recover(ss, cs, nProbe, minCos, nBuckets, root)
  }

  private[streaming] val QuantToken = "quantizer"

  /** Exact round-trip text form of (nProbe, centroids): Java double
   * toString/parseDouble round-trips bit-exactly, so the recovered
   * quantizer derives the identical band keys. */
  private[streaming] def serializeQuantizer(nProbe: Int,
      cs: Seq[(Long, Array[Double], Double)]): String =
    s"$nProbe|" + cs.map { case (cid, cv, cn) =>
      s"$cid:${cv.mkString(",")}:$cn"
    }.mkString(";")

  private[streaming] def deserializeQuantizer(
      s: String): (Int, Seq[(Long, Array[Double], Double)]) = {
    val Array(np, body) = s.split("\\|", 2)
    (np.toInt, body.split(";").toSeq.map { e =>
      val Array(cid, cv, cn) = e.split(":", 3)
      (cid.toLong, cv.split(",").map(_.toDouble), cn.toDouble)
    })
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
  private def rankedFor(
      cs: Seq[(Long, Array[Double], Double)]): Column =
    array_sort(array(cs.map { case (cid, cv, cn) =>
      struct(
        (-round(VF.cosineFromParts(VF.dot(col("sig"), lit(cv)),
          VF.l2Norm(col("sig")), lit(cn)), 6)).as("nc"),
        lit(cid).as("cid"))
    }: _*))

  private def bandArrayFor(
      cs: Seq[(Long, Array[Double], Double)]): Column =
    transform(slice(rankedFor(cs), 1, nProbe), c => c.getField("cid"))

  protected def bandExprs: Seq[Column] =
    (1 to nProbe).map(i => element_at(rankedFor(centroids), i)
      .getField("cid"))

  // one ranking per row, not one per probe slot
  override protected def bandArray: Column = bandArrayFor(centroids)

  protected def score(sig: Column, psig: Column): Column =
    round(VF.cosineFromParts(VF.dot(sig, psig),
      VF.l2Norm(sig), VF.l2Norm(psig)), 6)
  protected def scoreName: String = "cos"
  protected def keep(s: Column): Column = s >= minCos
  protected def zeroScore: Column = lit(0.0)

  /** The corpus the ledger ACCUMULATED, recovered from its own band
   * postings: every distinct (id, sig) — each doc was posted under
   * `nProbe` band keys, distinct restores the set. This is what makes
   * the drift lifecycle self-contained: the refit needs no second
   * copy of the intake stream. */
  def corpus: DataFrame =
    store.view(ss)
      .select(explode(col("posting")).as("p"))
      .select(col("p.id").as("id"), col("p.sig").as("sig"))
      .distinct()

  /**
   * BAND-OCCUPANCY IMBALANCE — [[graft.operators.AnnIndex.imbalance]]'s
   * statistic read off the ledger's band postings ALONE (posting sizes
   * per band key — no vector math, no corpus rescan): on a drifting
   * intake the frozen quantizer routes arrivals into band keys it never
   * carved boundaries for, occupancy concentrates, per-arrival probe
   * cost grows with the hot band, and (capped stores) `maxPosting`
   * saturation silently drops pairs. Normalized `max(share) · nLists`
   * against the FROZEN quantizer's list count (≈1 balanced, → nLists
   * collapsed; emptied bands must not shrink the scale). The statistic
   * is only meaningful RELATIVE to its fit-time read — calibrate the
   * trigger as a multiple of the post-build baseline (the AnnIndex
   * s25/AnnSoak lesson: natural skew varies 1.05×–6× by distribution).
   * 0.0 on an empty ledger.
   */
  def imbalance: Double = {
    if (!store.hasState) return 0.0
    val r = store.view(ss)
      .select(size(col("posting")).cast("long").as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"))
      .head()
    r.getLong(0).toDouble / r.getLong(1) * centroids.size
  }

  /** Retrain the coarse quantizer on the accumulated [[corpus]] — the
   * same deterministic stride seeding the batch operators use
   * ([[graft.operators.Similarity.strideCentroids]]), collected to
   * bounded driver-side literals (≤ maxCentroids rows, the same
   * bounded-broadcast shape the constructor takes). */
  def refitQuantizer(centroidStride: Int,
      maxCentroids: Int): Seq[(Long, Array[Double], Double)] =
    graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.strideCentroids(corpus, "id", "sig",
        centroidStride, maxCentroids))

  /**
   * REBAND under a refit quantizer — the offline lifecycle operation
   * the frozen-quantizer rule forbids in-flight (the streamed mirror
   * of [[graft.operators.AnnIndex.requantize]]): re-derive every
   * posting's band keys under `newCentroids` and install the rewrite
   * in ONE [[BucketedUpsert.State.replaceKeys]] commit over
   * old ∪ new keys (old keys with no surviving posting drop; the
   * concat monoid cannot move a posting, so replace is the honest
   * primitive — exactly [[PostingLedger.forget]]'s argument). The
   * refit quantizer rides the SAME commit as a durable token, so a
   * crash anywhere leaves a consistent (keys, quantizer) pair: before
   * the commit, the old scheme with the old token; after it, the new
   * scheme with the new one — there is no window where recovery can
   * pair stale keys with the refit quantizer. Returns the ledger
   * REBOUND to the refit quantizer (this instance keeps the old band
   * expressions and must not be used afterwards).
   */
  def reband(newCentroids: Seq[(Long, Array[Double], Double)],
      opId: Long,
      corpusFrame: Option[DataFrame] = None): EmbeddingLedger = {
    require(newCentroids.nonEmpty, "reband: no centroids")
    if (store.hasState) {
      val posts = store.view(ss).localCheckpoint()
      val oldKeys = posts.select(col("bkey"))
      // an already-materialized corpus (rebandIfDrifted passes the one
      // its refit seeded from) skips a second O(state) explode+distinct
      val c = corpusFrame.getOrElse(posts
        .select(explode(col("posting")).as("p"))
        .select(col("p.id").as("id"), col("p.sig").as("sig"))
        .distinct())
      val newPost = c
        .select(col("id"), col("sig"),
          explode_outer(bandArrayFor(newCentroids)).as("bkey"))
        .groupBy(col("bkey"))
        .agg(collect_list(struct(col("id"), col("sig")))
          .as("posting"))
      val keys = oldKeys.unionByName(newPost.select(col("bkey")))
        .distinct()
      // the quantizer token rides the replaceKeys commit (atomic on
      // the success path); a FAILED commit resynchronizes from the
      // committed manifest — observe()'s exact rollback contract
      store.setToken(EmbeddingLedger.QuantToken,
        EmbeddingLedger.serializeQuantizer(nProbe, newCentroids))
      try store.replaceKeys(newPost, keys, opId)
      catch {
        case t: Throwable =>
          store.committedToken(EmbeddingLedger.QuantToken) match {
            case Some(v) => store.setToken(EmbeddingLedger.QuantToken, v)
            case None    => store.clearToken(EmbeddingLedger.QuantToken)
          }
          throw t
      }
    }
    // a never-committed ledger has no manifest to recover — rebanding
    // it is a legitimate no-op (nothing to rewrite), so hand back a
    // fresh ledger on the new quantizer instead of crashing in
    // TxLog.load with a misleading no-manifest error
    if (!store.hasState)
      new EmbeddingLedger(ss, newCentroids, nProbe, minCos, nBuckets,
        Some(store.rootDir))
    else
      EmbeddingLedger.recover(ss, newCentroids, nProbe, minCos, nBuckets,
        store.rootDir)
  }

  /** Decision + outcome of one drift check: the measured statistic
   * (read once — the AnnIndex ADVICE lesson), whether the refit fired,
   * and the ledger to CONTINUE with (rebound on fire, `this`
   * otherwise). */
  final case class RebandDecision(imbalance: Double, fired: Boolean,
      ledger: EmbeddingLedger)

  /**
   * Drift-TRIGGERED reband — the scheduled-hygiene policy:
   * [[imbalance]] against `maxImbalance` (calibrated to the fit-time
   * baseline), and on fire [[refitQuantizer]] + [[reband]]. A stable
   * intake never pays the rewrite; a drifted one is refit before the
   * hot bands dominate probe cost (or saturate a capped store).
   */
  def rebandIfDrifted(maxImbalance: Double, centroidStride: Int,
      maxCentroids: Int, opId: Long): RebandDecision = {
    val im = imbalance
    if (im > maxImbalance) {
      // materialize the accumulated corpus ONCE: the refit seeds from
      // it and reband rewrites from it — without this the fired path
      // pays the O(state) explode+distinct twice
      val c = corpus.localCheckpoint()
      val refit = graft.operators.Similarity.collectCentroids(
        graft.operators.Similarity.strideCentroids(c, "id", "sig",
          centroidStride, maxCentroids))
      RebandDecision(im, fired = true, reband(refit, opId, Some(c)))
    } else RebandDecision(im, fired = false, this)
  }
}
