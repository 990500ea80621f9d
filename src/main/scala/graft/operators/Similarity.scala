package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), three strategies:
 *
 *  - [[cosineTopK]] — exact brute force: broadcast the (small) query set,
 *    stream every vector partition past it, per-query top-k. The baseline
 *    and the verifier for the approximate paths. O(n·q) but embarrassingly
 *    parallel: no shuffle of the vector side, one final shuffle on qid.
 *  - [[lshTopK]] — random-hyperplane LSH: vectors bucketed by a b-bit
 *    signature computed in the scan; queries only scan their own bucket.
 *    The 100 TB path: candidate set shrinks ~2^b-fold.
 *  - [[ivfTopK]] — deterministic IVF: a coarse centroid set (stride-sampled,
 *    so seedless and reproducible), vectors assigned to nearest centroid,
 *    queries probe the `nProbe` nearest centroid lists.
 *
 * All cosine math is [[VF.cosine]] — double-precision codegen'd fold,
 * rounded to 6dp so results are engine-portable for oracle comparison.
 */
object Similarity {

  /**
   * Per-query top-k via the bounded-heap partial aggregate
   * ([[graft.functions.TopKAggregate]]): map tasks reduce their candidates
   * to ≤ k pairs before the exchange, so the shuffle carries
   * O(queries × k) instead of every scored candidate (a window
   * `row_number` would shuffle + sort the full candidate set). Ordering
   * contract: cos desc, nid asc on ties — identical to the oracle's
   * `row_number() OVER (ORDER BY cos DESC, nid)`.
   */
  private[operators] def ranked(scored: DataFrame, k: Int,
      scoreCol: String = "cos"): DataFrame = {
    import graft.functions.TopKAggregate.topKPairs
    scored.groupBy(col("qid"))
      .agg(topKPairs(struct(col(scoreCol), col("nid")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("nid"), col("col.score").as(scoreCol))
  }

  /** Window-based reference formulation of [[ranked]] (kept for
   * plan comparison and as the semantics oracle in tests). */
  private[operators] def rankedViaWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cos"))
  }

  /** Score with per-row precomputed norms (identical doubles to inline
   * cosine; the norm scans leave the O(candidates) loop). */
  private def scoreCos: Column =
    round(VF.cosineFromParts(VF.dot(col("qv"), col("nv")),
      col("qn"), col("nn")), 6)

  /** Exact cosine top-k: every query against every vector. */
  def cosineTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      VF.l2Norm(col(vecCol)).as("nn"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      VF.l2Norm(col(vecCol)).as("qn"))
    val scored = v.join(broadcast(q), col("nid") =!= col("qid"), "inner")
      .select(col("qid"), col("nid"), scoreCos.as("cos"))
    ranked(scored, k)
  }

  /** LSH top-k: only candidates sharing the query's b-bit hyperplane
   * signature are scored (partial recall by design). */
  def lshTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, bits: Int, k: Int): DataFrame = {
    val sig = (c: Column) => VF.hyperplaneSig(c, dim, bits)
    val v = vectors.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      VF.l2Norm(col(vecCol)).as("nn"), sig(col(vecCol)).as("sig"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      VF.l2Norm(col(vecCol)).as("qn"), sig(col(vecCol)).as("qsig"))
    val scored = v.join(broadcast(q),
        col("sig") === col("qsig") && col("nid") =!= col("qid"), "inner")
      .select(col("qid"), col("nid"), scoreCos.as("cos"))
    ranked(scored, k)
  }

  /**
   * Deterministic IVF top-k: centroids are the FIRST `maxCentroids` vectors
   * whose id is a multiple of `centroidStride` (a seedless coarse
   * quantizer — at real scale you'd k-means these, but a strided sample
   * keeps every engine reproducing the same index). `maxCentroids` bounds
   * the set so the centroid broadcast and the O(n·C) assignment cost stay
   * CONSTANT as the corpus grows — an uncapped stride sample grows with n
   * and turns assignment into O(n²/stride). Vectors are assigned to their
   * nearest centroid once (built like any inverted index: one shuffle);
   * each query probes the `nProbe` nearest centroid lists.
   */
  def ivfTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroidStride: Int, nProbe: Int, k: Int,
      maxCentroids: Int = 256): DataFrame =
    ivfSearch(vectors, queries, idCol, vecCol,
      strideCentroids(vectors, idCol, vecCol, centroidStride, maxCentroids),
      nProbe, k)

  /**
   * The deterministic coarse-quantizer seed: the first `maxCentroids`
   * vectors whose id is a multiple of `centroidStride`, as
   * `(cid, cv, cn)`. The CAP (not just the stride) is the scale knob —
   * it bounds the centroid broadcast and the O(n·C) assignment cost as
   * the corpus grows.
   */
  def strideCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int, maxCentroids: Int): DataFrame =
    vectors.filter(col(idCol) % centroidStride === 0 &&
        col(idCol) < centroidStride.toLong * maxCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        VF.l2Norm(col(vecCol)).as("cn"))

  /** Collect a `(cid, cv, cn)` centroid frame to the bounded
   * driver-side literal Seq every frozen-quantizer constructor takes
   * (≤ maxCentroids rows by [[strideCentroids]]' cap). One shared
   * spelling of the row→tuple conversion — the cast normalizes a
   * float-vector `cv` to the double array the quantizer math uses. */
  def collectCentroids(cent: DataFrame): Seq[(Long, Array[Double], Double)] =
    cent
      .select(col("cid"), col("cv").cast("array<double>").as("cv"),
        col("cn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
      .toSeq

  /**
   * Nearest-centroid assignment against any `(cid, cv, cn)` centroid set:
   * exact cosine argmax (6dp-rounded, ties to lower cid — the contract
   * every oracle restates). Returns `(vid, vv, vn, cid)`. One bounded
   * centroid broadcast, no shuffle of the vector side until the caller
   * aggregates.
   */
  def assignToCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame): DataFrame = {
    val v = vectors.select(col(idCol).as("vid"), col(vecCol).as("vv"),
      VF.l2Norm(col(vecCol)).as("vn"))
    val wAssign = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cid"))
    v.join(broadcast(cent))
      .select(col("vid"), col("vv"), col("vn"), col("cid"),
        round(VF.cosineFromParts(VF.dot(col("vv"), col("cv")),
          col("vn"), col("cn")), 6).as("ccos"))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") === 1)
      .select(col("vid"), col("vv"), col("vn"), col("cid"))
  }

  /**
   * IVF search against a TRAINED coarse quantizer: the [[kmeansStep]]
   * centroids (one Lloyd refinement of the strided seed) instead of the
   * raw seed vectors — the production IVF shape, where index build and
   * search are separate passes over the same bounded centroid broadcast.
   * The refined centroids tighten cluster boundaries, so the same nProbe
   * reaches more of the true neighbors (measurable against s01 exactly
   * like s05 measures the LSH path).
   */
  def ivfTopKTrained(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroidStride: Int, nProbe: Int, k: Int,
      maxCentroids: Int = 256): DataFrame = {
    val trained = kmeansStep(vectors, idCol, vecCol, centroidStride,
        maxCentroids)
      .select(col("cid"), col("centroid").as("cv"),
        VF.l2Norm(col("centroid")).as("cn"))
    ivfSearch(vectors, queries, idCol, vecCol, trained, nProbe, k)
  }

  /** Shared IVF search core: assignment scan + probe lists against any
   * `(cid, cv, cn)` centroid set. Both joins broadcast the SAME centroid
   * plan, so the exchange is computed once and reused. */
  /**
   * Query → `nProbe` nearest centroids against any `(cid, cv, cn)` set —
   * the probe-list counterpart of [[assignToCentroids]], sharing its
   * rounding and lower-cid tie contract. Returns `(qid, qv, qn, cid)`,
   * one row per probed list.
   */
  def probeCentroids(queries: DataFrame, idCol: String, vecCol: String,
      cent: DataFrame, nProbe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      VF.l2Norm(col(vecCol)).as("qn"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col("cid"))
    q.join(broadcast(cent))
      .select(col("qid"), col("qv"), col("qn"), col("cid"),
        round(VF.cosineFromParts(VF.dot(col("qv"), col("cv")),
          col("qn"), col("cn")), 6).as("ccos"))
      .withColumn("r", row_number().over(wProbe))
      .filter(col("r") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
  }

  private def ivfSearch(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cent: DataFrame, nProbe: Int,
      k: Int): DataFrame = {
    // inverted lists: vector → nearest centroid (exact cosine argmax)
    val assign = assignToCentroids(vectors, idCol, vecCol, cent)

    // probe lists: query → nProbe nearest centroids
    val probes = probeCentroids(queries, idCol, vecCol, cent, nProbe)

    val scored = probes.join(assign, "cid")
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        round(VF.cosineFromParts(VF.dot(col("qv"), col("vv")),
          col("qn"), col("vn")), 6).as("cos"))
    ranked(scored, k)
  }

  /**
   * One Lloyd refinement step for the IVF coarse quantizer: assign every
   * vector to its nearest current centroid (the same deterministic seed
   * set [[ivfTopK]] uses), then recompute each centroid as the
   * element-wise mean of its cluster — the training loop that turns the
   * strided seed set into a real quantizer at scale.
   *
   * Scale shape per step: one bounded centroid broadcast, one narrow
   * assignment scan (cosine argmax in codegen, no shuffle of vectors),
   * then ONE exchange keyed by (cid, pos) with partial aggregation — the
   * mean of a billion-vector cluster shuffles only per-dimension partial
   * sums. Means run through DECIMAL(18,6) so every engine reproduces the
   * same bits (cross-engine contract, same as [[graft.queries.Exact]]).
   *
   * Output: `cid`, `n` (cluster size), `centroid` array<double>.
   */
  def kmeansStep(vectors: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int, maxCentroids: Int = 256): DataFrame = {
    import graft.queries.Exact
    val assign = assignToCentroids(vectors, idCol, vecCol,
        strideCentroids(vectors, idCol, vecCol, centroidStride, maxCentroids))
      .select(col("vid"), col("vv"), col("cid"))

    val sizes = assign.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val means = assign
      .select(col("cid"), posexplode(col("vv")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(Exact.davg(col("x").cast("double")).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"),
        transform(col("pm"), e => e.getField("m")).as("centroid"))
    means.join(sizes, "cid").select(col("cid"), col("n"), col("centroid"))
  }

  /**
   * Product-quantized (PQ) top-k via asymmetric distance computation
   * (ADC) — the memory-compression standard of large-scale ANN (Jégou
   * et al., "Product Quantization for Nearest Neighbor Search", 2011):
   * the vector space is split into `m` subspaces; each subvector is
   * replaced by the index of its nearest codebook entry (k entries per
   * subspace), so a 64-dim float vector becomes m small codes; at query
   * time the UNCOMPRESSED query precomputes a (subspace × code) lookup
   * table of partial dot products and every candidate is scored by m
   * table lookups instead of a d-dim dot product.
   *
   * Spark shape: the codebook is deterministic (subvectors of the
   * stride-seeded sample — same seeding contract as the IVF family) and
   * tiny (m·k rows, broadcast); code assignment is a per-(vector,
   * subspace) L2 argmin against the broadcast codebook (6dp-rounded,
   * ties to lower code — the oracle contract); the ADC score joins the
   * code table to the broadcast LUT and sums the m partial dots through
   * DECIMAL so the total is order-independent; ranking is the
   * bounded-heap partial aggregate. At 100 TB the corpus-side state is
   * m·log2(k) bits per vector and the per-query cost is m lookups per
   * candidate — that is the entire point of PQ.
   */
  def pqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int, codeStride: Int,
      topK: Int): DataFrame = {
    import graft.queries.Exact
    val (codes, lut) = pqParts(vectors, queries, idCol, vecCol, dim, m, k,
      codeStride)

    // score = Σ_s lut[s, code(v, s)] — exact decimal sum of the m partials
    val scored = codes.join(broadcast(lut), Seq("s", "code"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(round(sum(Exact.dec(col("part"))).cast("double"), 6).as("adc"))

    ranked(scored, topK, scoreCol = "adc")
  }

  /**
   * IVF-PQ composed (the production recipe of billion-scale vector
   * indexes, e.g. FAISS IVFxx,PQyy): the IVF coarse quantizer restricts
   * every query to its `nProbe` nearest centroid lists, and within those
   * lists candidates are scored in the COMPRESSED domain via PQ/ADC —
   * the corpus stores only (cluster id, m codes) per vector. At scale
   * this is the difference between scanning n candidates and scanning
   * n·nProbe/C of them, each at m table lookups instead of a d-dim dot.
   * All quantizers share the deterministic stride-seeding contract, so
   * the whole composition restates in SQL for the oracle gate.
   */
  def ivfPqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int, codeStride: Int,
      centroidStride: Int, maxCentroids: Int, nProbe: Int,
      topK: Int): DataFrame = {
    import graft.queries.Exact
    val cent = strideCentroids(vectors, idCol, vecCol, centroidStride,
      maxCentroids)
    // inverted lists (vector → cluster) from the coarse quantizer
    val assign = assignToCentroids(vectors, idCol, vecCol, cent)
      .select(col("vid"), col("cid"))
    // query → nProbe nearest centroid lists
    val probes = probeCentroids(queries, idCol, vecCol, cent, nProbe)
      .select(col("qid").as("pqid"), col("cid"))

    val (codes, lut) = pqParts(vectors, queries, idCol, vecCol, dim, m, k,
      codeStride)

    // candidates = vectors in probed clusters; ADC-score them only
    val cand = probes.join(assign, "cid")
      .select(col("pqid"), col("vid"))
    val scored = cand.join(codes, col("vid") === codes("nid"))
      .join(broadcast(lut),
        col("pqid") === lut("qid") && codes("s") === lut("s") &&
          codes("code") === lut("code"))
      .filter(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      .agg(round(sum(Exact.dec(col("part"))).cast("double"), 6).as("adc"))

    ranked(scored, topK, scoreCol = "adc")
  }

  /** Shared PQ machinery: per-(vector, subspace) codes against the
   * deterministic codebook, plus the query-side ADC lookup table. */
  private def pqParts(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int,
      codeStride: Int): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m

    // deterministic codebook: subvectors of the first k stride-sampled
    // vectors, one entry per (subspace s, code j)
    val seeds = vectors.filter(col(idCol) % codeStride === 0 &&
        col(idCol) < codeStride.toLong * k)
      .select((col(idCol) / codeStride).cast("int").as("j"),
        col(vecCol).cast("array<double>").as("__v"))
    val codebook = seeds
      .select(col("j"), explode(sequence(lit(0), lit(m - 1))).as("s"),
        col("__v"))
      .select(col("s"), col("j"),
        slice(col("__v"), col("s") * sub + 1, lit(sub)).as("csub"))

    // per-(vector, subspace) code: L2 argmin over the broadcast codebook
    def subspaces(df: DataFrame, idOut: String): DataFrame = df
      .select(col(idCol).as(idOut), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idOut), explode(sequence(lit(0), lit(m - 1))).as("s"),
        col("__v"))
      .select(col(idOut), col("s"),
        slice(col("__v"), col("s") * sub + 1, lit(sub)).as("vsub"))

    val wCode = Window.partitionBy(col("nid"), col("s"))
      .orderBy(col("d2").asc, col("j"))
    val codes = subspaces(vectors, "nid")
      .join(broadcast(codebook), "s")
      .select(col("nid"), col("s"), col("j"),
        round(aggregate(zip_with(col("vsub"), col("csub"),
          (x, c) => (x - c) * (x - c)), lit(0.0), (acc, e) => acc + e), 6)
          .as("d2"))
      .withColumn("r", row_number().over(wCode))
      .filter(col("r") === 1)
      .select(col("nid"), col("s"), col("j").as("code"))

    // query-side ADC lookup table: partial dot of the RAW query subvector
    // with every codebook entry
    val lut = subspaces(queries, "qid")
      .join(broadcast(codebook), "s")
      .select(col("qid"), col("s"), col("j").as("code"),
        VF.dot(col("vsub"), col("csub")).as("part"))

    (codes, lut)
  }

  /**
   * Scalar-quantized (SQ8) top-k: each dimension is affinely mapped to
   * the integer grid 0..255 using per-dimension corpus min/max, and
   * similarity is the INTEGER dot product of the quantized codes — the
   * production memory-compression technique (4× smaller vectors, SIMD
   * integer kernels) expressed engine-portably: every score is exact
   * int64 arithmetic, so the oracle hash-matches with NO rounding
   * anywhere. Quantization parameters are computed as a one-row
   * broadcast (per-dimension min/max aggregate — 64 groups regardless of
   * corpus size), never collected to the driver; codes are built in the
   * scan stage; scoring reuses the codegen'd dot kernel on
   * integer-valued doubles (exact up to 2^53 ≫ 64·255²).
   */
  def sq8TopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topKPairs
    val (corpus, q) = sq8Parts(vectors, queries, idCol, vecCol)
    q.crossJoin(corpus)
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        VF.dot(col("qv"), col("nv")).as("score"))
      .groupBy(col("qid"))
      .agg(topKPairs(struct(col("score"), col("nid")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("nid"), col("col.score").cast("long").as("score"))
  }

  /**
   * IVF-SQ8 composed (FAISS `IVFxx,SQ8`): the coarse quantizer restricts
   * every query to its `nProbe` nearest centroid lists, and candidates in
   * those lists are scored in the COMPRESSED domain by the exact integer
   * dot of their SQ8 codes. This removes the one flat corpus scan the
   * graded ANN set had left ([[sq8TopK]] is O(n·q) by design — it is the
   * calibration baseline): per-vector corpus state is (cluster id + 64
   * bytes of codes) and per-query work is its probed lists only. The
   * scoring stays exact int64, so the gate needs no rounding anywhere.
   */
  def ivfSq8TopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroidStride: Int, maxCentroids: Int, nProbe: Int,
      k: Int): DataFrame = {
    import graft.functions.TopKAggregate.topKPairs
    val cent = strideCentroids(vectors, idCol, vecCol, centroidStride,
      maxCentroids)
    // inverted lists (vector → cluster) from the coarse quantizer
    val assign = assignToCentroids(vectors, idCol, vecCol, cent)
      .select(col("vid"), col("cid"))
    // query → nProbe nearest centroid lists
    val probes = probeCentroids(queries, idCol, vecCol, cent, nProbe)
      .select(col("qid").as("pqid"), col("cid"))

    val (corpus, q) = sq8Parts(vectors, queries, idCol, vecCol)

    // candidates = vectors in probed clusters, scored on SQ8 codes only;
    // the (small) quantized query set broadcasts into the candidate scan
    val cand = probes.join(assign, "cid")
      .select(col("pqid"), col("vid"))
    cand.join(corpus, col("vid") === col("nid"))
      .join(broadcast(q), col("pqid") === col("qid"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        VF.dot(col("qv"), col("nv")).as("score"))
      .groupBy(col("qid"))
      .agg(topKPairs(struct(col("score"), col("nid")), k).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("nid"), col("col.score").cast("long").as("score"))
  }

  /**
   * Two-stage retrieve-then-rerank (the production ANN serving shape —
   * e.g. FAISS/ScaNN candidate generation + exact re-scoring): stage 1
   * pulls `candK` candidates per query in the COMPRESSED domain through
   * [[ivfSq8TopK]] (probe-restricted integer dots — cheap, approximate
   * ordering); stage 2 re-scores ONLY those candidates with the exact
   * full-precision cosine and returns the top `k`. At scale this is the
   * standard cost split: the corpus-wide pass never touches raw
   * vectors, and the exact math runs on O(queries × candK) rows. The
   * raw-vector lookup for stage 2 is a hash join on the candidate ids —
   * at 100 TB that join is the random-access pattern a vector store
   * serves from its id-keyed layout.
   */
  def rerankTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroidStride: Int, maxCentroids: Int, nProbe: Int,
      candK: Int, k: Int): DataFrame =
    rerankExact(vectors, queries, idCol, vecCol,
      ivfSq8TopK(vectors, queries, idCol, vecCol, centroidStride,
        maxCentroids, nProbe, candK), k)

  /**
   * [[rerankTopK]]'s sibling over the MORE memory-aggressive stage-1
   * config: candidates come from [[ivfPqTopK]]'s compressed-domain ADC
   * ordering (m·log2(k) BITS per corpus vector vs SQ8's byte-per-dim),
   * then the same exact-cosine re-score on O(queries × candK) rows —
   * the FAISS `IVFxx,PQyy` + refine production pairing.
   */
  def rerankPqTopK(vectors: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int, codeStride: Int,
      centroidStride: Int, maxCentroids: Int, nProbe: Int, candK: Int,
      topK: Int): DataFrame =
    rerankExact(vectors, queries, idCol, vecCol,
      ivfPqTopK(vectors, queries, idCol, vecCol, dim, m, k, codeStride,
        centroidStride, maxCentroids, nProbe, candK), topK)

  /** Stage 2 shared by the rerank family: exact full-precision cosine
   * over a `(qid, nid, …)` candidate set only; the raw-vector lookup is
   * an id-keyed hash join (the vector store's random-access shape). */
  private def rerankExact(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, candidates: DataFrame,
      k: Int): DataFrame = {
    val cand = candidates.select(col("qid").as("cqid"), col("nid").as("cnid"))
    val v = vectors.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      VF.l2Norm(col(vecCol)).as("nn"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      VF.l2Norm(col(vecCol)).as("qn"))
    val scored = cand
      .join(v, col("cnid") === col("nid"))
      .join(broadcast(q), col("cqid") === col("qid"))
      .select(col("qid"), col("nid"), scoreCos.as("cos"))
    ranked(scored, k)
  }

  /** Shared SQ8 machinery: per-dimension affine 0..255 quantization of
   * corpus and queries against the corpus min/max (one-row broadcast).
   * Returns (`(nid, nv)`, `(qid, qv)`) with integer-valued double codes. */
  private def sq8Parts(vectors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String): (DataFrame, DataFrame) = {
    val statsRow = vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("pos"), col("x").cast("double").as("x"))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("mn")))).as("pm"),
        array_sort(collect_list(struct(col("pos"), col("mx")))).as("px"))
      .select(transform(col("pm"), e => e.getField("mn")).as("mins"),
        zip_with(
          transform(col("px"), e => e.getField("mx")),
          transform(col("pm"), e => e.getField("mn")),
          (mx, mn) => when(mx > mn, lit(255.0) / (mx - mn))
            .otherwise(lit(0.0))).as("scales"))

    // codes staged in two projections so no interpreted HOF re-evaluates
    // its argument expression per element
    def quant(df: DataFrame, idOut: String, vecOut: String): DataFrame = df
      .crossJoin(broadcast(statsRow))
      .select(col(idCol).as(idOut),
        zip_with(col(vecCol).cast("array<double>"), col("mins"),
          (x, m) => x - m).as("__d"),
        col("scales"))
      .select(col(idOut),
        // clamp to the grid: query vectors are NEW data, not necessarily
        // inside the corpus min/max — without the clamp an out-of-range
        // value yields a code outside 0..255, breaking the int8
        // representation contract and (far enough out) the exact-int64
        // bound
        zip_with(col("__d"), col("scales"),
          (d, s) => least(lit(255.0), greatest(lit(0.0), round(d * s, 0))))
          .as(vecOut))

    (quant(vectors, "nid", "nv"), quant(queries, "qid", "qv"))
  }
}
