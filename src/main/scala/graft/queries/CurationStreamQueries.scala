package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.StreamingQueries.streamSliced
import graft.queries.LedgerStreamQueries.frozenQuantizer

/**
 * The streamed CURATION COMPOSITIONS — the FineWeb-class intake spine
 * assembled from the operators the other families gate separately:
 * quality gate → near-dup ledger (SimHash or embedding) → incremental
 * clustering → retro-correcting curated store, plus benchmark
 * decontamination, curated packing, and corpus time travel. Volume
 * evidence: tools/CurationSoak. Split out of [[StreamingQueries]]
 * (round 14); the audit-side gates (q121 provenance, q122
 * retro-decontamination) live in [[CurationAuditQueries]] (round 15
 * split, zero behavior change).
 */
object CurationStreamQueries {

  /** q115: STREAMED END-TO-END CURATION — the composition flagship of
   * the LLM-pipeline operators: quality gate → near-dup ledger →
   * incremental clustering → RETRO-CORRECTING curated store, one
   * arrival loop. Per micro-batch: (1) the t02 quality score filters
   * the batch (only curation-grade docs enter dedup — a pipeline never
   * pays near-dup machinery for rows it already rejected); (2) the
   * survivors' SimHash signatures fold into a q108
   * [[graft.streaming.NearDupLedger]] and the batch's new pairs come
   * back from the bucket-pruned probe; (3) the pairs feed a q110
   * [[graft.streaming.ClusterLedger]], whose changed-row delta is the
   * retro-correction evidence: a cluster representative is the
   * component's MIN id, so a kept doc is demoted exactly when its
   * delta row's new cluster is a smaller id — the curated store
   * DELETES it in the same cycle that ADMITS the batch's new
   * representatives. Min-monoid labels only decrease, so demotion is
   * permanent (no flip-flop) and the curated corpus is MAINTAINED,
   * not append-only: whatever the arrival order, the end state is
   * exactly "every quality doc that is its near-dup cluster's min id,
   * plus unpaired quality docs", which the oracle restates from
   * scratch (quality filter → pair scan → reachability closure → min
   * label). Every stage is bounded by batch + delta, never by
   * accumulated state — the 100 TB shape of a training-data intake
   * that keeps a canonical curated corpus current as crawls arrive. */
  // Build-once cache for the curated-corpus pipeline (the
  // neardupArtifacts pattern): q115's subject is the arrival loop —
  // paid once per JVM — and p05 packs the END STATE it leaves, so
  // both gates share one committed curated store, each independently
  // meaningful (q115 restates the corpus, p05 the packing over it).
  // ONE streamed build serves four gates: q115/p05 read the final
  // curated view, q119 time-travels to the batch-2 boundary, q121
  // audits admission against ALL the boundary versions — so the store
  // retains history and the build captures each micro-batch's boundary
  // version as it commits. (curated root, cluster-ledger root,
  // per-batch boundary versions.)
  private val curationCache =
    scala.collection.mutable.Map.empty[String, (String, String, Vector[Long])]
  private[queries] def curationArtifacts(ss: SparkSession,
      dir: String): (String, String, Vector[Long]) =
    curationCache.synchronized {
      curationCache.getOrElseUpdate(dir, {
        // resolve the shared base OUTSIDE the store timer (the
        // retro_decon_store pattern) so its one-time cost attributes
        // to curation_scored_base, never to whichever store built first
        val base = scoredBase(ss, dir)
        graft.SetupTimer.time("curation_store") {
          buildCuration(ss, dir, base)
        }
      })
    }

  /** ONE staged projection — normalize/tokenize once, derive the
   * signature, every quality signal, AND the decontamination shingles
   * from the shared arrays (the scan-stage shape; at real scale this
   * is the crawl's map pass). Consumed through [[scoredBase]]. */
  private[queries] def curationStaged(ss: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    graft.sources.Tables.load(ss, dir, "documents")
      .select(col("doc_id").as("id"),
        TF.normalizeText(col("text")).as("__t"))
      .select(col("id"), col("__t"),
        TF.tokensFromNorm(col("__t")).as("__tok"))
      .select(col("id"),
        // the token array itself rides the base too: q124/q125's NB
        // train+score consume it (token-count aggregation + weight
        // join), which previously re-normalized and re-tokenized the
        // whole corpus once per consumer (r18 verdict #3)
        col("__tok"),
        graft.operators.Dedup.simHashFromHashes(
          transform(col("__tok"), t => TF.hash60(t)), 60).as("sig"),
        TF.bpeTokenCountFromNorm(col("__t")).as("n_bpe"),
        TF.qualityScoreFromCounts(
          size(col("__tok")).cast("long"),
          TF.stopwordCountFromTokens(col("__tok")),
          length(col("__t")),
          TF.punctCountFromNorm(col("__t"))).as("quality"),
        array_distinct(TF.wordShinglesFromTokens(col("__tok"), 3))
          .as("shin"))
  }

  /** The SHARED curated/scored base (r17 verdict #1): [[curationStaged]]
   * computed and checkpointed ONCE per corpus, serving every curation
   * store build — q115/p05/q119/q121's SimHash curation, q118/q122's
   * decontaminated intake (signals + both shingle screens), q120's
   * semantic curation (quality columns; the signature comes from its
   * embedding join), q125's NB-gated intake signatures — plus the q121
   * audit's quality column and q122's retro screen. Before this, the
   * four store builds each re-read and re-tokenized the corpus; at
   * 100 TB the distinction is four crawl-scale scans vs ONE map pass
   * with four downstream consumers, and on the bench it is the
   * setup-share cut the r17 driver run asked for. Its build time is
   * its own setup line (`curation_scored_base`); store timers resolve
   * it before they start. */
  private val baseCache =
    scala.collection.mutable.Map.empty[String, DataFrame]
  private[queries] def scoredBase(ss: SparkSession, dir: String): DataFrame =
    baseCache.synchronized {
      baseCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("curation_scored_base") {
          curationStaged(ss, dir).localCheckpoint()
        })
    }

  private def buildCuration(ss: SparkSession,
      dir: String, base: DataFrame): (String, String, Vector[Long]) = {
    val staged = base
      .select(col("id"), col("sig"), col("n_bpe"), col("quality"))
    val near = new graft.streaming.NearDupLedger(ss, bits = 60,
      maxHamming = 3, nBuckets = 16)
    val clusters = new graft.streaming.ClusterLedger(ss, nBuckets = 4)
    val curated = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
      nBuckets = 16, retainHistory = true)
    // end-of-batch boundary version per micro-batch (the LAST commit
    // ≤ that batch — a batch that commits nothing repeats the prior
    // boundary, which reads as "no batch-b doc admitted": exact)
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
    streamSliced(ss, staged, "id", "curation") { (b, id) =>
      curationCycle(ss, near, clusters, curated,
        b.filter(col("quality") >= 0.6).localCheckpoint(), id,
        ccWidth = Some("1"))
      bounds += curated.history().lastOption.getOrElse(-1L)
    }
    (curated.rootDir, clusters.store.rootDir, bounds.toVector)
  }

  private def curatedState(ss: SparkSession,
      dir: String): graft.streaming.BucketedUpsert.State =
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 16,
      stateRoot = curationArtifacts(ss, dir)._1, retainHistory = true)

  /** q118: the FULL INTAKE — q115's curation loop with q117's
   * benchmark-decontamination screen composed into the intake: the
   * frozen 3-gram shingle screen is broadcast to the staged map pass
   * (each doc stamped with its leak bit as the crawl stages it — the
   * 100 TB shape), and per arrival batch the admission filter,
   * quality gate ∧ clean bit, decides which docs enter near-dup
   * curation at all. This is the
   * FineWeb-style intake spine — filter for quality, drop eval
   * leakage, keep one canonical representative per near-dup cluster,
   * retro-correcting as smaller-id duplicates arrive — as ONE
   * composition over the operators this engine gates separately
   * (t02/t16 quality, t06/q117 decontamination, q108/q110/q115
   * dedup curation). The benchmark docs themselves never enter the
   * intake (they are the eval suite, not training data). The oracle
   * restates the end state from scratch: train split → quality ∧
   * clean filter → pair scan → reachability closure → min-id reps. */
  // per-JVM build caches (the curationCache pattern): the gates'
  // subject is the arrival composition — paid once — and the reps
  // re-serve the committed artifact
  private val deconCache =
    scala.collection.mutable.Map.empty[String, String]

  private[queries] def deconArtifacts(ss: SparkSession, dir: String): String =
    deconCache.synchronized {
      deconCache.getOrElseUpdate(dir, {
        val base = scoredBase(ss, dir)
        graft.SetupTimer.time("curation_decon_store") {
          buildCurationDecon(ss, base)
        }
      })
    }

  private def runCurationDecon(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 16,
      stateRoot = deconArtifacts(ss, dir)).view(s).orderBy(col("id"))
  }

  private def buildCurationDecon(ss: SparkSession,
      base: DataFrame): String = {
    // the frozen benchmark screen, built once before the stream from
    // the shared base's shingle column
    val bench = base.filter(col("id") % 50 === 0)
      .select(explode_outer(col("shin")).as("s"))
      .filter(col("s").isNotNull).distinct()
      .localCheckpoint()
    // the screen PROBE runs once in the staged map pass — exactly
    // where a 100 TB intake broadcasts the frozen screen: to the
    // crawl's mappers, each doc stamped with its leak bit as it is
    // staged. (The r17 shape re-exploded every batch's shingle arrays
    // against the screen inside the loop, which also meant shipping
    // the arrays themselves through the stream transport; the bit
    // costs one boolean per row.) The admission DECISION — quality ∧
    // clean — still happens per arrival batch in the cycle below.
    val dirty = base.filter(col("id") % 50 =!= 0)
      .select(col("id"), explode_outer(col("shin")).as("s"))
      .join(broadcast(bench), Seq("s"), "left_semi")
      .select(col("id")).distinct()
    val staged = base.filter(col("id") % 50 =!= 0)
      .join(dirty.withColumn("__leak", lit(true)), Seq("id"), "left")
      .select(col("id"), col("sig"), col("n_bpe"), col("quality"),
        coalesce(col("__leak"), lit(false)).as("leak"))
    val near = new graft.streaming.NearDupLedger(ss, bits = 60,
      maxHamming = 3, nBuckets = 16)
    val clusters = new graft.streaming.ClusterLedger(ss, nBuckets = 4)
    val curated = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
      nBuckets = 16)
    streamSliced(ss, staged, "id", "curation_decon") { (b, id) =>
      val qb = b.filter(col("quality") >= 0.6 && !col("leak"))
        .select(col("id"), col("sig"), col("n_bpe"), col("quality"))
        .localCheckpoint()
      curationCycle(ss, near, clusters, curated, qb, id,
        ccWidth = Some("1"))
    }
    curated.rootDir
  }

  private def curationDeconOracle: String =
    s"""WITH RECURSIVE $curationDeconCtes
       |SELECT id, n_bpe, quality FROM kept ORDER BY id""".stripMargin

  /** The q118 end-state CTE chain through `kept` (intake screened
   * against the suite-1 benchmark) — shared by q118's restatement and
   * q122's retro-screened form. Prefix with WITH RECURSIVE. */
  private[queries] def curationDeconCtes: String = {
    val enList =
      s"[${graft.functions.TextFunctions.stopwords("en")
        .map(w => s"'$w'").mkString(", ")}]"
    s"""qbase AS (
       |  SELECT doc_id, ${DedupQueries.normT} AS t FROM documents
       |  WHERE doc_id % 50 <> 0),
       |ttoks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM qbase),
       |tsh AS (SELECT DISTINCT doc_id,
       |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |       FROM ttoks, unnest(generate_series(1, len(w) - 2)) AS u(i)
       |       WHERE len(w) >= 3),
       |bbase AS (SELECT doc_id, ${DedupQueries.normT} AS t FROM documents
       |  WHERE doc_id % 50 = 0),
       |btoks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM bbase),
       |bsh AS (SELECT DISTINCT
       |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |       FROM btoks, unnest(generate_series(1, len(w) - 2)) AS u(i)
       |       WHERE len(w) >= 3),
       |dirty AS (SELECT DISTINCT t2.doc_id FROM tsh t2
       |          JOIN bsh b2 ON t2.s = b2.s),
       |qfeat AS (SELECT doc_id,
       |    CASE WHEN t = '' THEN CAST(0 AS BIGINT)
       |      ELSE CAST(len(string_split_regex(t, ' ')) AS BIGINT)
       |      END AS n_tokens,
       |    CAST(len(regexp_extract_all(t, '[a-z0-9]{1,4}|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
       |    CAST(len(t) AS BIGINT) AS n_ch,
       |    CAST(len(regexp_extract_all(t, '[^a-z0-9 ]')) AS BIGINT) AS n_p,
       |    CAST(len(list_filter(string_split_regex(t, ' '), x -> list_contains($enList, x))) AS BIGINT) AS n_sw
       |  FROM qbase),
       |q AS (SELECT doc_id, n_bpe, quality FROM (
       |    SELECT doc_id, n_bpe,
       |      ${graft.functions.TextFunctions.qualitySql(
           "n_tokens", "n_sw", "n_ch", "n_p")} AS quality
       |    FROM qfeat) WHERE quality >= 0.6
       |    AND doc_id NOT IN (SELECT doc_id FROM dirty)),
       |qd AS (SELECT d2.doc_id, d2.text FROM documents d2
       |       JOIN q ON q.doc_id = d2.doc_id),
       |${DedupQueries.simhash60PairsCtesOver("qd")},
       |p AS (${DedupQueries.simhash60PairsSelect}),
       |sym AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
       |reach(id, r) AS (
       |  SELECT id, id FROM (SELECT DISTINCT a AS id FROM sym)
       |  UNION
       |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id),
       |lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
       |kept AS (SELECT q.doc_id AS id, q.n_bpe, q.quality
       |  FROM q LEFT JOIN lab ON lab.id = q.doc_id
       |  WHERE lab.id IS NULL OR lab.cluster = q.doc_id)""".stripMargin
  }

  private def runStreamCuration(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    curatedState(ss, dir).view(s).orderBy(col("id"))
  }

  /** p05: PACK THE CURATED CORPUS — the serving composition q115's
   * end state exists for: the maintained curated corpus (quality ∧
   * near-dup representatives) concat-and-chunked into fixed-budget
   * training sequences ([[graft.operators.Packing.pack]] — exact
   * distributed prefix sum, never single-partition). Rides the same
   * per-JVM curated store q115 builds; the oracle restates the q115
   * kept set and the q104 cumulative arithmetic over it. */
  private def runCuratedPack(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val kept = curatedState(ss, dir).view(ss)
      .select(col("id"), col("n_bpe"))
    graft.operators.Packing.pack(kept, "n_bpe", budget = 256L,
        orderCols = Seq(col("id")), nShards = 16)
      .select(col("id"), col("n_bpe"), col("cum"),
        col("start_seq"), col("start_off"), col("end_seq"))
      .orderBy(col("id"))
  }

  /** One arrival cycle of the q115 curated-corpus maintenance —
   * extracted so the replay contract is spec-pinned
   * (CurationCycleSpec): `qb` carries the batch's QUALITY rows
   * (`id`, `sig`, `n_bpe`, `quality`). SIGNATURE-AGNOSTIC by
   * construction: `near` is any [[graft.streaming.PostingLedger]]
   * family member — q115/q118 run it over SimHash, q120 over dense
   * embeddings (SemDeDup at intake) — because the cycle only consumes
   * the ledger's (a, b) pair delta. Replay-safe end to end: the
   * near ledger's fold is token-guarded, the cluster fold is a min
   * monoid, and admission reads the committed LABELS, not the batch
   * delta — a retried micro-batch's delta is EMPTY (the monoid
   * absorbs the re-fold), which would re-admit every quality doc as
   * "unpaired", non-representatives included; the committed labels
   * answer correctly whether the cycle is fresh, replayed, or
   * resumed after a mid-cycle crash. */
  private[graft] def curationCycle(ss: SparkSession,
      near: graft.streaming.PostingLedger,
      clusters: graft.streaming.ClusterLedger,
      curated: graft.streaming.BucketedUpsert.State,
      qb: DataFrame, id: Long,
      ccWidth: Option[String] = None): Unit = {
    // stage walls land in the bench detail artifact (last-batch
    // representative, the StageTimer contract) so the gate's price is
    // attributable: ledger probe vs CC fold vs the two store commits
    val pairs = graft.StageTimer.time("q115_stream_curation",
      "near_observe") {
      near.observe(qb.select(col("id"), col("sig")), id)
    }
    // ccWidth: at GATE scale the CC fold's frames are pair-delta-sized
    // (KBs) and the ~15 tiny iteration jobs per batch pay 8× empty-task
    // scheduling at session width, so the gate narrows this one stage
    // to width 1 with AQE off (the q110 sizing note). It is a CALLER
    // choice, not part of the composition: a real pipeline's deltas can
    // be arbitrarily large and keep the session width (CurationSoak
    // runs this cycle at full width over 20k-row deltas).
    val delta = graft.StageTimer.time("q115_stream_curation",
      "cc_observe") {
      ccWidth match {
        case None => clusters.observe(pairs, id)
        case Some(w) =>
          val prevP = ss.conf.get("spark.sql.shuffle.partitions")
          val prevA = ss.conf.get("spark.sql.adaptive.enabled")
          ss.conf.set("spark.sql.shuffle.partitions", w)
          ss.conf.set("spark.sql.adaptive.enabled", "false")
          try clusters.observe(pairs, id)
          finally {
            ss.conf.set("spark.sql.shuffle.partitions", prevP)
            ss.conf.set("spark.sql.adaptive.enabled", prevA)
          }
      }
    }
    // admissions: batch quality docs that are their own cluster's
    // representative (no labeling row = unpaired so far; row with
    // cluster == id = representative), via a bucket-pruned point
    // lookup of the batch's ids — O(batch + state·k/n)
    val admitted = (if (clusters.store.hasState)
      qb.join(clusters.store.lookupJoin(ss, qb.select(col("id")))
          .withColumnRenamed("cluster", "__c"), Seq("id"), "left")
        .filter(col("__c").isNull || col("__c") === col("id"))
      else qb) // a pairless stream so far: every quality doc is a rep
      .select(col("id"), col("n_bpe"), col("quality"))
    // retro-correction: a label that DROPPED below its id is a lost
    // representative status — delete it. Deleting an id that was
    // never admitted (non-quality members never enter the ledger;
    // non-representatives were never merged) is a natural no-op, so
    // the demotion set needs no admission bookkeeping. The admit merge
    // and the demote delete fuse into ONE store commit
    // ([[graft.streaming.BucketedUpsert.State.applyBatch]] — the MERGE
    // INTO shape): a batch's own admitted docs are never its demoted
    // docs (admission reads the post-fold committed labels, so a doc
    // with cluster < id was never admitted), which makes the fused
    // merge-then-delete identical to the old two-commit cycle — at one
    // read and one rewrite of the touched buckets instead of two.
    val demoted = delta.filter(col("cluster") < col("id"))
      .select(col("id"))
    graft.StageTimer.time("q115_stream_curation", "admit_demote_apply") {
      curated.applyBatch(admitted, demoted, id)
    }
  }

  /** q119: CURATED-CORPUS TIME TRAVEL — "the training corpus exactly
   * as the curation pipeline had it when batch 2 committed", the
   * which-corpus-trained-this-checkpoint audit composed from the
   * operators this engine already gates (q115's cycle + q95's
   * retained-version readAsOf). The store is q115's own streamed
   * build (ONE setup serves q115/p05/q119/q121): streamSliced's
   * micro-batches arrive in pmod-4 slice order — the arrival rule
   * every cached streamed ingest already relies on — and the build
   * captures each batch's boundary version as it commits. `readAsOf`
   * at the version batch 2's cycle left live serves the corpus
   * mid-maintenance — including representatives that LATER batches
   * demote, which is exactly why the restatement is the from-scratch
   * curation over slices ≤ 2, NOT the final corpus restricted to
   * early arrivals. The cycle's invariant (kept = min-id reps ∪
   * unpaired, over arrived quality docs) holds after EVERY batch —
   * CurationCycleSpec/CurationSoak pin it — so the oracle is exact. */
  private def runCurationAsOf(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, _, bounds) = curationArtifacts(ss, dir)
    require(bounds(2) >= 0, "q119: nothing committed by batch 2")
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "id",
        payloadCols = Seq("n_bpe", "quality"), nBuckets = 16,
        stateRoot = root, retainHistory = true)
      .readAsOf(s, bounds(2)).orderBy(col("id"))
  }

  private def curationAsOfOracle: String =
    s"""WITH RECURSIVE ${curationKeptCtesOver("doc_id % 4 <= 2")}
       |SELECT id, n_bpe, quality FROM kept ORDER BY id""".stripMargin

  /** q120: SEMANTIC curation — q115's arrival cycle with the
   * [[graft.streaming.EmbeddingLedger]] as the near-dup stage: quality
   * gate → dense-vector cosine near-dup at arrival (SemDeDup's
   * Σ|cluster|² economics at intake — multi-probe frozen-quantizer
   * bands, exact 6dp cosine check) → incremental clustering →
   * retro-correcting curated store, one loop. This is the actual
   * FineWeb/SemDeDup-class shape: semantic duplicates (same content,
   * different surface form) collapse to their min-id representative
   * the moment the batch arrives, and a later smaller-id arrival
   * demotes the earlier representative in the same cycle that admits
   * it. The cycle is signature-agnostic by construction (it consumes
   * only the ledger's pair delta — [[curationCycle]]), so this gate's
   * proof is the COMPOSITION: end state ≡ from-scratch quality ∧
   * multi-probe pair closure ∧ min-id representative selection, the
   * oracle restating all three over the embedded corpus (docs with an
   * embedding row — at sf0.1 embeddings cover a prefix of the
   * documents table, so the intake is the embedded subset by
   * construction). Mid-cycle crash/replay safety is inherited from
   * the shared cycle and spec-pinned on the embedding family
   * (CurationCycleSpec). */
  private val semCache =
    scala.collection.mutable.Map.empty[String, String]
  private def semArtifacts(ss: SparkSession, dir: String): String =
    semCache.synchronized {
      semCache.getOrElseUpdate(dir, {
        val base = scoredBase(ss, dir)
        graft.SetupTimer.time("semcuration_store") {
          buildSemCuration(ss, dir, base)
        }
      })
    }

  private def buildSemCuration(ss: SparkSession, dir: String,
      base: DataFrame): String = {
    // quality signals from the shared scored base, the signature from
    // the embedding column — joined on the shared id domain before
    // the stream starts (the crawl's map pass)
    val staged = base
      .select(col("id"), col("n_bpe"), col("quality"))
      .join(graft.sources.Tables.load(ss, dir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("sig")),
        Seq("id"))
    val near = new graft.streaming.EmbeddingLedger(ss,
      frozenQuantizer(ss, dir), nProbe = 2, minCos = 0.4,
      nBuckets = 16)
    val clusters = new graft.streaming.ClusterLedger(ss, nBuckets = 4)
    val curated = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
      nBuckets = 16)
    streamSliced(ss, staged, "id", "semcuration") { (b, id) =>
      curationCycle(ss, near, clusters, curated,
        b.filter(col("quality") >= 0.6).localCheckpoint(), id,
        ccWidth = Some("1"))
    }
    curated.rootDir
  }

  private def runSemCuration(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 16,
      stateRoot = semArtifacts(ss, dir)).view(s).orderBy(col("id"))
  }

  private def semCurationOracle: String =
    s"""WITH RECURSIVE ${curationQualityCtes(
         "doc_id IN (SELECT vec_id FROM embeddings)")},
       |v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings
       |      JOIN q ON q.doc_id = vec_id),
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
       |sc AS (SELECT a, b,
       |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
       |  FROM (SELECT c.a, c.b,
       |      list_sum(list_transform(generate_series(1, len(x.embedding)), i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)) AS dot,
       |      sqrt(list_sum(list_transform(generate_series(1, len(x.embedding)), i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE))) AS na,
       |      sqrt(list_sum(list_transform(generate_series(1, len(y.embedding)), i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))) AS nb
       |    FROM cand c JOIN embeddings x ON x.vec_id = c.a
       |    JOIN embeddings y ON y.vec_id = c.b)),
       |pairs AS (SELECT a, b FROM sc WHERE cos >= 0.4),
       |$curationKeptTail
       |SELECT id, n_bpe, quality FROM kept ORDER BY id""".stripMargin

  /** The q115 end-state CTE chain through `kept` (id, n_bpe, quality)
   * — shared by q115's restatement, p05's packing over it, and q119's
   * arrival-restricted as-of form. Must be prefixed with WITH
   * RECURSIVE (the reachability closure). */
  private[queries] def curationKeptCtes: String = curationKeptCtesOver("TRUE")

  /** The t02 quality chain qbase→qfeat→q over `documents` restricted
   * by `docWhere`: ends at `q(doc_id, n_bpe, quality)`, quality ≥ 0.6
   * — shared by every curation restatement (q115/p05/q119's SimHash
   * chain and q120's embedding chain, which differ only in the pair
   * machinery that follows). */
  private def curationQualityCtes(docWhere: String): String = {
    val enList =
      s"[${graft.functions.TextFunctions.stopwords("en")
        .map(w => s"'$w'").mkString(", ")}]"
    s"""qbase AS (
       |  SELECT doc_id, ${DedupQueries.normT} AS t FROM documents
       |  WHERE $docWhere),
       |qfeat AS (SELECT doc_id,
       |    CASE WHEN t = '' THEN CAST(0 AS BIGINT)
       |      ELSE CAST(len(string_split_regex(t, ' ')) AS BIGINT)
       |      END AS n_tokens,
       |    CAST(len(regexp_extract_all(t, '[a-z0-9]{1,4}|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
       |    CAST(len(t) AS BIGINT) AS n_ch,
       |    CAST(len(regexp_extract_all(t, '[^a-z0-9 ]')) AS BIGINT) AS n_p,
       |    CAST(len(list_filter(string_split_regex(t, ' '), x -> list_contains($enList, x))) AS BIGINT) AS n_sw
       |  FROM qbase),
       |q AS (SELECT doc_id, n_bpe, quality FROM (
       |    SELECT doc_id, n_bpe,
       |      ${graft.functions.TextFunctions.qualitySql(
           "n_tokens", "n_sw", "n_ch", "n_p")} AS quality
       |    FROM qfeat) WHERE quality >= 0.6)""".stripMargin
  }

  /** The closure + representative-selection tail shared by every
   * curation restatement: `pairs(a, b)` → reachability → min label →
   * `kept(id, n_bpe, quality)`. Prefix must be WITH RECURSIVE. */
  private[queries] def curationKeptTail: String =
    """sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
      |reach(id, r) AS (
      |  SELECT id, id FROM (SELECT DISTINCT a AS id FROM sym)
      |  UNION
      |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id),
      |lab AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
      |kept AS (SELECT q.doc_id AS id, q.n_bpe, q.quality
      |  FROM q LEFT JOIN lab ON lab.id = q.doc_id
      |  WHERE lab.id IS NULL OR lab.cluster = q.doc_id)""".stripMargin

  private[queries] def curationKeptCtesOver(docWhere: String): String =
    s"""${curationQualityCtes(docWhere)},
       |qd AS (SELECT d2.doc_id, d2.text FROM documents d2
       |       JOIN q ON q.doc_id = d2.doc_id),
       |${DedupQueries.simhash60PairsCtesOver("qd")},
       |p AS (${DedupQueries.simhash60PairsSelect}),
       |pairs AS (SELECT a, b FROM p),
       |$curationKeptTail""".stripMargin

  private def streamCurationOracle: String =
    s"""WITH RECURSIVE $curationKeptCtes
       |SELECT id, n_bpe, quality FROM kept ORDER BY id""".stripMargin

  private def curatedPackOracle: String =
    s"""WITH RECURSIVE $curationKeptCtes,
       |c AS (SELECT id, n_bpe,
       |    SUM(n_bpe) OVER (ORDER BY id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM kept)
       |SELECT id, n_bpe, CAST(cum AS BIGINT) AS cum,
       |  CAST((cum - n_bpe) // 256 AS BIGINT) AS start_seq,
       |  CAST((cum - n_bpe) % 256 AS BIGINT) AS start_off,
       |  CAST(CASE WHEN n_bpe = 0 THEN (cum - n_bpe) // 256
       |    ELSE (cum - 1) // 256 END AS BIGINT) AS end_seq
       |FROM c ORDER BY id""".stripMargin

  /** q117: STREAMING BENCHMARK DECONTAMINATION — t06's n-gram overlap
   * scan at arrival time, probe direction flipped to the production
   * shape: the held-out benchmark suite is FROZEN and SMALL (eval
   * sets are MBs against a 100 TB crawl), so its deduplicated shingle
   * set is built ONCE and broadcast — each arriving training batch
   * probes it map-side, per-batch cost O(batch shingles) with ZERO
   * shuffle of accumulated state and nothing ever rescanning history
   * (contrast the near-dup ledgers, whose reference set GROWS and
   * therefore needs the persisted banded store; a decontamination
   * reference is static by definition — t06's design note on the
   * batch form, `/root/reference` has no counterpart). Each batch
   * emits its docs' (n_shingles, n_hit, overlap) report rows — the
   * flag an intake pipeline drops leaked training docs by — and the
   * accumulated union ≡ the batch restatement over the full training
   * split (the oracle: t06's CTE chain with the roles flipped). */
  // per-JVM ingest cache (the neardupArtifacts pattern): the streamed
  // screen runs once, its cost rides the setup metric, and reps read
  // the accumulated per-batch report artifact
  private val deconReportCache =
    scala.collection.mutable.Map.empty[String, String]
  private def deconReportArtifacts(ss: SparkSession,
      dir: String): String =
    deconReportCache.synchronized {
      deconReportCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("decon_report_ingest") {
          buildStreamDecontaminate(ss, dir)
        })
    }

  private def runStreamDecontaminate(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val outDir = deconReportArtifacts(ss, dir)
    val dirs = graft.sources.StoreIO.list(s, outDir).map(_.toString).sorted
    s.read.parquet(dirs: _*).orderBy(col("doc_id"))
  }

  private def buildStreamDecontaminate(ss: SparkSession,
      dir: String): String = {
    import graft.functions.{TextFunctions => TF}
    val docs = graft.sources.Tables.load(ss, dir, "documents")
    // one shared scan-stage projection: doc → distinct word 3-grams
    // (docs shorter than the shingle width have nothing to leak and
    // are absent, matching t06's contract; 3-grams — vs t06's 5 —
    // are the deliberately TIGHTER screen an intake gate runs, and
    // they exercise the hit path densely at gate SF)
    def shingles(df: DataFrame): DataFrame = df
      .select(col("doc_id").as("id"), TF.tokens(col("text")).as("__tok"))
      .select(col("id"),
        explode_outer(TF.wordShinglesFromTokens(col("__tok"), 3)).as("s"))
      .filter(col("s").isNotNull)
      .distinct()
    // the frozen benchmark shingle set: deduplicated once, pinned
    // before the stream starts (the frozen-quantizer rule's text
    // analog — a reference that drifted mid-stream would score
    // batches against different suites)
    val bench = shingles(docs.filter(col("doc_id") % 50 === 0))
      .select(col("s")).distinct().withColumn("__hit", lit(1))
      .localCheckpoint()
    val outDir = graft.sources.Scratch.dir("decon_out")
    streamSliced(ss, docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), col("text")), "doc_id", "decon") {
      (b, id) =>
        shingles(b).join(broadcast(bench), Seq("s"), "left_outer")
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_shingles"),
            count(col("__hit")).as("n_hit"))
          .select(col("id").as("doc_id"), col("n_shingles"),
            col("n_hit"),
            TF.ratio6(col("n_hit"), col("n_shingles")).as("overlap"))
          .write.mode("overwrite").parquet(s"$outDir/b$id")
    }
    outDir
  }

  private def streamDecontaminateOracle: String =
    s"""WITH d AS (SELECT doc_id, ${DedupQueries.normT} AS t FROM documents),
       |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d),
       |sh AS (SELECT DISTINCT doc_id,
       |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |       FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(i)
       |       WHERE len(w) >= 3),
       |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
       |train AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
       |SELECT t.doc_id, COUNT(*) AS n_shingles,
       |  COUNT(b.s) AS n_hit,
       |  ${graft.functions.TextFunctions.ratio6Sql(
           "COUNT(b.s)", "COUNT(*)")} AS overlap
       |FROM train t LEFT JOIN bench b ON t.s = b.s
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin


  val all: Seq[Q] = Seq(
    Q("q115_stream_curation", runStreamCuration,
      Some(streamCurationOracle),
      setup = Some((ss, dir) => { curationArtifacts(ss, dir); () })),
    Q("p05_curated_pack", runCuratedPack, Some(curatedPackOracle),
      setup = Some((ss, dir) => { curationArtifacts(ss, dir); () })),
    Q("q117_stream_decontaminate", runStreamDecontaminate,
      Some(streamDecontaminateOracle),
      setup = Some((ss, dir) => { deconReportArtifacts(ss, dir); () })),
    Q("q118_curation_decon", runCurationDecon,
      Some(curationDeconOracle),
      setup = Some((ss, dir) => { deconArtifacts(ss, dir); () })),
    Q("q119_curation_asof", runCurationAsOf,
      Some(curationAsOfOracle),
      setup = Some((ss, dir) => { curationArtifacts(ss, dir); () })),
    Q("q120_semantic_curation", runSemCuration,
      Some(semCurationOracle),
      setup = Some((ss, dir) => { semArtifacts(ss, dir); () })))
}
