package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The curated-corpus AUDIT gates — the after-the-fact obligations a
 * maintained training corpus owes its users, each answered from the
 * COMMITTED artifacts the [[CurationStreamQueries]] intake loop already
 * maintains (nothing here recomputes a curation):
 *
 *   - q121 provenance: for EVERY source document, why it is or is not
 *     in the curated corpus (the demoted-vs-suppressed split is an
 *     arrival-order fact only the retained history answers);
 *   - q122 retro-decontamination: rescreen the already-curated corpus
 *     when a NEW benchmark suite ships, without recurating anything.
 *
 * Split out of [[CurationStreamQueries]] (round 15, zero behavior
 * change — the r13/r14 file-size rule).
 */
object CurationAuditQueries {

  /** q122: RETRO-DECONTAMINATION — the lifecycle hole q117/q118 leave
   * open: those screen at INTAKE against the benchmark suites known at
   * the time, but eval suites keep shipping, and when a new one lands
   * the ALREADY-CURATED corpus must be rescreened — without recurating
   * anything. The new suite's frozen shingle set is built once and
   * broadcast (q117's economics); victims are the suite's own member
   * docs (they are eval data now, not training data) plus any intake
   * doc sharing one of its 3-grams; the store's targeted-delete path
   * (q93's machinery) tombstones exactly those keys — cost bounded by
   * the hit set, touched buckets only, evidence written aside first.
   * Deletion is a TOMBSTONE, not a recuration: a demoted cluster
   * representative's runner-up is NOT promoted (a pipeline that wants
   * re-promotion re-runs the cycle; the oracle restates exactly the
   * tombstone semantics — q118's kept set minus the suite-2 hits).
   * Run against a CLONE of the shared q118 store (the q107/q111
   * idiom) so the mutation can't leak into q118 whatever the order. */
  private val retroCache =
    scala.collection.mutable.Map.empty[String, String]
  private def retroArtifacts(ss: SparkSession, dir: String): String =
    retroCache.synchronized {
      retroCache.getOrElseUpdate(dir, {
        // resolve the q118 dependency OUTSIDE the timer (the
        // clusterLedgerArtifacts pattern): when the decon cache is cold
        // (SPARK_GRAFT_ONLY=q122 subsets, registry reorderings) its
        // build must attribute to curation_decon_store, not land under
        // BOTH timers and inflate the setup total
        val deconRoot = CurationStreamQueries.deconArtifacts(ss, dir)
        val base = CurationStreamQueries.scoredBase(ss, dir)
        graft.SetupTimer.time("retro_decon_store") {
          buildRetroDecon(ss, base, deconRoot)
        }
      })
    }

  private def buildRetroDecon(ss: SparkSession, base: DataFrame,
      deconRoot: String): String = {
    val cloned = graft.streaming.BucketedUpsert.recover(ss,
        keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
        nBuckets = 16, stateRoot = deconRoot)
      .cloneTo(graft.sources.Scratch.dir("retro_decon_clone"))
    // both screens ride the shared base's shingle column — no
    // re-tokenization (r17 verdict #1)
    def shingles(df: DataFrame): DataFrame = df
      .select(col("id"), explode_outer(col("shin")).as("s"))
      .filter(col("s").isNotNull).distinct()
    // suite 2: a NEW (small) benchmark carved out of what was
    // training data — %200 so the strict any-shared-3-gram screen
    // leaves a non-degenerate corpus at every gate SF
    val bench2 = shingles(base.filter(col("id") % 200 === 25))
      .select(col("s")).distinct().localCheckpoint()
    val hits = shingles(base.filter(col("id") % 50 =!= 0))
      .join(broadcast(bench2), Seq("s"), "left_semi")
      .select(col("id")).distinct()
    val members = base.filter(col("id") % 200 === 25)
      .select(col("id"))
    // deleting an id the intake never admitted is a natural no-op, so
    // the victim set needs no membership bookkeeping
    val victims = hits.unionByName(members).distinct().localCheckpoint()
    // evidence first — the audit trail of WHAT the new suite removed
    victims.write.mode("overwrite")
      .parquet(graft.sources.Scratch.dir("retro_decon_evidence"))
    cloned.delete(victims, 1L)
    cloned.rootDir
  }

  private def runRetroDecon(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 16,
      stateRoot = retroArtifacts(ss, dir)).view(s).orderBy(col("id"))
  }

  private def retroDeconOracle: String =
    s"""WITH RECURSIVE ${CurationStreamQueries.curationDeconCtes},
       |b2base AS (SELECT doc_id, ${DedupQueries.normT} AS t
       |  FROM documents WHERE doc_id % 200 = 25),
       |b2toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w
       |  FROM b2base),
       |b2sh AS (SELECT DISTINCT
       |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |       FROM b2toks, unnest(generate_series(1, len(w) - 2)) AS u(i)
       |       WHERE len(w) >= 3),
       |dirty2 AS (SELECT DISTINCT t2.doc_id FROM tsh t2
       |           JOIN b2sh b2 ON t2.s = b2.s)
       |SELECT id, n_bpe, quality FROM kept
       |WHERE id % 200 <> 25 AND id NOT IN (SELECT doc_id FROM dirty2)
       |ORDER BY id""".stripMargin

  /** q121: CURATION PROVENANCE — the audit every training-data
   * pipeline owes its users: for EVERY source document, why it is or
   * is not in the curated corpus. Five dispositions, all read off the
   * COMMITTED artifacts the intake loop already maintains (no
   * recomputation of the curation itself):
   *
   *   - `low_quality`  — failed the quality gate; never entered.
   *   - `kept_rep`     — in the final corpus as its near-dup
   *                      cluster's representative (min id).
   *   - `kept_unpaired`— in the final corpus, no near-duplicate.
   *   - `demoted`      — ADMITTED when it arrived (it was its
   *                      cluster-so-far's min id — the time-travel
   *                      store proves it at its arrival batch's
   *                      boundary version) and later displaced by a
   *                      smaller-id arrival.
   *   - `suppressed`   — a near-duplicate of an already-better doc at
   *                      arrival; never admitted.
   *
   * The split between `demoted` and `suppressed` is an ARRIVAL-ORDER
   * fact no end-state scan can recover — it exists only because the
   * curated store retains history (q119) and the cluster ledger keeps
   * final labels (q110/q116); this gate proves those artifacts
   * compose into a faithful audit. The oracle restates arrival-capped
   * admission from scratch: a doc was admitted at arrival iff no doc
   * reachable from it through pairs among SAME-OR-EARLIER arrivals
   * has a smaller id (one per-root capped reachability closure),
   * while final kept/labels ride the shared q115 chain. */
  private def runCurationProvenance(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, clRoot, bounds) = CurationStreamQueries.curationArtifacts(ss, dir)
    val store = graft.streaming.BucketedUpsert.recover(ss,
      keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
      nBuckets = 16, stateRoot = root, retainHistory = true)
    val labels = graft.streaming.ClusterLedger.recover(ss,
      nBuckets = 4, root = clRoot).store.view(s)
      .select(col("id"), col("cluster"))
    provenanceStatuses(s, store, bounds, labels,
      CurationStreamQueries.scoredBase(s, dir).select(col("id"), col("quality")),
      id => pmod(id, lit(4)))
  }

  /** The q121 disposition computation, shared with CurationCycleSpec's
   * hand-corpus pin: every staged doc joined against the committed
   * artifacts — the final curated view (`kept_*`), its per-arrival-
   * batch boundary snapshots (`demoted` = admitted at the doc's own
   * arrival boundary but gone from the final view), and the cluster
   * ledger's final labeling. `batchOf` maps a doc id to its arrival
   * batch index (the gate's pmod-4 slicing; the spec's hand mapping).
   * Pure metadata-scale joins — nothing recomputes the curation. */
  private[queries] def provenanceStatuses(reader: SparkSession,
      store: graft.streaming.BucketedUpsert.State, bounds: Seq[Long],
      labels: DataFrame, staged: DataFrame,
      batchOf: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): DataFrame = {
    require(bounds.nonEmpty && bounds.forall(_ >= 0L),
      s"provenance: a batch committed nothing — boundaries $bounds")
    // admitted-at-arrival: the doc's id is in the curated snapshot at
    // ITS OWN batch's boundary version (one pruned snapshot read per
    // batch, each filtered to that batch's slice)
    val admitted = bounds.indices.map { b =>
        store.readAsOf(reader, bounds(b)).select(col("id"))
          .filter(batchOf(col("id")) === b)
      }.reduce(_ unionByName _).withColumn("__adm", lit(1))
    val kept = store.view(reader).select(col("id"), lit(1).as("__kept"))
    staged.select(col("id"), col("quality"))
      .join(labels, Seq("id"), "left_outer")
      .join(kept, Seq("id"), "left_outer")
      .join(admitted, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("quality") < 0.6, lit("low_quality"))
          .when(col("__kept") === 1 && col("cluster").isNotNull,
            lit("kept_rep"))
          .when(col("__kept") === 1, lit("kept_unpaired"))
          .when(col("__adm") === 1, lit("demoted"))
          .otherwise(lit("suppressed")).as("status"),
        col("cluster"))
      .orderBy(col("id"))
  }

  private def curationProvenanceOracle: String =
    s"""WITH RECURSIVE ${CurationStreamQueries.curationKeptCtes},
       |reachc(root, node) AS (
       |  SELECT doc_id, doc_id FROM q
       |  UNION
       |  SELECT rc.root, s2.b FROM reachc rc JOIN sym s2 ON s2.a = rc.node
       |  WHERE s2.b % 4 <= rc.root % 4),
       |adm AS (SELECT root FROM (
       |    SELECT root, MIN(node) AS mn FROM reachc GROUP BY root)
       |  WHERE mn = root)
       |SELECT st.id, st.status, st.cluster FROM (
       |  SELECT d.doc_id AS id,
       |    CASE WHEN q.doc_id IS NULL THEN 'low_quality'
       |         WHEN k.id IS NOT NULL AND l.cluster IS NOT NULL
       |           THEN 'kept_rep'
       |         WHEN k.id IS NOT NULL THEN 'kept_unpaired'
       |         WHEN a.root IS NOT NULL THEN 'demoted'
       |         ELSE 'suppressed' END AS status,
       |    l.cluster
       |  FROM documents d
       |  LEFT JOIN q ON q.doc_id = d.doc_id
       |  LEFT JOIN kept k ON k.id = d.doc_id
       |  LEFT JOIN lab l ON l.id = d.doc_id
       |  LEFT JOIN adm a ON a.root = d.doc_id) st
       |ORDER BY st.id""".stripMargin


  val all: Seq[Q] = Seq(
    Q("q122_retro_decontaminate", runRetroDecon,
      Some(retroDeconOracle),
      setup = Some((ss, dir) => { retroArtifacts(ss, dir); () })),
    Q("q121_curation_provenance", runCurationProvenance,
      Some(curationProvenanceOracle),
      setup = Some((ss, dir) => {
        CurationStreamQueries.curationArtifacts(ss, dir); () })))
}
