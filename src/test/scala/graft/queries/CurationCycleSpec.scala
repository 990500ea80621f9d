package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.streaming.{BucketedUpsert, ClusterLedger, EmbeddingLedger,
  NearDupLedger}

/** The q115 arrival-cycle contract: the curated store converges to
 * "cluster representatives + unpaired quality docs" with
 * retro-correction (an earlier-admitted doc is deleted when a
 * smaller-id near-dup arrives), and a REPLAYED micro-batch is a
 * no-op end to end — in particular, admission must read the
 * committed labels, not the batch delta: a retried batch's delta is
 * empty (min monoid), and a delta-based admission would re-admit
 * every quality doc as "unpaired", non-representatives included. */
class CurationCycleSpec extends SparkSpec {

  import spark.implicits._

  // sig 0L: one near-dup cluster {5, 10, 20}; 30 is unpaired
  private val far = 0x0FFFFFFFFFFFFFFFL
  private def qb(rows: (Long, Long)*): DataFrame =
    rows.toSeq.toDF("id", "sig")
      .selectExpr("id", "sig", "id * 10 AS n_bpe",
        "0.9 AS quality")

  private def curatedIds(c: BucketedUpsert.State): Set[Long] =
    c.view(spark).select("id").collect().map(_.getLong(0)).toSet

  test("retro-correction: a later smaller-id arrival demotes the " +
      "earlier representative; a replayed batch changes nothing") {
    val near = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    val clusters = new ClusterLedger(spark, nBuckets = 4)
    val curated = new BucketedUpsert.State(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8)

    // batch 0: 10 (rep of its 1-doc cluster so far) and unpaired 30
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(10L -> 0L, 30L -> far), 0L)
    assert(curatedIds(curated) == Set(10L, 30L),
      "batch 0 should admit the provisional rep and the unpaired doc")

    // batch 1: 5 and 20 join the cluster — 5 becomes rep, 10 is
    // DEMOTED (deleted), 20 never admitted
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(5L -> 0L, 20L -> 0L), 1L)
    assert(curatedIds(curated) == Set(5L, 30L),
      s"retro-correction failed: ${curatedIds(curated)}")

    // foreachBatch replay of batch 1: the near fold is token-guarded,
    // the cluster delta is EMPTY, and admission via the committed
    // labels must still reject the non-representative 20
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(5L -> 0L, 20L -> 0L), 1L)
    assert(curatedIds(curated) == Set(5L, 30L),
      s"replayed batch mutated the curated store: ${curatedIds(curated)}")
  }

  test("MID-CYCLE crash: the near fold committed but the cluster fold " +
      "and store commits were lost — recover and re-run the batch, " +
      "end state exact") {
    val near = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    val clusters = new ClusterLedger(spark, nBuckets = 4)
    val curated = new BucketedUpsert.State(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8)
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(10L -> 0L, 12L -> 0L, 30L -> far), 0L)
    assert(curatedIds(curated) == Set(10L, 30L))
    // batch 1 starts: ONLY the near ledger's fold lands (observe
    // commits its postings + lastOp token), then the driver dies
    // before the cluster fold or either store commit
    near.observe(qb(5L -> 0L, 20L -> 0L)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("sig")), 1L)
    val near2 = NearDupLedger.recover(spark, bits = 60, maxHamming = 3,
      nBuckets = 8, root = near.store.rootDir)
    val clusters2 = ClusterLedger.recover(spark, nBuckets = 4,
      root = clusters.store.rootDir)
    val curated2 = BucketedUpsert.recover(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8,
      stateRoot = curated.rootDir)
    // the engine retries batch 1 end-to-end: the near fold is skipped
    // (lastOp), the MERGE-THEN-PROBE contract re-returns the identical
    // pairs against state that already includes the batch, the min
    // monoid folds them, and admission reads the committed labels
    CurationStreamQueries.curationCycle(spark, near2, clusters2, curated2,
      qb(5L -> 0L, 20L -> 0L), 1L)
    assert(curatedIds(curated2) == Set(5L, 30L),
      s"mid-cycle crash recovery diverged: ${curatedIds(curated2)}")
  }

  test("the cycle is signature-agnostic: the EmbeddingLedger (q120's " +
      "semantic intake) rides the same contract — retro-correction, " +
      "mid-cycle crash recovery, and replay") {
    // frozen 2-cell quantizer: cell 0 = e0, cell 1 = e1
    val cent = Seq((0L, Array(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Array(0.0, 1.0, 0.0, 0.0), 1.0))
    val vDup = Array(1.0, 0.0, 0.0, 0.0)  // the semantic-dup cluster
    val vDup2 = Array(0.9, 0.1, 0.0, 0.0) // cos vs vDup ~0.994 >= 0.4
    val vLone = Array(0.0, 1.0, 0.0, 0.0) // unpaired, other cell
    def qbe(rows: (Long, Array[Double])*): DataFrame =
      rows.toSeq.toDF("id", "sig")
        .selectExpr("id", "sig", "id * 10 AS n_bpe", "0.9 AS quality")
    val near = new EmbeddingLedger(spark, cent, nProbe = 1,
      minCos = 0.4, nBuckets = 8)
    val clusters = new ClusterLedger(spark, nBuckets = 4)
    val curated = new BucketedUpsert.State(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8)
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qbe(10L -> vDup, 12L -> vDup, 30L -> vLone), 0L)
    assert(curatedIds(curated) == Set(10L, 30L),
      s"embedding batch 0 diverged: ${curatedIds(curated)}")
    // mid-cycle crash: only the embedding ledger's fold lands, then
    // the driver dies; everything recovers from the committed roots
    near.observe(qbe(5L -> vDup2, 20L -> vDup)
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("sig")), 1L)
    val near2 = EmbeddingLedger.recover(spark, cent, nProbe = 1,
      minCos = 0.4, nBuckets = 8, root = near.store.rootDir)
    val clusters2 = ClusterLedger.recover(spark, nBuckets = 4,
      root = clusters.store.rootDir)
    val curated2 = BucketedUpsert.recover(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8,
      stateRoot = curated.rootDir)
    CurationStreamQueries.curationCycle(spark, near2, clusters2, curated2,
      qbe(5L -> vDup2, 20L -> vDup), 1L)
    assert(curatedIds(curated2) == Set(5L, 30L),
      s"embedding mid-cycle crash recovery diverged: ${curatedIds(curated2)}")
    // foreachBatch replay of the recovered batch: end-to-end no-op
    CurationStreamQueries.curationCycle(spark, near2, clusters2, curated2,
      qbe(5L -> vDup2, 20L -> vDup), 1L)
    assert(curatedIds(curated2) == Set(5L, 30L),
      s"embedding replay mutated the store: ${curatedIds(curated2)}")
  }

  test("kill + recover mid-stream: the whole composition (near ledger, " +
      "cluster labels, curated store) continues from its committed " +
      "roots to the uninterrupted end state") {
    val near = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    val clusters = new ClusterLedger(spark, nBuckets = 4)
    val curated = new BucketedUpsert.State(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8)
    // batch 0 carries a within-batch pair so every store commits
    // something to recover from (recovery needs >= 1 committed batch)
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(10L -> 0L, 12L -> 0L, 30L -> far), 0L)
    assert(curatedIds(curated) == Set(10L, 30L))
    // driver loss: only the three committed roots survive
    val near2 = NearDupLedger.recover(spark, bits = 60, maxHamming = 3,
      nBuckets = 8, root = near.store.rootDir)
    val clusters2 = ClusterLedger.recover(spark, nBuckets = 4,
      root = clusters.store.rootDir)
    val curated2 = BucketedUpsert.recover(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8,
      stateRoot = curated.rootDir)
    CurationStreamQueries.curationCycle(spark, near2, clusters2, curated2,
      qb(5L -> 0L, 20L -> 0L), 1L)
    assert(curatedIds(curated2) == Set(5L, 30L),
      s"recovered continuation diverged: ${curatedIds(curated2)}")
  }

  test("provenance (q121): the committed artifacts answer WHY per " +
      "doc — and demoted-vs-suppressed is an arrival-order fact the " +
      "boundary snapshots alone can recover") {
    import org.apache.spark.sql.functions.{lit, when}
    val near = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    val clusters = new ClusterLedger(spark, nBuckets = 4)
    val curated = new BucketedUpsert.State(spark, keyCol = "id",
      payloadCols = Seq("n_bpe", "quality"), nBuckets = 8,
      retainHistory = true)
    // batch 0: near-dups {10, 12} (10 admitted as provisional rep,
    // 12 suppressed at arrival) + unpaired 30
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(10L -> 0L, 12L -> 0L, 30L -> far), 0L)
    val b0 = curated.history().last
    // batch 1: 5 takes over the cluster (10 DEMOTED), 20 suppressed
    CurationStreamQueries.curationCycle(spark, near, clusters, curated,
      qb(5L -> 0L, 20L -> 0L), 1L)
    val b1 = curated.history().last
    // the staged corpus the intake saw, plus a low-quality doc (99)
    // the gate screened out before any ledger observed it
    val staged = Seq((5L, 0.9), (10L, 0.9), (12L, 0.9), (20L, 0.9),
      (30L, 0.9), (99L, 0.1)).toDF("id", "quality")
    val got = CurationAuditQueries.provenanceStatuses(spark, curated,
      Seq(b0, b1), clusters.store.view(spark).select("id", "cluster"),
      staged, id => when(id.isin(5L, 20L), lit(1)).otherwise(lit(0)))
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got === Map(
      5L -> (("kept_rep", Some(5L))),
      10L -> (("demoted", Some(5L))),
      12L -> (("suppressed", Some(5L))),
      20L -> (("suppressed", Some(5L))),
      30L -> (("kept_unpaired", None)),
      99L -> (("low_quality", None))))
    // 10's demotion evidence and 12's suppression differ ONLY through
    // the batch-0 boundary snapshot: collapse both batches to one
    // boundary (treat everything as batch-1 arrivals against the
    // FINAL snapshot) and the distinction must vanish
    val flat = CurationAuditQueries.provenanceStatuses(spark, curated,
      Seq(b1), clusters.store.view(spark).select("id", "cluster"),
      staged, _ => lit(0))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flat(10L) == "suppressed" && flat(12L) == "suppressed",
      "without the arrival boundary, demoted is indistinguishable " +
        "from suppressed — the history snapshots carry the audit")
  }
}
