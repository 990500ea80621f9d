package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.queries.StoreStreamQueries.{upsertOracle, upsertViewCols}

/**
 * The expectations → quarantine → repair gate family
 * ([[graft.operators.Expectations]] composed with the streamed ingest):
 * pre-commit budget gate, quarantine replay, patch-and-readmit, and the
 * in-loop arrival-time repair. Volume evidence: tools/RepairSoak.
 * Split out of [[StreamingQueries]] (round 14, zero behavior change).
 */
object ExpectationStreamQueries {

  /** q102: PRE-COMMIT EXPECTATIONS on a streamed ingest — q97's
   * declarative rules composed with the q56 foreachBatch commit (the
   * Delta-Live-Tables expectations-on-ingest shape): every micro-batch
   * is budget-checked in ONE extra scan BEFORE it merges into the
   * bucketed store; a batch that blows a budget is QUARANTINED (written
   * aside with its per-row violation audit, never merged), so a
   * poisoned extract can't corrupt the serving view and nothing is
   * silently dropped — the quarantine dir holds the evidence for
   * reprocessing. The source is the events stream split one file per
   * `event_id % 4` slice (1 file per trigger → 4 real batches); slice 3
   * carries synthesized poison rows (null type, sentinel value,
   * max-epoch timestamps that WOULD win the argmax if merged). The
   * oracle is the per-user argmax over the 3 clean slices — the hash
   * proves the gate rejected exactly the poisoned batch (whole-batch
   * quarantine semantics: slice 3's clean rows are held out with it)
   * and the poison never reached the view. A clean run ≡ the unguarded
   * pipeline is pinned in ExpectationsSpec. */
  /** The q102/q107 shared gated-ingest loop: stream the 4-slice source
   * (slice 3 poisoned) through the pre-commit expectations gate into a
   * fresh store; returns (store, quarantine dir). Exactly one batch —
   * the poisoned one — must quarantine. */
  // the q102/q107/q109 shared rule set (q109's repair patches name
  // these rules — one definition keeps gate and repair in lockstep)
  private val expgateRules = Seq(
    graft.operators.Expectations.Rule("type_known",
      col("event_type").isNotNull),
    graft.operators.Expectations.Rule("value_not_sentinel",
      col("value") =!= -9999.0))

  /** Stage the 4-slice events source with slice 3 poisoned (shared by
   * the q102/q107/q109 gated ingest and q114's in-loop repair): poison
   * rows are valid-looking keys with corrupt payloads that would WIN
   * the per-user argmax (us = far future) if a gate let them through. */
  private def expgateSource(ss: SparkSession, dir: String,
      tag: String): String = {
    val src = graft.sources.Scratch.dir(tag)
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val poison = ss.range(40).select(
      (col("id") % 40).as("user_id"),
      (col("id") + 900000000L).as("event_id"),
      lit(null).cast("string").as("event_type"),
      (col("id") + 4102444800000000L).as("us"), // far-future micros
      lit(-9999.0).as("value"))
    (0 until 4).foreach { i =>
      val slice = ev.filter(col("event_id") % 4 === i)
      (if (i == 3) slice.unionByName(poison) else slice)
        .coalesce(1).write.mode("append").parquet(src)
    }
    src
  }

  private def expectationsGatedIngest(ss: SparkSession, dir: String)
      : (graft.streaming.BucketedUpsert.State, String) = {
    import graft.operators.Expectations
    val src = expgateSource(ss, dir, "expgate_src")
    val rules = expgateRules
    val budgets = Map("type_known" -> 0.0, "value_not_sentinel" -> 0.0)
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16)
    val qdir = graft.sources.Scratch.dir("expgate_quarantine")
    val quarantined = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = ss.readStream.schema(ss.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.sources.Scratch.dir("expgate_cp"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Expectations.check(b, rules, budgets) match {
          case None => state.merge(b, id)
          case Some(_) =>
            // whole-batch quarantine WITH the per-row audit: the
            // rejected extract is preserved for reprocessing, the
            // store never sees it
            Expectations.audit(b, rules)
              .write.mode("append").parquet(qdir)
            quarantined.incrementAndGet(); ()
        }
      }
      .start()
    q.awaitTermination()
    require(quarantined.get() == 1,
      s"expected exactly the poisoned batch quarantined, " +
        s"got ${quarantined.get()}")
    (state, qdir)
  }

  // Build-once cache for the q102/q107 shared gated ingest: both gates
  // exercise the IDENTICAL 4-batch streamed ingest (slice 3 poisoned,
  // one batch quarantined) — q102's subject is the gate itself, q107's
  // is the REPLAY of the quarantine. Paying the micro-batch engine's
  // overhead twice per bench run measures nothing extra, so the first
  // caller materializes (store root, quarantine dir) and both serve
  // from it; q107 replays into a cloneTo copy, so no execution order
  // can mutate the shared store. Same trade as GcdQueries'
  // yesterdayCache (the quarantined==1 require still runs on build).
  private val expgateCache =
    scala.collection.mutable.Map.empty[String, (String, String)]
  private def gatedIngestArtifacts(ss: SparkSession,
      dir: String): (String, String) =
    expgateCache.synchronized {
      expgateCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("expgate_ingest") {
          val (state, qdir) = expectationsGatedIngest(ss, dir)
          (state.rootDir, qdir)
        })
    }
  /** Bench setup thunk for the gates riding [[gatedIngestArtifacts]]. */
  private def expgateSetup: Option[(SparkSession, String) => Unit] =
    Some((ss, dir) => { gatedIngestArtifacts(ss, dir); () })

  private def expgateRecover(ss: SparkSession,
      root: String): graft.streaming.BucketedUpsert.State =
    graft.streaming.BucketedUpsert.recover(ss, keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, stateRoot = root)

  private def runStreamExpectations(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, _) = gatedIngestArtifacts(ss, dir)
    upsertViewCols(expgateRecover(ss, root), s)
  }

  /** q107: QUARANTINE REPLAY — the repair half of the q102 lifecycle
   * (expectations → quarantine → repair → replay, the DLT loop closed).
   * The quarantined batch is read back WITH its per-row violation
   * audit, the violating rows are dropped (the audit column is the
   * repair's routing evidence — no re-evaluation of the rules), and
   * the salvaged clean rows merge into the store under a fresh batch
   * id. Dropping exactly the violating rows restores exactly the
   * original corpus rows of that slice, so the repaired view must
   * equal the PLAIN q56 argmax over the whole events table — the
   * oracle is shared verbatim, which is precisely the proof the
   * quarantine-repair roundtrip loses nothing and the poison never
   * lands. */
  private def runQuarantineReplay(s: SparkSession,
      dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, qdir) = gatedIngestArtifacts(ss, dir)
    // replay into a DEEP CLONE: the repair is a mutation, and the
    // shared gated store must stay pristine for q102 whatever order
    // the gates run in
    val state = expgateRecover(ss, root)
      .cloneTo(graft.sources.Scratch.dir("expgate_replay"))
    val salvaged = ss.read.parquet(qdir)
      .filter(size(col("violations")) === 0)
      .drop("violations")
    state.merge(salvaged, 1000L)
    upsertViewCols(state, s)
  }

  /** q109: QUARANTINE REPAIR-REPLAY — the PATCH half q107 doesn't
   * cover: real pipelines don't only salvage the clean rows of a
   * quarantined batch, they repair the violating rows and re-admit
   * them ([[graft.operators.Expectations.repair]]). The per-row audit
   * routes each patch (a row is patched for exactly the rules it was
   * convicted of — no re-evaluation), the patched batch is RE-AUDITED
   * so nothing re-admits on trust, and the whole repaired batch —
   * salvaged clean rows AND patched violators — merges under a fresh
   * batch id. The patched poison rows carry far-future timestamps, so
   * they legitimately WIN the per-user argmax for users 0–39: the
   * oracle restates the patch by reconstructing the poison rows with
   * their repaired columns and running the same argmax — the hash
   * proves the patch landed exactly as declared and nowhere else. */
  private def runRepairReplay(s: SparkSession,
      dir: String): DataFrame = {
    import graft.operators.Expectations
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val (root, qdir) = gatedIngestArtifacts(ss, dir)
    val state = expgateRecover(ss, root)
      .cloneTo(graft.sources.Scratch.dir("expgate_repairclone"))
    val (readmitted, unrepairable) = Expectations.repair(
      ss.read.parquet(qdir), expgateRules, Map(
        "type_known" -> Map("event_type" -> lit("repaired")),
        "value_not_sentinel" -> Map("value" -> lit(0.0))))
    require(unrepairable.isEmpty,
      "repair left still-violating rows — patches incomplete")
    state.merge(readmitted, 1001L)
    upsertViewCols(state, s)
  }

  /** q114: IN-LOOP STREAM REPAIR — the q109 patch lifecycle moved
   * INSIDE the arrival loop: q102 quarantines a poisoned batch for
   * offline handling and q109 repairs it in a later session, but a
   * production pipeline repairs in-line — gate → audit → patch →
   * re-audit → merge in the SAME foreachBatch, so the batch's
   * repairable rows land in the committed store in their ARRIVAL
   * batch and nothing waits for an operator. The audit evidence is
   * still written aside (the quarantine dir is the paper trail even
   * when repair succeeds), patches apply only to audit-convicted rows
   * in rule-list order, and the patched batch re-audits before it
   * merges — nothing re-admits on trust ([[graft.operators
   * .Expectations.repair]]'s contract). The oracle is q109's
   * restatement verbatim: full events + the declared patch, per-user
   * argmax — the hash proves the in-loop repair lands exactly the
   * offline repair's end state, with no extra session. */
  // per-JVM ingest cache (the neardupArtifacts pattern): the in-loop
  // gate→audit→patch→re-audit→merge stream runs once, its cost rides
  // the setup metric, and reps serve the committed repaired store
  private val inloopCache =
    scala.collection.mutable.Map.empty[String, String]
  private def inloopArtifacts(ss: SparkSession, dir: String): String =
    inloopCache.synchronized {
      inloopCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("inloop_repair_ingest") {
          buildInloopRepair(ss, dir)
        })
    }

  private def runInloopRepair(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    upsertViewCols(graft.streaming.BucketedUpsert.recover(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, stateRoot = inloopArtifacts(ss, dir)), s)
  }

  private def buildInloopRepair(ss: SparkSession, dir: String): String = {
    import graft.operators.Expectations
    val src = expgateSource(ss, dir, "inloop_src")
    val budgets = Map("type_known" -> 0.0, "value_not_sentinel" -> 0.0)
    val patches = Map(
      "type_known" -> Map("event_type" -> lit("repaired")),
      "value_not_sentinel" -> Map("value" -> lit(0.0)))
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16)
    val qdir = graft.sources.Scratch.dir("inloop_quarantine")
    val repaired = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = ss.readStream.schema(ss.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.sources.Scratch.dir("inloop_cp"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        Expectations.check(b, expgateRules, budgets) match {
          case None => state.merge(b, id)
          case Some(_) =>
            val audited = Expectations.audit(b, expgateRules)
              .localCheckpoint()
            // evidence first: the audited batch is preserved even
            // though the repair readmits it in-line
            audited.write.mode("append").parquet(qdir)
            val (readmitted, unrepairable) =
              Expectations.repair(audited, expgateRules, patches)
            require(unrepairable.isEmpty,
              "in-loop repair left still-violating rows")
            state.merge(readmitted, id)
            repaired.incrementAndGet(); ()
        }
      }
      .start()
    q.awaitTermination()
    require(repaired.get() == 1,
      s"expected exactly the poisoned batch repaired in-loop, " +
        s"got ${repaired.get()}")
    state.rootDir
  }

  private def repairReplayOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events),
      |p AS (SELECT CAST(i AS BIGINT) AS user_id,
      |    CAST(i + 900000000 AS BIGINT) AS event_id,
      |    'repaired' AS event_type, 0.0 AS value,
      |    CAST(i + 4102444800000000 AS BIGINT) AS us
      |  FROM generate_series(0, 39) t(i)),
      |u AS (SELECT * FROM e UNION ALL SELECT * FROM p),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM u)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  private def streamExpectationsOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events
      |    WHERE event_id % 4 <> 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin


  val all: Seq[Q] = Seq(
    Q("q102_stream_expectations_gate", runStreamExpectations,
      Some(streamExpectationsOracle), setup = expgateSetup),
    Q("q107_quarantine_replay", runQuarantineReplay,
      Some(upsertOracle), setup = expgateSetup),
    Q("q109_quarantine_repair_replay", runRepairReplay,
      Some(repairReplayOracle), setup = expgateSetup),
    Q("q114_stream_inloop_repair", runInloopRepair,
      Some(repairReplayOracle),
      setup = Some((ss, dir) => { inloopArtifacts(ss, dir); () })))
}
