package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * The persisted keyed-store gate family over
 * [[graft.streaming.BucketedUpsert]]: the streamed upsert view and its
 * lifecycle (targeted delete, time travel, vacuum, change feed, schema
 * evolution, bucket-pruned point lookup, reproducible training epoch).
 * Split out of [[StreamingQueries]] (round 14, zero behavior change).
 */
object StoreStreamQueries {

  /** q56: incrementally-maintained materialized view via foreachBatch —
   * the streaming upsert pattern parquet sinks can't express natively
   * (no in-place update): each micro-batch reduces to its per-user
   * latest event and MERGEs into [[graft.streaming.BucketedUpsert]]'s
   * key-bucketed state — touched buckets are read/rewritten, untouched
   * buckets carry over by pointer with ZERO I/O, so per-batch cost is
   * O(batch + touched state), never O(full state). The source is split
   * into multiple files with maxFilesPerTrigger so the merge loop
   * genuinely runs several times; StreamSoak's upsert stage is the
   * at-volume proof that per-batch reads stay bounded by the touched
   * key set while total state grows. The oracle is the batch argmax per
   * user — the hash gate proves the incremental view equals the
   * from-scratch recompute. */
  /** The q56/q93 shared merge loop: stream the events upsert source in
   * several micro-batches into a fresh BucketedUpsert state (runs on a
   * cloned session so state sizing never mutates the caller's
   * session-global shuffle partitions) and return the state handle. */
  private def upsertViewState(ss: SparkSession, dir: String,
      retainHistory: Boolean = false)
      : graft.streaming.BucketedUpsert.State = {
    val src = graft.sources.Scratch.dir("upsert_src")
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    ev.repartition(8).write.mode("overwrite").parquet(src)
    val schema = ss.read.parquet(src).schema
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", StreamingQueries.GateFilesPerTrigger).parquet(src)

    // per-user latest event: max of (us, event_id, ...) — the struct
    // comparison is lexicographic, so event_id breaks timestamp ties
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, retainHistory = retainHistory)

    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", graft.sources.Scratch.dir("upsert_cp"))
      .foreachBatch { (b: DataFrame, id: Long) => state.merge(b, id) }
      .start()
    q.awaitTermination()
    state
  }

  private[queries] def upsertViewCols(state: graft.streaming.BucketedUpsert.State,
      reader: SparkSession): DataFrame =
    // the returned view is planned on the CALLER's session (and its
    // shuffle-partition setting) — only the merge loop ran on the clone
    state.view(reader)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("us").as("last_us"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))

  private def runUpsert(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    upsertViewCols(upsertViewState(ss, dir), s)
  }

  /** q93: targeted KEY DELETION on the streamed upsert view — the
   * compliance (right-to-be-forgotten) operation a persisted keyed
   * store must serve: after the q56 merge loop builds the view, every
   * user with `user_id % 10 = 3` is deleted via
   * [[graft.streaming.BucketedUpsert.State.delete]] — only the buckets
   * holding a requested key are read, anti-joined and rewritten
   * (manifest-committed before the superseded files retire); untouched
   * buckets carry by pointer. The oracle is q56's batch argmax with
   * the deleted users filtered out: the hash gate proves the delete
   * removed exactly the requested keys and disturbed nothing else. */
  // q93's template: the committed q56-view store, streamed ONCE per
  // JVM (priced as its own setup line — the r19 link-clone trade); the
  // rep measures the op under test, DELETE, on a cloneTo copy. q56
  // itself keeps the full per-rep streamed build: the merge loop IS
  // that gate's subject.
  private val upsertTplCache =
    scala.collection.mutable.Map.empty[String, String]
  private def upsertViewTemplate(ss: SparkSession, dir: String): String =
    upsertTplCache.synchronized {
      upsertTplCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("upsert_view_store") {
          upsertViewState(ss, dir).rootDir
        })
    }

  private def runUpsertDelete(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val tpl = graft.streaming.BucketedUpsert.recover(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, stateRoot = upsertViewTemplate(ss, dir))
    val state = graft.StageTimer.time("q93_upsert_targeted_delete",
      "clone") {
      tpl.cloneTo(graft.sources.Scratch.dir("q93_clone"))
    }
    graft.StageTimer.time("q93_upsert_targeted_delete", "delete") {
      state.delete(
        graft.sources.Tables.load(ss, dir, "events")
          .filter(col("user_id") % 10 === 3).select(col("user_id")),
        opId = 1000L)
    }
    upsertViewCols(state, s)
  }

  /** q95: TIME TRAVEL on the upsert store — with `retainHistory` every
   * commit leaves an immutable numbered manifest, and `readAsOf` serves
   * the view exactly as a past commit left it (how a pipeline
   * reproduces "the corpus as the run that trained checkpoint N saw
   * it"; Delta/Iceberg snapshot reads over their logs). Batches are
   * explicit and DETERMINISTIC here (even event_ids then odd) so the
   * as-of-first-commit view is batch-composition-independent and the
   * DuckDB oracle can restate it exactly: the per-user argmax over
   * even-id events only. Real-streaming coverage of the same store is
   * q56/q93/q96 — this gate isolates the versioned-read contract. */
  private def runTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, retainHistory = true)
    state.merge(ev.filter(col("event_id") % 2 === 0), 0L)
    state.merge(ev.filter(col("event_id") % 2 === 1), 1L)
    val firstCommit = state.history().head
    state.readAsOf(s, firstCommit)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("us").as("last_us"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** q99: version-to-version CHANGE FEED from the upsert store's
   * manifest history — Delta CDF as an engine operator. The q95 store
   * commits two deterministic versions (even event_ids, then odd);
   * `changesBetween(1, 2)` emits every row whose state changed, tagged
   * insert/update (no deletes here — delete-op rows are spec-pinned via
   * the targeted-delete path), reading ONLY the buckets whose manifest
   * pointers differ between the versions — identical pointers mean
   * identical bytes. The oracle restates the diff of the two argmax
   * recomputes with IS DISTINCT FROM over the full payload. */
  private def runChangeFeed(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, retainHistory = true)
    state.merge(ev.filter(col("event_id") % 2 === 0), 0L)
    state.merge(ev.filter(col("event_id") % 2 === 1), 1L)
    state.changesBetween(s, 1L, 2L)
      .select(col("op"), col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("us").as("last_us"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  private def changeFeedOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events),
      |r1 AS (SELECT user_id, event_id, event_type, value, us FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY us DESC, event_id DESC) AS rn FROM e
      |   WHERE event_id % 2 = 0) WHERE rn = 1),
      |r2 AS (SELECT user_id, event_id, event_type, value, us FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY us DESC, event_id DESC) AS rn FROM e) WHERE rn = 1)
      |SELECT CASE WHEN r1.user_id IS NULL THEN 'insert'
      |    ELSE 'update' END AS op,
      |  r2.user_id, r2.event_id AS last_event_id,
      |  r2.event_type AS last_type, r2.us AS last_us,
      |  r2.value AS last_value
      |FROM r2 LEFT JOIN r1 ON r2.user_id = r1.user_id
      |WHERE r1.user_id IS NULL OR
      |  (r1.event_id, r1.event_type, r1.value, r1.us) IS DISTINCT FROM
      |  (r2.event_id, r2.event_type, r2.value, r2.us)
      |ORDER BY r2.user_id""".stripMargin

  /** q100: SCHEMA EVOLUTION on the upsert store — the payload widens
   * across a recovery (old code wrote 3 payload columns; new code
   * recovers the same state root with a 4th appended and keeps
   * merging), the Delta/Iceberg add-column analog on keyed state. The
   * manifest records the committed payload and recovery enforces
   * prefix-widening only (drop/reorder fails loudly); buckets written
   * before the widening read into the view with the new column as
   * typed nulls. Deterministic batches (even ids under the old schema,
   * odd under the new) make the view oracle-able: a user's
   * `last_value` is real iff their latest event arrived post-widening
   * (odd id), else null. */
  private def runSchemaEvolution(s: SparkSession, dir: String)
      : DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val old = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type"),
      nBuckets = 16, retainHistory = true)
    old.merge(ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("us"), col("event_id"),
        col("event_type")), 0L)
    // "deploy the new code": same root, payload widened by `value`
    val widened = graft.streaming.BucketedUpsert.recover(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, stateRoot = old.rootDir, retainHistory = true)
    widened.merge(ev.filter(col("event_id") % 2 === 1), 1L)
    widened.view(s)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("us").as("last_us"),
        col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  private def schemaEvolutionOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us,
      |  CASE WHEN event_id % 2 = 1 THEN value END AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** p03: REPRODUCIBLE TRAINING EPOCH from a corpus version — the
   * reason the store retains history: (corpus version, seed) must
   * deterministically yield the exact shard assignment and within-shard
   * order a past run consumed, long after the live corpus moved on.
   * The epoch plan is pure hash arithmetic over the as-of view: a
   * seeded 60-bit hash orders rows, `pmod` assigns shards, row_number
   * places within the shard — no RNG state, so any worker can recompute
   * any shard independently (at 100 TB the plan is one scan + one
   * shard-partitioned sort, no driver involvement). Oracle: the argmax
   * restatement of version 1 run through the same md5 arithmetic. */
  private def runReproducibleEpoch(s: SparkSession, dir: String)
      : DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val ev = graft.sources.Tables.load(ss, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "user_id",
      payloadCols = Seq("us", "event_id", "event_type", "value"),
      nBuckets = 16, retainHistory = true)
    state.merge(ev.filter(col("event_id") % 2 === 0), 0L)
    state.merge(ev.filter(col("event_id") % 2 === 1), 1L)
    val corpus = state.readAsOf(s, 1L) // the version the run trained on
    val ord = graft.functions.TextFunctions.hash60(
      concat(lit("ep1:"), col("user_id").cast("string")))
    import org.apache.spark.sql.expressions.Window
    corpus
      .withColumn("ord", ord)
      .withColumn("shard", pmod(col("ord"), lit(4)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("ord"), col("user_id"))))
      .select(col("shard"), col("pos"), col("user_id"),
        col("event_id").as("last_event_id"))
      .orderBy(col("shard"), col("pos"))
  }

  private def reproducibleEpochOracle: String =
    """WITH e AS (SELECT user_id, event_id,
      |    epoch_ns(ts) // 1000 AS us FROM events WHERE event_id % 2 = 0),
      |r AS (SELECT user_id, event_id FROM
      |  (SELECT *, row_number() OVER (PARTITION BY user_id
      |     ORDER BY us DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
      |h AS (SELECT user_id, event_id,
      |    CAST(('0x' || substr(md5('ep1:' || CAST(user_id AS VARCHAR)),
      |      1, 15)) AS BIGINT) AS ord FROM r)
      |SELECT CAST(ord % 4 AS INT) AS shard,
      |  CAST(row_number() OVER (PARTITION BY ord % 4
      |    ORDER BY ord, user_id) AS INT) AS pos,
      |  user_id, event_id AS last_event_id
      |FROM h ORDER BY shard, pos""".stripMargin

  private def timeTravelOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events
      |  WHERE event_id % 2 = 0),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q96: RETENTION VACUUM on the history-retaining streamed store —
   * the storage-reclamation half of the time-travel contract (Delta
   * VACUUM / Iceberg expire_snapshots). The q56 merge loop runs through
   * the REAL streaming engine with history on, so superseded bucket
   * versions accumulate instead of retiring; `vacuum(retainPrior = 0)`
   * then drops all but the newest committed manifest and deletes every
   * unreferenced bucket version — metadata-only work (manifests parsed,
   * no data read). The in-query requires pin that the vacuum actually
   * reclaimed something and that a dropped version fails loudly; the
   * hash gate proves the surviving view is untouched: it still equals
   * the batch argmax recompute. */
  private def runUpsertVacuum(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val state = upsertViewState(ss, dir, retainHistory = true)
    val versions = state.history()
    require(versions.length >= 2,
      s"vacuum gate expects >=2 committed versions, got $versions")
    val report = state.vacuum(retainPrior = 0)
    require(report.droppedManifests == versions.length - 1,
      s"vacuum dropped ${report.droppedManifests} manifests, " +
        s"expected ${versions.length - 1}")
    require(report.deletedDirs > 0,
      "vacuum reclaimed no superseded bucket versions — the merge " +
        "loop should have left some")
    // a vacuumed version must fail loudly, never read partially
    val vanished =
      try { state.readAsOf(ss, versions.head); false }
      catch { case _: IllegalArgumentException => true }
    require(vanished, s"readAsOf(${versions.head}) still readable " +
      "after vacuum past retention")
    upsertViewCols(state, s)
  }

  private def upsertDeleteOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events
      |  WHERE user_id % 10 <> 3),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  private[queries] def upsertOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS us FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM e)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q103: BUCKET-PRUNED POINT LOOKUP on the persisted keyed store —
   * the serving-path complement of the merge side's write pruning.
   * q91's dedup-fingerprint ledger is built (two deterministic monoid
   * merges), then "the ledger rows of THESE fingerprints" is served by
   * [[graft.streaming.BucketedUpsert.State.lookupKeys]]: probe buckets
   * are computed driver-side with the build path's own hash (Catalyst
   * XxHash64 literal eval — bit-identical routing, no false negatives)
   * and only those bucket files are read — O(state·k/n) instead of the
   * O(state) a view().filter pays, which at 100 TB is a point read vs
   * a table scan. Probes are acquired by doc id (bounded driver-side
   * list, the q101 lookup-key shape); the oracle restates acquisition
   * + lookup over the whole-corpus ledger. Actual bucket pruning is
   * pinned in UpsertStreamSpec via lookupPaths. */
  private def runStoreLookup(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = graft.sources.Tables.load(ss, dir, "documents")
      .select(
        graft.functions.TextFunctions.fingerprint(col("text"))
          .as("fingerprint"),
        col("doc_id").as("keeper_id"), lit(1L).as("n_docs"))
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "fingerprint",
      payloadCols = Seq("keeper_id", "n_docs"), nBuckets = 16,
      combine = Some(df => df.groupBy(col("fingerprint"))
        .agg(min(col("keeper_id")).as("keeper_id"),
          sum(col("n_docs")).as("n_docs"))),
      hashKey = true)
    state.merge(docs.filter(col("keeper_id") % 2 === 0), 0L)
    state.merge(docs.filter(col("keeper_id") % 2 === 1), 1L)
    val probes = docs.filter(col("keeper_id").isin(3L, 111L, 222L))
      .select(col("fingerprint")).distinct()
      .collect().map(_.getString(0)).toSeq
    state.lookupKeys(s, probes).orderBy(col("fingerprint"))
  }

  private def storeLookupOracle: String =
    s"""WITH f AS (SELECT md5(${DedupQueries.normT}) AS fingerprint,
       |    min(doc_id) AS keeper_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1),
       |p AS (SELECT md5(${DedupQueries.normT}) AS fp FROM documents
       |  WHERE doc_id IN (3, 111, 222))
       |SELECT fingerprint, keeper_id, n_docs FROM f
       |WHERE fingerprint IN (SELECT fp FROM p)
       |ORDER BY fingerprint""".stripMargin


  val all: Seq[Q] = Seq(
    Q("q56_stream_upsert_view", runUpsert, Some(upsertOracle)),
    Q("q93_upsert_targeted_delete", runUpsertDelete,
      Some(upsertDeleteOracle),
      setup = Some((ss, dir) => {
        val s8 = ss.newSession()
        s8.conf.set("spark.sql.shuffle.partitions", "8")
        upsertViewTemplate(s8, dir); ()
      })),
    Q("q95_upsert_time_travel", runTimeTravel, Some(timeTravelOracle)),
    Q("q96_upsert_vacuum", runUpsertVacuum, Some(upsertOracle)),
    Q("q99_upsert_change_feed", runChangeFeed, Some(changeFeedOracle)),
    Q("q100_upsert_schema_evolution", runSchemaEvolution,
      Some(schemaEvolutionOracle)),
    Q("q103_store_point_lookup", runStoreLookup,
      Some(storeLookupOracle)),
    Q("p03_reproducible_epoch", runReproducibleEpoch,
      Some(reproducibleEpochOracle)))
}
