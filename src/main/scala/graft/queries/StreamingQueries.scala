package graft.queries


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/**
 * Driver-gated Structured Streaming: q30 runs the REAL streaming engine —
 * file source → event-time watermark → tumbling-window aggregation →
 * append-mode parquet sink, executed to completion with
 * `Trigger.AvailableNow` — and returns the sink contents as a batch
 * DataFrame for the driver's DuckDB hash gate.
 *
 * What the oracle restates: append mode emits exactly the windows the
 * final watermark finalized. Spark tracks the watermark in MILLISECONDS
 * (`max event time ms − delay`), and a window is emitted when
 * `window.end ≤ watermark`, so the batch-SQL restatement is the hourly
 * aggregate filtered to `epoch_ms(hour_end) ≤ epoch_ms(max_ts) − delay_ms`
 * — streaming-vs-batch equivalence as a hash-checked contract, not a
 * claim.
 *
 * Scale notes: the same plan runs unbounded — watermark bounds state to
 * ~(active windows × event types) partial aggregates, the sink commits
 * per micro-batch via the streaming metadata log, and nothing here is
 * memory- or driver-resident beyond that state.
 */
object StreamingQueries {

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Gate-path micro-batch granularity for the 8-file staged sources:
   * 4 files per trigger → two REAL merge batches (+ the no-data final).
   * The gates' evidence is "the incremental fold runs more than once
   * and equals the batch recompute" — batch-COUNT robustness
   * (order-independence, per-batch pruning, kill/recover) is pinned at
   * higher batch counts by UpsertStreamSpec (≥4 batches) and the soaks
   * (StreamSoak: 20); the driver bench shouldn't pay 4+ rounds of
   * micro-batch engine overhead per gate to re-prove what the specs
   * already pin (round-9 verdict item #6). */
  private[queries] val GateFilesPerTrigger = "4"

  /** Run `transform` over the streaming read of the events table to
   * completion (AvailableNow) through an append-mode parquet sink, and
   * return the sink contents as a batch DataFrame. */
  private def runToCompletion(s: SparkSession, dir: String,
      transform: DataFrame => DataFrame): DataFrame = {
    val prev = s.conf.getOption(NanosConf)
    s.conf.set(NanosConf, "true")
    // Streaming state cost scales with the partition count fixed at first
    // run: every micro-batch commits one state-store delta PER PARTITION
    // PER stateful operator (q38's join keeps 4 stores/partition), so 32
    // partitions is pure fixed overhead at bench volumes. 8 here is a
    // BENCH-scale setting — a real deployment sizes it to state volume,
    // and the checkpoint pins it thereafter.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      // streaming file sources need an explicit schema; take it from the
      // batch footer read (whatever encoding the producer wrote)
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the streaming file source wants a directory; select just the
      // events file out of the sf dir with a glob filter
      val raw = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      // same contract as the batch path: normalize ANY upstream ts
      // encoding (INT64 nanos / TIMESTAMP / TIMESTAMP_NTZ) to
      // ts_ns + watermarkable µs-TIMESTAMP ts before the transform —
      // withWatermark rejects NTZ, unix_micros rejects NTZ.
      val ev = graft.sources.Tables.normalizeEvents(raw)

      val out = graft.sources.Scratch.dir("stream_out")
      val cp = graft.sources.Scratch.dir("stream_cp")
      val q = transform(ev)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(out)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => s.conf.set(NanosConf, v)
        case None => s.conf.unset(NanosConf)
      }
    }
  }

  private def run(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      EventStream.hourlyStats(ev, watermark = "1 hour")
        .select(unix_timestamp(col("hour_start")).as("hour_epoch"),
          col("event_type"), col("n"), col("sum_value")))
      .orderBy(col("hour_epoch"), col("event_type"))

  /** q92: HOPPING (sliding) windows through the real streaming engine —
   * 1-hour windows every 15 minutes, so each event lands in exactly 4
   * overlapping windows and the state holds ~4× the tumbling-window
   * partials (still watermark-bounded — the state cost of overlap is
   * window/slide, a constant, never the stream length). Append mode
   * emits a window once its END ≤ the ms watermark, exactly q30's
   * finalization contract at 4× emission density. The oracle restates
   * the hop assignment arithmetically — an event's windows start at
   * its 15-minute bucket minus 0..3 slides — over the whole table,
   * with the same watermark cutoff. */
  private def runHopping(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      ev.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          Exact.dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_epoch"),
          col("event_type"), col("n"), col("sum_value")))
      .orderBy(col("win_epoch"), col("event_type"))

  private def hoppingOracle: String =
    s"""WITH mx AS (SELECT max(ts) AS m FROM events),
       |h AS (SELECT time_bucket(INTERVAL '15 minutes', ts)
       |        - k * INTERVAL '15 minutes' AS ws, event_type, value
       |      FROM events CROSS JOIN
       |        (SELECT unnest(generate_series(0, 3)) AS k) hops),
       |agg AS (SELECT ws, event_type, COUNT(*) AS n,
       |    ${Exact.sqlDsum("value")} AS sum_value
       |  FROM h GROUP BY 1, 2)
       |SELECT CAST(epoch(ws) AS BIGINT) AS win_epoch, event_type, n,
       |  sum_value
       |FROM agg, mx
       |WHERE epoch_ms(ws) + 3600000 <= epoch_ms(m) - 3600000
       |ORDER BY win_epoch, event_type""".stripMargin

  /** q36: stateful SESSION windows through the real streaming engine —
   * watermark-bounded merging state, append-mode emission of finalized
   * sessions only (session end = last event + gap; a session is emitted
   * once session_end ≤ the millisecond watermark). */
  private def runSessions(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      EventStream.sessions(ev, gap = "30 minutes", watermark = "1 hour")
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("start_epoch"),
          unix_timestamp(col("session_end")).as("end_epoch"),
          col("n_events"), col("sum_value")))
      .orderBy(col("user_id"), col("start_epoch"))

  /** The q36 oracle: µs-precision gap islands (new session when the gap
   * ≥ 30 min — session_window's [start, last+gap) end is exclusive),
   * session end = last event + gap, finalized when end_us ≤ the
   * ms-truncated watermark scaled back to µs. */
  private def sessionsOracle: String =
    s"""WITH e AS (SELECT user_id, event_id, value,
       |    epoch_ns(ts) // 1000 AS us FROM events),
       |m AS (SELECT max(us) AS mx FROM e),
       |marked AS (
       |  SELECT user_id, value, us,
       |    CAST(SUM(CASE WHEN prev_us IS NULL
       |                  OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY us, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS sid
       |  FROM (SELECT *, lag(us) OVER
       |          (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
       |        FROM e)),
       |sess AS (
       |  SELECT user_id, sid, COUNT(*) AS n_events,
       |    ${Exact.sqlDsum("value")} AS sum_value,
       |    MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us
       |  FROM marked GROUP BY user_id, sid)
       |SELECT user_id, start_us // 1000000 AS start_epoch,
       |  end_us // 1000000 AS end_epoch, n_events, sum_value
       |FROM sess, m
       |WHERE end_us <= (mx // 1000 - 3600000) * 1000
       |ORDER BY user_id, start_epoch""".stripMargin

  /** q38: stream-stream interval join (click→purchase attribution within
   * 1 hour) through the real streaming engine. Inner-join matches emit in
   * the completing micro-batch, so the oracle is the batch interval join
   * over exact µs integers — no watermark clause. */
  private def runAttribution(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      EventStream.attribution(ev, "click", "purchase",
        horizon = "1 hour", watermark = "2 hours"))
      .select(col("user_id"), col("from_id").as("click_id"),
        col("to_id").as("purchase_id"), col("lag_us"), col("value"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))

  private def attributionOracle: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type, value,
       |    epoch_ns(ts) // 1000 AS us FROM events)
       |SELECT a.user_id AS user_id, a.event_id AS click_id,
       |  b.event_id AS purchase_id, b.us - a.us AS lag_us, b.value
       |FROM e a JOIN e b ON a.user_id = b.user_id
       |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
       |  AND b.us >= a.us AND b.us - a.us <= 3600000000
       |ORDER BY a.user_id, click_id, purchase_id""".stripMargin

  /** q67: LEFT-OUTER stream-stream interval join — matched pairs emit
   * like q38; clicks with no purchase in the horizon emit a null-match
   * row once the watermark proves no match can arrive (left state
   * evicts at watermark − horizon; the AvailableNow no-data final batch
   * advances the watermark to max(ts) − 2h and flushes the last
   * evictable state). Oracle: the inner matches with no watermark term
   * UNION ALL the never-matched clicks old enough that the final
   * watermark passed from_ts + horizon (ms-truncated comparison, the
   * same boundary contract q36/q40 pinned). With TWO withWatermark
   * nodes the global watermark is the MIN of the per-side watermarks —
   * max(click ts) and max(purchase ts) differ, so the oracle's cutoff
   * uses least() of the two, not max over all events (found by the
   * gate: one click sat between the two candidate cutoffs). */
  private def runAttributionOuter(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      EventStream.attributionOuter(ev, "click", "purchase",
        horizon = "1 hour", watermark = "2 hours"))
      .select(col("user_id"), col("from_id").as("click_id"),
        col("to_id").as("purchase_id"), col("lag_us"), col("value"),
        col("is_matched"))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id"))

  private def attributionOuterOracle: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type, value,
       |    epoch_ns(ts) // 1000 AS us FROM events),
       |m AS (SELECT least(
       |    (SELECT max(us) FROM e WHERE event_type = 'click'),
       |    (SELECT max(us) FROM e WHERE event_type = 'purchase')) AS mx),
       |matched AS (
       |  SELECT a.user_id, a.event_id AS click_id,
       |    b.event_id AS purchase_id, b.us - a.us AS lag_us, b.value,
       |    TRUE AS is_matched
       |  FROM e a JOIN e b ON a.user_id = b.user_id
       |  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
       |    AND b.us >= a.us AND b.us - a.us <= 3600000000),
       |expired_unmatched AS (
       |  SELECT a.user_id, a.event_id AS click_id,
       |    CAST(NULL AS BIGINT) AS purchase_id,
       |    CAST(NULL AS BIGINT) AS lag_us,
       |    CAST(NULL AS DOUBLE) AS value,
       |    FALSE AS is_matched
       |  FROM e a, m
       |  WHERE a.event_type = 'click'
       |    AND NOT EXISTS (SELECT 1 FROM e b
       |      WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
       |        AND b.us >= a.us AND b.us - a.us <= 3600000000)
       |    AND a.us // 1000 + 3600000 < mx // 1000 - 7200000)
       |SELECT * FROM matched
       |UNION ALL SELECT * FROM expired_unmatched
       |ORDER BY user_id, click_id, purchase_id""".stripMargin

  /** q40: CUSTOM keyed state via typed flatMapGroupsWithState — per-user
   * running (count, exact sum, last-seen), emitted when the event-time
   * watermark passes last_seen + 30 min (group timeout), state dropped.
   * Oracle: per-user aggregate filtered by the same strict ms-truncated
   * timeout comparison, sum restated as SUM(CAST(value AS DECIMAL(18,6)))
   * which the operator mirrors element-for-element. */
  private def runInactive(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev =>
      EventStream.inactiveUserSummary(ev,
        inactivityMs = 30L * 60 * 1000, watermark = "1 hour").toDF())
      .orderBy(col("user_id"))

  private def inactiveOracle: String =
    s"""WITH e AS (SELECT user_id, value, epoch_ns(ts) // 1000 AS us
       |           FROM events),
       |m AS (SELECT max(us) AS mx FROM e),
       |agg AS (SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       |    MAX(us) AS last_us
       |  FROM e GROUP BY user_id)
       |SELECT user_id, n_events, sum_value, last_us // 1000000 AS last_epoch
       |FROM agg, m
       |WHERE last_us // 1000 + 1800000 < mx // 1000 - 3600000
       |ORDER BY user_id""".stripMargin

  /** q43: streaming exactly-once-style dedup through the real engine —
   * the input stream is unioned with a copy of every third event (so
   * one-third of ids arrive twice), then
   * `dropDuplicatesWithinWatermark(event_id)` passes each id through
   * once, state bounded by the watermark horizon. The sink must contain
   * exactly the original event set; the oracle is simply the events
   * table, which makes the driver's hash gate a direct proof that the
   * duplicate copies were all absorbed and nothing real was dropped. */
  private def runDedup(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev => {
      val dup = ev.union(ev.filter(col("event_id") % 3 === 0))
      EventStream.dedupe(dup, watermark = "1 hour")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ep"), col("value"))
    }).orderBy(col("event_id"))

  private def dedupOracle: String =
    """SELECT event_id, user_id, event_type,
      |  epoch_us(ts) // 1000000 AS ep, value
      |FROM events ORDER BY event_id""".stripMargin

  /** q53: stream-static enrichment join through the real engine — the
   * event stream joined per micro-batch to the static customer dim
   * (broadcast, stateless), then hourly windowed aggregation per market
   * segment. Append mode emits a window once window.end ≤ watermark, so
   * the oracle is the batch join+aggregate with q30's cutoff clause. */
  private def runEnriched(s: SparkSession, dir: String): DataFrame =
    runToCompletion(s, dir, ev => {
      val cust = graft.sources.Tables.load(s, dir, "customer")
      graft.streaming.EventStream.enrichedHourly(ev, cust,
          eventKey = "user_id", dimKey = "c_custkey",
          dimAttr = "c_mktsegment", watermark = "1 hour")
        .select(unix_timestamp(col("hour_start")).as("hour_epoch"),
          col("c_mktsegment"), col("n"), col("sum_value"))
    }).orderBy(col("hour_epoch"), col("c_mktsegment"))

  private def enrichedOracle: String =
    s"""WITH mx AS (SELECT max(ts) AS m FROM events),
       |agg AS (
       |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
       |    c_mktsegment, COUNT(*) AS n,
       |    ${Exact.sqlDsum("value")} AS sum_value
       |  FROM events JOIN customer ON user_id = c_custkey
       |  GROUP BY 1, 2)
       |SELECT CAST(epoch(h) AS BIGINT) AS hour_epoch, c_mktsegment, n,
       |  sum_value
       |FROM agg, mx
       |WHERE epoch_ms(h) + 3600000 <= epoch_ms(m) - 3600000
       |ORDER BY hour_epoch, c_mktsegment""".stripMargin

  /** q74: per-window distinct users through the REAL streaming engine
   * with HLL++ sketch state (exact count_distinct is not streamable —
   * its state is the value set; the sketch is fixed-size per (window,
   * type) and merges across micro-batches). The streamed sketch
   * estimate is then checked against the batch exact distinct per
   * finalized window, q73-style: the gate hashes the exact columns
   * plus a tolerance flag, so the approximate path carries a
   * quantified quality contract cross-engine. */
  private def runHourlyUsers(s: SparkSession, dir: String): DataFrame = {
    val streamed = runToCompletion(s, dir, ev =>
      EventStream.hourlyUsers(ev, watermark = "1 hour")
        .select(unix_timestamp(col("hour_start")).as("hour_epoch"),
          col("event_type"), col("n"), col("approx_users")))
    val exact = graft.sources.Tables.load(s, dir, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts")))
          .as("hour_epoch"),
        col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    // the sink rows define the finalized-window set; the batch side
    // only supplies the exact verifier values
    streamed.join(exact, Seq("hour_epoch", "event_type"))
      .select(col("hour_epoch"), col("event_type"), col("n"),
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(col("exact_users").cast("double") * 0.05, lit(4.0)))
          .as("approx_ok"))
      .orderBy(col("hour_epoch"), col("event_type"))
  }

  private def hourlyUsersOracle: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |agg AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
      |    event_type, COUNT(*) AS n,
      |    COUNT(DISTINCT user_id) AS exact_users
      |  FROM events GROUP BY 1, 2)
      |SELECT CAST(epoch(h) AS BIGINT) AS hour_epoch, event_type, n,
      |  exact_users, TRUE AS approx_ok
      |FROM agg, mx
      |WHERE epoch_ms(h) + 3600000 <= epoch_ms(m) - 3600000
      |ORDER BY hour_epoch, event_type""".stripMargin

  /** q80: per-window value medians through the real streaming engine
   * with KLL sketch state — q74's rank counterpart (an exact median's
   * state is the window's whole value multiset; the sketch is a few
   * KB per (window, type) and merges across micro-batches). The
   * streamed estimate is gated q78-style: exact integer cents, the
   * exact median from the bounded cents dictionary, and the sketch
   * value checked against the exact p45..p55 band (KLL compaction is
   * randomized, so only the band is contractual). */
  private def runHourlyQuantiles(s: SparkSession, dir: String): DataFrame = {
    val streamed = runToCompletion(s, dir, ev =>
      EventStream.hourlyQuantiles(ev, watermark = "1 hour")
        .select(unix_timestamp(col("hour_start")).as("hour_epoch"),
          col("event_type"), col("n"), col("sk_p50")))
    val ev = graft.sources.Tables.load(s, dir, "events")
      .select(unix_timestamp(date_trunc("hour", col("ts")))
          .as("hour_epoch"),
        col("event_type"),
        (Exact.dec(col("value")) * 100).cast("long").as("cents"))
    val freq = ev.groupBy(col("hour_epoch"), col("event_type"),
        col("cents"))
      .agg(count(lit(1)).as("c"))
    val byWin = org.apache.spark.sql.expressions.Window
      .partitionBy("hour_epoch", "event_type")
    val cum = freq
      .withColumn("cum", sum(col("c")).over(byWin.orderBy("cents")))
      .withColumn("nn", sum(col("c")).over(byWin))
    def sel(p: Int, name: String) =
      min(when(col("cum") >= expr(s"($p * nn + 99) div 100"),
        col("cents"))).as(name)
    val exact = cum.groupBy(col("hour_epoch"), col("event_type"))
      .agg(sel(45, "p45"), sel(50, "p50_cents"), sel(55, "p55"))
    // the sink rows define the finalized-window set; the batch side
    // only supplies the exact verifier values
    streamed.join(exact, Seq("hour_epoch", "event_type"))
      .select(col("hour_epoch"), col("event_type"), col("n"),
        col("p50_cents"),
        (col("sk_p50") >= col("p45") && col("sk_p50") <= col("p55"))
          .as("sk_ok"))
      .orderBy(col("hour_epoch"), col("event_type"))
  }

  private def hourlyQuantilesOracle: String =
    """WITH mx AS (SELECT max(ts) AS m FROM events),
      |ev AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
      |    event_type,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT) AS cents
      |  FROM events),
      |freq AS (SELECT h, event_type, cents, COUNT(*) AS c
      |         FROM ev GROUP BY 1, 2, 3),
      |cum AS (SELECT h, event_type, cents,
      |    CAST(SUM(c) OVER (PARTITION BY h, event_type
      |                      ORDER BY cents) AS BIGINT) AS cum,
      |    CAST(SUM(c) OVER (PARTITION BY h, event_type)
      |         AS BIGINT) AS nn
      |  FROM freq),
      |ex AS (SELECT h, event_type, MAX(nn) AS n,
      |    MIN(CASE WHEN cum >= (50 * nn + 99) // 100
      |        THEN cents END) AS p50_cents
      |  FROM cum GROUP BY 1, 2)
      |SELECT CAST(epoch(h) AS BIGINT) AS hour_epoch, event_type, n,
      |  p50_cents, TRUE AS sk_ok
      |FROM ex, mx
      |WHERE epoch_ms(h) + 3600000 <= epoch_ms(m) - 3600000
      |ORDER BY hour_epoch, event_type""".stripMargin

  /** q86: streaming ingest INTO the persisted sketch store — the
   * production path the q82-q85 artifact exists for. The store is
   * bootstrapped from the history before a mid-range timestamp cut; the
   * tail streams through the real engine in several day-clustered
   * micro-batches (time-range-partitioned source files,
   * maxFilesPerTrigger), each of which foreachBatch-merges into the
   * artifact via [[graft.operators.SketchStore.ingestBatch]] —
   * replay-guarded upsertDays, so per batch the store I/O is
   * O(batch + touched day rows), never O(store). The cut lands mid-day,
   * so the boundary day is re-fed by the stream and exercises the real
   * late-data merge; the two cut scalars are a bounded one-row collect
   * (the documented driver-side-scalar shape). Sharing q82's oracle
   * hash-proves stream-ingested store serves ≡ build(full history):
   * exact columns exactly (mergeable-monoid sums), sketch estimates
   * inside their gated bands. SketchSoak is the at-volume proof that
   * per-batch upsert I/O stays bounded by touched days while the store
   * holds months. */
  // q86's templates (the q83/q84 link-clone trade on the streamed
  // gate): the pre-cut store build and the time-ordered tail staging
  // are byte-identical per rep — committed once per JVM, priced as
  // their own setup lines; each rep link-clones the store and streams
  // the staged tail into the clone through a fresh checkpoint.
  private def skTimeHalf(ss: SparkSession, dir: String): String =
    Advanced.skTemplate(dir, "time_half") {
      val e = graft.sources.Tables.load(ss, dir, "events")
        .select(col("event_type"), col("ts"), col("user_id"), col("value"))
      val r = e.agg(unix_micros(min(col("ts"))).as("mn"),
        unix_micros(max(col("ts"))).as("mx")).head()
      val cutUs = (r.getLong(0) + r.getLong(1)) / 2
      graft.operators.SketchStore.build(
        e.filter(unix_micros(col("ts")) < cutUs))
    }
  private val skSrcCache =
    scala.collection.mutable.Map.empty[String, String]
  private def skIngestSrc(ss: SparkSession, dir: String): String =
    skSrcCache.synchronized {
      skSrcCache.getOrElseUpdate(dir, {
        val e = graft.sources.Tables.load(ss, dir, "events")
          .select(col("event_type"), col("ts"), col("user_id"),
            col("value"))
        val r = e.agg(unix_micros(min(col("ts"))).as("mn"),
          unix_micros(max(col("ts"))).as("mx")).head()
        val cutUs = (r.getLong(0) + r.getLong(1)) / 2
        // stage the tail as time-ordered files so micro-batches are
        // day-clustered (each batch touches a bounded day subset — the
        // shape a partitioned ingest pipeline delivers)
        val src = graft.sources.Scratch.dir("sketch_ingest_src")
        e.filter(unix_micros(col("ts")) >= cutUs)
          .repartitionByRange(8, col("ts"))
          .write.mode("overwrite").parquet(src)
        src
      })
    }

  private def runSketchIngest(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    locally {
      // the op under test is the exactly-once streamed ingest: clone
      // the committed pre-cut store, stream the staged tail into it
      val root = RepClones.fresh(ss, skTimeHalf(ss, dir),
        "q86_stream_sketch_ingest")
      val src = skIngestSrc(ss, dir)
      val schema = ss.read.parquet(src).schema
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", StreamingQueries.GateFilesPerTrigger).parquet(src)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          graft.sources.Scratch.dir("sketch_ingest_cp"))
        .foreachBatch { (b: DataFrame, id: Long) =>
          graft.operators.SketchStore.ingestBatch(ss, root, b, id)
        }
        .start()
      q.awaitTermination()

      // gate planned on the CALLER's session; serve reads the artifact
      // the stream maintained
      Advanced.sketchStoreGate(
        graft.sources.Tables.load(s, dir, "events"),
        graft.operators.SketchStore.serve(s, root))
    }
  }

  /** q89: STREAMING incremental connected components — the q86 shape
   * (real engine foreachBatch-maintaining a persisted-progression
   * artifact) applied to the graph family's maintain operator. The
   * label table starts EMPTY and every micro-batch folds its
   * interaction edges in via [[graft.operators.IncrementalCC.maintain]]:
   * per batch, CC iterates only the batch's contracted delta (the
   * GraphSoak measurement: 3 contracted edges for a 10k-edge batch
   * against 3.3M accumulated), the label state is a distributed
   * (id, cluster) table carried across batches by eager
   * localCheckpoint — executor blocks, the driver holds only the plan
   * handle — and the accumulated edge set is NEVER re-read (it has no
   * representation here at all; the labeling subsumes it). Sharing
   * q88's full-recompute oracle hash-proves that a stream of bounded
   * maintains converges to exactly cc(all edges), independent of how
   * the engine happened to batch the files. */
  // per-JVM ingest cache (the neardupArtifacts pattern): the streamed
  // maintain chain runs once, its cost rides the setup metric, and
  // reps serve the final committed labeling
  private val streamCcCache =
    scala.collection.mutable.Map.empty[String, String]
  private def streamCcArtifacts(ss: SparkSession, dir: String): String =
    streamCcCache.synchronized {
      streamCcCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("stream_cc_ingest") {
          val e = graft.sources.Tables.load(ss, dir, "events")
            .select(col("event_id"), col("user_id"))
          val src = graft.sources.Scratch.dir("stream_cc_src")
          e.repartitionByRange(8, col("event_id"))
            .write.mode("overwrite").parquet(src)
          val schema = ss.read.parquet(src).schema
          var labels: DataFrame = ss.range(0)
            .select(col("id"), col("id").as("cluster"))
            .localCheckpoint(true)
          val q = ss.readStream.schema(schema)
            .option("maxFilesPerTrigger", GateFilesPerTrigger)
            .parquet(src)
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation",
              graft.sources.Scratch.dir("stream_cc_cp"))
            .foreachBatch { (b: DataFrame, _: Long) =>
              // Frames.cp: the carried labeling re-enters next batch's
              // joins — inherited stats would compound (graft.Frames)
              labels = graft.Frames.cp(
                graft.operators.IncrementalCC.maintain(labels,
                  Analytics.interactionEdges(b), maxIter = 100))
            }
            .start()
          q.awaitTermination()
          val out = graft.sources.Scratch.dir("stream_cc_out")
          labels.write.mode("overwrite").parquet(out)
          out
        })
    }

  private def runStreamCc(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    // gate planned on the CALLER's session from the final label table
    s.read.parquet(streamCcArtifacts(ss, dir)).orderBy(col("id"))
  }

  /** q91: streaming exact-dedup FINGERPRINT STORE — the corpus-level
   * dedup ledger a continuously-ingesting training-data pipeline
   * maintains (arriving docs are fingerprinted once, in the batch that
   * carries them; the corpus is never re-scanned). Every micro-batch
   * folds `(fingerprint, doc_id, 1)` rows into a
   * [[graft.streaming.BucketedUpsert]] state keyed by the md5 content
   * fingerprint with a MONOID combine — keeper = min(doc_id),
   * n_docs = sum — so the merged store is independent of how the
   * engine batched the files (min/sum commute and associate; contrast
   * q56's latest-wins replace). Per batch the store reads only the
   * touched key buckets; the oracle is the batch GROUP BY over the
   * whole corpus — the hash gate proves stream-maintained ledger ≡
   * full recompute, d01's exact-dedup semantics as a live artifact. */
  private def runDedupStore(s: SparkSession, dir: String): DataFrame = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    locally {
      val src = graft.sources.Scratch.dir("dedup_store_src")
      graft.sources.Tables.load(ss, dir, "documents")
        .select(
          graft.functions.TextFunctions.fingerprint(col("text"))
            .as("fingerprint"),
          col("doc_id").as("keeper_id"), lit(1L).as("n_docs"))
        .repartition(8).write.mode("overwrite").parquet(src)
      val schema = ss.read.parquet(src).schema
      // lsm (r16): uniformly-hashed fingerprints touch every bucket,
      // so the classic mode rewrote the FULL accumulated state per
      // micro-batch — the linear-arrival trade the r15 verdict flagged
      // for this store class. Generations append per batch (O(batch)
      // arrival) and the min/sum monoid collapses them at read; the
      // end-state view is identical because the combine is
      // associative+commutative over any grouping of the batches.
      val state = new graft.streaming.BucketedUpsert.State(ss,
        keyCol = "fingerprint",
        payloadCols = Seq("keeper_id", "n_docs"), nBuckets = 16,
        combine = Some(df => df.groupBy(col("fingerprint"))
          .agg(min(col("keeper_id")).as("keeper_id"),
            sum(col("n_docs")).as("n_docs"))),
        hashKey = true, lsm = true)
      val q = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", StreamingQueries.GateFilesPerTrigger).parquet(src)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          graft.sources.Scratch.dir("dedup_store_cp"))
        .foreachBatch { (b: DataFrame, id: Long) =>
          // sum(n_docs) is NOT idempotent, so a crashed-and-replayed
          // batch id appending a second lsm generation would
          // double-count — the shared replayGuarded contract carries
          // replay safety (the guard, not the monoid)
          state.replayGuarded("lastOp", id) { state.merge(b, id) }
          ()
        }
        .start()
      q.awaitTermination()
      state.view(s).orderBy(col("fingerprint"))
    }
  }

  private def dedupStoreOracle: String =
    s"""SELECT md5(${DedupQueries.normT}) AS fingerprint,
       |  min(doc_id) AS keeper_id, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin

  /** Shared harness for the arrival-time ledger gates (q108/q110/m07):
   * stage `rows` as `nSlices` modulo-sliced files (ONE materialization
   * — the slice writes must not recompute the signature projection per
   * slice) and stream them through a real engine run, one file per
   * trigger, invoking `body` per micro-batch. */
  private[queries] def streamSliced(ss: SparkSession, rows: DataFrame,
      idCol: String, tag: String, nSlices: Int = 4)(
      body: (DataFrame, Long) => Unit): Unit = {
    val src = graft.sources.Scratch.dir(s"${tag}_src")
    // ONE partitioned write stages every slice (the old form ran one
    // coalesce(1) job per slice — nSlices full passes over the staged
    // rows); repartitioning on the slice key puts each slice's rows in
    // one task, so partitionBy emits exactly one file per slice. The
    // files are then MOVED into the flat source dir with strictly
    // increasing mtimes — the file stream source orders by modification
    // time, so batch K still carries exactly slice K (the arrival-order
    // contract q116-style as-of gates rely on).
    // pmod, not %: Spark's % preserves sign, so a negative id would
    // match NO slice and the row would silently never stream. (A null
    // id pmods to null → the Hive default partition, caught below.)
    val stagedDir = graft.sources.Scratch.dir(s"${tag}_stage")
    rows.withColumn("__slice", pmod(col(idCol), lit(nSlices)))
      .repartition(nSlices, col("__slice"))
      // overwrite: Scratch.dir pre-creates the (empty) directory
      .write.mode("overwrite").partitionBy("__slice").parquet(stagedDir)
    val nullDir = s"$stagedDir/__slice=__HIVE_DEFAULT_PARTITION__"
    require(!graft.sources.StoreIO.exists(ss, nullDir),
      s"streamSliced($tag): null-$idCol rows would never stream — " +
        "slice on a non-null key")
    // empty-slice schema taken from `rows` itself, NOT inferred from
    // stagedDir (ADVICE r18): an empty slice that follows moved-out
    // non-empty ones — or an entirely empty `rows` — finds stagedDir
    // holding no data file by the time its fallback runs, and the
    // schema-inference read would throw in exactly the case the
    // fallback exists for. The staged data files carry exactly `rows`'
    // columns (`__slice` is a partition dir, never a file column).
    val sliceSchema = rows.schema
    val fsRoot = java.nio.file.Paths.get(src)
    java.nio.file.Files.createDirectories(fsRoot)
    val base = System.currentTimeMillis()
    (0 until nSlices).foreach { i =>
      val sliceDir = s"$stagedDir/__slice=$i"
      if (!graft.sources.StoreIO.exists(ss, sliceDir)) {
        // an empty slice still streams an (empty) batch, exactly as the
        // old per-slice append wrote an empty file — batch numbering
        // and the as-of boundary vectors must not shift
        ss.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            sliceSchema)
          .coalesce(1).write.parquet(sliceDir)
      }
      val sliceFiles = graft.sources.StoreIO.list(ss, sliceDir)
        .filter(_.getName.endsWith(".parquet"))
      require(sliceFiles.size == 1,
        s"streamSliced($tag): slice $i staged ${sliceFiles.size} files " +
          "— the repartition-on-slice contract (one file per slice) broke")
      val tgt = fsRoot.resolve(f"slice$i%02d.parquet")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(sliceFiles.head.toUri.getPath), tgt)
      // strictly increasing, second-apart stamps: the source sorts by
      // ms mtime and two same-stamp files would merge into one batch
      java.nio.file.Files.setLastModifiedTime(tgt,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
    }
    val q = ss.readStream.schema(ss.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        graft.sources.Scratch.dir(s"${tag}_cp"))
      .foreachBatch { (b: DataFrame, id: Long) => body(b, id) }
      .start()
    q.awaitTermination()
  }

  /** Read the per-opId pair directories (explicit child list, not a
   * glob — a glob makes Spark probe the parent for streaming-sink
   * metadata and log a spurious WARN stack). */
  private[queries] def readPairDirs(s: SparkSession,
      pairsDir: String): DataFrame = {
    val dirs = graft.sources.StoreIO.list(s, pairsDir)
      .map(_.toString).sorted
    s.read.parquet(dirs: _*).orderBy(col("a"), col("b"))
  }

  /** Every driver-gated streaming query: this object's event-stream
   * gates plus the persisted-store, expectations/repair, near-dup
   * ledger, and curation families (split by family in round 14 with
   * ZERO behavior change — same gate names, same plans). */
  val all: Seq[Q] = Seq(
    Q("q92_stream_hopping", runHopping, Some(hoppingOracle)),
    Q("q91_stream_dedup_store", runDedupStore, Some(dedupStoreOracle)),
    Q("q89_stream_incremental_cc", runStreamCc, Some(Analytics.incCcOracle),
      setup = Some((ss, dir) => { streamCcArtifacts(ss, dir); () })),
    Q("q86_stream_sketch_ingest", runSketchIngest,
      Some(Advanced.sketchStoreOracle),
      setup = Some((ss, dir) => {
        skTimeHalf(ss, dir); skIngestSrc(ss, dir); ()
      })),
    Q("q74_stream_approx_users", runHourlyUsers, Some(hourlyUsersOracle)),
    Q("q80_stream_kll_quantiles", runHourlyQuantiles,
      Some(hourlyQuantilesOracle)),
    Q("q36_stream_sessions", runSessions, Some(sessionsOracle)),
    Q("q53_stream_static_join", runEnriched, Some(enrichedOracle)),
    Q("q43_stream_dedup", runDedup, Some(dedupOracle)),
    Q("q38_stream_attribution", runAttribution, Some(attributionOracle)),
    Q("q67_stream_outer_attribution", runAttributionOuter,
      Some(attributionOuterOracle)),
    Q("q40_stream_custom_state", runInactive, Some(inactiveOracle)),
    Q("q30_stream_hourly", run,
      Some(s"""WITH mx AS (SELECT max(ts) AS m FROM events),
              |agg AS (
              |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
              |    event_type, COUNT(*) AS n,
              |    ${Exact.sqlDsum("value")} AS sum_value
              |  FROM events GROUP BY 1, 2)
              |SELECT CAST(epoch(h) AS BIGINT) AS hour_epoch, event_type, n,
              |  sum_value
              |FROM agg, mx
              |WHERE epoch_ms(h) + 3600000 <= epoch_ms(m) - 3600000
              |ORDER BY hour_epoch, event_type""".stripMargin))) ++
    StoreStreamQueries.all ++ ExpectationStreamQueries.all ++
    LedgerStreamQueries.all ++ CurationStreamQueries.all ++
    CurationAuditQueries.all ++ ClassifierQueries.all
}
