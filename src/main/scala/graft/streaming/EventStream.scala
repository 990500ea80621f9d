package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.queries.Exact

/** Running per-user state for [[EventStream.inactiveUserSummary]]: the
 * value sum is held as a scale-6 unscaled long (micro-units) so the
 * accumulation is exact and ORDER-INDEPENDENT — a running double sum
 * would depend on the nondeterministic within-group iterator order. */
case class UserAgg(n: Long, sumMicros: Long, lastUs: Long)

/** Emitted summary of a user gone inactive (see
 * [[EventStream.inactiveUserSummary]]). */
case class UserSummary(user_id: Long, n_events: Long, sum_value: Double,
    last_epoch: Long)

/**
 * Structured Streaming transforms over the `events` schema
 * (event_id, ts, user_id, event_type, value, props). Each takes a
 * streaming OR batch DataFrame — the logical plan is identical, which is
 * what keeps the batch queries (q16) and the streaming path semantically
 * aligned. The reference is batch-snapshot-only (SURVEY.md §2.6); this
 * module is part of the engine's beyond-reference surface.
 *
 * Scale notes: watermarks bound state; tumbling-window aggregation holds
 * one partial aggregate per (window, type) not per event; streaming dedup
 * keeps only event_ids younger than the watermark.
 */
object EventStream {

  /** Tumbling hourly counts/sums with a watermark bounding state. */
  def hourlyStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("sum_value"))

  /**
   * Tumbling hourly DISTINCT-user counts via HLL++ partial aggregation —
   * the bounded-state form of cardinality in a stream. Exact
   * `count_distinct` is not streamable (its state is the value set
   * itself, unbounded per window); `approx_count_distinct` keeps one
   * fixed-size HLL++ sketch per (window, type) that merges across
   * micro-batches, which is what makes per-window uniques affordable
   * unbounded — the streaming counterpart of q73's batch sketch rollup.
   */
  def hourlyUsers(events: DataFrame, watermark: String = "2 hours",
      rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        col("approx_users"))

  /**
   * Tumbling hourly value QUANTILES via KLL sketch state — the rank
   * counterpart of [[hourlyUsers]]: an exact per-window median needs
   * the window's whole value multiset as state, which is unbounded; a
   * KLL sketch is a few KB per (window, type), merges across
   * micro-batches through the state store exactly like any
   * TypedImperativeAggregate buffer, and bounds the rank error by a
   * constant. Values ride as exact integer cents (so the downstream
   * comparison band is integer-exact); the emitted quantile is one of
   * the retained inputs (inclusive criterion).
   */
  def hourlyQuantiles(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .select(col("ts"), col("event_type"),
        (Exact.dec(col("value")) * 100).cast("long").cast("double")
          .as("cents"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.KllAggregate.kllBuild(col("cents"), 200).as("sk"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"),
        graft.functions.KllAggregate.kllQuantile(col("sk"), 0.5)
          .cast("long").as("sk_p50"))

  /**
   * Stream-static enrichment join: the event stream joined to a static
   * dimension (read once per micro-batch, broadcast — the streaming
   * counterpart of the reference's dictionary lookups J6,
   * /root/reference/src/main/java/org/gcd/etl/Main.java:549-558), then
   * windowed aggregation per dimension attribute. Stream-static inner
   * joins are stateless (no join state at all — only the downstream
   * window aggregate holds state), which is why enrichment is the one
   * join shape you can run unbounded with a static side of any
   * broadcast-able size.
   */
  def enrichedHourly(events: DataFrame, dim: DataFrame, eventKey: String,
      dimKey: String, dimAttr: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(dimKey), col(dimAttr))),
        col(eventKey) === col(dimKey), "inner")
      .groupBy(window(col("ts"), "1 hour").as("w"), col(dimAttr))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour_start"), col(dimAttr), col("n"),
        col("sum_value"))

  /** Exactly-once-style dedup on event_id within the watermark horizon. */
  def dedupe(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user session windows (gap-based), counts + value sums. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /**
   * Stream-stream interval join (attribution): every `toType` event is
   * matched to the same user's `fromType` events in the preceding
   * `horizon` — click→purchase attribution shape. A true streaming
   * self-join: both branches read the same stream, each carries its own
   * watermark, and the two-sided event-time range condition is what lets
   * the join state be evicted (without it, stream-stream join state grows
   * forever). Inner-join matches emit in the micro-batch that completes
   * them, so the batch restatement is the plain interval join — no
   * watermark term in the oracle.
   */
  def attribution(events: DataFrame, fromType: String, toType: String,
      horizon: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val from = events.filter(col("event_type") === fromType)
      .select(col("event_id").as("from_id"), col("user_id"),
        col("ts").as("from_ts"))
      .withWatermark("from_ts", watermark)
    val to = events.filter(col("event_type") === toType)
      .select(col("event_id").as("to_id"), col("user_id").as("to_user"),
        col("ts").as("to_ts"), col("value"))
      .withWatermark("to_ts", watermark)
    from.join(to,
        expr(s"user_id = to_user AND to_ts >= from_ts " +
          s"AND to_ts <= from_ts + interval $horizon"), "inner")
      .select(col("user_id"), col("from_id"), col("to_id"),
        (unix_micros(col("to_ts")) - unix_micros(col("from_ts")))
          .as("lag_us"),
        col("value"))
  }

  /**
   * LEFT-OUTER stream-stream interval join: like [[attribution]], but
   * `fromType` events with NO matching `toType` event in the horizon
   * still emit — with null match columns — once the watermark proves no
   * match can arrive (left state older than watermark − horizon is
   * evicted; an unmatched evictee emits its null row at that point).
   * This is the streaming "abandoned funnel" primitive: clicks that
   * never converted, emitted incrementally and exactly once, instead of
   * a periodic batch anti-join. The final no-data micro-batch (AvailableNow)
   * advances the watermark to max(ts) − delay and flushes the last
   * expirable state, so the batch restatement carries the same
   * watermark-horizon cutoff for the null rows (matched rows restate
   * with no watermark term, exactly like the inner join).
   */
  def attributionOuter(events: DataFrame, fromType: String, toType: String,
      horizon: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val from = events.filter(col("event_type") === fromType)
      .select(col("event_id").as("from_id"), col("user_id"),
        col("ts").as("from_ts"))
      .withWatermark("from_ts", watermark)
    val to = events.filter(col("event_type") === toType)
      .select(col("event_id").as("to_id"), col("user_id").as("to_user"),
        col("ts").as("to_ts"), col("value"))
      .withWatermark("to_ts", watermark)
    from.join(to,
        expr(s"user_id = to_user AND to_ts >= from_ts " +
          s"AND to_ts <= from_ts + interval $horizon"), "left_outer")
      .select(col("user_id"), col("from_id"), col("to_id"),
        (unix_micros(col("to_ts")) - unix_micros(col("from_ts")))
          .as("lag_us"),
        col("value"),
        col("to_id").isNotNull.as("is_matched"))
  }

  /**
   * Custom keyed state via typed `flatMapGroupsWithState` (the API the
   * built-in windows can't replace when state logic is arbitrary): per
   * user, accumulate (count, exact value sum, last event time); when the
   * event-time watermark passes `last event + inactivityMs`, the group
   * TIMES OUT and emits one summary row, and its state is dropped.
   *
   * Semantics pinned for the batch restatement: a group fires when
   * `last_ms + inactivityMs < watermark_ms` (Spark's timeout check is
   * strict, and both sides are millisecond-truncated); the value sum
   * mirrors `SUM(CAST(value AS DECIMAL(18,6)))` element-for-element
   * (each double is decimal-rounded half-up on arrival, the accumulation
   * is exact long arithmetic).
   *
   * Scale notes: state is one 24-byte struct per ACTIVE user — the
   * watermark timeout is what keeps "active" bounded; without it this
   * operator would hold every user ever seen. Timeout timestamps must be
   * ahead of the current watermark, which holds for any in-order
   * micro-batch feed of `inactivityMs ≥ 0` (late groups re-arm from
   * their own watermark-bounded events).
   */
  def inactiveUserSummary(events: DataFrame,
      inactivityMs: Long = 30L * 60 * 1000,
      watermark: String = "1 hour"): Dataset[UserSummary] = {
    val s = events.sparkSession
    import s.implicits._
    events.select(col("user_id"), col("value"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserAgg, UserSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[(Long, Double, java.sql.Timestamp)],
            state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(UserSummary(uid, st.n,
              BigDecimal(st.sumMicros, 6).toDouble, st.lastUs / 1000000L))
          } else {
            var st = state.getOption.getOrElse(UserAgg(0L, 0L, Long.MinValue))
            rows.foreach { case (_, v, ts) =>
              val us = math.floorDiv(ts.getTime, 1000L) * 1000000L +
                ts.getNanos / 1000L
              // same per-element rounding as Spark's/DuckDB's
              // CAST(double AS DECIMAL(18,6))
              val micros = BigDecimal.decimal(v)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .underlying.unscaledValue.longValueExact
              st = UserAgg(st.n + 1, st.sumMicros + micros,
                math.max(st.lastUs, us))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastUs / 1000L + inactivityMs)
            Iterator.empty
          }
        })
  }
}
