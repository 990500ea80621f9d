package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Exact

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
}
