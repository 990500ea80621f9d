package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * The reference's per-row scalar transforms (SURVEY.md §2.4, T5–T12)
 * re-expressed as pure, codegen-friendly `Column` combinators built from
 * `org.apache.spark.sql.functions._`. No UDFs anywhere: every function here
 * stays inside whole-stage codegen, so the hot ETL path is a single fused
 * pipeline at any scale.
 *
 * Reference citations are into /root/reference/src/main/java/org/gcd/etl/.
 */
object Transforms {

  /** The reference's missing-value sentinel for date-int fields
   * (Main.java:619-650). */
  val YmdSentinel = -1

  /**
   * T5 — lenient int parse (Main.java:253-258, 391-396):
   * `Integer.parseInt` semantics — digits with optional sign only; anything
   * else (junk, decimals, overflow) yields null, never an error.
   * `"12.5"` must NOT parse (plain cast would truncate it to 12).
   */
  def lenientInt(c: Column): Column = {
    val wellFormed = c.rlike("^[+-]?\\d+$")
    // ANSI-safe: guard digit-length before the long cast, then int range
    // before narrowing, so overflow yields null (parseInt-throws semantics)
    // instead of a runtime error.
    val noPlus = regexp_replace(c, "^\\+", "")
    val fitsLong = length(regexp_replace(c, "^[+-]", "")) <= 18
    val asLong = when(wellFormed && fitsLong, noPlus.cast(LongType))
    when(asLong.between(Int.MinValue.toLong, Int.MaxValue.toLong),
      asLong.cast(IntegerType))
  }

  /**
   * T6 — GCD date string → yyyyMMdd int (pattern Main.java:46, impl
   * Main.java:619-635): the reference uses `Matcher.matches()`, i.e. the
   * ENTIRE string must be `\d{4}-\d{2}-\d{2}`; match → digits concatenated
   * as an int; no match → -1. Null input → -1 here (the reference would
   * NPE — key_date is non-null in GCD; divergence documented).
   * GCD allows month/day "00" (e.g. "1962-00-00"), so this must NOT go
   * through a calendar-validating parser like to_date.
   */
  def dateStrToYmdInt(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}$"),
      regexp_replace(c, "-", "").cast(IntegerType))
      .otherwise(lit(YmdSentinel))

  /**
   * T7 — epoch seconds → yyyyMMdd int (fmt Main.java:48, impl
   * Main.java:637-650): seconds > 0 → formatted "yyyyMMdd" as int; else -1.
   * The reference used the JVM default TZ; we pin the session to UTC and
   * document the divergence (SURVEY.md §7.4).
   */
  def epochToYmdInt(c: Column): Column =
    when(c > 0, date_format(from_unixtime(c), "yyyyMMdd").cast(IntegerType))
      .otherwise(lit(YmdSentinel))

  /**
   * T8 — semicolon split → string array (Main.java:535-547):
   * Java `split("\\s*;\\s*")` semantics — trailing empty strings are
   * dropped (possibly yielding an empty array, e.g. ";") but a leading
   * empty element (input "; x") is kept, and a no-match input is returned
   * whole (so "" → [""]). Spark's split keeps trailing empties at every
   * limit, so we drop them explicitly: keep elements up to the last
   * non-empty index.
   */
  def semiSplit(c: Column): Column = {
    // Java's trailing-empty drop, regex-only (no interpreted HOFs — this
    // runs on 6+ columns of every snapshot row): strip trailing separator
    // runs first, then split. Cases: "" → [""] (no separator to strip,
    // Java returns the whole string); all-separator input ("; ", ";") →
    // [] (every piece is a trailing empty); otherwise split the stripped
    // string (interior/leading empties survive, exactly like Java).
    val stripped = regexp_replace(c, "(\\s*;\\s*)+$", "")
    when(c === "", array(lit("")))
      .when(stripped === "", array().cast("array<string>"))
      .otherwise(split(stripped, "\\s*;\\s*", -1))
  }

  /** T9 — int(0/1) → boolean (Main.java:410,420,423-424,434,450); null-safe. */
  def intToBool(c: Column): Column = c === 1

  /** T11 — Flamdex-path default: missing numeric → -1 (Main.java:589-601).
   * Only for the index-sink projection; Parquet keeps real nulls. */
  def defaultMinusOne(c: Column): Column = coalesce(c, lit(-1L) cast LongType)

  /**
   * T12 — credit-source merge with provenance (Main.java:467-493):
   * if the story has curated credits use the aggregated array, else
   * semicolon-split the legacy free-text field.
   */
  def mergeCredits(curated: Column, legacy: Column): Column =
    when(curated.isNotNull, curated).otherwise(semiSplit(legacy))

  /** Provenance column for T12: "gcd_story_credit" when curated credits
   * exist, else "gcd_story" (Main.java:482-484). */
  def creditSource(hasCurated: Column): Column =
    when(hasCurated, lit("gcd_story_credit")).otherwise(lit("gcd_story"))

  /**
   * T4 — snapshot-date constant (Main.java:59-60): `date` ("y-M-d") parsed at
   * fixed offset GMT-06:00 → epoch seconds, stamped on every row as a literal
   * (broadcast by codegen, zero per-row cost).
   */
  def snapshotEpoch(date: String): Long = {
    val Array(y, m, d) = date.split("-").map(_.toInt)
    java.time.ZonedDateTime
      .of(y, m, d, 0, 0, 0, 0, java.time.ZoneOffset.ofHours(-6))
      .toEpochSecond
  }

  /** yyyyMMdd int of a snapshot date string ("2026-8-12" → 20260812). */
  def snapshotYmd(date: String): Int = {
    val Array(y, m, d) = date.split("-").map(_.toInt)
    y * 10000 + m * 100 + d
  }
}
