package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/**
 * Writes one logical events table under `root/<encoding>/events.parquet`
 * in each timestamp encoding an upstream producer has actually shipped:
 *
 *  - `nanos`  — `ts` as INT64 nanoseconds. (Spark cannot author a
 *    parquet TIMESTAMP(NANOS) annotation; under
 *    `spark.sql.legacy.parquet.nanosAsLong` an annotated NANOS column
 *    and a plain INT64 column both surface as `LongType`, which is
 *    exactly the branch condition `Tables.normalizeEvents` dispatches
 *    on — so plain INT64 pins the same code path.)
 *  - `micros` — `ts` as TIMESTAMP (µs, instant-adjusted).
 *  - `ntz`    — `ts` as TIMESTAMP_NTZ (µs, naive — what a producer
 *    writing "local" datetimes emits; the encoding that broke round 8).
 *
 * The spec (`sources/EventsEncodingSpec`) asserts `Tables.load` yields
 * value-identical `ts_ns`/`ts` from all three and that a streaming and
 * a `ts_ns` consumer run green on each — the contract the 16-query
 * round-8 crash showed must be pinned, not assumed.
 */
object EventsEncodingFixture {

  val encodings: Seq[String] = Seq("nanos", "micros", "ntz")

  /** Deterministic logical rows: (event_id, ts_ns, user_id, event_type,
   * value, props). Spans ~6 h so watermarked hourly windows close; the
   * last 7 rows are NOT µs-aligned, pinning sub-µs truncation. */
  def rows: Seq[(Long, Long, Long, String, Double, String)] = {
    val t0 = 1700000000L * 1000000000L // 2023-11-14T22:13:20Z in ns
    val types = Seq("click", "view", "purchase", "error", "click")
    (0L until 240L).map { i =>
      val subUs = if (i >= 233) i * 7 % 1000 else 0L // sub-µs tail rows
      (i, t0 + i * 90L * 1000000000L + i * 1000L + subUs, i % 11,
        types((i % 5).toInt), (i % 17) * 1.25, s"p$i")
    }
  }

  /** Write all encodings under `root`; returns encoding -> dir whose
   * layout matches a real sf dir: one single FILE named
   * `events.parquet` inside (the streaming read path selects it out of
   * the sf dir with `pathGlobFilter=events.parquet`, which matches
   * file names — a part-file inside a directory would be invisible). */
  def write(spark: SparkSession, root: String): Map[String, String] = {
    import spark.implicits._
    val base = rows.toDF("event_id", "ts_ns", "user_id", "event_type",
      "value", "props")
    // source column order of the real table: event_id, ts, user_id, ...
    def ordered(df: DataFrame) = df.select(col("event_id"), col("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))

    // write a one-task directory, then promote the lone part file to
    // `<encDir>/events.parquet`
    def writeSingle(df: DataFrame, encDir: String): Unit = {
      import java.nio.file.{Files, Paths}
      val tmp = s"$encDir/__stage"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written under $tmp"))
      Files.createDirectories(Paths.get(encDir))
      Files.move(part.toPath, Paths.get(s"$encDir/events.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.sources.Scratch.deleteNow(tmp)
    }

    val nanosDir = s"$root/nanos"
    writeSingle(ordered(base.withColumn("ts", col("ts_ns"))), nanosDir)

    val asTs = base.withColumn("ts",
      timestamp_micros(expr("ts_ns div 1000")))
    val microsDir = s"$root/micros"
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try writeSingle(ordered(asTs), microsDir)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None =>
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }

    val ntzDir = s"$root/ntz"
    writeSingle(
      ordered(asTs.withColumn("ts", col("ts").cast(TimestampNTZType))),
      ntzDir)

    Map("nanos" -> nanosDir, "micros" -> microsDir, "ntz" -> ntzDir)
  }

  /** Standalone use: write the fixtures under args(0). */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      graft.sources.Scratch.dir("events_encodings"))
    val spark = SparkSession.builder()
      .master("local[4]").appName("events-encoding-fixture")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dirs = write(spark, root)
    println(dirs.toSeq.sortBy(_._1)
      .map { case (e, d) => s"$e -> $d" }.mkString("\n"))
    spark.stop()
  }
}
