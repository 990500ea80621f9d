package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/**
 * Table registry for the engine's file-backed sources.
 *
 * The reference pushes one 5-way-join SQL query into MySQL and pulls a single
 * JDBC cursor (/root/reference/src/main/java/org/gcd/etl/Main.java:134-216,245-246).
 * Spark-first we instead read each base table as a columnar scan and let
 * Catalyst plan joins, pushdown and pruning. At cluster scale each
 * `spark.read.parquet` is a distributed, vectorized scan; nothing here holds
 * data on the driver.
 */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /**
   * Normalize the events timestamp to the engine's two-column contract,
   * from WHATEVER encoding the upstream producer wrote:
   *
   *  - INT64 TIMESTAMP(NANOS) (read as a long under
   *    `spark.sql.legacy.parquet.nanosAsLong`, which keeps the scan
   *    vectorized — no row-group fallback) → `ts_ns` is the raw long,
   *    `ts` = µs truncation;
   *  - TIMESTAMP (µs, instant-adjusted) → `ts` as stored,
   *    `ts_ns` = unix_micros × 1000;
   *  - TIMESTAMP_NTZ (µs, naive) → cast to TIMESTAMP first — the session
   *    timezone is pinned UTC engine-wide, so the naive datetime maps to
   *    the same instant DuckDB's epoch functions compute — then as above.
   *
   * Output column order is canonical regardless of source encoding:
   * `ts_ns` sits in the source `ts` slot, the µs `ts` TIMESTAMP is
   * appended last. Consumers (watermarks, `ts_ns div 1000` µs math)
   * never see the encoding. Works on batch and streaming DataFrames.
   */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    val norm = raw.schema("ts").dataType match {
      case LongType =>
        // Integer division: double division rounds above 2^53 (ULP at
        // 1.7e18 ns is 256 ns), which can truncate to a different µs.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other: DataType =>
        throw new IllegalArgumentException(
          s"events.ts has unsupported type ${other.sql}; expected " +
            "INT64 TIMESTAMP(NANOS), TIMESTAMP or TIMESTAMP_NTZ")
    }
    val order: Seq[Column] =
      (raw.columns.map(c => if (c == "ts") "ts_ns" else c) :+ "ts")
        .toIndexedSeq.map(col)
    norm.select(order: _*)
  }

  /**
   * Normalize the embeddings table to the engine contract
   * (`vec_id: long, embedding: array<float>, label: int`) from the
   * plausible upstream re-encodings: a producer that computes in double
   * precision ships `array<double>`; one that renumbers ships 32-bit
   * ids or 64-bit labels. The round-8 events crash proved one
   * environmental assumption can kill every consumer of a table —
   * this is the same guard for the similarity stack (the `ts` lesson
   * generalized; spec-pinned by SourceEncodingSpec).
   */
  def normalizeEmbeddings(raw: DataFrame): DataFrame = {
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
      case other => throw new IllegalArgumentException(
        s"embeddings.embedding has unsupported type ${other.sql}; " +
          "expected array<float> or array<double>")
    }
    raw.select(raw.schema.fields.toIndexedSeq.map { f =>
      (f.name, f.dataType) match {
        case ("embedding", _) =>
          col("embedding").cast(ArrayType(FloatType)).as("embedding")
        case ("vec_id", IntegerType) => col("vec_id").cast(LongType).as("vec_id")
        case ("label", LongType) => col("label").cast(IntegerType).as("label")
        case _ => col(f.name)
      }
    }: _*)
  }

  /**
   * Normalize the documents table to the engine contract (`text`,
   * `lang`, `source` as UTF-8 strings; `doc_id`, `n_chars` as longs)
   * from the plausible upstream re-encodings: a producer shipping raw
   * UTF-8 bytes writes `binary` text columns; a renumbering one writes
   * 32-bit counts/ids. Binary→string is the UTF-8 decode cast. Same
   * pattern as [[normalizeEvents]]; spec-pinned by SourceEncodingSpec.
   */
  def normalizeDocuments(raw: DataFrame): DataFrame =
    raw.select(raw.schema.fields.toIndexedSeq.map { f =>
      (f.name, f.dataType) match {
        case ("text" | "lang" | "source", BinaryType) =>
          col(f.name).cast(StringType).as(f.name)
        case ("text" | "lang" | "source", StringType) => col(f.name)
        case ("text" | "lang" | "source", other) =>
          throw new IllegalArgumentException(
            s"documents.${f.name} has unsupported type ${other.sql}; " +
              "expected string or binary")
        case ("doc_id" | "n_chars", IntegerType) =>
          col(f.name).cast(LongType).as(f.name)
        case _ => col(f.name)
      }
    }: _*)

  /**
   * Load one table from `dir/<name>.parquet`.
   *
   * `events` is normalized to the `ts_ns` (long nanos) + `ts` (µs
   * TIMESTAMP) contract from any upstream encoding — see
   * [[normalizeEvents]]. An engine at 100 TB cannot assume a producer
   * never upgrades its timestamp encoding.
   */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try normalizeEvents(spark.read.parquet(s"$dir/events.parquet"))
      finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
      }
    } else name match {
      case "embeddings" =>
        normalizeEmbeddings(spark.read.parquet(s"$dir/embeddings.parquet"))
      case "documents" =>
        normalizeDocuments(spark.read.parquet(s"$dir/documents.parquet"))
      case _ =>
        spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** The µs-integer projection of events (the cross-engine-exact domain
   * shared by the as-of/range-join/SCD2/rolling-window consumers):
   * everything [[load]] returns plus `ts_us = ts_ns div 1000`. */
  def eventsUs(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events").withColumn("ts_us", expr("ts_ns div 1000"))

  /** Register every table in `dir` as a temp view (the Spark SQL query layer —
   * replaces the reference's Athena external table,
   * src/main/athena/gcdissuesnapshot.sql:1-95). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
