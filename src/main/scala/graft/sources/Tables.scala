package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
   * Load one table from `dir/<name>.parquet`.
   *
   * `events.ts` is written as Parquet INT64 TIMESTAMP(NANOS) which Spark's
   * vectorized reader rejects; we read nanos as a long
   * (spark.sql.legacy.parquet.nanosAsLong) and surface both the raw
   * `ts_ns` long and a microsecond-precision `ts` timestamp. This keeps the
   * scan vectorized (no row-group fallback) at any scale.
   */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      try {
        val raw = spark.read.parquet(s"$dir/events.parquet")
        // ts arrives as LongType nanos; keep ns precision and add micros ts.
        if (raw.schema("ts").dataType == LongType) {
          // Integer division: double division rounds above 2^53 (ULP at
          // 1.7e18 ns is 256 ns), which can truncate to a different µs.
          raw.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        } else raw
      } finally {
        prev match {
          case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Register every table in `dir` as a temp view (the Spark SQL query layer —
   * replaces the reference's Athena external table,
   * src/main/athena/gcdissuesnapshot.sql:1-95). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
