package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Transforms

/**
 * K1/K4 (SURVEY.md §2.5): the date-partitioned Snappy Parquet sink and the
 * Spark SQL table registration that replaces the Athena external table +
 * Imhotep index as the query layer.
 *
 * Reference parity: `snapshot=YYYYMMDD` partition dirs (Main.java:99-100),
 * Snappy compression (Main.java:103), and the manual 2,000,000-row file
 * rotation (Main.java:505-509) expressed as `maxRecordsPerFile` so every
 * executor rotates independently — no driver-side counter.
 */
object GcdSink {

  val RowsPerFile: Long = 2000000L

  /** Write one snapshot partition (idempotent per date: dynamic overwrite
   * replaces only this date's partition, so re-runs are safe — the
   * reference's download-history dedup moved into the sink). */
  def writeSnapshot(df: DataFrame, date: String, path: String): Unit =
    df.withColumn("snapshot", lit(Transforms.snapshotYmd(date)))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("snapshot")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", RowsPerFile)
      .parquet(path)

  /** Register the snapshot location as a queryable table (K4): Spark SQL
   * over this table is the engine's replacement for Athena/Imhotep. */
  def registerTable(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"CREATE TABLE $name USING PARQUET LOCATION '$path'")
    // partition discovery (≡ MSCK REPAIR TABLE on Athena)
    try spark.catalog.recoverPartitions(name)
    catch { case _: org.apache.spark.sql.AnalysisException => () }
  }
}
