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
   * reference's download-history dedup moved into the sink).
   *
   * Rows are clustered by `clusterBy` inside each file so parquet
   * row-group min/max statistics prune series/issue range predicates at
   * read time, and dictionary/RLE encoding compresses the denormalized
   * (highly repetitive) series/publisher columns — at 100 TB this
   * clustering is what turns the snapshot into a skippable table instead
   * of a full-scan one. */
  def writeSnapshot(df: DataFrame, date: String, path: String,
      clusterBy: Seq[String] = Seq("series_id", "issue_id"),
      format: String = "parquet"): Unit =
    df.withColumn("snapshot", lit(Transforms.snapshotYmd(date)))
      .sortWithinPartitions(clusterBy.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("snapshot")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", RowsPerFile)
      .format(format) // parquet (reference parity) or any columnar
      .save(path)     // format Spark ships (orc, …)

  /**
   * Bucketed variant for co-located downstream joins: cluster the snapshot
   * by a join key (e.g. issue_id) into `n` buckets so repeated joins /
   * aggregations on that key skip the shuffle entirely — at 100 TB the
   * bucketed layout amortizes one write-time shuffle across every
   * downstream query.
   */
  def writeBucketed(df: DataFrame, name: String, path: String,
      bucketCol: String, n: Int = 64): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .bucketBy(n, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .option("compression", "snappy")
      .format("parquet")
      .saveAsTable(name)
  }

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
