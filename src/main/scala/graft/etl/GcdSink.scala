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

  /**
   * Compact one written snapshot partition to a target file count:
   * re-read, re-cluster, dynamically overwrite JUST that date's
   * partition. The monthly append pattern (one dump → one partition)
   * plus executor-side rotation can strand small files; at 100 TB the
   * file count is the scan's task count and the NameNode/listing load,
   * so compaction is a first-class maintenance operator, not a script.
   *
   * `targetFiles` is explicit (not inferred from sizes) so the rewrite
   * is deterministic; re-clustering runs the same `sortWithinPartitions`
   * as the original write, so row-group pruning survives compaction.
   */
  def compactSnapshot(spark: SparkSession, path: String, date: String,
      targetFiles: Int,
      clusterBy: Seq[String] = Seq("series_id", "issue_id")): Unit = {
    import org.apache.hadoop.fs.Path
    val ymd = Transforms.snapshotYmd(date)
    // Spark refuses to overwrite a path it is reading, so compact to a
    // sibling temp dir and swap the partition dir in (old dir renamed to
    // a .bak first: the partition is never missing, and a crash leaves
    // either the old or the new complete dir plus debris to clean).
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val partDir = new Path(path, s"snapshot=$ymd")
    val tmpBase = new Path(s"$path.compact$ymd")
    val bak = new Path(path, s".snapshot=$ymd.bak")
    spark.read.parquet(path).filter(col("snapshot") === ymd)
      .repartitionByRange(targetFiles, clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("snapshot")
      .option("compression", "snappy")
      .option("maxRecordsPerFile", RowsPerFile)
      .parquet(tmpBase.toString)
    fs.delete(bak, true)
    require(fs.rename(partDir, bak), s"cannot stage $partDir")
    require(fs.rename(new Path(tmpBase, s"snapshot=$ymd"), partDir),
      s"cannot install compacted $partDir")
    fs.delete(bak, true)
    fs.delete(tmpBase, true)
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
