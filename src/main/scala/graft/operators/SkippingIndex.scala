package graft.operators

import org.apache.spark.sql.{DataFrame, GraftExpressionBridge => B, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/**
 * Persisted PER-FILE data-skipping index — the lakehouse sidecar that
 * serves point lookups on a column the table is NOT partitioned or
 * sorted by. Partition pruning (q49) and row-group min/max (k02's
 * sorted write) cover the clustered dimensions; for any other selective
 * column a 100 TB table still scans every file. The sidecar stores, per
 * data file: min/max of the key plus a serialized Bloom filter of its
 * key set (Spark's own `BloomFilterAggregate` sketch — the q41 runtime
 * filter made durable). A point lookup consults the sidecar — METADATA
 * work, one tiny parquet read — and scans only the files whose range
 * covers the probe AND whose Bloom filter might contain it; Bloom
 * false-positive files are removed by the exact residual filter, and
 * false negatives cannot happen.
 *
 * Built per FILE via `input_file_name()` grouping, so the index job is
 * one scan + one shuffle of (file, sketch) rows — file-count-sized, not
 * data-sized. The sidecar lives under `_skip_<col>/` INSIDE the table
 * dir: the `_` prefix makes it invisible to normal reads of the table.
 * Keys are 64-bit integers (the id-lookup shape); the sketch hashes
 * `xxhash64(key)` on build and probe alike, so driver-side
 * `mightContainLong` evaluates exactly what `BloomFilterMightContain`
 * would.
 *
 * The sidecar row set is bounded by the FILE count (the same scale as
 * the file listing any query already pays), so collecting it for
 * pruning is the bounded-driver-scalar shape of BloomJoin/AnnIndex —
 * never row data.
 *
 * Lifecycle: [[refresh]] covers file APPENDS and deletions in place
 * (flat table dirs). A dir-swap rewrite ([[TableCompaction]],
 * `GcdSink.compactSnapshot`) replaces the directory wholesale and the
 * sidecar goes with it — by design: after a compaction every covered
 * file is gone, and a stale sidecar silently skipping live files would
 * be strictly worse than none. Rebuild after compacting (spec-pinned).
 */
object SkippingIndex {

  private def sidecarDir(tableDir: String, keyCol: String) =
    s"$tableDir/_skip_$keyCol"

  /** Build (or rebuild) the sidecar for `keyCol` over every data file
   * of `tableDir`. `expectedItemsPerFile` sizes each Bloom filter. */
  def build(spark: SparkSession, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long = 100000L): Unit = {
    val df = spark.read.parquet(tableDir)
    val agg = new BloomFilterAggregate(
      B.toExpression(xxhash64(col(keyCol))), expectedItemsPerFile)
    df.groupBy(input_file_name().as("file"))
      .agg(B.toColumn(agg.toAggregateExpression()).as("bloom"),
        min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"),
        count(lit(1)).as("rows"))
      .withColumn("gen", lit(0L))
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecarDir(tableDir, keyCol))
  }

  /** Incremental REFRESH after the table's file set changed (appends,
   * compaction, deletes): sketch ONLY files the sidecar doesn't cover
   * yet, keep covered rows verbatim (their `gen` tags prove it), drop
   * rows whose file vanished. Cost is O(new files' data + sidecar),
   * never O(table) — the maintain half every persisted artifact here
   * carries. */
  def refresh(spark: SparkSession, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long = 100000L): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val liveFiles = fs.listStatus(new Path(tableDir)).iterator
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(f => f.getPath.toUri.toString).toSet
    val side = spark.read.parquet(sidecarDir(tableDir, keyCol))
    val covered = side.select("file").collect().map(_.getString(0)).toSet
    // file uris from input_file_name() are file:///-style; normalize
    def norm(u: String) = u.stripPrefix("file://").stripPrefix("file:")
    val liveNorm = liveFiles.map(norm)
    val added = liveFiles.filterNot(f => covered.map(norm).contains(norm(f)))
    val kept = side.filter(col("file")
      .isin(covered.filter(f => liveNorm.contains(norm(f))).toSeq: _*))
    val maxGen = side.agg(max(col("gen"))).head().getLong(0)
    val fresh =
      if (added.isEmpty) kept
      else {
        val agg = new BloomFilterAggregate(
          B.toExpression(xxhash64(col(keyCol))), expectedItemsPerFile)
        kept.unionByName(
          spark.read.parquet(added.toSeq: _*)
            .groupBy(input_file_name().as("file"))
            .agg(B.toColumn(agg.toAggregateExpression()).as("bloom"),
              min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"),
              count(lit(1)).as("rows"))
            .withColumn("gen", lit(maxGen + 1)))
      }
    // stage-then-swap: Spark won't overwrite a path it is reading
    val stage = sidecarDir(tableDir, keyCol) + ".stage"
    fresh.coalesce(1).write.mode("overwrite").parquet(stage)
    val livePath = new Path(sidecarDir(tableDir, keyCol))
    fs.delete(livePath, true)
    require(fs.rename(new Path(stage), livePath), "sidecar swap failed")
  }

  /** The files a lookup of `values` must scan: range-covered AND
   * Bloom-positive. Exposed so specs/soaks can assert the actual
   * pruning, not a plan string. */
  def candidateFiles(spark: SparkSession, tableDir: String,
      keyCol: String, values: Seq[Long]): Seq[String] = {
    import org.apache.spark.util.sketch.BloomFilter
    val side = spark.read.parquet(sidecarDir(tableDir, keyCol)).collect()
    // hash each probe THROUGH SPARK's xxhash64 so build and probe use
    // bit-identical hashing (one metadata-sized job, no row data)
    val hs = spark.createDataFrame(values.map(Tuple1(_))).toDF("v")
      .select(col("v"), xxhash64(col("v")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    side.iterator.filter { r =>
      val bf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
      values.exists(v => v >= r.getAs[Long]("mn") &&
        v <= r.getAs[Long]("mx") && bf.mightContainLong(hs(v)))
    }.map(_.getAs[String]("file")).toSeq.sorted
  }

  /** Point lookup through the sidecar: scan only candidate files, then
   * apply the exact predicate (removes Bloom false positives — results
   * are exact, the sidecar only decides WHICH files to read). */
  def lookup(spark: SparkSession, tableDir: String, keyCol: String,
      values: Seq[Long]): DataFrame = {
    val files = candidateFiles(spark, tableDir, keyCol, values)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(keyCol).isin(values.map(Long.box): _*))
  }
}
