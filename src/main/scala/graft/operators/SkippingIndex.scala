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
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecarDir(tableDir, keyCol))
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
