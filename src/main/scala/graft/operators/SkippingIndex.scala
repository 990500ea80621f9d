package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftExpressionBridge => B, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

import graft.functions.BloomContainsAnyExpr

/**
 * Persisted PER-FILE data-skipping index — the lakehouse sidecar that
 * serves point lookups on a column the table is NOT partitioned or
 * sorted by. Partition pruning (q49) and row-group min/max (k02's
 * sorted write) cover the clustered dimensions; for any other selective
 * column a 100 TB table still scans every file. The sidecar stores, per
 * data file: min/max of the key plus a serialized Bloom filter of its
 * key set (Spark's own `BloomFilterAggregate` sketch — the q41 runtime
 * filter made durable). A point lookup consults the sidecar — a Spark
 * job over one tiny parquet table — and scans only the files whose
 * range covers a probe AND whose Bloom filter might contain it; Bloom
 * false-positive files are removed by the exact residual filter, and
 * false negatives cannot happen.
 *
 * Built per FILE via `input_file_name()` grouping, so the index job is
 * one scan + one shuffle of (file, sketch) rows — file-count-sized, not
 * data-sized. The sidecar lives under `_skip_<col>/` INSIDE the table
 * dir: the `_` prefix makes it invisible to normal reads of the table.
 * Keys are 64-bit integers (the id-lookup shape); the sketch hashes
 * `xxhash64(key)` on build, and the probe side evaluates the same
 * Catalyst `XxHash64` (same seed) driver-side over the bounded probe
 * list, so build and probe hashing are bit-identical.
 *
 * PRUNING RUNS ON THE EXECUTORS: [[candidateFilesDF]] range-filters the
 * literal probe array per sidecar row (`filter` HOF over mn/mx) and
 * applies [[BloomContainsAnyExpr]] to the surviving hashes — each row
 * deserializes its own filter where the row lives. Only the matching
 * FILE NAMES are collected (bounded by candidates), never Bloom bytes:
 * at 100 TB (~100k × 1 GB files, ~100 KB filter each) the old
 * collect-the-sidecar approach moved ~10 GB of filter bytes through the
 * driver per lookup; this plan moves a few file-name strings.
 *
 * Lifecycle: [[refresh]] covers file APPENDS and deletions in place
 * (flat table dirs). A dir-swap rewrite ([[TableCompaction]],
 * `GcdSink.compactSnapshot`) replaces the directory wholesale and the
 * sidecar goes with it — by design: after a compaction every covered
 * file is gone, and a stale sidecar silently skipping live files would
 * be strictly worse than none. Compaction can rebuild it in the same
 * call (`TableCompaction.compact(rebuildSkipIndexes = ...)`), or
 * rebuild manually (both spec-pinned). [[lookup]] additionally
 * reconciles the sidecar against the LIVE file listing and scans any
 * uncovered file unpruned, so a lookup between an append and the next
 * [[refresh]] stays exact instead of silently dropping the new file's
 * rows.
 */
object SkippingIndex {

  private def sidecarDir(tableDir: String, keyCol: String) =
    s"$tableDir/_skip_$keyCol"

  /** Per-file sketch rows for `paths` (files or a whole table dir). */
  private def sketch(spark: SparkSession, paths: Seq[String],
      keyCol: String, expectedItemsPerFile: Long, gen: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      B.toExpression(xxhash64(col(keyCol))), expectedItemsPerFile)
    spark.read.parquet(paths: _*)
      .groupBy(input_file_name().as("file"))
      .agg(B.toColumn(agg.toAggregateExpression()).as("bloom"),
        min(col(keyCol)).as("mn"), max(col(keyCol)).as("mx"),
        count(lit(1)).as("rows"))
      .withColumn("gen", lit(gen))
  }

  /** Build (or rebuild) the sidecar for `keyCol` over every data file
   * of `tableDir`. `expectedItemsPerFile` sizes each Bloom filter. */
  def build(spark: SparkSession, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long = 100000L): Unit =
    sketch(spark, Seq(tableDir), keyCol, expectedItemsPerFile, 0L)
      .coalesce(1)
      .write.mode("overwrite").parquet(sidecarDir(tableDir, keyCol))

  /** The table's live data files (skips `_`/`.` metadata entries). */
  private def liveDataFiles(spark: SparkSession,
      tableDir: String): Set[String] = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(tableDir)).iterator
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))
      .map(f => f.getPath.toUri.toString).toSet
  }

  // file uris from input_file_name() are file:///-style; normalize
  private def norm(u: String) =
    u.stripPrefix("file://").stripPrefix("file:")

  /** Incremental REFRESH after the table's file set changed (appends,
   * compaction, deletes): sketch ONLY files the sidecar doesn't cover
   * yet, keep covered rows verbatim (their `gen` tags prove it), drop
   * rows whose file vanished. Cost is O(new files' data + sidecar),
   * never O(table) — the maintain half every persisted artifact here
   * carries. */
  def refresh(spark: SparkSession, tableDir: String, keyCol: String,
      expectedItemsPerFile: Long = 100000L): Unit = {
    val fs = new Path(tableDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val liveFiles = liveDataFiles(spark, tableDir)
    val side = spark.read.parquet(sidecarDir(tableDir, keyCol))
    val covered = side.select("file").collect().map(_.getString(0)).toSet
    val coveredNorm = covered.map(norm)
    val liveNorm = liveFiles.map(norm)
    val added = liveFiles.filterNot(f => coveredNorm.contains(norm(f)))
    val kept = side.filter(col("file")
      .isin(covered.filter(f => liveNorm.contains(norm(f))).toSeq: _*))
    // coalesce: an empty sidecar (build over an empty table) has no max
    val maxGen = side.agg(coalesce(max(col("gen")), lit(0L)))
      .head().getLong(0)
    val fresh =
      if (added.isEmpty) kept
      else kept.unionByName(
        sketch(spark, added.toSeq, keyCol, expectedItemsPerFile,
          maxGen + 1))
    // stage-then-swap: Spark won't overwrite a path it is reading
    val stage = sidecarDir(tableDir, keyCol) + ".stage"
    fresh.coalesce(1).write.mode("overwrite").parquet(stage)
    val livePath = new Path(sidecarDir(tableDir, keyCol))
    fs.delete(livePath, true)
    require(fs.rename(new Path(stage), livePath), "sidecar swap failed")
  }

  /** Normalize the probe list against the sidecar's committed key type
   * (the type of its `mn`/`mx` stats). A probe whose RUNTIME type does
   * not match the indexed column would hash differently than the build
   * side (xxhash64 of a long hashes 8 bytes, of a string its UTF-8
   * bytes) — a silent-false-negative class — so mismatches fail loudly;
   * the one safe widening (Int probe on a long column) is applied. */
  private def normProbes(values: Seq[Any], keyType: DataType): Seq[Any] =
    values.distinct.map { v =>
      (keyType, v) match {
        case (LongType, x: Long)      => x
        case (LongType, x: Int)       => x.toLong
        case (IntegerType, x: Int)    => x
        case (StringType, x: String)  => x
        case _ => throw new IllegalArgumentException(
          s"skipping-index probe $v (${v.getClass.getSimpleName}) does " +
            s"not match the indexed key type $keyType — it would hash " +
            "differently than the build side and silently miss rows")
      }
    }

  /** The per-sidecar-row "might this file hold a probe" predicate:
   * range-filter the literal probe array against the row's [mn, mx],
   * probe the surviving hashes against the row's Bloom filter. Probe
   * hashing runs Catalyst's XxHash64 (the expression behind
   * `functions.xxhash64`, same default seed) driver-side over the
   * bounded probe list, so build and probe hashing are bit-identical —
   * for LONG keys (id lookups) and STRING keys (doc fingerprints, the
   * q91 dedup-ledger key shape) alike. All filter evaluation happens
   * executor-side; collecting the plan moves candidate file names,
   * never Bloom bytes (spec-pinned). */
  private def probeHit(values: Seq[Any],
      keyType: DataType): org.apache.spark.sql.Column = {
    val probes = normProbes(values, keyType)
    if (probes.isEmpty) return lit(false)
    val probeArr = array(probes.map(v => struct(lit(v).as("v"),
      lit(new XxHash64(Seq(Literal(v))).eval(null).asInstanceOf[Long])
        .as("h"))): _*)
    val inRange = filter(probeArr,
      p => p("v") >= col("mn") && p("v") <= col("mx"))
    size(inRange) > 0 && B.toColumn(BloomContainsAnyExpr(
      B.toExpression(col("bloom")),
      B.toExpression(transform(inRange, p => p("h")))))
  }

  def candidateFilesDF(spark: SparkSession, tableDir: String,
      keyCol: String, values: Seq[Any]): DataFrame = {
    val side = spark.read.parquet(sidecarDir(tableDir, keyCol))
    side.filter(probeHit(values, side.schema("mn").dataType))
      .select(col("file"))
  }

  /** ONE pass over the sidecar serving both questions a lookup asks:
   * which files are covered at all, and which are candidates. Collects
   * (file name, flag) rows only — never Bloom bytes. Also returns the
   * sidecar's key type for the residual predicate. */
  private def coverageAndCandidates(spark: SparkSession,
      tableDir: String, keyCol: String, values: Seq[Any])
      : (Set[String], Seq[String], DataType) = {
    val side = spark.read.parquet(sidecarDir(tableDir, keyCol))
    val keyType = side.schema("mn").dataType
    val rows = side
      .select(col("file"), probeHit(values, keyType).as("cand"))
      .collect()
    (rows.iterator.map(r => norm(r.getString(0))).toSet,
      rows.iterator.filter(_.getBoolean(1)).map(_.getString(0))
        .toSeq.sorted,
      keyType)
  }

  /** The files a lookup of `values` must scan per the SIDECAR:
   * range-covered AND Bloom-positive. Exposed so specs/soaks can
   * assert the actual pruning, not a plan string. */
  def candidateFiles(spark: SparkSession, tableDir: String,
      keyCol: String, values: Seq[Any]): Seq[String] =
    candidateFilesDF(spark, tableDir, keyCol, values)
      .collect().map(_.getString(0)).toSeq.sorted

  /** Point lookup through the sidecar: scan only candidate files plus
   * any live file the sidecar does not cover yet (appended since the
   * last build/refresh — scanned unpruned rather than silently
   * dropped), then apply the exact predicate (removes Bloom false
   * positives — results are exact, the sidecar only decides WHICH
   * covered files to read). */
  def lookup(spark: SparkSession, tableDir: String, keyCol: String,
      values: Seq[Any]): DataFrame = {
    val (coveredNorm, cands, keyType) =
      coverageAndCandidates(spark, tableDir, keyCol, values)
    val uncovered = liveDataFiles(spark, tableDir)
      .filterNot(f => coveredNorm.contains(norm(f))).toSeq.sorted
    val files = cands ++ uncovered
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else
      spark.read.parquet(files: _*)
        .filter(col(keyCol).isin(normProbes(values, keyType): _*))
  }

  /** CONJUNCTIVE multi-column lookup: predicates on several indexed
   * columns AND-ed together. A file is skipped the moment ANY column's
   * sidecar proves its conjunct absent (range-miss or Bloom-negative) —
   * sound for conjunctions, and the per-file stats of every indexed
   * column compose exactly like Delta/Iceberg skipping stats. Per
   * column the file set to scan is its candidates plus the files that
   * sidecar doesn't cover (those it cannot rule out); the conjunctive
   * scan set is the INTERSECTION. Exact residual predicate as in
   * [[lookup]]. */
  def lookupAll(spark: SparkSession, tableDir: String,
      preds: Seq[(String, Seq[Any])]): DataFrame = {
    require(preds.nonEmpty, "lookupAll: no predicates")
    val live = liveDataFiles(spark, tableDir)
    val liveByNorm = live.iterator.map(f => norm(f) -> f).toMap
    val perCol = preds.map { case (c, vs) =>
      val (coveredNorm, cands, keyType) =
        coverageAndCandidates(spark, tableDir, c, vs)
      // scan set: candidates plus the files this column's sidecar
      // never covered (it cannot rule those out); residual: the exact
      // typed conjunct
      (cands.map(norm).toSet ++
        liveByNorm.keySet.filterNot(coveredNorm.contains),
        col(c).isin(normProbes(vs, keyType): _*))
    }
    val files = perCol.map(_._1).reduce(_ intersect _).toSeq.sorted
      .flatMap(liveByNorm.get)
    val residual = perCol.map(_._2).reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(residual)
  }
}
