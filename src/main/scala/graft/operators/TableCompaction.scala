package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Size-aware small-file compaction for a partitioned parquet table — the
 * data-lake OPTIMIZE operation. Long-running ingest (streaming sinks,
 * frequent incremental maintains) accretes many small files per
 * partition; at 100 TB that debt dominates scan cost (per-file open +
 * footer read + a task per tiny split) long before data volume does.
 *
 * Spark-first design:
 *  - PLAN from file metadata only: list each `part=`-style leaf dir,
 *    sum its data-file sizes; a partition is in debt when its file
 *    count exceeds ceil(bytes / targetBytes). No data is read to
 *    decide. (This is the engine-side half of what table formats keep
 *    in their manifests; on raw parquet the listing IS the manifest.)
 *  - REWRITE every debt partition in ONE job — not a job per partition
 *    (a driver loop over thousands of partitions schedules thousands
 *    of tiny jobs): read only the touched partition dirs, assign each
 *    row a file slot `pmod(xxhash64(cols), targetFiles(partition))`
 *    via a broadcast of the (bounded, driver-side) plan, shuffle on
 *    (partition, slot), and write `partitionBy(partCol)` — each
 *    partition lands in at most its targetFiles output files.
 *  - GUARD before swapping: the slot join matches rows to the plan by
 *    the dir-name-derived partition value vs `cast(partCol as string)`;
 *    if the two representations ever diverge (Hive-escaped specials,
 *    `__HIVE_DEFAULT_PARTITION__`, timestamp formatting) rows would
 *    silently vanish from the rewrite. So: an unmatched row RAISES in
 *    the rewrite job itself (`raise_error`, names the culprit value),
 *    and the staged row count — observed in-flight on the source side,
 *    footer-counted on the staged side — must equal the source before
 *    any partition is swapped. Loss fails loudly; it cannot install.
 *  - SWAP per partition behind a stage: the rewrite goes to a sibling
 *    stage dir; each touched partition dir is then renamed out to a
 *    `.bak` name and the staged one renamed in. A crash mid-stage
 *    leaves the live table untouched. A crash BETWEEN the two renames
 *    leaves that one partition ABSENT from live reads until its
 *    dot-prefixed `.bak` dir is renamed back — the data is never lost,
 *    but the honest contract is "old data, new data, or a manual
 *    .bak restore for the one partition mid-swap", not "always one of
 *    the two" (two dir renames cannot be made atomic together on a
 *    filesystem API).
 *  - Partitions already within target are never read, rewritten, or
 *    renamed — their files stay byte-identical (spec-pinned).
 *  - A compacted partition's `_skip_*` sidecars ([[SkippingIndex]])
 *    vanish with the swapped-out dir BY DESIGN (every covered file is
 *    gone; stale skipping would be silent wrong results). With
 *    `rebuildSkipIndexes = true` the same call re-runs
 *    `SkippingIndex.build` per swapped partition for exactly the key
 *    columns that were covered before, restoring coverage atomically
 *    with the compaction instead of leaving it to the caller.
 *
 * The reference has no counterpart (its sink writes once, per dump —
 * /root/reference/src/main/java/org/gcd/etl/Main.java:380-513); this is
 * the operation its 2M-rows-per-file K1 contract grows into when the
 * table is maintained instead of rewritten.
 */
object TableCompaction {

  /** One partition's layout debt: current files vs the size-derived
   * target. */
  final case class PartitionPlan(partDir: String, partValue: String,
      nFiles: Int, bytes: Long, targetFiles: Int) {
    def inDebt: Boolean = nFiles > targetFiles
  }

  final case class Report(touched: Seq[PartitionPlan], skipped: Int)

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Array[FileStatus] =
    fs.listStatus(dir).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Metadata-only compaction plan over `root`'s `<partCol>=<v>` leaf
   * dirs. */
  def plan(spark: SparkSession, root: String, partCol: String,
      targetBytes: Long): Seq[PartitionPlan] = {
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(root)).toSeq
      .filter(d => d.isDirectory &&
        d.getPath.getName.startsWith(s"$partCol="))
      .map { d =>
        val files = dataFiles(fs, d.getPath)
        val bytes = files.map(_.getLen).sum
        val target = math.max(1L,
          (bytes + targetBytes - 1) / targetBytes).toInt
        PartitionPlan(d.getPath.toString,
          d.getPath.getName.stripPrefix(s"$partCol="),
          files.length, bytes, target)
      }
  }

  /** Compact every in-debt partition of `root`; returns what was
   * rewritten. Clean partitions are untouched (not even read). */
  def compact(spark: SparkSession, root: String, partCol: String,
      targetBytes: Long, rebuildSkipIndexes: Boolean = false): Report = {
    val plans = plan(spark, root, partCol, targetBytes)
    val touched = plans.filter(_.inDebt)
    if (touched.isEmpty) return Report(Nil, plans.size)

    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val stage = new Path(s"$root.compact")
    fs.delete(stage, true)

    // one job over the touched partitions only; basePath keeps the
    // partition column in the schema
    val df = spark.read.option("basePath", root)
      .parquet(touched.map(_.partDir): _*)
    val dataCols = df.columns.filterNot(_ == partCol)
    // bounded broadcast: (partition value, target file count) — one row
    // per TOUCHED partition, the same driver-side-scalar shape as the
    // store operators' touched-bucket lists
    val targets = spark.createDataFrame(
        touched.map(p => (p.partValue, p.targetFiles)))
      .toDF("__pv", "__nf")
    // LEFT join + per-row raise: a partition-value representation the
    // dir-name plan doesn't match fails the rewrite job with the
    // culprit value instead of silently dropping the row
    val obs = org.apache.spark.sql.Observation("compact_src")
    val slotted = df
      .withColumn("__pv", col(partCol).cast("string"))
      .join(broadcast(targets), Seq("__pv"), "left")
      .withColumn("__nf", when(col("__nf").isNull,
          raise_error(concat(
            lit("compact: partition value unmatched by plan: "),
            col("__pv"))).cast("int"))
        .otherwise(col("__nf")))
      .observe(obs, count(lit(1)).as("rows"))
      .withColumn("__slot",
        pmod(xxhash64(dataCols.map(col).toIndexedSeq: _*), col("__nf")))
    slotted
      .repartition(touched.map(_.targetFiles).sum,
        col(partCol), col("__slot"))
      .select((dataCols :+ partCol).map(col).toIndexedSeq: _*)
      .write.mode("overwrite").partitionBy(partCol)
      .parquet(stage.toString)
    // row-conservation gate before ANY swap: source rows observed
    // in-flight vs staged rows (parquet footer counts — metadata read)
    val srcRows = obs.get("rows").asInstanceOf[Long]
    val stagedRows = spark.read.parquet(stage.toString).count()
    require(stagedRows == srcRows,
      s"compact: staged rewrite has $stagedRows rows, source had " +
        s"$srcRows — refusing to swap")

    touched.foreach { p =>
      val live = new Path(p.partDir)
      val bak = new Path(live.getParent, s".${live.getName}.bak")
      val staged = new Path(stage, live.getName)
      require(fs.exists(staged), s"stage missing ${live.getName}")
      // key columns whose _skip_* sidecars the swap retires, with the
      // partition's total key rows (the sidecars record per-file rows):
      // the rebuilt Bloom filters must be sized for rows/targetFiles —
      // compacted files hold far more keys than the pre-compaction
      // ones, and the operator's 100k default would silently saturate
      // (fpp → 1, pruning gone) on multi-million-row output files
      val skipCols: Seq[(String, Long)] =
        if (!rebuildSkipIndexes) Nil
        else fs.listStatus(live).toSeq
          .filter(d => d.isDirectory &&
            d.getPath.getName.startsWith("_skip_"))
          .map { d =>
            val total = spark.read.parquet(d.getPath.toString)
              .agg(coalesce(sum(col("rows")), lit(0L)))
              .head().getLong(0)
            (d.getPath.getName.stripPrefix("_skip_"), total)
          }
      fs.delete(bak, true)
      require(fs.rename(live, bak), s"cannot stage out $live")
      require(fs.rename(staged, live), s"cannot install $live")
      fs.delete(bak, true)
      skipCols.foreach { case (k, total) =>
        val perFile = math.max(1L,
          (total + p.targetFiles - 1) / p.targetFiles)
        SkippingIndex.build(spark, p.partDir, k,
          expectedItemsPerFile = perFile)
      }
    }
    fs.delete(stage, true)
    Report(touched, plans.size - touched.size)
  }
}
