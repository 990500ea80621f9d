package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for [[graft.operators.TableCompaction]] — the q90 gate at
 * a file-count scale where the small-file economics are visible: 2M
 * rows across 60 day partitions, written in 32 files per day (the debt
 * a streaming sink or per-dump incremental maintain accretes), plus a
 * handful of days already compact. Measures:
 *
 *  - plan cost is metadata-only (no Spark job — wall under a second
 *    against ~2k files);
 *  - file collapse (debt days: 32 → size-derived target) and the
 *    post-compaction scan speedup on a day-pruned aggregate;
 *  - clean partitions byte-untouched (the partition-pruned-rewrite
 *    contract at volume);
 *  - idempotence: the second compact plans zero touched partitions.
 *
 * Usage: runMain graft.tools.CompactSoak [nRows]
 */
object CompactSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.sources.Scratch.dir("compact_soak") + "/t"
    val nDays = 60
    // 55 debt days × 32 files + 5 clean days × 1 file
    val df = spark.range(n).select(
      col("id"),
      (col("id") % nDays).cast("int").as("day"),
      (col("id") % 9973).as("user_id"),
      (col("id") % 7).cast("double").as("value"),
      md5(col("id").cast("string")).as("payload"))
    df.filter(col("day") < nDays - 5)
      .repartition(32).write.partitionBy("day").parquet(root)
    df.filter(col("day") >= nDays - 5)
      .coalesce(1).write.mode("append").partitionBy("day").parquet(root)

    def totalFiles(): Int =
      new File(root).listFiles().filter(_.isDirectory)
        .map(_.listFiles().count(f => f.isFile &&
          f.getName.endsWith(".parquet"))).sum
    def cleanDayFiles(): Seq[(String, Long, Long)] =
      new File(root).listFiles()
        .filter(d => d.isDirectory &&
          d.getName.stripPrefix("day=").toInt >= nDays - 5)
        .flatMap(_.listFiles().filter(f => f.isFile &&
          f.getName.endsWith(".parquet")))
        .map(f => (f.getName, f.length, f.lastModified)).toSeq.sorted

    def prunedAgg(): (Double, Long) = {
      val t = System.nanoTime()
      val r = spark.read.parquet(root)
        .filter(col("day") === 7)
        .agg(count(lit(1)), sum(col("value"))).head()
      ((System.nanoTime() - t) / 1e9, r.getLong(0))
    }

    val filesBefore = totalFiles()
    val cleanBefore = cleanDayFiles()
    val (scanBefore, rowsB) = prunedAgg()

    val t0 = System.nanoTime()
    val plans = graft.operators.TableCompaction.plan(spark, root, "day",
      64L * 1024 * 1024)
    val tPlan = (System.nanoTime() - t0) / 1e9
    println(f"== compact: plan over ${plans.size} partitions / " +
      f"$filesBefore files in $tPlan%.2fs (metadata-only)")
    assert(tPlan < 5.0, "plan should be metadata-only fast")

    val t1 = System.nanoTime()
    val report = graft.operators.TableCompaction.compact(spark, root,
      "day", 64L * 1024 * 1024)
    val tCompact = (System.nanoTime() - t1) / 1e9
    val filesAfter = totalFiles()
    val (scanAfter, rowsA) = prunedAgg()
    println(f"== compact: ${report.touched.size} debt days rewritten, " +
      f"${report.skipped} clean days untouched; files $filesBefore -> " +
      f"$filesAfter, wall $tCompact%.1fs")
    println(f"== compact: day-pruned aggregate $scanBefore%.2fs -> " +
      f"$scanAfter%.2fs")
    assert(report.touched.size == nDays - 5 && report.skipped == 5)
    assert(filesAfter < filesBefore / 10,
      s"expected >10x file collapse, got $filesBefore -> $filesAfter")
    assert(cleanDayFiles() == cleanBefore, "clean day files were touched")
    assert(rowsA == rowsB)
    assert(spark.read.parquet(root).count() ==
      df.count(), "row loss through compaction")

    val again = graft.operators.TableCompaction.compact(spark, root,
      "day", 64L * 1024 * 1024)
    assert(again.touched.isEmpty && again.skipped == nDays,
      "second compact should be a planned no-op")
    println("== compact: idempotent (second run touched 0 partitions)")
    spark.stop()
  }
}
