package graft.tools

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Volume soak for the persisted sketch store (q82-q87): 2M synthetic
 * events over 64 days, store bootstrapped from the first 48, the rest
 * ingested as day-clustered micro-batches through the replay-guarded
 * [[graft.operators.SketchStore.ingestBatch]] — including LATE data
 * re-feeding two old days. What the sf-gate can't show and this
 * measures:
 *
 *  - per-batch upsert I/O is bounded by the batch's TOUCHED days: the
 *    soak byte-compares every day partition across each batch and
 *    asserts exactly the touched-day files changed while the other
 *    ~60 day partitions stay byte-identical;
 *  - replaying an already-committed batch id is a byte-level no-op
 *    (the foreachBatch replay contract);
 *  - [[graft.operators.SketchStore.serveRange]] physically reads only
 *    the in-range day FILES (scan metrics, the AnnSoak check that once
 *    caught dynamic pruning silently degrading);
 *  - after all batches, the incrementally-ingested store serves
 *    identically to build(everything): exact columns equal, HLL
 *    estimate inside its gated band.
 *
 * Usage: runMain graft.tools.SketchSoak [nEvents]
 */
object SketchSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    require(n >= 64000, s"soak needs >=1k events/day over 64 days (n=$n)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val base = 1700006400000000L // epoch µs, midnight UTC
    val dayUs = 86400000000L
    // n events dealt uniformly over 64 days, 50k users; value in cents
    // domain; event type varies with both id and day
    val all = spark.range(n).select(
      (col("id") % 64).as("__day"),
      element_at(
        array(lit("click"), lit("view"), lit("purchase"), lit("error")),
        (pmod(xxhash64(col("id")), lit(4)) + 1).cast("int"))
        .as("event_type"),
      timestamp_micros(lit(base) + (col("id") % 64) * dayUs +
        pmod(col("id") * 2654435761L, lit(dayUs))).as("ts"),
      (col("id") % 50000).as("user_id"),
      (pmod(col("id") * 7919L, lit(1000000L)).cast("double") / 100.0)
        .as("value"))

    def ofDays(days: Seq[Int]): DataFrame =
      all.filter(col("__day").isin(days: _*)).drop("__day")

    // the late sliver (every 199th event of two old days) is WITHHELD
    // from the bootstrap build and arrives with batch 0 instead — real
    // late data, not a double-feed
    val lateSliver = col("__day").isin(3, 17) && col("id") % 199 === 0
    val root = timed("build store from days 0..47 (late sliver withheld)") {
      graft.operators.SketchStore.build(
        all.filter(col("__day") < 48 && !lateSliver).drop("__day"))
    }

    def dayFiles(): Map[String, Array[Byte]] = {
      val walk = Files.walk(Path.of(root, "days"))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala
          .filter(f => Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.readAllBytes(f)).toMap
      } finally walk.close()
    }

    // 8 day-clustered batches over days 48..63; the first also re-feeds
    // two OLD days with a late sliver (every 199th event) — the
    // backfill shape
    var batchId = 0L
    for (b <- 0 until 8) {
      val fresh = Seq(48 + 2 * b, 49 + 2 * b)
      val batch =
        if (b == 0) ofDays(fresh).unionByName(
          all.filter(lateSliver).drop("__day"))
        else ofDays(fresh)
      val touched = if (b == 0) fresh ++ Seq(3, 17) else fresh
      val before = dayFiles()
      timed(s"ingest batch $b (days ${touched.mkString(",")})") {
        graft.operators.SketchStore.ingestBatch(spark, root, batch, batchId)
      }
      val after = dayFiles()
      val changedDays = (before.keySet ++ after.keySet)
        .filter(f =>
          !java.util.Arrays.equals(before.getOrElse(f, Array.emptyByteArray),
            after.getOrElse(f, Array.emptyByteArray)))
        .flatMap(f => "day=([0-9-]+)".r.findFirstMatchIn(f).map(_.group(1)))
      val wantDays = touched.map(d =>
        java.time.Instant.ofEpochSecond(0).plusMillis(base / 1000)
          .plus(java.time.Duration.ofSeconds(d * 86400L))
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString).toSet
      assert(changedDays == wantDays,
        s"batch $b rewrote days $changedDays, expected $wantDays")
      val untouchedCount = after.keys.count(f =>
        !wantDays.exists(d => f.contains(s"day=$d")))
      println(s"==   rewrote ${changedDays.size}/${48 + 2 * b + 2} day " +
        s"partitions; $untouchedCount untouched files byte-identical")
      batchId += 1
    }

    // replay of a committed batch id is a byte-level no-op
    val beforeReplay = dayFiles()
    graft.operators.SketchStore.ingestBatch(spark, root, ofDays(Seq(60, 61)),
      batchId - 2)
    val afterReplay = dayFiles()
    assert(beforeReplay.keySet == afterReplay.keySet &&
      beforeReplay.forall { case (f, bs) =>
        java.util.Arrays.equals(bs, afterReplay(f)) },
      "replayed batch id mutated the store")
    println("== replay of committed batch id: byte-level no-op OK")

    // range serve physically reads only the in-range day files
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    def d(i: Int) = java.sql.Date.valueOf(
      java.time.Instant.ofEpochSecond(0).plusMillis(base / 1000)
        .plus(java.time.Duration.ofSeconds(i * 86400L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
    val ranged = graft.operators.SketchStore.serveRange(spark, root,
      d(8), d(15))
    ranged.collect() // collect, not count: metrics must land on THIS plan
    val scan = scans(ranged.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.mkString.contains("days")).get
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = dayFiles().size
    println(s"== range serve (8/64 days): read $filesRead/$totalFiles files")
    assert(totalFiles == 64,
      s"store holds $totalFiles files for 64 days — want ONE per day")
    assert(filesRead == 8,
      s"range serve read $filesRead of $totalFiles files — pruning lost")

    // the incrementally-ingested store serves ≡ build(everything)
    val fullRoot = timed("rebuild from scratch (reference)") {
      graft.operators.SketchStore.build(all.drop("__day"))
    }
    val got = graft.operators.SketchStore.serve(spark, root)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = graft.operators.SketchStore.serve(spark, fullRoot)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet, "event_type sets differ")
    got.foreach { case (t, (days, rows, est)) =>
      val (wDays, wRows, wEst) = want(t)
      assert(days == wDays && rows == wRows,
        s"$t: exact columns ($days,$rows) != rebuild ($wDays,$wRows)")
      assert(math.abs(est - wEst) <= math.max(4L, wEst / 20),
        s"$t: HLL estimate $est outside band around rebuild $wEst")
    }
    println(s"== serve ≡ rebuild over ${want.size} types " +
      "(exact cols equal, HLL in band)")

    // ---- compaction (q87): tier the 48 cold days to month grain ----
    // the serve must be IDENTICAL (exact cols + HLL bit-equal — union
    // is register-max, max is associative), the 16 hot day files byte-
    // untouched, and the store's file count collapses 64 → 16 + months
    val preCompact = graft.operators.SketchStore.serve(spark, root)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val hotBefore = dayFiles().filter { case (f, _) =>
      (48 until 64).exists(i => f.contains(s"day=${d(i)}")) }
    assert(hotBefore.size == 16)
    timed("compact days 0..47 -> month tier") {
      graft.operators.SketchStore.compact(spark, root, d(48))
    }
    val dayAfter = dayFiles()
    hotBefore.foreach { case (f, bytes) =>
      assert(dayAfter.contains(f) &&
        java.util.Arrays.equals(dayAfter(f), bytes),
        s"compaction touched hot day file $f")
    }
    assert(dayAfter.size == 16,
      s"day tier holds ${dayAfter.size} files post-compaction, want 16")
    val monthFiles = {
      val walk = Files.walk(Path.of(root, "months"))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.count(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
      } finally walk.close()
    }
    println(s"== compaction: 64 files -> 16 hot days + $monthFiles " +
      "month files (one per cold month)")
    assert(monthFiles <= 3, s"$monthFiles month files for ~2 cold months")
    val postCompact = graft.operators.SketchStore.serve(spark, root)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(postCompact == preCompact,
      "compaction changed the serve (exact cols or HLL estimate)")
    println("== post-compaction serve bit-identical " +
      s"over ${postCompact.size} types")
    spark.stop()
  }
}
