package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Volume soak for the Structured Streaming operators: 2M synthetic events
 * over 20k users, written as time-ordered parquet files and streamed in
 * MULTIPLE micro-batches (`maxFilesPerTrigger`) so state genuinely
 * carries across batches — the thing the sf-gate's single-batch runs
 * can't exercise. Each stateful pipeline (tumbling windows, session
 * windows, stream-stream attribution, custom flatMapGroupsWithState)
 * runs to completion; the soak asserts the streaming result EQUALS the
 * batch restatement on the same data (windows/attribution/custom state),
 * and prints wall times.
 *
 * Usage: runMain graft.tools.StreamSoak [nEvents]
 */
object StreamSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = 1700000000000000L // epoch µs
    // 20k users × ~100 steps of 20 min (+0-40 min jitter): per-user gaps
    // range 0-60 min, so SOME exceed the 30-min session gap but none the
    // 90-min mid-stream timeout horizon (watermark 1h + inactivity 30m) —
    // custom state times out exactly once per silenced user. Event type
    // varies WITHIN a user (the step index enters the selector — a
    // user-periodic selector would give every user one constant type).
    // A quarter of users go silent at half-time → real state timeouts.
    val m = expr("id div 20000") // step index
    val events = spark.range(n)
      .filter(expr("NOT (id % 20000 % 4 = 0 AND id div 20000 >= 50)"))
      .select(
        col("id").as("event_id"),
        (col("id") % 20000).as("user_id"),
        timestamp_micros(lit(base) + m.cast("long") * 1200000000L +
          pmod(col("id") * 2654435761L, lit(2400000L)) * 1000L).as("ts"),
        element_at(
          array(lit("click"), lit("view"), lit("click"), lit("purchase"),
            lit("error")),
          (pmod(m * 7 + col("id") * 3, lit(5)) + 1).cast("int"))
          .as("event_type"),
        (pmod(col("id") * 7919L, lit(10000L)).cast("double") / 100.0)
          .as("value"))

    val dir = Files.createTempDirectory("stream_soak").toString
    // range-partition by ts → 16 files in event-time order, then stamp
    // ASCENDING mtimes in range order: the file source schedules batches
    // by modification time, and a shared mtime lets later time-ranges
    // process first — their watermark would turn the earlier ranges into
    // dropped late data. This models a live in-order feed.
    events.repartitionByRange(16, col("ts"))
      .write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
      .zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 10000L)
      }
    val batch = spark.read.parquet(dir).cache()
    batch.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    def runStream(name: String, transform: DataFrame => DataFrame)
        : DataFrame = {
      val out = Files.createTempDirectory(s"soak_${name}_out").toString
      val cp = Files.createTempDirectory(s"soak_${name}_cp").toString
      val src = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 4).parquet(dir)
      val q = transform(src)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out)
    }

    def assertEqual(label: String, got: DataFrame, want: DataFrame): Unit = {
      val extraDf = got.exceptAll(want)
      val missingDf = want.exceptAll(got)
      val extra = extraDf.count()
      val missing = missingDf.count()
      if (extra != 0 || missing != 0) {
        println(s"-- $label extra rows (streaming only):")
        extraDf.orderBy(extraDf.columns.map(col): _*).show(8, false)
        println(s"-- $label missing rows (batch only):")
        missingDf.orderBy(missingDf.columns.map(col): _*).show(8, false)
      }
      assert(extra == 0 && missing == 0,
        s"$label: streaming vs batch diverged (extra=$extra missing=$missing)")
      println(s"== $label: ${got.count()} rows ≡ batch restatement")
    }

    import graft.streaming.EventStream

    // ---- tumbling hourly windows across ~4 micro-batches
    val hs = timed("hourly stats (stream, multi-batch)")(
      runStream("hourly", ev => EventStream.hourlyStats(ev, "1 hour")))
    val mx = batch.agg(max(unix_millis(col("ts")))).head.getLong(0)
    val wmMs = mx - 3600000L
    val hsBatch = batch
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Exact.dsum(col("value")).as("sum_value"))
      .filter(unix_millis(col("hour_start")) + 3600000L <= wmMs)
    assertEqual("hourly ≡ batch (finalized windows)", hs, hsBatch)

    // ---- stream-stream attribution across micro-batches
    val at = timed("attribution (stream-stream join, multi-batch)")(
      runStream("attr", ev =>
        EventStream.attribution(ev, "click", "purchase",
          horizon = "1 hour", watermark = "4 hours")))
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("from_id"),
        col("user_id"), unix_micros(col("ts")).as("a_us"))
    val purch = batch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("to_id"),
        col("user_id").as("u2"), unix_micros(col("ts")).as("b_us"),
        col("value"))
    val atBatch = clicks.join(purch,
        col("user_id") === col("u2") && col("b_us") >= col("a_us") &&
          col("b_us") - col("a_us") <= 3600000000L)
      .select(col("user_id"), col("from_id"), col("to_id"),
        (col("b_us") - col("a_us")).as("lag_us"), col("value"))
    assertEqual("attribution ≡ batch interval join", at, atBatch)

    // ---- custom keyed state across micro-batches
    val iu = timed("custom state (flatMapGroupsWithState, multi-batch)")(
      runStream("inactive", ev =>
        EventStream.inactiveUserSummary(ev,
          inactivityMs = 30L * 60 * 1000, watermark = "1 hour").toDF()))
    val iuBatch = batch.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"),
        max(unix_micros(col("ts"))).as("last_us"))
      .filter(expr("last_us div 1000") + 1800000L < wmMs)
      .select(col("user_id"), col("n_events"), col("sum_value"),
        expr("last_us div 1000000").as("last_epoch"))
    assertEqual("custom state ≡ batch timeout restatement", iu, iuBatch)

    // ---- session windows: structural checks at volume (the exact batch
    // restatement is the sf-gate's q36 oracle; here sessions span
    // micro-batch boundaries, so assert shape: sessions per user ≥ 1,
    // events conserved for finalized users)
    val ss = timed("session windows (stream, multi-batch)")(
      runStream("sessions", ev => EventStream.sessions(ev, "30 minutes",
        "1 hour")))
    val nSessions = ss.count()
    val nUsers = ss.select(col("user_id")).distinct().count()
    assert(nSessions >= nUsers && nUsers > 0,
      s"sessions: $nSessions sessions over $nUsers users")
    println(s"== sessions: $nSessions finalized sessions over $nUsers users")

    // ---- bucketed streaming upsert (q56's machinery): per-batch cost
    // bounded by the TOUCHED buckets, not total state — AND the state
    // survives a driver loss. Phase 1 builds a 20k-key state over 4
    // micro-batches, then the driver "crashes": the State object is
    // discarded and a fresh one reattaches via the per-batch _manifest
    // (BucketedUpsert.recover). Phase 2 resumes from the SAME streaming
    // checkpoint with 8 hot-key batches, each touching only 4 keys → ≤4
    // of 64 buckets. The metrics assert the post-recovery merge READ
    // stays ~state/16 per batch while the view holds all 20k keys, and
    // the final recovered view equals the batch argmax restatement over
    // the whole feed — the kill/recover hash proof.
    locally {
      val upDir = Files.createTempDirectory("soak_upsert_src").toString
      val cpDir = Files.createTempDirectory("soak_upsert_cp").toString
      val nKeys = 20000L
      def feedRow(idExpr: Column, userExpr: Column, step: Long) = Seq(
        idExpr.as("event_id"), userExpr.as("user_id"),
        (lit(base) + lit(step) * 60000000L + idExpr % 1000L).as("us"),
        element_at(array(lit("click"), lit("view"), lit("purchase")),
          (pmod(idExpr, lit(3)) + 1).cast("int")).as("event_type"),
        (pmod(idExpr * 7919L, lit(10000L)).cast("double") / 100.0)
          .as("value"))
      // phase 1: 5 events per key over 20k keys, 4 files
      spark.range(nKeys * 5)
        .select(feedRow(col("id"), col("id") % nKeys, 0): _*)
        .repartition(4).write.mode("overwrite").parquet(upDir)
      val schema = spark.read.parquet(upDir).schema
      val payload = Seq("us", "event_id", "event_type", "value")
      def runStream(st: graft.streaming.BucketedUpsert.State): Unit = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(upDir)
          .writeStream.trigger(Trigger.AvailableNow())
          .option("checkpointLocation", cpDir)
          .foreachBatch { (b: DataFrame, id: Long) => st.merge(b, id) }
          .start()
        q.awaitTermination()
      }
      val state = new graft.streaming.BucketedUpsert.State(spark,
        keyCol = "user_id", payloadCols = payload,
        nBuckets = 64, collectMetrics = true)
      timed("bucketed upsert phase 1 (4 micro-batches, 20k keys)") {
        runStream(state)
      }
      // driver loss: the State (and its in-memory pointer map) is gone;
      // only the state root's files + committed _manifest survive
      val stateRoot = state.rootDir
      // phase 2: 8 single-file batches over 4 hot keys only
      (0 until 8).foreach { i =>
        val tmp = Files.createTempDirectory(s"soak_upsert_b$i").toString
        spark.range(200)
          .select(feedRow(col("id") + 200000L + i * 1000L,
            col("id") % 4L, 10L + i): _*)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.startsWith("part-")).get
        val dst = java.nio.file.Path.of(upDir, f"zbatch-$i%02d.parquet")
        Files.move(part.toPath, dst)
        // deterministic pickup order for the resumed source listing
        dst.toFile.setLastModified(
          System.currentTimeMillis() + i * 10000L)
      }
      val recovered = graft.streaming.BucketedUpsert.recover(spark,
        keyCol = "user_id", payloadCols = payload,
        nBuckets = 64, stateRoot = stateRoot, collectMetrics = true)
      timed("bucketed upsert phase 2 (recovered state, 8 hot batches)") {
        runStream(recovered)
      }
      recovered.metrics.foreach { m =>
        println(s"   batch ${m.batchId}: touched=${m.touchedBuckets}/64 " +
          s"stateRowsRead=${m.stateRowsRead} wall=${m.wallMs}ms")
      }
      val hot = recovered.metrics
      assert(hot.nonEmpty && hot.forall(_.touchedBuckets <= 4),
        s"hot batches touched more than their 4 key buckets: $hot")
      assert(hot.forall(_.stateRowsRead < nKeys / 8),
        s"hot-batch merge read should be bounded by touched buckets " +
          s"(~state/16), not the $nKeys-key state: $hot")
      val feed = spark.read.parquet(upDir)
      val wantView = feed.groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.us"), col("m.event_id"),
          col("m.event_type"), col("m.value"))
      assertEqual("recovered upsert view ≡ batch argmax",
        recovered.view(spark).select(col("user_id"), col("us"),
          col("event_id"), col("event_type"), col("value")),
        wantView)

      // ---- targeted delete (q93's machinery) at volume: a compliance
      // forget-request is KEY-scale (a handful of users), and its cost
      // must be bucket-scale — 8 victims live in ≤8 of 64 buckets, so
      // the delete reads ≤8/64 of the 20k-key state and rewrites only
      // those buckets; the other 56+ carry by pointer untouched.
      val mBefore = recovered.metrics.size
      val victims = spark.range(8)
        .select((col("id") * 2311L + 5L).as("user_id"))
      timed("targeted delete of 8/20000 keys") {
        recovered.delete(victims, 9000L)
      }
      val dm = recovered.metrics.drop(mBefore).head
      println(s"   delete: touched=${dm.touchedBuckets}/64 " +
        s"stateRowsRead=${dm.stateRowsRead} wall=${dm.wallMs}ms")
      assert(dm.touchedBuckets <= 8,
        s"delete touched more than its 8 key buckets: $dm")
      assert(dm.stateRowsRead < nKeys / 4,
        s"delete read should be bounded by touched buckets: $dm")
      val after = recovered.view(spark)
      assert(after.join(victims, Seq("user_id"), "left_semi").count() == 0,
        "deleted keys survive in the view")
      assertEqual("post-delete view ≡ batch argmax minus victims",
        after.select(col("user_id"), col("us"), col("event_id"),
          col("event_type"), col("value")),
        wantView.join(victims, Seq("user_id"), "left_anti"))

      // ---- time travel + retention vacuum (q95/q96 machinery) at
      // volume: a history-retaining store commits 10 versions over the
      // same 20k-key feed (every merge supersedes most buckets, so the
      // history holds ~10× the live state), a MID-HISTORY version must
      // read back exactly as its cumulative recompute, and the vacuum
      // that drops all but the newest two versions is METADATA-ONLY —
      // its wall is manifest parsing + deletes, independent of the 100k
      // rows of state data, and the live view is untouched.
      val slices = 10
      val hist = new graft.streaming.BucketedUpsert.State(spark,
        keyCol = "user_id", payloadCols = payload, nBuckets = 64,
        retainHistory = true)
      timed(s"history store: $slices merges, every version retained") {
        (0 until slices).foreach { i =>
          hist.merge(feed.filter(
            pmod(col("event_id"), lit(slices)) === i), i.toLong)
        }
      }
      assert(hist.history() == (1L to slices.toLong),
        s"expected $slices retained versions, got ${hist.history()}")
      val want5 = feed.filter(pmod(col("event_id"), lit(slices)) < 5)
        .groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.us"), col("m.event_id"),
          col("m.event_type"), col("m.value"))
      assertEqual("readAsOf(5) ≡ cumulative argmax of slices 0-4",
        hist.readAsOf(spark, 5L).select(col("user_id"), col("us"),
          col("event_id"), col("event_type"), col("value")),
        want5)
      val vrep = timed("vacuum to newest 2 versions (metadata-only)") {
        hist.vacuum(retainPrior = 1)
      }
      println(s"   vacuum: dropped ${vrep.droppedManifests} manifests, " +
        s"deleted ${vrep.deletedDirs} bucket dirs, kept ${vrep.keptDirs}")
      assert(vrep.droppedManifests == slices - 2 && vrep.deletedDirs > 0,
        s"vacuum reclaimed nothing: $vrep")
      assertEqual("post-vacuum live view ≡ batch argmax",
        hist.view(spark).select(col("user_id"), col("us"),
          col("event_id"), col("event_type"), col("value")),
        wantView)
      val vrep2 = hist.vacuum(retainPrior = 1)
      assert(vrep2.droppedManifests == 0 && vrep2.deletedDirs == 0,
        s"vacuum re-run was not a no-op: $vrep2")
    }

    println(f"== soak OK: n=$n")
    spark.stop()
  }
}
