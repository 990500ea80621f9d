package graft.operators

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/**
 * The persisted sketch store's three contracts:
 *   1. the SERVE plan reads the artifact alone (one scan, the sketch
 *      table — never the raw events);
 *   2. maintain(build(days<mid), days>=mid) ≡ build(all) on every
 *      deterministic column (exact counts per (type, day); HLL
 *      register state — hence estimates — depend only on the value
 *      set, so they match too; KLL is randomized and gates as a band);
 *   3. maintain is a pure partition APPEND — existing day files stay
 *      byte-identical (the k03 generation contract).
 */
class SketchStoreSpec extends SparkSpec {

  private def events(n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("t"), col("id") % 3).as("event_type"),
      (col("id") % 500).as("user_id"),
      ((col("id") % 1000).cast("double") / 4.0).as("value"),
      to_timestamp(from_unixtime(lit(1700000000L) +
        (col("id") % 7) * 86400 + col("id") % 3600)).as("ts"))

  test("a q86-shaped subset loop is self-retiring: repeated " +
      "build+ingest cycles hold <= 2 generations, the previous one " +
      "stays readable, the newest serves") {
    // the q86/s22 gates are deliberately uncached (their artifacts ride
    // this two-generation queue, which a cached root would break), so a
    // SPARK_GRAFT_ONLY subset containing only them must be bounded by
    // the queue's OWN retirement — no other gate's build runs to retire
    // for them (r14 verdict #5: pin the subset-run behavior)
    def cycle(): String = {
      val root = SketchStore.build(events(3000))
      SketchStore.ingestBatch(spark, root,
        events(4000).filter(col("user_id") % 7 === 0), batchId = 1L)
      root
    }
    val r1 = cycle()
    val r2 = cycle()
    // two live generations: a holder of r1's lazy serve plan still reads
    assert(Files.exists(Path.of(r1)) && Files.exists(Path.of(r2)))
    assert(SketchStore.serve(spark, r1).count() > 0)
    val r3 = cycle()
    assert(!Files.exists(Path.of(r1)),
      "two-generations-old (mutated) root not retired by the queue")
    assert(Files.exists(Path.of(r2)) && Files.exists(Path.of(r3)))
    assert(SketchStore.serve(spark, r3).count() > 0)
  }

  test("serve plan scans only the sketch artifact") {
    val root = SketchStore.build(events(5000))
    val p = SketchStore.serve(spark, root).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"serve should scan exactly the sketch table:\n$p")
    assert(p.contains("sketch_store"),
      s"serve's one scan should be the store artifact:\n$p")
  }

  test("maintain == rebuild on deterministic columns; base files byte-untouched") {
    val all = events(20000)
    val mid = to_date(to_timestamp(from_unixtime(lit(1700000000L) +
      4 * 86400)))
    val base = all.filter(to_date(col("ts")) < mid)
    val fresh = all.filter(to_date(col("ts")) >= mid)

    val fullRoot = SketchStore.build(all)
    // snapshot full-store rows BEFORE the second build retires roots
    val fullRows = SketchStore.table(spark, fullRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val fullServe = SketchStore.serve(spark, fullRoot)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet

    val incRoot = SketchStore.build(base)
    // record every base day file before the append
    def filesUnder(p: Path): Map[String, Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f)).toMap
      finally walk.close()
    }
    val before = filesUnder(Path.of(incRoot, "days"))
    SketchStore.maintain(incRoot, fresh)
    val after = filesUnder(Path.of(incRoot, "days"))
    before.foreach { case (f, bytes) =>
      assert(after.contains(f), s"maintain deleted base file $f")
      assert(java.util.Arrays.equals(after(f), bytes),
        s"maintain rewrote base file $f")
    }
    assert(after.size > before.size, "maintain appended no new day files")

    val incRows = SketchStore.table(spark, incRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(incRows == fullRows,
      "maintained artifact rows differ from full rebuild")
    val incServe = SketchStore.serve(spark, incRoot)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    assert(incServe == fullServe,
      "maintained serve rollup differs from full rebuild")
  }

  test("late-data upsert == rebuild; untouched day partitions byte-identical") {
    import scala.jdk.CollectionConverters._
    def filesUnder(p: Path): Map[String, Array[Byte]] = {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f)).toMap
      finally walk.close()
    }
    val all = events(20000)
    val days = all.select(to_date(col("ts")).as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    assert(days.length == 7)
    val lateFrom = days(5) // the upsert batch touches only days 5..6
    val late = all.filter(col("user_id") % 2 === 1 &&
      to_date(col("ts")) >= lit(lateFrom))
    val base = all.exceptAll(late)

    // exact columns must match the rebuild EXACTLY; HLL estimates only
    // inside the tolerance band — a sketch's estimate depends on its
    // construction path (the union path drops the HIP estimator), so
    // merged-from-partials vs single-pass differ by a few counts even
    // over identical rows (the q73 contract; KllSketch/HllMerge specs
    // pin the same)
    val fullRoot = SketchStore.build(all)
    val fullRows = SketchStore.table(spark, fullRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => ((r.get(0), r.get(1)), (r.getLong(2), r.getLong(3))))
      .toMap

    val upRoot = SketchStore.build(base)
    val before = filesUnder(Path.of(upRoot, "days"))
    SketchStore.upsertDays(spark, upRoot, late)
    val after = filesUnder(Path.of(upRoot, "days"))
    val untouched = before.keys.filter(f =>
      !f.contains(s"day=${days(5)}") && !f.contains(s"day=${days(6)}"))
    assert(untouched.nonEmpty)
    untouched.foreach { f =>
      assert(after.contains(f) &&
        java.util.Arrays.equals(after(f), before(f)),
        s"upsert touched out-of-batch day file $f")
    }
    // the re-fed days WERE rewritten (dynamic partition overwrite)
    assert(before.keys.exists(f => f.contains(s"day=${days(5)}") &&
      !after.contains(f)), "upsert did not rewrite the re-fed day")

    val upRows = SketchStore.table(spark, upRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => ((r.get(0), r.get(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(upRows.keySet == fullRows.keySet,
      "upserted artifact has different (type, day) rows than the rebuild")
    upRows.foreach { case (k, (n, est)) =>
      val (wantN, wantEst) = fullRows(k)
      assert(n == wantN, s"$k: n_rows $n != rebuild $wantN")
      assert(math.abs(est - wantEst) <= math.max(4L, wantN / 50),
        s"$k: HLL estimate $est outside the band around rebuild $wantEst")
    }
  }

  test("ingestBatch: replayed batch id is a no-op; distinct ids apply") {
    import scala.jdk.CollectionConverters._
    def storeBytes(root: String): Map[String, Array[Byte]] = {
      val walk = Files.walk(Path.of(root, "days"))
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f)).toMap
      finally walk.close()
    }
    val all = events(8000)
    val batch = all.filter(col("user_id") % 3 === 1)
    val root = SketchStore.build(all.exceptAll(batch))
    SketchStore.ingestBatch(spark, root, batch, batchId = 7L)
    val applied = storeBytes(root)
    // a foreachBatch REPLAY of the committed id must not double-merge
    // (the upsert is a monoid, not idempotent — the marker is the guard)
    SketchStore.ingestBatch(spark, root, batch, batchId = 7L)
    val replayed = storeBytes(root)
    assert(applied.keySet == replayed.keySet &&
      applied.forall { case (f, bs) =>
        java.util.Arrays.equals(bs, replayed(f)) },
      "replaying a committed batch id mutated the store")
    // and the applied store counts every event exactly once
    val n = SketchStore.table(spark, root)
      .agg(sum(col("n_rows"))).head().getLong(0)
    assert(n == 8000, s"store holds $n rows, want 8000")
  }

  test("ingestBatch: crash between apply and marker recovers exactly-once") {
    import java.nio.charset.StandardCharsets.UTF_8
    val all = events(8000)
    val batch = all.filter(col("user_id") % 3 === 2)
    val base = all.exceptAll(batch)
    def rows(root: String): Map[(Any, Any), Long] =
      SketchStore.table(spark, root)
        .select(col("event_type"), col("day"), col("n_rows"))
        .collect().map(r => ((r.get(0), r.get(1)), r.getLong(2))).toMap

    // reference: the uncrashed run
    val cleanRoot = SketchStore.build(base)
    SketchStore.ingestBatch(spark, cleanRoot, batch, batchId = 3L)
    val want = rows(cleanRoot)

    // crashed run: stage + intent committed, stage APPLIED, then "crash"
    // before the batch marker lands — the worst spot: the store is
    // already rewritten, so a recovery that re-merged from the store
    // would double-count the batch
    val root = SketchStore.build(base)
    val stage = SketchStore.stageUpsert(spark, root, batch).get
    val dir = Files.createDirectories(Path.of(root, "_ingested"))
    Files.write(dir.resolve("batch-3.intent"), stage.getBytes(UTF_8))
    SketchStore.applyStage(spark, root, stage)

    // foreachBatch replays batch 3: must re-apply the STAGE, not
    // re-merge, and converge on the clean run's rows
    SketchStore.ingestBatch(spark, root, batch, batchId = 3L)
    assert(rows(root) == want,
      "recovered store differs from the uncrashed run")
    assert(Files.exists(dir.resolve("batch-3")), "batch marker missing")
    assert(!Files.exists(dir.resolve("batch-3.intent")),
      "intent not retired after recovery")

    // the same crash BEFORE the apply (intent only) also recovers
    val root2 = SketchStore.build(base)
    val stage2 = SketchStore.stageUpsert(spark, root2, batch).get
    val dir2 = Files.createDirectories(Path.of(root2, "_ingested"))
    Files.write(dir2.resolve("batch-3.intent"), stage2.getBytes(UTF_8))
    SketchStore.ingestBatch(spark, root2, batch, batchId = 3L)
    assert(rows(root2) == want,
      "pre-apply crash recovery differs from the uncrashed run")
  }

  test("compact: serve identical on exact cols + est_users; hot day files " +
      "byte-untouched; cold day partitions tiered away") {
    import scala.jdk.CollectionConverters._
    def filesUnder(p: Path): Map[String, Array[Byte]] = {
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f)).toMap
      finally walk.close()
    }
    val all = events(20000)
    val days = all.select(to_date(col("ts")).as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    val cutoff = days(4) // days 0..3 tier to month grain, 4..6 stay hot
    val root = SketchStore.build(all)
    // est_users must be BIT-identical pre/post: HLL union is
    // register-wise max and max is associative, so the month-row
    // sketches carry exactly the registers their day rows would have
    // contributed to the serve union
    val want = SketchStore.serve(spark, root)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    val hotBefore = filesUnder(Path.of(root, "days")).filter {
      case (f, _) => days.drop(4).exists(d => f.contains(s"day=$d")) }
    assert(hotBefore.nonEmpty)

    SketchStore.compact(spark, root, cutoff)

    val after = filesUnder(Path.of(root, "days"))
    hotBefore.foreach { case (f, bytes) =>
      assert(after.contains(f) &&
        java.util.Arrays.equals(after(f), bytes),
        s"compaction touched hot day file $f")
    }
    days.take(4).foreach { d =>
      assert(!after.keys.exists(_.contains(s"day=$d")),
        s"compacted day $d still has day-tier files")
    }
    assert(Files.exists(Path.of(root, "months")), "month tier missing")
    assert(!Files.exists(Path.of(root, "_compact.intent")),
      "intent marker not retired")
    val got = SketchStore.serve(spark, root)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "compacted serve differs from pre-compaction serve")
    // re-compacting at the same cutoff is a no-op (day tier below the
    // cutoff is empty)
    SketchStore.compact(spark, root, cutoff)
    assert(SketchStore.serve(spark, root)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet == want,
      "re-compaction at the same cutoff changed the serve")
  }

  test("compact: crash after intent recovers by re-applying the stage") {
    val all = events(20000)
    val days = all.select(to_date(col("ts")).as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    val cutoff = days(4)
    def serveRows(root: String) = SketchStore.serve(spark, root)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet

    // reference: the uncrashed compaction
    val cleanRoot = SketchStore.build(all)
    SketchStore.compact(spark, cleanRoot, cutoff)
    val want = serveRows(cleanRoot)

    // crashed run A: stage + intent committed, apply never ran
    val rootA = SketchStore.build(all)
    SketchStore.stageCompact(spark, rootA, cutoff)
    SketchStore.compact(spark, rootA, cutoff) // recovery
    assert(serveRows(rootA) == want,
      "pre-apply crash recovery differs from the uncrashed compaction")
    assert(!Files.exists(Path.of(rootA, "_compact.intent")))

    // crashed run B: the worst spot — month tier already overwritten and
    // day partitions dropped, intent still standing; recovery must
    // re-apply the SAME stage (idempotent), never re-stage against the
    // half-mutated store (re-merging month rows with themselves would
    // double-count)
    val rootB = SketchStore.build(all)
    val stageB = SketchStore.stageCompact(spark, rootB, cutoff).get
    SketchStore.applyCompact(spark, rootB, stageB)
    SketchStore.compact(spark, rootB, cutoff) // recovery
    assert(serveRows(rootB) == want,
      "post-apply crash recovery differs from the uncrashed compaction")
    assert(!Files.exists(Path.of(rootB, "_compact.intent")))
  }

  test("range serve prunes day partitions and matches the in-range rebuild") {
    val all = events(10000)
    val days = all.select(to_date(col("ts")).as("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    val root = SketchStore.build(all)
    val served = SketchStore.serveRange(spark, root, days(0), days(2))
    val p = served.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val pf = p.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(pf.contains("day") && (pf.contains(">=") || pf.contains("<=")),
      s"range serve should push the day range into PartitionFilters:\n$p")
    // correctness: identical to serving a store built from the range only
    val inRange = all.filter(to_date(col("ts")).between(
      lit(days(0)), lit(days(2))))
    val wantRoot = SketchStore.build(inRange)
    val want = SketchStore.serve(spark, wantRoot)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    val got = served
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "range serve differs from in-range rebuild")
  }
}
