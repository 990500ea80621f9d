package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the parts of the q94 gate the hash can't see: the lookup reads
 * STRICTLY fewer files than the table holds (real skipping), min/max
 * alone prunes out-of-range probes to zero files, and the sidecar is
 * invisible to normal table reads. */
class SkippingIndexSpec extends SparkSpec {

  private def mkTable(root: String): Unit = {
    import spark.implicits._
    (0L until 10000L).map(i => (i, i % 500, s"e${i % 7}"))
      .toDF("event_id", "user_id", "event_type")
      .repartitionByRange(8, col("user_id"))
      .write.parquet(root)
  }

  test("lookup scans fewer files, returns exactly the full-scan rows") {
    val root = graft.sources.Scratch.dir("skip_spec") + "/t"
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    val total = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val probes = Seq(3L, 401L)
    val cand = SkippingIndex.candidateFiles(spark, root, "user_id", probes)
    assert(cand.nonEmpty && cand.size < total,
      s"no pruning: ${cand.size} of $total files")
    val got = SkippingIndex.lookup(spark, root, "user_id", probes)
      .orderBy("event_id").collect().toSeq
    val want = spark.read.parquet(root)
      .filter(col("user_id").isin(probes.map(Long.box): _*))
      .orderBy("event_id").collect().toSeq
    assert(got == want)
  }

  test("out-of-range probe prunes to zero files; empty result keeps schema") {
    val root = graft.sources.Scratch.dir("skip_spec2") + "/t"
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    assert(SkippingIndex.candidateFiles(spark, root, "user_id",
      Seq(-5L, 10000L)).isEmpty)
    val empty = SkippingIndex.lookup(spark, root, "user_id", Seq(-5L))
    assert(empty.count() == 0)
    assert(empty.columns.toSeq ==
      Seq("event_id", "user_id", "event_type"))
  }

  test("pruning is a Spark job: only file names reach the driver") {
    val root = graft.sources.Scratch.dir("skip_spec6") + "/t"
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    val df = SkippingIndex.candidateFilesDF(spark, root, "user_id",
      Seq(3L, 401L))
    // the collected plan output carries file names ONLY — no binary
    // bloom column can reach the driver through it
    assert(df.schema.fieldNames.toSeq == Seq("file"))
    // and the bloom probe is IN the plan (executor-side), not a
    // driver-side loop over collected sidecar rows
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains_any"), plan)
    assert(df.collect().map(_.getString(0)).toSeq.sorted ==
      SkippingIndex.candidateFiles(spark, root, "user_id",
        Seq(3L, 401L)))
  }

  test("lookup stays exact when a file was appended but not refreshed") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("skip_spec7") + "/t"
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    (20000L until 21000L).map(i => (i, i, "x"))
      .toDF("event_id", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(root)
    // no refresh: the sidecar doesn't cover the new file, so it is
    // scanned unpruned instead of its rows silently vanishing
    assert(SkippingIndex.lookup(spark, root, "user_id", Seq(20500L))
      .count() == 1)
    // covered files still prune: an in-range covered probe reads fewer
    // files than the table holds (candidates + the one uncovered file)
    assert(SkippingIndex.candidateFiles(spark, root, "user_id",
      Seq(3L)).size < 8)
    assert(SkippingIndex.lookup(spark, root, "user_id", Seq(3L))
      .count() == 20)
  }

  test("refresh over an empty sidecar (empty initial table) does not NPE") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("skip_spec8") + "/t"
    Seq.empty[(Long, Long, String)]
      .toDF("event_id", "user_id", "event_type")
      .coalesce(1).write.parquet(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    (0L until 100L).map(i => (i, i, "x"))
      .toDF("event_id", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(root)
    SkippingIndex.refresh(spark, root, "user_id", 5000L)
    assert(SkippingIndex.lookup(spark, root, "user_id", Seq(42L))
      .count() == 1)
  }

  test("refresh covers appended files without re-sketching covered ones") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("skip_spec4") + "/t"
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    // append a new file carrying a key range the base never had
    (20000L until 21000L).map(i => (i, i, "x"))
      .toDF("event_id", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(root)
    SkippingIndex.refresh(spark, root, "user_id", 5000L)
    val side = spark.read.parquet(s"$root/_skip_user_id")
    val total = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(side.count() == total, "sidecar rows != data files")
    // covered rows kept verbatim (gen 0), only the appended file is new
    assert(side.filter(col("gen") === 1).count() == 1)
    assert(side.filter(col("gen") === 0).count() == total - 1)
    // the new keys are findable, old lookups unchanged
    val got = SkippingIndex.lookup(spark, root, "user_id", Seq(20500L))
    assert(got.count() == 1)
    assert(SkippingIndex.lookup(spark, root, "user_id", Seq(3L))
      .count() == 20)
  }

  test("TableCompaction's dir swap removes a leaf sidecar; rebuild re-covers") {
    import spark.implicits._
    // day-partitioned debt table (the q90 scenario) with a skippable key
    val root = graft.sources.Scratch.dir("skip_spec5") + "/t"
    (0L until 8000L).map(i => (i, i % 400, (i % 4).toString))
      .toDF("event_id", "user_id", "p")
      .repartition(8).write.partitionBy("p").parquet(root)
    val leaf = root + "/p=0"
    SkippingIndex.build(spark, leaf, "user_id", 5000L)
    assert(SkippingIndex.candidateFiles(spark, leaf, "user_id",
      Seq(8L)).nonEmpty)
    TableCompaction.compact(spark, root, "p", 64L * 1024 * 1024)
    // the compacted leaf was swapped whole — the old sidecar went with
    // it (BY DESIGN: every covered file vanished, and a stale sidecar
    // silently skipping live files would be worse than none)
    assert(!new java.io.File(s"$leaf/_skip_user_id").exists)
    // rebuild over the compacted layout: one file, exact lookups
    SkippingIndex.build(spark, leaf, "user_id", 5000L)
    assert(SkippingIndex.candidateFiles(spark, leaf, "user_id",
      Seq(8L)).size == 1)
    val got = SkippingIndex.lookup(spark, leaf, "user_id", Seq(8L))
      .orderBy("event_id").collect().toSeq
    val want = spark.read.parquet(leaf)
      .filter(col("user_id") === 8L).orderBy("event_id").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("compact(rebuildSkipIndexes=true) restores sidecar coverage in the same call") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("skip_spec9") + "/t"
    (0L until 8000L).map(i => (i, i % 400, (i % 4).toString))
      .toDF("event_id", "user_id", "p")
      .repartition(8).write.partitionBy("p").parquet(root)
    val leaf = root + "/p=0"
    SkippingIndex.build(spark, leaf, "user_id", 5000L)
    val report = TableCompaction.compact(spark, root, "p",
      64L * 1024 * 1024, rebuildSkipIndexes = true)
    assert(report.touched.nonEmpty)
    // the flag rebuilt exactly the key columns that were covered: the
    // swapped leaf has a fresh sidecar over the compacted file set and
    // lookups are exact with no manual rebuild step
    assert(new java.io.File(s"$leaf/_skip_user_id").exists)
    val side = spark.read.parquet(s"$leaf/_skip_user_id")
    val files = new java.io.File(leaf).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(side.count() == files, "rebuilt sidecar rows != live files")
    val got = SkippingIndex.lookup(spark, leaf, "user_id", Seq(8L))
      .orderBy("event_id").collect().toSeq
    val want = spark.read.parquet(leaf)
      .filter(col("user_id") === 8L).orderBy("event_id").collect().toSeq
    assert(got == want && got.nonEmpty)
    // partitions that never had a sidecar don't grow one
    assert(!new java.io.File(s"$root/p=1/_skip_user_id").exists)
  }

  test("sidecar is invisible to normal reads of the table") {
    val root = graft.sources.Scratch.dir("skip_spec3") + "/t"
    mkTable(root)
    val before = spark.read.parquet(root).count()
    SkippingIndex.build(spark, root, "user_id", 5000L)
    assert(spark.read.parquet(root).count() == before)
    assert(spark.read.parquet(root).columns.toSeq ==
      Seq("event_id", "user_id", "event_type"))
  }

  test("conjunctive lookup: scan set is the intersection of per-column " +
      "pruning; exact; uncovered columns cannot rule files out") {
    val root = graft.sources.Scratch.dir("skip_spec7") + "/t"
    // range-clustered user_id (range pruning), scattered event_id
    // (Bloom pruning) — the q98 shape
    mkTable(root)
    SkippingIndex.build(spark, root, "user_id", 5000L)
    SkippingIndex.build(spark, root, "event_id", 5000L)
    val preds = Seq("user_id" -> Seq(3L, 401L),
      "event_id" -> Seq(3L, 8500L))
    val candU = SkippingIndex.candidateFiles(spark, root, "user_id",
      preds(0)._2).toSet
    val candE = SkippingIndex.candidateFiles(spark, root, "event_id",
      preds(1)._2).toSet
    assert((candU intersect candE).size < math.min(candU.size, candE.size)
      || (candU intersect candE).size < 8,
      s"intersection ${candU.size}x${candE.size} prunes nothing")
    val got = SkippingIndex.lookupAll(spark, root, preds)
      .orderBy("event_id").collect().toSeq
    val want = spark.read.parquet(root)
      .filter(col("user_id").isin(3L, 401L) &&
        col("event_id").isin(3L, 8500L))
      .orderBy("event_id").collect().toSeq
    assert(got == want && got.nonEmpty)

    // append a file AFTER both builds: neither sidecar covers it, so
    // the conjunctive lookup must scan it rather than drop its rows
    import spark.implicits._
    Seq((200000L, 3L, "ex")).toDF("event_id", "user_id", "event_type")
      .coalesce(1).write.mode("append").parquet(root)
    val got2 = SkippingIndex.lookupAll(spark, root, Seq(
      "user_id" -> Seq(3L), "event_id" -> Seq(200000L)))
      .collect().toSeq
    assert(got2.map(_.getLong(0)) == Seq(200000L),
      s"appended uncovered row missing from conjunctive lookup: $got2")
  }

  test("STRING keys: fingerprint lookup prunes files and stays exact; " +
      "a probe of the wrong type fails loudly") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("skip_spec_str") + "/t"
    // doc-fingerprint shape (the q91 dedup-ledger key): string keys
    // scattered across files — range stats are weak, Bloom prunes
    (0L until 8000L).map(i => (i, s"fp${i}x", i % 97))
      .toDF("doc_id", "fp", "grp")
      .repartition(8, col("grp")) // fp scattered across all 8 files
      .write.parquet(root)
    SkippingIndex.build(spark, root, "fp", 2000L)
    val total = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val probes = Seq("fp42x", "fp7777x")
    val cand = SkippingIndex.candidateFiles(spark, root, "fp", probes)
    assert(cand.nonEmpty && cand.size < total,
      s"no string-key pruning: ${cand.size} of $total files")
    val got = SkippingIndex.lookup(spark, root, "fp", probes)
      .orderBy("doc_id").collect().toSeq
    val want = spark.read.parquet(root)
      .filter(col("fp").isin(probes: _*))
      .orderBy("doc_id").collect().toSeq
    assert(got == want && got.size == 2)
    // absent fingerprint: Bloom prunes to (almost always) zero files,
    // and the lookup is exactly empty regardless
    assert(SkippingIndex.lookup(spark, root, "fp",
      Seq("no_such_fp")).count() == 0)
    // a LONG probe against the string sidecar would hash differently
    // than the build side (silent false negatives) — must fail loudly
    val ex = intercept[IllegalArgumentException] {
      SkippingIndex.lookup(spark, root, "fp", Seq(42L))
    }
    assert(ex.getMessage.contains("does not match"), ex.getMessage)
  }
}
