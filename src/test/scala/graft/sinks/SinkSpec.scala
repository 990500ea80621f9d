package graft.sinks

import graft.SparkSpec
import graft.etl.{GcdConfig, GcdSink}
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("inverted index: field partitions, sorted postings, pruned lookup") {
    val docs = Seq(
      (1L, Seq("alpha", "beta"), "us", 10L),
      (2L, Seq("beta", "gamma"), "ca", 20L),
      (3L, Seq.empty[String], "us", 30L)
    ).toDF("doc_id", "tags", "country", "score")
    val out = java.nio.file.Files.createTempDirectory("inv_idx").toString
    InvertedIndex.write(docs, "doc_id", Seq("tags", "country", "score"), out)
    assert(new java.io.File(s"$out/field=tags").isDirectory)
    assert(new java.io.File(s"$out/field=country").isDirectory)
    val beta = InvertedIndex.lookup(spark, out, "tags", "beta")
      .as[Long].collect().sorted
    assert(beta.toSeq == Seq(1L, 2L))
    val us = InvertedIndex.lookup(spark, out, "country", "us")
      .as[Long].collect().sorted
    assert(us.toSeq == Seq(1L, 3L))
    val ints = spark.read.parquet(out)
      .filter($"field" === "score" && $"term_int" === 20L)
      .select($"doc_id").as[Long].collect()
    assert(ints.toSeq == Seq(2L))
  }

  test("bucketed tables: equi-join on the bucket key plans without exchange") {
    val base = java.nio.file.Files.createTempDirectory("buckets").toString
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "vb")
    GcdSink.writeBucketed(a, "bk_a", s"$base/a", "k", n = 4)
    GcdSink.writeBucketed(b, "bk_b", s"$base/b", "k", n = 4)
    // force the shuffle-sensitive join path (tiny test tables would
    // otherwise broadcast, which sidesteps bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot inverted index serves the flamdex field set") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snap = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    val out = java.nio.file.Files.createTempDirectory("snap_idx").toString
    InvertedIndex.writeSnapshotIndex(snap, out)
    val hits = InvertedIndex.lookup(spark, out, "story_genre", "horror")
      .as[Long].collect()
    assert(hits.toSeq == Seq(1L)) // issue 1 carries the horror story
    val pubs = InvertedIndex.lookup(spark, out, "publisher_name",
      "Best Comics").as[Long].collect().distinct.sorted
    assert(pubs.toSeq == Seq(1L, 2L))
  }

  test("compaction: fewer files, same rows, partition layout intact") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snap = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    val out = java.nio.file.Files.createTempDirectory("snap_cmp").toString
    // force a fragmented write: many partitions → many small files
    GcdSink.writeSnapshot(snap.repartition(8), "2026-8-12", out)
    def partFiles() = new java.io.File(s"$out/snapshot=20260812")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val before = spark.read.parquet(out).orderBy(col("issue_id"),
      col("story_id")).collect()
    assert(partFiles() > 1)

    GcdSink.compactSnapshot(spark, out, "2026-8-12", targetFiles = 1)
    assert(partFiles() == 1)
    val after = spark.read.parquet(out).orderBy(col("issue_id"),
      col("story_id")).collect()
    assert(after.toSeq == before.toSeq)
    // no temp/backup debris left behind
    assert(!new java.io.File(s"$out.compact20260812").exists())
    assert(!new java.io.File(s"$out/.snapshot=20260812.bak").exists())
  }

  test("flamdex-variant credit semantics: empty credit types are absent " +
    "from the index but kept as [] in parquet") {
    // The reference's index path emits a credit field ONLY when its name
    // list is non-empty (Main.java:521-533 addOptionalCredit guard), while
    // the parquet/avro record keeps the empty array. Story 1000 has curated
    // credits with NO editing credit → snapshot carries story_editing = [].
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snap = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    val parquetSide = snap.filter(col("story_id") === 1000L)
      .select(col("story_editing")).head().getSeq[String](0)
    assert(parquetSide == Seq.empty) // canonical record: empty, not absent

    val out = java.nio.file.Files.createTempDirectory("snap_idx2").toString
    InvertedIndex.write(snap, "issue_id",
      Seq("story_editing", "story_script"), out)
    val byField = spark.read.parquet(out)
      .groupBy(col("field")).count().as[(String, Long)].collect().toMap
    // non-empty credit lists post; the empty editing list posts NOTHING —
    // explode-on-empty reproduces the addOptionalCredit guard exactly
    assert(byField.contains("story_script"))
    assert(!byField.contains("story_editing"))
  }

  test("snapshot round-trips identically through orc") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snap = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    val pDir = java.nio.file.Files.createTempDirectory("snap_pq").toString
    val oDir = java.nio.file.Files.createTempDirectory("snap_orc").toString
    GcdSink.writeSnapshot(snap, "2026-8-12", pDir)
    GcdSink.writeSnapshot(snap, "2026-8-12", oDir, format = "orc")
    val p = spark.read.parquet(pDir)
    val o = spark.read.orc(oDir)
    assert(o.schema.fieldNames.toSeq == p.schema.fieldNames.toSeq)
    assert(o.count() == p.count())
    assert(p.exceptAll(o).isEmpty && o.exceptAll(p).isEmpty)
  }

  test("snapshot partitions: pruning, time travel, idempotent re-write") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snap = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    val out = java.nio.file.Files.createTempDirectory("snap_tt").toString
    GcdSink.writeSnapshot(snap, "2026-8-11", out)
    GcdSink.writeSnapshot(snap, "2026-8-12", out)
    GcdSink.writeSnapshot(snap, "2026-8-12", out) // idempotent overwrite
    val back = spark.read.parquet(out)
    assert(back.count() == 8)                     // 2 dates × 4 rows, no dupes
    val one = back.filter($"snapshot" === 20260812)
    assert(one.count() == 4)
    // partition pruning must reach the scan (dynamic file-skipping at read)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("snapshot"), plan.take(800))
  }

  test("end-to-end CLI path: parquet dir -> snapshot table") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val src = java.nio.file.Files.createTempDirectory("gcd_src").toString
    fixtures.fixtureTables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$src/$name.parquet")
    }
    val out = java.nio.file.Files.createTempDirectory("gcd_out").toString
    graft.etl.GcdEtlMain.run(spark, src, "2026-8-12", out,
      tableName = "gcd_cli_test")
    val n = spark.sql(
      "SELECT count(*) FROM gcd_cli_test WHERE snapshot = 20260812")
      .head().getLong(0)
    assert(n == 4)
  }

  test("end-to-end CSV dump ingestion with the declared source schemas") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val src = java.nio.file.Files.createTempDirectory("gcd_csv").toString
    fixtures.fixtureTables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(s"$src/$name.csv")
    }
    val out = java.nio.file.Files.createTempDirectory("gcd_csv_out").toString
    graft.etl.GcdEtlMain.run(spark, src, "2026-8-12", out,
      tableName = "gcd_csv_test")
    val got = spark.sql(
      """SELECT count(*), count(DISTINCT issue_id),
        |  sum(CASE WHEN story_credit_source = 'gcd_story_credit' THEN 1 ELSE 0 END)
        |FROM gcd_csv_test WHERE snapshot = 20260812""".stripMargin).head()
    assert(got.getLong(0) == 4 && got.getLong(1) == 2 && got.getLong(2) == 1)
  }

  test("flag spec parses the CLI toggle list") {
    val f = graft.etl.GcdEtlMain.parseFlags(
      "no-publication-type, no-story-credit")
    assert(!f.publicationType && !f.storyCredit)
    assert(f.volumeNotPrinted && f.seriesIsSingleton && f.storyFirstLine)
  }

  test("yaml config parses reference shape incl. capability flags") {
    val yml =
      """gcdatabase:
        |  url: /data/gcd_tables
        |  user: u
        |  password: p
        |  gcdSchema:
        |    publicationType: false
        |    storyCredit: false
        |""".stripMargin
    val cfg = GcdConfig.load(
      new java.io.ByteArrayInputStream(yml.getBytes("UTF-8")))
    assert(cfg.url == "/data/gcd_tables")
    assert(cfg.user.contains("u") && cfg.password.contains("p"))
    assert(!cfg.flags.publicationType && !cfg.flags.storyCredit)
    assert(cfg.flags.volumeNotPrinted && cfg.flags.storyFirstLine &&
      cfg.flags.seriesIsSingleton) // absent → reference defaults (true)
  }
}
