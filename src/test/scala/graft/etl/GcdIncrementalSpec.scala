package graft.etl

import graft.SparkSpec
import graft.etl.GcdSchemas.GcdFlags
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental snapshot maintenance over the committed fixture dump:
 * maintain must be (a) the identity when nothing is touched, (b) a full
 * rebuild when everything is, and (c) exactly equal to the from-scratch
 * rebuild for a partial touched set — including DELETIONS (touched
 * issues absent from today's dump contribute no rebuilt rows). The
 * driver-gated g03 hash-proves (c) cross-engine; these pin the algebra
 * in-JVM. */
class GcdIncrementalSpec extends SparkSpec {

  private val fx = graft.queries.GcdQueries.fixturesDir
  private lazy val tables: Map[String, DataFrame] =
    GcdSnapshot.sourceTables.map(t =>
      t -> spark.read.parquet(s"$fx/$t.parquet")).toMap
  private val date = "2026-8-12"

  // array columns make rows unsortable for except(); compare via the
  // same JSON canonicalization the gate uses
  private def canon(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    val g = canon(got)
    val w = canon(want)
    assert(g.exceptAll(w).isEmpty && w.exceptAll(g).isEmpty,
      "maintained snapshot differs from full rebuild")
  }

  test("empty touched set: maintain is the identity on the base snapshot") {
    val base = GcdSnapshot.build(spark, tables, date)
    val touched = spark.range(0).select(col("id").as("issue_id"))
    val out = GcdIncremental.maintain(spark, base, tables, touched, date)
    assertSame(out, base)
  }

  test("partial touched set: maintain == full rebuild of today's dump") {
    val issue = tables("gcd_issue")
    val touched = issue.filter(col("id") % 5 === 1)
      .select(col("id").cast("long").as("issue_id"))
    // yesterday = today minus the touched issues' rows
    val story = tables("gcd_story")
    val yStory = story.join(touched,
      story("issue_id") === touched("issue_id"), "left_anti")
    val credit = tables("gcd_story_credit")
    val yTables = tables +
      ("gcd_issue" -> issue.join(touched,
        issue("id") === touched("issue_id"), "left_anti")) +
      ("gcd_story" -> yStory) +
      ("gcd_story_credit" -> credit.join(
        yStory.select(col("id").as("__sid")),
        credit("story_id") === col("__sid"), "left_semi"))
    val base = GcdSnapshot.build(spark, yTables, date)
    val out = GcdIncremental.maintain(spark, base, tables, touched, date)
    assertSame(out, GcdSnapshot.build(spark, tables, date))
  }

  test("snapshot store: bucket-pruned maintain == full rebuild (algebra's physical twin)") {
    // the same partial-touched scenario as above, through the PERSISTED
    // bucket-partitioned store the driver gates (g03): carry restricted
    // to touched buckets + pointer-carried untouched buckets must equal
    // the from-scratch rebuild — and an empty dump must be the identity
    // without writing a single bucket
    val issue = tables("gcd_issue")
    val touched = issue.filter(col("id") % 5 === 1)
      .select(col("id").cast("long").as("issue_id"))
    val story = tables("gcd_story")
    val yStory = story.join(touched,
      story("issue_id") === touched("issue_id"), "left_anti")
    val credit = tables("gcd_story_credit")
    val yTables = tables +
      ("gcd_issue" -> issue.join(touched,
        issue("id") === touched("issue_id"), "left_anti")) +
      ("gcd_story" -> yStory) +
      ("gcd_story_credit" -> credit.join(
        yStory.select(col("id").as("__sid")),
        credit("story_id") === col("__sid"), "left_semi"))
    val store = new GcdIncremental.SnapshotStore(spark, nBuckets = 16)
    store.init(GcdSnapshot.build(spark, yTables, date))
    val empty = spark.range(0).select(col("id").as("issue_id"))
    store.maintain(tables, empty, date) // no-op: no buckets touched
    store.maintain(tables, touched, date)
    assertSame(store.view, GcdSnapshot.build(spark, tables, date))
  }

  test("deletion: touched issues absent from today's dump drop from the view") {
    val issue = tables("gcd_issue")
    val deleted = issue.filter(col("id") % 11 === 3)
      .select(col("id").cast("long").as("issue_id"))
    // yesterday = the full dump; today = dump minus the deleted issues
    val story = tables("gcd_story")
    val tStory = story.join(deleted,
      story("issue_id") === deleted("issue_id"), "left_anti")
    val credit = tables("gcd_story_credit")
    val tTables = tables +
      ("gcd_issue" -> issue.join(deleted,
        issue("id") === deleted("issue_id"), "left_anti")) +
      ("gcd_story" -> tStory) +
      ("gcd_story_credit" -> credit.join(
        tStory.select(col("id").as("__sid")),
        credit("story_id") === col("__sid"), "left_semi"))
    val base = GcdSnapshot.build(spark, tables, date)
    val out = GcdIncremental.maintain(spark, base, tTables, deleted, date)
    assertSame(out, GcdSnapshot.build(spark, tTables, date))
  }

  test("change feed: base − D + I reconstructs the maintained view; " +
      "untouched issues never appear") {
    // modification-only dump: every issue exists on both sides, the
    // touched ones carried price='old' yesterday — the feed must pair
    // each changed row as D(before) + I(after), and rows of untouched
    // issues must cancel entirely in the bounded diff
    val issue = tables("gcd_issue")
    val isM = col("id") % 5 === 1
    val touched = issue.filter(isM)
      .select(col("id").cast("long").as("issue_id"))
    val yTables = tables + ("gcd_issue" -> issue.withColumn("price",
      when(isM, lit("old")).otherwise(col("price"))))
    val base = GcdSnapshot.build(spark, yTables, date)
    val store = new GcdIncremental.SnapshotStore(spark)
    store.init(base)
    store.maintain(tables, touched, date, GcdFlags(), emitFeed = true)
    val feed = store.changeFeed.cache()
    try {
      val d = feed.filter(col("op") === "D").drop("op")
      val i = feed.filter(col("op") === "I").drop("op")
      assert(d.count() > 0 && i.count() > 0,
        "modification dump must emit both before- and after-images")
      // the feed REPLAYS: yesterday's rows − D + I == today's view
      val reconstructed = canon(base).except(canon(d))
        .unionByName(canon(i))
      val view = canon(store.view)
      assert(reconstructed.exceptAll(view).isEmpty &&
        view.exceptAll(reconstructed).isEmpty,
        "replaying the change feed does not reconstruct the view")
      // bounded-diff guarantee: only touched issues in the feed
      assert(feed.join(touched, Seq("issue_id"), "left_anti").isEmpty,
        "feed leaked rows of untouched issues")
      // and every D has its I twin per (issue, story) — an update pair
      val dKeys = d.select(col("issue_id"), col("story_id"))
      val iKeys = i.select(col("issue_id"), col("story_id"))
      assert(dKeys.exceptAll(iKeys).isEmpty,
        "a before-image lost its after-image in a pure-modification dump")
    } finally feed.unpersist()
  }

  test("history store: snapshotAsOf reproduces each generation; " +
      "pruneHistory retires only unreferenced bucket versions") {
    val issue = tables("gcd_issue")
    val isM = col("id") % 5 === 1
    val touched = issue.filter(isM)
      .select(col("id").cast("long").as("issue_id"))
    val yTables = tables + ("gcd_issue" -> issue.withColumn("price",
      when(isM, lit("old")).otherwise(col("price"))))
    val base = GcdSnapshot.build(spark, yTables, date)
    val store = new GcdIncremental.SnapshotStore(spark,
      retainHistory = true)
    store.init(base)
    store.maintain(tables, touched, date, GcdFlags())
    assert(store.generations == 2)
    // generation 1 = the init build, untouched by the later maintain
    assertSame(store.snapshotAsOf(1), base)
    assertSame(store.snapshotAsOf(2), store.view)
    // prune to the newest generation: gen-1-only bucket versions retire
    val deleted = store.pruneHistory(keep = 1)
    assert(deleted > 0, "modification dump must leave prunable versions")
    assert(store.generations == 1)
    // STABLE numbering: the survivor keeps its number (2); the pruned
    // generation fails loudly instead of the survivor renumbering to 1
    assert(store.retainedGenerations == Seq(2L))
    intercept[IllegalArgumentException](store.snapshotAsOf(1))
    assertSame(store.snapshotAsOf(2), store.view)
    assertSame(store.view, GcdSnapshot.build(spark, tables, date))
  }

  test("point lookup reads only the probe ids' buckets and equals the " +
      "filtered view") {
    val base = GcdSnapshot.build(spark, tables, date)
    val store = new GcdIncremental.SnapshotStore(spark, nBuckets = 16)
    store.init(base)
    val probes = Seq(3L, 500L)
    val paths = store.lookupIssuePaths(probes)
    assert(paths.nonEmpty && paths.size <= 2,
      s"point lookup read ${paths.size} buckets for 2 ids")
    val got = store.lookupIssues(probes)
    val want = store.view
      .filter(col("issue_id").isin(probes.map(Long.box): _*))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty &&
      got.count() > 0)
    // absent id: schema-stable empty, never an error
    assert(store.lookupIssues(Seq(424242L)).count() == 0)
  }

  test("store recovery: a driver loss keeps the live view, the feed, " +
      "and every retained generation; config mismatches fail loudly") {
    val issue = tables("gcd_issue")
    val isM = col("id") % 5 === 1
    val touched = issue.filter(isM)
      .select(col("id").cast("long").as("issue_id"))
    val yTables = tables + ("gcd_issue" -> issue.withColumn("price",
      when(isM, lit("old")).otherwise(col("price"))))
    val base = GcdSnapshot.build(spark, yTables, date)
    val store = new GcdIncremental.SnapshotStore(spark, nBuckets = 16,
      retainHistory = true)
    store.init(base)
    store.maintain(tables, touched, date, GcdFlags(), emitFeed = true)
    val root = store.rootDir
    val feedCount = store.changeFeed.count()

    // driver loss: only the root survives. Mismatched config rejected.
    intercept[IllegalArgumentException](
      GcdIncremental.recover(spark, root, nBuckets = 8,
        retainHistory = true))
    intercept[IllegalArgumentException](
      GcdIncremental.recover(spark, root, nBuckets = 16))

    val rec = GcdIncremental.recover(spark, root, nBuckets = 16,
      retainHistory = true)
    assert(rec.generations == 2)
    assertSame(rec.view, GcdSnapshot.build(spark, tables, date))
    assertSame(rec.snapshotAsOf(1), base)
    assert(rec.changeFeed.count() == feedCount,
      "change-feed paths lost across recovery")
    // and the recovered store keeps maintaining: an identity dump
    // commits generation 3 with unchanged content
    rec.maintain(tables, touched, date, GcdFlags())
    assert(rec.retainedGenerations == Seq(1L, 2L, 3L))
    assertSame(rec.snapshotAsOf(3), rec.view)
  }

  test("recovery on a RELATIVE store root keeps the committed change " +
      "feed (gc qualifies both sides, never orphans committed feeds)") {
    val issue = tables("gcd_issue")
    val isM = col("id") % 5 === 1
    val touched = issue.filter(isM)
      .select(col("id").cast("long").as("issue_id"))
    val yTables = tables + ("gcd_issue" -> issue.withColumn("price",
      when(isM, lit("old")).otherwise(col("price"))))
    val base = GcdSnapshot.build(spark, yTables, date)
    // a RELATIVE root: committed feed paths qualify to absolute URIs in
    // the manifest, while a naive listing-vs-committed comparison on
    // recovery sees unqualified strings — the exact mismatch that made
    // gc() treat every committed feed generation as an orphan
    val rel = s"target/relstore_${System.nanoTime()}"
    try {
      val store = new GcdIncremental.SnapshotStore(spark, nBuckets = 16,
        root = Some(rel))
      store.init(base)
      store.maintain(tables, touched, date, GcdFlags(), emitFeed = true)
      val feedCount = store.changeFeed.count()
      assert(feedCount > 0)
      val rec = GcdIncremental.recover(spark, rel, nBuckets = 16)
      assert(rec.changeFeed.count() == feedCount,
        "recover() on a relative root deleted committed change feeds")
      assertSame(rec.view, GcdSnapshot.build(spark, tables, date))
    } finally {
      graft.sources.Scratch.deleteNow(rel)
    }
  }
}
