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

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    // array columns make rows unsortable for except(); compare via the
    // same JSON canonicalization the gate uses
    def canon(df: DataFrame): DataFrame = {
      val cols = df.schema.fields.toSeq.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType =>
            to_json(col(f.name)).as(f.name)
          case _ => col(f.name)
        }
      }
      df.select(cols: _*)
    }
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
}
