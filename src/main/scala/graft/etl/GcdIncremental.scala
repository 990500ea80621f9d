package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import GcdSchemas.GcdFlags

/**
 * Incremental snapshot maintenance — the answer to the reference's real
 * operational pain: its pipeline recomputes the ENTIRE denormalized
 * snapshot from every dump (reference Main.java:380-513 re-runs the full
 * 5-way join for all ~2.5M issues even when a weekly dump touches a few
 * thousand). Every snapshot row derives from exactly ONE issue (the join
 * tree is rooted at `gcd_issue`; stories, credits and dictionary probes
 * are all per-issue satellites), so the snapshot is maintainable with
 * the same partition-upsert strategy as [[graft.operators.Scd2.maintain]]:
 *
 *   - rebuild ONLY the touched issues — run the full
 *     [[GcdSnapshot.build]] plan over the source tables semi-join-
 *     restricted to the touched issue set (at scale: partition-pruned
 *     reads of the issue/story/credit tables, dictionary dims broadcast
 *     as always);
 *   - carry every other issue's rows over from the previous snapshot
 *     verbatim (anti-join on the touched set — at 100 TB this is a
 *     file-level copy-by-reference for untouched partitions);
 *   - deletions (issues absent from the new dump) fall out of the same
 *     anti-join by including them in the touched set with no rebuild
 *     rows to contribute.
 *
 * Correctness contract (hash-gated by g03 against the FULL-rebuild g01
 * oracle): maintain(build(yesterday), touched) ≡ build(today).
 */
object GcdIncremental {

  /**
   * Apply one dump's changes to an existing snapshot.
   *
   * @param baseSnapshot   the previous snapshot (88-column
   *                       [[GcdSnapshot.build]] output, array-typed)
   * @param tables         TODAY's source tables ([[GcdSnapshot.sourceTables]])
   * @param touchedIssues  one-column DataFrame `issue_id` of issues whose
   *                       rows must be (re)built — changed, added, or
   *                       deleted in the new dump
   */
  def maintain(spark: SparkSession, baseSnapshot: DataFrame,
      tables: Map[String, DataFrame], touchedIssues: DataFrame,
      date: String, flags: GcdFlags = GcdFlags()): DataFrame = {
    val touched = touchedIssues.select(col("issue_id")).distinct()

    // restrict the per-issue inputs to the touched set; dictionary dims
    // stay whole (they broadcast regardless)
    val issueTab = tables("gcd_issue")
    val issues = issueTab
      .join(touched, issueTab("id") === touched("issue_id"), "left_semi")
    val storyTab = tables("gcd_story")
    val stories = storyTab
      .join(touched, storyTab("issue_id") === touched("issue_id"),
        "left_semi")
    val credits = tables.get("gcd_story_credit").map(
      _.join(stories.select(col("id").as("__sid")),
        col("story_id") === col("__sid"), "left_semi"))
    val restricted = tables +
      ("gcd_issue" -> issues) + ("gcd_story" -> stories) ++
      credits.map("gcd_story_credit" -> _)

    val rebuilt = GcdSnapshot.build(spark, restricted, date, flags)
    // the using-column anti-join hoists issue_id to the front — restore
    // the snapshot's canonical column order before the union
    val carried = baseSnapshot.join(touched, Seq("issue_id"), "left_anti")
      .select(baseSnapshot.columns.map(col): _*)
    carried.unionByName(rebuilt)
  }
}
