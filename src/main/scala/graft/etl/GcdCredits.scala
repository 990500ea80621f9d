package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Curated story-credit aggregation (SURVEY.md §2 S4/J8/A1/A2/A3).
 *
 * Reference behavior (/root/reference/src/main/java/org/gcd/etl/
 * GcdStoryCredit.java): a 3-table join resolves name-variant → canonical
 * creator (:115-119), compound credit types expand recursively to base
 * types (:86-90), and per-story, per-type parallel name/id lists accumulate
 * in scan order (:85-97). The reference holds ALL credits in driver heap
 * (author-flagged scaling cliff, :22); here it is one distributed
 * `groupBy(story_id)` — the cliff disappears.
 *
 * Ordering divergence (documented, SURVEY.md §7.4): MySQL scan order
 * within a story is undefined; we sort by (canonical creator_id, source
 * credit_type_id, name), keeping name[i] ∥ creator_id[i] aligned by
 * collecting structs and unzipping after the sort.
 */
object GcdCredits {

  /** (credit_type_id, base_type_id) expansion pairs, compounds flattened. */
  val expansionPairs: Seq[(Int, Int)] =
    CreditTypes.expansion.toSeq.sortBy(_._1).flatMap { case (id, bases) =>
      bases.map(b => (id, b))
    }

  /** Base-type id → output field stem (1→script … 9→painting). */
  val baseStems: Seq[(Int, String)] = CreditTypes.baseField.toSeq.sortBy(_._1)

  /**
   * One row per story with curated credits: `story_id`, then for each base
   * type a `<stem>` array<string> of names and `<stem>_ids` array<long> of
   * canonical creator ids (empty arrays for absent types — the reference's
   * `getOrDefault(…, ImmutableList.of())`, GcdStoryCredit.java:99-111).
   */
  def aggregate(spark: SparkSession, storyCredit: DataFrame,
      nameDetail: DataFrame, creator: DataFrame): DataFrame = {
    import spark.implicits._

    // J8: credit ⋈ name_detail ⋈ creator (canonical-name resolution)
    val resolved = storyCredit.as("c")
      .join(nameDetail.as("n"), col("c.creator_id") === col("n.id"), "inner")
      .join(creator.as("cr"), col("n.creator_id") === col("cr.id"), "inner")
      .select(col("c.story_id").as("story_id"),
        col("c.credit_type_id").as("credit_type_id"),
        col("cr.id").as("canonical_id"),
        col("cr.gcd_official_name").as("name"))

    // A3: compound expansion as a broadcast mapping join (one row per base)
    val mapping = expansionPairs.toDF("credit_type_id", "base_id")
    val expanded = resolved
      .join(broadcast(mapping), Seq("credit_type_id"), "inner")

    // A1/A2: per-story pivot into aligned name/id arrays per base type
    val aggs = baseStems.flatMap { case (baseId, stem) =>
      val sorted = array_sort(collect_list(when(col("base_id") === baseId,
        struct(col("canonical_id"), col("credit_type_id"), col("name")))))
      Seq(
        transform(sorted, x => x.getField("name")).as(stem),
        transform(sorted, x => x.getField("canonical_id")).as(s"${stem}_ids"))
    }
    expanded.groupBy(col("story_id")).agg(aggs.head, aggs.tail: _*)
  }
}
