package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * Benchmark decontamination: for each held-out document, the fraction of
 * its distinct word n-grams that appear ANYWHERE in the training corpus —
 * the overlap scan run before pretraining so evaluation data can be
 * excluded from the training set (the GPT-2/GPT-3-style n-gram check).
 *
 * Scale shape: both sides reduce to DISTINCT (key, shingle) projections
 * in their scans; the probe is ONE equality join on the shingle string —
 * shuffle is sized by shingle volume, the small held-out side broadcasts
 * if it fits, and nothing quadratic exists anywhere. The corpus side is
 * deduplicated to a shingle SET first so a shingle repeated across a
 * billion documents joins once, not a billion times.
 */
object Contamination {

  /**
   * @return one row per held-out doc that HAS shingles: id, `n_shingles`,
   *         `n_hit`, `overlap`. Docs shorter than the shingle width have
   *         no n-grams to leak and are absent from the report.
   */
  def ngramOverlap(corpus: DataFrame, heldOut: DataFrame, idCol: String,
      textCol: String, shingleWords: Int = 5): DataFrame = {
    // explode_OUTER + null filter: the non-outer explode's implicit
    // `size(...) > 0` predicate would re-materialize the shingle array
    // per row in a pushed-down filter
    def shingles(df: DataFrame): DataFrame = df
      .select(col(idCol).as("id"), TF.tokens(col(textCol)).as("__tok"))
      .select(col("id"),
        explode_outer(TF.wordShinglesFromTokens(col("__tok"), shingleWords))
          .as("s"))
      .filter(col("s").isNotNull)
      .distinct()

    val corpusSet = shingles(corpus).select(col("s")).distinct()
      .withColumn("__hit", lit(1))
    val probe = shingles(heldOut)
      .join(corpusSet, Seq("s"), "left_outer")
    probe.groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_hit"))
      .select(col("id"), col("n_shingles"), col("n_hit"),
        // exact-6dp ratio (TextFunctions.ratio6): n_hit/n_shingles can
        // land on dyadic 6dp halves where engine round() modes differ
        graft.functions.TextFunctions.ratio6(col("n_hit"),
          col("n_shingles")).as("overlap"))
  }
}
