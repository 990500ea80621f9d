package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/**
 * The composed training-data curation pass — the operator chain an actual
 * pretraining pipeline runs over a raw document table:
 *
 *   quality/language filter → exact dedup → (optionally) near-dup removal
 *
 * Each stage is one of the engine's verified operators; this module wires
 * them into a single DataFrame→DataFrame pass with the staged-projection
 * idiom throughout (one tokenization per document, shared by the quality
 * features and the dedup fingerprint). Everything stays a narrow plan up
 * to the single dedup shuffle.
 */
object Curation {

  /**
   * Filter + annotate: keeps documents in `langs` whose composite quality
   * score ≥ `minQuality`, carrying the computed features
   * (pred_lang, quality, n_tokens) for downstream inspection.
   */
  def qualityFilter(docs: DataFrame, textCol: String,
      minQuality: Double, langs: Set[String]): DataFrame = {
    val staged = docs
      .withColumn("__t", TF.normalizeText(col(textCol)))
      .withColumn("__tok", TF.tokensFromNorm(col("__t")))
    val feats = staged
      .withColumn("pred_lang", TF.langIdFromTokens(col("__tok")))
      .withColumn("n_tokens", size(col("__tok")).cast("long"))
      .withColumn("quality", TF.qualityScoreFromCounts(
        col("n_tokens"),
        TF.stopwordCountFromTokens(col("__tok")),
        length(col("__t")), TF.punctCountFromNorm(col("__t"))))
    feats
      .filter(col("quality") >= minQuality &&
        col("pred_lang").isin(langs.toSeq.map(lit): _*))
      .drop("__t", "__tok")
  }

  /** The full pass: quality/language filter, then exact dedup keeping the
   * lowest id per normalized fingerprint. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
      minQuality: Double, langs: Set[String]): DataFrame =
    Dedup.exact(
      qualityFilter(docs, textCol, minQuality, langs),
      col(textCol), col(idCol))
}
