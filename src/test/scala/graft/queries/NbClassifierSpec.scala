package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** The q124 classifier's LEARNED-SIGNAL property — the one thing the
 * oracle hash (which proves arithmetic reproducibility) cannot say:
 * the distilled NB actually predicts its teacher. On the held-out
 * intake (docs the training never saw), agreement with the heuristic
 * label must beat the majority-class baseline — otherwise the "trained
 * gate" is a constant and the q125 composition is vacuous. Measured at
 * sf0.01: 74% agreement vs 65% majority. */
class NbClassifierSpec extends SparkSpec {

  test("distilled NB beats the majority-class baseline on held-out docs") {
    val dir = sf("sf0.01")
    val pred = graft.SparkEntry.queries("q124_nb_quality_score")(
      spark, dir).select(col("doc_id"), col("pred"))
    val teacher = graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), TF.normalizeText(col("text")).as("__t"))
      .select(col("doc_id"), col("__t"),
        TF.tokensFromNorm(col("__t")).as("__tok"))
      .select(col("doc_id"),
        (TF.qualityScoreFromCounts(
          size(col("__tok")).cast("long"),
          TF.stopwordCountFromTokens(col("__tok")),
          length(col("__t")),
          TF.punctCountFromNorm(col("__t"))) >= 0.6).as("y"))
    val j = teacher.join(pred, Seq("doc_id"))
      .select(col("y"), col("pred")).localCheckpoint()
    val n = j.count().toDouble
    val agree = j.filter(col("y") === col("pred")).count() / n
    val posRate = j.filter(col("y")).count() / n
    val majority = math.max(posRate, 1 - posRate)
    assert(agree > majority,
      f"NB agreement $agree%.3f does not beat the majority baseline " +
        f"$majority%.3f — the trained gate learned nothing")
    assert(agree >= 0.70,
      f"NB agreement $agree%.3f below the measured 0.74 floor")
  }
}
