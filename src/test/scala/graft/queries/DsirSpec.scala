package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q127 resampler's SELECTION property — the thing the oracle hash
 * (arithmetic reproducibility) cannot say: Gumbel-top-k over the
 * importance keys actually enriches toward the target distribution.
 * At sf0.01 the candidate pool's mean log-importance is −0.22
 * (sd 2.65) and the selected 200's is +1.55 — a ~0.67 sd shift that
 * survives the noise (the Gumbel band spans ~4.1 nats). If selection
 * were noise-dominated the two means would coincide and DSIR would be
 * uniform sampling in disguise. */
class DsirSpec extends SparkSpec {

  test("Gumbel-top-k enriches selected docs toward the target " +
      "distribution (selected mean importance beats the pool's)") {
    val dir = sf("sf0.01")
    val pool = ClassifierQueries.dsirKeyed(spark, dir)
      .select(col("doc_id"), col("__s").cast("double").as("s"))
      .localCheckpoint()
    val sel = graft.SparkEntry.queries("q127_dsir_select")(spark, dir)
      .select(col("doc_id"), col("score"))
    val poolMean = pool.agg(avg(col("s"))).head().getDouble(0)
    val selMean = sel.agg(avg(col("score"))).head().getDouble(0)
    val n = sel.count()
    assert(n == 200L, s"expected the k=200 cut to bind, got $n")
    assert(selMean > poolMean + 1.0,
      f"selected mean $selMean%.3f vs pool mean $poolMean%.3f — " +
        "below the measured ~1.77 enrichment margin; the resampler " +
        "is not selecting on importance")
    // the cut is a real subset: some candidate was left behind
    assert(pool.count() > n)
  }
}
