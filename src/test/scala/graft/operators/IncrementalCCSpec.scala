package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental connected components: maintain(cc(G_old), E_new) must
 * equal cc(G_old ∪ E_new) EXACTLY — labels are min member ids, and
 * contracting components preserves connectivity. The driver-gated q88
 * hash-proves one split cross-engine; these pin the algebra across
 * randomized graphs and the degenerate batches.
 */
class IncrementalCCSpec extends SparkSpec {

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Deterministic pseudo-random edge list: n edges over ~v vertices. */
  private def edges(seed: Long, n: Int, v: Int): DataFrame =
    spark.range(n).select(
      pmod(xxhash64(col("id") + lit(seed)), lit(v.toLong)).as("src"),
      pmod(xxhash64(col("id") * 31 + lit(seed * 7 + 1)), lit(v.toLong))
        .as("dst"))

  test("randomized: maintain(cc(old), new) == cc(all) across seeds/splits") {
    for (seed <- Seq(1L, 2L, 3L); frac <- Seq(10, 2)) {
      val all = edges(seed, 400, 600).localCheckpoint(true)
      // every frac-th edge arrives late
      val withIdx = all.withColumn("__i",
        monotonically_increasing_id())
      val old = withIdx.filter(col("__i") % frac =!= 0).drop("__i")
      val batch = withIdx.filter(col("__i") % frac === 0).drop("__i")
      // critical-regime random graphs have diameter ≫ 20 — give the
      // label propagation room (the loop early-stops at fixpoint, so a
      // generous bound costs nothing once converged)
      val prev = Dedup.connectedComponents(GraphEdges.canonical(old),
        maxIter = 200)
      val got = labelsOf(IncrementalCC.maintain(prev, batch,
        maxIter = 200))
      val want = labelsOf(Dedup.connectedComponents(
        GraphEdges.canonical(all), maxIter = 200))
      assert(got == want,
        s"seed=$seed frac=$frac: incremental labels diverge from scratch")
    }
  }

  test("multi-batch fold from empty labeling == cc(all) (the q89 shape)") {
    val all = edges(11L, 500, 700).localCheckpoint(true)
    val withIdx = all.withColumn("__i", monotonically_increasing_id())
    var labels = spark.range(0).select(col("id"), col("id").as("cluster"))
    for (k <- 0 until 5) {
      labels = IncrementalCC.maintain(labels,
          withIdx.filter(col("__i") % 5 === k).drop("__i"), maxIter = 200)
        .localCheckpoint(true)
    }
    assert(labelsOf(labels) == labelsOf(Dedup.connectedComponents(
      GraphEdges.canonical(all), maxIter = 200)),
      "five-batch fold diverges from single-shot cc")
  }

  test("empty batch is the identity; empty prior labeling is a full cc") {
    val all = edges(9L, 200, 300).localCheckpoint(true)
    val prev = Dedup.connectedComponents(GraphEdges.canonical(all))
    val empty = spark.range(0).select(col("id").as("src"),
      col("id").as("dst"))
    assert(labelsOf(IncrementalCC.maintain(prev, empty)) == labelsOf(prev),
      "empty batch changed the labeling")
    val noLabels = spark.range(0).select(col("id"), col("id").as("cluster"))
    assert(labelsOf(IncrementalCC.maintain(noLabels, all)) ==
      labelsOf(prev), "maintain from empty labeling != full cc")
  }

  test("intra-component batch: contracted edges vanish, labels unchanged") {
    val all = edges(5L, 300, 400).localCheckpoint(true)
    val prev = Dedup.connectedComponents(GraphEdges.canonical(all))
      .localCheckpoint(true)
    // a batch of edges BETWEEN vertices already sharing a component —
    // they contract to self-loops, so the merge table is empty and the
    // labeling must come back exactly
    val sameComp = prev.as("x").join(prev.as("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("src"), col("y.id").as("dst"))
      .limit(100)
    assert(labelsOf(IncrementalCC.maintain(prev, sameComp)) ==
      labelsOf(prev), "intra-component batch changed labels")
  }
}
