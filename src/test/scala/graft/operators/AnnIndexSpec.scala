package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The persisted-IVF contract behind s19: serving from the artifact is
 * bit-equal to the in-memory IVF chain, and the posting scan is
 * restricted to the PROBED partitions by dynamic partition pruning —
 * the property that makes an object-storage ANN index affordable.
 */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  test("serve-from-artifact == in-memory ivfTopK, bit for bit") {
    val root = AnnIndex.build(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32)
    val served = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5)
    val inMem = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      centroidStride = 50, nProbe = 2, k = 5, maxCentroids = 32)
    assert(served.exceptAll(inMem).isEmpty && inMem.exceptAll(served).isEmpty)
  }

  test("posting scan is dynamically partition-pruned to the probed lists") {
    val root = AnnIndex.build(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32)
    val served = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5)
    served.collect() // DPP is visible in the EXECUTED adaptive plan
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"posting scan not dynamically pruned:\n$plan")
  }

  test("maintain(build(half), rest) == build(all): frozen-quantizer append") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val rFull = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val full = AnnIndex.search(spark, rFull, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    val rInc = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    AnnIndex.maintain(spark, rInc, odds, "vec_id", "embedding")
    val inc = AnnIndex.search(spark, rInc, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(inc === full)
  }

  test("rebuild keeps the PREVIOUS generation alive, retires older ones") {
    val r1 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val r2 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    // a holder of r1's lazy search() plan must still read intact files
    assert(r1 != r2 && new java.io.File(r1).exists &&
      new java.io.File(r2).exists)
    val r3 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    assert(!new java.io.File(r1).exists, "two-generations-old not retired")
    assert(new java.io.File(r2).exists && new java.io.File(r3).exists)
  }
}
