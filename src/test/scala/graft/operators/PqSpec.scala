package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class PqSpec extends SparkSpec {

  test("PQ/ADC: codebook seed vectors rank themselves first") {
    // a codebook seed's subvectors quantize to themselves with distance
    // 0, so its ADC score against itself-as-query is the exact dot — and
    // for a query that IS a seed, its own reconstruction must beat
    // unrelated vectors on a separable corpus
    import spark.implicits._
    val axes = (0 until 8).map { a =>
      (a.toLong * 50, Array.tabulate(64)(i => if (i / 8 == a) 1f else 0f))
    }
    val noise = (0 until 16).map { j =>
      // far-from-axis vectors in mixed directions
      (1000L + j, Array.tabulate(64)(i => if ((i + j) % 3 == 0) -0.5f else 0.25f))
    }
    val df = (axes ++ noise).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" === 0L)
    val out = Similarity.pqTopK(df, q, "vec_id", "embedding", dim = 64,
      m = 8, k = 8, codeStride = 50, topK = 24).collect()
    assert(out.nonEmpty)
    // rank 1 for query 0 must be another axis vector (same quantization
    // cell family), not a noise vector
    val top = out.find(r => r.getAs[Long]("qid") == 0L &&
      r.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("nid") < 1000L)
  }

  test("PQ/ADC approximates the exact dot-product ranking on real data") {
    val e = Tables.load(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", dim = 64,
        m = 8, k = 16, codeStride = 50, topK = 5)
      .select(col("qid"), col("nid"))
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
      .select(col("qid").as("eqid"), col("nid").as("enid"))
    val hits = pq.join(exact,
      col("qid") === col("eqid") && col("nid") === col("enid")).count()
    val total = pq.count()
    assert(total > 0)
    // compressed-domain recall is partial by design but must beat chance
    // (5/500 per query ≈ 1%): require ≥ 20% overlap with the exact top-5
    assert(hits.toDouble / total >= 0.2, s"PQ recall too low: $hits/$total")
  }

  test("IVF-PQ results are a subset of full-corpus ADC restricted to probes") {
    val e = Tables.load(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val ivfpq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", dim = 64,
      m = 8, k = 16, codeStride = 50, centroidStride = 50,
      maxCentroids = 32, nProbe = 32, topK = 5)
    // with nProbe = maxCentroids every cluster is probed, so IVF-PQ must
    // EQUAL plain PQ — the probe restriction is the only difference
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", dim = 64,
      m = 8, k = 16, codeStride = 50, topK = 5)
    assert(ivfpq.except(pq).isEmpty && pq.except(ivfpq).isEmpty)
  }
}
