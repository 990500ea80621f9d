package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with id tiebreak") {
    val q = vecs.filter($"vec_id" === 0)
    val got = Similarity.cosineTopK(vecs, q, "vec_id", "embedding", k = 2)
      .orderBy($"rank").select($"nid").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L)) // 1 is closest; 2/3/4 tie at ~0, id order
  }

  test("ivf with full probe coverage matches brute force top-1") {
    val q = vecs.filter($"vec_id" % 2 === 0)
    val brute = Similarity.cosineTopK(vecs, q, "vec_id", "embedding", k = 1)
      .select($"qid", $"nid").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(vecs, q, "vec_id", "embedding",
      centroidStride = 2, nProbe = 3, k = 1)
      .select($"qid", $"nid").as[(Long, Long)].collect().toMap
    assert(ivf == brute)
  }

  test("heap-aggregate ranking matches the window formulation exactly") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    val got = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    // same scored pairs through the window-based reference path
    val v = e.select($"vec_id".as("nid"), $"embedding".as("nv"))
    val qq = q.select($"vec_id".as("qid"), $"embedding".as("qv"))
    val scored = v.join(qq, $"nid" =!= $"qid")
      .select($"qid", $"nid",
        round(graft.functions.VectorFunctions.cosine($"qv", $"nv"), 6).as("cos"))
    val want = Similarity.rankedViaWindow(scored, 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("approximate paths keep useful recall vs brute force on real vectors") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 50 === 0)
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"qid", $"nid").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(Similarity.cosineTopK(e, q, "vec_id", "embedding", 5))
    val ivf = topSets(Similarity.ivfTopK(e, q, "vec_id", "embedding",
      centroidStride = 50, nProbe = 4, k = 5))
    val ivfRecall = brute.keys.toSeq.map { k =>
      ivf.getOrElse(k, Set.empty).intersect(brute(k)).size / 5.0
    }.sum / brute.size
    // multi-probe IVF over 10 centroids should recover most true neighbors
    assert(ivfRecall > 0.5, s"ivf recall@5 = $ivfRecall")
    // LSH trades recall for candidate-set size; it must stay truthful
    // (only real neighbors, correct scores) even when recall is partial
    val lsh = topSets(Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, bits = 4, k = 5))
    assert(lsh.values.forall(_.nonEmpty))
  }

  test("kmeans step: partition covers all vectors, means are per-cluster") {
    // stride 2 → centroids {0, 2, 4} (the three axis-ish vectors)
    val step = Similarity.kmeansStep(vecs, "vec_id", "embedding",
      centroidStride = 2, maxCentroids = 8)
      .orderBy($"cid").collect()
    // every vector lands in exactly one cluster
    assert(step.map(_.getLong(1)).sum == 5L)
    val byCid = step.map(r => r.getLong(0) ->
      (r.getLong(1), r.getSeq[Double](2).toList)).toMap
    assert(byCid.keySet == Set(0L, 2L, 4L))
    // cluster 0 = {v0, v1} → mean of (1,0,0) and (0.9,0.1,0)
    assert(byCid(0L)._1 == 2L)
    assert(byCid(0L)._2.head == (1.0 + 0.9) / 2)
    // singleton cluster 4 reproduces its own vector through the decimal path
    assert(byCid(4L) == ((1L, List(0.0, 0.0, 1.0))))
    // deterministic across runs
    val again = Similarity.kmeansStep(vecs, "vec_id", "embedding",
      centroidStride = 2, maxCentroids = 8).orderBy($"cid").collect()
    assert(again.map(_.toString).toSeq == step.map(_.toString).toSeq)
  }

  test("lsh results are a subset of brute-force candidates with same scores") {
    val q = vecs.filter($"vec_id" === 0)
    val brute = Similarity.cosineTopK(vecs, q, "vec_id", "embedding", k = 4)
      .select($"nid", $"cos").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(vecs, q, "vec_id", "embedding", dim = 3,
      bits = 2, k = 4)
      .select($"nid", $"cos").as[(Long, Double)].collect().toMap
    assert(lsh.keySet.subsetOf(brute.keySet))
    lsh.foreach { case (n, c) => assert(c == brute(n)) }
  }

  test("sq8 clamps out-of-range query values to the 0..255 grid") {
    // corpus dims span [0, 1]; the query sits far outside on every dim —
    // without the clamp its codes leave the grid (e.g. (100-0)*255) and
    // the max score blows past the representable-code bound
    val q = Seq((99L, Array(100.0f, -100.0f, 100.0f)))
      .toDF("vec_id", "embedding")
    val maxScore = Similarity.sq8TopK(vecs, q, "vec_id", "embedding", k = 5)
      .agg(max($"score")).as[Long].head()
    assert(maxScore >= 0 && maxScore <= 3L * 255 * 255,
      s"score $maxScore outside the clamped-code bound")
  }

  test("sq8 ranking is deterministic with integer-tie id ordering") {
    val q = vecs.filter($"vec_id" === 0)
    val got = Similarity.sq8TopK(vecs, q, "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"nid").as[Long].collect()
    assert(got.length == 4 && got.distinct.length == 4)
  }

  test("ivf-sq8 with full probe coverage matches flat sq8 exactly") {
    // probing every centroid list makes the candidate set = full corpus,
    // so the composed path must reproduce the flat scan bit-for-bit
    // (same codes, same integer scores, same tie ordering)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rank", $"nid", $"score")
        .as[(Long, Long, Long, Long)].collect().toSet
    val flat = rows(Similarity.sq8TopK(e, q, "vec_id", "embedding", k = 5))
    val composed = rows(Similarity.ivfSq8TopK(e, q, "vec_id", "embedding",
      centroidStride = 100, maxCentroids = 4, nProbe = 4, k = 5))
    assert(composed == flat)
  }

  test("rerank with full probe + candidate coverage equals brute force") {
    // candK ≥ corpus and every list probed → stage 1 passes every vector
    // through; the exact re-rank must then reproduce cosineTopK exactly
    // (scores AND tie ordering)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rank", $"nid", $"cos")
        .as[(Long, Int, Long, Double)].collect().toSet
    val brute = rows(Similarity.cosineTopK(e, q, "vec_id", "embedding", 5))
    val rr = rows(Similarity.rerankTopK(e, q, "vec_id", "embedding",
      centroidStride = 100, maxCentroids = 4, nProbe = 4,
      candK = 100000, k = 5))
    assert(rr == brute)
  }

  test("rerank beats or matches its own stage-1 ordering on exact scores") {
    // the exact top-5 of the candidate set is at least as good as the
    // compressed ordering: every reranked score must equal the true
    // cosine (stage 2 is exact), and results are candidates of stage 1
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    val cand = Similarity.ivfSq8TopK(e, q, "vec_id", "embedding",
        centroidStride = 50, maxCentroids = 32, nProbe = 2, k = 20)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val exact = Similarity.cosineTopK(e, q, "vec_id", "embedding", 1000)
      .select($"qid", $"nid", $"cos").as[(Long, Long, Double)]
      .collect().map { case (a, b, c) => (a, b) -> c }.toMap
    val rr = Similarity.rerankTopK(e, q, "vec_id", "embedding",
        centroidStride = 50, maxCentroids = 32, nProbe = 2,
        candK = 20, k = 5)
      .select($"qid", $"nid", $"cos").as[(Long, Long, Double)].collect()
    assert(rr.nonEmpty)
    rr.foreach { case (qid, nid, c) =>
      assert(cand.contains((qid, nid)), s"($qid,$nid) not a stage-1 candidate")
      assert(exact.get((qid, nid)).contains(c), s"($qid,$nid) score not exact")
    }
  }

  test("recall floors: rerank recovers what compressed-domain ordering loses") {
    // the s14/s15/s16 quality contract, pinned in-JVM so a quantizer or
    // probe regression fails before the gate: s11's INTEGER-dot ordering
    // (unnormalized, quantized) diverges from cosine truth — that gap is
    // exactly what the exact-cosine rerank stage exists to close, so
    // rerank recall must dominate compressed-domain recall, and both
    // must clear conservative absolute floors (sf0.001 observed: 0.10 /
    // 0.30 / 0.56)
    val reg = graft.SparkEntry.queries
    def mean(name: String): Double = {
      val r = reg(name)(spark, sf())
        .agg(avg($"recall_at_5")).as[Double].head()
      r
    }
    val sq8 = mean("s14_recall_ivfsq8")
    val rerank = mean("s15_recall_rerank")
    val filtered = mean("s16_recall_filtered")
    assert(rerank >= sq8,
      s"rerank recall $rerank below compressed-domain recall $sq8")
    assert(sq8 >= 0.05, s"ivf-sq8 recall floor broken: $sq8")
    assert(rerank >= 0.2, s"rerank recall floor broken: $rerank")
    assert(filtered >= 0.3, s"filtered rerank recall floor broken: $filtered")
    // s18: the PQ-candidate rerank (sf0.001 observed: 0.74)
    val pqRerank = mean("s18_recall_ivfpq_rerank")
    assert(pqRerank >= 0.3, s"ivf-pq rerank recall floor broken: $pqRerank")
  }

  test("ivf-sq8 with partial probes returns a truthful subset") {
    // fewer probes → candidates only from probed lists; every returned
    // (qid, nid, score) must carry the SAME integer score the flat scan
    // assigns that pair (compression is shared, only candidates shrink)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = e.filter($"vec_id" % 100 === 0)
    val flat = Similarity.sq8TopK(e, q, "vec_id", "embedding", k = 1000)
      .select($"qid", $"nid", $"score").as[(Long, Long, Long)]
      .collect().map { case (a, b, s) => (a, b) -> s }.toMap
    val part = Similarity.ivfSq8TopK(e, q, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32, nProbe = 2, k = 5)
      .select($"qid", $"nid", $"score").as[(Long, Long, Long)].collect()
    assert(part.nonEmpty)
    part.foreach { case (qid, nid, s) =>
      assert(flat.get((qid, nid)).contains(s), s"($qid,$nid) score mismatch")
    }
  }
}
