package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

class SemanticDedupSpec extends SparkSpec {

  test("semantic dedup: keep/drop partition is exact on a planted corpus") {
    import spark.implicits._
    // three planted groups along axes + one exact duplicate pair
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f)),   // near-dup of 0
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 0f)),
      (4L, Array(1f, 0f, 0f, 0f)),         // exact dup of 0
      (5L, Array(0f, -1f, 0f, 0f)))        // anti-parallel to 2: not a dup
    val df = rows.toDF("vec_id", "embedding")
    val out = SemanticDedup.dedup(df, "vec_id", "embedding",
        centroidStride = 2, maxCentroids = 3, minCos = 0.95)
      .orderBy($"vid").collect()

    val keep = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("vid"))
    val dropped = out.filterNot(_.getAs[Boolean]("keep"))
      .map(r => r.getAs[Long]("vid") -> r.getAs[Long]("dup_of")).toMap
    // 1 and 4 collapse onto 0; everything else survives (5 lands in
    // cluster 0 — its best cosine is 0.0, tied between centroids 0 and
    // 4, ties to lower cid — and scores ≤ 0 against every cluster-mate)
    assert(keep.toSet == Set(0L, 2L, 3L, 5L))
    assert(dropped == Map(1L -> 0L, 4L -> 0L))
  }

  test("within-cluster pairs only: dup_of is always in the same cluster") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val out = SemanticDedup.dedup(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32, minCos = 0.4)
    val byId = out.select(col("vid"), col("cid"))
    val joined = out.filter(col("dup_of").isNotNull)
      .select(col("vid"), col("cid").as("drop_cid"), col("dup_of"))
      .join(byId.select(col("vid").as("dup_of"), col("cid").as("surv_cid")),
        "dup_of")
    assert(joined.filter(col("drop_cid") =!= col("surv_cid")).isEmpty)
    // survivor policy: dup_of is a smaller id that itself has cos >= thr
    assert(joined.filter(col("dup_of") >= col("vid")).isEmpty)
  }
}
