package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the dedup stack: synthesizes a deterministic corpus
 * with spark.range (no driver-side data, no files), then runs exact
 * dedup, MinHash/LSH pair generation and SimHash Hamming pairs at a
 * volume where a quadratic candidate join, a skewed bucket, or a
 * driver-bound collect is immediately obvious in the wall times.
 *
 * Corpus shape: `n` docs in `n/10` content groups; group g's members are
 * ids ≡ g (mod n/10), and the k=0 member (id < n/10) carries a per-doc
 * suffix — so every group is exactly 9 verbatim copies + 1 near-dup
 * variant, and `distinct texts = 2 · n/10` (one shared text + one
 * variant text per group), asserted below.
 *
 * Usage: runMain graft.tools.DedupSoak [nDocs] [simhashBits]
 * (simhashBits exists to DEMONSTRATE the width cliff — e.g. 16 — the
 * default is the 60-bit scale configuration.)
 */
object DedupSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val simhashBits = if (args.length > 1) args(1).toInt else 60
    val nGroups = n / 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 24 pseudo-words per doc derived from the group id — identical
    // inside a group, disjoint-ish across groups
    val words = (0 until 24).map(w =>
      conv(substring(md5(concat(lit("w:"), col("id") % nGroups,
        lit(s":$w"))), 1, 5), 16, 10))
    // id % 10 would be fully correlated with the group id (nGroups is a
    // multiple of 10) — id < nGroups picks exactly ONE member per group
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      when(col("id") < nGroups,
        concat(concat_ws(" ", words: _*), lit(" variant "), col("id")))
        .otherwise(concat_ws(" ", words: _*)).as("text"))
      .cache()
    docs.count() // materialize so each stage times itself, not the synth

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val distinctTexts = docs.select(countDistinct(col("text")))
      .head().getLong(0)
    assert(distinctTexts == 2 * nGroups,
      s"corpus shape broken: $distinctTexts distinct texts")
    val survivors = timed("exact dedup")(
      graft.operators.Dedup.exact(docs, col("text"), col("doc_id")).count())
    println(s"==   docs=$n distinct=$distinctTexts survivors=$survivors")
    assert(survivors == distinctTexts, "exact dedup must keep one per text")

    val mh = timed("minhash lsh pairs")(
      graft.operators.Dedup.minHashPairs(docs, "doc_id", "text").count())
    println(s"==   minhash candidate pairs: $mh")
    assert(mh > 0, "exact-dup groups must collide in every band")

    // At 100k docs a 16-bit signature is saturated (hamming<=3 balls of
    // unrelated groups overlap) and its 4-bit band keys bucket-join
    // quadratically; 60 bits (hash60's full width) with 15-bit bands
    // keeps collisions to real near-dups. Run with simhashBits=16 to
    // watch the cliff.
    val sh = timed(s"simhash hamming pairs ($simhashBits-bit)")(
      graft.operators.Dedup.simHashPairs(docs, "doc_id", "text",
        bits = simhashBits, maxHamming = 3).count())
    println(s"==   simhash pairs (hamming<=3): $sh")
    assert(sh > 0)
    // the scale property under test (60-bit config): pair count stays
    // linear-ish in n (within-group pairs), never corpus-quadratic
    if (simhashBits >= 60)
      assert(sh < n * 50, s"simhash pair blowup: $sh pairs for $n docs")

    // clustering + survivor selection on top of the minhash pairs (the
    // p02 path): every doc must land in exactly one cluster, and the
    // per-cluster member counts must add back up to the corpus — the
    // invariant that catches a label-propagation bug (dropped nodes,
    // double-counted members) that pair counts alone cannot see
    timed("clusters + survivors") {
      val pairs = graft.operators.Dedup.minHashPairs(docs, "doc_id", "text")
      val clusters = graft.operators.Dedup.connectedComponents(pairs)
      val labeled = docs.select(col("doc_id"))
        .join(clusters, docs("doc_id") === clusters("id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
      val byCluster = labeled.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_members"))
      val (nClusters, nMembers) = {
        val r = byCluster.agg(count(lit(1)), sum(col("n_members"))).head()
        (r.getLong(0), r.getLong(1))
      }
      println(s"==   clusters=$nClusters members=$nMembers")
      assert(nMembers == n, s"survivor accounting lost docs: $nMembers != $n")
      // each content group is one cluster (9 copies + 1 near-dup variant
      // sharing every band) — cluster count must be ~nGroups: an
      // under-merge leaves ~n singletons, an over-merge (min-label
      // leaking across groups) collapses toward 1; bound it BOTH ways
      assert(nClusters <= nGroups * 2,
        s"clustering failed to merge groups: $nClusters clusters")
      assert(nClusters >= nGroups / 2,
        s"clustering over-merged disjoint groups: $nClusters clusters " +
          s"for $nGroups content groups")
    }

    // semantic dedup (d10 path) at volume: synthetic embeddings with
    // planted exact-duplicate pairs — ids ≡ 0 (mod 10) share their
    // vector with id+1 (cos = 1.0 after 6dp rounding), everything else
    // is md5-pseudo-random 16-dim noise. The soak asserts (a) every
    // planted duplicate is dropped, (b) total kept+dropped accounting
    // holds, and (c) wall time stays in the per-cluster-quadratic
    // envelope, not corpus-quadratic.
    timed("semantic dedup (embeddings)") {
      val dim = 16
      val nv = math.min(n, 100000L)
      // base id: duplicates (id % 10 == 1) reuse id-1's vector
      val baseId = when(col("id") % 10 === 1, col("id") - 1)
        .otherwise(col("id"))
      val dims = (0 until dim).map(d =>
        ((conv(substring(md5(concat(lit(s"e:$d:"), baseId)), 1, 5), 16, 10)
          .cast("long") % 2000L) / 1000.0 - 0.5).cast("float"))
      val emb = spark.range(nv).select(col("id").as("vec_id"),
        array(dims: _*).as("embedding")).cache()
      emb.count()
      val out = graft.operators.SemanticDedup.dedup(emb, "vec_id",
        "embedding", centroidStride = 997, maxCentroids = 64,
        minCos = 0.999999).cache()
      val dropped = out.filter(!col("keep")).count()
      val kept = out.filter(col("keep")).count()
      println(s"==   vectors=$nv kept=$kept dropped=$dropped")
      assert(kept + dropped == nv, "semantic dedup lost vectors")
      // every planted duplicate (vec, vec+1) lands in the same cluster
      // (identical vectors assign identically) and must be dropped
      val planted = nv / 10
      assert(dropped >= planted,
        s"planted duplicates not dropped: $dropped < $planted")
      emb.unpersist(); out.unpersist()
    }

    spark.stop()
  }
}
