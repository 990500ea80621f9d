package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the q115 streamed-curation COMPOSITION
 * ([[graft.queries.CurationStreamQueries.curationCycle]]): quality gate →
 * near-dup ledger → incremental clustering → retro-correcting curated
 * store, driven batch-by-batch over a corpus large enough that any
 * O(state) leak in ANY stage shows up in the per-batch wall curve.
 * The gate/spec prove correctness at fixture scale; this measures the
 * claim that every cycle stage is bounded by batch + delta while all
 * three stores grow.
 *
 * Corpus: `n` docs in groups of 10 exact near-dup siblings — member
 * layout id = g + m·nGroups (m = id / nGroups) — with quality
 * assigned by (m + g) % 4 != 0 (~75%, and never a whole group, since
 * the flag varies with m). Batches arrive in DESCENDING member order
 * (batch k carries member m = nBatches−1−k), so within every group
 * the quality ids arrive LARGEST FIRST and each later arrival is a
 * new, smaller cluster representative: the retro-correction path
 * (admit → demote → delete) fires for almost every doc rather than
 * on a corner case. That yields exact arithmetic:
 *
 *   - batch 0 has no pairs: every quality doc admits as "unpaired"
 *     (the no-label branch at volume);
 *   - a quality doc is ADMITTED exactly once (on arrival it is its
 *     group's smallest-yet quality id) → distinct admitted = Q;
 *   - every quality doc except each group's minimum is later DEMOTED
 *     → distinct demoted = Q − G;
 *   - the end state is exactly each group's min quality id → kept = G
 *     (G = groups with ≥1 quality member = all groups here);
 *
 * all three asserted, plus end-state equality against the from-scratch
 * expected set and a per-batch wall ratio bound. Pair volume per batch
 * GROWS linearly (each arrival pairs with every earlier sibling), so
 * the flatness bar is generous — the failure mode under test is
 * super-linear (state-sized) growth, not the pair ramp.
 *
 * Usage: runMain graft.tools.CurationSoak [nDocs] [nBuckets]
 */
object CurationSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nBuckets = if (args.length > 1) args(1).toInt else 256
    val nBatches = 10
    require(n % 10 == 0 && n / 10 >= 1000,
      s"CurationSoak: nDocs=$n must be a multiple of 10 with >= 1000 " +
        "groups — the admit/demote arithmetic assumes complete groups")
    val nGroups = n / 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 60-bit group signature (all 10 members exact dups), quality by
    // (m + g) % 4, payloads deterministic
    val docs = spark.range(n).select(
      col("id"),
      (col("id") % nGroups).as("g"),
      // integer division: / on longs is DOUBLE in Spark SQL
      floor(col("id") / nGroups).cast("long").as("m"))
      .select(col("id"), col("g"), col("m"),
        pmod(xxhash64(concat(lit("grp:"), col("g"))), lit(1L << 60))
          .as("sig"),
        (col("id") % 100 + 1).as("n_bpe"),
        when((col("m") + col("g")) % 4 =!= 0, 0.9).otherwise(0.3)
          .as("quality"))
      .localCheckpoint()

    val totalQ = docs.filter(col("quality") >= 0.6).count()
    println(s"== curation soak: $n docs, $nGroups groups, $totalQ quality")

    val near = new graft.streaming.NearDupLedger(spark, bits = 60,
      maxHamming = 3, nBuckets = nBuckets)
    val clusters = new graft.streaming.ClusterLedger(spark,
      nBuckets = 64)
    val curated = new graft.streaming.BucketedUpsert.State(spark,
      keyCol = "id", payloadCols = Seq("n_bpe", "quality"),
      nBuckets = 64, collectMetrics = true)

    var admitted = 0L
    val walls = (0 until nBatches).map { k =>
      val m = nBatches - 1 - k // descending member order
      val qb = docs.filter(col("m") === m && col("quality") >= 0.6)
        .select(col("id"), col("sig"), col("n_bpe"), col("quality"))
        .localCheckpoint()
      val nq = qb.count()
      val t0 = System.nanoTime()
      graft.queries.CurationStreamQueries.curationCycle(spark, near,
        clusters, curated, qb, k.toLong)
      val w = (System.nanoTime() - t0) / 1e9
      admitted += nq // every arrival is its group's smallest-yet id
      println(f"== batch $k (member $m): $nq quality, wall $w%.2fs " +
        s"stages=${graft.StageTimer.json}")
      w
    }

    // per-batch wall: late vs early, generous bar (pair volume ramps
    // linearly by construction; the failure under test is state-sized
    // growth). Batch 0 has no probe/CC work — compare 1.. vs last.
    val early = walls.slice(1, 4).min
    val late = walls.takeRight(3).max
    println(f"== walls: early-min $early%.2fs late-max $late%.2fs " +
      f"ratio ${late / early}%.2f")
    assert(late / early < 6.0,
      f"per-batch wall grew ${late / early}%.1fx — a cycle stage is " +
        "paying O(state)")

    // exact lifecycle arithmetic: the committed cluster labels say who
    // was ever demoted (cluster < id ⇔ some smaller quality sibling
    // arrived after the doc — every such doc was a rep once, then
    // deleted by its demotion cycle)
    val kept = curated.view(spark).select(col("id")).localCheckpoint()
    val keptN = kept.count()
    val demotedN = clusters.store.view(spark)
      .filter(col("cluster") < col("id")).count()
    println(s"== admitted=$admitted demotedDistinct=$demotedN kept=$keptN")
    assert(admitted == totalQ,
      s"admitted $admitted != quality docs $totalQ — a doc arrived " +
        "without becoming its group's provisional representative")
    assert(demotedN == totalQ - nGroups,
      s"demoted $demotedN != Q-G ${totalQ - nGroups}")
    assert(keptN == nGroups, s"kept $keptN != groups $nGroups")

    // end state == the from-scratch expected set: min quality id per
    // group (every group has >= 7 quality members by construction)
    val want = docs.filter(col("quality") >= 0.6)
      .groupBy(col("g")).agg(min(col("id")).as("id")).select(col("id"))
    val missing = want.join(kept, Seq("id"), "left_anti").count()
    val extra = kept.join(want, Seq("id"), "left_anti").count()
    assert(missing == 0 && extra == 0,
      s"curated end state drifted: $missing missing, $extra extra")

    // the curated store's merge traffic (touched buckets per batch):
    // evidence the commits stayed bucket-routed, a sanity print rather
    // than a hard bar
    val mx = curated.metrics.map(m => (m.batchId, m.touchedBuckets)).toList
    println(s"== curated merge (batchId,touchedBuckets): $mx")

    println("== curation soak OK")
    spark.stop()
  }
}
