package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the STREAMING EMBEDDING near-dup ledger
 * ([[graft.streaming.EmbeddingLedger]], the q113 family) — the one
 * arrival-time signature family whose banding is RECALL-heuristic
 * (nearest-centroid routes) and whose band expression is dense vector
 * math rather than a bit trick, so its cost shape deserves its own
 * curve: the claim under test is SemDeDup's Σ|cluster|² economics at
 * arrival time — per-batch wall grows with the batch's share of its
 * centroid cells, never with batch × accumulated ledger.
 *
 * Corpus (exact by construction, dim = 128, 64 frozen centroids
 * e_0..e_63):
 *
 *   member m of cell c (id = c + 64·m) =
 *       e_c  +  e_{64 + (m mod P)}  +  0.01·e_{(c+1) mod 64}
 *
 *   - nearest centroid = c (dot 1.0), second = (c+1) mod 64
 *     (dot 0.01) — a deterministic multi-probe route per row, so no
 *     centroid becomes a global hot band;
 *   - two members of the same cell with the SAME residue (m mod P)
 *     are IDENTICAL vectors → cosine 1.0; same cell different
 *     residue → 1.0001/2.0001 ≈ 0.5; adjacent cells ≤ ~0.5 — with
 *     bar 0.9 the expected pair set is exactly "same cell, same
 *     residue": 64·P·C(M/P, 2) pairs, every score 1.0;
 *   - members arrive in CONTIGUOUS m ranges, so every dup group
 *     (M/P members sitting P apart in m) SPANS batches and the
 *     cross-batch probe is what finds the pairs.
 *
 * Stages: ingest with per-batch walls, exact pair-count + score
 * asserts, a FORGET of every cell's residue-0 first member (bounded
 * band rewrite, exact post-forget mining count).
 *
 * Usage: runMain graft.tools.EmbSoak [nPerCell] [nBatches]
 */
object EmbSoak {

  def main(args: Array[String]): Unit = {
    val mPerCell = if (args.nonEmpty) args(0).toInt else 320
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val nCells = 64
    val dim = 128
    val residues = 32
    require(mPerCell % residues == 0 && mPerCell % nBatches == 0,
      s"EmbSoak: members/cell $mPerCell must divide by residues " +
        s"$residues and batches $nBatches — the pair math assumes " +
        "complete groups and even slices")
    val groupSize = mPerCell / residues
    val n = nCells.toLong * mPerCell
    val expectedPairs =
      nCells.toLong * residues * (groupSize.toLong * (groupSize - 1) / 2)

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the frozen quantizer: pure basis vectors, driver-side literals
    // (the bounded-broadcast shape — 64 × 128 doubles)
    val centroids: Seq[(Long, Array[Double], Double)] =
      (0 until nCells).map { c =>
        val v = Array.fill(dim)(0.0); v(c) = 1.0
        (c.toLong, v, 1.0)
      }

    // member vector as a pure expression: three one-hot components
    val vecs = spark.range(n).select(
      col("id"),
      (col("id") % nCells).cast("int").as("c"),
      (col("id") / nCells).cast("int").as("m"))
      .select(col("id"), col("c"), col("m"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          when(i === col("c"), 1.0)
            .when(i === (lit(nCells) + pmod(col("m"), lit(residues))),
              1.0)
            .when(i === pmod(col("c") + 1, lit(nCells)), 0.01)
            .otherwise(0.0)).as("sig"))
      .localCheckpoint()

    println(s"== emb soak: $n vectors, $nCells cells x $mPerCell, " +
      s"$residues residues -> expect $expectedPairs pairs")

    val led = new graft.streaming.EmbeddingLedger(spark, centroids,
      nProbe = 2, minCos = 0.9, nBuckets = 64)

    val perBatch = mPerCell / nBatches
    var pairsTotal = 0L
    val walls = (0 until nBatches).map { k =>
      val batch = vecs
        .filter(col("m") >= k * perBatch && col("m") < (k + 1) * perBatch)
        .select(col("id"), col("sig")).localCheckpoint()
      val t0 = System.nanoTime()
      val p = led.observe(batch, k.toLong)
      val cnt = p.count()
      val w = (System.nanoTime() - t0) / 1e9
      // every true pair is identical vectors: score must be exactly 1.0
      val bad = p.filter(col("cos") < 1.0).count()
      assert(bad == 0, s"batch $k surfaced $bad pairs below cos 1.0 — " +
        "the corpus construction or scoring drifted")
      pairsTotal += cnt
      println(f"== batch $k: wall $w%.2fs, $cnt pairs " +
        f"(running $pairsTotal)")
      w
    }
    assert(pairsTotal == expectedPairs,
      s"accumulated $pairsTotal pairs != exact $expectedPairs")

    val early = walls.slice(1, 4).min
    val late = walls.takeRight(3).max
    println(f"== walls: early-min $early%.2fs late-max $late%.2fs " +
      f"ratio ${late / early}%.2f")
    assert(late / early < 6.0,
      f"per-batch wall grew ${late / early}%.1fx — the probe is " +
        "paying more than its centroid cells")

    // compliance forget: the m = 0 member of every cell (= residue-0
    // group's first member) — each residue-0 group drops from
    // groupSize to groupSize-1 members
    val victims = vecs.filter(col("m") === 0)
      .select(col("id"), col("sig"))
    val t0 = System.nanoTime()
    led.forget(victims, 1000L)
    println(f"== forget(${nCells} vectors) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    val after = led.minePairs().count()
    val want = expectedPairs - nCells.toLong * (groupSize - 1)
    assert(after == want,
      s"post-forget mining found $after pairs, expect $want")
    println(s"== post-forget minePairs: $after pairs (exact)")

    // DRIFT STAGE (round 15 — the AnnSoak drift stage on the streamed
    // store): the undrifted ledger must NOT fire at 3× its own
    // baseline (the calibrated-relative rule — this corpus's perfect
    // cell balance reads ~1.0, unlike the gate embeddings' 1.05-1.3 or
    // AnnSoak's positive-orthant ~6); a 10% arrival wave riding ONE
    // fixed direction (e_0 + e_1 — a region the basis quantizer gives
    // exactly two bands, so every wave member probes the SAME two
    // bands; the ones-vector trick AnnSoak uses is a no-op against a
    // one-hot basis, where 1⃗ is equidistant from every centroid)
    // collapses into those bands, crosses the bar, fires the refit,
    // and the REBANDED store must be indistinguishable from one built
    // from scratch on the refit quantizer — postings and mined pairs
    // both.
    val im0d = led.imbalance
    val bar = im0d * 3
    val dNeg = led.rebandIfDrifted(bar, centroidStride = 64,
      maxCentroids = nCells, opId = 2000L)
    require(!dNeg.fired,
      f"undrifted ledger (imbalance ${dNeg.imbalance}%.2f) fired")
    println(f"== undrifted imbalance ${dNeg.imbalance}%.2f, bar $bar%.2f " +
      "(no refit — correct)")
    // contiguous ids right after the cells, so the refit's stride
    // seeding (corpus ids % stride == 0) lands ~waveN/stride seeds
    // INSIDE the drifted region — the refit can only carve what the
    // deterministic seeding reaches
    val waveN = n / 10
    val wave = spark.range(n, n + waveN).select(
      col("id"),
      // jitter scale ±0.05, ZERO-CENTERED: big enough that
      // wave-vs-wave-seed cosines differ within the 6dp rounding the
      // band ranking uses (at 0.001 they all tie and the refit cannot
      // split the wave), small enough that every wave member's top-2
      // against the BASIS quantizer stays exactly {e_0, e_1} — and
      // centered, because positive-biased jitter makes the seed with
      // the largest jitter mass every member's best correlate (one
      // band swallows the wave again, measured: refit only reached
      // 2.8 from 3.83)
      expr(s"""transform(sequence(0, ${dim - 1}), i ->
              |  double(CASE WHEN i < 2 THEN 1.0D
              |    ELSE 0.1D * (pmod(xxhash64(id, i), 1000L) / 1000.0D
              |                 - 0.5D)
              |  END))""".stripMargin).as("sig"))
      .localCheckpoint()
    var t1 = System.nanoTime()
    led.observe(wave, 3000L)
    println(f"== drift wave ($waveN vectors) observed in " +
      f"${(System.nanoTime() - t1) / 1e9}%.2fs")
    val stride2 = ((n + waveN) / nCells).toInt
    t1 = System.nanoTime()
    val d = led.rebandIfDrifted(bar, centroidStride = stride2,
      maxCentroids = nCells, opId = 3001L)
    require(d.fired, f"drifted ledger read ${d.imbalance}%.2f <= $bar%.2f")
    val im2 = d.ledger.imbalance
    println(f"== reband fired at ${d.imbalance}%.2f in " +
      f"${(System.nanoTime() - t1) / 1e9}%.2fs; post-refit " +
      f"imbalance $im2%.2f")
    // the policy's success criterion: the statistic returns BELOW the
    // trigger bar (the next scheduled check must not re-fire on an
    // already-refit store). It does NOT return to the 1.0 fit-time
    // floor here: stride seeding picks ~59 of 64 cells, and members
    // of seedless cells re-route by their shared RESIDUE component —
    // a structural skew of THIS synthetic corpus under member-seeded
    // centroids (measured 2.79), not a drift leftover.
    require(im2 < bar && im2 < d.imbalance,
      f"refit left imbalance $im2%.2f (was ${d.imbalance}%.2f, " +
        f"bar $bar%.2f) — the refit did not re-cover the wave")
    // rebanded == from-scratch on the refit quantizer, at volume
    val quantB = d.ledger.refitQuantizer(stride2, nCells)
    val scratch = new graft.streaming.EmbeddingLedger(spark, quantB,
      nProbe = 2, minCos = 0.9, nBuckets = 64)
    scratch.observe(d.ledger.corpus, 0L)
    val mined = d.ledger.minePairs().localCheckpoint()
    val wantM = scratch.minePairs().localCheckpoint()
    val miss = wantM.except(mined).count()
    val extra = mined.except(wantM).count()
    assert(miss == 0 && extra == 0,
      s"rebanded mining differs from from-scratch: $miss missing, " +
        s"$extra extra")
    println(s"== post-reband minePairs ${mined.count()} pairs == " +
      "from-scratch ledger (exact)")
    println(s"== emb soak OK: n=$n batches=$nBatches wave=$waveN")
    spark.stop()
  }
}
