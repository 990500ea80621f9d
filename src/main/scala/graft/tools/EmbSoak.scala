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
    println(s"== emb soak OK: n=$n batches=$nBatches")
    spark.stop()
  }
}
