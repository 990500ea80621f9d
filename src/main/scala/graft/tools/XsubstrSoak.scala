package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the STREAMING exact-substring ledger
 * ([[graft.streaming.ExactSubstrLedger]], q126): exact span
 * accounting at 200k docs with BOTH order classes exercised — victims
 * arriving after their source (batch-local + cross-batch losses in
 * corpus order) and victims arriving BEFORE their source (the stored
 * batch-minimum must surface as a read-derived victim once the
 * earlier occurrence lands) — plus the per-batch cost curve and the
 * maintain (flush + generation-fold) pass.
 *
 * Corpus: `n` docs of `L` globally-unique tokens each. Every doc with
 * id % 10 == 9 (and an in-range source) has its token positions
 * 8..8+S−1 replaced by positions 4..4+S−1 of doc (id − per − 1) —
 * the source sits in the PREVIOUS contiguous batch (cross-batch
 * probe), and the −1 keeps the source off the victim grid (a victim
 * source would chain plants through three docs and break the exact
 * span arithmetic). Batches are ingested PAIR-SWAPPED (1, 0, 3, 2, …)
 * so odd-batch victims arrive BEFORE their even-batch sources —
 * their windows are appended as surviving batch-minima and must be
 * re-derived as victims when the source's generation lands — while
 * even-batch victims (sources already present) are ordinary
 * cross-batch losers. The expected end state is identical either
 * way: one span (8, 8+S−1, S) per planted victim, nothing else —
 * asserted exactly.
 *
 * Cost-curve bar: arrival is BLIND-APPEND (r16 redesign — the r15
 * eager ledger read the touched fingerprints' stored minima per
 * batch, and uniformly-hashed fingerprints touch every bucket, so
 * per-batch wall grew linearly with state: measured ratio 2.62 over
 * this exact 20× growth). Per-batch work is now O(batch windows) +
 * two generation appends + two manifest writes — NOTHING reads
 * accumulated state — so the bar is FLATNESS: late/early ≤ 1.3.
 * [[graft.streaming.ExactSubstrLedger.maintain]] runs mid-stream
 * (outside the timed arrival path, as a real pipeline schedules
 * maintenance) and bounds the read-side generation count.
 *
 * Usage: runMain graft.tools.XsubstrSoak [nDocs] [nBatches]
 */
object XsubstrSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val L = 30
    val S = 16
    val minLen = 12
    require(n % nBatches == 0 && nBatches % 2 == 0,
      s"XsubstrSoak: nDocs=$n must split evenly into an even " +
        s"nBatches=$nBatches (the pair-swapped order needs pairs)")
    val per = n / nBatches
    // the source of victim v is v - per - 1; keeping it OFF the victim
    // grid ((v - per - 1) % 10 != 9) requires per % 10 != 9 — a victim
    // source would chain plants through three docs and break the exact
    // span arithmetic below with a spurious assert failure
    require(per % 10 != 9,
      s"XsubstrSoak: nDocs/nBatches=$per ends in 9 — victim sources " +
        "would themselves be victims; pick a batch size not ≡ 9 mod 10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(L - 1)),
        k => concat(lit("t"), col("id"), lit("x"), k)).as("w"))
    val srcs = base.select((col("id") + per + 1).as("id"),
      col("w").as("sw"))
    val docs = base.join(srcs, Seq("id"), "left_outer")
      .select(col("id"),
        when(col("id") % 10 === 9 && col("sw").isNotNull,
          concat(slice(col("w"), 1, 7), slice(col("sw"), 4, S),
            slice(col("w"), 8 + S, L - 7 - S)))
          .otherwise(col("w")).as("wt"))
      .select(col("id"), array_join(col("wt"), " ").as("text"))
      .localCheckpoint()

    val led = new graft.streaming.ExactSubstrLedger(spark,
      minLen = minLen, nBuckets = 256)

    // pair-swapped order: 1, 0, 3, 2, … — odd batches (copiers of
    // even-batch sources) land first, so their planted windows are
    // appended as surviving minima and must later lose at read
    val order = (0 until nBatches).map(b => if (b % 2 == 0) b + 1 else b - 1)
    val walls = order.zipWithIndex.map { case (b, op) =>
      val t0 = System.nanoTime()
      val lo = b * per
      led.ingest(
        docs.filter(col("id") >= lo && col("id") < lo + per), op.toLong)
      val w = (System.nanoTime() - t0) / 1e9
      if (op < 3 || op == nBatches / 2 || op >= nBatches - 3)
        println(f"== xsubstr: batch $b%3d (arrival $op%2d) wall $w%.2fs" +
          f" (accumulated ~${(op + 1) * per} docs)")
      // mid-stream maintenance OUTSIDE the timed arrival path, the
      // cadence a real pipeline schedules: SIZE-TIERED — each call
      // merges only the smallest generations of over-long buckets, so
      // its wall tracks recent-arrival volume, not accumulated state
      // (the full-fold maintain measured 41→80 s growth across this
      // run before r16's compactTiered)
      if ((op + 1) % 5 == 0 && op + 1 < nBatches) {
        val m0 = System.nanoTime()
        led.maintainTiered(1000L + op, fanout = 4, maxGens = 4)
        println(f"== xsubstr: tiered maintain after arrival $op%2d " +
          f"took ${(System.nanoTime() - m0) / 1e9}%.2fs")
      }
      w
    }
    // medians of the early/late windows (r16 ADVICE): min-vs-max made
    // one noisy late rep on a shared box fail a genuinely flat trend —
    // the median measures the trend, the I/O canary flags the outlier
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val early = median(walls.slice(1, 4))
    val late = median(walls.takeRight(3))
    println(f"== xsubstr: early median $early%.2fs, late $late%.2fs, " +
      f"ratio ${late / early}%.2f (fail bar: 1.3x — blind-append " +
      "arrival must be FLAT in accumulated state)")
    assert(late / early < 1.3,
      f"per-batch cost grew ${late / early}%.2fx — arrival is reading " +
        "accumulated state")

    // exact span accounting: one (8, 8+S-1, S) span per planted victim
    val spans = led.spans(spark).localCheckpoint()
    val expected = docs.filter(col("id") % 10 === 9 &&
      col("id") >= per + 1).count()
    val got = spans.count()
    val exact = spans.filter(col("span_start") === 8 &&
      col("span_end") === 7 + S && col("span_tokens") === S &&
      col("id") % 10 === 9).count()
    println(s"== xsubstr: $got spans (expect $expected), " +
      s"$exact with the exact planted shape")
    assert(got == expected && exact == expected,
      s"span accounting wrong: $got/$exact != $expected")
    // order-class evidence: roughly half the victims (the odd-batch
    // arrivals) landed before their source — count them from the
    // arrival layout; their spans are in the SAME exact set above
    // integer batch index (Column./ is double division — `div` keeps
    // the modulo-2 test meaningful)
    val beforeSource = docs.filter(col("id") % 10 === 9 &&
      expr(s"id div $per") % 2 === 1 && col("id") >= per + 1).count()
    println(s"== xsubstr: $beforeSource victims arrived before their " +
      "source (read-derived loss path) — spans identical by assert")
    assert(beforeSource > expected / 3,
      s"only $beforeSource before-source victims — the pair-swapped " +
        "order is not exercising the read-derivation path")

    // final maintain: flush + fold everything; spans must be unchanged
    val t0 = System.nanoTime()
    led.maintain(9000L)
    println(f"== xsubstr: final maintain (flush + generation fold) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    val got2 = led.spans(spark)
      .filter(col("span_start") === 8 && col("span_end") === 7 + S)
      .count()
    assert(got2 == expected, s"post-maintain spans drifted: $got2")
    println("== xsubstr: OK")
    spark.stop()
  }
}
