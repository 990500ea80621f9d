package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the expectations → quarantine → REPAIR lifecycle
 * (q102/q107/q109/q114) — the one persisted family whose evidence was
 * gate-SF only (round-13 verdict, next #5). Drives the q114 in-loop
 * body (gate check → audit → evidence aside → patch → re-audit →
 * merge) batch-by-batch over a corpus large enough that any O(state)
 * leak in the REPAIR stages shows in the per-batch wall curve: the
 * audit/patch/re-audit passes are scan-stage projections over the
 * BATCH (their cost must track batch + convicted rows), while the
 * store underneath grows linearly to `n` keys (every row is its own
 * key, so nothing amortizes into a shrinking per-user state — the
 * adversarial sizing for a "bounded by batch" claim).
 *
 * Corpus: `n` rows in `nBatches` equal batches; every batch with
 * `k % 3 == 2` is POISONED — rows with `id % 20 == 0` (5%) get a null
 * type AND the sentinel value, the q102 construction (corrupt
 * payloads on valid keys that would silently land without a gate).
 * Exact arithmetic, all asserted:
 *
 *   - exactly the poisoned batches trip the gate (the clean ones
 *     merge straight through — no false positives at volume);
 *   - convicted rows per poisoned batch = the 5% construction, and
 *     the evidence dir holds exactly the poisoned batches' audits;
 *   - END STATE ≡ the from-scratch expected corpus (all rows, with
 *     the declared patches applied to exactly the poisoned rows) —
 *     exceptAll in both directions;
 *   - WALL BOUND: the repair stages' wall on the LAST poisoned batch
 *     vs the FIRST stays under a generous flatness bar while state
 *     grew ~10×, and the gate-check wall on clean batches likewise.
 *
 * Usage: runMain graft.tools.RepairSoak [nRows] [nBuckets]
 */
object RepairSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val nBuckets = if (args.length > 1) args(1).toInt else 64
    val nBatches = 10
    require(n % (nBatches * 20L) == 0 && n / nBatches >= 10000,
      s"RepairSoak: nRows=$n must be a multiple of ${nBatches * 20} " +
        "with >= 10k rows/batch — the 5% conviction arithmetic and " +
        "the wall curve both assume full batches")
    val batchSize = n / nBatches
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Expectations

    val rules = Seq(
      Expectations.Rule("type_known", col("event_type").isNotNull),
      Expectations.Rule("value_not_sentinel", col("value") =!= -9999.0))
    val budgets = Map("type_known" -> 0.0, "value_not_sentinel" -> 0.0)
    val patches = Map(
      "type_known" -> Map("event_type" -> lit("repaired")),
      "value_not_sentinel" -> Map("value" -> lit(0.0)))

    def isPoisonedBatch(k: Long): Boolean = k % 3 == 2
    // the clean shape of the corpus; poisoned batches corrupt 5%
    def cleanRows(k: Long) = spark.range(k * batchSize, (k + 1) * batchSize)
      .select(col("id"), concat(lit("t"), col("id") % 7).as("event_type"),
        (col("id") % 1000).cast("double").as("value"))
    def batchRows(k: Long) = {
      val c = cleanRows(k)
      if (!isPoisonedBatch(k)) c
      else c.select(col("id"),
        when(col("id") % 20 === 0, lit(null).cast("string"))
          .otherwise(col("event_type")).as("event_type"),
        when(col("id") % 20 === 0, lit(-9999.0))
          .otherwise(col("value")).as("value"))
    }

    val state = new graft.streaming.BucketedUpsert.State(spark,
      keyCol = "id", payloadCols = Seq("event_type", "value"),
      nBuckets = nBuckets)
    val qdir = graft.sources.Scratch.dir("repair_soak_quarantine")

    println(s"== repair soak: $n rows, $nBatches batches, " +
      s"${batchSize / 20} convicted per poisoned batch")
    var convictedTotal = 0L
    var tripped = 0
    val walls = (0L until nBatches).map { k =>
      val b = batchRows(k).localCheckpoint()
      val t0 = System.nanoTime()
      var repairWall = 0.0
      Expectations.check(b, rules, budgets) match {
        case None =>
          require(!isPoisonedBatch(k),
            s"batch $k is poisoned but the gate passed it")
          state.merge(b, k)
        case Some(_) =>
          require(isPoisonedBatch(k),
            s"batch $k is clean but the gate tripped")
          tripped += 1
          val r0 = System.nanoTime()
          val audited = Expectations.audit(b, rules).localCheckpoint()
          audited.filter(size(col("violations")) > 0)
            .write.mode("append").parquet(qdir)
          val (readmitted, unrepairable) =
            Expectations.repair(audited, rules, patches)
          require(unrepairable.isEmpty,
            s"batch $k: repair left still-violating rows")
          val nc = audited.filter(size(col("violations")) > 0).count()
          require(nc == batchSize / 20,
            s"batch $k convicted $nc rows, expected ${batchSize / 20}")
          convictedTotal += nc
          repairWall = (System.nanoTime() - r0) / 1e9
          state.merge(readmitted.localCheckpoint(), k)
      }
      val w = (System.nanoTime() - t0) / 1e9
      println(f"== batch $k: wall $w%.2fs repair $repairWall%.2fs " +
        s"poisoned=${isPoisonedBatch(k)}")
      (k, w, repairWall)
    }

    require(tripped == (0L until nBatches).count(isPoisonedBatch),
      s"$tripped batches tripped the gate")
    require(convictedTotal == tripped * (batchSize / 20),
      s"convicted $convictedTotal != ${tripped * (batchSize / 20)}")
    // evidence: exactly the convicted rows, with their violation lists
    val evidence = spark.read.parquet(qdir)
    require(evidence.count() == convictedTotal &&
      evidence.filter(size(col("violations")) === 0).count() == 0,
      "quarantine evidence does not hold exactly the convicted rows")

    // end state ≡ from-scratch: every row, with the declared patches
    // applied to exactly the poisoned rows
    val expected = (0L until nBatches).map { k =>
      val c = cleanRows(k)
      if (!isPoisonedBatch(k)) c
      else c.select(col("id"),
        when(col("id") % 20 === 0, lit("repaired"))
          .otherwise(col("event_type")).as("event_type"),
        when(col("id") % 20 === 0, lit(0.0))
          .otherwise(col("value")).as("value"))
    }.reduce(_ unionByName _)
    val got = state.view(spark)
      .select(col("id"), col("event_type"), col("value"))
    require(got.exceptAll(expected).isEmpty &&
      expected.exceptAll(got).isEmpty,
      "end state differs from the from-scratch patched corpus")

    // wall flatness: repair stages on poisoned batches (state grew
    // ~10× between the first and last), and gate checks on clean ones.
    // Generous bars — the failure mode under test is O(state) growth,
    // not constant-factor noise.
    val poisoned = walls.filter(t => isPoisonedBatch(t._1))
    val repairEarly = poisoned.head._3
    val repairLate = poisoned.last._3
    val clean = walls.filterNot(t => isPoisonedBatch(t._1))
    val checkEarly = clean.slice(1, 3).map(_._2).min
    val checkLate = clean.takeRight(2).map(_._2).max
    println(f"== repair walls: first ${repairEarly}%.2fs " +
      f"last ${repairLate}%.2fs ratio ${repairLate / repairEarly}%.2f; " +
      f"clean-batch walls: early $checkEarly%.2fs late $checkLate%.2fs " +
      f"ratio ${checkLate / checkEarly}%.2f")
    assert(repairLate / repairEarly < 4.0,
      f"repair wall grew ${repairLate / repairEarly}%.1fx while state " +
        "grew — a repair stage is paying O(state)")
    assert(checkLate / checkEarly < 4.0,
      f"clean-batch wall grew ${checkLate / checkEarly}%.1fx — the " +
        "gate check is paying O(state)")
    println("== repair soak OK")
    spark.stop()
  }
}
