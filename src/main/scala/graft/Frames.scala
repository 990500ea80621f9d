package graft

import org.apache.spark.sql.DataFrame

/**
 * Statistics-safe eager checkpoint for ITERATIVE plans.
 *
 * `Dataset.localCheckpoint` truncates lineage but INHERITS the
 * pre-checkpoint plan's Catalyst size statistics into the resulting
 * LogicalRDD. Catalyst propagates `sizeInBytes` through a join as the
 * PRODUCT of the children's sizes (SizeInBytesOnlyStatsPlanVisitor),
 * so a maintain loop that folds a checkpointed frame back into joins
 * COMPOUNDS the BigInt geometrically: batch k's checkpoint enters
 * batch k+1's joins in several branches and the bit-length multiplies
 * ~5× per batch. Measured in the ledger repro (tools/CcRepro): the
 * labeling's sizeInBytes reached 57,000,000 BITS by batch 9 of a
 * 10-batch loop, at which point the DRIVER spends its wall Toom-Cook-
 * multiplying multi-megabit integers inside stats estimation — task
 * time flat, wall exploding ~5×/batch. A long-lived streamed ledger
 * would hang its driver after a dozen batches; this is the kind of
 * failure only an arrival-time design audit surfaces.
 *
 * The fix: rebuild the frame from the checkpointed RDD, so its stats
 * RESET to the scan default instead of inheriting the product. The
 * rebuild rides the INTERNAL row RDD (a per-partition unsafe
 * projection over the checkpoint cache — see
 * [[org.apache.spark.sql.graft.InternalFrames]]), not `c.rdd`, whose
 * external-row conversion would tax every downstream read (round-13
 * advice: the CC loop re-reads its checkpoint in 2 joins per
 * iteration). The remaining price is the loss of the inherited size
 * for STATIC broadcast planning — moot here: the inherited products
 * are astronomically above any broadcast threshold anyway (so nothing
 * broadcast-planned before either), and AQE re-plans joins from
 * RUNTIME shuffle sizes.
 */
object Frames {
  /** Eager lineage truncation + stats reset (see object doc). */
  def cp(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.InternalFrames.statsResetCopy(
      df.localCheckpoint()) // eager
}
