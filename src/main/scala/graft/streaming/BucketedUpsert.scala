package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Scratch

/**
 * Partition-pruned incrementally-maintained "latest row per key" view —
 * the streaming-upsert state layout that bounds per-micro-batch cost by
 * the BATCH, not by accumulated state size.
 *
 * State is parquet partitioned into `nBuckets` key buckets
 * (`pmod(key, n)` — a pure function of the key, so a key lives in
 * exactly one bucket forever). Each micro-batch:
 *
 *   1. reduces the batch to its per-key latest row (map-side combinable
 *      aggregate over the batch only);
 *   2. computes the TOUCHED bucket set from those keys (a bounded
 *      ≤nBuckets-element driver list — same driver-side-scalar shape as
 *      a runtime Bloom filter, not a data collect);
 *   3. reads ONLY the touched buckets' current state partitions, merges,
 *      and writes new versions of just those buckets;
 *   4. carries every untouched bucket over BY POINTER — zero I/O.
 *
 * This is `Scd2.maintain`'s partition-upsert strategy applied to
 * streaming state (and the mechanism table formats' MERGE INTO relies
 * on: rewrite matched files only). The naive alternative — union the
 * batch with the FULL state and rewrite all of it — pays O(state) per
 * micro-batch and fails at 100 TB of keyed state; here a batch touching
 * k of n buckets pays O(batch + state·k/n). Superseded bucket versions
 * are deleted as soon as the replacing write commits, so disk holds one
 * live generation per bucket (plus the in-flight write).
 *
 * The per-bucket current-version pointers live on the driver (bounded:
 * nBuckets strings). A production deployment would instead commit them
 * to a transaction log next to the checkpoint (Delta/Iceberg formalize
 * exactly this); the merge plan — the part that scales — is identical.
 */
object BucketedUpsert {

  /** Per-batch evidence for the soak: what the merge actually read. */
  final case class BatchMetrics(batchId: Long, touchedBuckets: Int,
      stateRowsRead: Long, wallMs: Long)

  /**
   * Mutable state handle for one upsert view. `payloadCols` order
   * defines "latest": the per-key max of `struct(payloadCols)` wins
   * (put the event-time column first, a unique id second as tiebreak).
   *
   * @param collectMetrics when true (soak), each merge also counts the
   *   state rows it read — an extra pass over the TOUCHED buckets only,
   *   left off in gated runs.
   */
  final class State(ss: SparkSession, keyCol: String,
      payloadCols: Seq[String], nBuckets: Int,
      collectMetrics: Boolean = false) {

    private val root = Scratch.dir("upsert_state")
    private val current = mutable.Map.empty[Int, String]
    val metrics: mutable.ArrayBuffer[BatchMetrics] = mutable.ArrayBuffer()

    private def bucketOf = pmod(col(keyCol), lit(nBuckets)).cast("int")

    /** Per-key latest row of `df` under the payload-struct order. */
    def latest(df: DataFrame): DataFrame =
      df.groupBy(col(keyCol))
        .agg(max(struct(payloadCols.map(col): _*)).as("__m"))
        .select(col(keyCol) +:
          payloadCols.map(c => col(s"__m.$c").as(c)): _*)

    /** The foreachBatch body: merge one micro-batch into the view. */
    def merge(batch: DataFrame, id: Long): Unit = {
      val t0 = System.nanoTime()
      val newest = latest(batch)
      // bounded driver-side list (≤ nBuckets ints), not a data collect
      val touched = newest.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.nonEmpty) {
        val prevPaths = touched.toSeq.flatMap(current.get)
        val prev = prevPaths.headOption.map(_ =>
          ss.read.parquet(prevPaths: _*))
        val stateRows =
          if (collectMetrics) prev.map(_.count()).getOrElse(0L) else -1L
        val merged = prev match {
          case Some(p) => latest(newest.unionByName(p))
          case None => newest
        }
        val out = s"$root/v$id"
        merged.withColumn("__bucket", bucketOf)
          .write.partitionBy("__bucket").parquet(out)
        touched.foreach { b =>
          // retire the superseded bucket version now that the replacing
          // write committed — disk stays one live generation per bucket
          current.get(b).foreach(Scratch.deleteNow)
          current(b) = s"$out/__bucket=$b"
        }
        metrics += BatchMetrics(id, touched.length, stateRows,
          (System.nanoTime() - t0) / 1000000)
      }
    }

    /** The maintained view: the union of every bucket's current version
     * (bucket dirs are leaf paths, so the partition column is absent and
     * the schema is exactly key + payload). */
    def view(reader: SparkSession): DataFrame = {
      val paths = current.values.toSeq
      require(paths.nonEmpty, "upsert view read before any batch merged")
      reader.read.parquet(paths: _*)
    }
  }
}
