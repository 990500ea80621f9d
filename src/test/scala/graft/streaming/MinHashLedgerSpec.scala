package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.Tables

/** The q112 contract in-JVM: merge-then-probe accumulation equals the
 * d02 batch recompute under any batch order, a replayed opId is free
 * and identical, and the ledger recovers mid-stream. */
class MinHashLedgerSpec extends SparkSpec {

  private def sigs: DataFrame =
    Dedup.minHashDocSigs(Tables.load(spark, sf(), "documents"),
      "doc_id", "text", k = 16)

  private def want: DataFrame =
    Dedup.minHashPairs(Tables.load(spark, sf(), "documents"),
      "doc_id", "text", k = 16, bands = 4, minSim = 0.5)

  private def assertSame(got: DataFrame, label: String): Unit = {
    val w = want
    assert(got.except(w).isEmpty && w.except(got).isEmpty,
      s"$label: streamed pair set differs from the d02 recompute")
    assert(w.count() > 0, "trivial corpus: no minhash pairs at all")
  }

  test("streamed minhash accumulation equals the batch recompute " +
      "under any batch order; replay is free and identical") {
    val s = sigs.localCheckpoint()
    def run(order: Seq[Int]): (MinHashLedger, DataFrame) = {
      val led = new MinHashLedger(spark, k = 16, bands = 4,
        minSim = 0.5, nBuckets = 16)
      val out = order.map(b =>
        led.observe(s.filter(col("id") % 3 === b), b.toLong))
        .reduce(_ unionByName _)
      (led, out)
    }
    val (led, p1) = run(Seq(0, 1, 2))
    assertSame(p1, "order 012")
    assertSame(run(Seq(2, 0, 1))._2, "order 201")
    // replay of the last folded opId: no double fold, identical pairs
    val last = led.observe(s.filter(col("id") % 3 === 2), 2L)
    val orig = led.observe(s.filter(col("id") % 3 === 2), 2L)
    assert(last.except(orig).isEmpty && orig.except(last).isEmpty)
    val postings = led.store.view(spark)
      .select(explode(col("posting")).as("p"))
      .groupBy(col("p.id")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(postings == 4L,
      s"replay double-folded postings: max per-id count $postings")
  }

  test("ledger recovers from its committed root mid-stream") {
    val s = sigs.localCheckpoint()
    val led = new MinHashLedger(spark, k = 16, bands = 4,
      minSim = 0.5, nBuckets = 16)
    val p01 = Seq(0, 1).map(b =>
      led.observe(s.filter(col("id") % 3 === b), b.toLong))
      .reduce(_ unionByName _).localCheckpoint()
    val rec = MinHashLedger.recover(spark, k = 16, bands = 4,
      minSim = 0.5, nBuckets = 16, root = led.store.rootDir)
    val p2 = rec.observe(s.filter(col("id") % 3 === 2), 2L)
    assertSame(p01.unionByName(p2), "recovered continuation")
  }
}
