package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The q110 durable-labeling contract: streamed pair-batch maintenance
 * equals the from-scratch connected components of the accumulated pair
 * set; the persisted store always equals the in-memory labeling; a
 * mid-stream driver loss recovers from the committed root and the
 * continuation is exact; and a replayed batch (min-cluster monoid) is
 * a natural no-op. */
class ClusterLedgerSpec extends SparkSpec {

  import spark.implicits._

  // A~B then B~C arrive in DIFFERENT batches; 7~8 joins late via 8~9.
  // The closure {1,2,3} and {7,8,9} is exactly what pairwise dedup
  // alone cannot produce.
  private def batches: Seq[DataFrame] = Seq(
    Seq((1L, 2L), (4L, 5L)),
    Seq((2L, 3L)),
    Seq((8L, 9L)),
    Seq((7L, 8L), (4L, 6L))).map(_.toDF("a", "b"))

  private def want: Map[Long, Long] =
    Dedup.connectedComponents(batches.reduce(_ unionByName _))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed maintenance equals the batch transitive closure, and " +
      "the persisted store equals the in-memory labeling after every " +
      "batch") {
    val led = new ClusterLedger(spark, nBuckets = 4)
    batches.zipWithIndex.foreach { case (b, i) =>
      led.observe(b, i.toLong)
      assert(labelsOf(led.store.view(spark)) == labelsOf(led.labeling),
        s"store drifted from the labeling after batch $i")
    }
    assert(labelsOf(led.labeling) == want,
      s"streamed labels ${labelsOf(led.labeling)} != closure $want")
    assert(labelsOf(led.labeling)(3L) == 1L && want(9L) == 7L,
      "cross-batch merge did not converge to one cluster")
  }

  test("kill + recover mid-stream: recover -> continue equals " +
      "uninterrupted maintenance") {
    val led = new ClusterLedger(spark, nBuckets = 4)
    batches.take(2).zipWithIndex.foreach { case (b, i) =>
      led.observe(b, i.toLong)
    }
    // driver loss: only the store root survives — the in-JVM labeling
    // cache is gone; recovery must reseed it from the committed view
    val rec = ClusterLedger.recover(spark, nBuckets = 4,
      root = led.store.rootDir)
    batches.drop(2).zipWithIndex.foreach { case (b, i) =>
      rec.observe(b, (i + 2).toLong)
    }
    assert(labelsOf(rec.store.view(spark)) == want,
      s"recovered continuation ${labelsOf(rec.store.view(spark))} " +
        s"!= uninterrupted closure $want")
  }

  test("observe returns exactly the changed-row delta: fresh vertices " +
      "plus relabels, and a demoted representative surfaces as " +
      "cluster < id") {
    val led = new ClusterLedger(spark, nBuckets = 4)
    var prev = Map.empty[Long, Long]
    batches.zipWithIndex.foreach { case (b, i) =>
      val delta = labelsOf(led.observe(b, i.toLong))
      val now = labelsOf(led.store.view(spark))
      val changed = now.filter { case (id, c) => prev.get(id) != Some(c) }
      assert(delta == changed,
        s"batch $i delta $delta != store changed-row diff $changed")
      prev = now
    }
    // batch 3's (7,8) merges {8,9} (rep 8) into {7,8,9} (rep 7): the
    // old representative 8 must surface in that batch's delta with its
    // NEW, smaller label — the q115 demotion evidence
    val led2 = new ClusterLedger(spark, nBuckets = 4)
    led2.observe(batches(2), 0L) // (8,9) → rep 8
    val d = labelsOf(led2.observe(batches(3), 1L))
    assert(d.get(8L) == Some(7L) && d.get(9L) == Some(7L),
      s"demoted rep 8 / relabeled member 9 missing from delta $d")
  }

  test("retainHistory + readAsOf serves the labeling exactly as each " +
      "batch committed it") {
    val led = new ClusterLedger(spark, nBuckets = 4,
      retainHistory = true)
    val wantAt = batches.indices.map { k =>
      labelsOf(Dedup.connectedComponents(
        batches.take(k + 1).reduce(_ unionByName _)))
    }
    val versions = batches.zipWithIndex.map { case (b, i) =>
      led.observe(b, i.toLong)
      led.store.history().last
    }
    versions.zipWithIndex.foreach { case (v, k) =>
      assert(labelsOf(led.store.readAsOf(spark, v)) == wantAt(k),
        s"readAsOf($v) != closure over batches 0..$k")
    }
  }

  test("a replayed pair batch is a natural no-op (min-cluster monoid " +
      "absorbs the double fold — no token needed)") {
    val led = new ClusterLedger(spark, nBuckets = 4)
    batches.zipWithIndex.foreach { case (b, i) =>
      led.observe(b, i.toLong)
    }
    val before = labelsOf(led.store.view(spark))
    led.observe(batches(1), 1L) // foreachBatch retry of batch 1
    assert(labelsOf(led.store.view(spark)) == before,
      "replayed batch mutated the committed labeling")
    assert(before == want, s"labels drifted: $before != $want")
  }
}
