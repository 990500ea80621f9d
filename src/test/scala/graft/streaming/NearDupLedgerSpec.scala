package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup
import graft.sources.{Scratch, Tables}

/** The q108 contract in-JVM: the union of every batch's observe()
 * pairs equals the batch simHashPairs recompute over the concatenated
 * corpus — each pair surfaces exactly once, when its later member
 * arrives — independent of batch order; the ledger recovers from its
 * committed root mid-stream; and the hot-band posting cap bounds
 * stored postings deterministically. */
class NearDupLedgerSpec extends SparkSpec {

  private def sigs: DataFrame =
    Dedup.simHashSigs(Tables.load(spark, sf(), "documents"),
      "doc_id", "text", bits = 60)
      .select(col("doc_id").as("id"), col("simhash").as("sig"))

  private def wantPairs: DataFrame =
    Dedup.simHashPairs(Tables.load(spark, sf(), "documents"),
      "doc_id", "text", bits = 60, maxHamming = 3)
      .select(col("a"), col("b"), col("hamming").cast("int"))

  private def assertSamePairs(got: DataFrame, label: String): Unit = {
    val want = wantPairs
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"$label: streamed pair set differs from the batch recompute")
    assert(want.count() > 0, "trivial corpus: no near-dup pairs at all")
  }

  test("stream-accumulated near-dup pairs equal the batch recompute, " +
      "under any batch order") {
    val s = sigs.localCheckpoint()
    def run(order: Seq[Int]): DataFrame = {
      val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
        nBuckets = 16)
      order.map(b =>
        led.observe(s.filter(col("id") % 3 === b), b.toLong))
        .reduce(_ unionByName _)
    }
    assertSamePairs(run(Seq(0, 1, 2)), "order 012")
    assertSamePairs(run(Seq(2, 0, 1)), "order 201")
  }

  test("ledger recovers from its committed root mid-stream and the " +
      "continuation completes the exact pair set") {
    val s = sigs.localCheckpoint()
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 16)
    val p01 = Seq(0, 1).map(b =>
      led.observe(s.filter(col("id") % 3 === b), b.toLong))
      .reduce(_ unionByName _).localCheckpoint()
    // driver loss: only the store root survives
    val rec = NearDupLedger.recover(spark, bits = 60, maxHamming = 3,
      nBuckets = 16, root = led.store.rootDir)
    val p2 = rec.observe(s.filter(col("id") % 3 === 2), 2L)
    assertSamePairs(p01.unionByName(p2), "recovered continuation")
  }

  test("compact mid-stream commutes with live probing: " +
      "observe, compact, observe equals the uninterrupted pair set") {
    val s = sigs.localCheckpoint()
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 16)
    // fragment the store: AQE coalescing off so each fold keeps its
    // shuffle width and every touched bucket collects several part
    // files — the shape a long-lived 100 TB ledger is compacted for
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey, "true")
    val p01 =
      try {
        spark.conf.set(coalesceKey, "false")
        Seq(0, 1).map(b =>
          led.observe(s.filter(col("id") % 3 === b), b.toLong))
          .reduce(_ unionByName _).localCheckpoint()
      } finally spark.conf.set(coalesceKey, prevCoalesce)
    val (buckets, fBefore, fAfter) = led.store.compact(opId = 500L)
    assert(buckets > 0 && fAfter < fBefore,
      s"compact measured nothing: $buckets buckets, " +
        s"$fBefore -> $fAfter files")
    // the live stream continues over the compacted store: probes and
    // folds behave as if compaction never happened
    val p2 = led.observe(s.filter(col("id") % 3 === 2), 2L)
    assertSamePairs(p01.unionByName(p2), "compacted continuation")
  }

  test("minePairs over the accumulated postings equals the batch " +
      "recompute — the offline mining half of the artifact") {
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 16)
    led.observe(sigs, 0L)
    val got = led.minePairs()
    val want = wantPairs
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "ledger-mined pair set differs from the batch recompute")
  }

  test("observe is replay-idempotent: a retried opId neither " +
      "double-folds postings nor changes the emitted pair set") {
    import spark.implicits._
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    val S = 0x0F0F0F0FL
    led.observe(Seq((1L, S)).toDF("id", "sig"), 0L)
    val b1 = Seq((2L, S), (3L, S)).toDF("id", "sig")
    val first = led.observe(b1, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"$first")
    // foreachBatch retry of the SAME batch id (crash after the store
    // commit): the fold must not repeat, the pairs must be identical
    val replay = led.observe(b1, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == first,
      s"replayed pair set differs: $replay vs $first")
    val postings = led.store.view(spark)
      .select(explode(col("posting")).as("p"))
      .groupBy(col("p.id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(postings.values.forall(_ == 4L),
      s"replay double-folded postings: $postings")
    // forgetting from a FRESH ledger is a no-op, not a lookup error
    new NearDupLedger(spark, bits = 60, maxHamming = 3, nBuckets = 8)
      .forget(Seq((9L, S)).toDF("id", "sig"), 5L)
  }

  test("forget removes exactly the victims' postings: forgotten ids " +
      "never pair again, innocents still do, emptied bands drop") {
    import spark.implicits._
    val S = 0x0F0F0F0FL
    val T = 0x70F0F0F0F0F0F0FL // far from S (hamming >> 3)
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 8)
    // ingest docs 1 (sig S) and 3 (sig T)
    led.observe(Seq((1L, S), (3L, T)).toDF("id", "sig"), 0L)
    led.forget(Seq((1L, S)).toDF("id", "sig"), 100L)
    // no posting anywhere names the victim
    val remaining = led.store.view(spark)
      .select(explode(col("posting")).as("p"))
      .select(col("p.id")).collect().map(_.getLong(0)).toSet
    assert(!remaining.contains(1L),
      s"forgotten id still posted: $remaining")
    assert(remaining.contains(3L), "innocent posting lost by forget")
    // a doc identical to the victim arrives: NO pair (it is forgotten)
    val p2 = led.observe(Seq((2L, S)).toDF("id", "sig"), 1L)
    assert(p2.count() == 0,
      s"forgotten id paired after forget: ${p2.collect().toSeq}")
    // a doc identical to the innocent arrives: pair still found
    val p4 = led.observe(Seq((4L, T)).toDF("id", "sig"), 2L)
    assert(p4.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((3L, 4L)), "innocent stopped pairing after forget")
    // forget is bucket-pruned replace, not a rebuild: the ledger still
    // serves doc 2's fresh postings (merged after the forget)
    assert(led.store.view(spark)
      .select(explode(col("posting")).as("p"))
      .filter(col("p.id") === 2L).count() === 4L)
  }

  test("a failed observe resynchronizes the lastOp token from the " +
      "COMMITTED manifest: a post-commit throw does not make the " +
      "retry re-fold the landed batch, and a pre-commit throw does " +
      "not make it skip the lost one") {
    import spark.implicits._
    import org.apache.spark.sql.{Column, DataFrame}
    // minimal PostingLedger with failure-injection around the fold
    // commit — the two crash points the in-memory token cannot tell
    // apart ('commit landed, post-commit retire threw' vs 'commit
    // never happened')
    class Throwing extends PostingLedger(spark, nBuckets = 4,
        maxPosting = 0, root = None) {
      @volatile var throwAfter = false
      @volatile var throwBefore = false
      protected def bandExprs: Seq[Column] = Seq(pmod(col("sig"), lit(4)))
      protected def score(sig: Column, psig: Column): Column =
        abs(sig - psig).cast("long")
      protected def scoreName: String = "d"
      protected def keep(s: Column): Column = s <= 2L
      protected def zeroScore: Column = lit(0L)
      override protected def foldCommit(p: DataFrame, op: Long): Unit = {
        if (throwBefore) { throwBefore = false
          throw new RuntimeException("pre-commit boom") }
        super.foldCommit(p, op)
        if (throwAfter) { throwAfter = false
          throw new RuntimeException("post-commit boom") }
      }
    }
    def postingCounts(l: PostingLedger): Map[Long, Long] =
      l.store.view(spark).select(explode(col("posting")).as("p"))
        .groupBy(col("p.id")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val led = new Throwing
    led.observe(Seq((1L, 10L)).toDF("id", "sig"), 0L)
    // CASE 1: the fold COMMITS, then a post-commit step throws. The
    // manifest already records lastOp=1; restoring the stale in-memory
    // value would make the retry re-fold and duplicate postings.
    led.throwAfter = true
    val b1 = Seq((2L, 10L)).toDF("id", "sig")
    intercept[RuntimeException](led.observe(b1, 1L))
    assert(led.store.token("lastOp").contains("1"),
      s"token not restored from the committed manifest: " +
        s"${led.store.token("lastOp")}")
    val retry1 = led.observe(b1, 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(retry1 == Set((1L, 2L)), s"retry pairs wrong: $retry1")
    assert(postingCounts(led) == Map(1L -> 1L, 2L -> 1L),
      s"post-commit-throw retry duplicated postings: " +
        s"${postingCounts(led)}")
    // CASE 2: the fold throws BEFORE committing. The manifest still
    // says lastOp=1; the retry must NOT skip the fold.
    led.throwBefore = true
    val b2 = Seq((3L, 10L)).toDF("id", "sig")
    intercept[RuntimeException](led.observe(b2, 2L))
    assert(led.store.token("lastOp").contains("1"),
      s"token after pre-commit throw: ${led.store.token("lastOp")}")
    val retry2 = led.observe(b2, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(retry2 == Set((1L, 3L), (2L, 3L)),
      s"pre-commit-throw retry lost the batch: $retry2")
    assert(postingCounts(led) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"postings after pre-commit retry: ${postingCounts(led)}")
  }

  test("maxPosting caps saturated bands deterministically: postings " +
      "stay bounded, lowest ids survive") {
    import spark.implicits._
    // 20 docs with the IDENTICAL signature: every band saturates
    val same = (0L until 20L).map(i => (i, 0x0F0F0F0FL)).toDF("id", "sig")
    val led = new NearDupLedger(spark, bits = 60, maxHamming = 3,
      nBuckets = 4, maxPosting = 5)
    led.collectSaturationMetrics = true
    led.observe(same, 0L)
    led.observe(same.select((col("id") + 100L).as("id"), col("sig")), 1L)
    // the cap is biting by construction — the metric must SAY so
    // (batch 1's four band keys all sit at the cap after its fold)
    assert(led.metrics.map(_.saturatedBands).sum > 0,
      s"saturation metric silent on a saturated ledger: ${led.metrics}")
    val post = led.store.view(spark)
      .select(col("bkey"), size(col("posting")).as("n"),
        col("posting")(0).getField("id").as("first"))
      .collect()
    assert(post.forall(_.getInt(1) <= 5),
      s"posting cap violated: ${post.mkString(", ")}")
    // deterministic survivors: the lowest ids of the first batch
    assert(post.forall(_.getLong(2) == 0L),
      s"cap did not keep lowest ids: ${post.mkString(", ")}")
  }
}
