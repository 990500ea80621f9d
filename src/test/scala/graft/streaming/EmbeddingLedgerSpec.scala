package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => VF}
import graft.operators.Similarity
import graft.sources.Tables

/** The q113 contract in-JVM: the union of every batch's observe()
 * pairs equals the batch multi-probe centroid restatement (d10's
 * machinery with r <= nProbe) over the full corpus — independent of
 * batch order; the ledger recovers mid-stream; and the inherited
 * forget/minePairs surface works on the embedding family. */
class EmbeddingLedgerSpec extends SparkSpec {

  private val nProbe = 2
  private val minCos = 0.4

  private def emb: DataFrame = Tables.load(spark, sf(), "embeddings")

  private def centroids: Seq[(Long, Array[Double], Double)] =
    Similarity.collectCentroids(
      Similarity.strideCentroids(emb, "vec_id", "embedding",
        centroidStride = 50, maxCentroids = 32))

  private def sigs: DataFrame =
    emb.select(col("vec_id").as("id"), col("embedding").as("sig"))

  /** The batch restatement: multi-probe assignment against the same
   * frozen quantizer, within-centroid pair scan, exact 6dp cosine. */
  private def wantPairs: DataFrame = {
    val cent = Similarity.strideCentroids(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32)
    val probes = Similarity.probeCentroids(emb, "vec_id", "embedding",
      cent, nProbe)
    val l = probes.select(col("cid"), col("qid").as("a"),
      col("qv").as("av"), col("qn").as("an"))
    val r = probes.select(col("cid").as("cid_r"), col("qid").as("b"),
      col("qv").as("bv"), col("qn").as("bn"))
    l.join(r, col("cid") === col("cid_r") && col("a") < col("b"))
      .select(col("a"), col("b"),
        round(VF.cosineFromParts(VF.dot(col("av"), col("bv")),
          col("an"), col("bn")), 6).as("cos"))
      .filter(col("cos") >= minCos)
      .distinct()
  }

  private def ledger(root: Option[String] = None): EmbeddingLedger =
    new EmbeddingLedger(spark, centroids, nProbe, minCos,
      nBuckets = 8, root = root)

  private def assertSamePairs(got: DataFrame, label: String): Unit = {
    val want = wantPairs
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"$label: streamed pair set differs from the batch restatement")
    assert(want.count() > 0, "trivial corpus: no embedding pairs at all")
  }

  test("stream-accumulated embedding pairs equal the batch multi-probe " +
      "restatement, under any batch order") {
    val s = sigs.localCheckpoint()
    def run(order: Seq[Int]): DataFrame = {
      val led = ledger()
      order.map(b =>
        led.observe(s.filter(col("id") % 3 === b), b.toLong))
        .reduce(_ unionByName _)
    }
    assertSamePairs(run(Seq(0, 1, 2)), "order 012")
    assertSamePairs(run(Seq(2, 0, 1)), "order 201")
  }

  test("ledger recovers from its committed root mid-stream (same " +
      "frozen quantizer) and the continuation completes the pair set") {
    val s = sigs.localCheckpoint()
    val led = ledger()
    val p01 = Seq(0, 1).map(b =>
      led.observe(s.filter(col("id") % 3 === b), b.toLong))
      .reduce(_ unionByName _).localCheckpoint()
    val rec = EmbeddingLedger.recover(spark, centroids, nProbe, minCos,
      nBuckets = 8, root = led.store.rootDir)
    val p2 = rec.observe(s.filter(col("id") % 3 === 2), 2L)
    assertSamePairs(p01.unionByName(p2), "recovered continuation")
  }

  test("inherited surface: minePairs over accumulated postings equals " +
      "the batch restatement; forget removes the victim's pairs only") {
    val led = ledger()
    led.observe(sigs, 0L)
    val mined = led.minePairs()
    val want = wantPairs.localCheckpoint()
    assert(mined.except(want).isEmpty && want.except(mined).isEmpty,
      "ledger-mined embedding pair set differs from the batch form")
    // forget the most-paired vector; its pairs must vanish, all others
    // survive (the bounded band-key rewrite, inherited untouched)
    val victim = want.select(col("a").as("id"))
      .unionByName(want.select(col("b").as("id")))
      .groupBy(col("id")).count()
      .orderBy(col("count").desc, col("id")).head().getLong(0)
    led.forget(sigs.filter(col("id") === victim), 100L)
    val after = led.minePairs()
    val wantAfter = want.filter(col("a") =!= victim &&
      col("b") =!= victim)
    assert(after.except(wantAfter).isEmpty &&
      wantAfter.except(after).isEmpty,
      "forget was not surgical on the embedding ledger")
  }

  // ------------------------------------------------------------------
  // DRIFT LIFECYCLE (round 15 — the AnnIndex s24/s25 pattern on the
  // streamed semantic-dedup store)

  /** Double-typed corpus halves for the drift construction: evens are
   * the fit-time distribution, the drifted slice rides the
   * ones-direction the original quantizer never carved (s25's shape). */
  private def embD: DataFrame = emb.select(col("vec_id"),
    col("embedding").cast("array<double>").as("embedding"))
  private def evens: DataFrame = embD.filter(col("vec_id") % 2 === 0)
    .select(col("vec_id").as("id"), col("embedding").as("sig"))
  private def drifted: DataFrame = embD.filter(col("vec_id") % 4 === 1)
    .select(col("vec_id").as("id"),
      transform(col("embedding"), x => x * lit(0.05) + lit(1.0))
        .as("sig"))

  private def quantA: Seq[(Long, Array[Double], Double)] =
    Similarity.collectCentroids(
      Similarity.strideCentroids(evens, "id", "sig",
        centroidStride = 20, maxCentroids = 32))

  test("drift lifecycle: an undrifted ledger does NOT fire (store and " +
      "token untouched); a drifted one fires, and the rebanded ledger " +
      "== built-from-scratch on the refit quantizer") {
    // negative control: evens only — the distribution the quantizer
    // was fit on; the statistic sits at its baseline and the trigger
    // must leave the committed store byte-identical
    val led0 = new EmbeddingLedger(spark, quantA, nProbe, minCos,
      nBuckets = 8)
    led0.observe(evens, 0L)
    val im0 = led0.imbalance
    val viewBefore = led0.store.view(spark)
      .select(col("bkey"), explode(col("posting")).as("p"))
      .collect().toSet
    val dec0 = led0.rebandIfDrifted(maxImbalance = 2.0 * im0,
      centroidStride = 50, maxCentroids = 32, opId = 100L)
    assert(!dec0.fired && dec0.imbalance == im0,
      f"undrifted ledger fired at ${dec0.imbalance}%.3f (baseline $im0%.3f)")
    assert(dec0.ledger eq led0, "a non-firing decision rebound the ledger")
    assert(led0.store.view(spark)
        .select(col("bkey"), explode(col("posting")).as("p"))
        .collect().toSet == viewBefore,
      "a non-firing trigger mutated the store")
    assert(led0.store.committedToken(EmbeddingLedger.QuantToken).isEmpty,
      "a non-firing trigger committed a quantizer token")

    // drifted ledger: same fit, then the collapsed arrival wave
    val led1 = new EmbeddingLedger(spark, quantA, nProbe, minCos,
      nBuckets = 8)
    led1.observe(evens, 0L)
    led1.observe(drifted, 1L)
    val dec1 = led1.rebandIfDrifted(maxImbalance = 2.0 * im0,
      centroidStride = 50, maxCentroids = 32, opId = 101L)
    assert(dec1.fired,
      f"drifted ledger read ${dec1.imbalance}%.3f <= bar ${2 * im0}%.3f")
    // the rebanded store == a ledger built from scratch on the refit
    // quantizer over the same corpus (band keys AND postings)
    val quantB = led1.refitQuantizer(50, 32) // post-reband corpus is identical
    val scratch = new EmbeddingLedger(spark, quantB, nProbe, minCos,
      nBuckets = 8)
    scratch.observe(evens.unionByName(drifted), 0L)
    def keyed(l: EmbeddingLedger) = l.store.view(spark)
      .select(col("bkey"), explode(col("posting")).as("p"))
      .select(col("bkey"), col("p.id").as("id"))
    assert(keyed(dec1.ledger).except(keyed(scratch)).isEmpty &&
      keyed(scratch).except(keyed(dec1.ledger)).isEmpty,
      "rebanded band->id postings differ from the from-scratch ledger")
    val mined = dec1.ledger.minePairs()
    val wantM = scratch.minePairs()
    assert(mined.except(wantM).isEmpty && wantM.except(mined).isEmpty,
      "rebanded mining differs from the from-scratch ledger")
    assert(wantM.count() > 0, "trivial drift corpus: no pairs at all")

    // the refit quantizer rode the reband commit: recoverPersisted
    // reattaches with NO out-of-band bookkeeping and serves the same
    // pairs; recovering with the STALE quantizer fails loudly
    val rec = EmbeddingLedger.recoverPersisted(spark, minCos,
      nBuckets = 8, root = dec1.ledger.store.rootDir)
    val recMined = rec.minePairs()
    assert(recMined.except(wantM).isEmpty && wantM.except(recMined).isEmpty,
      "recoverPersisted lost the refit band scheme")
    intercept[IllegalArgumentException] {
      EmbeddingLedger.recover(spark, quantA, nProbe, minCos,
        nBuckets = 8, root = dec1.ledger.store.rootDir)
    }
  }

  test("reband replay (same quantizer, same opId) is a natural no-op " +
      "and the quantizer token round-trips exactly") {
    val led = new EmbeddingLedger(spark, quantA, nProbe, minCos,
      nBuckets = 8)
    led.observe(evens, 0L)
    led.observe(drifted, 1L)
    val quantB = led.refitQuantizer(50, 32)
    val r1 = led.reband(quantB, 200L)
    val v1 = r1.store.view(spark)
      .select(col("bkey"), explode(col("posting")).as("p"))
      .select(col("bkey"), col("p.id").as("id")).collect().toSet
    // a crash-retry of the SAME reband replays (rows, keys) verbatim:
    // replaceKeys absorbs it, the token re-commits the same value
    val r2 = r1.reband(quantB, 200L)
    val v2 = r2.store.view(spark)
      .select(col("bkey"), explode(col("posting")).as("p"))
      .select(col("bkey"), col("p.id").as("id")).collect().toSet
    assert(v1 == v2, "reband replay changed the committed postings")
    // token round-trip exactness (Double.toString round-trips)
    val tok = EmbeddingLedger.serializeQuantizer(nProbe, quantB)
    val (np, cs) = EmbeddingLedger.deserializeQuantizer(tok)
    assert(np == nProbe && cs.size == quantB.size &&
      cs.zip(quantB).forall { case ((c1, v1b, n1), (c2, v2b, n2)) =>
        c1 == c2 && n1 == n2 && v1b.sameElements(v2b) },
      "quantizer token did not round-trip bit-exactly")
  }
}
