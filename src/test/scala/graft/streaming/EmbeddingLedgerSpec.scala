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
    Similarity.strideCentroids(emb, "vec_id", "embedding",
        centroidStride = 50, maxCentroids = 32)
      .select(col("cid"), col("cv").cast("array<double>").as("cv"),
        col("cn"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2)))
      .toSeq

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
}
