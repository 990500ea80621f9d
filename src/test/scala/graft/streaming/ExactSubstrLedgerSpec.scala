package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Dedup

/** The q126 contract: the streamed exact-substring ledger's end state
 * equals the batch d12 recompute under ANY arrival order — including
 * the adversarial one where the COPY arrives before the original, so
 * the retro-correcting displacement path (a late earlier-(doc,pos)
 * occurrence converts the stored survivor into a victim) genuinely
 * fires — plus the replay no-op and the crash-between-commits
 * recovery the commit order (victims before firsts) exists for. */
class ExactSubstrLedgerSpec extends SparkSpec {

  import spark.implicits._

  // the ExactSubstrSpec corpus: doc1 = 60 distinct tokens; doc2 = 5
  // fillers + doc1's tokens 11..30 (copied at unaligned offsets);
  // doc3 = 15 tokens repeated twice (within-doc duplicate)
  private def tok(p: String, r: Range) = r.map(i => s"$p$i")
  private val aTok = tok("a", 0 until 60)
  private val docs = Map(
    1L -> aTok.mkString(" "),
    2L -> (tok("f", 0 until 5) ++ aTok.slice(10, 30)).mkString(" "),
    3L -> (tok("c", 0 until 15) ++ tok("c", 0 until 15)).mkString(" "))

  private def corpus: DataFrame =
    docs.toSeq.toDF("id", "text")

  private def batch(ids: Long*): DataFrame =
    ids.map(i => (i, docs(i))).toDF("id", "text")

  private def expected: Seq[(Long, Long, Long, Long)] =
    Dedup.exactSubstrSpans(
        corpus.selectExpr("id as doc_id", "text"), "doc_id", "text",
        minLen = 12)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  private def gotSpans(led: ExactSubstrLedger): Seq[(Long, Long, Long, Long)] =
    led.spans(spark).orderBy("id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("end state equals the batch recompute when the COPY arrives " +
      "first (the displacement path fires)") {
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4)
    // doc2 (the copy) arrives first and its windows become the stored
    // minima; doc1's later arrival must displace them into victims
    led.ingest(batch(2L), 0L)
    assert(gotSpans(led).isEmpty,
      "the copy alone has no duplicate — premature victims")
    led.ingest(batch(1L), 1L)
    led.ingest(batch(3L), 2L)
    assert(gotSpans(led) == expected)
    // firsts hold the corpus-order minima, not arrival-order ones
    val f = led.firsts.view(spark)
      .selectExpr("min(first_doc)").as[Long].head()
    assert(f == 1L, "doc1's windows must own their fingerprints")
  }

  test("re-ingesting a completed batch (foreachBatch replay) is a " +
      "no-op: both folds are idempotent monoids") {
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4)
    led.ingest(batch(2L), 0L)
    led.ingest(batch(1L), 1L)
    val before = gotSpans(led)
    led.ingest(batch(1L), 1L) // replay after both commits landed
    assert(gotSpans(led) == before)
    led.ingest(batch(3L), 2L)
    assert(gotSpans(led) == expected)
  }

  test("crash between the victims commit and the firsts commit " +
      "recovers exactly on retry") {
    var boom = true
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4) {
      override protected def commitFirsts(rows: DataFrame,
          opId: Long): Unit = {
        if (opId == 1L && boom) {
          boom = false; throw new RuntimeException("inject")
        }
        super.commitFirsts(rows, opId)
      }
    }
    led.ingest(batch(2L), 0L)
    // doc1's arrival commits its displaced victims, then dies before
    // the firsts fold — the displaced set is recomputable on retry
    // precisely because firsts still holds the pre-batch minima
    intercept[RuntimeException] { led.ingest(batch(1L), 1L) }
    led.ingest(batch(1L), 1L) // retry re-merges the identical victims
    led.ingest(batch(3L), 2L)
    assert(gotSpans(led) == expected)
  }

  test("recover() reattaches both stores and serves the same spans") {
    val root = graft.sources.Scratch.dir("xsubstr_spec")
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4,
      root = Some(root))
    led.ingest(batch(2L), 0L)
    led.ingest(batch(1L), 1L)
    led.ingest(batch(3L), 2L)
    val rec = ExactSubstrLedger.recover(spark, minLen = 12,
      nBuckets = 4, root = root)
    assert(gotSpans(rec) == expected)
  }

  test("randomized: ledger end state == batch operator under random " +
      "corpora and random arrival partitions (seeded)") {
    // small alphabet + short docs force natural window collisions and
    // partial overlaps the hand corpus can't enumerate; the random
    // PARTITION (not doc-ordered) makes displacement fire arbitrarily
    val rnd = new scala.util.Random(41)
    (1 to 4).foreach { trial =>
      val docs = (0 until 24).map { i =>
        val n = 12 + rnd.nextInt(18)
        // tokens from a 6-letter alphabet: dense accidental repeats
        (i.toLong, Seq.fill(n)(('a' + rnd.nextInt(6)).toChar.toString)
          .mkString(" "))
      }
      val df = docs.toDF("id", "text")
      val want = Dedup.exactSubstrSpans(
          df.selectExpr("id as doc_id", "text"), "doc_id", "text",
          minLen = 4)
        .orderBy("doc_id", "span_start")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val led = new ExactSubstrLedger(spark, minLen = 4, nBuckets = 4)
      // random 3-way partition, batches ingested in shuffled order
      val part = docs.map(_ => rnd.nextInt(3))
      rnd.shuffle((0 until 3).toList).zipWithIndex.foreach {
        case (slice, op) =>
          val ids = docs.zip(part).collect {
            case ((id, _), p) if p == slice => id
          }.toSet
          led.ingest(df.filter(col("id").isin(ids.toSeq: _*)), op.toLong)
      }
      assert(gotSpans(led) == want,
        s"trial $trial: streamed spans diverge from the batch operator")
    }
  }

  test("a corpus with no duplicated window serves empty spans — " +
      "including through recover (the victims store never commits)") {
    val root = graft.sources.Scratch.dir("xsubstr_spec_clean")
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4,
      root = Some(root))
    led.ingest(batch(1L), 0L)
    assert(gotSpans(led).isEmpty)
    val rec = ExactSubstrLedger.recover(spark, minLen = 12,
      nBuckets = 4, root = root)
    assert(gotSpans(rec).isEmpty)
  }
}
