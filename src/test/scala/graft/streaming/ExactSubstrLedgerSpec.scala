package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Dedup

/** The q126 contract: the streamed exact-substring ledger's end state
 * equals the batch d12 recompute under ANY arrival order — including
 * the adversarial one where the COPY arrives before the original, so
 * the cross-batch derivation (a stored batch-minimum that loses to a
 * later-arriving earlier occurrence surfaces as a victim at read)
 * genuinely fires — plus the replay no-op, the crash-between-commits
 * recovery, and the [[ExactSubstrLedger.maintain]] contract (flush
 * commits BEFORE the firsts compaction that discards the losing
 * batch-minima; spans identical before/after, and across a crash
 * between the two). */
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
      "first (cross-batch victims derive at read)") {
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4)
    // doc2 (the copy) arrives first: its batch-minima are appended and
    // are, for now, their fingerprints' global minima; doc1's later
    // generation must convert them into read-derived victims
    led.ingest(batch(2L), 0L)
    assert(gotSpans(led).isEmpty,
      "the copy alone has no duplicate — premature victims")
    led.ingest(batch(1L), 1L)
    led.ingest(batch(3L), 2L)
    assert(gotSpans(led) == expected)
    // the reduced view serves corpus-order minima, not arrival-order
    val f = led.firsts.view(spark)
      .selectExpr("min(first_doc)").as[Long].head()
    assert(f == 1L, "doc1's windows must own their fingerprints")
  }

  test("re-ingesting a completed batch (foreachBatch replay) is a " +
      "no-op: duplicate generations collapse through the idempotent " +
      "read-side reduces") {
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
        if (opId == 2L && boom) {
          boom = false; throw new RuntimeException("inject")
        }
        super.commitFirsts(rows, opId)
      }
    }
    led.ingest(batch(2L), 0L)
    led.ingest(batch(1L), 1L)
    // doc3's arrival commits its batch-local victims (the within-doc
    // repeat), then dies before the firsts append — the retry appends
    // a duplicate victims generation (coordinate-keyed, collapses)
    // and the missing firsts generation
    intercept[RuntimeException] { led.ingest(batch(3L), 2L) }
    led.ingest(batch(3L), 2L) // retry
    assert(gotSpans(led) == expected)
  }

  test("maintain() flushes cross-batch victims before compacting and " +
      "leaves spans identical; a crash between flush and compaction " +
      "recovers exactly") {
    var boom = true
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4) {
      override protected def compactFirsts(opId: Long): Unit = {
        if (boom) { boom = false; throw new RuntimeException("inject") }
        super.compactFirsts(opId)
      }
    }
    led.ingest(batch(2L), 0L)
    led.ingest(batch(1L), 1L)
    led.ingest(batch(3L), 2L)
    assert(gotSpans(led) == expected)
    // crash between the flush commit and the firsts compaction (the
    // compaction discards the losing batch-minima — had the flush not
    // committed first, doc2's cross-batch victims would be lost)
    intercept[RuntimeException] { led.maintain(99L) }
    // flushed AND still derivable: the coordinate dedup collapses them
    assert(gotSpans(led) == expected,
      "spans drifted after the half-completed maintain")
    led.maintain(99L) // retry: re-flush is a no-op, compaction lands
    assert(gotSpans(led) == expected)
    // post-maintain the firsts raw view is fully reduced: a second
    // maintain flushes nothing and spans still hold
    led.maintain(100L)
    assert(gotSpans(led) == expected)
  }

  test("maintain interleaved with ingest keeps the end state equal " +
      "to the batch recompute (flush-then-compact loses nothing)") {
    val led = new ExactSubstrLedger(spark, minLen = 12, nBuckets = 4)
    led.ingest(batch(2L), 0L)
    led.maintain(10L) // compact while doc2's minima are still winners
    led.ingest(batch(1L), 1L)
    led.maintain(11L) // flush must capture doc2's now-losing minima
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
    // recovery after a maintain too (single-generation layout)
    led.maintain(50L)
    val rec2 = ExactSubstrLedger.recover(spark, minLen = 12,
      nBuckets = 4, root = root)
    assert(gotSpans(rec2) == expected)
  }

  test("randomized: ledger end state == batch operator under random " +
      "corpora, random arrival partitions, and random maintain " +
      "interleavings (seeded)") {
    // small alphabet + short docs force natural window collisions and
    // partial overlaps the hand corpus can't enumerate; the random
    // PARTITION (not doc-ordered) makes cross-batch losses arbitrary
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
      // random 3-way partition, batches ingested in shuffled order,
      // maintain fired after a random batch
      val part = docs.map(_ => rnd.nextInt(3))
      val maintainAfter = rnd.nextInt(3)
      rnd.shuffle((0 until 3).toList).zipWithIndex.foreach {
        case (slice, op) =>
          val ids = docs.zip(part).collect {
            case ((id, _), p) if p == slice => id
          }.toSet
          led.ingest(df.filter(col("id").isin(ids.toSeq: _*)), op.toLong)
          // alternate the two maintenance shapes across trials: the
          // full fold and the size-tiered subset fold must both be
          // invisible to the end state
          if (op == maintainAfter) {
            if (trial % 2 == 0) led.maintain(80L + op)
            else led.maintainTiered(80L + op, fanout = 2, maxGens = 2)
          }
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
