package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** The d12 contract on a hand corpus: exact duplicated-span discovery
 * at arbitrary offsets, interval-merge semantics, first-occurrence
 * canonicalization — and the NEGATIVE proof the gate exists for: t15's
 * fixed 50-token chunk hashing finds NOTHING on the same corpus,
 * because the planted span is aligned to neither document's chunk
 * grid. */
class ExactSubstrSpec extends SparkSpec {

  import spark.implicits._

  // docA: 60 distinct tokens a0..a59. docB: 5 fillers + A's tokens
  // 11..30 (20 copied tokens at B-offset 6, A-offset 11 — neither is a
  // 50-token chunk boundary). docC: its own 15 tokens repeated twice
  // (a within-doc duplicate at offset 16).
  private def tok(p: String, r: Range) = r.map(i => s"$p$i")
  private val aTok = tok("a", 0 until 60)
  private val bTok = tok("f", 0 until 5) ++ aTok.slice(10, 30)
  private val cHalf = tok("c", 0 until 15)
  private val corpus = Seq(
    (1L, aTok.mkString(" ")),
    (2L, bTok.mkString(" ")),
    (3L, (cHalf ++ cHalf).mkString(" "))
  ).toDF("doc_id", "text")

  test("spans: a 20-token copy at unaligned offsets is one merged span " +
      "in the LATER doc; a within-doc repeat flags its second site") {
    val got = Dedup.exactSubstrSpans(corpus, "doc_id", "text", minLen = 12)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // docB: windows at pos 6..14 (9 duplicated 12-windows) cover
    // tokens 6..25 -> one span of the full copied region; docA (the
    // first occurrence) is untouched. docC: the second c0..c14 run
    // starts at 16; its duplicated 12-windows are pos 16..19 (window
    // at 16 matches pos 1's, .., 19 matches 4's... only offsets whose
    // 12-window lies inside a repeated region: pos 16..19 cover
    // tokens 16..30) -> span (16, 30).
    assert(got == Seq(
      (2L, 6L, 25L, 20L),
      (3L, 16L, 30L, 15L)),
      s"unexpected span set: $got")
  }

  test("negative proof: t15's 50-token chunk hashing finds NO duplicate " +
      "on the same corpus (no identical chunk ever forms)") {
    // t15's exact chunking: fixed grid, chunk = md5 of 50-token slices
    val chunks = corpus
      .select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
      .select(col("doc_id"), col("__tok"), size(col("__tok")).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), ((col("__n") - 1) / 50).cast("int"))))
      .select(col("doc_id"),
        md5(array_join(slice(col("__tok"),
          col("chunk_idx") * 50 + 1, lit(50)), " ")).as("chunk_md5"))
    val dupChunks = chunks.groupBy(col("chunk_md5")).count()
      .filter(col("count") > 1).count()
    assert(dupChunks == 0,
      "the hand corpus accidentally aligned a chunk — fixture broken")
    // ...while the substring operator finds both planted regions
    assert(Dedup.exactSubstrSpans(corpus, "doc_id", "text", 12)
      .count() == 2)
  }

  test("island merge: two disjoint duplicated regions in one doc stay " +
      "two spans; touching coverage merges to one") {
    // docY copies A's tokens 1..14 at its start and A's tokens 41..54
    // after a 10-token gap of its own — two separate spans
    val y = (tok("a", 0 until 14) ++ tok("g", 0 until 10) ++
      tok("a", 40 until 54)).mkString(" ")
    val df = Seq((1L, aTok.mkString(" ")), (9L, y)).toDF("doc_id", "text")
    val got = Dedup.exactSubstrSpans(df, "doc_id", "text", minLen = 12)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((9L, 1L, 14L, 14L), (9L, 25L, 38L, 14L)),
      s"disjoint regions merged or lost: $got")
  }

  test("first occurrence is canonical (doc, pos): the smaller doc_id " +
      "keeps its span; every later holder is the victim") {
    val df = Seq(
      (5L, aTok.take(20).mkString(" ")),
      (4L, aTok.take(20).mkString(" ")),
      (6L, aTok.take(20).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.exactSubstrSpans(df, "doc_id", "text", minLen = 12)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 1L, 20L, 20L), (6L, 1L, 20L, 20L)),
      s"doc 4 must survive as the first occurrence: $got")
  }

  test("cut: the copied region is excised from the later doc, the " +
      "first occurrence untouched, a full duplicate cuts to ''") {
    // doc 4: an exact copy of doc 1's first 20 tokens — fully covered
    val df = corpus.unionByName(
      Seq((4L, aTok.take(20).mkString(" "))).toDF("doc_id", "text"))
    val got = Dedup.exactSubstrCut(df, "doc_id", "text", minLen = 12)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, aTok.mkString(" "), 0L),             // first occurrence intact
      (2L, tok("f", 0 until 5).mkString(" "), 20L), // span (6,25) cut
      (3L, tok("c", 0 until 15).mkString(" "), 15L), // second half cut
      (4L, "", 20L)),                           // full duplicate -> ''
      s"unexpected cut set: $got")
  }
}
