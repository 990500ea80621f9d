package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base + " extra"),                 // near-dup of 0
    (2L, "  THE  quick brown fox jumps over the lazy dog again and again"), // exact dup of 0 after normalize
    (3L, "completely different content about spark query engines at scale now"),
    (4L, base)                             // exact dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per normalized fingerprint") {
    val survivors = Dedup.exact(docs, $"text", $"doc_id")
      .select($"doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(0L, 1L, 3L))
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text")
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("simhash: identical docs share signatures; distinct content differs") {
    val sig = Dedup.simHashBuckets(docs, "doc_id", "text")
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(2L) && sig(0L) == sig(4L))
    assert(sig(0L) != sig(3L))
  }

  test("codegen simhash ≡ interpreted-HOF simhash, incl. empty and nulls") {
    import graft.functions.{TextFunctions => TF}
    val inputs = docs.select($"doc_id", $"text")
      .unionByName(Seq((100L, ""), (101L, "   ")).toDF("doc_id", "text"))
      .select(transform(TF.tokens($"text"), t => TF.hash60(t)).as("hs"))
    for (bits <- Seq(1, 16, 32, 63)) {
      val got = inputs.select(
        Dedup.simHashFromHashes($"hs", bits).as("fast"),
        Dedup.simHashFromHashesHof($"hs", bits).as("ref")).collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits"))
    }
    // null ELEMENT counts -1 on every bit in both formulations
    val withNull = Seq(Tuple1(Seq[java.lang.Long](3L, null, 5L)))
      .toDF("hs")
    val r = withNull.select(
      Dedup.simHashFromHashes($"hs", 8).as("fast"),
      Dedup.simHashFromHashesHof($"hs", 8).as("ref")).head()
    assert(r.getLong(0) == r.getLong(1))
  }

  test("codegen minhash ≡ interpreted-HOF minhash, incl. empty and nulls") {
    import graft.functions.{TextFunctions => TF}
    val inputs = docs.select($"text")
      .unionByName(Seq(Tuple1(""), Tuple1("one two")).toDF("text"))
      .select(transform(TF.wordShinglesFromTokens(TF.tokens($"text"), 3),
        s => TF.hash60(s).bitwiseAND(lit(Dedup.MhMask))).as("hs"))
    for (k <- Seq(1, 16)) {
      val got = inputs.select(
        Dedup.minHashSigFromHashes($"hs", k).as("fast"),
        Dedup.minHashSigFromHashesHof($"hs", k).as("ref")).collect()
      got.foreach { r =>
        val fast = if (r.isNullAt(0)) null else r.getSeq[Any](0).toList
        val ref = if (r.isNullAt(1)) null else r.getSeq[Any](1).toList
        assert(fast == ref, s"k=$k")
      }
    }
    // null element skipped by every seed's min, as array_min does
    val withNull = Seq(Tuple1(Seq[java.lang.Long](7L, null, 3L))).toDF("hs")
    val r = withNull.select(
      Dedup.minHashSigFromHashes($"hs", 4).as("fast"),
      Dedup.minHashSigFromHashesHof($"hs", 4).as("ref")).head()
    assert(r.getSeq[Any](0).toList == r.getSeq[Any](1).toList)
  }

  test("simhash hamming pairs: near-dups within distance, unrelated out") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select($"a", $"b", $"hamming").as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 2L)) == 0 && m((0L, 4L)) == 0) // exact dups: distance 0
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("hammingPairs hot-bucket cap drops saturated buckets, keeps cold pairs") {
    // 40 ids share signature 0 (every band bucket holds 40 — hot);
    // ids 100/101 share a distinct signature (cold buckets of 2).
    val sigs = ((1L to 40L).map(_ -> 0L) ++
      Seq(100L -> 0x3FFL, 101L -> 0x3FFL)).toDF("id", "sig")
    val uncapped = Dedup.hammingPairs(sigs, bits = 60, maxHamming = 3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.size == 40 * 39 / 2 + 1)
    val capped = Dedup.hammingPairs(sigs, bits = 60, maxHamming = 3,
        maxBucket = 10L)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    // every band of the 40-dup cluster exceeds the cap → its pairs are
    // traded away; the cold pair is untouched
    assert(capped == Set((100L, 101L)))
  }

  test("connected components: chains merge, islands stay separate") {
    // 1-2, 2-3, 3-4 chain (no direct 1-4 edge); 10-11 island; 20-21-22 via hub
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // deterministic across reruns
    val again = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("jaccard pairs: exact dups at 1.0, unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 2L)) == 1.0 && m((0L, 4L)) == 1.0)
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("embedding pairs: near-identical vectors pair up, orthogonal don't") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(vecs, "vec_id", "embedding", dim = 4,
      minCos = 0.9, lshBits = None)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 1L)))
    val lsh = Dedup.embeddingPairs(vecs, "vec_id", "embedding", dim = 4,
      minCos = 0.9, lshBits = Some(8))
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
  }

  test("incremental dedup classifies batch docs against the corpus") {
    // 11 repeats the SAME distinct shingle set as corpus doc 1 (the text
    // is a longer cycle of the same 3 words) → identical minhash
    // signature → near_dup deterministically, while fingerprints differ.
    val corpus = Seq(
      (1L, "x y z x y z"),
      (2L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "x y z x y z"),            // identical text → exact_dup
      (11L, "x y z x y z x y z"),      // same shingle set → near_dup
      (12L, "completely different words here now") // → new
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(corpus, batch, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "exact_dup", 11L -> "near_dup", 12L -> "new"))
  }
}
