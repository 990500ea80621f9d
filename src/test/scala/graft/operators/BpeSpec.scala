package graft.operators

import graft.SparkSpec

/** The t18 trainer against a CANONICAL hand-written BPE (explicit
 * index-walking greedy merge, no string replacement) on the classic
 * Sennrich corpus plus an overlapping-run word — the case where the
 * fixpoint-replace implementation could silently diverge from greedy
 * left-to-right non-overlapping semantics if the scan resumed
 * anywhere other than after the replacement. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Canonical reference: naive (overlapping) adjacent-pair counts,
   * (count DESC, pair ASC) argmax, index-walking greedy merge. */
  private def refBpe(vocab: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var v = vocab
    (1 to rounds).map { step =>
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      for ((s, f) <- v; Array(a, b) <- s.split(" ").sliding(2))
        cnt(s"$a $b") = cnt.getOrElse(s"$a $b", 0L) + f
      val bestN = cnt.values.max
      val pair = cnt.collect { case (p, n) if n == bestN => p }.toSeq.min
      val Array(a, b) = pair.split(" ", 2)
      v = v.map { case (s, f) =>
        val w = s.split(" ")
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
            out += a + b; i += 2
          } else { out += w(i); i += 1 }
        }
        (out.mkString(" "), f)
      }
      (step, a, b, bestN)
    }
  }

  test("trained merges equal the canonical greedy BPE, including the " +
      "overlapping-run round") {
    // 'aaaaa' makes round 4 merge a self-pair inside a run of 5 —
    // greedy non-overlap must yield 'aa aa a', not 'aa a a' (one
    // replace pass) or 'aaaa a' (overlapping)
    val words = Seq("low" -> 5, "lower" -> 2, "newest" -> 6,
      "widest" -> 3, "aaaaa" -> 2)
    val docs = words.flatMap { case (w, f) => Seq.fill(f)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", rounds = 6)
      .map(m => (m.step, m.lhs, m.rhs, m.n))
    val want = refBpe(
      words.map { case (w, f) =>
        (w.toCharArray.mkString(" ") + " </w>", f.toLong)
      }.toMap, 6)
    assert(got == want, s"got $got\nwant $want")
    // the overlapping-run case genuinely fired: some round merged a
    // self-pair (lhs == rhs) — the 'a a' merge
    assert(want.exists { case (_, a, b, _) => a == b })
  }

  test("run tiling is CANONICAL greedy, proven by the next round's " +
      "argmax: 'aaaaa' must segment to 'aa aa a', not 'aa a aa'") {
    // round 1 merges (a,a); canonical tiling leaves "aa aa a </w>"
    // whose round-2 tie-broken argmax is 'a </w>' — the tile-skip
    // segmentation "aa a aa </w>" (what a naive single-space replace
    // produces: the scan consumes the shared boundary space and skips
    // the adjacent occurrence) would instead merge 'a aa'. This is
    // the round the vocab difference is VISIBLE in the merge table.
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val got = Bpe.train(docs, "text", rounds = 2)
      .map(m => (m.step, m.lhs, m.rhs, m.n))
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "</w>", 1L)),
      s"non-canonical run tiling: $got")
  }

  test("encode applies the trained merges in rank order: subword " +
      "counts shrink to the merged segmentation") {
    // train 3 rounds on {newest, widest}: es -> est -> est</w>, so
    // 'newest' encodes to [n e w est</w>] (4) and 'widest' to
    // [w i d est</w>] (5... w i d est</w> = 4? chars w,i,d + est</w>)
    val docs = Seq((1L, "newest"), (2L, "widest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 3)
    assert(merges.map(m => m.lhs + m.rhs) == Seq("es", "est", "est</w>"),
      s"unexpected merges: $merges")
    val got = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 4L)),
      s"unexpected subword counts: $got")
  }

  test("encodeExpr segments adversarial run-heavy words exactly like " +
      "a hand-written index-walking canonical encoder (t21's pin)") {
    // canonical single-pass merge application, index-walking — the
    // same ground truth refBpe uses, applied at ENCODE time
    def refEncode(word: String,
        merges: Seq[Bpe.Merge]): String = {
      var syms = word.toCharArray.map(_.toString).toSeq :+ "</w>"
      merges.foreach { m =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.lhs &&
              syms(i + 1) == m.rhs) { out += m.lhs + m.rhs; i += 2 }
          else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms.mkString(" ")
    }
    // run lengths 1..7 plus alternation shapes: every self-pair tiling
    // class, trained on the corpus that makes (a,a) the first merge
    val words = Seq("a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaa",
      "aaaaaaa", "abab", "aabb", "baaab")
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", rounds = 4)
    assert(merges.exists(m => m.lhs == m.rhs), "no self-pair trained")
    val got = docs
      .select($"text".as("w"),
        Bpe.encodeExpr($"text", merges).as("s"))
      .as[(String, String)].collect().toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w, merges),
        s"'$w': got '${got(w)}', want '${refEncode(w, merges)}'")
    }
  }

  test("merge counts are frequency-weighted, not word-distinct") {
    // 'es' appears once per word but in words of freq 6 and 3 -> 9
    val docs = Seq((1L, "newest"), (2L, "widest")).toDF("doc_id", "text")
    val m = Bpe.train(
      Seq("newest" -> 6, "widest" -> 3)
        .flatMap { case (w, f) => Seq.fill(f)(w) }
        .zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text"),
      "text", rounds = 1).head
    assert((m.lhs, m.rhs, m.n) == (("e", "s", 9L)), s"got $m")
    assert(docs.count() == 2) // corpus builder sanity
  }

  test("batched training (batchK) reproduces the sequential merge " +
      "table EXACTLY on the fixture corpus — every batchK, deep " +
      "rounds") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val want = Bpe.train(docs, "text", rounds = 12)
    Seq(2, 4, 7).foreach { k =>
      val got = Bpe.train(docs, "text", rounds = 12, batchK = k)
      assert(got == want,
        s"batchK=$k diverged:\n got $got\nwant $want")
    }
  }

  test("batched training stops (never skips) at a conflicting " +
      "candidate: adversarial corpus where the top pairs chain " +
      "through shared symbols and created pairs out-rank survivors") {
    // "a b" (highest), then "b c" shares b, and merging "a b" creates
    // "ab c" whose count rivals lower candidates — exactly the cases
    // where naive top-K batching diverges from sequential training
    val words = Seq.fill(30)("abc") ++ Seq.fill(20)("abab") ++
      Seq.fill(12)("cdcd") ++ Seq.fill(7)("dade")
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val want = Bpe.train(docs, "text", rounds = 6)
    Seq(2, 3, 6).foreach { k =>
      val got = Bpe.train(docs, "text", rounds = 6, batchK = k)
      assert(got == want,
        s"batchK=$k diverged:\n got $got\nwant $want")
    }
  }

  test("persist/recover round-trips the merge table in rank order; " +
      "an empty artifact fails loudly") {
    val docs = Seq((1L, "newest widest lowest"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val want = Bpe.train(docs, "text", rounds = 5)
    val root = java.nio.file.Files
      .createTempDirectory("bpe_store_spec").toString
    Bpe.persist(spark, want, s"$root/m")
    assert(Bpe.recover(spark, s"$root/m") == want)
    // rank order survives even if the parquet reader reorders rows:
    // recover sorts on step, and a table persisted from a reversed
    // seq still recovers in rank order
    Bpe.persist(spark, want.reverse, s"$root/rev")
    assert(Bpe.recover(spark, s"$root/rev") == want)
    val ex = intercept[IllegalArgumentException] {
      Bpe.persist(spark, Seq.empty, s"$root/empty")
      Bpe.recover(spark, s"$root/empty")
    }
    assert(ex.getMessage.contains("empty") ||
      ex.getMessage.contains("Bpe.recover"), ex.getMessage)
  }

  test("recover fails loudly on rank-corrupted artifacts (gapped or " +
      "duplicated steps), and persist's rename swap overwrites an " +
      "existing table cleanly") {
    val docs = Seq((1L, "newest widest lowest"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val want = Bpe.train(docs, "text", rounds = 5)
    val root = java.nio.file.Files
      .createTempDirectory("bpe_corrupt_spec").toString
    // a gapped table (rank 3 lost to a partial overwrite) and a
    // duplicated one (rank 2 written twice) both recover-fail
    Bpe.persist(spark, want.filterNot(_.step == 3), s"$root/gap")
    val gap = intercept[IllegalArgumentException] {
      Bpe.recover(spark, s"$root/gap")
    }
    assert(gap.getMessage.contains("contiguous"), gap.getMessage)
    Bpe.persist(spark, want :+ want(1), s"$root/dup")
    val dup = intercept[IllegalArgumentException] {
      Bpe.recover(spark, s"$root/dup")
    }
    assert(dup.getMessage.contains("contiguous"), dup.getMessage)
    // persist-over-persist: the rename swap replaces the old table
    // (no merge of old+new files) and leaves no tmp sibling behind
    Bpe.persist(spark, want.take(3), s"$root/m")
    Bpe.persist(spark, want, s"$root/m")
    assert(Bpe.recover(spark, s"$root/m") == want)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/.m__tmp")))
  }

  test("resume continues a trained prefix EXACTLY: resume(train(k)) " +
      "+ extra ≡ train(k+extra), across split points and batchK, " +
      "through the persist/recover round-trip") {
    val docs = graft.sources.Tables.load(spark,
      "/root/testdata/sf0.001", "documents")
    val want = Bpe.train(docs, "text", rounds = 12)
    Seq(1, 5, 11).foreach { k =>
      val got = Bpe.resume(docs, "text", want.take(k), 12 - k)
      assert(got == want, s"split $k diverged:\n got $got\nwant $want")
    }
    // the production path: recover a persisted 8-merge table and grow
    // it by +4 with batched rounds — still the exact sequential chain
    val root = java.nio.file.Files
      .createTempDirectory("bpe_resume_spec").toString
    Bpe.persist(spark, want.take(8), s"$root/m")
    val grown = Bpe.resume(docs, "text",
      Bpe.recover(spark, s"$root/m"), 4, batchK = 3)
    assert(grown == want, s"recovered resume diverged:\n got $grown")
    // a non-prefix seed (ranks not 1..k) is rejected before any work
    val bad = intercept[IllegalArgumentException] {
      Bpe.resume(docs, "text", want.drop(2), 1)
    }
    assert(bad.getMessage.contains("contiguous prefix"), bad.getMessage)
  }
}
