package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / tokenCount / normalize") {
    val in = Seq("  The  QUICK fox ", "", "a b").toDF("t")
    val got = in.select(TextFunctions.tokenCount($"t")).as[Long].collect()
    assert(got.toSeq == Seq(3L, 0L, 2L))
    val norm = in.select(TextFunctions.normalizeText($"t")).as[String].collect()
    assert(norm.toSeq == Seq("the quick fox", "", "a b"))
  }

  test("hash60 matches the portable md5-prefix formula") {
    val in = Seq("abc", "the fast key", "").toDF("s")
    val got = in.select(TextFunctions.hash60($"s")).as[Long].collect()
    def expected(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    assert(got.toSeq == Seq("abc", "the fast key", "").map(expected))
    // cross-checked against DuckDB CAST('0x'||substr(md5(s),1,15) AS BIGINT)
    assert(expected("abc") == 648541476951500027L)
  }

  test("charShingles / wordShingles") {
    val in = Seq("abcd", "ab", "one two three four").toDF("t")
    val cs = in.select(TextFunctions.charShingles($"t", 3)).collect()
    assert(cs(0).getSeq[String](0).toList == List("abc", "bcd"))
    assert(cs(1).getSeq[String](0).isEmpty)
    val ws = in.select(TextFunctions.wordShingles($"t", 2)).collect()
    assert(ws(2).getSeq[String](0).toList ==
      List("one two", "two three", "three four"))
  }

  test("langId picks the dominant stopword language") {
    val in = Seq(
      "the cat sat of the mat and it is that",
      "el perro y la casa de los campos",
      "der hund und die katze ist von den",
      "xyzzy qwerty").toDF("t")
    val got = in.select(TextFunctions.langId($"t")).as[String].collect()
    assert(got.toSeq == Seq("en", "es", "de", "und"))
  }

  test("qualityScore in [0,1] and sane ordering") {
    val in = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hill for a while",
      "!!!! #### $$$$ %%%%").toDF("t")
    val got = in.select(TextFunctions.qualityScore($"t")).as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("vector dot / norm / cosine") {
    val in = Seq(
      (Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 1.0f, 2.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))).toDF("a", "b")
    val got = in.select(
      VectorFunctions.dot($"a", $"b"),
      round(VectorFunctions.cosine($"a", $"b"), 6)).collect()
    assert(got(0).getDouble(0) == 8.0)
    assert(got(0).getDouble(1) == math.rint(8.0 / 9.0 * 1e6) / 1e6)
    assert(got(1).getDouble(1) == 0.0)
    assert(got(2).getDouble(1) == 0.0) // zero-vector guard
  }

  test("dot: null element propagates null, length mismatch raises") {
    // Null-element propagation — same null the zip_with/aggregate form emits.
    val withNull = Seq(
      (Seq[java.lang.Float](1.0f, null, 2.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f)),
      (Seq[java.lang.Float](1.0f, 2.0f, 3.0f), Seq[java.lang.Float](1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    val got = withNull.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 6.0)
    // Mismatched dimensions must fail loudly, never score a silent prefix.
    val mismatched = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      mismatched.select(VectorFunctions.dot($"a", $"b")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("hyperplaneSig deterministic and balanced-ish") {
    val vecs = (0 until 50).map(i =>
      Tuple1((0 until 8).map(d => math.sin(i * 31 + d).toFloat))).toDF("v")
    val sigs = vecs.select(VectorFunctions.hyperplaneSig($"v", 8, 8)).as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 256))
    assert(sigs.distinct.length > 5) // planes actually discriminate
    val again = vecs.select(VectorFunctions.hyperplaneSig($"v", 8, 8)).as[Long].collect()
    assert(sigs.toSeq == again.toSeq)
  }

  test("two instances of each codegen expression share one projection") {
    // non-nullable children make nullSafeCodeGen emit unbraced blocks in
    // the same scope — non-fresh locals would collide, the generated
    // class would fail to compile, and Spark would silently fall back to
    // the interpreted path. Disable the fallback so a collision FAILS.
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      import graft.operators.Dedup
      val df = Seq((Seq(1L, 2L), Seq(3L, 4L), Seq(1.0f, 2.0f),
          Seq(0.5f, 0.25f)))
        .toDF("h1", "h2", "v1", "v2")
      val r = df.select(
        Dedup.simHashFromHashes($"h1", 8).as("s1"),
        Dedup.simHashFromHashes($"h2", 8).as("s2"),
        Dedup.minHashSigFromHashes($"h1", 4).as("m1"),
        Dedup.minHashSigFromHashes($"h2", 4).as("m2"),
        VectorFunctions.dot($"v1", $"v2").as("d1"),
        VectorFunctions.dot($"v2", $"v1").as("d2"),
        VectorFunctions.hyperplaneSig($"v1", 2, 4).as("p1"),
        VectorFunctions.hyperplaneSig($"v2", 2, 4).as("p2")).head()
      assert(r.getDouble(4) == r.getDouble(5)) // dot is symmetric
      assert(!r.anyNull)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("codegen hyperplaneSig ≡ Column-tree formulation") {
    val vecs = (0 until 80).map(i =>
      Tuple1((0 until 16).map(d => math.sin(i * 37 + d).toFloat))).toDF("v")
    for (bits <- Seq(1, 4, 12)) {
      val got = vecs.select(
        VectorFunctions.hyperplaneSig($"v", 16, bits).as("fast"),
        VectorFunctions.hyperplaneSigCols($"v", 16, bits).as("ref"))
        .collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits"))
    }
    // null element → every projection null → signature 0, both forms
    val withNull = Seq(Tuple1(Seq[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("v")
    val r = withNull.select(
      VectorFunctions.hyperplaneSig($"v", 3, 4).as("fast"),
      VectorFunctions.hyperplaneSigCols($"v", 3, 4).as("ref")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }

  test("positional shingles keep duplicates at true token offsets") {
    // "a b a b a b": distinct form collapses to 2 shingles, positional
    // keeps all 4 so element j always covers tokens j..j+2
    val in = Seq("a b a b a b", "x y", "").toDF("t")
    val tok = in.select(TextFunctions.tokens($"t").as("tk"))
    val pos = tok.select(
      TextFunctions.wordShinglesPositional($"tk", 3).as("s"))
      .as[Seq[String]].collect()
    assert(pos(0) == Seq("a b a", "b a b", "a b a", "b a b"))
    assert(pos(1) == Seq.empty && pos(2) == Seq.empty)
    val dist = tok.select(
      TextFunctions.wordShinglesFromTokens($"tk", 3).as("s"))
      .as[Seq[String]].collect()
    assert(dist(0) == Seq("a b a", "b a b"))
  }
}
