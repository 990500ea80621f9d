package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("T5 lenientInt: Integer.parseInt semantics") {
    val in = Seq("12", "+7", "-3", "Annual 1", "12.5", "", null,
      "99999999999", "007").toDF("s")
    val got = in.select(Transforms.lenientInt($"s")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getInt(0))
    assert(got.toSeq == Seq(12, 7, -3, null, null, null, null, null, 7))
  }

  test("T6 dateStrToYmdInt: full-match regex semantics incl 00 month/day") {
    // Matcher.matches() in the reference anchors the whole string:
    // embedded dates ("x 1999-12-31 y") do NOT parse.
    val in = Seq("1962-00-00", "1962-01-15", "1962", "junk", null,
      "x 1999-12-31 y").toDF("s")
    val got = in.select(Transforms.dateStrToYmdInt($"s")).as[Int].collect()
    assert(got.toSeq == Seq(19620000, 19620115, -1, -1, -1, -1))
  }

  test("T7 epochToYmdInt: >0 → yyyyMMdd UTC, else -1") {
    val in = Seq[java.lang.Long](86400L, 0L, -5L, null, 1704153600L).toDF("e")
    val got = in.select(Transforms.epochToYmdInt($"e")).as[Int].collect()
    assert(got.toSeq == Seq(19700102, -1, -1, -1, 20240102))
  }

  test("T8 semiSplit: Java split limit-0 semantics") {
    val in = Seq("a ; b;c", "; x", "a;", "", "solo", ";", "a; ;", null).toDF("s")
    val got = in.select(Transforms.semiSplit($"s")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getSeq[String](0).toList)
    assert(got.toSeq == Seq(List("a", "b", "c"), List("", "x"), List("a"),
      List(""), List("solo"), Nil, List("a"), null))
  }

  test("T8 semiSplit: property — matches java.lang.String#split exactly") {
    val alphabet = Seq("a", "b", ";", " ", "")
    val rnd = new scala.util.Random(42)
    val samples = (0 until 300).map(_ =>
      (0 until rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString)
    val expected = samples.map(_.split("\\s*;\\s*").toList)
    val got = samples.toDF("s").select(Transforms.semiSplit($"s"))
      .collect().map(_.getSeq[String](0).toList)
    samples.lazyZip(expected).lazyZip(got).foreach { (s, e, g) =>
      assert(e == g, s"input=<$s> java=$e spark=$g")
    }
  }

  test("T5 lenientInt: property — matches Integer.parseInt-or-null") {
    val pieces = Seq("1", "9", "0", "+", "-", ".", "a", "2147483647",
      "2147483648", "99999999999999999999")
    val rnd = new scala.util.Random(7)
    val samples = (0 until 200).map(_ =>
      (0 until (1 + rnd.nextInt(3))).map(_ => pieces(rnd.nextInt(pieces.size))).mkString)
    val expected = samples.map { s =>
      try Integer.valueOf(Integer.parseInt(s)) catch { case _: Exception => null }
    }
    val got = samples.toDF("s").select(Transforms.lenientInt($"s"))
      .collect().map(r => if (r.isNullAt(0)) null else Integer.valueOf(r.getInt(0)))
    samples.lazyZip(expected).lazyZip(got).foreach { (s, e, g) =>
      assert(e == g, s"input=<$s> java=$e spark=$g")
    }
  }

  test("T9 intToBool null-safe") {
    val in = Seq[java.lang.Integer](1, 0, 2, null).toDF("i")
    val got = in.select(Transforms.intToBool($"i")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(got.toSeq == Seq(true, false, false, null))
  }

  test("T12 mergeCredits + provenance") {
    val in = Seq(
      (Some(Seq("A", "B")), "x; y"),
      (None, "x; y"),
      (None, null)).toDF("curated", "legacy")
    val got = in.select(
      Transforms.mergeCredits($"curated", $"legacy"),
      Transforms.creditSource($"curated".isNotNull)).collect()
    assert(got(0) == Row(Seq("A", "B"), "gcd_story_credit"))
    assert(got(1) == Row(Seq("x", "y"), "gcd_story"))
    assert(got(2) == Row(null, "gcd_story"))
  }

  test("T4 snapshotEpoch at GMT-06:00") {
    // 2026-8-12 00:00 at -06:00 == 2026-08-12T06:00Z
    assert(Transforms.snapshotEpoch("2026-8-12") ==
      java.time.Instant.parse("2026-08-12T06:00:00Z").getEpochSecond)
    assert(Transforms.snapshotYmd("2026-8-12") == 20260812)
  }
}
