package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/**
 * Text-analysis column functions for large-scale training-data pipelines:
 * tokenization, language id, quality scoring, fingerprinting, shingling.
 *
 * All pure `Column` combinators over Spark built-ins / higher-order
 * functions — codegen-capable, no UDFs, so a 100 TB corpus scan stays a
 * single fused pipeline per partition. Hash primitives are md5-based so a
 * SQL oracle (DuckDB) can reproduce them bit-for-bit.
 */
object TextFunctions {

  /** Lowercase, trim, collapse internal whitespace — canonical text form
   * used by dedup and fingerprinting. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Tokens of an ALREADY-PROJECTED normalized-text column. */
  def tokensFromNorm(n: Column): Column =
    when(n === "", array().cast("array<string>")).otherwise(split(n, " "))

  /** Whitespace tokens of the normalized text; empty string → empty array. */
  def tokens(c: Column): Column = tokensFromNorm(normalizeText(c))

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** BPE-ish count over an ALREADY-PROJECTED normalized-text column. */
  def bpeTokenCountFromNorm(n: Column): Column =
    regexp_count(n, lit("[a-z0-9]{1,4}|[^a-z0-9 ]")).cast(LongType)

  /** BPE-ish subword token count: word chunks of ≤4 chars + punctuation
   * marks, via a single regex scan (a cheap, deterministic proxy for a real
   * BPE vocab — counts `\w{1,4}` pieces and non-space symbols). */
  def bpeTokenCount(c: Column): Column =
    bpeTokenCountFromNorm(normalizeText(c))

  /** Portable 60-bit hash: first 15 hex digits of md5 as a non-negative
   * long. Reproducible in DuckDB as CAST('0x'||substr(md5(s),1,15) AS BIGINT)
   * and in any engine with md5 — the shared primitive under minhash/simhash. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Document fingerprint: md5 hex of the normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** JVM-side twin of [[hash60]] for deriving plan-time constants (hash
   * family coefficients, hyperplane weights) from the same md5 stream any
   * SQL engine can reproduce. */
  def hash60Jvm(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /**
   * Character n-gram shingles (distinct) over an ALREADY-PROJECTED
   * normalized-text column. Pass a plain attribute, not an expression:
   * Spark's interpreted higher-order functions re-evaluate outer
   * subexpressions once per element, so an inlined `normalizeText` here
   * would rerun its regexes for every character position (quadratic).
   */
  def charShinglesFromNorm(t: Column, n: Int): Column =
    when(length(t) >= n,
      array_distinct(transform(
        sequence(lit(1), length(t) - lit(n - 1)),
        i => substr(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Single-expression convenience form — fine for small inputs/tests;
   * hot paths should project [[normalizeText]] first and use
   * [[charShinglesFromNorm]]. */
  def charShingles(c: Column, n: Int): Column =
    charShinglesFromNorm(normalizeText(c), n)

  /** Word k-shingles (distinct, space-joined) over an ALREADY-PROJECTED
   * tokens column — same per-element re-evaluation caveat as
   * [[charShinglesFromNorm]]. */
  def wordShinglesFromTokens(t: Column, k: Int): Column =
    array_distinct(wordShinglesPositional(t, k))

  /** Single-expression convenience form of [[wordShinglesFromTokens]]. */
  def wordShingles(c: Column, k: Int): Column =
    wordShinglesFromTokens(tokens(c), k)

  /** POSITIONAL k-shingles (no dedup): element j covers tokens j..j+k-1,
   * so `posexplode` positions are true token offsets — required when the
   * shingle's LOCATION matters (content-defined chunk boundaries), not
   * just its identity. */
  def wordShinglesPositional(t: Column, k: Int): Column =
    when(size(t) >= k,
      transform(
        sequence(lit(1), size(t) - lit(k - 1)),
        i => array_join(slice(t, i, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))

  /** HALF_UP(a/b · 10⁶) in EXACT integer arithmetic: (2a·10⁶+b) div (2b),
   * for a ≥ 0, b > 0. Engine-portable where `round(a/b, 6)` is not: ratios
   * of small integers land exactly on dyadic 6dp halves (1/128·10⁶ =
   * 7812.5) where engine round-half modes legitimately differ — the class
   * that cost t22 its first driver outing (round 16). Both Spark's `div`
   * and DuckDB's `//` are plain integral division on positive operands. */
  def ratioPpm(a: Column, b: Column): Column =
    call_function("div",
      a.cast(LongType) * lit(2000000L) + b.cast(LongType),
      b.cast(LongType) * lit(2L))

  /** The 6dp ratio as a DOUBLE: exact ppm integer → double (exact ≤ 2⁵³),
   * one identical IEEE division by 10⁶ in both engines. */
  def ratio6(a: Column, b: Column): Column =
    ratioPpm(a, b).cast(DoubleType) / lit(1000000.0)

  /** DuckDB spelling of [[ratio6]] — keep in lockstep. */
  def ratio6Sql(a: String, b: String): String =
    s"CAST((2*($a)*1000000 + ($b)) // (2*($b)) AS DOUBLE)/1000000"

  /** Scalar [[ratioPpm]] for driver/executor-side plain-Scala math
   * (the multimodal decoder) — keep in lockstep with the Column and
   * SQL spellings. */
  def ppmHalfUp(a: Long, b: Long): Long = (2L * a * 1000000L + b) / (2L * b)

  /** HALF_UP at 4dp of a DOUBLE both engines computed identically:
   * floor(x·10⁴ + 0.5)/10⁴ — three IEEE ops with one portable
   * semantics, vs round(DOUBLE, 4) whose half-mode is engine-defined.
   * For integer-derived statistics whose raw ints aren't in reach
   * (the s25/q123 imbalance scalars); prefer [[ratio6]] when they are. */
  def halfUp4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** DuckDB spelling of [[halfUp4]] — keep in lockstep. */
  def halfUp4Sql(e: String): String = s"floor(($e) * 10000 + 0.5) / 10000"

  /** Punct COUNT (non-alphanumeric-non-space chars) over an
   * ALREADY-PROJECTED normalized-text column. */
  def punctCountFromNorm(t: Column): Column =
    regexp_count(t, lit("[^a-z0-9 ]")).cast(LongType)

  /** Punct ratio over an ALREADY-PROJECTED normalized-text column —
   * exact-6dp ([[ratio6]]), not a raw double quotient. */
  def punctRatioFromNorm(t: Column): Column =
    when(length(t) > 0, ratio6(punctCountFromNorm(t), length(t)))
      .otherwise(lit(0.0))

  /** Punctuation/symbol ratio: non-alphanumeric-non-space chars / chars. */
  def punctRatio(c: Column): Column = punctRatioFromNorm(normalizeText(c))

  /** Small multilingual stopword table for langId / stopwordRatio. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "mit", "zu", "den"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"))

  /** Stopword COUNT over an ALREADY-PROJECTED tokens column. */
  def stopwordCountFromTokens(t: Column, lang: String = "en"): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    size(filter(t, w => array_contains(sw, w))).cast(LongType)
  }

  /** Stopword ratio over an ALREADY-PROJECTED tokens column — exact-6dp
   * ([[ratio6]]), not a raw double quotient. */
  def stopwordRatioFromTokens(t: Column, lang: String = "en"): Column =
    when(size(t) > 0, ratio6(stopwordCountFromTokens(t, lang), size(t)))
      .otherwise(lit(0.0))

  /** Fraction of tokens that are (english) stopwords — a standard quality
   * signal. */
  def stopwordRatio(c: Column, lang: String = "en"): Column =
    stopwordRatioFromTokens(tokens(c), lang)

  /** Language id over an ALREADY-PROJECTED tokens column. */
  def langIdFromTokens(t: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (code, words) =>
      val sw = array(words.map(lit): _*)
      struct(size(filter(t, w => array_contains(sw, w))).as("hits"),
        lit(code).as("code"))
    }
    // array_max on struct(hits, code) orders by hits then code; with the
    // codes sorted ascending, max picks highest hits, tie → 'later' code.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** N-gram-heuristic language id: count stopword hits per language, take
   * the argmax (ties broken by language code order); no hits → "und". */
  def langId(c: Column): Column = langIdFromTokens(tokens(c))

  /** Quality score from RAW COUNTS, stated entirely in exact integer ppm
   * (round 17): each term is HALF_UP-rounded to 6dp independently, then the
   * three ppm integers add —
   *   term1 = 0.4·min(nTokens/100, 1)        = min(nTokens,100)·4000 ppm
   *   term2 = 0.4·min(5·nSw/nTokens, 1)      = HALF_UP(min(5nSw,nt)·4·10⁵/nt)
   *   term3 = 0.2·(1 − min(5·nPunct/nChars,1)) = HALF_UP((ch−min(5np,ch))·2·10⁵/ch)
   * The former `round(DOUBLE, 6)` blend could land on dyadic 6dp halves
   * (nTokens = 256 with odd stopword count ⇒ ···.5 ppm) where engine
   * round-half modes differ — the t22/round-16 class. Integral division is
   * identical in Spark (`div`) and DuckDB (`//`); [[qualitySql]] is the
   * lockstep DuckDB spelling. */
  def qualityScoreFromCounts(nTokens: Column, nSw: Column, nChars: Column,
      nPunct: Column): Column = {
    val nt = nTokens.cast(LongType)
    val ch = nChars.cast(LongType)
    val ppm1 = least(nt, lit(100L)) * lit(4000L)
    val ppm2 = when(nt > 0, call_function("div",
      least(nSw.cast(LongType) * lit(5L), nt) * lit(800000L) + nt,
      nt * lit(2L))).otherwise(lit(0L))
    val ppm3 = when(ch > 0, call_function("div",
      (ch - least(nPunct.cast(LongType) * lit(5L), ch)) * lit(400000L) + ch,
      ch * lit(2L))).otherwise(lit(200000L))
    (ppm1 + ppm2 + ppm3).cast(DoubleType) / lit(1000000.0)
  }

  /** DuckDB spelling of [[qualityScoreFromCounts]] — keep in lockstep.
   * Operands are SQL expressions for the four raw counts. */
  def qualitySql(nTokens: String, nSw: String, nChars: String,
      nPunct: String): String =
    s"""CAST(least($nTokens, 100)*4000 +
       |  CASE WHEN ($nTokens) > 0 THEN
       |    (least(($nSw)*5, $nTokens)*800000 + ($nTokens))
       |      // (2*($nTokens)) ELSE 0 END +
       |  CASE WHEN ($nChars) > 0 THEN
       |    ((($nChars) - least(($nPunct)*5, $nChars))*400000 + ($nChars))
       |      // (2*($nChars)) ELSE 200000 END
       |  AS DOUBLE)/1000000""".stripMargin

  /** Composite quality score in [0,1]: blends length, stopword presence and
   * low symbol noise — the shape of a standard pretraining-quality filter. */
  def qualityScore(c: Column): Column = {
    val n = normalizeText(c)
    qualityScoreFromCounts(tokenCount(c),
      stopwordCountFromTokens(tokensFromNorm(n)), length(n),
      punctCountFromNorm(n))
  }

  // ------------------------------------------------------------------ PII
  // Detection/redaction patterns for the standard curation stage. RE2-safe
  // (no backreferences/lookaround) so a SQL oracle applies the IDENTICAL
  // pattern strings; both engines use leftmost-first Perl-style matching.
  /** Email addresses. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International-prefixed phone numbers (terminated by any char outside
   * the digit/space/dot/dash/paren class). */
  val PhoneRe = "\\+\\d[\\d() .-]{6,}\\d"
  /** Dotted-quad IPv4 literals. */
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order matters: emails first (their digits must not feed the
   * phone pattern), then phones, then IPs. Mirror this order in any oracle. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "[EMAIL]"),
    ("phones", PhoneRe, "[PHONE]"),
    ("ips", IpRe, "[IP]"))

  /** Occurrences of one PII pattern. */
  def piiCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast(LongType)

  /** Text with every [[piiPatterns]] match replaced by its placeholder. */
  def redactPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (_, re, tag)) =>
      regexp_replace(acc, re, tag)
    }
}
