package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/**
 * Text-analysis queries over `documents`: n-gram-heuristic language id,
 * quality scoring, token counting, document fingerprinting. All built on
 * the codegen'd Column combinators in [[graft.functions.TextFunctions]];
 * oracles restate the math in DuckDB (stopword lists are generated from
 * the same Scala source so the two can never drift).
 */
object TextQueries {

  private val normT =
    raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

  /** DuckDB spelling of TextFunctions.hash60. */
  private def h60(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** The stopword table as DuckDB VALUES rows, from TF.stopwords. */
  private val stopwordValues: String =
    TF.stopwords.toSeq.sortBy(_._1).map { case (code, words) =>
      s"('$code', [${words.map(w => s"'$w'").mkString(", ")}])"
    }.mkString(", ")

  private val enList: String =
    s"[${TF.stopwords("en").map(w => s"'$w'").mkString(", ")}]"

  /** k03 writes three index artifacts per invocation (two generations
   * + the compacted merge); a Verify/Bench rep loop would accumulate
   * 3N copies until JVM exit. Two-generation retirement (the
   * q51/AnnIndex contract): the NEWEST finished invocation's dirs stay
   * alive for any lazily-held plan, everything older is deleted on
   * re-entry. */
  private var k03Prev: Seq[String] = Nil
  private var k03Older: Seq[String] = Nil

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // t01 — language id (stopword-hit argmax, tie → greatest code) vs the
    // ground-truth lang column: confusion counts.
    Q("t01_langid",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs
          .select(col("lang"), TF.tokens(col("text")).as("__tok"))
          .select(col("lang"), TF.langIdFromTokens(col("__tok")).as("pred_lang"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, string_split_regex($normT, ' ') AS w FROM documents),
              |hits AS (
              |  SELECT doc_id, l.code,
              |    len(list_filter(w, t -> list_contains(l.sw, t))) AS h
              |  FROM toks CROSS JOIN (VALUES $stopwordValues) l(code, sw)),
              |pred AS (
              |  SELECT doc_id, CASE WHEN h > 0 THEN code ELSE 'und' END AS pred_lang
              |  FROM (SELECT doc_id, code, h,
              |          row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, code DESC) AS r
              |        FROM hits) WHERE r = 1)
              |SELECT d.lang, p.pred_lang, COUNT(*) AS n
              |FROM documents d JOIN pred p USING (doc_id)
              |GROUP BY d.lang, p.pred_lang
              |ORDER BY d.lang, p.pred_lang""".stripMargin)),

    // ----------------------------------------------------------------
    // t02 — per-document quality signals: token counts (whitespace +
    // BPE-ish), punctuation/stopword ratios, composite quality score.
    Q("t02_quality",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs
          .select(col("doc_id"), TF.normalizeText(col("text")).as("__t"))
          .select(col("doc_id"), col("__t"),
            TF.tokensFromNorm(col("__t")).as("__tok"))
          .select(col("doc_id"),
            size(col("__tok")).cast("long").as("n_tokens"),
            TF.bpeTokenCountFromNorm(col("__t")).as("n_bpe"),
            TF.punctRatioFromNorm(col("__t")).as("punct_ratio"),
            TF.stopwordRatioFromTokens(col("__tok")).as("sw_ratio"),
            TF.qualityScoreFromCounts(size(col("__tok")),
              TF.stopwordCountFromTokens(col("__tok")),
              length(col("__t")),
              TF.punctCountFromNorm(col("__t"))).as("quality"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |feat AS (
              |  SELECT doc_id, t,
              |    CASE WHEN t = '' THEN CAST(0 AS BIGINT)
              |      ELSE CAST(len(string_split_regex(t, ' ')) AS BIGINT)
              |      END AS n_tokens,
              |    CAST(len(regexp_extract_all(t, '[a-z0-9]{1,4}|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
              |    CAST(len(t) AS BIGINT) AS n_ch,
              |    CAST(len(regexp_extract_all(t, '[^a-z0-9 ]')) AS BIGINT) AS n_p,
              |    CAST(len(list_filter(string_split_regex(t, ' '), x -> list_contains($enList, x))) AS BIGINT) AS n_sw
              |  FROM base)
              |SELECT doc_id, n_tokens, n_bpe,
              |  CASE WHEN n_ch > 0 THEN ${TF.ratio6Sql("n_p", "n_ch")}
              |    ELSE 0.0 END AS punct_ratio,
              |  CASE WHEN n_tokens > 0 THEN ${TF.ratio6Sql("n_sw", "n_tokens")}
              |    ELSE 0.0 END AS sw_ratio,
              |  ${TF.qualitySql("n_tokens", "n_sw", "n_ch", "n_p")} AS quality
              |FROM feat ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t04 — corpus n-gram profile: top-5 word bigrams per language
    // (explode → count → windowed top-k), the shape of vocabulary/
    // contamination audits over a pretraining corpus.
    Q("t04_top_bigrams",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val grams = docs
          .select(col("lang"), TF.tokens(col("text")).as("__tok"))
          .select(col("lang"),
            // outer + null filter: avoids the implicit size>0 predicate
            // re-materializing the bigram array in a pushed-down filter
            explode_outer(TF.wordShinglesFromTokens(col("__tok"), 2))
              .as("bigram"))
          .filter(col("bigram").isNotNull)
          .groupBy(col("lang"), col("bigram"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("bigram"))
        grams.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("lang"), col("rank"), col("bigram"), col("n"))
          .orderBy(col("lang"), col("rank"))
      },
      // NOTE: Spark counts DISTINCT bigrams per doc (wordShingles
      // deduplicates within a document); the oracle mirrors that.
      Some(s"""WITH toks AS (
              |  SELECT doc_id, lang, string_split_regex($normT, ' ') AS w FROM documents),
              |grams AS (SELECT DISTINCT doc_id, lang, w[i] || ' ' || w[i+1] AS bigram
              |  FROM toks, unnest(generate_series(1, len(w) - 1)) AS u(i)
              |  WHERE len(w) >= 2),
              |counted AS (SELECT lang, bigram, COUNT(*) AS n FROM grams GROUP BY lang, bigram),
              |ranked AS (SELECT lang, bigram, n,
              |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rank
              |  FROM counted)
              |SELECT lang, rank, bigram, n FROM ranked WHERE rank <= 5
              |ORDER BY lang, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // p01 — the composed curation pass (quality/language filter → exact
    // dedup → per-source stats): the end-user operator chain, verified as
    // one oracle query so stage composition itself is checked.
    Q("p01_curation_pipeline",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Curation
          .curate(docs, "text", "doc_id", minQuality = 0.6,
            langs = Set("en", "es"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_tokens")).as("sum_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH base AS (SELECT doc_id, source, $normT AS t FROM documents),
              |tok AS (SELECT doc_id, source, t, string_split_regex(t, ' ') AS w FROM base),
              |feats AS (SELECT doc_id, source, t, w,
              |    CAST(len(w) AS BIGINT) AS n_tokens,
              |    CAST(len(t) AS BIGINT) AS n_ch,
              |    CAST(len(regexp_extract_all(t, '[^a-z0-9 ]')) AS BIGINT) AS n_p,
              |    CAST(len(list_filter(w, x -> list_contains($enList, x))) AS BIGINT) AS n_sw
              |  FROM tok),
              |q AS (SELECT doc_id, source, t, n_tokens,
              |    ${TF.qualitySql("n_tokens", "n_sw", "n_ch", "n_p")} AS quality
              |  FROM feats),
              |hits AS (SELECT b.doc_id, l.code,
              |    len(list_filter(string_split_regex(b.t, ' '), x -> list_contains(l.sw, x))) AS h
              |  FROM base b CROSS JOIN (VALUES $stopwordValues) l(code, sw)),
              |pred AS (SELECT doc_id, CASE WHEN h > 0 THEN code ELSE 'und' END AS pred_lang FROM (
              |  SELECT doc_id, code, h,
              |    row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, code DESC) AS r
              |  FROM hits) WHERE r = 1),
              |filt AS (SELECT q.doc_id, q.source, q.t, q.n_tokens
              |  FROM q JOIN pred USING (doc_id)
              |  WHERE q.quality >= 0.6 AND pred.pred_lang IN ('en', 'es')),
              |surv AS (SELECT doc_id, source, n_tokens FROM (
              |  SELECT doc_id, source, n_tokens,
              |    row_number() OVER (PARTITION BY md5(t) ORDER BY doc_id) AS rn
              |  FROM filt) WHERE rn = 1)
              |SELECT source, COUNT(*) AS n_kept,
              |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
              |FROM surv GROUP BY source ORDER BY source""".stripMargin)),

    // ----------------------------------------------------------------
    // t03 — document fingerprinting: portable 60-bit content hash +
    // distinct char-5-shingle count + normalized length.
    Q("t03_fingerprint",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs
          .select(col("doc_id"), TF.normalizeText(col("text")).as("__t"))
          .select(
            col("doc_id"),
            TF.hash60(col("__t")).as("fp60"),
            size(TF.charShinglesFromNorm(col("__t"), 5)).as("n_shingles"),
            length(col("__t")).as("n_chars_norm"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents)
              |SELECT doc_id,
              |  CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS fp60,
              |  CAST(CASE WHEN len(t) >= 5
              |    THEN len(list_distinct(list_transform(generate_series(1, len(t) - 4), i -> substr(t, i, 5))))
              |    ELSE 0 END AS INT) AS n_shingles,
              |  CAST(len(t) AS INT) AS n_chars_norm
              |FROM base ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t05 — PII detection + redaction, the standard curation stage before
    // pretraining. The corpus is synthetic, so deterministic PII (an
    // email, a phone, an IPv4 derived from doc_id) is prepended to every
    // document; the query counts each class on the raw text and emits the
    // fingerprint of the redacted text — so the oracle hash-checks the
    // REDACTION RESULT, not just the counts. Pure regexp expressions:
    // the whole stage is one codegen'd scan projection at any corpus size.
    Q("t05_pii_redact",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val withPii = docs.select(col("doc_id"), concat(
          lit("Contact user"), col("doc_id"), lit("@example.com, +1 555-010-"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(", host 10.0."), col("doc_id") % 256, lit(".1; "),
          col("text")).as("t"))
        withPii.select(
          col("doc_id"),
          TF.piiCount(col("t"), TF.EmailRe).as("n_emails"),
          TF.piiCount(col("t"), TF.PhoneRe).as("n_phones"),
          TF.piiCount(col("t"), TF.IpRe).as("n_ips"),
          md5(TF.redactPii(col("t"))).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id,
              |    'Contact user' || CAST(doc_id AS VARCHAR) ||
              |    '@example.com, +1 555-010-' ||
              |    lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
              |    ', host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1; ' ||
              |    text AS t
              |  FROM documents)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(t, '${TF.EmailRe}')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(t, '${TF.PhoneRe}')) AS BIGINT) AS n_phones,
              |  CAST(len(regexp_extract_all(t, '${TF.IpRe}')) AS BIGINT) AS n_ips,
              |  md5(regexp_replace(regexp_replace(regexp_replace(t,
              |    '${TF.EmailRe}', '[EMAIL]', 'g'),
              |    '${TF.PhoneRe}', '[PHONE]', 'g'),
              |    '${TF.IpRe}', '[IP]', 'g')) AS redacted_md5
              |FROM base ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t07 — unigram language-model scoring (perplexity proxy): corpus
    // unigram frequencies → per-document mean negative log-likelihood,
    // the standard model-free quality/rarity signal over a pretraining
    // corpus. Scale shape: per-(doc, token) counts FIRST (bounds the
    // scoring join to distinct pairs, not token instances), vocab from a
    // second partial-aggregated rollup of those counts, and the corpus
    // total piggybacked onto the vocab rows via an unpartitioned window
    // over the VOCAB (dictionary-sized, not corpus-sized — a third full
    // corpus scan for one scalar would be the real cost at 100 TB).
    // The scoring join broadcasts the vocab when it fits (AQE decides);
    // a trillion-token corpus with an unbroadcastable vocab falls back to
    // a shuffle join where the Zipf head is the skew key — operators/Skew
    // salting is the documented escape hatch.
    // Cross-engine exactness: each distinct count gets ONE 6dp-rounded
    // -ln(p); the per-doc mean is the exact DECIMAL sum of those rounded
    // values weighted by k, divided in doubles.
    Q("t07_unigram_lm",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val docTok = docs
          .select(col("doc_id"),
            explode_outer(TF.tokens(col("text"))).as("tok"))
          .filter(col("tok").isNotNull)
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("k"))
        val wAll = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val vocab = docTok.groupBy(col("tok")).agg(sum(col("k")).as("cnt"))
          .withColumn("n_corpus", sum(col("cnt")).over(wAll))
        docTok.join(vocab, "tok")
          .withColumn("nll", round(-log(
            col("cnt").cast("double") / col("n_corpus").cast("double")), 6))
          .groupBy(col("doc_id"))
          .agg(sum(col("k")).as("n_tokens"),
            (sum(Exact.dec(col("nll")) * col("k")).cast("double") /
              sum(col("k"))).as("avg_nll"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, unnest(string_split_regex(t, ' ')) AS tok
              |         FROM base WHERE t <> ''),
              |dt AS (SELECT doc_id, tok, COUNT(*) AS k FROM toks GROUP BY doc_id, tok),
              |vocab AS (SELECT tok, CAST(SUM(k) AS BIGINT) AS cnt FROM dt GROUP BY tok),
              |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_corpus FROM vocab),
              |scored AS (SELECT dt.doc_id, dt.k,
              |    round(-ln(CAST(v.cnt AS DOUBLE) / CAST(t.n_corpus AS DOUBLE)), 6) AS nll
              |  FROM dt JOIN vocab v USING (tok), tot t)
              |SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_tokens,
              |  CAST(SUM(CAST(nll AS DECIMAL(18,6)) * k) AS DOUBLE) / SUM(k) AS avg_nll
              |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t08 — within-document repetition ratio (Gopher-style quality rule):
    // fraction of word 3-gram instances that are repeats of an earlier
    // 3-gram in the same document. Pure scan-stage expression math — the
    // shingle arrays never leave the projection, so at 100 TB this is a
    // single codegen'd pass with no shuffle at all (the only exchange is
    // the final presentation sort, which a real pipeline wouldn't do).
    // rep_ratio = (n - distinct)/n is one exact IEEE division — no
    // rounding needed for the cross-engine hash.
    Q("t08_repetition",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
          .select(col("doc_id"),
            greatest(size(col("__tok")) - 2, lit(0)).cast("long")
              .as("n_grams"),
            size(TF.wordShinglesFromTokens(col("__tok"), 3)).cast("long")
              .as("n_distinct"))
          .withColumn("rep_ratio",
            when(col("n_grams") > 0,
              (col("n_grams") - col("n_distinct")).cast("double") /
                col("n_grams"))
              .otherwise(lit(0.0)))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM base),
              |g AS (SELECT doc_id,
              |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_grams,
              |    CAST(CASE WHEN len(w) >= 3 THEN len(list_distinct(
              |        list_transform(generate_series(1, len(w) - 2),
              |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))
              |      ELSE 0 END AS BIGINT) AS n_distinct
              |  FROM toks)
              |SELECT doc_id, n_grams, n_distinct,
              |  CASE WHEN n_grams > 0
              |    THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams
              |    ELSE 0.0 END AS rep_ratio
              |FROM g ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t09 — document chunking for training: fixed 50-token windows (last
    // partial window kept), the split step every pretraining pipeline
    // runs before packing. All window math happens in the scan stage —
    // the explode multiplies rows, not bytes (each chunk carries only its
    // digest), so nothing doc-sized ever shuffles.
    Q("t09_chunking",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
          .select(col("doc_id"), col("__tok"),
            size(col("__tok")).as("__n"))
          .filter(col("__n") > 0)
          .withColumn("chunk_idx",
            explode(sequence(lit(0),
              ((col("__n") - 1) / 50).cast("int"))))
          .select(col("doc_id"), col("chunk_idx"),
            slice(col("__tok"), col("chunk_idx") * 50 + 1, lit(50))
              .as("__chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("__chunk")).as("n_chunk_tokens"),
            md5(array_join(col("__chunk"), " ")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w,
              |    len(string_split_regex(t, ' ')) AS n FROM base
              |  WHERE t <> ''),
              |ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
              |    w[i * 50 + 1 : least((i + 1) * 50, n)] AS c
              |  FROM toks, unnest(generate_series(0, (n - 1) // 50)) u(i))
              |SELECT doc_id, chunk_idx,
              |  CAST(len(c) AS INT) AS n_chunk_tokens,
              |  md5(array_to_string(c, ' ')) AS chunk_md5
              |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ----------------------------------------------------------------
    // t10 — deterministic training-mixture sampling: each source gets a
    // rate from {1.0, 0.75, 0.5, 0.25} (derived from its index), and a
    // doc survives iff hash60(source:doc_id) < rate·2^60 — the
    // hash-threshold idiom that gives exact, reshuffle-stable mixture
    // weights with no rand() and no coordination. The comparison is
    // exact 60-bit integer math both engines reproduce bit-for-bit.
    Q("t10_mixture",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val quarter = 288230376151711744L // 2^60 / 4
        val m = expr("substring(source, 4)").cast("int") % 4
        val limit = (lit(4) - m).cast("long") * quarter
        val kept = TF.hash60(
          concat(col("source"), lit(":"), col("doc_id").cast("string")))
          .< (limit)
        docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
            coalesce(sum(when(kept, col("n_chars"))), lit(0L))
              .as("kept_chars"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT source, doc_id, n_chars,
             |    CAST(('0x' || substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
             |      < (4 - CAST(substr(source, 4) AS INT) % 4) * 288230376151711744 AS kept
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_total,
             |  CAST(COALESCE(SUM(CASE WHEN kept THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept,
             |  CAST(COALESCE(SUM(n_chars) FILTER (WHERE kept), 0) AS BIGINT) AS kept_chars
             |FROM d GROUP BY source ORDER BY source""".stripMargin)),

    // ----------------------------------------------------------------
    // t11 — sequence packing (concat-and-split): per shard (= source),
    // documents are concatenated in doc_id order and the token stream is
    // cut every 512 tokens — each doc learns its global token offset and
    // the training-sequence range it lands in. The prefix sum is a window
    // PARTITIONED BY the shard, so shards pack in parallel; a single
    // global pack would be a one-partition window, which is exactly why
    // real pipelines pack per shard.
    Q("t11_packing",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        docs.select(col("doc_id"), col("source"),
            TF.tokenCount(col("text")).as("n_tokens"))
          .withColumn("tok_offset",
            coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("first_seq", expr("tok_offset div 512"))
          .withColumn("last_seq",
            expr("(tok_offset + n_tokens - 1) div 512"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, source, $normT AS t FROM documents),
              |n AS (SELECT doc_id, source,
              |    CASE WHEN t = '' THEN CAST(0 AS BIGINT)
              |      ELSE CAST(len(string_split_regex(t, ' ')) AS BIGINT)
              |      END AS n_tokens
              |  FROM base),
              |o AS (SELECT doc_id, source, n_tokens,
              |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
              |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
              |      AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
              |  FROM n)
              |SELECT doc_id, source, n_tokens, tok_offset,
              |  tok_offset // 512 AS first_seq,
              |  (tok_offset + n_tokens - 1) // 512 AS last_seq
              |FROM o ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t06 — benchmark decontamination (operators/Contamination): per
    // held-out doc (doc_id % 50 = 0), the fraction of its distinct word
    // 5-grams that occur anywhere in the training split. One equality
    // join on the shingle string against a DEDUPLICATED corpus shingle
    // set — a shingle shared by a billion training docs joins once.
    Q("t06_contamination",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val heldOut = docs.filter(col("doc_id") % 50 === 0)
        val corpus = docs.filter(col("doc_id") % 50 =!= 0)
        graft.operators.Contamination.ngramOverlap(corpus, heldOut,
            "doc_id", "text", shingleWords = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d),
              |sh AS (SELECT DISTINCT doc_id,
              |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] AS s
              |       FROM toks, unnest(generate_series(1, len(w) - 4)) AS u(i)
              |       WHERE len(w) >= 5),
              |corpus AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 <> 0),
              |held AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 = 0)
              |SELECT h.doc_id, COUNT(*) AS n_shingles,
              |  COUNT(c.s) AS n_hit,
              |  ${TF.ratio6Sql("COUNT(c.s)", "COUNT(*)")} AS overlap
              |FROM held h LEFT JOIN corpus c ON h.s = c.s
              |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t12 — TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln((N+1)/(df+1)), ranked on the ROUNDED score (6 dp) so both
    // engines order by the exact same hashed value — a transcendental
    // (ln) is not guaranteed bit-identical across libm implementations,
    // and ranking on the raw double would let a sub-ulp difference flip
    // a rank. Plan: one token explode, two partial-aggregated shuffles
    // (tf by (doc, term), df by term), a broadcast of the single-row
    // corpus count, one window for the top-k — nothing driver-side.
    Q("t12_tfidf",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val toks = docs
          .select(col("doc_id"),
            explode_outer(TF.tokens(col("text"))).as("term"))
          .filter(length(col("term")) > 0)
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))
        tf.join(dfreq, "term")
          .crossJoin(broadcast(nDocs))
          .withColumn("tfidf", round(col("tf") *
            log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank"), col("term"), col("tf"),
            col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, t AS term FROM (
              |    SELECT doc_id, unnest(string_split_regex($normT, ' ')) AS t
              |    FROM documents)
              |  WHERE len(t) > 0),
              |tf AS (SELECT doc_id, term, COUNT(*) AS tf
              |       FROM toks GROUP BY doc_id, term),
              |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              |n AS (SELECT COUNT(*) AS n_docs FROM documents),
              |scored AS (
              |  SELECT doc_id, term, tf, df,
              |    ROUND(tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 6) AS tfidf
              |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
              |ranked AS (
              |  SELECT *, row_number() OVER
              |    (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
              |  FROM scored)
              |SELECT doc_id, rank, term, tf, df, tfidf FROM ranked
              |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // k01 — the inverted-index computation (sinks/InvertedIndex.postings)
    // in the driver gate: field-qualified posting lists with sorted doc
    // ids and document frequency, the exact rows the Flamdex-analog sink
    // lays out on disk (reference Main.java:249-352 emits these per-field
    // term→docs entries). Sorted-array aggregation is one shuffle per
    // field union leg; df comes from the same aggregate.
    Q("k01_posting_lists",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.sinks.InvertedIndex.postings(docs, "doc_id",
            Seq("lang", "source"))
          .groupBy(col("field"), col("term_str"))
          // posting list emitted as a joined string: the driver's
          // comparator sorts rows with pandas, which cannot order array
          // cells (same constraint as s04)
          .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
              .as("docs"),
            count(lit(1)).as("df"))
          .orderBy(col("field"), col("term_str"))
      },
      Some("""WITH p AS (
             |  SELECT 'lang' AS field, lang AS term_str, doc_id
             |  FROM documents WHERE lang IS NOT NULL
             |  UNION ALL
             |  SELECT 'source', source, doc_id
             |  FROM documents WHERE source IS NOT NULL)
             |SELECT field, term_str,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS docs,
             |  COUNT(*) AS df
             |FROM p GROUP BY field, term_str
             |ORDER BY field, term_str""".stripMargin)),

    // ----------------------------------------------------------------
    // k02 — search THROUGH the index artifact: token-level postings are
    // written with the real K2-analog sink (field-partitioned,
    // range-partitioned on term, term-sorted files), read back through
    // the partition-pruned path, and a conjunctive (AND) multi-term
    // query ranks documents by total term frequency — the Imhotep
    // term-group-stats query shape (reference Main.java:107-112's index
    // consumer) executed natively in Spark. At scale the read touches
    // one field dir and, within it, only the row groups whose term
    // min/max straddle the queried terms — the write-time sort is what
    // buys that pruning. The oracle restates the whole thing from the
    // raw documents.
    Q("k02_index_search",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          TF.tokens(col("text")).as("tokens"))
        val path = graft.sources.Scratch.dir("k02_index")
        graft.sinks.InvertedIndex.write(toks, "doc_id", Seq("tokens"), path)
        val terms = Seq("data", "spark", "query")
        val tf = s.read.parquet(path)
          .filter(col("field") === "tokens" &&
            col("term_str").isin(terms: _*))
          .groupBy(col("doc_id"), col("term_str"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("tf_total"),
            sum(when(col("term_str") === "data", col("tf")).otherwise(0L))
              .as("tf_data"),
            sum(when(col("term_str") === "spark", col("tf")).otherwise(0L))
              .as("tf_spark"),
            sum(when(col("term_str") === "query", col("tf")).otherwise(0L))
              .as("tf_query"),
            countDistinct(col("term_str")).as("nt"))
          .filter(col("nt") === terms.size)
          .select(col("doc_id"), col("tf_total"), col("tf_data"),
            col("tf_spark"), col("tf_query"))
          .orderBy(col("tf_total").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split_regex(t, ' ')) AS term
              |  FROM (SELECT doc_id, $normT AS t FROM documents)
              |  WHERE t <> ''),
              |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
              |       WHERE term IN ('data', 'spark', 'query')
              |       GROUP BY doc_id, term),
              |agg AS (SELECT doc_id,
              |    CAST(SUM(tf) AS BIGINT) AS tf_total,
              |    CAST(SUM(CASE WHEN term = 'data' THEN tf ELSE 0 END) AS BIGINT) AS tf_data,
              |    CAST(SUM(CASE WHEN term = 'spark' THEN tf ELSE 0 END) AS BIGINT) AS tf_spark,
              |    CAST(SUM(CASE WHEN term = 'query' THEN tf ELSE 0 END) AS BIGINT) AS tf_query,
              |    COUNT(DISTINCT term) AS nt
              |  FROM tf GROUP BY doc_id)
              |SELECT doc_id, tf_total, tf_data, tf_spark, tf_query
              |FROM agg WHERE nt = 3
              |ORDER BY tf_total DESC, doc_id LIMIT 10""".stripMargin)),

    // ----------------------------------------------------------------
    // k03 — index GENERATIONS + compaction, the LSM/Lucene lifecycle
    // over k02's artifact: the base corpus is indexed once (gen=0),
    // an appended doc batch is indexed as its own generation (gen=1 —
    // gen-0 files untouched, which is how an index ingests at scale),
    // both generations are read back through one partition-discovered
    // root and merged into a single compacted artifact (one re-sort
    // job), and the k02 conjunctive search runs THROUGH the compacted
    // artifact. The oracle is the search restated over the full raw
    // corpus, so the gate hash-proves maintain + compact ≡ rebuild —
    // the q70/g03/s20 contract applied to the index sink. Different
    // terms than k02, so the two entries pin different posting paths.
    Q("k03_index_compaction",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          TF.tokens(col("text")).as("tokens"))
        k03Older.foreach(graft.sources.Scratch.deleteNow)
        k03Older = k03Prev
        val base = graft.sources.Scratch.dir("k03_gens")
        graft.sinks.InvertedIndex.write(
          toks.filter(col("doc_id") % 2 === 0), "doc_id", Seq("tokens"),
          base + "/gen=0")
        graft.sinks.InvertedIndex.write(
          toks.filter(col("doc_id") % 2 =!= 0), "doc_id", Seq("tokens"),
          base + "/gen=1")
        val compacted = graft.sources.Scratch.dir("k03_compacted")
        k03Prev = Seq(base, compacted)
        graft.sinks.InvertedIndex.writePostings(
          s.read.parquet(base).drop("gen"), compacted)
        val terms = Seq("stream", "batch", "window")
        val tf = s.read.parquet(compacted)
          .filter(col("field") === "tokens" &&
            col("term_str").isin(terms: _*))
          .groupBy(col("doc_id"), col("term_str"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("tf_total"),
            countDistinct(col("term_str")).as("nt"))
          .filter(col("nt") === terms.size)
          .select(col("doc_id"), col("tf_total"))
          .orderBy(col("tf_total").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split_regex(t, ' ')) AS term
              |  FROM (SELECT doc_id, $normT AS t FROM documents)
              |  WHERE t <> ''),
              |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
              |       WHERE term IN ('stream', 'batch', 'window')
              |       GROUP BY doc_id, term),
              |agg AS (SELECT doc_id,
              |    CAST(SUM(tf) AS BIGINT) AS tf_total,
              |    COUNT(DISTINCT term) AS nt
              |  FROM tf GROUP BY doc_id)
              |SELECT doc_id, tf_total
              |FROM agg WHERE nt = 3
              |ORDER BY tf_total DESC, doc_id LIMIT 10""".stripMargin)),

    // ----------------------------------------------------------------
    // k04 — STREAMING index ingest: k03's LSM-generation lifecycle fed
    // by the real streaming engine. Documents stream in micro-batches;
    // each foreachBatch tokenizes ITS batch (scan-stage work on arriving
    // docs only — the corpus is never re-tokenized) and writes one
    // `gen=<batchId>` generation with the k01 sink. Exactly-once comes
    // free from the layout: a generation dir is KEYED BY BATCH ID and
    // written with mode=overwrite, so a foreachBatch replay rewrites its
    // own generation instead of duplicating postings (the idempotence
    // that q86/s22 need a staged two-phase commit for — here the LSM
    // layout IS the commit protocol). The k02 conjunctive search runs
    // across all generations through one partition-discovered root (the
    // pre-compaction read path k03 then merges); the oracle restates it
    // over the raw corpus, hash-proving stream-ingested index ≡ rebuild
    // regardless of engine batching. With q86/q89/q91/s22/m06 this
    // closes streaming ingest across every persisted artifact family
    // (sketches, graph, dedup, vectors, media, text postings).
    Q("k04_stream_index_ingest",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        val src = graft.sources.Scratch.dir("k04_src")
        Tables.load(ss, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(8).write.mode("overwrite").parquet(src)
        val base = graft.sources.Scratch.dir("k04_gens")
        val q = ss.readStream.schema(ss.read.parquet(src).schema)
          .option("maxFilesPerTrigger", StreamingQueries.GateFilesPerTrigger).parquet(src)
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.sources.Scratch.dir("k04_cp"))
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.sinks.InvertedIndex.write(
              b.select(col("doc_id"), TF.tokens(col("text")).as("tokens")),
              "doc_id", Seq("tokens"), s"$base/gen=$id")
          }
          .start()
        q.awaitTermination()
        val terms = Seq("merge", "sort", "scan")
        val tf = s.read.parquet(base).drop("gen")
          .filter(col("field") === "tokens" &&
            col("term_str").isin(terms: _*))
          .groupBy(col("doc_id"), col("term_str"))
          .agg(count(lit(1)).as("tf"))
        tf.groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("tf_total"),
            countDistinct(col("term_str")).as("nt"))
          .filter(col("nt") === terms.size)
          .select(col("doc_id"), col("tf_total"))
          .orderBy(col("tf_total").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split_regex(t, ' ')) AS term
              |  FROM (SELECT doc_id, $normT AS t FROM documents)
              |  WHERE t <> ''),
              |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
              |       WHERE term IN ('merge', 'sort', 'scan')
              |       GROUP BY doc_id, term),
              |agg AS (SELECT doc_id,
              |    CAST(SUM(tf) AS BIGINT) AS tf_total,
              |    COUNT(DISTINCT term) AS nt
              |  FROM tf GROUP BY doc_id)
              |SELECT doc_id, tf_total
              |FROM agg WHERE nt = 3
              |ORDER BY tf_total DESC, doc_id LIMIT 10""".stripMargin)),

    // ----------------------------------------------------------------
    // t13 — CONTENT-DEFINED chunking (the dedup-friendly complement of
    // t09's fixed windows): a chunk boundary falls after any token whose
    // trailing 3-gram hashes to 0 mod 16, so boundaries move with the
    // CONTENT — an insertion early in a document shifts every t09 window
    // but only the one CDC chunk it lands in, which is what makes
    // chunk-level dedup robust to edits. Expected chunk ~16 tokens; the
    // md5-derived gear hash makes boundaries engine-portable. Plan: one
    // shingle explode + boundary filter in the scan, a per-doc window for
    // inter-boundary gaps, one aggregate — chunk text never leaves the
    // scan stage, only positions do.
    Q("t13_cdc_chunking",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val toks = docs
          .select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
          .select(col("doc_id"),
            size(col("__tok")).cast("long").as("n_tokens"),
            // positional shingles: boundary location needs true offsets,
            // the distinct form would shift positions after a repeat
            TF.wordShinglesPositional(col("__tok"), 3).as("__sh"))
          .filter(col("n_tokens") > 0)
        // boundary = 0-based index of the last token of a matching 3-gram.
        // posexplode_OUTER on purpose: the non-outer form adds an implicit
        // `size(__sh) > 0` predicate that Catalyst pushes below the
        // projections, inlining the whole shingle transform (and its
        // tokenization) several more times per row in the scan filter —
        // measured 5x slower. The outer generate has no implicit filter;
        // the null rows it adds are dropped on the generated attribute.
        val bounds = toks
          .select(col("doc_id"), posexplode_outer(col("__sh")).as(Seq("p", "s")))
          .filter(col("s").isNotNull && TF.hash60(col("s")) % 16 === 0)
          .select(col("doc_id"), (col("p") + 2).cast("long").as("bpos"))
        // sentinel boundary at the last token closes the tail chunk; it
        // may coincide with a real boundary, hence the distinct
        val sentinel = toks.select(col("doc_id"),
          (col("n_tokens") - 1).as("bpos"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("bpos"))
        val lens = bounds.union(sentinel).distinct()
          .withColumn("clen",
            col("bpos") - coalesce(lag(col("bpos"), 1).over(w), lit(-1L)))
        lens.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"), max(col("clen")).as("max_chunk"))
          .join(toks.select(col("doc_id"), col("n_tokens")), "doc_id")
          .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
            col("max_chunk"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w
              |         FROM d WHERE t <> ''),
              |n AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks),
              |sh AS (SELECT doc_id, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              |       FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(i)
              |       WHERE len(w) >= 3),
              |b AS (SELECT doc_id, CAST(i + 1 AS BIGINT) AS bpos FROM sh
              |      WHERE ${h60("s")} % 16 = 0
              |      UNION
              |      SELECT doc_id, n_tokens - 1 FROM n),
              |lens AS (SELECT doc_id, bpos - COALESCE(
              |    lag(bpos) OVER (PARTITION BY doc_id ORDER BY bpos), -1) AS clen
              |  FROM b),
              |g AS (SELECT doc_id, COUNT(*) AS n_chunks, MAX(clen) AS max_chunk
              |      FROM lens GROUP BY doc_id)
              |SELECT doc_id, n_tokens, n_chunks, max_chunk
              |FROM g JOIN n USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t14 — token-budget mixture fill: each source keeps documents (in
    // deterministic arrival order) until its cumulative token count
    // exceeds a fixed budget — "fill the training mix to N tokens per
    // source", the budgeted complement of t10's rate sampling. One
    // prefix-sum window per source partition (sources fill in parallel),
    // then a per-source aggregate; a doc is kept iff its own cumulative
    // total still fits the budget.
    Q("t14_token_budget",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 20000L
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"), col("source"),
          size(TF.tokens(col("text"))).cast("long").as("n_tokens"))
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        toks.withColumn("cum", sum(col("n_tokens")).over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tokens_total"),
            sum(when(col("cum") <= budget, 1L).otherwise(0L))
              .as("n_kept"),
            sum(when(col("cum") <= budget, col("n_tokens"))
              .otherwise(0L)).as("tokens_kept"))
          .orderBy(col("source"))
      },
      Some(s"""WITH n AS (SELECT doc_id, source,
              |    CASE WHEN $normT = '' THEN CAST(0 AS BIGINT)
              |         ELSE CAST(len(string_split_regex($normT, ' ')) AS BIGINT)
              |    END AS n_tokens
              |  FROM documents),
              |c AS (SELECT doc_id, source, n_tokens,
              |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS BIGINT) AS cum
              |  FROM n)
              |SELECT source, COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
              |  CAST(SUM(CASE WHEN cum <= 20000 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_kept,
              |  CAST(SUM(CASE WHEN cum <= 20000 THEN n_tokens ELSE 0 END)
              |    AS BIGINT) AS tokens_kept
              |FROM c GROUP BY source ORDER BY source""".stripMargin)),

    // ----------------------------------------------------------------
    // t15 — corpus-level exact passage dedup (the ExactSubstr step of
    // RefinedWeb/The-Pile pipelines, at paragraph granularity): chunk
    // every document into t09's 50-token windows, keep only the FIRST
    // occurrence of each distinct chunk corpus-wide (canonical order =
    // (doc_id, chunk_idx)), and report per document what survived plus a
    // digest of the residual chunk sequence. The plan is linear — one
    // shuffle on the chunk hash for the first-occurrence window, one
    // aggregate back per doc; no pair joins anywhere, which is what
    // makes exact passage dedup run at 100 TB where near-dup methods
    // need LSH.
    Q("t15_passage_dedup",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val chunks = docs
          .select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
          .select(col("doc_id"), col("__tok"), size(col("__tok")).as("__n"))
          .filter(col("__n") > 0)
          .withColumn("chunk_idx",
            explode(sequence(lit(0), ((col("__n") - 1) / 50).cast("int"))))
          .select(col("doc_id"), col("chunk_idx"),
            slice(col("__tok"), col("chunk_idx") * 50 + 1, lit(50))
              .as("__chunk"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("__chunk")).cast("long").as("n_tok"),
            md5(array_join(col("__chunk"), " ")).as("chunk_md5"))
        val w = Window.partitionBy(col("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
        chunks.withColumn("keep", row_number().over(w) === 1)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("keep"), col("n_tok")).otherwise(0L))
              .as("tokens_dropped"),
            md5(array_join(transform(
              array_sort(collect_list(when(col("keep"),
                struct(col("chunk_idx"), col("chunk_md5"))))),
              e => e.getField("chunk_md5")), "")).as("residual_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w,
              |    len(string_split_regex(t, ' ')) AS n FROM base
              |  WHERE t <> ''),
              |ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
              |    w[i * 50 + 1 : least((i + 1) * 50, n)] AS c
              |  FROM toks, unnest(generate_series(0, (n - 1) // 50)) u(i)),
              |h AS (SELECT doc_id, chunk_idx,
              |    CAST(len(c) AS BIGINT) AS n_tok,
              |    md5(array_to_string(c, ' ')) AS chunk_md5
              |  FROM ch),
              |marked AS (SELECT *,
              |    row_number() OVER (PARTITION BY chunk_md5
              |      ORDER BY doc_id, chunk_idx) = 1 AS keep
              |  FROM h)
              |SELECT doc_id, COUNT(*) AS n_chunks,
              |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tok END) AS BIGINT)
              |    AS tokens_dropped,
              |  md5(COALESCE(string_agg(CASE WHEN keep THEN chunk_md5 END, ''
              |    ORDER BY chunk_idx), '')) AS residual_md5
              |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t16 — Gopher-style quality rule filtering (Rae et al. 2021 §A1.1):
    // the explicit per-document rule battery a production corpus filter
    // applies before model-based scoring — token-count window, mean word
    // length window, alphabetic-token fraction, minimum stopword hits —
    // each surfaced as its own boolean (so rejection reasons are
    // auditable) plus the combined verdict. All rules are single-pass
    // scan-stage math over one shared tokenization; the doubles are
    // ratios of exact integers, so the gate needs no rounding.
    Q("t16_quality_rules",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val sw = array(TF.stopwords("en").map(lit): _*)
        val toks = docs.select(col("doc_id"), TF.tokens(col("text")).as("t"))
          .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n"))
        val feats = toks.select(col("doc_id"), col("n"),
          when(col("n") > 0,
            aggregate(transform(col("t"), w => length(w)), lit(0L),
              (a, x) => a + x).cast("double") / col("n")).otherwise(0.0)
            .as("mean_len"),
          when(col("n") > 0,
            size(filter(col("t"), w => w.rlike("[a-z]"))).cast("double") /
              col("n")).otherwise(0.0).as("alpha_frac"),
          size(filter(col("t"), w => array_contains(sw, w))).cast("long")
            .as("n_stop"))
        feats.select(col("doc_id"), col("n"), col("mean_len"),
            col("alpha_frac"), col("n_stop"),
            (col("n") >= 50 && col("n") <= 100000).as("rule_len"),
            (col("mean_len") >= 3.0 && col("mean_len") <= 10.0)
              .as("rule_wordlen"),
            (col("alpha_frac") >= 0.8).as("rule_alpha"),
            (col("n_stop") >= 2).as("rule_stop"))
          .withColumn("pass",
            col("rule_len") && col("rule_wordlen") && col("rule_alpha") &&
              col("rule_stop"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |toks AS (SELECT doc_id,
              |    CASE WHEN t = '' THEN [] ELSE string_split_regex(t, ' ') END AS w
              |  FROM base),
              |feats AS (SELECT doc_id,
              |    CAST(len(w) AS BIGINT) AS n,
              |    CASE WHEN len(w) > 0 THEN
              |      CAST(list_sum(list_transform(w, x -> CAST(len(x) AS INT))) AS DOUBLE) / len(w)
              |      ELSE 0.0 END AS mean_len,
              |    CASE WHEN len(w) > 0 THEN
              |      CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(w)
              |      ELSE 0.0 END AS alpha_frac,
              |    CAST(len(list_filter(w, x -> list_contains($enList, x))) AS BIGINT) AS n_stop
              |  FROM toks)
              |SELECT doc_id, n, mean_len, alpha_frac, n_stop,
              |  (n >= 50 AND n <= 100000) AS rule_len,
              |  (mean_len >= 3.0 AND mean_len <= 10.0) AS rule_wordlen,
              |  (alpha_frac >= 0.8) AS rule_alpha,
              |  (n_stop >= 2) AS rule_stop,
              |  (n >= 50 AND n <= 100000 AND mean_len >= 3.0
              |    AND mean_len <= 10.0 AND alpha_frac >= 0.8
              |    AND n_stop >= 2) AS pass
              |FROM feats ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t17 — SOURCE overlap matrix: exact pairwise Jaccard between
    // sources over their distinct 3-shingle-hash sets — the corpus-
    // level contamination audit ("how much of source A is also in
    // source B") run before mixing training sources. Scale shape: the
    // per-source shingle sets are distinct'd FIRST, so the
    // intersection self-join keyed on the 8-byte hash fans out at most
    // (#sources)² per hash — bounded by the source count, NOT by
    // document frequency (no stop-shingle cap needed, unlike d04's
    // doc-level join). Jaccard is ONE double division of exact
    // integers (the ≤3-single-op rule).
    Q("t17_source_overlap",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val hs = docs
          .select(col("source"), TF.tokens(col("text")).as("__tok"))
          .select(col("source"),
            explode_outer(TF.wordShinglesFromTokens(col("__tok"), 3))
              .as("sgl"))
          .filter(col("sgl").isNotNull)
          .select(col("source"), TF.hash60(col("sgl")).as("h"))
          .distinct()
        val sizes = hs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = hs.as("x").join(hs.as("y"),
            col("x.h") === col("y.h") && col("x.source") < col("y.source"))
          .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
          .agg(count(lit(1)).as("inter_n"))
        inter
          .join(sizes.select(col("source").as("sa"), col("n").as("na")),
            "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("nb")),
            "sb")
          .select(col("sa"), col("sb"), col("inter_n"), col("na"),
            col("nb"),
            (col("inter_n").cast("double") /
              (col("na") + col("nb") - col("inter_n")).cast("double"))
              .as("jaccard"))
          .orderBy(col("sa"), col("sb"))
      },
      Some(s"""WITH d AS (SELECT source, $normT AS t FROM documents),
              |toks AS (SELECT source, string_split_regex(t, ' ') AS w
              |         FROM d),
              |sh AS (SELECT DISTINCT source,
              |         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              |       FROM toks,
              |         unnest(generate_series(1, len(w) - 2)) AS u(i)
              |       WHERE len(w) >= 3),
              |hs AS (SELECT DISTINCT source, ${h60("s")} AS h FROM sh),
              |sizes AS (SELECT source, COUNT(*) AS n FROM hs
              |          GROUP BY source),
              |inter AS (SELECT x.source AS sa, y.source AS sb,
              |            COUNT(*) AS inter_n
              |          FROM hs x JOIN hs y
              |            ON x.h = y.h AND x.source < y.source
              |          GROUP BY 1, 2)
              |SELECT sa, sb, inter_n, a.n AS na, b.n AS nb,
              |  CAST(inter_n AS DOUBLE) / (a.n + b.n - inter_n) AS jaccard
              |FROM inter
              |JOIN sizes a ON a.source = sa
              |JOIN sizes b ON b.source = sb
              |ORDER BY sa, sb""".stripMargin)),

    // ----------------------------------------------------------------
    // t18 — BPE TOKENIZER TRAINING: the Sennrich merge loop fit on the
    // corpus itself (the artifact every t-family token count is a
    // regex proxy for). Scale shape: ONE corpus pass collapses the
    // corpus to the (distinct word, freq) table; the 8 merge rounds
    // iterate on that 1000×-smaller frame — a pair-count shuffle, a
    // one-row argmax, and a map-only greedy merge to fixpoint each.
    // The oracle restates ALL EIGHT ROUNDS — pair counting, the
    // (count DESC, pair ASC) argmax, and the same literal-replace
    // fixpoint (engine-identical scan semantics) — as unrolled
    // MATERIALIZED CTEs with a recursive fixpoint per round. Pure
    // integer counts and string order: nothing floating-point exists
    // in the whole loop. BpeSpec pins the operator against a
    // hand-written canonical BPE on the overlapping-run corpus.
    Q("t18_bpe_train",
      (s, dir) => graft.operators.Bpe.trainDf(s,
          Tables.load(s, dir, "documents"), "text", rounds = 8)
        .orderBy(col("step")),
      Some(bpeOracle(8))),

    // ----------------------------------------------------------------
    // t23 — BATCHED BPE TRAINING, deeper vocab (r16 carry-over #8):
    // 16 merges trained with batchK = 4 — up to four merges accepted
    // per Spark round under the exact-equivalence rules (symbol
    // disjointness + the created-pair triple bound, Bpe class doc),
    // cutting the sequential-job count a production 32k-merge vocab
    // pays ~4×. The oracle is the SEQUENTIAL 16-round DuckDB chain:
    // the hash proves the batched trainer reproduces the exact
    // one-merge-at-a-time argmax sequence, not an approximation of
    // it. (BpeSpec pins batched ≡ sequential in-engine; this gate
    // pins it cross-engine at driver scale.)
    Q("t23_bpe_train_batched",
      (s, dir) => graft.operators.Bpe.trainDf(s,
          Tables.load(s, dir, "documents"), "text", rounds = 16,
          batchK = 4)
        .orderBy(col("step")),
      Some(bpeOracle(16))),

    // ----------------------------------------------------------------
    // t20 — BIGRAM-LM PERPLEXITY FILTER (the CCNet shape): a small
    // in-domain seed (doc_id % 9 = 0, held out of scoring) trains an
    // interpolated bigram LM and every other document is scored by
    // per-token cross-entropy — the filter that separates fluent text
    // from boilerplate/garbage upstream of dedup. t07's unigram NLL
    // scores a doc against the WHOLE corpus; this is the trained-seed
    // shape with CONTEXT (bigrams), the published perplexity-filter
    // semantics. Exactness (the q54/q124 discipline): the interpolated
    // probability λ·c12/c1 + (1−λ)·(c2+1)/(T+V) with λ = 0.9 folds
    // into ONE division of two exactly-representable integer products
    // ((9·c12·(T+V) + (c2+1)·c1) / (10·c1·(T+V)), ≲10¹² ≪ 2⁵³ at the
    // gate SFs), one ln, rounded 6dp, fixed as DECIMAL; an unseen
    // context (c1 = 0) backs off to the smoothed unigram. ce is the
    // exact decimal sum negated, cast to double, divided by the exact
    // bigram count — identical IEEE ops in both engines. The seed
    // count tables grow with the corpus, so the joins are left
    // unhinted (broadcast at gate scale by AQE; honest shuffles at
    // 100 TB). Docs with <2 tokens have no bigrams and are absent on
    // both sides.
    Q("t20_bigram_perplexity",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          TF.tokens(col("text")).as("__tok"))
        val uni = toks.filter(col("doc_id") % 9 === 0)
          .select(explode(col("__tok")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .localCheckpoint()
        // bounded driver scalars: seed token total + vocab size
        val tv = uni.agg(sum(col("c")), count(lit(1))).head()
        val (tTot, v) = (tv.getLong(0), tv.getLong(1))
        require(tTot > 0, "t20: empty seed split")
        val tpv = tTot + v
        val bi = toks.filter(col("doc_id") % 9 === 0)
          .select(explode(TF.wordShinglesPositional(col("__tok"), 2))
            .as("g"))
          .groupBy(col("g")).agg(count(lit(1)).as("c12"))
        val pairs = toks.filter(col("doc_id") % 9 =!= 0)
          .select(col("doc_id"),
            explode(TF.wordShinglesPositional(col("__tok"), 2)).as("g"))
          .select(col("doc_id"), col("g"),
            split(col("g"), " ").getItem(0).as("w1"),
            split(col("g"), " ").getItem(1).as("w2"))
        val c1 = coalesce(col("c1"), lit(0L))
        val c2 = coalesce(col("c2"), lit(0L))
        val c12 = coalesce(col("c12"), lit(0L))
        pairs
          .join(bi, Seq("g"), "left_outer")
          .join(uni.select(col("w").as("w1"), col("c").as("c1")),
            Seq("w1"), "left_outer")
          .join(uni.select(col("w").as("w2"), col("c").as("c2")),
            Seq("w2"), "left_outer")
          .select(col("doc_id"),
            round(log(
              when(c1 > 0,
                (lit(9L) * c12 * lit(tpv) + (c2 + 1L) * c1)
                  .cast(DoubleType) /
                (lit(10L) * c1 * lit(tpv)).cast(DoubleType))
                .otherwise((c2 + 1L).cast(DoubleType) /
                  lit(tpv).cast(DoubleType))), 6)
              .cast(DecimalType(18, 6)).as("lp"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("lp")).as("__slp"))
          .select(col("doc_id"), col("n_bigrams"),
            ((-col("__slp")).cast(DoubleType) / col("n_bigrams"))
              .as("ce"))
          .localCheckpoint()
      }
      // CORPUS-RELATIVE cut (CCNet filters against the corpus's own
      // distribution, not an absolute constant): kept = ce ≤ mean(ce),
      // the mean a BOUNDED DRIVER SCALAR — an exact 6dp-decimal sum
      // (order-independent) cast correctly-rounded to double over the
      // exact count, the identical two IEEE ops DuckDB's
      // CAST(SUM(dec) AS DOUBLE)/COUNT performs — never a
      // single-partition window over the doc rows
      .transform { scored =>
        val r = scored
          .agg(sum(Exact.dec(col("ce"))), count(lit(1))).head()
        val mce = r.getDecimal(0).doubleValue() / r.getLong(1)
        scored
          .select(col("doc_id"), col("n_bigrams"), col("ce"),
            (col("ce") <= lit(mce)).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |tk AS (SELECT doc_id, string_split_regex(t, ' ') AS w
              |  FROM base WHERE t <> ''),
              |su AS (SELECT u.tok AS w1, CAST(COUNT(*) AS BIGINT) AS c
              |  FROM (SELECT w FROM tk WHERE doc_id % 9 = 0),
              |    unnest(w) AS u(tok) GROUP BY 1),
              |tv AS (SELECT CAST(SUM(c) AS BIGINT) AS t,
              |    CAST(COUNT(*) AS BIGINT) AS v FROM su),
              |sb AS (SELECT w[i] || ' ' || w[i+1] AS g,
              |    CAST(COUNT(*) AS BIGINT) AS c12
              |  FROM tk, unnest(generate_series(1, len(w) - 1)) AS u(i)
              |  WHERE doc_id % 9 = 0 AND len(w) >= 2 GROUP BY 1),
              |pg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2,
              |    w[i] || ' ' || w[i+1] AS g
              |  FROM tk, unnest(generate_series(1, len(w) - 1)) AS u(i)
              |  WHERE doc_id % 9 <> 0 AND len(w) >= 2),
              |sc AS (SELECT p.doc_id, CAST(round(
              |    CASE WHEN COALESCE(u1.c, 0) > 0 THEN
              |      ln(CAST(9 * COALESCE(b.c12, 0) * (t + v) +
              |          (COALESCE(u2.c, 0) + 1) * u1.c AS DOUBLE) /
              |        CAST(10 * u1.c * (t + v) AS DOUBLE))
              |    ELSE ln(CAST(COALESCE(u2.c, 0) + 1 AS DOUBLE) /
              |        CAST(t + v AS DOUBLE)) END, 6)
              |    AS DECIMAL(18,6)) AS lp
              |  FROM pg p CROSS JOIN tv
              |  LEFT JOIN sb b ON b.g = p.g
              |  LEFT JOIN su u1 ON u1.w1 = p.w1
              |  LEFT JOIN su u2 ON u2.w1 = p.w2),
              |fin AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
              |    CAST(-SUM(lp) AS DOUBLE) / COUNT(*) AS ce
              |  FROM sc GROUP BY doc_id),
              |mm AS (SELECT CAST(SUM(CAST(ce AS DECIMAL(18,6))) AS DOUBLE)
              |    / COUNT(*) AS mce FROM fin)
              |SELECT doc_id, n_bigrams, ce,
              |  ce <= (SELECT mce FROM mm) AS kept
              |FROM fin ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t22 — WITHIN-DOC REPETITION FILTER (the Gopher/MassiveText
    // repetition class, Rae et al. 2021 §A.1.1): two signals no other
    // t-gate measures — the duplicate word-3-gram fraction
    // (n3 − distinct3)/n3 and the most-frequent-2-gram share m2/n2 —
    // catching boilerplate/looping text whose PER-TOKEN statistics
    // (t02's length/stopword/punct ratios) look fine. Published
    // absolute thresholds never bind on this corpus (max dup3 0.043
    // vs Gopher's high cuts), so the cut is CORPUS-RELATIVE like
    // t20's: kept = both signals ≤ their corpus means. NOTHING in
    // this gate touches floating point (the r16 driver lesson: its
    // first outing computed the fractions via round(DOUBLE, 6), and
    // ratios of small integers land on dyadic 6dp halves — 1/128 =
    // 0.0078125 — where engine round-half modes legitimately differ;
    // the q54 class all over again). Each fraction is stated as
    // HALF_UP parts-per-million in EXACT integer arithmetic —
    // HALF_UP(a/b · 10⁶) = (2a·10⁶ + b) div (2b), identical integral
    // division in both engines — and the mean cut as integer
    // cross-multiplication (ppm·count ≤ Σppm ⟺ ppm ≤ mean). The raw
    // counts (n2, m2, n3, d3) cross the gate as columns so any future
    // driver divergence is attributable to tokenization vs arithmetic
    // from the artifact alone (the t21 trick applied here). Corpus
    // totals are bounded driver scalars (t20 pattern). Scale shape:
    // ONE corpus scan emitting both gram lengths per position, then
    // cascading map-side-combinable aggregates over ever-smaller
    // keys; docs with <3 tokens have no 3-gram and are absent on
    // both sides.
    Q("t22_repetition_filter",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // ONE corpus scan: each token position i emits its 2-gram and
        // (when one exists) its 3-gram in the same struct, and the
        // four per-doc statistics cascade off that single explode —
        // (doc, g2, g3) counts, then per-(doc, g2) partials, then the
        // doc row. d3 sums per-g2 distinct-g3 counts exactly because
        // a 3-gram's first two tokens ARE its g2 (same start index):
        // every distinct g3 lives under exactly one g2 group. Two
        // branched explodes here would re-tokenize the corpus twice.
        val pairs = docs
          .select(col("doc_id"), TF.tokens(col("text")).as("__tok"))
          .select(col("doc_id"), explode(when(size(col("__tok")) >= 2,
            transform(sequence(lit(1), size(col("__tok")) - 1), i =>
              struct(
                array_join(slice(col("__tok"), i, lit(2)), " ")
                  .as("g2"),
                when(i <= size(col("__tok")) - 2,
                  array_join(slice(col("__tok"), i, lit(3)), " "))
                  .as("g3"))))
            .otherwise(array().cast(
              "array<struct<g2:string,g3:string>>"))).as("g"))
        val perGram = pairs
          .groupBy(col("doc_id"), col("g.g2").as("g2"),
            col("g.g3").as("g3"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"), col("g2"))
          .agg(sum(col("c")).as("c2"),
            sum(when(col("g3").isNotNull, col("c")).otherwise(0L))
              .as("c3"),
            count(when(col("g3").isNotNull, lit(1))).as("d3p"))
        val scored = perGram.groupBy(col("doc_id"))
          .agg(sum(col("c2")).as("n2"), max(col("c2")).as("m2"),
            sum(col("c3")).as("n3"), sum(col("d3p")).as("d3"))
          .filter(col("n3") > 0) // <3-token docs: no 3-gram, absent
          .select(col("doc_id"), col("n2"), col("m2"), col("n3"),
            col("d3"),
            TF.ratioPpm(col("n3") - col("d3"), col("n3")).as("dup3_ppm"),
            TF.ratioPpm(col("m2"), col("n2")).as("top2_ppm"))
          .localCheckpoint()
        // bounded driver scalars: the two corpus totals (t20 pattern);
        // ppm ≤ mean ⟺ ppm·count ≤ Σppm — integers end to end.
        val r = scored.agg(sum(col("dup3_ppm")), sum(col("top2_ppm")),
          count(lit(1))).head()
        // degenerate corpus (every doc < 3 tokens): scored is empty and
        // the sums are null — serve the empty frame, don't NPE
        val cnt = r.getLong(2)
        val (sd, st) =
          if (cnt == 0L) (0L, 0L) else (r.getLong(0), r.getLong(1))
        scored.select(col("doc_id"), col("n2"), col("m2"), col("n3"),
            col("d3"), col("dup3_ppm"), col("top2_ppm"),
            (col("dup3_ppm") * cnt <= sd &&
              col("top2_ppm") * cnt <= st).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, $normT AS t FROM documents),
              |tk AS (SELECT doc_id, string_split_regex(t, ' ') AS w
              |  FROM base WHERE t <> ''),
              |g3 AS (SELECT doc_id,
              |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              |  FROM tk, unnest(generate_series(1, len(w) - 2)) AS u(i)
              |  WHERE len(w) >= 3),
              |g2 AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
              |  FROM tk, unnest(generate_series(1, len(w) - 1)) AS u(i)
              |  WHERE len(w) >= 2),
              |a3 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n3,
              |    CAST(COUNT(DISTINCT g) AS BIGINT) AS d3
              |  FROM g3 GROUP BY doc_id),
              |c2 AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
              |  FROM g2 GROUP BY doc_id, g),
              |a2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n2,
              |    CAST(MAX(c) AS BIGINT) AS m2 FROM c2 GROUP BY doc_id),
              |sc AS (SELECT a3.doc_id, a2.n2, a2.m2, a3.n3, a3.d3,
              |    CAST((2*(a3.n3 - a3.d3)*1000000 + a3.n3)
              |      // (2*a3.n3) AS BIGINT) AS dup3_ppm,
              |    CAST((2*a2.m2*1000000 + a2.n2)
              |      // (2*a2.n2) AS BIGINT) AS top2_ppm
              |  FROM a3 JOIN a2 ON a2.doc_id = a3.doc_id),
              |mm AS (SELECT CAST(SUM(dup3_ppm) AS BIGINT) AS sd,
              |    CAST(SUM(top2_ppm) AS BIGINT) AS st,
              |    CAST(COUNT(*) AS BIGINT) AS c FROM sc)
              |SELECT doc_id, n2, m2, n3, d3, dup3_ppm, top2_ppm,
              |  (dup3_ppm * (SELECT c FROM mm) <= (SELECT sd FROM mm) AND
              |   top2_ppm * (SELECT c FROM mm) <= (SELECT st FROM mm))
              |    AS kept
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t19 — BPE ENCODE: the tokenizer's runtime half, closing the
    // train→use lifecycle (t18 ships the merge table; this gate RUNS
    // it on the corpus). The merge chain is composed into one
    // scan-stage column expression applied once per DISTINCT WORD
    // (the same corpus→vocab collapse training rides), and documents
    // join their words' subword lengths back — one shuffle on the
    // word. The oracle re-trains the same 8 merges and re-encodes
    // from scratch (the sym-chain carries the word through every
    // round), so the hash proves train AND encode end-to-end. Docs
    // with no tokens have no subwords and are absent on both sides.
    Q("t19_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        graft.operators.Bpe.encodeCounts(docs, "doc_id", "text",
            graft.operators.Bpe.train(docs, "text", rounds = 8))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${bpeCtes(8)},
              |enc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM sym8 GROUP BY w)
              |SELECT t.doc_id, CAST(SUM(e.n) AS BIGINT) AS n_subwords
              |FROM tok t JOIN enc e ON e.w = t.w
              |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t21 — BPE ENCODE, PER-WORD: the same trained 8-merge chain, but
    // the gate emits the encoded symbol STRING per distinct word —
    // one row per vocab entry, the tokenizer artifact itself. Two
    // jobs: (a) the hash pins the exact segmentation (t19's per-doc
    // counts can cancel a +1/−1 pair across words; this can't), and
    // (b) if a driver-side engine ever disagrees again, the FAILING
    // WORD CLASS is directly readable from this gate's dumped parquet
    // vs the oracle — the r15 t19 divergence was unattributable
    // precisely because only doc-level sums crossed the gate.
    Q("t21_bpe_encode_words",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val merges = graft.operators.Bpe.train(docs, "text", rounds = 8)
        docs.select(explode(TF.tokens(col("text"))).as("w"))
          .distinct()
          .select(col("w"),
            graft.operators.Bpe.encodeExpr(col("w"), merges).as("s"))
          .select(col("w"), col("s"),
            size(split(col("s"), " "))
              .cast(org.apache.spark.sql.types.LongType)
              .as("n_subwords"))
          .orderBy(col("w"))
      },
      Some(s"""WITH ${bpeCtes(8)}
              |SELECT w, string_agg(s, ' ' ORDER BY j) AS s,
              |  CAST(COUNT(*) AS BIGINT) AS n_subwords
              |FROM sym8 GROUP BY w ORDER BY w""".stripMargin)),

    // ----------------------------------------------------------------
    // t24 — TOKENIZER ARTIFACT LIFECYCLE: train → PERSIST the merge
    // table (the shipped artifact: HuggingFace merges.txt /
    // SentencePiece model) → RECOVER it → encode the corpus with the
    // recovered vocab. The k-gates close this loop for the inverted
    // index; this closes it for the tokenizer — at 100 TB a vocab is
    // trained once and broadcast to every encode job from the store,
    // never retrained in-line. The oracle is t19's re-train-and-
    // re-encode chain, so the hash proves the parquet round-trip
    // preserved every merge AND its rank order (a rank swap changes
    // segmentations; an empty recover fails loudly in Bpe.recover).
    Q("t24_bpe_vocab_store",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val root = graft.sources.Scratch.dir("bpe_vocab_store")
        graft.operators.Bpe.persist(s,
          graft.operators.Bpe.train(docs, "text", rounds = 8), root)
        graft.operators.Bpe.encodeCounts(docs, "doc_id", "text",
            graft.operators.Bpe.recover(s, root))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${bpeCtes(8)},
              |enc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n
              |  FROM sym8 GROUP BY w)
              |SELECT t.doc_id, CAST(SUM(e.n) AS BIGINT) AS n_subwords
              |FROM tok t JOIN enc e ON e.w = t.w
              |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // t25 — INCREMENTAL VOCAB GROWTH (r17 verdict #6): the production
    // follow-on to t24's store — a shipped 5-merge vocabulary is
    // RECOVERED from the artifact and EXTENDED by +3 merges without
    // re-running the first five rounds' shuffles (Bpe.resume replays
    // the seed on the fresh word table as chunked map-only passes,
    // then continues the loop — batched here, composing t23's rules
    // with the resume). The oracle is the full 8-round SEQUENTIAL
    // DuckDB chain with NO knowledge of the split, so the hash proves
    // resume ≡ from-scratch end to end: persist → recover → replay →
    // continue reproduces every rank, pair, and count of the single
    // uninterrupted training run (BpeSpec pins the same identity
    // across split points 1/5/11 and through batchK).
    Q("t25_bpe_vocab_grow",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val root = graft.sources.Scratch.dir("bpe_vocab_grow")
        graft.operators.Bpe.persist(s,
          graft.operators.Bpe.train(docs, "text", rounds = 5), root)
        graft.operators.Bpe.resume(docs, "text",
            graft.operators.Bpe.recover(s, root),
            extraRounds = 3, batchK = 2)
          .toDF()
          .select(col("step").cast(org.apache.spark.sql.types.LongType)
            .as("step"), col("lhs"), col("rhs"), col("n"))
          .orderBy(col("step"))
      },
      Some(bpeOracle(8))),

    // ----------------------------------------------------------------
    // t26 — STREAMING SUBWORD HISTOGRAM under a FROZEN vocab: the
    // vocab-coverage monitor a production intake runs — the tokenizer
    // is trained once (t18), shipped (t24), and then every arriving
    // batch is encoded with the FROZEN merge table while a per-subword
    // frequency ledger accumulates corpus-wide counts (fertility /
    // coverage drift is how a pipeline notices its vocab aging as the
    // crawl distribution shifts). Composition: Bpe.encodeExpr runs
    // per DISTINCT WORD per batch (the same corpus→vocab collapse as
    // t19), the batch's subword counts fold into an lsm
    // BucketedUpsert keyed by subword with a SUM combine — O(batch)
    // arrival, reduce-at-read — and sum is NOT idempotent, so batch
    // commits ride the shared replayGuarded token (the q91 contract:
    // the guard, not the monoid, carries replay safety). The oracle
    // re-trains the 8-merge chain and counts every (word-occurrence ×
    // symbol) pair from scratch: the hash proves train, per-batch
    // encode, AND the streamed sum-fold end to end.
    Q("t26_stream_subword_hist",
      (s, dir) => {
        val root = subwordHistArtifacts(s, dir)
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        graft.streaming.BucketedUpsert.recover(ss, keyCol = "subword",
            payloadCols = Seq("n"), nBuckets = 16, hashKey = true,
            combine = Some(df => df.groupBy(col("subword"))
              .agg(sum(col("n")).as("n"))), lsm = true,
            stateRoot = root)
          .view(s).orderBy(col("subword"))
      },
      Some(s"""WITH ${bpeCtes(8)},
              |hist AS (SELECT s.s AS subword,
              |    CAST(COUNT(*) AS BIGINT) AS n
              |  FROM sym8 s JOIN tok t ON t.w = s.w GROUP BY s.s)
              |SELECT subword, n FROM hist ORDER BY subword""".stripMargin),
      setup = Some((ss, dir) => { subwordHistArtifacts(ss, dir); () }))
  )

  /** t26's per-JVM cached streamed build (the neardupArtifacts
   * pattern): ONE engine-run ingest of the corpus through the frozen
   * vocab builds the subword-frequency ledger; reps serve the
   * committed store. */
  private val subwordHistCache =
    scala.collection.mutable.Map.empty[String, String]
  private def subwordHistArtifacts(s: SparkSession, dir: String): String =
    subwordHistCache.synchronized {
      subwordHistCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("subword_hist_store") {
          buildSubwordHist(s, dir)
        })
    }

  private def buildSubwordHist(s: SparkSession, dir: String): String = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = Tables.load(ss, dir, "documents")
    // the FROZEN vocab: trained once before the stream starts (the
    // frozen-screen rule every streamed reference here follows)
    val merges = graft.operators.Bpe.train(docs, "text", rounds = 8)
    val root = graft.sources.Scratch.dir("subword_hist")
    val state = new graft.streaming.BucketedUpsert.State(ss,
      keyCol = "subword", payloadCols = Seq("n"), nBuckets = 16,
      hashKey = true,
      combine = Some(df => df.groupBy(col("subword"))
        .agg(sum(col("n")).as("n"))),
      lsm = true, root = Some(root))
    graft.queries.StreamingQueries.streamSliced(ss,
      docs.select(col("doc_id").as("id"), col("text")),
      "id", "subword_hist") { (b, id) =>
      val words = b.select(explode(TF.tokens(col("text"))).as("w"))
      // encode once per DISTINCT word in the batch, then weight by
      // the batch's occurrence counts — the t19 collapse at batch
      // grain
      val enc = words.select(col("w")).distinct()
        .select(col("w"),
          split(graft.operators.Bpe.encodeExpr(col("w"), merges), " ")
            .as("ys"))
      val counts = words.join(enc, Seq("w"))
        .select(explode(col("ys")).as("subword"))
        .groupBy(col("subword"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      state.replayGuarded("lastOp", id) { state.merge(counts, id) }
      ()
    }
    root
  }

  /** The t18 oracle: `rounds` unrolled merge rounds over the
   * POSITIONAL symbol chain ([[bpeCtes]]); the final select reads the
   * one-row argmaxes m{i}. */
  private def bpeOracle(rounds: Int): String = {
    val finalRows = (0 until rounds).map { i =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS step,
         |  string_split((SELECT p FROM m$i), ' ')[1] AS lhs,
         |  string_split((SELECT p FROM m$i), ' ')[2] AS rhs,
         |  CAST((SELECT n FROM m$i) AS BIGINT) AS n""".stripMargin
    }
    s"""WITH ${bpeCtes(rounds)}
       |${finalRows.mkString("\nUNION ALL\n")}
       |ORDER BY step""".stripMargin
  }

  /** The shared t18/t19/t21 CTE chain: corpus → (doc_id, word) `tok`
   * → word-frequency vocab → `rounds` merge rounds over a POSITIONAL
   * (w, f, symbol_idx j, symbol s) table — index-walking integer
   * arithmetic, NO string `replace` anywhere. The r15 driver run
   * proved the previous replace-based chain version-sensitive: its
   * doubled-separator tiling leans on `replace`'s scan-resume
   * semantics, which local DuckDB 1.0.0 and the driver's DuckDB
   * implement differently (t19 hash-diverged while matching locally).
   * Window functions, joins, and row_number have one portable
   * semantics, so this chain states canonical greedy BPE without any
   * engine-specific string-scan behavior.
   *
   * Each round i is four MATERIALIZED CTEs (without the hint DuckDB
   * re-executes the upstream chain per reference — exponential over
   * unrolled rounds):
   *  - pairs{i}: adjacent-pair counts via lead() over (w, j);
   *  - m{i}: the one-row argmax (count DESC, pair ASC);
   *  - take{i}: the CANONICAL non-overlapping match set. A match at j
   *    needs s[j]=lhs ∧ s[j+1]=rhs; two candidates can only be
   *    adjacent when lhs=rhs (s[j+1] must equal both), so candidates
   *    form single positions (lhs≠rhs — all taken) or consecutive
   *    runs (self-pairs — greedy left-tiling takes the EVEN offsets
   *    within each run): gaps-and-islands (j − row_number) groups the
   *    runs, parity of (j − island-min) selects canonically. BpeSpec
   *    pins this against a hand-written index-walking BPE on runs of
   *    every length;
   *  - sym{i+1}: taken position j becomes lhs||rhs, position j+1 is
   *    consumed, everything else carries; row_number renumbers. The
   *    lead/flags compute in the inner subquery (before the filter),
   *    the renumbering after it — SQL's WHERE-before-window order in
   *    the outer select is exactly the contract needed. */
  private def bpeCtes(rounds: Int): String = {
    val roundCtes = (0 until rounds).map { i =>
      s"""pairs$i AS MATERIALIZED (
         |  SELECT s || ' ' || ns AS p, SUM(f) AS n FROM (
         |    SELECT w, f, s, lead(s) OVER (PARTITION BY w ORDER BY j) AS ns
         |    FROM sym$i)
         |  WHERE ns IS NOT NULL GROUP BY 1),
         |m$i AS MATERIALIZED (
         |  SELECT p, n FROM pairs$i ORDER BY n DESC, p LIMIT 1),
         |take$i AS MATERIALIZED (
         |  SELECT w, j FROM (
         |    SELECT w, j,
         |      j - min(j) OVER (PARTITION BY w, isl) AS off
         |    FROM (
         |      SELECT w, j,
         |        j - row_number() OVER (PARTITION BY w ORDER BY j) AS isl
         |      FROM (
         |        SELECT w, j, s,
         |          lead(s) OVER (PARTITION BY w ORDER BY j) AS ns
         |        FROM sym$i)
         |      WHERE s = string_split((SELECT p FROM m$i), ' ')[1]
         |        AND ns = string_split((SELECT p FROM m$i), ' ')[2]))
         |  WHERE off % 2 = 0),
         |sym${i + 1} AS MATERIALIZED (
         |  SELECT w, f,
         |    CAST(row_number() OVER (PARTITION BY w ORDER BY j) AS BIGINT) AS j,
         |    CASE WHEN tk THEN s || ns ELSE s END AS s
         |  FROM (
         |    SELECT b.w, b.f, b.j, b.s,
         |      lead(b.s) OVER (PARTITION BY b.w ORDER BY b.j) AS ns,
         |      t.j IS NOT NULL AS tk,
         |      tp.j IS NOT NULL AS consumed
         |    FROM sym$i AS b
         |    LEFT JOIN take$i AS t ON t.w = b.w AND t.j = b.j
         |    LEFT JOIN take$i AS tp ON tp.w = b.w AND tp.j = b.j - 1)
         |  WHERE NOT consumed)""".stripMargin
    }
    s"""d AS (SELECT doc_id, $normT AS t FROM documents),
       |tok AS (SELECT doc_id, u.tk AS w FROM
       |  (SELECT doc_id, string_split_regex(t, ' ') AS w0 FROM d
       |   WHERE t <> ''), unnest(w0) AS u(tk)),
       |vc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM tok
       |  GROUP BY w),
       |sym0 AS MATERIALIZED (
       |  SELECT w, f, CAST(u.j AS BIGINT) AS j, y[j] AS s
       |  FROM (SELECT w, f,
       |          list_append(regexp_extract_all(w, '.'), '</w>') AS y
       |        FROM vc),
       |       unnest(generate_series(1, len(y))) AS u(j)),
       |${roundCtes.mkString(",\n")}""".stripMargin
  }
}
