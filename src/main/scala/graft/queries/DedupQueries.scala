package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/**
 * Deduplication operator queries over the `documents` / `embeddings`
 * tables, each hash-verified against a DuckDB oracle that restates the
 * same math (md5-derived hashes make every signature engine-portable).
 */
object DedupQueries {

  /** DuckDB spelling of TextFunctions.hash60. */
  private def h60(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 15)) AS BIGINT)"

  /** DuckDB spelling of TextFunctions.normalizeText (shared with q91's
   * streaming fingerprint store). */
  private[queries] val normT =
    raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

  /** The d06 60-bit/hamming≤3 simhash pair CTE list + final select —
   * composable so d06/q108 share the pair statement verbatim and q110
   * can wrap it in the d07-style reachability recursion. */
  private[queries] lazy val simhash60PairsCtes: String =
    simhash60PairsCtesOver("documents")

  /** The same CTE list over a restricted document set — q111 restates
   * "pairs minable after forgetting X" as the pair statement over
   * `documents` minus X. */
  private[queries] def simhash60PairsCtesOver(docSrc: String): String =
    s"""d AS (SELECT doc_id, $normT AS t FROM $docSrc),
       |tok AS (SELECT doc_id, u.tk FROM
       |       (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d), unnest(w) AS u(tk)),
       |h AS (SELECT doc_id, ${h60("tk")} AS hv FROM tok),
       |bitcnt AS (SELECT doc_id, b,
       |       SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
       |       FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
       |       GROUP BY doc_id, b),
       |sig AS (SELECT doc_id,
       |       CAST(SUM(CASE WHEN cnt >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
       |       FROM bitcnt GROUP BY doc_id),
       |buckets AS (SELECT doc_id, simhash,
       |       bb || '|' || CAST((simhash >> (bb * 15)) & 32767 AS VARCHAR) AS bkey
       |       FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS bb) bands)""".stripMargin

  private[queries] lazy val simhash60PairsSelect: String =
    """SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
      |       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
      |FROM buckets x JOIN buckets y
      |  ON x.bkey = y.bkey AND x.doc_id < y.doc_id
      |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""".stripMargin

  /** The d06 pair SQL — shared by d06 and by q108's streamed-
   * accumulation restatement (the final pair set is batch-composition
   * independent, so one oracle serves both). */
  private[queries] lazy val simhash60PairsSql: String =
    s"WITH $simhash60PairsCtes\n$simhash60PairsSelect\nORDER BY a, b"

  /** The d02 MinHash/LSH pair SQL (no final ORDER BY) — shared by d02
   * and, as a CTE body, by d07's cluster recursion. */
  private[queries] lazy val minhashPairsSql: String = {
    val seedRows = (0 until 16).map(i =>
      s"($i, ${graft.operators.Dedup.mhCoeffA(i)}, " +
        s"${graft.operators.Dedup.mhCoeffB(i)})").mkString(", ")
    s"""$shinglesCte,
       |hs AS (SELECT doc_id, ${h60("s")} & 1073741823 AS h FROM sh),
       |mh AS (SELECT doc_id, seed, min(a * h + b) AS h
       |       FROM hs CROSS JOIN (VALUES $seedRows) seeds(seed, a, b)
       |       GROUP BY doc_id, seed),
       |bandkeys AS (SELECT doc_id, seed // 4 AS band,
       |       string_agg(CAST(h AS VARCHAR), ',' ORDER BY seed) AS bkey
       |       FROM mh GROUP BY doc_id, seed // 4),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |       FROM bandkeys x JOIN bandkeys y
       |         ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |est AS (SELECT a, b,
       |       CAST(SUM(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS DOUBLE) / 16 AS est_sim
       |       FROM cand JOIN mh ma ON ma.doc_id = a
       |       JOIN mh mb ON mb.doc_id = b AND mb.seed = ma.seed
       |       GROUP BY a, b)
       |SELECT a, b, est_sim FROM est WHERE est_sim >= 0.5""".stripMargin
  }

  /** Shared doc → distinct word-3-shingle CTE prefix. */
  private val shinglesCte =
    raw"""WITH d AS (SELECT doc_id, $normT AS t FROM documents),
         |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d),
         |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
         |       FROM toks, unnest(generate_series(1, len(w) - 2)) AS u(i)
         |       WHERE len(w) >= 3)""".stripMargin

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // d01 — exact dedup: one survivor (lowest doc_id) per normalized-text
    // md5 fingerprint; single shuffle via window.
    Q("d01_dedup_exact",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.exact(docs, col("text"), col("doc_id"))
          .select(col("doc_id"), col("fingerprint"))
          .orderBy(col("doc_id"))
      },
      Some(raw"""SELECT doc_id, fingerprint FROM (
                |  SELECT doc_id, md5($normT) AS fingerprint,
                |    row_number() OVER (PARTITION BY md5($normT) ORDER BY doc_id) AS rn
                |  FROM documents)
                |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // d02 — MinHash(16) + LSH(4 bands × 4 rows) near-dup candidates with
    // estimated Jaccard ≥ 0.5.
    Q("d02_dedup_minhash_lsh",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.minHashPairs(docs, "doc_id", "text", k = 16, bands = 4,
            minSim = 0.5)
          .orderBy(col("a"), col("b"))
      },
      Some(s"$minhashPairsSql\nORDER BY a, b")),

    // ----------------------------------------------------------------
    // d03 — SimHash signatures + same-signature bucket sizes, at the
    // 60-bit scale width (16-bit signatures collide unrelated docs into
    // one bucket once the corpus passes ~2^16 — same sizing rule as d06).
    Q("d03_dedup_simhash",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.simHashBuckets(docs, "doc_id", "text", bits = 60)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, $normT AS t FROM documents),
              |tok AS (SELECT doc_id, u.tk FROM
              |       (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d), unnest(w) AS u(tk)),
              |h AS (SELECT doc_id, ${h60("tk")} AS hv FROM tok),
              |bitcnt AS (SELECT doc_id, b,
              |       SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
              |       FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
              |       GROUP BY doc_id, b),
              |sig AS (SELECT doc_id,
              |       CAST(SUM(CASE WHEN cnt >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
              |       FROM bitcnt GROUP BY doc_id)
              |SELECT doc_id, simhash,
              |  COUNT(*) OVER (PARTITION BY simhash) AS n_bucket
              |FROM sig ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // d06 — simhash near-dup pairs within Hamming distance 3, via the
    // pigeonhole band buckets (agree-on-one-of-4-bands ⇒ candidate).
    // Graded at the SCALE configuration: 60-bit signatures (hash60's
    // full width) / 15-bit bands. Narrower signatures both saturate
    // (unrelated hamming balls overlap) and bucket-join quadratically —
    // DedupSoak measured 70.6M pairs/57s at 16 bits vs 388k/10s at 60
    // bits on 100k docs; bits must grow with log2(corpus).
    Q("d06_dedup_simhash_hamming",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.simHashPairs(docs, "doc_id", "text", bits = 60, maxHamming = 3)
          .orderBy(col("a"), col("b"))
      },
      Some(simhash60PairsSql)),

    // ----------------------------------------------------------------
    // d07 — near-dup CLUSTERS: connected components over the d02 pair
    // list (min-label propagation, one shuffle per iteration to a
    // fixpoint). Pairwise matches alone can't dedup — A~B and B~C must
    // yield ONE survivor for {A,B,C} even though A~C was never scored.
    // The oracle states transitive reachability as a recursive CTE.
    Q("d07_dedup_clusters",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.minHashPairs(docs, "doc_id", "text", k = 16,
          bands = 4, minSim = 0.5)
        Dedup.connectedComponents(pairs).orderBy(col("id"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
              |$minhashPairsSql
              |),
              |sym AS (SELECT a, b FROM pairs
              |        UNION ALL SELECT b, a FROM pairs),
              |nodes AS (SELECT DISTINCT a AS id FROM sym),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id)
              |SELECT id, MIN(r) AS cluster FROM reach
              |GROUP BY id ORDER BY id""".stripMargin)),

    // ----------------------------------------------------------------
    // d08 — incremental dedup: the monthly-snapshot shape. Batch =
    // doc_id % 10 = 0, corpus = the rest; each batch doc classified
    // exact_dup / near_dup / new via two semi-join probes (fingerprint
    // set, band-bucket set) — no candidate pairs materialized.
    Q("d08_incremental_dedup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val batch = docs.filter(col("doc_id") % 10 === 0)
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        Dedup.incremental(corpus, batch, "doc_id", "text",
            k = 16, bands = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      Some {
        val seedRows = (0 until 16).map(i =>
          s"($i, ${Dedup.mhCoeffA(i)}, ${Dedup.mhCoeffB(i)})")
          .mkString(", ")
        s"""$shinglesCte,
           |fp AS (SELECT doc_id, md5(t) AS fp FROM d),
           |corpus_fp AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 <> 0),
           |hs AS (SELECT doc_id, ${h60("s")} & 1073741823 AS h FROM sh),
           |mh AS (SELECT doc_id, seed, min(a * h + b) AS h
           |       FROM hs CROSS JOIN (VALUES $seedRows) seeds(seed, a, b)
           |       GROUP BY doc_id, seed),
           |bandkeys AS (SELECT doc_id, seed // 4 AS band,
           |       string_agg(CAST(h AS VARCHAR), ',' ORDER BY seed) AS bkey
           |       FROM mh GROUP BY doc_id, seed // 4),
           |near AS (SELECT DISTINCT x.doc_id AS id
           |       FROM bandkeys x JOIN bandkeys y
           |         ON x.band = y.band AND x.bkey = y.bkey
           |        AND x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0)
           |SELECT f.doc_id,
           |  CASE WHEN cf.fp IS NOT NULL THEN 'exact_dup'
           |       WHEN n.id IS NOT NULL THEN 'near_dup'
           |       ELSE 'new' END AS status
           |FROM fp f
           |LEFT JOIN corpus_fp cf ON f.fp = cf.fp
           |LEFT JOIN near n ON f.doc_id = n.id
           |WHERE f.doc_id % 10 = 0
           |ORDER BY f.doc_id""".stripMargin
      }),

    // ----------------------------------------------------------------
    // d04 — exact n-gram (word-3-shingle) Jaccard pairs ≥ 0.8 via the
    // inverted shingle index (no O(n²) cross join), WITH the document-
    // frequency cap active: shingles in > 20 docs are dropped before the
    // candidate self-join. The cap is what keeps a stop-shingle bucket
    // from going quadratic at 100 TB; sizes and intersections are both
    // computed on the capped universe so the Jaccard stays consistent.
    Q("d04_dedup_ngram_jaccard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.jaccardPairs(docs, "doc_id", "text", shingleWords = 3,
            minJaccard = 0.8, maxShingleDf = Some(20))
          .orderBy(col("a"), col("b"))
      },
      Some(s"""$shinglesCte,
              |hs AS (SELECT doc_id, ${h60("s")} AS h FROM sh),
              |f AS (SELECT doc_id, h FROM (
              |       SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM hs)
              |       WHERE df <= 20),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
              |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
              |       FROM f x JOIN f y ON x.h = y.h AND x.doc_id < y.doc_id
              |       GROUP BY x.doc_id, y.doc_id)
              |SELECT a, b, jaccard FROM (
              |  SELECT a, b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
              |  FROM inter JOIN sizes sa ON sa.doc_id = a
              |  JOIN sizes sb ON sb.doc_id = b)
              |WHERE jaccard >= 0.8 ORDER BY a, b""".stripMargin)),

    // ----------------------------------------------------------------
    // d05 — embedding cosine near-dup pairs ≥ 0.4 on the LSH-BUCKETED
    // scale path: candidates restricted to equal 8-bit random-hyperplane
    // signatures (one shuffle on the bucket key — never the O(n²)
    // all-pairs join, which survives only as the verification baseline in
    // DedupSpec). Recall is partial by LSH design; the oracle restates the
    // identical bucketing so the gate is exact.
    Q("d05_dedup_embedding",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Dedup.embeddingPairs(emb, "vec_id", "embedding", dim = 64,
            minCos = 0.4, lshBits = Some(8))
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH planes AS (
             |  SELECT b, i,
             |    (CAST(('0x' || substr(md5('plane:' || b || ':' || i), 1, 15)) AS BIGINT)
             |      % 2000001 - 1000000) / 1000000.0 AS w
             |  FROM (SELECT unnest(generate_series(0, 7)) AS b),
             |       (SELECT unnest(generate_series(0, 63)) AS i)),
             |sigs AS (
             |  SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS sig
             |  FROM (SELECT e.vec_id, p.b, SUM(e.embedding[p.i + 1]::DOUBLE * p.w) AS proj
             |        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.b)
             |  GROUP BY vec_id)
             |SELECT a, b, cos FROM (
             |  SELECT a, b, round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
             |  FROM (
             |    SELECT x.vec_id AS a, y.vec_id AS b,
             |      list_sum(list_transform(generate_series(1, len(x.embedding)),
             |        i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE)) AS dot,
             |      sqrt(list_sum(list_transform(generate_series(1, len(x.embedding)),
             |        i -> x.embedding[i]::DOUBLE * x.embedding[i]::DOUBLE))) AS na,
             |      sqrt(list_sum(list_transform(generate_series(1, len(y.embedding)),
             |        i -> y.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE))) AS nb
             |    FROM sigs sx JOIN sigs sy ON sx.sig = sy.sig AND sx.vec_id < sy.vec_id
             |    JOIN embeddings x ON x.vec_id = sx.vec_id
             |    JOIN embeddings y ON y.vec_id = sy.vec_id))
             |WHERE cos >= 0.4 ORDER BY a, b""".stripMargin)),

    // ----------------------------------------------------------------
    // p02 — cluster survivor selection: the policy step that turns d07's
    // near-dup clusters into a KEEP list. Production dedup never keeps
    // "min id" — it keeps the BEST member (here: most tokens, ties to
    // lowest id) and records how many documents the survivor stands for.
    // Docs in no pair are their own singleton cluster. One window shuffle
    // on the cluster key on top of the clustering pass; the oracle
    // extends d07's recursive-CTE reachability with the same argmax.
    Q("p02_cluster_survivors",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.{TextFunctions => TF}
        val docs = Tables.load(s, dir, "documents")
        val pairs = Dedup.minHashPairs(docs, "doc_id", "text", k = 16,
          bands = 4, minSim = 0.5)
        val clusters = Dedup.connectedComponents(pairs)
        val toks = docs.select(col("doc_id"),
          size(TF.tokens(col("text"))).cast("long").as("n_tokens"))
        val labeled = toks
          .join(clusters, toks("doc_id") === clusters("id"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("cluster"), col("doc_id")).as("cluster"),
            col("n_tokens"))
        val wRank = Window.partitionBy(col("cluster"))
          .orderBy(col("n_tokens").desc, col("doc_id"))
        val wAll = Window.partitionBy(col("cluster"))
        labeled
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n_members", count(lit(1)).over(wAll))
          .filter(col("rn") === 1)
          .select(col("cluster"), col("doc_id").as("survivor_id"),
            col("n_tokens").as("survivor_tokens"), col("n_members"))
          .orderBy(col("cluster"))
      },
      Some(s"""WITH RECURSIVE pairs AS (
              |$minhashPairsSql
              |),
              |sym AS (SELECT a, b FROM pairs
              |        UNION ALL SELECT b, a FROM pairs),
              |nodes AS (SELECT DISTINCT a AS id FROM sym),
              |reach(id, r) AS (
              |  SELECT id, id FROM nodes
              |  UNION
              |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id),
              |labels AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
              |tok AS (SELECT doc_id,
              |    CASE WHEN $normT = '' THEN CAST(0 AS BIGINT)
              |         ELSE CAST(len(string_split_regex($normT, ' ')) AS BIGINT)
              |    END AS n_tokens
              |  FROM documents),
              |lab AS (SELECT doc_id, COALESCE(l.cluster, doc_id) AS cluster, n_tokens
              |        FROM tok LEFT JOIN labels l ON tok.doc_id = l.id),
              |ranked AS (SELECT *,
              |    row_number() OVER (PARTITION BY cluster
              |      ORDER BY n_tokens DESC, doc_id) AS rn,
              |    COUNT(*) OVER (PARTITION BY cluster) AS n_members
              |  FROM lab)
              |SELECT cluster, doc_id AS survivor_id,
              |  n_tokens AS survivor_tokens, n_members
              |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // ----------------------------------------------------------------
    // d09 — MinHash calibration: for every d02 near-dup pair, the exact
    // shingle Jaccard and the estimation error — the measurement that
    // tells you whether 16 permutations are enough before you trust the
    // estimate on 100 TB (the dedup counterpart of s05's ANN recall).
    // Exact Jaccard is computed ONLY for the LSH candidate pairs (three
    // joins keyed by pair id / shingle hash), never for all pairs — the
    // uncapped all-pairs Jaccard would be the quadratic cliff d04's
    // document-frequency cap exists to prevent.
    Q("d09_minhash_calibration",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val est = Dedup.minHashPairs(docs, "doc_id", "text", k = 16,
          bands = 4, minSim = 0.5)
        val sh = docs
          .select(col("doc_id").as("id"),
            graft.functions.TextFunctions.tokens(col("text")).as("__tok"))
          .select(col("id"), explode_outer(graft.functions.TextFunctions
            .wordShinglesFromTokens(col("__tok"), 3)).as("s"))
          .filter(col("s").isNotNull)
          .select(col("id"), graft.functions.TextFunctions.hash60(col("s"))
            .as("h"))
        val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
        val inter = est.join(sh.as("x"), col("x.id") === col("a"))
          .join(sh.as("y"),
            col("y.id") === col("b") && col("y.h") === col("x.h"))
          .groupBy(col("a"), col("b"), col("est_sim"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("id").as("a"), col("n").as("na")), "a")
          .join(sizes.select(col("id").as("b"), col("n").as("nb")), "b")
          // exact-6dp jaccard (i/union can land on dyadic 6dp halves);
          // est_sim = m/16 is exact at 6dp (m·62500 ppm), so err is a
          // pure integer ppm difference — no engine round() anywhere
          .withColumn("__jppm", graft.functions.TextFunctions.ratioPpm(
            col("inter"), col("na") + col("nb") - col("inter")))
          .select(col("a"), col("b"), col("est_sim"),
            (col("__jppm").cast("double") / 1000000.0).as("jaccard"),
            (((col("est_sim") * 1000000).cast("long") - col("__jppm"))
              .cast("double") / 1000000.0).as("err"))
          .orderBy(col("a"), col("b"))
      },
      Some(s"""WITH est AS (
              |$minhashPairsSql
              |),
              |d2 AS (SELECT doc_id, $normT AS t FROM documents),
              |t2 AS (SELECT doc_id, string_split_regex(t, ' ') AS w FROM d2),
              |sh2 AS (SELECT DISTINCT doc_id,
              |    ${h60("w[i] || ' ' || w[i+1] || ' ' || w[i+2]")} AS h
              |  FROM t2, unnest(generate_series(1, len(w) - 2)) AS u(i)
              |  WHERE len(w) >= 3),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
              |inter AS (SELECT e.a, e.b, e.est_sim, COUNT(*) AS i
              |  FROM est e JOIN sh2 x ON x.doc_id = e.a
              |  JOIN sh2 y ON y.doc_id = e.b AND y.h = x.h
              |  GROUP BY e.a, e.b, e.est_sim)
              |SELECT a, b, est_sim,
              |  CAST(jppm AS DOUBLE)/1000000 AS jaccard,
              |  CAST(CAST(est_sim*1000000 AS BIGINT) - jppm AS DOUBLE)
              |    /1000000 AS err
              |FROM (SELECT a, b, est_sim,
              |    (2*i*1000000 + (na.n + nb.n - i))
              |      // (2*(na.n + nb.n - i)) AS jppm
              |  FROM inter JOIN sizes na ON na.doc_id = a
              |  JOIN sizes nb ON nb.doc_id = b)
              |ORDER BY a, b""".stripMargin)),

    // ----------------------------------------------------------------
    // d10 — SemDeDup-style semantic dedup: coarse-quantize the embedding
    // corpus (the same deterministic stride-seeded centroids the IVF
    // family uses), compare cosines ONLY within a cluster, and drop
    // every vector with a lower-id duplicate above the threshold. The
    // candidate set is Σ|cluster|² — the centroid count bounds cluster
    // width at scale, so the quadratic work is per-cluster and the plan
    // is one bounded broadcast + one shuffle on the cluster key, never
    // all-pairs. The oracle restates assignment (argmax with the same
    // 6dp rounding and lower-cid ties) and the within-cluster pair scan.
    Q("d10_semantic_dedup",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        graft.operators.SemanticDedup.dedup(emb, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, minCos = 0.4)
          .orderBy(col("vid"))
      },
      Some("""WITH v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings),
             |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
             |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
             |assign AS (SELECT vid, vv, cid FROM (
             |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
             |  FROM (SELECT vid, vv, cid,
             |    list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
             |    sqrt(list_sum(list_transform(generate_series(1, len(vv)), i -> vv[i]::DOUBLE * vv[i]::DOUBLE))) AS na,
             |    sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb,
             |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
             |        FROM v CROSS JOIN cent)) WHERE r = 1),
             |pairs AS (SELECT a.vid AS aid, b.vid AS bid,
             |    list_sum(list_transform(generate_series(1, len(a.vv)), i -> a.vv[i]::DOUBLE * b.vv[i]::DOUBLE)) AS dot,
             |    sqrt(list_sum(list_transform(generate_series(1, len(a.vv)), i -> a.vv[i]::DOUBLE * a.vv[i]::DOUBLE))) AS na,
             |    sqrt(list_sum(list_transform(generate_series(1, len(b.vv)), i -> b.vv[i]::DOUBLE * b.vv[i]::DOUBLE))) AS nb,
             |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
             |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vid < b.vid),
             |dropped AS (SELECT bid, MIN(aid) AS dup_of FROM pairs
             |            WHERE cos >= 0.4 GROUP BY bid)
             |SELECT cid, vid, dup_of, dup_of IS NULL AS keep
             |FROM assign LEFT JOIN dropped ON vid = bid
             |ORDER BY vid""".stripMargin)),

    // ----------------------------------------------------------------
    // d11 — shingle-containment pairs: |∩| / min(|A|,|B|) ≥ 0.9 — the
    // asymmetric near-dup detector for a short doc embedded in a long
    // one, which symmetric Jaccard (d04) misses because the union is
    // dominated by the long side. Same inverted-index plan (hash-keyed
    // self-join + document-frequency skew cap), direction resolved to
    // (contained, container) by shingle-set size with id tiebreak.
    Q("d11_dedup_containment",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.containmentPairs(docs, "doc_id", "text", shingleWords = 3,
            minContainment = 0.9, maxShingleDf = Some(20))
          .orderBy(col("contained_id"), col("container_id"))
      },
      Some(s"""$shinglesCte,
              |hs AS (SELECT doc_id, ${h60("s")} AS h FROM sh),
              |f AS (SELECT doc_id, h FROM (
              |       SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM hs)
              |       WHERE df <= 20),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM f GROUP BY doc_id),
              |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
              |       FROM f x JOIN f y ON x.h = y.h AND x.doc_id < y.doc_id
              |       GROUP BY x.doc_id, y.doc_id)
              |SELECT contained_id, container_id, containment FROM (
              |  SELECT CASE WHEN sa.n <= sb.n THEN a ELSE b END AS contained_id,
              |         CASE WHEN sa.n <= sb.n THEN b ELSE a END AS container_id,
              |         CAST(i AS DOUBLE) / least(sa.n, sb.n) AS containment
              |  FROM inter JOIN sizes sa ON sa.doc_id = a
              |  JOIN sizes sb ON sb.doc_id = b)
              |WHERE containment >= 0.9
              |ORDER BY contained_id, container_id""".stripMargin)),

    // ----------------------------------------------------------------
    // d12 — EXACT-SUBSTRING dedup at ARBITRARY token offsets (the
    // ExactSubstr step of RefinedWeb-class pipelines — r14 verdict
    // Next #2): t15's fixed 50-token chunk grid provably misses a span
    // copied at an offset that is not chunk-aligned in both documents
    // (no identical chunk ever forms — ExactSubstrSpec pins the miss
    // on exactly this corpus); Dedup.exactSubstrSpans finds it with
    // stride-1 window fingerprints + first-occurrence-wins + interval
    // merge, one shuffle on the 128-bit fingerprint, never a suffix
    // array in driver memory. The gate corpus PLANTS the unaligned
    // case deterministically: for every source doc S (doc_id % 5 = 2,
    // ≥ 24 tokens) whose successor N has ≥ 7 tokens, a derived doc
    // carries N's tokens 1-7 followed by S's tokens 5-24 — the copied
    // 20-token span starts at offset 5 in S and offset 8 in the
    // derived doc, aligned to neither grid. The oracle restates the
    // corpus derivation AND the full window/first-occurrence/island
    // semantics from scratch; natural duplicated spans inside the base
    // corpus surface identically on both sides.
    Q("d12_exactsubstr_spans",
      (s, dir) => graft.operators.Dedup.exactSubstrSpans(
          exactSubstrCorpus(s, dir), "doc_id", "text", minLen = 12)
        .orderBy(col("doc_id"), col("span_start")),
      Some(exactSubstrOracle)),

    // ----------------------------------------------------------------
    // d13 — the REMOVAL half of exact-substring dedup: cut every
    // duplicated span out of the corpus, first occurrence kept intact
    // (what a RefinedWeb-class pipeline does with d12's spans). The
    // cut is a scan-stage HOF chain over a per-doc span array (bounded
    // by the doc's own duplicated regions — broadcast-shaped, never a
    // positions shuffle); the oracle restates it as explicit position
    // rows anti-joined against the merged spans. Every corpus doc
    // returns a row — a fully-duplicated doc cuts to ''.
    Q("d13_exactsubstr_cut",
      (s, dir) => graft.operators.Dedup.exactSubstrCut(
          exactSubstrCorpus(s, dir), "doc_id", "text", minLen = 12)
        .orderBy(col("doc_id")),
      Some(exactSubstrCutOracle))
  )

  /** The d12 gate corpus — the documents table plus a DERIVED doc per
   * eligible source planting a 20-token span copied at offsets aligned
   * to NEITHER document's chunk grid (the case t15's fixed-grid
   * passage dedup provably misses). Shared by d12 and the streamed
   * q126 so both prove against [[exactSubstrOracle]] verbatim. */
  private[queries] def exactSubstrCorpus(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.load(s, dir, "documents")
    // derive from the NORMALIZED token stream so the planted text
    // round-trips the operator's own tokenizer exactly
    val toks = docs.select(col("doc_id"),
      TF.tokens(col("text")).as("w"))
    val nxt = toks.select((col("doc_id") - 1).as("doc_id"),
      col("w").as("nw"))
    val planted = toks.join(nxt, Seq("doc_id"))
      .filter(col("doc_id") % 5 === 2 &&
        size(col("w")) >= 24 && size(col("nw")) >= 7)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(concat(slice(col("nw"), 1, 7),
          slice(col("w"), 5, 20)), " ").as("text"))
    docs.select(col("doc_id"), col("text")).unionByName(planted)
  }

  /** The full window/first-occurrence/island restatement over the
   * derived corpus — d12's oracle, shared verbatim by q126 (the
   * streamed end state is defined to equal the batch recompute).
   * Lazy: `all` above references it during object init. */
  private[queries] lazy val exactSubstrOracle: String =
    s"""WITH $exactSubstrCtes
       |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       |  CAST(MAX(e) AS BIGINT) AS span_end,
       |  CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS span_tokens
       |FROM sp GROUP BY doc_id, span
       |ORDER BY doc_id, span_start""".stripMargin

  /** The CTE chain through `sp` (victim windows with island labels)
   * over the derived corpus — shared by d12/q126's span statement and
   * d13's cut statement. */
  private lazy val exactSubstrCtes: String =
    s"""base AS (SELECT doc_id, $normT AS t FROM documents),
              |tk AS (SELECT doc_id, string_split_regex(t, ' ') AS w
              |  FROM base),
              |planted AS (SELECT s.doc_id + 1000000 AS doc_id,
              |    array_to_string(list_concat(n.w[1:7], s.w[5:24]), ' ') AS t
              |  FROM tk s JOIN tk n ON n.doc_id = s.doc_id + 1
              |  WHERE s.doc_id % 5 = 2 AND len(s.w) >= 24
              |    AND len(n.w) >= 7),
              |corpus AS (SELECT doc_id, t FROM base
              |  UNION ALL SELECT doc_id, t FROM planted),
              |toks AS (SELECT doc_id, string_split_regex(t, ' ') AS w
              |  FROM corpus WHERE t <> ''),
              |wins AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
              |    array_to_string(w[i : i + 11], ' ') AS g
              |  FROM toks, unnest(generate_series(1, len(w) - 11)) AS u(i)
              |  WHERE len(w) >= 12),
              |r AS (SELECT doc_id, pos, row_number()
              |    OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
              |  FROM wins),
              |v AS (SELECT doc_id, pos, pos + 11 AS e FROM r WHERE rn > 1),
              |m AS (SELECT doc_id, pos, e,
              |    max(e) OVER (PARTITION BY doc_id ORDER BY pos
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
              |  FROM v),
              |sp AS (SELECT doc_id, pos, e,
              |    SUM(CASE WHEN pe IS NULL OR pos > pe + 1 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY doc_id ORDER BY pos) AS span
              |  FROM m)""".stripMargin

  /** d13's oracle: the cut restated as explicit position rows — every
   * token position NOT covered by a merged span survives, re-joined in
   * order; every corpus doc returns a row (empty docs cut to ''). */
  private[queries] lazy val exactSubstrCutOracle: String =
    s"""WITH $exactSubstrCtes,
       |spans AS (SELECT doc_id, MIN(pos) AS s, MAX(e) AS e
       |  FROM sp GROUP BY doc_id, span),
       |pos2 AS (SELECT doc_id, i, w[i] AS tk
       |  FROM toks, unnest(generate_series(1, len(w))) AS u2(i)),
       |keep AS (SELECT p.doc_id, p.i, p.tk FROM pos2 p
       |  WHERE NOT EXISTS (SELECT 1 FROM spans q
       |    WHERE q.doc_id = p.doc_id AND p.i BETWEEN q.s AND q.e)),
       |cl AS (SELECT doc_id,
       |    array_to_string(list(tk ORDER BY i), ' ') AS clean_text
       |  FROM keep GROUP BY doc_id),
       |rm AS (SELECT doc_id, SUM(e - s + 1) AS n_removed FROM spans
       |  GROUP BY doc_id)
       |SELECT c.doc_id, COALESCE(cl.clean_text, '') AS clean_text,
       |  CAST(COALESCE(rm.n_removed, 0) AS BIGINT) AS n_removed
       |FROM corpus c
       |LEFT JOIN cl ON cl.doc_id = c.doc_id
       |LEFT JOIN rm ON rm.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin
}
