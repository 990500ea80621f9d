package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/**
 * Approximate-nearest-neighbor queries over `embeddings` (64-dim float
 * vectors): exact brute-force baseline, hyperplane-LSH bucket path, and
 * deterministic IVF — each with a DuckDB oracle restating the same math.
 * Query set = every vec_id divisible by 50 (seedless, scale-stable).
 */
object SimilarityQueries {

  // ---- persisted-index TEMPLATES (r18 verdict #5 — the q111/GCD
  // link-clone trade applied to the IVF artifact): each lifecycle
  // gate's SCENARIO CONSTRUCTION (the base build, the fragmenting
  // maintains, the drift arrivals) is byte-identical every rep, so it
  // is committed ONCE per JVM as its own priced setup line, and each
  // rep LINK-CLONES the template (StoreIO.cloneDir — index files are
  // immutable: maintain appends new part files, compact/forget/
  // requantize retire by rename+delete, so hard links are
  // observationally a fresh build) and runs the lifecycle op under
  // test on the clone. Reps measure the OPERATOR — clone + compact/
  // ingest/forget/requantize + serve — not a re-run of the identical
  // scenario build, exactly as production runs maintenance on an index
  // that already exists.
  private val annTemplateCache =
    scala.collection.mutable.Map.empty[(String, String), String]
  private def annTemplate(dir: String, key: String)(
      build: => String): String =
    annTemplateCache.synchronized {
      annTemplateCache.getOrElseUpdate((dir, key),
        graft.SetupTimer.time(s"ann_idx_$key") {
          val root = build
          // templates outlive later builds: pin out of the lazy
          // two-generation retirement queue
          graft.operators.AnnIndex.retain(root)
          root
        })
    }

  private def cloneIndex(s: org.apache.spark.sql.SparkSession,
      template: String, tag: String): String =
    RepClones.fresh(s, template, tag)

  import org.apache.spark.sql.SparkSession
  import graft.operators.AnnIndex

  /** s19/s23's template: the full-corpus gate-standard index. */
  private def tplFull50(s: SparkSession, dir: String): String =
    annTemplate(dir, "full50") {
      AnnIndex.build(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", centroidStride = 50, maxCentroids = 32)
    }

  /** s20/s22's template: the even-half base index the odd half
   * arrives into. */
  private def tplEven50(s: SparkSession, dir: String): String =
    annTemplate(dir, "even50") {
      AnnIndex.build(Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", centroidStride = 50, maxCentroids = 32)
    }

  /** s21's template: the even-half base FRAGMENTED by two maintain
   * batches — every posting list carries append files, the layout
   * compact exists to fix. */
  private def tplFrag(s: SparkSession, dir: String): String =
    annTemplate(dir, "frag") {
      val e = Tables.load(s, dir, "embeddings")
      val root = AnnIndex.build(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", centroidStride = 50, maxCentroids = 32)
      AnnIndex.maintain(s, root, e.filter(col("vec_id") % 4 === 1),
        "vec_id", "embedding")
      AnnIndex.maintain(s, root, e.filter(col("vec_id") % 4 === 3),
        "vec_id", "embedding")
      root
    }

  /** s24's template: coarse-quantizer build + full frozen-append drift
   * scenario — the accumulated corpus requantize retrains on. */
  private def tplCoarse(s: SparkSession, dir: String): String =
    annTemplate(dir, "coarse") {
      val e = Tables.load(s, dir, "embeddings")
      val root = AnnIndex.build(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", centroidStride = 100, maxCentroids = 16)
      AnnIndex.maintain(s, root, e.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding")
      root
    }

  /** s25's template: coarse build + the genuinely DRIFTED arrival
   * stream (every arrival rides one direction the quantizer never
   * carved). */
  private def tplDrift(s: SparkSession, dir: String): String =
    annTemplate(dir, "drift") {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val root = AnnIndex.build(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", centroidStride = 100, maxCentroids = 16)
      AnnIndex.maintain(s, root, e.filter(col("vec_id") % 2 === 1)
          .select(col("vec_id"), transform(col("embedding"),
            x => x * lit(0.05) + lit(1.0)).as("embedding")),
        "vec_id", "embedding")
      root
    }

  /** s22's streamed-arrival staging: the odd half written once as the
   * 8-file stream source every rep's engine run reads. */
  private val annSrcCache =
    scala.collection.mutable.Map.empty[String, String]
  private def tplIngestSrc(s: SparkSession, dir: String): String =
    annSrcCache.synchronized {
      annSrcCache.getOrElseUpdate(dir, {
        val src = graft.sources.Scratch.dir("ann_ingest_src")
        Tables.load(s, dir, "embeddings")
          .filter(col("vec_id") % 2 === 1)
          .repartitionByRange(8, col("vec_id"))
          .write.mode("overwrite").parquet(src)
        src
      })
    }

  /** DuckDB select-list fragment computing cosine(a, b) (uses DuckDB's
   * lateral column-alias reuse for dot/na/nb). Caller aliases it `cos`. */
  private def cosSelect(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)) AS dot,
       |    sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i]::DOUBLE * $a[i]::DOUBLE))) AS na,
       |    sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> $b[i]::DOUBLE * $b[i]::DOUBLE))) AS nb,
       |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos""".stripMargin

  /** Shared PQ restatement (s09/s10): codebook, per-(vector, subspace)
   * L2-argmin codes, and the query-side ADC lookup table. Callers splice
   * this after a `pqbase AS (SELECT vec_id AS id, embedding AS ev FROM
   * embeddings)` CTE — one copy of the contract (16-entry codebook from
   * ids < 800, 6dp-rounded distances, lower-code ties), two gated
   * consumers. */
  private val pqCtes: String =
    """sdim AS (SELECT unnest(generate_series(0, 7)) AS s),
      |cb AS (SELECT CAST(vec_id // 50 AS INT) AS j, sdim.s AS s,
      |    list_transform(generate_series(sdim.s * 8 + 1, sdim.s * 8 + 8),
      |      i -> embedding[i]::DOUBLE) AS csub
      |  FROM embeddings, sdim
      |  WHERE vec_id % 50 = 0 AND vec_id < 800),
      |subs AS (SELECT id, sdim.s AS s,
      |    list_transform(generate_series(sdim.s * 8 + 1, sdim.s * 8 + 8),
      |      i -> ev[i]::DOUBLE) AS vsub
      |  FROM pqbase, sdim),
      |codes AS (SELECT id AS nid, s, j AS code FROM (
      |  SELECT id, s, j,
      |    row_number() OVER (PARTITION BY id, s ORDER BY d2 ASC, j) AS r
      |  FROM (SELECT sub.id, sub.s, cb.j,
      |      round(list_sum(list_transform(generate_series(1, 8),
      |        i -> (vsub[i] - csub[i]) * (vsub[i] - csub[i]))), 6) AS d2
      |    FROM subs sub JOIN cb ON cb.s = sub.s)) WHERE r = 1),
      |lut AS (SELECT id AS qid, s, j AS code,
      |    list_sum(list_transform(generate_series(1, 8),
      |      i -> vsub[i] * csub[i])) AS part
      |  FROM subs JOIN cb USING (s) WHERE id % 50 = 0)""".stripMargin

  /** Shared IVF-SQ8 restatement (s11/s12): SQ8 quantization of every
   * vector (corpus min/max affine map, 0..255 clamp), the s03-style
   * coarse-quantizer assignment/probe chain, and the compressed-domain
   * integer-dot ranking. Ends at CTE `r` = (qid, nid, score, rank);
   * consumers append their own final SELECT (s11) or further CTEs
   * (s12's exact re-rank). */
  private val ivfSq8Ctes: String =
    """WITH u AS (
      |  SELECT generate_subscripts(embedding, 1) AS pos,
      |         unnest(embedding)::DOUBLE AS x FROM embeddings),
      |st AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY pos),
      |sc AS (SELECT list(mn ORDER BY pos) AS mins,
      |         list(CASE WHEN mx > mn THEN 255.0 / (mx - mn)
      |              ELSE 0.0 END ORDER BY pos) AS scales
      |       FROM st),
      |qv AS (SELECT vec_id AS id,
      |         list_transform(generate_series(1, 64),
      |           i -> LEAST(255.0, GREATEST(0.0,
      |             round((embedding[i]::DOUBLE - mins[i]) * scales[i]))))
      |           AS v
      |       FROM embeddings, sc),
      |vv0 AS (SELECT vec_id AS vid, embedding AS vvec FROM embeddings),
      |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
      |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
      |assign AS (SELECT vid, cid FROM (
      |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
      |  FROM (SELECT vid, cid,
      |    list_sum(list_transform(generate_series(1, len(vvec)), i -> vvec[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
      |    sqrt(list_sum(list_transform(generate_series(1, len(vvec)), i -> vvec[i]::DOUBLE * vvec[i]::DOUBLE))) AS na,
      |    sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb,
      |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
      |        FROM vv0 CROSS JOIN cent)) WHERE r = 1),
      |q0 AS (SELECT vec_id AS qid0, embedding AS qvec FROM embeddings
      |       WHERE vec_id % 50 = 0),
      |probes AS (SELECT qid0, cid FROM (
      |  SELECT qid0, cid, row_number() OVER (PARTITION BY qid0 ORDER BY ccos DESC, cid) AS r
      |  FROM (SELECT qid0, cid,
      |    list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
      |    sqrt(list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i]::DOUBLE * qvec[i]::DOUBLE))) AS na,
      |    sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb,
      |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
      |        FROM q0 CROSS JOIN cent)) WHERE r <= 2),
      |cand AS (SELECT p.qid0 AS qid, a.vid AS nid
      |         FROM probes p JOIN assign a ON a.cid = p.cid
      |         WHERE a.vid <> p.qid0),
      |scored AS (SELECT c.qid, c.nid,
      |    CAST(list_sum(list_transform(generate_series(1, 64),
      |      i -> qc.v[i] * nc.v[i])) AS BIGINT) AS score
      |  FROM cand c JOIN qv qc ON qc.id = c.qid
      |  JOIN qv nc ON nc.id = c.nid),
      |r AS (SELECT qid, nid, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
      |  FROM scored)""".stripMargin

  /** Recall@5 of `approx` against exact `truth` (both `(qid, nid, …)`
   * top-5 sets): overlap count per query, n_hits/5 as exact
   * rational-in-double math — s05's shape, shared by s14/s15/s16. */
  private def recallOf(truth: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    truth.select(col("qid"), col("nid"))
      .join(approx.select(col("qid").as("aqid"), col("nid").as("anid")),
        col("qid") === col("aqid") && col("nid") === col("anid"), "left")
      .groupBy(col("qid"))
      .agg(count(col("anid")).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        (col("n_hits").cast("double") / 5).as("recall_at_5"))
      .orderBy(col("qid"))

  /** DuckDB restatement of [[recallOf]] over two `(qid, nid)` selects
   * (each may carry its own WITH — DuckDB allows CTEs in derived
   * tables). */
  private def recallSql(truthSel: String, approxSel: String): String =
    s"""WITH t AS (SELECT qid, nid FROM ($truthSel)),
       |a AS (SELECT qid, nid FROM ($approxSel))
       |SELECT t.qid, COUNT(a.nid) AS n_hits,
       |  CAST(COUNT(a.nid) AS DOUBLE) / 5 AS recall_at_5
       |FROM t LEFT JOIN a ON t.qid = a.qid AND t.nid = a.nid
       |GROUP BY t.qid ORDER BY t.qid""".stripMargin

  /** Shared IVF-PQ restatement (s10/s17): s03's coarse assignment/probe
   * chain into s09's codebook/LUT ADC scoring, ending at CTE `r` =
   * (qid, nid, adc, rank); consumers append their final SELECT (s10) or
   * the exact-rerank CTEs (s17). */
  private val ivfPqCtes: String =
    s"""WITH pqbase AS (SELECT vec_id AS id, embedding AS ev FROM embeddings),
       |vv0 AS (SELECT vec_id AS vid, embedding AS vvec FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
       |assign AS (SELECT vid, cid FROM (
       |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT vid, cid,
       |    list_sum(list_transform(generate_series(1, len(vvec)), i -> vvec[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
       |    sqrt(list_sum(list_transform(generate_series(1, len(vvec)), i -> vvec[i]::DOUBLE * vvec[i]::DOUBLE))) AS na,
       |    sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb,
       |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
       |        FROM vv0 CROSS JOIN cent)) WHERE r = 1),
       |q0 AS (SELECT vec_id AS qid0, embedding AS qvec FROM embeddings
       |       WHERE vec_id % 50 = 0),
       |probes AS (SELECT qid0, cid FROM (
       |  SELECT qid0, cid, row_number() OVER (PARTITION BY qid0 ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT qid0, cid,
       |    list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i]::DOUBLE * cv[i]::DOUBLE)) AS dot,
       |    sqrt(list_sum(list_transform(generate_series(1, len(qvec)), i -> qvec[i]::DOUBLE * qvec[i]::DOUBLE))) AS na,
       |    sqrt(list_sum(list_transform(generate_series(1, len(cv)), i -> cv[i]::DOUBLE * cv[i]::DOUBLE))) AS nb,
       |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS ccos
       |        FROM q0 CROSS JOIN cent)) WHERE r <= 2),
       |$pqCtes,
       |cand AS (SELECT p.qid0 AS qid, a.vid AS nid
       |         FROM probes p JOIN assign a ON a.cid = p.cid
       |         WHERE a.vid <> p.qid0),
       |scored AS (SELECT c.qid, c.nid,
       |    round(CAST(SUM(CAST(l.part AS DECIMAL(18,6))) AS DOUBLE), 6) AS adc
       |  FROM cand c JOIN codes k2 ON k2.nid = c.nid
       |  JOIN lut l ON l.qid = c.qid AND l.s = k2.s AND l.code = k2.code
       |  GROUP BY c.qid, c.nid),
       |r AS (SELECT qid, nid, adc,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rank
       |  FROM scored)""".stripMargin

  /** The exact-rerank restatement (candidate cut at 20 → full-precision
   * cosine on survivors → re-rank), chained after any CTE chain ending
   * at `r` = (qid, nid, …, rank) — ONE copy of the contract for its six
   * consumers (s12/s13 gated rerank, s15/s16/s18 recall gates, s17
   * PQ-rerank); a candidate-cut or tie-break fix lands everywhere. */
  private lazy val rerankCtes: String =
    s"""cand2 AS (SELECT qid, nid FROM r WHERE rank <= 20),
       |raw AS (SELECT vec_id, embedding FROM embeddings),
       |rr AS (SELECT c.qid, c.nid,
       |    ${cosSelect("qe.embedding", "ne.embedding")}
       |  FROM cand2 c JOIN raw qe ON qe.vec_id = c.qid
       |  JOIN raw ne ON ne.vec_id = c.nid),
       |r2 AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM rr)""".stripMargin

  /** The deterministic-IVF restatement (centroid seed, cosine-argmax
   * assignment, 2-probe search) — shared by s03 (in-memory chain) and
   * s19 (the same math served from the persisted index artifact).
   * `vWhere` restricts the POSTING side only (s23 restates a forget
   * as the chain over the surviving corpus; centroids and queries
   * stay full — the quantizer is frozen and queries come from the
   * table, not the index). */
  private def s03OracleOver(vWhere: String): String =
    s"""WITH v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings
       |       WHERE $vWhere),
       |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
       |assign AS (SELECT vid, vv, cid FROM (
       |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT vid, vv, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
       |        FROM v CROSS JOIN cent)) WHERE r = 1),
       |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
       |probes AS (SELECT qid, qv, cid FROM (
       |  SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT qid, qv, cid, ${cosSelect("qv", "cv").replace("AS cos", "AS ccos")}
       |        FROM q CROSS JOIN cent)) WHERE r <= 2),
       |scored AS (SELECT qid, vid AS nid,
       |    ${cosSelect("qv", "vv")}
       |  FROM probes JOIN assign USING (cid) WHERE vid <> qid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, rank, nid, cos FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  private lazy val s03Oracle: String = s03OracleOver("TRUE")

  /** s25 restatement: the drifted corpus (even originals ∪ odd
   * arrivals pushed onto the ones-direction), the PRE-refit occupancy
   * census under the build-time stride-100 quantizer for the
   * imbalance statistic, and the s03 serve chain under the REFIT
   * stride-50 quantizer for the search rows — one hash over
   * measure + trigger + post-refit serve. */
  private lazy val s25Oracle: String =
    s"""WITH v AS (
       |  SELECT vec_id AS vid,
       |    list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE) AS vv
       |  FROM embeddings WHERE vec_id % 2 = 0
       |  UNION ALL
       |  SELECT vec_id,
       |    list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE * 0.05 + 1.0)
       |  FROM embeddings WHERE vec_id % 2 = 1),
       |cent0 AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |          WHERE vec_id % 100 = 0 AND vec_id < 1600),
       |assign0 AS (SELECT vid, cid FROM (
       |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT vid, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
       |        FROM v CROSS JOIN cent0)) WHERE r = 1),
       |imb AS (SELECT
       |    ${graft.functions.TextFunctions.halfUp4Sql(
           "max(n)::DOUBLE / sum(n) * (SELECT count(*) FROM cent0)")}
       |      AS imbalance,
       |    TRUE AS refit
       |  FROM (SELECT cid, count(*) AS n FROM assign0 GROUP BY cid)),
       |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
       |assign AS (SELECT vid, vv, cid FROM (
       |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT vid, vv, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
       |        FROM v CROSS JOIN cent)) WHERE r = 1),
       |q AS (SELECT vec_id AS qid,
       |    list_transform(generate_series(1, 64), i -> embedding[i]::DOUBLE) AS qv
       |  FROM embeddings WHERE vec_id % 50 = 0),
       |probes AS (SELECT qid, qv, cid FROM (
       |  SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cid) AS r
       |  FROM (SELECT qid, qv, cid, ${cosSelect("qv", "cv").replace("AS cos", "AS ccos")}
       |        FROM q CROSS JOIN cent)) WHERE r <= 2),
       |scored AS (SELECT qid, vid AS nid,
       |    ${cosSelect("qv", "vv")}
       |  FROM probes JOIN assign USING (cid) WHERE vid <> qid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, rank, nid, cos, imbalance, refit FROM r CROSS JOIN imb
       |WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  private val s01Oracle: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
       |scored AS (SELECT qid, v.vec_id AS nid,
       |    ${cosSelect("qv", "v.embedding")}
       |  FROM q JOIN embeddings v ON v.vec_id <> qid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, rank, nid, cos FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  private val s02Oracle: String =
    s"""WITH planes AS (
       |  SELECT b, i,
       |    (CAST(('0x' || substr(md5('plane:' || b || ':' || i), 1, 15)) AS BIGINT)
       |      % 2000001 - 1000000) / 1000000.0 AS w
       |  FROM (SELECT unnest(generate_series(0, 3)) AS b),
       |       (SELECT unnest(generate_series(0, 63)) AS i)),
       |sigs AS (
       |  SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS sig
       |  FROM (SELECT e.vec_id, p.b, SUM(e.embedding[p.i + 1]::DOUBLE * p.w) AS proj
       |        FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.b)
       |  GROUP BY vec_id),
       |q AS (SELECT e.vec_id AS qid, e.embedding AS qv, s.sig AS qsig
       |      FROM embeddings e JOIN sigs s ON s.vec_id = e.vec_id
       |      WHERE e.vec_id % 50 = 0),
       |scored AS (SELECT qid, v.vec_id AS nid,
       |    ${cosSelect("qv", "v.embedding")}
       |  FROM q JOIN sigs sv ON sv.sig = qsig
       |  JOIN embeddings v ON v.vec_id = sv.vec_id AND v.vec_id <> qid),
       |r AS (SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |SELECT qid, rank, nid, cos FROM r WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // s01 — exact brute-force cosine top-5 (the ANN baseline).
    Q("s01_ann_bruteforce",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s01Oracle)),

    // ----------------------------------------------------------------
    // s02 — 4-bit random-hyperplane LSH: queries score only their own
    // bucket (the 100 TB path; recall is partial by design).
    Q("s02_ann_lsh",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.lshTopK(e, q, "vec_id", "embedding", dim = 64, bits = 4,
            k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s02Oracle)),

    // ----------------------------------------------------------------
    // s05 — ANN quality evaluation: recall@5 of the LSH bucket path
    // against the exact brute-force ground truth, per query — the metric
    // a real index deployment gates on before swapping s01 for s02.
    // Composes the two existing operators and counts the overlap of the
    // two top-5 sets; n_hits/5 is exact rational-in-double math, so the
    // oracle (the two SQL restatements composed the same way) hash-matches
    // with no rounding.
    Q("s05_ann_recall",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        val truth = Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5)
          .select(col("qid"), col("nid"))
        val approx = Similarity.lshTopK(e, q, "vec_id", "embedding",
            dim = 64, bits = 4, k = 5)
          .select(col("qid").as("aqid"), col("nid").as("anid"))
        truth.join(approx,
            col("qid") === col("aqid") && col("nid") === col("anid"), "left")
          .groupBy(col("qid"))
          .agg(count(col("anid")).as("n_hits"))
          .select(col("qid"), col("n_hits"),
            (col("n_hits").cast("double") / 5).as("recall_at_5"))
          .orderBy(col("qid"))
      },
      Some(s"""WITH t AS (SELECT qid, nid FROM ($s01Oracle)),
              |a AS (SELECT qid, nid FROM ($s02Oracle))
              |SELECT t.qid, COUNT(a.nid) AS n_hits,
              |  CAST(COUNT(a.nid) AS DOUBLE) / 5 AS recall_at_5
              |FROM t LEFT JOIN a ON t.qid = a.qid AND t.nid = a.nid
              |GROUP BY t.qid ORDER BY t.qid""".stripMargin)),

    // ----------------------------------------------------------------
    // s03 — deterministic IVF (first 32 stride-50 centroids, 2 probes):
    // inverted centroid lists + multi-probe, the middle ground between s01
    // and s02. The centroid CAP (not just the stride) is the scale knob:
    // broadcast and assignment cost stay constant as the corpus grows.
    Q("s03_ann_ivf",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.ivfTopK(e, q, "vec_id", "embedding",
            centroidStride = 50, nProbe = 2, k = 5, maxCentroids = 32)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle)),

    // ----------------------------------------------------------------
    // s04 — one k-means (Lloyd) step over the s03 seed centroids: the
    // training loop of a real IVF index, gated end-to-end — deterministic
    // assignment (cosine argmax, ties to lower cid) and element-wise
    // cluster means through DECIMAL so both engines emit identical bits.
    // Output is one row per (cid, dim): the driver's comparator sorts
    // rows with pandas, which cannot order array cells, so the centroid
    // vector is emitted exploded rather than as a DOUBLE[64] column.
    Q("s04_ivf_kmeans_step",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        Similarity.kmeansStep(e, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32)
          .select(col("cid"), col("n"),
            posexplode(col("centroid")).as(Seq("pos", "m")))
          .select(col("cid"), col("n"),
            (col("pos") + 1).cast("int").as("dim"), col("m"))
          .orderBy(col("cid"), col("dim"))
      },
      Some(s"""WITH v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings),
              |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
              |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
              |assign AS (SELECT vid, vv, cid FROM (
              |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
              |  FROM (SELECT vid, vv, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
              |        FROM v CROSS JOIN cent)) WHERE r = 1),
              |el AS (SELECT cid, i, vv[i]::DOUBLE AS x
              |       FROM assign CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)),
              |means AS (SELECT cid, CAST(i AS INTEGER) AS dim,
              |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x) AS m
              |  FROM el GROUP BY cid, i),
              |sizes AS (SELECT cid, COUNT(*) AS n FROM assign GROUP BY cid)
              |SELECT cid, n, dim, m FROM means JOIN sizes USING (cid)
              |ORDER BY cid, dim""".stripMargin)),

    // ----------------------------------------------------------------
    // s06 — per-dimension embedding statistics (count / mean / min / max):
    // the data-QA pass a vector corpus gets before indexing or training —
    // a dead dimension, a scale outlier, or a truncated batch shows up
    // here. One posexplode + one partial-aggregated shuffle on the
    // dimension index (64 groups regardless of corpus size); means go
    // through DECIMAL so both engines emit identical doubles, min/max are
    // exact float widenings.
    Q("s06_embedding_dim_stats",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        e.select(posexplode(col("embedding")).as(Seq("pos", "v")))
          .select((col("pos") + 1).cast("int").as("dim"),
            col("v").cast("double").as("x"))
          .groupBy(col("dim"))
          .agg(count(lit(1)).as("n"),
            Exact.davg(col("x")).as("mean_v"),
            min(col("x")).as("min_v"), max(col("x")).as("max_v"))
          .orderBy(col("dim"))
      },
      Some(s"""WITH u AS (
              |  SELECT CAST(generate_subscripts(embedding, 1) AS INTEGER) AS dim,
              |         CAST(unnest(embedding) AS DOUBLE) AS x
              |  FROM embeddings)
              |SELECT dim, COUNT(*) AS n,
              |  ${Exact.sqlDavg("x")} AS mean_v,
              |  MIN(x) AS min_v, MAX(x) AS max_v
              |FROM u GROUP BY dim ORDER BY dim""".stripMargin)),

    // ----------------------------------------------------------------
    // s07 — IVF search against the TRAINED quantizer: s04's one-Lloyd-step
    // centroids (DECIMAL-exact means) instead of the raw strided seeds —
    // the production IVF shape, with index build (assignment) and search
    // (probe + rank) as separate passes over ONE bounded centroid
    // broadcast (computed once, reused by both joins). The oracle chains
    // s04's training restatement into s03's search restatement; trained
    // centroids are re-listed in dimension order so every norm and dot
    // folds in the same element order in both engines.
    Q("s07_ann_ivf_trained",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.ivfTopKTrained(e, q, "vec_id", "embedding",
            centroidStride = 50, nProbe = 2, k = 5, maxCentroids = 32)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH v AS (SELECT vec_id AS vid, embedding AS vv FROM embeddings),
              |cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
              |         WHERE vec_id % 50 = 0 AND vec_id < 1600),
              |assign0 AS (SELECT vid, vv, cid FROM (
              |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
              |  FROM (SELECT vid, vv, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
              |        FROM v CROSS JOIN cent)) WHERE r = 1),
              |el AS (SELECT cid, i, vv[i]::DOUBLE AS x
              |       FROM assign0 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)),
              |mm AS (SELECT cid, i,
              |    CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x) AS m
              |  FROM el GROUP BY cid, i),
              |tc AS (SELECT cid, list(m ORDER BY i) AS cv FROM mm GROUP BY cid),
              |assign AS (SELECT vid, vv, cid FROM (
              |  SELECT vid, vv, cid, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS r
              |  FROM (SELECT vid, vv, cid, ${cosSelect("vv", "cv").replace("AS cos", "AS ccos")}
              |        FROM v CROSS JOIN tc)) WHERE r = 1),
              |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
              |probes AS (SELECT qid, qv, cid FROM (
              |  SELECT qid, qv, cid, row_number() OVER (PARTITION BY qid ORDER BY ccos DESC, cid) AS r
              |  FROM (SELECT qid, qv, cid, ${cosSelect("qv", "cv").replace("AS cos", "AS ccos")}
              |        FROM q CROSS JOIN tc)) WHERE r <= 2),
              |scored AS (SELECT qid, vid AS nid,
              |    ${cosSelect("qv", "vv")}
              |  FROM probes JOIN assign USING (cid) WHERE vid <> qid),
              |r AS (SELECT qid, nid, cos,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
              |  FROM scored)
              |SELECT qid, rank, nid, cos FROM r WHERE rank <= 5
              |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s08 — scalar-quantized (SQ8) ANN: per-dimension min/max maps every
    // value onto the 0..255 integer grid, similarity = integer dot of the
    // codes (the 4×-memory-compression production technique). The whole
    // scoring path is exact int64 arithmetic — the only doubles are the
    // IEEE-deterministic affine map — so the gate needs no rounding at
    // all. Quantization params are a one-row broadcast (64 groups), codes
    // are scan-stage, ranking is the bounded-heap partial aggregate.
    Q("s08_ann_sq8",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.sq8TopK(e, q, "vec_id", "embedding", k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH u AS (
             |  SELECT generate_subscripts(embedding, 1) AS pos,
             |         unnest(embedding)::DOUBLE AS x FROM embeddings),
             |st AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY pos),
             |sc AS (SELECT list(mn ORDER BY pos) AS mins,
             |         list(CASE WHEN mx > mn THEN 255.0 / (mx - mn)
             |              ELSE 0.0 END ORDER BY pos) AS scales
             |       FROM st),
             |qv AS (SELECT vec_id AS id,
             |         list_transform(generate_series(1, 64),
             |           i -> LEAST(255.0, GREATEST(0.0,
             |             round((embedding[i]::DOUBLE - mins[i]) * scales[i]))))
             |           AS v
             |       FROM embeddings, sc),
             |q AS (SELECT id AS qid, v AS qvec FROM qv WHERE id % 50 = 0),
             |scored AS (SELECT qid, c.id AS nid,
             |    CAST(list_sum(list_transform(generate_series(1, 64),
             |      i -> qvec[i] * c.v[i])) AS BIGINT) AS score
             |  FROM q JOIN qv c ON c.id <> qid),
             |r AS (SELECT qid, nid, score,
             |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
             |  FROM scored)
             |SELECT qid, rank, nid, score FROM r WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s09 — product-quantized (PQ) ANN via asymmetric distance
    // computation: vectors compressed to 8 sub-space codes against a
    // deterministic 16-entry-per-subspace codebook; queries stay raw and
    // score candidates by 8 lookups in a precomputed partial-dot table.
    // The corpus side carries m·log2(k) BITS per vector at scale — the
    // memory-compression standard of billion-vector search. Codes and
    // LUT are broadcast joins; the ADC sum runs through DECIMAL so the
    // gate is exact; ranking is the bounded-heap partial aggregate.
    Q("s09_ann_pq",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.pqTopK(e, q, "vec_id", "embedding", dim = 64, m = 8,
            k = 16, codeStride = 50, topK = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH pqbase AS (SELECT vec_id AS id, embedding AS ev FROM embeddings),
              |$pqCtes,
              |scored AS (SELECT qid, nid,
              |    round(CAST(SUM(CAST(part AS DECIMAL(18,6))) AS DOUBLE), 6) AS adc
              |  FROM codes JOIN lut USING (s, code) WHERE nid <> qid
              |  GROUP BY qid, nid),
              |r AS (SELECT qid, nid, adc,
              |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, nid) AS rank
              |  FROM scored)
              |SELECT qid, rank, nid, adc FROM r WHERE rank <= 5
              |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s10 — IVF-PQ composed (the FAISS IVFxx,PQyy production recipe):
    // the coarse quantizer restricts each query to its 2 nearest
    // centroid lists and candidates are scored in the COMPRESSED domain
    // via s09's ADC lookup table — per-vector corpus state is (cluster
    // id + 8 codes). The oracle chains s03's assignment/probe
    // restatement into s09's codebook/LUT restatement.
    Q("s10_ann_ivfpq",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.ivfPqTopK(e, q, "vec_id", "embedding", dim = 64, m = 8,
            k = 16, codeStride = 50, centroidStride = 50, maxCentroids = 32,
            nProbe = 2, topK = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""$ivfPqCtes
             |SELECT qid, rank, nid, adc FROM r WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s11 — IVF-SQ8 composed (FAISS IVFxx,SQ8): the coarse quantizer
    // restricts each query to its 2 nearest centroid lists (s03's
    // restatement) and candidates are scored by the exact INTEGER dot of
    // their SQ8 codes (s08's restatement) — closing the one flat corpus
    // scan the graded ANN set had left (s08 alone is O(n·q); it stays as
    // the calibration baseline). Per-vector state at scale: cluster id +
    // 64 one-byte codes.
    Q("s11_ann_ivfsq8",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.ivfSq8TopK(e, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""$ivfSq8Ctes
             |SELECT qid, rank, nid, score FROM r WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s12 — two-stage retrieve-then-rerank (the production ANN serving
    // shape): s11's compressed-domain IVF-SQ8 pass pulls 20 candidates
    // per query, then ONLY those are re-scored with the exact
    // full-precision cosine and cut to the top 5. The corpus-wide pass
    // never touches raw vectors; exact math runs on O(q × 20) rows. The
    // oracle chains s11's restatement into s01's exact-cosine form.
    Q("s12_ann_rerank",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.rerankTopK(e, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2,
            candK = 20, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""$ivfSq8Ctes,
             |$rerankCtes
             |SELECT qid, rank, nid, cos FROM r2 WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s13 — FILTERED vector search (the vector-DB "metadata predicate +
    // ANN" feature): search runs entirely within the label-3 shard —
    // corpus, coarse quantizer AND queries are pre-filtered, so recall
    // is exact w.r.t. the filtered universe (PRE-filtering; the
    // alternative, post-filtering an unfiltered index's top-k, silently
    // loses recall when the predicate is selective — that trade-off is
    // the point of making filtered search a first-class operator). The
    // full retrieve-then-rerank stack composes unchanged over the
    // filtered frame; the oracle shadows `embeddings` with the filtered
    // subset and reuses the identical IVF-SQ8 + rerank restatement.
    Q("s13_ann_filtered",
      (s, dir) => {
        val base = Tables.load(s, dir, "embeddings")
          .filter(col("label") % 3 === 0)
        val q = base.filter(col("vec_id") % 50 === 0)
        Similarity.rerankTopK(base, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2,
            candK = 20, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""WITH embeddings AS (
             |  SELECT * FROM main.embeddings WHERE label % 3 = 0),
             |${ivfSq8Ctes.stripPrefix("WITH ")},
             |$rerankCtes
             |SELECT qid, rank, nid, cos FROM r2 WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s14/s15/s16 — recall gating for the COMPOSED stack (s05 grades the
    // basic LSH path; these quantify the production configurations):
    // recall@5 of IVF-SQ8 (s11), retrieve-then-rerank (s12), and
    // filtered rerank (s13, truth = brute force over the SAME filtered
    // universe) against exact ground truth, per query. The approximate
    // entries thus carry a quantified quality contract, not just
    // exact-arithmetic hashes; SimilaritySpec pins recall floors so a
    // quantizer/probe regression fails in-JVM before the gate sees it.
    Q("s14_recall_ivfsq8",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        recallOf(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          Similarity.ivfSq8TopK(e, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2, k = 5))
      },
      Some(recallSql(s01Oracle,
        s"""$ivfSq8Ctes
           |SELECT qid, nid FROM r WHERE rank <= 5""".stripMargin))),

    Q("s15_recall_rerank",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        recallOf(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          Similarity.rerankTopK(e, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2,
            candK = 20, k = 5))
      },
      Some(recallSql(s01Oracle,
        s"""$ivfSq8Ctes,
           |$rerankCtes
           |SELECT qid, nid FROM r2 WHERE rank <= 5""".stripMargin))),

    Q("s16_recall_filtered",
      (s, dir) => {
        val base = Tables.load(s, dir, "embeddings")
          .filter(col("label") % 3 === 0)
        val q = base.filter(col("vec_id") % 50 === 0)
        recallOf(
          Similarity.cosineTopK(base, q, "vec_id", "embedding", k = 5),
          Similarity.rerankTopK(base, q, "vec_id", "embedding",
            centroidStride = 50, maxCentroids = 32, nProbe = 2,
            candK = 20, k = 5))
      },
      Some {
        val shadow =
          "WITH embeddings AS (\n  SELECT * FROM main.embeddings WHERE label % 3 = 0),\n"
        recallSql(
          shadow + s01Oracle.stripPrefix("WITH "),
          s"""$shadow${ivfSq8Ctes.stripPrefix("WITH ")},
             |$rerankCtes
             |SELECT qid, nid FROM r2 WHERE rank <= 5""".stripMargin)
      }),

    // ----------------------------------------------------------------
    // s17 — retrieve-then-rerank over IVF-PQ candidates (s12's sibling
    // for the more memory-aggressive production config): stage 1 orders
    // candidates by s10's compressed-domain ADC (m·log2(k) bits per
    // corpus vector), stage 2 re-scores the 20 survivors per query with
    // exact full-precision cosine. The oracle chains s10's restatement
    // into s01's exact-cosine form, exactly as s12 chains s11's.
    Q("s17_ann_ivfpq_rerank",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        Similarity.rerankPqTopK(e, q, "vec_id", "embedding", dim = 64,
            m = 8, k = 16, codeStride = 50, centroidStride = 50,
            maxCentroids = 32, nProbe = 2, candK = 20, topK = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s"""$ivfPqCtes,
             |$rerankCtes
             |SELECT qid, rank, nid, cos FROM r2 WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // s18 — recall gate for s17 (the IVF-PQ rerank path), completing the
    // recall battery: every composed approximate configuration now
    // carries a quantified quality row (s14 IVF-SQ8, s15 SQ8-rerank,
    // s16 filtered, s18 PQ-rerank) against the same exact ground truth.
    Q("s18_recall_ivfpq_rerank",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        recallOf(
          Similarity.cosineTopK(e, q, "vec_id", "embedding", k = 5),
          Similarity.rerankPqTopK(e, q, "vec_id", "embedding", dim = 64,
            m = 8, k = 16, codeStride = 50, centroidStride = 50,
            maxCentroids = 32, nProbe = 2, candK = 20, topK = 5))
      },
      Some(recallSql(s01Oracle,
        s"""$ivfPqCtes,
           |$rerankCtes
           |SELECT qid, nid FROM r2 WHERE rank <= 5""".stripMargin))),

    // ----------------------------------------------------------------
    // s19 — the PERSISTED index: s03's exact math served from a parquet
    // artifact (small centroid table + cid-partitioned posting lists,
    // the k01/k02 progression applied to vectors). Build writes the
    // index once; serve probes the centroid table and reads ONLY the
    // probed posting partitions — the collected probe set (bounded by
    // the list count) becomes a literal partition filter, and
    // AnnIndexSpec asserts the scan's ACTUAL pruned file count (a
    // plan-text "dynamicpruning" check proved vacuous: Spark plans
    // dynamicpruningexpression(true) for this shape). The oracle is
    // s03's restatement verbatim: the gate hash-proves
    // serve-from-artifact ≡ the in-memory chain.
    Q("s19_ann_index_persist",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        // build-once / serve-many made literal: the artifact is the
        // once-per-JVM template (setup line ann_idx_full50) and each
        // rep measures the pruned SERVE path against it — read-only,
        // so no clone is needed
        graft.operators.AnnIndex.search(s, tplFull50(s, dir), q,
            "vec_id", "embedding", nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle),
      setup = Some((ss, dir) => { tplFull50(ss, dir); () })),

    // ----------------------------------------------------------------
    // s20 — incremental index maintenance: build the artifact from the
    // even-id half of the corpus (which contains every stride-quantizer
    // centroid id — multiples of 50 are even — so the frozen quantizer
    // is identical to the full build's), then APPEND the odd-id half
    // via AnnIndex.maintain: only the new batch is assigned, existing
    // posting files are never touched. The oracle is s03's FULL-corpus
    // restatement — the gate hash-proves maintain(build(half), rest) ≡
    // build(all), the q70/g03 maintain-equals-rebuild contract applied
    // to the vector index.
    Q("s20_ann_index_maintain",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val batch = e.filter(col("vec_id") % 2 === 1)
        val q = e.filter(col("vec_id") % 50 === 0)
        // the op under test is the frozen-quantizer APPEND: each rep
        // link-clones the committed even-half template and maintains
        // the arriving half into the clone
        val root = cloneIndex(s, tplEven50(s, dir),
          "s20_ann_index_maintain")
        graft.StageTimer.time("s20_ann_index_maintain", "maintain") {
          graft.operators.AnnIndex.maintain(s, root, batch, "vec_id",
            "embedding")
        }
        graft.operators.AnnIndex.search(s, root, q, "vec_id", "embedding",
            nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle),
      setup = Some((ss, dir) => { tplEven50(ss, dir); () })),

    // ----------------------------------------------------------------
    // s21 — index COMPACTION: two maintain batches leave every posting
    // list fragmented across append files (batch-count seeks per probed
    // list at serve time — the file-count economics AnnIndexSpec pins);
    // AnnIndex.compact rewrites each list back to one contiguous file
    // behind a stage-then-swap (crash mid-stage leaves the live layout
    // untouched). Row content is unchanged, so the same s03 full-corpus
    // oracle hash-proves compact(maintain²(build(half))) ≡ build(all) —
    // the k03/q87 tiering stage completing the vector index lifecycle.
    Q("s21_ann_index_compact",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 50 === 0)
        // the op under test is COMPACTION: each rep link-clones the
        // committed fragmented template (build + 2 maintains, the
        // ann_idx_frag setup line) and compacts the clone
        val root = cloneIndex(s, tplFrag(s, dir),
          "s21_ann_index_compact")
        graft.StageTimer.time("s21_ann_index_compact", "compact") {
          graft.operators.AnnIndex.compact(s, root)
        }
        graft.operators.AnnIndex.search(s, root, q, "vec_id", "embedding",
            nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle),
      setup = Some((ss, dir) => { tplFrag(ss, dir); () })),

    // ----------------------------------------------------------------
    // s22 — STREAMING ingest into the persisted ANN index: the q86/q91
    // shape (real engine foreachBatch-maintaining a persisted artifact)
    // applied to the vector index. The index is built from half the
    // corpus; the other half streams through in several micro-batches,
    // each folded in by AnnIndex.ingestBatch — the frozen-quantizer
    // append behind a staged two-phase commit, so a replayed batch id
    // is a no-op instead of double-ingesting its vectors (pinned in
    // AnnIndexSpec). Sharing s03's full-corpus oracle hash-proves
    // stream-ingested index serves ≡ build(all), independent of how
    // the engine batched the files — s20's maintain contract upgraded
    // to the streaming engine with exactly-once durability.
    Q("s22_stream_ann_ingest",
      (s, dir) => {
        import org.apache.spark.sql.streaming.Trigger
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        // the op under test is the exactly-once STREAMING ingest: each
        // rep link-clones the committed even-half template, stages a
        // fresh checkpoint, and streams the (once-staged) odd half into
        // the clone through the real engine
        val root = cloneIndex(ss, tplEven50(ss, dir),
          "s22_stream_ann_ingest")
        val src = tplIngestSrc(ss, dir)
        val q = ss.readStream.schema(ss.read.parquet(src).schema)
          .option("maxFilesPerTrigger", StreamingQueries.GateFilesPerTrigger).parquet(src)
          .writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation",
            graft.sources.Scratch.dir("ann_ingest_cp"))
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.operators.AnnIndex.ingestBatch(ss, root, b, id,
              "vec_id", "embedding")
          }
          .start()
        q.awaitTermination()
        graft.operators.AnnIndex.search(s, root,
            Tables.load(s, dir, "embeddings")
              .filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle),
      setup = Some((ss, dir) => {
        tplEven50(ss, dir); tplIngestSrc(ss, dir); ()
      })),

    // ----------------------------------------------------------------
    // s23 — COMPLIANCE FORGET on the index artifact: the right-to-be-
    // forgotten path every other persisted artifact already carries
    // (ledger forget q111, store delete q93) applied to the IVF
    // layout. Victims route through the FROZEN quantizer to the one
    // list each lives in — only those lists are read and rewritten
    // (stage-then-swap per list; a fully-emptied list disappears);
    // centroids are quantizer parameters, not corpus rows, so a victim
    // that seeded a centroid loses its posting row while the centroid
    // keeps serving. The oracle restates the s03 chain over the
    // SURVIVING corpus (full centroid set, full query set) — the hash
    // proves the post-forget serve ≡ an index that never held the
    // victims.
    Q("s23_ann_index_forget",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        // the op under test is FORGET: each rep link-clones the
        // committed full-corpus template (shared with s19) and forgets
        // the victims out of the clone
        val root = cloneIndex(s, tplFull50(s, dir),
          "s23_ann_index_forget")
        graft.StageTimer.time("s23_ann_index_forget", "forget") {
          graft.operators.AnnIndex.forget(s, root,
            e.filter(col("vec_id") % 17 === 0), "vec_id", "embedding")
        }
        graft.operators.AnnIndex.search(s, root,
            e.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03OracleOver("vec_id % 17 <> 0")),
      setup = Some((ss, dir) => { tplFull50(ss, dir); () })),

    // ----------------------------------------------------------------
    // s24 — index RE-QUANTIZATION: the lifecycle op the frozen-quantizer
    // rule (s20/s22) deliberately forbids in-flight and production IVF
    // therefore runs OFFLINE. The index is born with a COARSE quantizer
    // trained on the early half of the corpus (stride 100 → 16 lists),
    // the other half arrives through the frozen append — the drift
    // shape: later vectors are routed by centroids that never saw
    // them — and AnnIndex.requantize then retrains the quantizer on
    // the ACCUMULATED corpus (stride 50 → 32 lists, the exact seeding
    // a from-scratch build(all) would use), reassigns every posting,
    // and installs centroids + postings behind one intent-marked swap.
    // The oracle is s03's full-corpus restatement verbatim: the hash
    // proves requantize(maintain(build(coarse-half))) ≡ build(all) on
    // the refit quantizer — serving after a refit is indistinguishable
    // from never having drifted. (The recall half — refit ≥ frozen on
    // a drifted corpus — is pinned in AnnIndexSpec, where recall can
    // actually move; here the refit target is the gate-standard
    // quantizer so the equivalence is exact.)
    Q("s24_ann_index_requantize",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
        // the op under test is the offline REQUANTIZE: each rep
        // link-clones the committed drifted template (coarse build +
        // frozen append, the ann_idx_coarse setup line) and refits the
        // clone's quantizer
        val root = cloneIndex(s, tplCoarse(s, dir),
          "s24_ann_index_requantize")
        graft.StageTimer.time("s24_ann_index_requantize", "requantize") {
          graft.operators.AnnIndex.requantize(s, root,
            centroidStride = 50, maxCentroids = 32)
        }
        graft.operators.AnnIndex.search(s, root,
            e.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", nProbe = 2, k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some(s03Oracle),
      setup = Some((ss, dir) => { tplCoarse(ss, dir); () })),

    // ----------------------------------------------------------------
    // s25 — DRIFT-TRIGGERED re-quantization: s24 proves the refit is
    // exact; this gate proves the DECISION — the list-occupancy
    // imbalance statistic (max list share · nLists, the signal
    // production IVF monitors because it needs no ground truth) read
    // off the artifact, crossing the threshold on a genuinely drifted
    // arrival stream, and firing the refit. The arrivals are the drift
    // shape the statistic exists for: every new vector rides one
    // direction (v·0.05 + 1⃗) the original quantizer never carved, so
    // the whole stream collapses into the single list nearest the
    // ones-vector and imbalance jumps from ~1.2 to ≥ nLists/2. The
    // returned frame carries the search rows AND the (imbalance,
    // refit) decision as constant columns — the oracle restates the
    // pre-refit assignment census for the statistic and the
    // from-scratch refit index for the serve rows, so one hash proves
    // measure + trigger + post-refit serving together. (The negative
    // half — an undrifted corpus does NOT fire and the layout is
    // untouched — is pinned in AnnIndexSpec, where a no-op is
    // observable.)
    Q("s25_ann_drift_requantize",
      (s, dir) => {
        val e = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        // the op under test is the drift DECISION + refit: each rep
        // link-clones the committed drifted template (coarse build +
        // collapsed-list arrivals, the ann_idx_drift setup line),
        // measures the imbalance statistic on the clone and fires the
        // refit there
        val root = cloneIndex(s, tplDrift(s, dir),
          "s25_ann_drift_requantize")
        // one posting-metadata scan per decision: the trigger returns
        // the statistic it measured (ADVICE r14)
        val d = graft.StageTimer.time("s25_ann_drift_requantize",
          "drift_requantize") {
          graft.operators.AnnIndex.requantizeIfDrifted(s,
            root, maxImbalance = 2.0, centroidStride = 50,
            maxCentroids = 32)
        }
        require(d.fired, f"s25: imbalance ${d.imbalance}%.4f did not " +
          "cross 2.0 — the drift construction stopped drifting")
        graft.operators.AnnIndex.search(s, root,
            e.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", nProbe = 2, k = 5)
          // portable 4dp HALF_UP (TextFunctions.halfUp4): the imbalance
          // is a ratio of integers and CAN land exactly on a 4dp dyadic
          // half where engine round(DOUBLE,4) half-modes differ
          .withColumn("imbalance",
            lit(graft.functions.TextFunctions.halfUp4(d.imbalance)))
          .withColumn("refit", lit(d.fired))
          .orderBy(col("qid"), col("rank"))
      },
      Some(s25Oracle),
      setup = Some((ss, dir) => { tplDrift(ss, dir); () })),

    // ----------------------------------------------------------------
    // q50 — the Catalyst optimizer rule in the hard gate: this query is
    // written in the PLAIN-SPARK HOF dot-product form
    // (aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v))
    // that RewriteHofDotProduct upgrades to the codegen'd single-pass
    // kernel — the gated sessions (Verify/Bench) install
    // graft.GraftExtensions, so the hash gate proves the REWRITTEN plan
    // computes exactly what the user wrote (rule equivalence is also
    // unit-tested in GraftExtensionsSpec, including null-on-mismatch).
    Q("q50_hof_dot_rewrite",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.load(s, dir, "embeddings")
        val q = e.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("qid"),
            col("embedding").cast("array<double>").as("qv"))
        val v = e.select(col("vec_id").as("nid"),
          col("embedding").cast("array<double>").as("nv"))
        val scored = broadcast(q).join(v, col("nid") =!= col("qid"))
          .select(col("qid"), col("nid"),
            round(aggregate(zip_with(col("qv"), col("nv"),
                (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x), 6).as("dot"))
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("dot").desc, col("nid"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("rank"), col("nid"), col("dot"))
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qv
             |          FROM embeddings WHERE vec_id % 100 = 0),
             |scored AS (SELECT qid, v.vec_id AS nid,
             |    round(list_sum(list_transform(generate_series(1, 64),
             |      i -> qv[i]::DOUBLE * v.embedding[i]::DOUBLE)), 6) AS dot
             |  FROM q JOIN embeddings v ON v.vec_id <> qid),
             |r AS (SELECT qid, nid, dot,
             |    row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
             |  FROM scored)
             |SELECT qid, rank, nid, dot FROM r WHERE rank <= 10
             |ORDER BY qid, rank""".stripMargin))
  )
}
