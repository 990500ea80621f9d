package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Tables

/**
 * Multimodal-plumbing queries: binary payload columns with typed metadata
 * derived deterministically from `documents` (payload = utf-8 bytes of
 * `text`, so the DuckDB oracle can restate the binary math over the
 * original string). m02 exercises the typed mapPartitions decode stage,
 * which is not SQL-expressible — no oracle, the driver records a
 * rows-only check.
 */
object MultimodalQueries {

  /** DuckDB restatement of Multimodal.aHash(n=60) over documents-derived
   * media: CTE chain ending in `sig(id, sig)` — shared by m05 (banded
   * near-dup pairs) and m06 (streaming ledger group-by). */
  private val sigCte =
    """f AS (SELECT doc_id AS id, text, len(text) AS sz FROM documents),
      |st AS (SELECT id, i,
      |    substr(text, (sz * i) // 60 + 1, greatest(sz // 60, 1)) AS w
      |  FROM f, unnest(generate_series(0, 59)) u(i)),
      |sums AS (SELECT id, i, CAST(len(w) AS BIGINT) AS l,
      |    CAST(COALESCE(list_sum(list_transform(generate_series(1, len(w)),
      |      j -> ascii(substr(w, j, 1)))), 0) AS BIGINT) AS s
      |  FROM st),
      |tot AS (SELECT id, CAST(SUM(s) AS BIGINT) AS stot,
      |    CAST(SUM(l) AS BIGINT) AS ltot
      |  FROM sums GROUP BY id),
      |sig AS (SELECT sums.id,
      |    CAST(SUM(CASE WHEN s * ltot > stot * l
      |      THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS sig
      |  FROM sums JOIN tot ON tot.id = sums.id GROUP BY sums.id)""".stripMargin

  /** The m05 banded pair SQL — shared by m05 and m07 (the streamed
   * accumulation's final pair set is batch-composition independent;
   * the 2000 band cap is not binding at any test SF, so capped-batch
   * and exact-streamed restatements coincide). */
  private lazy val phashPairsSql: String =
    s"""WITH $sigCte,
       |buckets AS (SELECT id, sig,
       |    bb || '|' || CAST((sig >> (bb * 5)) & 31 AS VARCHAR) AS bkey
       |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS bb) bands
       |  QUALIFY COUNT(*) OVER (PARTITION BY bkey) <= 2000)
       |SELECT DISTINCT x.id AS a, y.id AS b,
       |    CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
       |FROM buckets x JOIN buckets y
       |  ON x.bkey = y.bkey AND x.id < y.id
       |WHERE bit_count(xor(x.sig, y.sig)) <= 11
       |ORDER BY a, b""".stripMargin

  // per-JVM ingest cache for m07 (the neardupArtifacts pattern,
  // round-13 verdict #1: uniform treatment of the streamed gates —
  // build once, reps serve the pair artifact, the build cost rides
  // the bench's explicit setup metric)
  private val phashCache =
    scala.collection.mutable.Map.empty[String, String]
  private def phashArtifacts(ss: org.apache.spark.sql.SparkSession,
      dir: String): String =
    phashCache.synchronized {
      phashCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("phash_ingest") {
          val sigs = Multimodal.aHash(
              Multimodal.fromDocuments(Tables.load(ss, dir, "documents")),
              n = 60)
            .select(col("media_id").as("id"), col("ahash").as("sig"))
          val led = new graft.streaming.NearDupLedger(ss, bits = 60,
            maxHamming = 11, nBuckets = 16)
          val pairsDir = graft.sources.Scratch.dir("phash_neardup_pairs")
          StreamingQueries.streamSliced(ss, sigs, "id", "phash_neardup") {
            (b, id) =>
              led.observe(b, id).write.mode("overwrite")
                .parquet(s"$pairsDir/b$id")
          }
          // the oracle is m05's SQL, which caps bands at 2000 postings
          // (QUALIFY); this ledger runs UNCAPPED (maxPosting=0), so the
          // shared oracle is only valid while the cap never binds —
          // CHECK that, don't assume it, or a fixture-scale bump would
          // fail the gate for a reason unrelated to the ledger
          val hottest = led.store.view(ss)
            .agg(max(size(col("posting")))).head().getInt(0)
          require(hottest <= 2000,
            s"m07: hottest band holds $hottest postings > the oracle's " +
              "2000 cap — give m07 its own uncapped oracle")
          pairsDir
        })
    }

  /** m06's exact-pHash ledger monoid: keeper = min media id, counts
   * sum — shared by the streamed build and the recover-for-serve. */
  private val m06Combine: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame =
    df => df.groupBy(col("sig"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        sum(col("n_media")).as("n_media"))

  // per-JVM ingest cache (the neardupArtifacts pattern): m06's
  // streamed ledger build runs once, its cost rides the setup metric,
  // and reps serve the committed store
  private val phashLedgerCache =
    scala.collection.mutable.Map.empty[String, String]
  private def phashLedgerArtifacts(ss: org.apache.spark.sql.SparkSession,
      dir: String): String =
    phashLedgerCache.synchronized {
      phashLedgerCache.getOrElseUpdate(dir,
        graft.SetupTimer.time("phash_ledger_ingest") {
          import org.apache.spark.sql.streaming.Trigger
          val src = graft.sources.Scratch.dir("phash_ledger_src")
          Tables.load(ss, dir, "documents")
            .select(col("doc_id"), col("text"))
            .repartition(8).write.mode("overwrite").parquet(src)
          val state = new graft.streaming.BucketedUpsert.State(ss,
            keyCol = "sig",
            payloadCols = Seq("keeper_id", "n_media"), nBuckets = 16,
            combine = Some(m06Combine))
          val q = ss.readStream.schema(ss.read.parquet(src).schema)
            .option("maxFilesPerTrigger",
              StreamingQueries.GateFilesPerTrigger).parquet(src)
            .writeStream
            .trigger(Trigger.AvailableNow())
            .option("checkpointLocation",
              graft.sources.Scratch.dir("phash_ledger_cp"))
            .foreachBatch {
              (b: org.apache.spark.sql.DataFrame, id: Long) =>
                state.merge(
                  Multimodal.aHash(Multimodal.fromDocuments(b), n = 60)
                    .select(col("ahash").as("sig"),
                      col("media_id").as("keeper_id"),
                      lit(1L).as("n_media")),
                  id)
            }
            .start()
          q.awaitTermination()
          state.rootDir
        })
    }

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // m01 — binary payload + metadata projection: byte length, content
    // digest over the blob, typed meta fields.
    Q("m01_binary_meta",
      (s, dir) => {
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        media.select(
          col("media_id"),
          col("meta.kind").as("kind"),
          col("meta.width").as("width"),
          col("meta.durationMs").as("duration_ms"),
          length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id, 'image' AS kind,
             |  CAST(len(text) AS INT) AS width,
             |  CAST(len(text) * 10 AS BIGINT) AS duration_ms,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  md5(text) AS payload_md5
             |FROM documents ORDER BY media_id""".stripMargin)),

    // ----------------------------------------------------------------
    // m02 — the decode/feature-extract stage (typed Dataset through
    // mapPartitions with a per-partition decoder). The decode stage itself
    // isn't SQL, but its OUTPUT is deterministic byte math the oracle can
    // restate: digest = md5(payload bytes) = DuckDB md5(text) (payload is
    // the utf-8 encoding), brightness = mean byte value = mean ascii code
    // (the fixture corpus is ASCII, asserted in MultimodalSpec), stated as
    // exact-6dp HALF_UP ppm on both sides (sum/len is an integer ratio —
    // the engine-round()-sensitive class; see TextFunctions.ratio6).
    Q("m02_media_features",
      (s, dir) => {
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        Multimodal.extractFeatures(s, media).toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"), col("digest"),
            col("brightness")) // decoder emits exact-6dp HALF_UP ppm
          .orderBy(col("media_id"))
      },
      Some(s"""SELECT doc_id AS media_id, 'image' AS kind,
             |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             |  md5(text) AS digest,
             |  CASE WHEN len(text) > 0 THEN
             |    ${graft.functions.TextFunctions.ratio6Sql(
                 "CAST(list_sum(list_transform(generate_series(1, " +
                 "len(text)), i -> ascii(substr(text, i, 1)))) AS BIGINT)",
                 "len(text)")}
             |    ELSE 0.0 END AS brightness
             |FROM documents ORDER BY media_id""".stripMargin)),

    // ----------------------------------------------------------------
    // m03 — the video-shaped pipeline: resize (metadata transform) +
    // evenly-spaced frame sampling. Frames here are fingerprints of byte
    // windows (the decode stub), but the plan shape is the real one: all
    // window math happens in the scan stage, only (media_id, 4 digests)
    // ever leaves it — at 100 TB the payload column is never shuffled.
    // Oracle: same windows in chars (ASCII corpus ⇒ chars ≡ bytes, the
    // precondition MultimodalSpec asserts), digest = md5 of the window.
    // The digest list is emitted '|'-joined (hex digests, separator-safe):
    // the driver's comparator sorts rows with pandas, which cannot order
    // array cells.
    Q("m03_frame_sample",
      (s, dir) => {
        val media = Multimodal.fromDocuments(
          Tables.load(s, dir, "documents"), kind = "video")
        Multimodal.sampleFrames(Multimodal.resizeMeta(media, 64, 64), 4)
          .select(
            col("media_id"),
            col("meta.kind").as("kind"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            concat_ws("|", col("frame_digests")).as("frame_digests"),
            size(array_distinct(col("frame_digests"))).as("n_distinct_frames"))
          .orderBy(col("media_id"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, len(text) AS sz,
             |    list_transform([0, 1, 2, 3], i ->
             |      md5(substr(text, (sz * i) // 4 + 1,
             |        greatest(sz // 4, 1)))) AS frame_digests
             |  FROM documents)
             |SELECT doc_id AS media_id, 'video' AS kind,
             |  64 AS width, 64 AS height,
             |  array_to_string(frame_digests, '|') AS frame_digests,
             |  CAST(len(list_distinct(frame_digests)) AS INT) AS n_distinct_frames
             |FROM f ORDER BY media_id""".stripMargin)),

    // ----------------------------------------------------------------
    // m04 — the embed-then-index cross-modal pipeline: payloads become
    // 8-dim stripe-mean embeddings IN THE SCAN STAGE (the decode-stub
    // encoder; payloads never reach a shuffle), then media-to-media ANN
    // runs over the small vectors with the same exact cosine top-k the
    // text-embedding family uses — the composition a real multimodal
    // retrieval system deploys (encoder → vector → shared index). Oracle:
    // stripe windows restated in chars (ASCII corpus ⇒ bytes ≡ chars,
    // the MultimodalSpec precondition), cosine restated as in s01.
    Q("m04_crossmodal_ann",
      (s, dir) => {
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        val emb = Multimodal.stripeEmbedding(media, 8)
        val q = emb.filter(col("media_id") % 50 === 0)
        graft.operators.Similarity
          .cosineTopK(emb, q, "media_id", "stripe_vec", k = 5)
          .orderBy(col("qid"), col("rank"))
      },
      Some("""WITH f AS (SELECT doc_id AS id, len(text) AS sz, text FROM documents),
             |st AS (SELECT id, i,
             |    substr(text, (sz * i) // 8 + 1, greatest(sz // 8, 1)) AS w
             |  FROM f, unnest(generate_series(0, 7)) u(i)),
             |mn AS (SELECT id, i,
             |    CASE WHEN len(w) > 0 THEN
             |      CAST(list_sum(list_transform(generate_series(1, len(w)),
             |        j -> ascii(substr(w, j, 1)))) AS DOUBLE) / len(w)
             |    ELSE 0.0 END AS m
             |  FROM st),
             |v AS (SELECT id, list(m ORDER BY i) AS vv FROM mn GROUP BY id),
             |q AS (SELECT id AS qid, vv AS qv FROM v WHERE id % 50 = 0),
             |scored AS (SELECT qid, c.id AS nid,
             |    list_sum(list_transform(generate_series(1, 8), k -> qv[k] * c.vv[k])) AS dot,
             |    sqrt(list_sum(list_transform(generate_series(1, 8), k -> qv[k] * qv[k]))) AS na,
             |    sqrt(list_sum(list_transform(generate_series(1, 8), k -> c.vv[k] * c.vv[k]))) AS nb,
             |    round(CASE WHEN na * nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 6) AS cos
             |  FROM q JOIN v c ON c.id <> qid),
             |r AS (SELECT qid, nid, cos,
             |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
             |  FROM scored)
             |SELECT qid, rank, nid, cos FROM r WHERE rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // m05 — perceptual-hash near-dup detection (the LAION-style image
    // dedup shape): each payload becomes a 60-bit integer-exact
    // average-hash IN THE SCAN STAGE (bit i = window i brighter than
    // the whole payload, compared by integer cross-multiply — see
    // Multimodal.aHash), then pairs within Hamming distance 11 come
    // from Dedup.hammingPairs' pigeonhole band buckets (12 bands × 5
    // bits). A perceptual hash is FIXED-width (unlike d06's text
    // simhash, whose width grows with the corpus), so the at-scale
    // guard is the hot-bucket cap: band values held by > 2000 media
    // are dropped from candidate generation (not binding at any test
    // SF — sf0.1's hottest bucket holds 501 — binding at 100×, where
    // it bounds the join; a pair only loses when ALL 12 of its bands
    // are hot). Oracle restates windows in chars (ASCII corpus ⇒
    // bytes ≡ chars, the MultimodalSpec precondition), the signature
    // as the same cross-multiplied bit sum, and candidates via the
    // same capped band buckets.
    Q("m05_phash_dedup",
      (s, dir) => {
        val media = Multimodal.fromDocuments(Tables.load(s, dir, "documents"))
        val sigs = Multimodal.aHash(media, n = 60)
          .select(col("media_id").as("id"), col("ahash").as("sig"))
        graft.operators.Dedup.hammingPairs(sigs, bits = 60, maxHamming = 11,
            maxBucket = 2000L)
          .orderBy(col("a"), col("b"))
      },
      Some(phashPairsSql)),

    // ----------------------------------------------------------------
    // m07 — STREAMING perceptual-hash NEAR-dup pairs: q108's
    // NearDupLedger fed pHash signatures instead of text simhashes
    // (the ledger is signature-source agnostic by design — any
    // (id, sig) stream rides the same band→posting store). Media
    // shards arrive in 4 micro-batches, each hashed IN its batch
    // (scan-stage aHash, payloads never re-read), probed against only
    // the state buckets its 12 band keys route to, and folded in; the
    // accumulated pair stream must equal m05's batch recompute — the
    // oracle is m05's SQL verbatim. A pHash is FIXED-width, so at
    // LAION scale the ledger's maxPosting cap (bounded work, graceful
    // recall loss on saturated bands only) replaces bits-growth as the
    // guard — not binding at any test SF, mirroring m05's 2000 cap,
    // and spec-pinned on a synthetic saturated band.
    Q("m07_stream_phash_neardup",
      (s, dir) => {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        StreamingQueries.readPairDirs(s, phashArtifacts(ss, dir))
      },
      Some(phashPairsSql),
      setup = Some((ss, dir) => { phashArtifacts(ss, dir); () })),

    // ----------------------------------------------------------------
    // m06 — STREAMING perceptual-hash LEDGER: the q91 dedup-store shape
    // on the media family. Media rows stream through the engine with
    // the 60-bit average-hash computed IN the arriving micro-batch (a
    // pure scan-stage expression — the corpus is never re-hashed), and
    // each batch folds (sig, media_id, 1) into a BucketedUpsert state
    // with the min/sum MONOID combine — keeper = min(media_id),
    // n_media = sum — so the ledger is independent of engine batching.
    // Per batch the store reads only touched sig buckets. The oracle
    // groups m05's signature restatement over the whole corpus: the
    // hash gate proves stream-maintained ledger ≡ full recompute. A
    // LAION-scale image-dedup pipeline maintains exactly this artifact
    // (new shards hash on arrival; exact-pHash dups collapse into the
    // ledger; near-dup mining — m05 — runs over ledger keys, not raw
    // media).
    Q("m06_stream_phash_ledger",
      run = (s, dir) => {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        graft.streaming.BucketedUpsert.recover(ss,
          keyCol = "sig", payloadCols = Seq("keeper_id", "n_media"),
          nBuckets = 16, stateRoot = phashLedgerArtifacts(ss, dir),
          combine = Some(m06Combine))
          .view(s).orderBy(col("sig"))
      },
      setup = Some((ss, dir) => { phashLedgerArtifacts(ss, dir); () }),
      oracle = Some(s"""WITH $sigCte
             |SELECT sig, min(id) AS keeper_id,
             |  CAST(COUNT(*) AS BIGINT) AS n_media
             |FROM sig GROUP BY 1 ORDER BY sig""".stripMargin))
  )
}
