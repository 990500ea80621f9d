package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column support: image/audio/video as opaque `binary` payloads
 * with typed metadata, plus the Spark-side plumbing for decode /
 * feature-extract / frame-sample stages.
 *
 * The decode step itself is a STUB (this container has no image/audio
 * codecs): [[FakeDecoder]] derives deterministic pseudo-features from the
 * payload bytes. Everything around it — the schema contract, the typed
 * Dataset boundary, iterator-to-iterator `mapPartitions` batching (decoder
 * state initialized once per partition, the same shape a Pandas-UDF batch
 * or a JNI codec handle needs), and partition sizing — is real and tested.
 *
 * Scale notes: payloads never pass through a shuffle here — features are
 * extracted in the scan stage and the (small) feature columns are what
 * flows downstream. For 100 TB of media that's the difference between
 * shuffling terabytes of pixels and shuffling kilobytes of features.
 */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  /** Decoded feature record (what a real image/audio decoder would emit). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      digest: String, brightness: Double, features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sampleRate", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false))),
      nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /**
   * Deterministic stand-in decoder. A real deployment swaps this object
   * for a codec (JNI / Pandas UDF); the call sites don't change.
   */
  object FakeDecoder {
    /** Per-partition "session" — models expensive decoder init. */
    def open(): FakeDecoder = new FakeDecoder
  }
  final class FakeDecoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(row: MediaRow): MediaFeatures = {
      md.reset()
      val digest = md.digest(row.payload).map("%02x".format(_)).mkString
      // mean byte value at exact-6dp HALF_UP ppm (integer arithmetic):
      // sum/len is a ratio of integers, which can land on dyadic 6dp
      // halves where engine round() half-modes differ — the same
      // portable-rounding rule the SQL gates follow (TextFunctions.ratio6)
      val bright =
        if (row.payload.isEmpty) 0.0
        else graft.functions.TextFunctions.ppmHalfUp(
          row.payload.map(b => (b & 0xff).toLong).sum,
          row.payload.length.toLong).toDouble / 1000000.0
      val feats = digest.grouped(8).take(4)
        .map(h => (java.lang.Long.parseLong(h, 16).toFloat / 0xffffffffL))
        .toArray
      MediaFeatures(row.media_id, row.meta.kind, row.payload.length, digest,
        bright, feats)
    }
  }

  /** Wrap a text table as a media table (payload = utf-8 bytes) — the
   * deterministic fixture source for the plumbing tests and queries. */
  def fromDocuments(docs: DataFrame, kind: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        lit(kind).as("kind"),
        length(col("text")).cast(IntegerType).as("width"),
        lit(1).as("height"),
        lit(16000).as("sampleRate"),
        (length(col("text")) * 10L).as("durationMs")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))

  /**
   * The decode / feature-extract stage: typed Dataset in, typed Dataset
   * out, one decoder per partition, streaming iterator (never materializes
   * a partition in memory).
   */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val decoder = FakeDecoder.open() // once per partition, not per row
      rows.map(decoder.decode)
    }
  }

  /**
   * Frame sampling for "video" payloads, pure expression form: split the
   * payload into `n` evenly-spaced byte windows and fingerprint each —
   * the plumbing (and plan shape) of real frame extraction, with hashes
   * standing in for decoded frames.
   */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val size = length(col("payload"))
    val frames = (0 until n).map { i =>
      // integer window math (Column./ is double division; truncate back
      // so the windows are the exact ones a SQL oracle computes with //)
      val start = (size * i / n).cast(IntegerType) + 1
      val len = greatest((size / n).cast(IntegerType), lit(1))
      // md5 of the raw window (NOT base64-wrapped: Spark's base64 is
      // MIME-chunked — 76-char lines + CRLF — which no SQL engine's
      // to_base64 reproduces)
      md5(col("payload").substr(start, len))
    }
    media.select(col("media_id"), col("meta"),
      array(frames: _*).as("frame_digests"))
  }

  /** "Resize": a pure metadata transform (real resize happens in the
   * decode stage at scale — metadata must stay consistent either way). */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      col("meta").withField("width", lit(w)).withField("height", lit(h)))

  /**
   * Perceptual average-hash (aHash) of the payload, integer-exact: the
   * payload is split into `n` evenly-spaced windows (the decode stub's
   * "downsampled pixels" — same window math as [[sampleFrames]]), and
   * bit i is set iff window i's mean byte value exceeds the mean over
   * ALL SAMPLED WINDOWS (S = Σ s_j, L = Σ l_j over the windows — for
   * payloads whose size is not a multiple of `n` the windows skip or
   * repeat a few bytes, so this is the downsampled image's mean, not
   * the raw payload's; the m05 oracle restates exactly the windowed
   * form). The mean comparison is done as the integer cross-multiply
   * `s_i·L > S·l_i` (window byte-sum × total sampled length vs total
   * sampled byte-sum × window length) so no float division ever
   * happens and any engine reproduces the signature bit-for-bit.
   *
   * `n` is capped at 60 so the bit sum stays clear of the BIGINT sign
   * bit in SQL restatements (the hash60 convention). Like all
   * perceptual hashes the width is FIXED — near-dup banding over it
   * therefore scales via the band count, not the hash width (see
   * [[graft.operators.Dedup.hammingPairs]]).
   *
   * Computed entirely in the scan stage: only (media_id, one long)
   * leaves it — the payload never reaches a shuffle.
   */
  def aHash(media: DataFrame, n: Int = 60): DataFrame = {
    require(n > 0 && n <= 60, "aHash width must be 1..60")
    val m = n - 1
    // Single pass per payload: one char-code array, window sums via
    // slice over it, then one fold assembling the bit vector. Keeping
    // the tree small (nested HOFs instead of n unrolled per-window
    // aggregates) matters: the unrolled form generated a codegen unit
    // that took ~10 s of Janino per executor and tripled per-row work.
    media
      .withColumn("__sz", length(decode(col("payload"), "UTF-8"))
        .cast("long"))
      .withColumn("__chars",
        transform(split(decode(col("payload"), "UTF-8"), ""),
          c => ascii(c).cast("long")))
      .withColumn("__sums", expr(
        s"""transform(sequence(0L, ${m}L), i ->
           |  aggregate(slice(__chars, int((__sz * i) div $n + 1),
           |      int(greatest(__sz div $n, 1L))),
           |    0L, (a, x) -> a + x))""".stripMargin))
      .withColumn("__lens", expr(
        s"""transform(sequence(0L, ${m}L), i ->
           |  greatest(least(greatest(__sz div $n, 1L),
           |    __sz - ((__sz * i) div $n + 1) + 1), 0L))""".stripMargin))
      .withColumn("__stot", expr("aggregate(__sums, 0L, (a, x) -> a + x)"))
      .withColumn("__ltot", expr("aggregate(__lens, 0L, (a, x) -> a + x)"))
      .select(col("media_id"), expr(
        s"""aggregate(sequence(0L, ${m}L), 0L, (acc, i) ->
           |  acc + IF(element_at(__sums, int(i + 1)) * __ltot >
           |           __stot * element_at(__lens, int(i + 1)),
           |    shiftleft(1L, int(i)), 0L))""".stripMargin).as("ahash"))
  }

  /**
   * Media → embedding stage, pure expression form: the payload is split
   * into `n` evenly-spaced windows (same math as [[sampleFrames]]) and
   * each becomes one embedding dimension (mean byte value — the decode
   * stub standing in for a real vision/audio encoder; the ASCII-corpus
   * precondition makes bytes ≡ chars, asserted in MultimodalSpec).
   * Output: `media_id`, `stripe_vec` array<double>. The embedding is
   * computed in the scan stage — at 100 TB the payload column never
   * reaches a shuffle, only the n-dim vector does, which is the entire
   * point of embed-then-index pipelines.
   */
  def stripeEmbedding(media: DataFrame, n: Int): DataFrame = {
    val s = decode(col("payload"), "UTF-8")
    val size = length(s)
    val stripes = (0 until n).map { i =>
      val start = (size * i / n).cast(IntegerType) + 1
      val len = greatest((size / n).cast(IntegerType), lit(1))
      val w = s.substr(start, len)
      // long accumulator: an Int fold overflows (ANSI: throws) once a
      // stripe's ascii sum passes 2^31 — a ~17 MB stripe, real at the
      // payload sizes this module claims to handle
      when(length(w) > 0,
        aggregate(transform(split(w, ""), c => ascii(c)), lit(0L),
          (a, x) => a + x).cast("double") / length(w))
        .otherwise(lit(0.0))
    }
    media.select(col("media_id"), array(stripes: _*).as("stripe_vec"))
  }
}
