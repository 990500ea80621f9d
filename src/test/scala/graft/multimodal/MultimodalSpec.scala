package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world"),
    (1L, "a longer document with more bytes in it"),
    (2L, "x")
  ).toDF("doc_id", "text")

  test("media schema contract: binary payload + typed metadata struct") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "meta", "payload"))
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val m = media.filter($"media_id" === 0L).select($"meta.width").as[Int].head()
    assert(m == "hello world".length)
  }

  test("feature extraction: per-partition decoder, deterministic features") {
    val media = Multimodal.fromDocuments(docs).repartition(2)
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats.size == 3)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(feats(0L).digest == expectMd5)
    assert(feats(0L).n_bytes == 11)
    // exact-6dp HALF_UP ppm (the decoder's portable-rounding contract):
    // sum("hello world" bytes) = 1116, HALF_UP(1116/11 · 10⁶) =
    // 101454545 ppm — a LITERAL pin, independent of the formula's
    // spelling, so a decoder-side arithmetic edit cannot self-confirm
    assert(feats(0L).brightness == 101.454545,
      s"brightness ${feats(0L).brightness} != 101.454545")
    assert(feats(0L).features.length == 4)
    // determinism across runs
    val again = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.digest).toMap
    assert(again == feats.view.mapValues(_.digest).toMap)
  }

  test("frame sampling: n deterministic digests per payload") {
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 4)
      .select($"media_id", $"frame_digests").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(frames.values.forall(_.size == 4))
    assert(frames(0L) != frames(1L))
    val again = Multimodal.sampleFrames(Multimodal.fromDocuments(docs), 4)
      .select($"media_id", $"frame_digests").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(again == frames)
  }

  test("documents fixture corpus is ASCII (m02 oracle precondition)") {
    // The m02 DuckDB oracle restates brightness as mean ascii-code, which
    // equals mean byte value only for ASCII text. Assert the property the
    // oracle depends on, at the SF the driver gates on.
    val d = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val nonAscii = d.filter(
      length(encode(col("text"), "UTF-8")) =!= length(col("text"))).count()
    assert(nonAscii == 0L)
  }

  test("resize is a pure metadata transform") {
    val resized = Multimodal.resizeMeta(Multimodal.fromDocuments(docs), 64, 64)
    val m = resized.select($"meta.width", $"meta.height", $"meta.kind")
      .distinct().collect()
    assert(m.length == 1 && m(0).getInt(0) == 64 && m(0).getInt(1) == 64 &&
      m(0).getString(2) == "image")
  }

  test("aHash: hand-computed signature for a half-dark/half-bright payload") {
    // 120 chars: 60×'a' (97) then 60×'z' (122). 60 windows of length 2:
    // windows 0..29 are "aa" (sum 194), 30..59 are "zz" (sum 244).
    // Overall: S = 30·194 + 30·244 = 13140, L = 120. Bit i is set iff
    // s_i·L > S·l_i: 194·120 = 23280 < 26280 (clear), 244·120 = 29280 >
    // 26280 (set) → bits 30..59 → 2^60 − 2^30.
    val d = Seq((7L, "a" * 60 + "z" * 60)).toDF("doc_id", "text")
    val h = Multimodal.aHash(Multimodal.fromDocuments(d))
      .select($"ahash").as[Long].head()
    assert(h === (1L << 60) - (1L << 30))
  }

  test("aHash pairs: identical payloads at hamming 0, one-window flips few bits") {
    val d = Seq(
      (1L, "a" * 60 + "z" * 60),
      (2L, "a" * 60 + "z" * 60), // identical
      (3L, "a" * 58 + "zz" + "z" * 60) // brightens one early window
    ).toDF("doc_id", "text")
    val sigs = Multimodal.aHash(Multimodal.fromDocuments(d))
      .select($"media_id".as("id"), $"ahash".as("sig"))
    val pairs = graft.operators.Dedup
      .hammingPairs(sigs, bits = 60, maxHamming = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 2L, 0)))
    // the near-identical doc must surface against both exact twins,
    // with a small but nonzero distance
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 3L && h > 0 })
    assert(pairs.size === 3)
  }
}
