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
    val expectBright = "hello world".getBytes("UTF-8")
      .map(b => (b & 0xff).toDouble).sum / 11
    assert(math.abs(feats(0L).brightness - expectBright) < 1e-9)
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
}
