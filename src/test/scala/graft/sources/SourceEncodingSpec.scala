package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.SparkSpec

/**
 * The `normalizeEvents` robustness pattern generalized to the other
 * driver-controlled source tables (round-9 verdict item #4): one
 * environmental re-encoding by an upstream producer must not break a
 * single consumer. For each plausible encoding of `embeddings`
 * (float vs double vectors, 32-bit ids, 64-bit labels) and `documents`
 * (string vs raw-UTF-8-binary text, 32-bit counts), `Tables.load` must
 * yield the SAME schema and values, and a real consumer of each table
 * must run green on every encoding. Template: EventsEncodingSpec.
 */
class SourceEncodingSpec extends SparkSpec {

  private def writeVariants(): (String, String) = {
    import spark.implicits._
    val root = Scratch.dir("src_enc")

    val emb = (0L until 64L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d) * 0.25f), (i % 5).toInt)
    }.toDF("vec_id", "embedding", "label")
    emb.coalesce(1).write.parquet(s"$root/emb_float/embeddings.parquet")
    // double-precision producer + renumbered ids/labels: every value is
    // float-exact, so normalization must be value-lossless
    emb.select(col("vec_id").cast("int").as("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"),
        col("label").cast("long").as("label"))
      .coalesce(1).write.parquet(s"$root/emb_double/embeddings.parquet")

    val docs = (0L until 40L).map { i =>
      (i, s"Document $i with some text! Ünïcode £ ${i * 7}",
        if (i % 3 == 0) "en" else "de", s"src${i % 4}", 30L + i)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$root/doc_str/documents.parquet")
    docs.select(col("doc_id"),
        col("text").cast("binary").as("text"),
        col("lang").cast("binary").as("lang"),
        col("source").cast("binary").as("source"),
        col("n_chars").cast("int").as("n_chars"))
      .coalesce(1).write.parquet(s"$root/doc_bin/documents.parquet")
    (root, root)
  }

  private def sorted(df: DataFrame, key: String): Seq[String] =
    df.orderBy(col(key)).collect().map(_.toString).toSeq

  test("embeddings: float and double encodings load to identical contract") {
    val (root, _) = writeVariants()
    val a = Tables.load(spark, s"$root/emb_float", "embeddings")
    val b = Tables.load(spark, s"$root/emb_double", "embeddings")
    assert(a.schema == b.schema, s"${a.schema} vs ${b.schema}")
    assert(a.schema("embedding").dataType == ArrayType(FloatType, true) ||
      a.schema("embedding").dataType == ArrayType(FloatType, false))
    assert(a.schema("vec_id").dataType.typeName == "long")
    assert(a.schema("label").dataType.typeName == "integer")
    assert(sorted(a, "vec_id") == sorted(b, "vec_id"))
    // a real similarity-stack consumer on EACH encoding: codegen'd
    // dot-product scoring (the hot expression every ANN variant uses)
    Seq(a, b).foreach { df =>
      val q = df.filter(col("vec_id") === 0L)
        .select(col("vec_id"), col("embedding"))
      val top = graft.operators.Similarity.cosineTopK(
        df, q, "vec_id", "embedding", k = 5)
      assert(top.count() == 5)
    }
  }

  test("documents: string and binary encodings load to identical contract") {
    val (root, _) = writeVariants()
    val a = Tables.load(spark, s"$root/doc_str", "documents")
    val b = Tables.load(spark, s"$root/doc_bin", "documents")
    assert(a.schema == b.schema, s"${a.schema} vs ${b.schema}")
    assert(a.schema("text").dataType.typeName == "string")
    assert(a.schema("n_chars").dataType.typeName == "long")
    assert(sorted(a, "doc_id") == sorted(b, "doc_id"))
    // a real text-battery consumer on EACH encoding: tokenization +
    // language id + fingerprint (unicode must survive the UTF-8 decode)
    Seq(a, b).foreach { df =>
      import graft.functions.TextFunctions
      val r = df.select(
        TextFunctions.tokenCount(col("text")).as("ntok"),
        TextFunctions.langId(col("text")).as("lid"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      assert(r.filter(col("ntok") <= 0).count() == 0)
      assert(r.select("fp").distinct().count() == 40)
    }
    val fa = a.orderBy("doc_id")
      .select(graft.functions.TextFunctions.fingerprint(col("text")))
      .collect().toSeq
    val fb = b.orderBy("doc_id")
      .select(graft.functions.TextFunctions.fingerprint(col("text")))
      .collect().toSeq
    assert(fa == fb, "fingerprints diverge across text encodings")
  }

  test("an unsupported re-encoding fails loudly, not silently") {
    import spark.implicits._
    val root = Scratch.dir("src_enc_bad")
    Seq((1L, 42L)).toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$root/embeddings.parquet")
    val ex = intercept[IllegalArgumentException] {
      Tables.load(spark, root, "embeddings")
    }
    assert(ex.getMessage.contains("embedding"))
  }
}
