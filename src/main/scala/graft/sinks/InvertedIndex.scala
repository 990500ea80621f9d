package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/**
 * Optional K2-parity sink (SURVEY.md §2.5): the reference packages a
 * Flamdex inverted index (multi-valued int/string term bags per doc,
 * reference Main.java:107-112, 249-358) for Imhotep. Spark SQL over the
 * snapshot replaces that query layer (A4), but when an index ARTIFACT is
 * wanted, this sink emits the same information Spark-style: a sorted,
 * field-partitioned parquet posting list
 * `(field, term_str, term_int, doc_id)`.
 *
 * Scale shape: one explode per indexed field (map-side), a single
 * repartition on (field) with in-partition sort by term — the
 * log-structured merge of the reference's SimpleFlamdexDocWriter
 * (docBufferSize/mergeFactor) becomes Spark's external sort + parquet
 * row-group layout for free.
 */
object InvertedIndex {

  /**
   * Build posting rows from a document table.
   * String-array fields fan out one row per element; scalar string fields
   * index their value; long/int fields land in `term_int`.
   *
   * Contract note: NULL elements INSIDE a string array produce no posting
   * row (the explode_outer + isNotNull pair below drops them) — a null
   * term is unsearchable, so indexing it would only bloat the postings.
   * This intentionally differs from a plain `explode`, which would emit a
   * null-term row per null element; tokenizer output never contains
   * nulls, but arbitrary string-array fields might.
   */
  def postings(df: DataFrame, docIdCol: String, fields: Seq[String]): DataFrame = {
    val parts = fields.map { f =>
      df.schema(f).dataType match {
        case ArrayType(StringType, _) =>
          // explode_outer + null filter, NOT explode: the non-outer form
          // adds an implicit size(arr)>0 predicate that Catalyst pushes
          // below the projection, re-materializing a COMPUTED array
          // expression (e.g. a tokenization) once more per row
          df.select(lit(f).as("field"),
            explode_outer(col(f)).as("term_str"),
            lit(null).cast(LongType).as("term_int"),
            col(docIdCol).cast(LongType).as("doc_id"))
            .filter(col("term_str").isNotNull)
        case StringType =>
          df.filter(col(f).isNotNull)
            .select(lit(f).as("field"), col(f).as("term_str"),
              lit(null).cast(LongType).as("term_int"),
              col(docIdCol).cast(LongType).as("doc_id"))
        case _ =>
          df.filter(col(f).isNotNull)
            .select(lit(f).as("field"),
              lit(null).cast(StringType).as("term_str"),
              col(f).cast(LongType).as("term_int"),
              col(docIdCol).cast(LongType).as("doc_id"))
      }
    }
    parts.reduce(_ unionByName _)
  }

  /** Write the index: partition dirs per field, postings sorted by term
   * within files (so a term lookup reads one partition dir and benefits
   * from parquet min/max row-group pruning on the term columns). */
  def write(df: DataFrame, docIdCol: String, fields: Seq[String],
      path: String): Unit =
    writePostings(postings(df, docIdCol, fields), path)

  /** Write PRE-BUILT posting rows in the [[write]] layout — the path a
   * generation compaction takes: read N term-sorted generation
   * artifacts, re-sort once, lay out a single merged artifact (the
   * LSM/Lucene segment merge as one Spark job). */
  def writePostings(p: DataFrame, path: String): Unit =
    p
      // Range-partition on (field, term): `repartition(field)` alone puts
      // each field on ONE reducer (13 fields → 13 write tasks no matter the
      // data size); range keys keep the field-dir layout while spreading a
      // large field's terms across many tasks.
      .repartitionByRange(col("field"), col("term_str"), col("term_int"))
      .sortWithinPartitions(col("field"), col("term_str"), col("term_int"),
        col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("field")
      .option("compression", "snappy")
      .parquet(path)

  /** The snapshot fields the reference's Flamdex index serves to Imhotep
   * (string dims, multi-valued credits/genres, date ints — the fields
   * extractDataToFlamdex emits, reference Main.java:249-352). */
  val snapshotIndexFields: Seq[String] = Seq(
    "publisher_name", "series_name", "series_country_code",
    "series_language_code", "story_type", "story_genre",
    "story_characters", "story_script", "story_pencils",
    "publication_date", "on_sale_date", "issue_id", "series_id")

  /** Index a built snapshot with the reference's field set. */
  def writeSnapshotIndex(snapshot: DataFrame, path: String): Unit =
    write(snapshot, "issue_id", snapshotIndexFields, path)

  /** Term lookup against a written index (partition-pruned scan). */
  def lookup(spark: SparkSession, path: String, field: String,
      term: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("field") === field && col("term_str") === term)
      .select(col("doc_id"))
}
