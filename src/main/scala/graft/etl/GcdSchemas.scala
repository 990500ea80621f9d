package graft.etl

import org.apache.spark.sql.types._

/**
 * Schemas for the GCD snapshot engine.
 *
 * [[snapshot]] is the 88-field output record transcribed field-for-field
 * from the reference's Avro schema
 * (/root/reference/src/main/avro/issue_data.avsc:5-93); the Athena DDL
 * (/root/reference/src/main/athena/gcdissuesnapshot.sql:1-89) mirrors it
 * column-for-column. `snapshot` (the yyyyMMdd partition int,
 * gcdissuesnapshot.sql:90-92) is added by the sink, not part of the record.
 */
object GcdSchemas {

  private def f(name: String, t: DataType, nullable: Boolean = true) =
    StructField(name, t, nullable)

  private def sArr = ArrayType(StringType, containsNull = true)
  private def lArr = ArrayType(LongType, containsNull = true)

  /** The denormalized issue-story snapshot record (88 fields). Fields that
   * are non-null in the avsc (`unix_time`, `issue_id`, `created`, …) are
   * declared non-nullable. */
  val snapshot: StructType = StructType(Seq(
    f("unix_time", LongType, nullable = false),
    f("issue_id", LongType, nullable = false),
    f("issue_number_raw", StringType, nullable = false),
    f("issue_number", IntegerType),
    f("publication_date", IntegerType),
    f("price_raw", StringType, nullable = false),
    f("price", sArr),
    f("page_count", IntegerType),
    f("indicia_frequency", StringType),
    f("isbn", StringType),
    f("variant_name", StringType),
    f("variant_of_issue_id", LongType),
    f("barcode", StringType),
    f("title", StringType),
    f("on_sale_date", IntegerType),
    f("rating", StringType),
    f("volume_not_printed", BooleanType),
    f("editing", sArr),
    f("notes", StringType),
    f("created", IntegerType, nullable = false),
    f("modified", IntegerType, nullable = false),
    f("series_id", LongType, nullable = false),
    f("series_name", StringType),
    f("series_year_began", IntegerType),
    f("series_year_ended", IntegerType),
    f("series_is_current", BooleanType),
    f("series_country_code", StringType),
    f("series_language_code", StringType),
    f("series_has_gallery", BooleanType),
    f("series_is_comics_publication", BooleanType),
    f("series_color", StringType),
    f("series_dimensions", StringType),
    f("series_paper_stock", StringType),
    f("series_binding", sArr),
    f("series_publishing_format", StringType),
    f("series_publishing_type", StringType),
    f("series_is_singleton", BooleanType),
    f("series_created", IntegerType, nullable = false),
    f("series_modified", IntegerType, nullable = false),
    f("publisher_id", LongType, nullable = false),
    f("publisher_name", StringType),
    f("publisher_country_code", StringType),
    f("publisher_created", IntegerType, nullable = false),
    f("publisher_modified", IntegerType, nullable = false),
    f("publisher_url", StringType),
    f("indicia_publisher_id", LongType),
    f("indicia_publisher_name", StringType),
    f("indicia_publisher_country_code", StringType),
    f("indicia_publisher_parent_id", LongType),
    f("indicia_publisher_year_began", IntegerType),
    f("indicia_publisher_year_ended", IntegerType),
    f("indicia_publisher_is_surrogate", BooleanType),
    f("indicia_publisher_url", StringType),
    f("indicia_publisher_created", IntegerType),
    f("indicia_publisher_modified", IntegerType),
    f("brand_id", LongType),
    f("brand_name", StringType),
    f("brand_url", StringType),
    f("brand_created", IntegerType),
    f("brand_modified", IntegerType),
    f("story_id", LongType),
    f("story_title", StringType),
    f("story_feature", StringType),
    f("story_sequence_number", IntegerType),
    f("story_page_count", IntegerType),
    f("story_script", sArr),
    f("story_script_creator_id", lArr),
    f("story_pencils", sArr),
    f("story_pencils_creator_id", lArr),
    f("story_inks", sArr),
    f("story_inks_creator_id", lArr),
    f("story_colors", sArr),
    f("story_colors_creator_id", lArr),
    f("story_letters", sArr),
    f("story_letters_creator_id", lArr),
    f("story_editing", sArr),
    f("story_editing_creator_id", lArr),
    f("story_painting", sArr),
    f("story_painting_creator_id", lArr),
    f("story_credit_source", StringType),
    f("story_genre", sArr),
    f("story_characters", sArr),
    f("story_type", StringType),
    f("story_job_number", StringType),
    f("story_first_line", StringType),
    f("story_created", IntegerType),
    f("story_modified", IntegerType)
  ))

  /**
   * Source-table schemas (FIXTURES.md §1 — the columns the reference's SQL
   * reads, typed by how it consumes them). Needed when ingesting dumps
   * from schemaless formats (CSV): inference would mis-type nullable ints
   * and datetimes, so the contract is explicit.
   */
  val sourceSchemas: Map[String, StructType] = {
    def t(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, dt) => StructField(n, dt) })
    val ts = TimestampType
    Map(
      "gcd_issue" -> t("id" -> LongType, "number" -> StringType,
        "key_date" -> StringType, "price" -> StringType,
        "page_count" -> IntegerType, "indicia_frequency" -> StringType,
        "isbn" -> StringType, "variant_name" -> StringType,
        "variant_of_id" -> LongType, "barcode" -> StringType,
        "title" -> StringType, "on_sale_date" -> StringType,
        "rating" -> StringType, "volume_not_printed" -> IntegerType,
        "editing" -> StringType, "notes" -> StringType, "created" -> ts,
        "modified" -> ts, "series_id" -> LongType,
        "indicia_publisher_id" -> LongType, "brand_id" -> LongType),
      "gcd_series" -> t("id" -> LongType, "name" -> StringType,
        "year_began" -> IntegerType, "year_ended" -> IntegerType,
        "is_current" -> IntegerType, "country_id" -> IntegerType,
        "language_id" -> IntegerType, "has_gallery" -> IntegerType,
        "is_comics_publication" -> IntegerType, "color" -> StringType,
        "dimensions" -> StringType, "paper_stock" -> StringType,
        "binding" -> StringType, "publishing_format" -> StringType,
        "publication_type_id" -> IntegerType, "is_singleton" -> IntegerType,
        "created" -> ts, "modified" -> ts, "publisher_id" -> LongType),
      "gcd_publisher" -> t("id" -> LongType, "name" -> StringType,
        "country_id" -> IntegerType, "url" -> StringType, "created" -> ts,
        "modified" -> ts),
      "gcd_indicia_publisher" -> t("id" -> LongType, "name" -> StringType,
        "country_id" -> IntegerType, "parent_id" -> LongType,
        "year_began" -> IntegerType, "year_ended" -> IntegerType,
        "is_surrogate" -> IntegerType, "url" -> StringType, "created" -> ts,
        "modified" -> ts),
      "gcd_brand" -> t("id" -> LongType, "name" -> StringType,
        "url" -> StringType, "created" -> ts, "modified" -> ts),
      "gcd_story" -> t("id" -> LongType, "issue_id" -> LongType,
        "title" -> StringType, "feature" -> StringType,
        "sequence_number" -> IntegerType, "page_count" -> IntegerType,
        "script" -> StringType, "pencils" -> StringType,
        "inks" -> StringType, "colors" -> StringType,
        "letters" -> StringType, "editing" -> StringType,
        "genre" -> StringType, "characters" -> StringType,
        "type_id" -> IntegerType, "job_number" -> StringType,
        "first_line" -> StringType, "created" -> ts, "modified" -> ts),
      "gcd_story_credit" -> t("story_id" -> LongType,
        "credit_type_id" -> IntegerType, "creator_id" -> LongType),
      "gcd_creator_name_detail" -> t("id" -> LongType,
        "creator_id" -> LongType),
      "gcd_creator" -> t("id" -> LongType,
        "gcd_official_name" -> StringType),
      "stddata_country" -> t("id" -> IntegerType, "code" -> StringType),
      "stddata_language" -> t("id" -> IntegerType, "code" -> StringType),
      "gcd_series_publication_type" -> t("id" -> IntegerType,
        "name" -> StringType),
      "gcd_story_type" -> t("id" -> IntegerType, "name" -> StringType))
  }

  /** Capability flags adapting to older GCD dump versions
   * (GcdSchema.java:8-59): absent columns/tables are pruned from the plan
   * and their output fields stay null. */
  final case class GcdFlags(
      publicationType: Boolean = true,
      volumeNotPrinted: Boolean = true,
      seriesIsSingleton: Boolean = true,
      storyFirstLine: Boolean = true,
      storyCredit: Boolean = true)
}
