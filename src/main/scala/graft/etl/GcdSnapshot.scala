package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}
import graft.functions.Transforms
import GcdSchemas.GcdFlags

/**
 * The denormalizing snapshot pipeline (SURVEY.md §2/§3 E1), Spark-first:
 * instead of pushing one 83-column 5-way-join SQL string into MySQL and
 * pulling a single-threaded cursor (reference Main.java:134-216, 380-513),
 * each base table is a columnar scan and the join tree + per-row transforms
 * are one declarative plan — Catalyst broadcasts the dictionaries,
 * shuffle-joins the fan-out, and pipelines every scalar transform into
 * whole-stage codegen.
 *
 * Null semantics mirror the reference's JDBC accessors exactly:
 * `getInt`/`getLong` turn SQL NULL into 0 for "optional" numeric setters
 * (Main.java:601-617), epoch fields become -1 when ≤ 0 (Main.java:637-650),
 * strings/arrays stay null, and the entire story block is null for
 * issues with no stories (Main.java:459 guard).
 */
object GcdSnapshot {

  import Transforms._

  /** Source-table names the pipeline consumes (FIXTURES.md §1). */
  val sourceTables: Seq[String] = Seq(
    "gcd_issue", "gcd_series", "gcd_publisher", "gcd_indicia_publisher",
    "gcd_brand", "gcd_story", "gcd_story_credit", "gcd_creator_name_detail",
    "gcd_creator", "stddata_country", "stddata_language",
    "gcd_series_publication_type", "gcd_story_type")

  private def nullOf(t: org.apache.spark.sql.types.DataType): Column =
    lit(null).cast(t)

  /** getInt/getLong-on-NULL semantics: SQL NULL → 0 (Main.java:601-617). */
  private def jdbcNum(c: Column, t: org.apache.spark.sql.types.DataType): Column =
    coalesce(c, lit(0)).cast(t)

  /** 0/1-int (NULL→0) → boolean (Main.java:410-450). */
  private def jdbcBool(c: Column): Column = coalesce(c, lit(0)) === 1

  /** Timestamp column → epoch seconds → yyyyMMdd int with -1 sentinel. */
  private def ymd(ts: Column): Column = epochToYmdInt(unix_timestamp(ts))

  /**
   * Build the 88-column snapshot DataFrame for one dump.
   *
   * @param tables name → DataFrame for [[sourceTables]] (tables gated off
   *               by `flags` may be absent)
   * @param date   snapshot date "y-M-d" (CLI arg parity, Main.java:54-60)
   */
  def build(spark: SparkSession, tables: Map[String, DataFrame],
      date: String, flags: GcdFlags = GcdFlags()): DataFrame = {

    val issue = tables("gcd_issue").as("i")
    val series = tables("gcd_series").as("s")
    val publisher = tables("gcd_publisher").as("p")
    val indicia = tables("gcd_indicia_publisher").as("ip")
    val brand = tables("gcd_brand").as("b")
    val story = tables("gcd_story").as("st")

    def dict(name: String, valueCol: String): DataFrame =
      tables(name).select(col("id").cast(IntegerType).as("k"),
        col(valueCol).as("v"))

    val country = dict("stddata_country", "code")
    val language = dict("stddata_language", "code")
    val storyType = dict("gcd_story_type", "name")

    // J1-J5: the denormalizing join tree (Main.java:211-216)
    val joined = issue
      .join(series, col("i.series_id") === col("s.id"), "inner")
      .join(publisher, col("s.publisher_id") === col("p.id"), "inner")
      .join(indicia, col("i.indicia_publisher_id") === col("ip.id"), "left_outer")
      .join(brand, col("i.brand_id") === col("b.id"), "left_outer")
      .join(story, col("st.issue_id") === col("i.id"), "left_outer")

    // J6: dictionary broadcast joins (drop-if-absent ≡ left join + null,
    // Main.java:549-558); three distinct country probes need three keys.
    def dictJoin(df: DataFrame, d: DataFrame, idCol: Column,
        out: String): DataFrame =
      df.join(broadcast(d.withColumnRenamed("k", s"__k_$out")
          .withColumnRenamed("v", out)),
        idCol === col(s"__k_$out"), "left_outer")
        .drop(s"__k_$out")

    var cur = joined
    cur = dictJoin(cur, country, col("s.country_id"), "series_country_code")
    cur = dictJoin(cur, language, col("s.language_id"), "series_language_code")
    cur = dictJoin(cur, country, col("p.country_id"), "publisher_country_code")
    cur = dictJoin(cur, country, col("ip.country_id"),
      "indicia_publisher_country_code")
    cur = dictJoin(cur, storyType, col("st.type_id"), "story_type_name")
    cur =
      if (flags.publicationType)
        dictJoin(cur, dict("gcd_series_publication_type", "name"),
          col("s.publication_type_id"), "series_publishing_type_name")
      else cur.withColumn("series_publishing_type_name", nullOf(StringType))

    // J7: curated credits probe (Main.java:465-466); distributed groupBy
    // replaces the reference's all-in-heap credit map.
    cur =
      if (flags.storyCredit) {
        var credits = GcdCredits.aggregate(spark, tables("gcd_story_credit"),
          tables("gcd_creator_name_detail"), tables("gcd_creator"))
          .withColumnRenamed("story_id", "__credit_story_id")
        GcdCredits.baseStems.foreach { case (_, stem) =>
          credits = credits.withColumnRenamed(stem, s"__cr_$stem")
            .withColumnRenamed(s"${stem}_ids", s"__cr_${stem}_ids")
        }
        cur.join(credits, col("st.id") === col("__credit_story_id"),
          "left_outer")
      } else {
        var c2 = cur.withColumn("__credit_story_id", nullOf(LongType))
        GcdCredits.baseStems.foreach { case (_, stem) =>
          c2 = c2.withColumn(s"__cr_$stem",
              nullOf(org.apache.spark.sql.types.ArrayType(StringType)))
            .withColumn(s"__cr_${stem}_ids",
              nullOf(org.apache.spark.sql.types.ArrayType(LongType)))
        }
        c2
      }

    val storyExists = col("st.id").isNotNull
    val hasCurated = col("__credit_story_id").isNotNull
    /** Story-block guard: null unless the issue has a story (Main.java:459). */
    def st(c: Column): Column = when(storyExists, c)

    // T12: curated per-type arrays vs semicolon-split legacy fields
    // (Main.java:467-493); painting has no legacy source.
    def creditNames(stem: String, legacy: Option[Column]): Column =
      st(legacy match {
        case Some(l) =>
          when(hasCurated, col(s"__cr_$stem")).otherwise(semiSplit(l))
        case None => when(hasCurated, col(s"__cr_$stem"))
      })
    def creditIds(stem: String): Column =
      st(when(hasCurated, col(s"__cr_${stem}_ids")))

    val out = cur.select(
      lit(snapshotEpoch(date)).as("unix_time"),
      col("i.id").cast(LongType).as("issue_id"),
      coalesce(col("i.number"), lit("")).as("issue_number_raw"),
      lenientInt(col("i.number")).as("issue_number"),
      dateStrToYmdInt(col("i.key_date")).as("publication_date"),
      coalesce(col("i.price"), lit("")).as("price_raw"),
      semiSplit(col("i.price")).as("price"),
      jdbcNum(col("i.page_count"), IntegerType).as("page_count"),
      col("i.indicia_frequency").as("indicia_frequency"),
      col("i.isbn").as("isbn"),
      col("i.variant_name").as("variant_name"),
      jdbcNum(col("i.variant_of_id"), LongType).as("variant_of_issue_id"),
      col("i.barcode").as("barcode"),
      col("i.title").as("title"),
      dateStrToYmdInt(col("i.on_sale_date")).as("on_sale_date"),
      col("i.rating").as("rating"),
      (if (flags.volumeNotPrinted) jdbcBool(col("i.volume_not_printed"))
       else nullOf(BooleanType)).as("volume_not_printed"),
      semiSplit(col("i.editing")).as("editing"),
      col("i.notes").as("notes"),
      ymd(col("i.created")).as("created"),
      ymd(col("i.modified")).as("modified"),
      col("s.id").cast(LongType).as("series_id"),
      col("s.name").as("series_name"),
      jdbcNum(col("s.year_began"), IntegerType).as("series_year_began"),
      jdbcNum(col("s.year_ended"), IntegerType).as("series_year_ended"),
      jdbcBool(col("s.is_current")).as("series_is_current"),
      col("series_country_code"),
      col("series_language_code"),
      jdbcBool(col("s.has_gallery")).as("series_has_gallery"),
      jdbcBool(col("s.is_comics_publication"))
        .as("series_is_comics_publication"),
      col("s.color").as("series_color"),
      col("s.dimensions").as("series_dimensions"),
      col("s.paper_stock").as("series_paper_stock"),
      semiSplit(col("s.binding")).as("series_binding"),
      col("s.publishing_format").as("series_publishing_format"),
      col("series_publishing_type_name").as("series_publishing_type"),
      (if (flags.seriesIsSingleton) jdbcBool(col("s.is_singleton"))
       else nullOf(BooleanType)).as("series_is_singleton"),
      ymd(col("s.created")).as("series_created"),
      ymd(col("s.modified")).as("series_modified"),
      jdbcNum(col("p.id"), LongType).as("publisher_id"),
      col("p.name").as("publisher_name"),
      col("publisher_country_code"),
      ymd(col("p.created")).as("publisher_created"),
      ymd(col("p.modified")).as("publisher_modified"),
      col("p.url").as("publisher_url"),
      jdbcNum(col("ip.id"), LongType).as("indicia_publisher_id"),
      col("ip.name").as("indicia_publisher_name"),
      col("indicia_publisher_country_code"),
      jdbcNum(col("ip.parent_id"), LongType).as("indicia_publisher_parent_id"),
      jdbcNum(col("ip.year_began"), IntegerType)
        .as("indicia_publisher_year_began"),
      jdbcNum(col("ip.year_ended"), IntegerType)
        .as("indicia_publisher_year_ended"),
      jdbcBool(col("ip.is_surrogate")).as("indicia_publisher_is_surrogate"),
      col("ip.url").as("indicia_publisher_url"),
      ymd(col("ip.created")).as("indicia_publisher_created"),
      ymd(col("ip.modified")).as("indicia_publisher_modified"),
      jdbcNum(col("b.id"), LongType).as("brand_id"),
      col("b.name").as("brand_name"),
      col("b.url").as("brand_url"),
      ymd(col("b.created")).as("brand_created"),
      ymd(col("b.modified")).as("brand_modified"),
      st(col("st.id").cast(LongType)).as("story_id"),
      st(col("st.title")).as("story_title"),
      st(col("st.feature")).as("story_feature"),
      st(jdbcNum(col("st.sequence_number"), IntegerType))
        .as("story_sequence_number"),
      st(jdbcNum(col("st.page_count"), IntegerType)).as("story_page_count"),
      creditNames("script", Some(col("st.script"))).as("story_script"),
      creditIds("script").as("story_script_creator_id"),
      creditNames("pencils", Some(col("st.pencils"))).as("story_pencils"),
      creditIds("pencils").as("story_pencils_creator_id"),
      creditNames("inks", Some(col("st.inks"))).as("story_inks"),
      creditIds("inks").as("story_inks_creator_id"),
      creditNames("colors", Some(col("st.colors"))).as("story_colors"),
      creditIds("colors").as("story_colors_creator_id"),
      creditNames("letters", Some(col("st.letters"))).as("story_letters"),
      creditIds("letters").as("story_letters_creator_id"),
      creditNames("editing", Some(col("st.editing"))).as("story_editing"),
      creditIds("editing").as("story_editing_creator_id"),
      creditNames("painting", None).as("story_painting"),
      creditIds("painting").as("story_painting_creator_id"),
      st(creditSource(hasCurated)).as("story_credit_source"),
      st(semiSplit(col("st.genre"))).as("story_genre"),
      st(semiSplit(col("st.characters"))).as("story_characters"),
      st(col("story_type_name")).as("story_type"),
      st(col("st.job_number")).as("story_job_number"),
      (if (flags.storyFirstLine) st(col("st.first_line"))
       else nullOf(StringType)).as("story_first_line"),
      st(ymd(col("st.created"))).as("story_created"),
      st(ymd(col("st.modified"))).as("story_modified")
    )
    out
  }

  /**
   * T13/T14 parity: the reference logs-and-skips bad rows and logs
   * progress counters (Main.java:359-361, 505-512). The Spark engine
   * never drops rows (permissive casts produce nulls/-1 sentinels
   * instead); this attaches an `Observation` that surfaces the same
   * signals as metrics of the write action — row count and how many rows
   * hit each lenient-parse fallback.
   */
  def buildObserved(spark: SparkSession, tables: Map[String, DataFrame],
      date: String, flags: GcdFlags = GcdFlags())
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation("gcd_etl")
    val df = build(spark, tables, date, flags).observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col("publication_date") === YmdSentinel, 1))
        .as("n_bad_key_dates"),
      count(when(col("issue_number").isNull, 1)).as("n_nonnumeric_issues"),
      count(when(col("story_id").isNull, 1)).as("n_storyless_issues"))
    (df, obs)
  }
}
