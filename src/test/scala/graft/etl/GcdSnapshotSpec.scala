package graft.etl

import graft.SparkSpec
import graft.etl.GcdSchemas.GcdFlags
import org.apache.spark.sql.{DataFrame, Row}
import java.sql.Timestamp

/** Golden ETL tests over the FIXTURES.md §2 edge-case rows: every branch of
 * the reference's transform loop (null story, curated vs legacy credits,
 * compound credit types, junk issue numbers, 00-dates, JDBC null→0
 * coercions, missing dictionary ids, capability flags). */
object GcdFixtures {
  case class Issue(id: Long, number: Option[String], key_date: Option[String],
      price: Option[String], page_count: Option[Int],
      indicia_frequency: Option[String], isbn: Option[String],
      variant_name: Option[String], variant_of_id: Option[Long],
      barcode: Option[String], title: Option[String],
      on_sale_date: Option[String], rating: Option[String],
      volume_not_printed: Option[Int], editing: Option[String],
      notes: Option[String], created: Option[Timestamp],
      modified: Option[Timestamp], series_id: Long,
      indicia_publisher_id: Option[Long], brand_id: Option[Long])

  case class Series(id: Long, name: Option[String], year_began: Option[Int],
      year_ended: Option[Int], is_current: Option[Int],
      country_id: Option[Int], language_id: Option[Int],
      has_gallery: Option[Int], is_comics_publication: Option[Int],
      color: Option[String], dimensions: Option[String],
      paper_stock: Option[String], binding: Option[String],
      publishing_format: Option[String], publication_type_id: Option[Int],
      is_singleton: Option[Int], created: Option[Timestamp],
      modified: Option[Timestamp], publisher_id: Long)

  case class Publisher(id: Long, name: Option[String], country_id: Option[Int],
      url: Option[String], created: Option[Timestamp],
      modified: Option[Timestamp])

  case class IndiciaPublisher(id: Long, name: Option[String],
      country_id: Option[Int], parent_id: Option[Long],
      year_began: Option[Int], year_ended: Option[Int],
      is_surrogate: Option[Int], url: Option[String],
      created: Option[Timestamp], modified: Option[Timestamp])

  case class Brand(id: Long, name: Option[String], url: Option[String],
      created: Option[Timestamp], modified: Option[Timestamp])

  case class Story(id: Long, issue_id: Long, title: Option[String],
      feature: Option[String], sequence_number: Option[Int],
      page_count: Option[Int], script: Option[String],
      pencils: Option[String], inks: Option[String], colors: Option[String],
      letters: Option[String], editing: Option[String], genre: Option[String],
      characters: Option[String], type_id: Option[Int],
      job_number: Option[String], first_line: Option[String],
      created: Option[Timestamp], modified: Option[Timestamp])

  case class StoryCredit(story_id: Long, credit_type_id: Int, creator_id: Long)
  case class NameDetail(id: Long, creator_id: Long)
  case class Creator(id: Long, gcd_official_name: String)
  case class Dict(id: Int, code: String)
  case class NameDict(id: Int, name: String)
}

class GcdSnapshotSpec extends SparkSpec {
  import spark.implicits._
  import GcdFixtures._

  // noon avoids day boundaries in any residual TZ handling
  private val ts = Timestamp.valueOf("2020-01-02 12:00:00")

  lazy val fixtureTables: Map[String, DataFrame] = Map(
    "gcd_issue" -> Seq(
      Issue(1L, Some("12"), Some("1962-00-00"),
        Some("0.10 USD; 0.12 CAD"), Some(32), Some("monthly"),
        Some("isbn-1"), Some("variant"), Some(9L), Some("bar-1"),
        Some("Issue One"), Some("1962-01-15"), Some("T"), Some(1),
        Some("Stan ; Jack"), Some("n1"), Some(ts), Some(ts), 200L,
        Some(300L), Some(400L)),
      Issue(2L, Some("Annual 1"), Some("1962"), None, None, None, None,
        None, None, None, None, None, None, None, None, None, None, None,
        201L, None, None)
    ).toDF(),
    "gcd_series" -> Seq(
      Series(200L, Some("Amazing"), Some(1960), None, Some(1), Some(10),
        Some(20), Some(0), Some(1), Some("color"), None, None,
        Some("hard ; soft"), Some("ongoing"), Some(30), Some(0), Some(ts),
        Some(ts), 100L),
      Series(201L, Some("Obscure"), None, None, None, Some(99), None, None,
        None, None, None, None, None, None, None, None, None, None, 100L)
    ).toDF(),
    "gcd_publisher" -> Seq(
      Publisher(100L, Some("Best Comics"), Some(10), Some("http://best"),
        Some(ts), Some(ts))).toDF(),
    "gcd_indicia_publisher" -> Seq(
      IndiciaPublisher(300L, Some("IndiPub"), Some(11), Some(100L),
        Some(1950), None, Some(1), None, Some(ts), Some(ts))).toDF(),
    "gcd_brand" -> Seq(
      Brand(400L, Some("BrandX"), None, Some(ts), Some(ts))).toDF(),
    "gcd_story" -> Seq(
      Story(1000L, 1L, Some("S1"), Some("F1"), Some(1), Some(10),
        Some("Legacy Writer"), None, None, None, None, None,
        Some("horror; sci-fi"), Some("; X"), Some(40), Some("J1"),
        Some("It was..."), Some(ts), Some(ts)),
      Story(1001L, 1L, Some("S2"), None, None, None, Some("A ; B"),
        Some("C"), None, Some(""), Some("L1;L2 ;"), None, None, None,
        Some(41), None, None, Some(ts), Some(ts)),
      Story(1002L, 1L, None, None, None, None, None, None, None, None,
        None, None, None, None, Some(99), None, None, None, None)
    ).toDF(),
    "gcd_story_credit" -> Seq(
      StoryCredit(1000L, 10, 500L), // compound SCRIPT_PENCILS_INKS
      StoryCredit(1000L, 4, 501L),  // COLORS
      StoryCredit(1000L, 9, 500L),  // PAINTING
      StoryCredit(1000L, 5, 502L)   // LETTERS via name variant
    ).toDF(),
    "gcd_creator_name_detail" -> Seq(
      NameDetail(500L, 600L), NameDetail(501L, 601L), NameDetail(502L, 600L)
    ).toDF(),
    "gcd_creator" -> Seq(
      Creator(600L, "Jack K"), Creator(601L, "Steve D")).toDF(),
    "stddata_country" -> Seq(Dict(10, "us"), Dict(11, "ca")).toDF(),
    "stddata_language" -> Seq(Dict(20, "en")).toDF(),
    "gcd_series_publication_type" -> Seq(NameDict(30, "magazine")).toDF(),
    "gcd_story_type" -> Seq(NameDict(40, "story"), NameDict(41, "cover")).toDF()
  )

  private lazy val snap: DataFrame =
    GcdSnapshot.build(spark, fixtureTables, "2026-8-12")

  private lazy val rows: Map[(Long, Option[Long]), Row] =
    snap.collect().map { r =>
      val sid = if (r.isNullAt(r.fieldIndex("story_id"))) None
        else Some(r.getLong(r.fieldIndex("story_id")))
      (r.getLong(r.fieldIndex("issue_id")), sid) -> r
    }.toMap

  private def get[T](r: Row, name: String): T =
    r.getAs[T](r.fieldIndex(name))
  private def strs(r: Row, name: String): List[String] =
    Option(r.getAs[collection.Seq[String]](r.fieldIndex(name)))
      .map(_.toList).orNull
  private def longs(r: Row, name: String): List[Long] =
    Option(r.getAs[collection.Seq[Long]](r.fieldIndex(name)))
      .map(_.toList).orNull

  test("schema matches the 88-field avsc transcription, in order") {
    // containsNull on array element types is a Spark planning detail the
    // avsc has no notion of — normalize it away before comparing.
    def norm(t: org.apache.spark.sql.types.DataType) = t match {
      case org.apache.spark.sql.types.ArrayType(e, _) =>
        org.apache.spark.sql.types.ArrayType(e, containsNull = true)
      case other => other
    }
    val got = snap.schema.fields.map(f => (f.name, norm(f.dataType))).toSeq
    val want = GcdSchemas.snapshot.fields
      .map(f => (f.name, norm(f.dataType))).toSeq
    assert(got == want)
  }

  test("fan-out: 3 story rows for issue 1, one null-story row for issue 2") {
    assert(snap.count() == 4)
    assert(rows.contains((1L, Some(1000L))) && rows.contains((1L, Some(1001L)))
      && rows.contains((1L, Some(1002L))) && rows.contains((2L, None)))
  }

  test("issue-level transforms: dates, lenient ints, splits, bools") {
    val r = rows((1L, Some(1000L)))
    assert(get[Int](r, "publication_date") == 19620000) // 00-date accepted
    assert(get[Int](r, "on_sale_date") == 19620115)
    assert(get[Int](r, "issue_number") == 12)
    assert(get[String](r, "issue_number_raw") == "12")
    assert(get[String](r, "price_raw") == "0.10 USD; 0.12 CAD")
    assert(strs(r, "price") == Seq("0.10 USD", "0.12 CAD"))
    assert(strs(r, "editing") == Seq("Stan", "Jack"))
    assert(get[Boolean](r, "volume_not_printed"))
    assert(get[Int](r, "created") == 20200102)
    assert(get[Long](r, "unix_time") ==
      graft.functions.Transforms.snapshotEpoch("2026-8-12"))
    assert(get[String](r, "series_country_code") == "us")
    assert(get[String](r, "series_language_code") == "en")
    assert(get[String](r, "series_publishing_type") == "magazine")
    assert(strs(r, "series_binding") == Seq("hard", "soft"))
    assert(get[String](r, "publisher_country_code") == "us")
    assert(get[String](r, "indicia_publisher_country_code") == "ca")
    assert(get[Boolean](r, "indicia_publisher_is_surrogate"))
  }

  test("null story block + JDBC null→0 coercions + missing dict ids") {
    val r = rows((2L, None))
    assert(get[Any](r, "issue_number") == null)        // "Annual 1"
    assert(get[Int](r, "publication_date") == -1)      // "1962" not full match
    assert(get[String](r, "price_raw") == "")          // avsc default
    assert(get[Any](r, "price") == null)
    assert(get[Int](r, "page_count") == 0)             // getInt(NULL) → 0
    assert(get[Long](r, "variant_of_issue_id") == 0L)
    assert(get[Long](r, "indicia_publisher_id") == 0L) // missing left join
    assert(get[Int](r, "indicia_publisher_created") == -1)
    assert(!get[Boolean](r, "volume_not_printed"))     // NULL → 0 → false
    assert(get[Int](r, "created") == -1)               // null ts → -1
    assert(get[Any](r, "series_country_code") == null) // id 99 not in dict
    assert(get[Any](r, "series_language_code") == null)
    assert(get[Any](r, "story_id") == null)
    assert(get[Any](r, "story_credit_source") == null)
    assert(get[Any](r, "story_page_count") == null)    // guarded: stays null
    assert(get[Any](r, "story_script") == null)
  }

  test("curated credits: compound expansion, variant resolution, provenance") {
    val r = rows((1L, Some(1000L)))
    assert(get[String](r, "story_credit_source") == "gcd_story_credit")
    assert(strs(r, "story_script") == Seq("Jack K"))   // from compound 10
    assert(longs(r, "story_script_creator_id") == Seq(600L))
    assert(strs(r, "story_pencils") == Seq("Jack K"))
    assert(strs(r, "story_inks") == Seq("Jack K"))
    assert(strs(r, "story_colors") == Seq("Steve D"))
    assert(longs(r, "story_colors_creator_id") == Seq(601L))
    assert(strs(r, "story_letters") == Seq("Jack K")) // variant 502 → 600
    assert(longs(r, "story_letters_creator_id") == Seq(600L))
    assert(strs(r, "story_editing") == Seq())          // absent type → empty
    assert(strs(r, "story_painting") == Seq("Jack K"))
    assert(strs(r, "story_genre") == Seq("horror", "sci-fi"))
    assert(strs(r, "story_characters") == Seq("", "X"))
    assert(get[String](r, "story_type") == "story")
    assert(get[String](r, "story_first_line") == "It was...")
  }

  test("legacy credits: semicolon split, no ids, gcd_story provenance") {
    val r = rows((1L, Some(1001L)))
    assert(get[String](r, "story_credit_source") == "gcd_story")
    assert(strs(r, "story_script") == Seq("A", "B"))
    assert(get[Any](r, "story_script_creator_id") == null)
    assert(strs(r, "story_pencils") == Seq("C"))
    assert(get[Any](r, "story_inks") == null)          // null legacy field
    assert(strs(r, "story_colors") == Seq(""))         // "" → [""]
    assert(strs(r, "story_letters") == Seq("L1", "L2")) // trailing dropped
    assert(get[Any](r, "story_painting") == null)      // no legacy painting
    assert(get[Int](r, "story_sequence_number") == 0)  // getInt(NULL) → 0
    assert(get[Int](r, "story_page_count") == 0)
    assert(get[String](r, "story_type") == "cover")
    val r2 = rows((1L, Some(1002L)))
    assert(get[Any](r2, "story_type") == null)         // type 99 not in dict
    assert(get[String](r2, "story_credit_source") == "gcd_story")
  }

  test("capability flags null out gated fields (old-dump parity)") {
    val flags = GcdFlags(publicationType = false, volumeNotPrinted = false,
      seriesIsSingleton = false, storyFirstLine = false, storyCredit = false)
    val t2 = fixtureTables -- Seq("gcd_series_publication_type")
    val df = GcdSnapshot.build(spark, t2, "2026-8-12", flags)
    assert(df.schema.fieldNames.toSeq ==
      GcdSchemas.snapshot.fieldNames.toSeq)
    val r = df.collect().find(r =>
      !r.isNullAt(r.fieldIndex("story_id")) &&
        r.getLong(r.fieldIndex("story_id")) == 1000L).get
    assert(get[Any](r, "series_publishing_type") == null)
    assert(get[Any](r, "volume_not_printed") == null)
    assert(get[Any](r, "series_is_singleton") == null)
    assert(get[Any](r, "story_first_line") == null)
    // storyCredit off → curated ignored, legacy split used
    assert(get[String](r, "story_credit_source") == "gcd_story")
    assert(strs(r, "story_script") == Seq("Legacy Writer"))
    assert(get[Any](r, "story_script_creator_id") == null)
  }

  test("fixtures and soak generator conform to the declared source schemas") {
    def conform(tables: Map[String, org.apache.spark.sql.DataFrame]): Unit =
      tables.foreach { case (name, df) =>
        val want = GcdSchemas.sourceSchemas(name)
          .fields.map(f => (f.name, f.dataType)).toSeq
        val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
        assert(got == want, s"$name: $got != $want")
      }
    conform(fixtureTables)
    conform(graft.tools.GcdSoak.synthTables(spark, 100L))
  }

  test("flag lattice: all 2^5 capability combinations build the 88-col plan") {
    val names = GcdSchemas.snapshot.fieldNames.toSeq
    for (mask <- 0 until 32) {
      val flags = GcdFlags(
        publicationType = (mask & 1) != 0,
        volumeNotPrinted = (mask & 2) != 0,
        seriesIsSingleton = (mask & 4) != 0,
        storyFirstLine = (mask & 8) != 0,
        storyCredit = (mask & 16) != 0)
      val t2 = if (flags.publicationType) fixtureTables
        else fixtureTables -- Seq("gcd_series_publication_type")
      // plan-build + analysis only — no action; every combo must produce
      // the same 88-column schema (GcdSchema.java:9-13 lattice)
      val df = GcdSnapshot.build(spark, t2, "2026-8-12", flags)
      assert(df.schema.fieldNames.toSeq == names, s"mask=$mask")
    }
  }

  test("observation metrics surface the reference's skip/progress signals") {
    val (df, obs) = GcdSnapshot.buildObserved(spark, fixtureTables, "2026-8-12")
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("n_bad_key_dates") == 1L)      // issue 2: "1962"
    assert(m("n_nonnumeric_issues") == 1L)  // issue 2: "Annual 1"
    assert(m("n_storyless_issues") == 1L)
  }

  test("mini-soak: 2k synthetic issues keep fan-out + null invariants") {
    val t = graft.tools.GcdSoak.synthTables(spark, 2000L)
    val snap2 = GcdSnapshot.build(spark, t, "2026-8-12")
    val n = snap2.count()
    assert(n == 2000L * 21 / 10 + 200)   // stories + story-less issues
    assert(snap2.select(org.apache.spark.sql.functions
      .countDistinct(org.apache.spark.sql.functions.col("issue_id")))
      .head().getLong(0) == 2000L)
  }

  test("K1 sink: snapshot=YYYYMMDD partition layout, snappy, queryable (K4)") {
    val out = java.nio.file.Files.createTempDirectory("gcd_snap").toString
    GcdSink.writeSnapshot(snap, "2026-8-12", out)
    assert(new java.io.File(s"$out/snapshot=20260812").isDirectory)
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    assert(back.schema.fieldNames.contains("snapshot"))
    GcdSink.registerTable(spark, "gcdissuesnapshot_test", out)
    val n = spark.sql(
      """SELECT publisher_name, count(*) AS n FROM gcdissuesnapshot_test
        |WHERE snapshot = 20260812 GROUP BY publisher_name""".stripMargin)
      .collect()
    assert(n.length == 1 && n(0).getLong(1) == 4L)
  }
}
