package graft.etl

import graft.SparkSpec
import graft.queries.GcdQueries
import org.apache.spark.sql.functions._

/** Pins the committed fixture dump (the fixtures/gcd parquet files) to its
 * generator: the driver-gated g01 snapshot oracle only proves anything if
 * the checked-in bytes are what `GcdFixtureGen` says they are, and if the
 * edge block actually exercises the branches it claims to. */
class GcdFixtureSpec extends SparkSpec {

  private val dir = GcdQueries.fixturesDir

  test("committed fixture parquet ≡ generator output, table by table") {
    graft.tools.GcdFixtureGen.tables(spark).foreach { case (name, want) =>
      val got = spark.read.parquet(s"$dir/$name.parquet")
      assert(got.schema == want.schema, s"$name schema")
      assert(got.count() == want.count(), s"$name count")
      // order-free diff both ways (all columns)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"$name rows differ from generator")
    }
  }

  test("g01 snapshot hits the edge branches end-to-end") {
    val snap = GcdQueries.all.head.run(spark, "")
      .filter(col("issue_id") >= 9000000L)
      .collect().map(r => (r.getLong(r.fieldIndex("issue_id")),
        if (r.isNullAt(r.fieldIndex("story_id"))) -1L
        else r.getLong(r.fieldIndex("story_id"))) -> r).toMap

    // E1/curated story: provenance + compound expansion survived the gate.
    // Array columns surface as canonical JSON text in the gated projection
    // (GcdQueries.jsonArrays) — these assertions pin the exact rendering
    // the DuckDB oracle's to_json must also produce.
    val e1 = snap((9000001L, 9001000L))
    assert(e1.getAs[String]("story_credit_source") == "gcd_story_credit")
    assert(e1.getAs[String]("story_script") == """["Jack K"]""")
    // E2: null story block, missing dictionary, JDBC null→0
    val e2 = snap((9000002L, -1L))
    assert(e2.isNullAt(e2.fieldIndex("series_country_code")))
    assert(e2.getAs[Int]("publication_date") == -1)
    assert(e2.getAs[Long]("indicia_publisher_id") == 0L)
    // E3: dangling indicia id → left-join miss; dangling creator → legacy
    val e3 = snap((9000003L, 9001003L))
    assert(e3.getAs[Long]("indicia_publisher_id") == 0L)
    assert(e3.getAs[String]("story_credit_source") == "gcd_story")
    assert(e3.getAs[String]("story_script") == """["Fallback","Guy"]""")
    // E4: overflow issue number → null; non-calendar date kept as digits
    val e4 = snap((9000004L, -1L))
    assert(e4.isNullAt(e4.fieldIndex("issue_number")))
    assert(e4.getAs[Int]("publication_date") == 19621399)
    assert(e4.getAs[String]("price") == """[""]""")
    assert(e4.getAs[String]("editing") == "[]")
    // E5: signed number, all-zero date
    val e5 = snap((9000005L, -1L))
    assert(e5.getAs[Int]("issue_number") == -7)
    assert(e5.getAs[Int]("on_sale_date") == 0)
    assert(e5.getAs[Int]("publication_date") == -1)
  }

  test("g01 row count = synth fan-out + edge block") {
    // synth: 2000*21/10 stories + 200 story-less; edge: E1×3 + E3×1 + 3 bare
    val n = GcdQueries.all.head.run(spark, "").count()
    assert(n == 2000L * 21 / 10 + 200 + 7)
  }
}
