package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged") {
    val older = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val newer = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(older, newer, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("null key and null values are first-class") {
    val older = Seq((Option(1L), Option("a")), (None, Option("x")))
      .toDF("k", "s")
    val newer = Seq((Option(1L), Option.empty[String]), (None, Option("x")))
      .toDF("k", "s")
    val got = SnapshotDiff.diff(older, newer, Seq("k"))
      .collect().map(r =>
        (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    // null⟷null key matches (null-safe join), its value is unchanged;
    // value a→null is a change, not a phantom add/remove
    assert(got == Map(1L -> "changed", -1L -> "unchanged"))
  }

  test("census and the GCD snapshot diff shape") {
    val fixtures = new graft.etl.GcdSnapshotSpec {}
    val snapA = graft.etl.GcdSnapshot.build(spark, fixtures.fixtureTables,
      "2026-8-12")
    // next month's dump: one story retitled, one issue gone
    val t2 = fixtures.fixtureTables.updated("gcd_story",
      fixtures.fixtureTables("gcd_story")
        .withColumn("title", when(col("id") === 1000L, lit("S1 v2"))
          .otherwise(col("title"))))
      .updated("gcd_issue",
        fixtures.fixtureTables("gcd_issue").filter(col("id") =!= 2L))
    val snapB = graft.etl.GcdSnapshot.build(spark, t2, "2026-8-12")
    val d = SnapshotDiff.diff(snapA, snapB, Seq("issue_id", "story_id"))
    val c = SnapshotDiff.census(d).as[(String, Long)].collect().toMap
    assert(c == Map("changed" -> 1L, "removed" -> 1L, "unchanged" -> 2L))
  }
}
