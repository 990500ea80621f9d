package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, us, id, attr) change log: key 1 changes a→b→b→a; key 2 stays c
  private lazy val log = Seq(
    (1L, 100L, 1L, "a"), (1L, 200L, 2L, "b"), (1L, 300L, 3L, "b"),
    (1L, 400L, 4L, "a"), (2L, 150L, 5L, "c"), (2L, 250L, 6L, "c")
  ).toDF("k", "us", "id", "attr")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select($"k", $"ver", $"attr", $"valid_from_us", $"valid_to_us",
        $"n_events", $"is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSet

  test("build: versions open only on change, intervals chain, one current") {
    val got = rows(Scd2.build(log, "k", "attr", "us", "id"))
    assert(got == Set(
      (1L, 1L, "a", 100L, Some(200L), 1L, false),
      (1L, 2L, "b", 200L, Some(400L), 2L, false),
      (1L, 3L, "a", 400L, None, 1L, true),
      (2L, 1L, "c", 150L, None, 2L, true)))
  }

  test("maintain == full rebuild, and untouched keys carry over verbatim") {
    val base = log.filter($"us" < 250L)
    val batch = log.filter($"us" >= 250L) // touches keys 1 and 2
    val baseScd = Scd2.build(base, "k", "attr", "us", "id")
    val inc = rows(Scd2.maintain(baseScd, base, batch, "k", "attr",
      "us", "id"))
    val full = rows(Scd2.build(log, "k", "attr", "us", "id"))
    assert(inc == full)

    // batch touching ONLY key 1: key 2's rows must be the base rows
    val b1 = log.filter($"us" >= 250L && $"k" === 1L)
    val inc1 = Scd2.maintain(baseScd, base, b1, "k", "attr", "us", "id")
    val key2base = rows(baseScd.filter($"k" === 2L))
    val key2inc = rows(inc1.filter($"k" === 2L))
    assert(key2inc == key2base)
  }

  test("maintain with an empty batch is the identity") {
    val baseScd = Scd2.build(log, "k", "attr", "us", "id")
    val empty = log.filter(lit(false))
    assert(rows(Scd2.maintain(baseScd, log, empty, "k", "attr", "us",
      "id")) == rows(baseScd))
  }
}
