package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("overlap: verbatim leak 1.0, fresh doc 0.0, partial in between") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val heldOut = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"), // verbatim copy
      (101L, "totally novel words nowhere in training corpus here"),
      // first 5-gram leaked (prefix of doc 1), rest fresh
      (102L, "alpha beta gamma delta epsilon fresh tail words"),
      (103L, "too short")                                // no 5-grams
    ).toDF("doc_id", "text")
    val got = Contamination.ngramOverlap(corpus, heldOut, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(100L) == ((3L, 3L, 1.0)))
    assert(got(101L)._2 == 0L && got(101L)._3 == 0.0)
    assert(got(102L) == ((4L, 1L, 0.25)))
    assert(!got.contains(103L)) // nothing to leak below the n-gram width
  }
}
