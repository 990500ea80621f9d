package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // short doc fully embedded in a long doc: containment 1.0, Jaccard low
  private val short0 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val long1 = short0 + " " +
    (1 to 40).map(i => s"filler$i").mkString(" ")
  private val other2 =
    "one two three four five six seven eight nine ten eleven twelve"

  private def docs = Seq(
    (0L, short0), (1L, long1), (2L, other2)).toDF("doc_id", "text")

  test("containment catches subset dups that Jaccard misses") {
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleWords = 3, minContainment = 0.9).collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("contained_id") == 0L)
    assert(r.getAs[Long]("container_id") == 1L)
    assert(r.getAs[Double]("containment") == 1.0)

    // the same pair is invisible to symmetric Jaccard at any usual
    // threshold: union is dominated by the long side (8 shared shingles
    // of ~48 union)
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
      shingleWords = 3, minJaccard = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("direction: contained side is always the smaller shingle set") {
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleWords = 3, minContainment = 0.1).collect()
    assert(out.nonEmpty)
    // short0 has 8 trigram shingles, long1 has 48: every emitted pair
    // involving (0, 1) must point 0 → 1
    out.filter(r => Set(r.getAs[Long]("contained_id"),
        r.getAs[Long]("container_id")) == Set(0L, 1L))
      .foreach { r =>
        assert(r.getAs[Long]("contained_id") == 0L)
      }
  }
}
