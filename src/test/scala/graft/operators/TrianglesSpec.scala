package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked triangle counts for the degree-ordered orientation. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edges(e: (Long, Long)*) =
    e.toDF("src", "dst")

  private def counts(e: (Long, Long)*): Map[Long, Long] =
    Triangles.perNode(edges(e: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val c = counts((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(c === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("two triangles sharing an edge count each node's participation") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val c = counts((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(c === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("direction, duplicates and self-loops are ignored; pendant nodes absent") {
    val c = counts(
      (2L, 1L), (1L, 2L), (1L, 1L), // reversed dup + self-loop
      (1L, 3L), (3L, 2L),
      (3L, 5L)) // pendant: 5 is in no triangle
    assert(c === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph (hub, no closing edges) has no triangles") {
    val c = counts((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
    assert(c === Map.empty[Long, Long])
  }
}
