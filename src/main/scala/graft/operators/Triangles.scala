package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Triangle counting by degree-ordered edge orientation — the canonical
 * O(m^1.5)-work distributed formulation (alongside
 * [[Dedup.connectedComponents]] and [[PageRank]] it completes the graph
 * family the reference's downstream analyses would want over the
 * credit / co-occurrence graphs, cf.
 * /root/reference/src/main/java/org/gcd/etl/GcdStoryCredit.java:113-137's
 * creator co-credit structure).
 *
 * Why orientation matters at scale: the naive wedge join (adjacency
 * self-join on the center node) explodes on hubs — a node of degree d
 * produces d² wedge candidates, so one celebrity node in a 100 TB edge
 * set generates a quadratic task. Orienting every undirected edge from
 * its lower-(degree, id) endpoint to its higher one makes the edge set
 * acyclic AND bounds every out-degree by O(√m) (a node keeps only
 * neighbors of ≥ its own degree, and there can be at most 2√m of
 * those), so the wedge join is O(m^1.5) total with no skewed key — the
 * standard result from the MapReduce triangle literature.
 *
 * Each triangle {p,q,r} is counted exactly once: the (degree, id)
 * order is total, so exactly one vertex (the minimum) has oriented
 * out-edges to both others and contributes the single counted wedge.
 *
 * Plan shape: one distinct (canonicalize), one degree aggregate, two
 * key-partitioned joins to attach endpoint degrees, one self-join
 * keyed on the wedge center, one left-semi probe keyed on the closing
 * edge, one explode + final aggregate — every shuffle is keyed on a
 * high-cardinality column, nothing is collected to the driver.
 */
object Triangles {

  /**
   * Per-node triangle participation counts over an undirected graph
   * given as a (`src`, `dst`) edge list (direction, duplicates, and
   * self-loops are ignored). Returns (`id`, `n_triangles`) for every
   * node that is part of at least one triangle.
   */
  def perNode(edgesRaw: DataFrame): DataFrame =
    perNodeCanonical(GraphEdges.canonical(edgesRaw))

  /** As [[perNode]], over an ALREADY-canonical (a < b, simple) edge
   * list — the entry point for pipelines that canonicalize once via
   * [[GraphEdges.canonical]] and run several graph operators over the
   * same edge set. */
  def perNodeCanonical(canon: DataFrame): DataFrame = {
    val deg = GraphEdges.degrees(canon)

    // Orient each edge from the lower (deg, id) endpoint to the higher.
    // canon already has a < b, so the tie-break on equal degrees is a→b.
    val oriented = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

    // Wedges at the orientation-minimal vertex; (x, y) normalized to
    // numeric order so the closing probe hits the canonical edge set.
    val wedges = oriented.select(col("u"), col("v").as("x"))
      .join(oriented.select(col("u"), col("v").as("y")), "u")
      .filter(col("x") < col("y"))

    val triangles = wedges.join(canon,
      wedges("x") === canon("a") && wedges("y") === canon("b"), "left_semi")

    triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }
}
