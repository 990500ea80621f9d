package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Parent-pointer hierarchy flattening by POINTER DOUBLING — the third
 * iterative-graph pattern in the library (alongside
 * [[Dedup.connectedComponents]]' min-label propagation and
 * [[PageRank]]'s power iteration): each round joins the ancestor table
 * to itself, so after k rounds every node has jumped 2^k parent steps.
 * Flattening a depth-d hierarchy costs O(log d) shuffles where the
 * naive parent-at-a-time walk costs O(d) — at a 100 TB dimension with
 * million-deep chains that is the difference between 20 joins and a
 * million.
 *
 * Contract: `nodes` is (`id`, `parent`) with roots self-parented
 * (`parent == id`) and the set CLOSED under parent (every parent id
 * present as a node row). Returns (`id`, `root`, `depth`).
 */
object Hierarchy {

  def flatten(nodes: DataFrame, maxIters: Int = 6): DataFrame = {
    // state: ancestor reached so far + steps taken; roots start done
    var cur = nodes.select(col("id"),
        when(col("parent") === col("id"), col("id"))
          .otherwise(col("parent")).as("anc"),
        when(col("parent") === col("id"), lit(0L)).otherwise(lit(1L))
          .as("d"))
      .localCheckpoint(true)
    for (_ <- 1 to maxIters) {
      // jump: my new ancestor is my ancestor's ancestor, distances add.
      // A node already at its root joins the root's (anc=id, d=0) row
      // and is a fixpoint, so extra rounds are harmless no-ops.
      val jump = cur.select(col("id").as("__jid"), col("anc").as("__janc"),
        col("d").as("__jd"))
      // Frames.cp: the self-join makes inherited size stats DOUBLE
      // per doubling round — 20 rounds would be a 66M-bit sizeInBytes
      // and a stalled driver (graft.Frames)
      cur = graft.Frames.cp(cur.join(jump, cur("anc") === jump("__jid"))
        .select(col("id"), col("__janc").as("anc"),
          (col("d") + col("__jd")).as("d")))
    }
    cur.select(col("id"), col("anc").as("root"), col("d").as("depth"))
  }
}
