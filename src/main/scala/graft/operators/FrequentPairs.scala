package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Frequent-pair mining (market-basket co-occurrence with support and
 * lift) — the first level of association-rule mining, and the shape a
 * training-data pipeline uses for co-occurrence statistics (tag
 * pairs, domain pairs, creator co-credit pairs — cf. the reference's
 * story-credit fan-out,
 * /root/reference/src/main/java/org/gcd/etl/GcdStoryCredit.java:113-137).
 *
 * The scale hazard is the pair expansion: self-joining baskets on the
 * basket key generates Σ k_b² candidate rows, and without pruning the
 * long tail of rare items dominates that sum while contributing nothing
 * above the support threshold. The a-priori property (a pair can only
 * be frequent if both items are) lets us semi-join baskets down to
 * frequent items BEFORE the self-join, so the quadratic term only sees
 * the surviving vocabulary; the basket key itself is high-cardinality,
 * so the self-join shuffle has no skewed partition (per-basket fan-out
 * is bounded by basket size, not item popularity).
 *
 * Lift is emitted cross-engine-exactly: `pair_n·N` and `n1·n2` are
 * exact integers (both well under 2^53) and the single IEEE division
 * of two exactly-representable operands is correctly rounded on every
 * engine — the ≤3-single-op rule from SURVEY.md §11.
 */
object FrequentPairs {

  /**
   * Mine co-occurring item pairs from a basket table.
   *
   * @param baskets   (basketCol, itemCol) rows; duplicates are collapsed
   * @param minSupport keep items appearing in ≥ this many baskets
   * @param minPair    keep pairs appearing in ≥ this many baskets
   * @return (p1, p2, pair_n, n1, n2, lift) with p1 < p2, ordered by
   *         (pair_n desc, p1, p2) — a deterministic total order that
   *         does not compare floats
   */
  def mine(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minPair: Long): DataFrame = {
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("item"))
      .distinct()

    val nBaskets = b.agg(count_distinct(col("bk")).as("n_baskets"))

    val itemCounts = b.groupBy(col("item"))
      .agg(count(lit(1)).as("item_n"))
    val frequent = itemCounts.filter(col("item_n") >= minSupport)

    // A-priori prune BEFORE the quadratic expansion: only baskets'
    // frequent items enter the self-join.
    val fb = b.join(frequent.select(col("item")), Seq("item"), "left_semi")
      .select(col("bk"), col("item"))

    val pairs = fb.select(col("bk"), col("item").as("p1"))
      .join(fb.select(col("bk"), col("item").as("p2")), Seq("bk"))
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minPair)

    // The frequent-item count table is support-pruned, but "pruned" is
    // not "broadcast-sized" at every scale (an absolute floor over a
    // 100 TB basket table can leave millions of frequent items) — so
    // no forced broadcast here: the planner/AQE broadcasts when the
    // runtime size allows and shuffles on the item key otherwise. Only
    // N, one row by construction, is broadcast unconditionally.
    pairs
      .join(frequent.select(col("item").as("p1"),
        col("item_n").as("n1")), "p1")
      .join(frequent.select(col("item").as("p2"),
        col("item_n").as("n2")), "p2")
      .crossJoin(broadcast(nBaskets))
      .select(col("p1"), col("p2"), col("pair_n"), col("n1"), col("n2"),
        ((col("pair_n") * col("n_baskets")).cast("double") /
          (col("n1") * col("n2")).cast("double")).as("lift"))
      .orderBy(col("pair_n").desc, col("p1"), col("p2"))
  }
}
