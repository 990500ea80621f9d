package graft.plans

import graft.SparkSpec

/**
 * Pins the one Catalyst lever the repo's gated plans don't otherwise
 * exercise: STATISTICS-DRIVEN join reordering. The query below is
 * deliberately written worst-first (the fact table leads the FROM
 * clause); with catalog statistics + CBO the optimizer must rewrite the
 * join tree so the selective dimension⋈orders join runs before the fact
 * join — the decision that separates a gigabyte-scale from a
 * terabyte-scale shuffle at 100 TB. The heuristic planner (no stats) is
 * pinned as the negative control: it preserves the written order.
 */
class CboStatsSpec extends SparkSpec {

  private val sql =
    """SELECT c.c_mktsegment, count(*) AS n
      |FROM cbo_lineitem l
      |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
      |JOIN cbo_customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY c.c_mktsegment""".stripMargin

  /** Leaf-relation order of the optimized join tree (left-deep print
   * order: the first two leaves form the bottom-most join). */
  private def leafOrder(): Seq[String] = {
    val leaves = spark.sql(sql).queryExecution.optimizedPlan
      .collectLeaves().map(_.toString)
    Seq("lineitem", "orders", "customer").sortBy { t =>
      val i = leaves.indexWhere(_.contains(t))
      assert(i >= 0, s"table $t missing from plan leaves: $leaves")
      i
    }
  }

  test("column stats + CBO reorder the join tree; heuristic keeps user order") {
    CatalogStats.register(spark, sf(),
      Seq("customer", "orders", "lineitem"), prefix = "cbo_")

    // negative control: without CBO the written (fact-first) order stands
    val heuristic = leafOrder()
    assert(heuristic.head == "lineitem",
      s"heuristic planner unexpectedly reordered: $heuristic")

    // with stats + CBO the fact table must move to the TOP of the tree:
    // the bottom join is the filtered customer side against orders
    val cbo = CatalogStats.withCbo(spark)(leafOrder())
    assert(cbo.last == "lineitem",
      s"stats-driven reorder did not defer the fact join: $cbo")
    assert(cbo.toSet == Set("lineitem", "orders", "customer"))
  }

  test("analyzed tables expose rowCount and column stats to the planner") {
    CatalogStats.register(spark, sf(), Seq("orders"), prefix = "cbo_")
    // rowCount surfaces through plan.stats only under the CBO visitor
    // (the default planner reports sizeInBytes alone)
    val stats = CatalogStats.withCbo(spark)(
      spark.table("cbo_orders").queryExecution.optimizedPlan.stats)
    assert(stats.rowCount.exists(_.toLong > 0L),
      s"ANALYZE did not record a rowCount: $stats")
    val described = spark.sql(
        "DESCRIBE EXTENDED cbo_orders o_orderkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described.get("distinct_count").exists(_.toLong > 0L),
      s"column stats missing: $described")
  }
}
