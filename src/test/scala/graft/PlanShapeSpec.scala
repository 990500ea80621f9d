package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-shape regression guard: the scale-critical queries were graded on
 * the SHAPE of their physical plans (bucketed self-joins instead of
 * all-pairs, broadcast dictionaries, pushed-down scans). A refactor that
 * silently flips one of these to a cartesian product or an un-pushed scan
 * would still pass every value-level oracle at test scale — this spec
 * fails it instead.
 */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String, dir: String = sf("sf0.001")): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** Queries whose pair/candidate generation must stay key-bucketed:
   * a cartesian or nested-loop join here is the O(n²) scale cliff. */
  private val bucketedPairQueries = Seq(
    "d02_dedup_minhash_lsh", "d03_dedup_simhash", "d04_dedup_ngram_jaccard",
    "d05_dedup_embedding", "d06_dedup_simhash_hamming", "s02_ann_lsh",
    "p01_curation_pipeline", "q29_snapshot_diff", "q33_range_join",
    "d11_dedup_containment", "t15_passage_dedup", "k02_index_search",
    "m05_phash_dedup", "q76_kcore")

  test("no cartesian/nested-loop joins in the bucketed scale paths") {
    bucketedPairQueries.foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q plan regressed to CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q plan regressed to BroadcastNestedLoopJoin")
    }
  }

  test("scan pushdown: filter and projection reach the parquet reader") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
    // projection pruning: the 16-column lineitem scan reads only what q01
    // selects (5 output cols + the filter col)
    val readSchema = p.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    val nCols = "l_[a-z]+".r.findAllIn(readSchema).toSeq.distinct.size
    assert(nCols == 6, s"expected 6 pruned columns, scan reads: $readSchema")
  }

  test("dimension joins broadcast; the fact side never shuffles for them") {
    val p = plan("q06_dict_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p")
    val g = plan("g01_gcd_snapshot")
    assert(g.contains("BroadcastHashJoin"),
      "snapshot dictionary joins should broadcast")
  }

  test("ANN LSH keeps the bounded-heap partial aggregate before exchange") {
    // the heap aggregate (partial top-k) must appear under a partial
    // HashAggregate so the shuffle carries O(queries×k), not all scores
    val p = plan("s02_ann_lsh")
    assert(p.contains("partial_topk_pairs"),
      s"bounded-heap partial aggregate missing from s02 plan:\n$p")
  }

  test("exact dedup carries one shuffle on the fingerprint") {
    val p = plan("d01_dedup_exact")
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nShuffles <= 2, s"d01 should shuffle once (+1 for ordering): $p")
  }

  test("semantic dedup: pair join is cluster-keyed, never a cartesian") {
    // the centroid assignment legitimately uses a bounded
    // BroadcastNestedLoopJoin (every vector × the capped centroid set —
    // same shape as the IVF family); the PAIR join must be an equi-join
    // on the cluster key, and nothing may be a true cartesian
    val p = plan("d10_semantic_dedup")
    assert(!p.contains("CartesianProduct"),
      s"d10 plan regressed to CartesianProduct:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"d10 pair join should be an equi-join on cid:\n$p")
  }

  test("PQ family: codebook and LUT broadcast, ranking via partial heap") {
    Seq("s09_ann_pq", "s10_ann_ivfpq", "s11_ann_ivfsq8").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q codebook/LUT joins should broadcast:\n$p")
      assert(p.contains("partial_topk_pairs"),
        s"$q ranking should use the bounded-heap partial aggregate:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"$q plan regressed to CartesianProduct")
    }
  }

  test("relational top-k keeps the partial heap aggregate before exchange") {
    // q45 must map-side-reduce each group to <= k pairs, never shuffle +
    // window-sort the full lineitem like its q12/oracle formulation
    val p = plan("q45_topk_partial_agg")
    assert(p.contains("partial_topk_pairs"),
      s"bounded-heap partial aggregate missing from q45 plan:\n$p")
    assert(!p.contains("Window"), s"q45 regressed to a window sort:\n$p")
  }

  test("q68 binning: rank windows are cell-grid-keyed, never whole-type") {
    // the scale cliff this pins against: ntile()/row_number() windowed by
    // event_type alone (~5 distinct values) sorts ~N/5 of all events in
    // ONE task; the two-pass decomposition must keep every per-row rank
    // window keyed by the 256-cell value grid
    val p = plan("q68_quantile_binning")
    assert(!p.contains("ntile"), s"q68 regressed to a whole-type NTILE:\n$p")
    val rankLines = p.linesIterator
      .filter(_.contains("row_number()")).toSeq
    assert(rankLines.nonEmpty, s"q68 lost its rank window:\n$p")
    assert(rankLines.forall(_.contains("__cell")),
      s"q68 rank window not keyed by the value-cell grid:\n${rankLines.mkString("\n")}")
  }

  test("q27 percentiles: no unbounded value-map aggregate, rank windows cell-keyed") {
    // the scale cliff this pins against: Spark's percentile() buffers a
    // per-group map of every distinct value — unbounded aggregation
    // state on a continuous domain. The grid-rank decomposition must
    // keep the plan free of it, and every row-ranking window keyed by
    // the value-cell grid (never the group key alone)
    val p = plan("q27_exact_percentiles")
    assert(!p.contains("percentile("),
      s"q27 regressed to the unbounded percentile() aggregate:\n$p")
    val rankLines = p.linesIterator
      .filter(_.contains("row_number()")).toSeq
    assert(rankLines.nonEmpty, s"q27 lost its grid rank window:\n$p")
    assert(rankLines.forall(_.contains("__cell")),
      s"q27 rank window not keyed by the value-cell grid:\n${rankLines.mkString("\n")}")
  }

  test("q46 window suite: no window partitions on o_orderpriority alone") {
    // the scale cliff this pins against: any of the six window functions
    // evaluated over PARTITION BY o_orderpriority (~5 distinct values)
    // sorts ~N/5 of all orders in ONE task. The cell-grid decomposition
    // must keep every window spec that mentions the priority key ALSO
    // keyed (or ordered, for the tiny-histogram windows) by the 256-cell
    // value grid — and the native ntile/percent_rank/cume_dist calls
    // must be gone entirely.
    val p = plan("q46_window_suite")
    Seq("ntile", "percent_rank", "cume_dist").foreach { fn =>
      assert(!p.contains(fn), s"q46 regressed to a whole-priority $fn:\n$p")
    }
    val specs = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty, s"q46 lost its windows:\n$p")
    // the hazard is a RAW-ROW window (one that sorts by o_totalprice)
    // partitioned by the priority key without the grid; the per-
    // (priority)-only windows over the ~1,280-row histogram (offsets,
    // totals, boundary lag/lead ordered by __cell) are the point of the
    // decomposition and are fine
    val bad = specs.filter(l =>
      l.contains("o_orderpriority") && l.contains("o_totalprice ASC") &&
        !l.contains("__cell"))
    assert(bad.isEmpty,
      s"q46 raw-row window partitions on o_orderpriority without the " +
        s"cell grid:\n${bad.mkString("\n")}")
  }

  test("q71 triangles: wedge and closing joins are equi-joins, no cartesian") {
    // the degree-ordered orientation only bounds work if the wedge
    // self-join stays keyed on the center node and the closing probe is
    // an equi-join on (a, b) — a cartesian/nested-loop here is the hub
    // explosion the orientation exists to prevent
    val p = plan("q71_triangle_count")
    assert(!p.contains("CartesianProduct"),
      s"q71 plan regressed to CartesianProduct:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q71 plan regressed to BroadcastNestedLoopJoin:\n$p")
    assert(p.contains("LeftSemi"),
      s"q71 closing-edge probe should be a left-semi join:\n$p")
  }

  test("q72 basket pairs: a-priori semi-join prunes before the expansion") {
    // the frequent-item prune must hit the basket table as a semi-join
    // BEFORE the quadratic self-join. The count joins are deliberately
    // NOT force-broadcast (a support-pruned vocabulary over 100 TB of
    // baskets can still be millions of rows — AQE broadcasts at runtime
    // when the actual size allows); statically they must still be keyed
    // equi-joins. The only nested-loop allowed is the one-row
    // basket-count broadcast.
    val p = plan("q72_basket_pairs")
    assert(!p.contains("CartesianProduct"),
      s"q72 plan regressed to CartesianProduct:\n$p")
    assert(p.contains("LeftSemi"),
      s"q72 lost the a-priori semi-join prune:\n$p")
    // exactly one BroadcastNestedLoopJoin NODE: the one-row n_baskets
    // cross join — the pair expansion and count joins must all be
    // equi-joins (formatted explain names each node twice, tree +
    // detail, so count detail headers only)
    val bnlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 1,
      s"q72 grew a nested-loop join beyond the one-row count broadcast:\n$p")
  }

  test("explode of computed arrays stays outer (no size>0 re-materialization)") {
    // the non-outer explode adds an implicit size>0 predicate that inlines
    // the whole array expression again in a pushed-down filter (t13 was 5x
    // slower); Generate nodes over computed shingle/token arrays must not
    // carry that filter shape
    Seq("t13_cdc_chunking", "d04_dedup_ngram_jaccard", "t04_top_bigrams")
      .foreach { q =>
        val p = plan(q)
        // the degenerate shape is size()/isnotnull() OVER THE SHINGLE
        // TRANSFORM itself (a plain size() over the token split is the
        // legitimate n_tokens filter and is fine)
        assert(!p.contains("size(CASE WHEN (size(") &&
            !p.contains("isnotnull(transform("),
          s"$q filter re-materializes a computed array via implicit size>0:\n$p")
      }
  }
}
