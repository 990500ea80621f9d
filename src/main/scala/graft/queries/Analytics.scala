package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Bucketing
import graft.sources.{Scratch, Tables}
import Exact._

/**
 * Storage-layout and query-layer analytics capabilities:
 *
 *  - q51: bucketed-table co-located join — both sides of the recurring
 *    fact-fact join written pre-hashed on the join key, so the join (and
 *    the same-key aggregation above it) runs with NO exchange;
 *  - q52: time-series gap-fill + forward-fill — per-key hourly grid with
 *    carried-forward values, the feature-engineering primitive for
 *    regularizing event streams;
 *  - q54: exact-moment statistics (variance / covariance / correlation)
 *    computed from DECIMAL power sums so every engine reproduces the
 *    same doubles — the cross-engine answer to order-dependent float
 *    aggregation;
 *  - q55: the array / higher-order-function family (transform, filter,
 *    aggregate, distinct, intersect, zip_with) over per-group collected
 *    arrays, emitted as CSV strings (the driver's comparator cannot sort
 *    array cells).
 */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Monotonic tag for q51's per-invocation bucketed table names. */
  private val q51Run = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Catalog entries + scratch roots of FINISHED q51 invocations, retired
   * lazily: the returned DataFrame is lazy (the driver executes it after
   * the body returns), so cleanup keeps the NEWEST finished generation
   * alive — a caller still holding (or re-executing) the previous
   * invocation's plan reads intact tables — and drops everything older.
   * A Verify/Bench loop is thus bounded to two live generations (the
   * kept predecessor + the one being built) instead of an ever-growing
   * catalog and temp dir; the survivors fall to [[Scratch]]'s JVM exit
   * hook. Holding a plan across TWO newer invocations, or running q51
   * concurrently, remains out of contract. */
  private val q51Dead =
    new java.util.concurrent.ConcurrentLinkedQueue[(Seq[String], String)]()

  private def q51Cleanup(s: SparkSession): Unit =
    while (q51Dead.size() > 1) {
      val (tables, base) = q51Dead.poll()
      tables.foreach(n => s.sql(s"DROP TABLE IF EXISTS $n"))
      graft.sources.Scratch.deleteNow(base)
    }

  /** The q88/q89 interaction graph: 5000 possible vertices,
   * multiplier-scrambled dst so components stay small and merges are
   * genuine. */
  def interactionEdges(part: DataFrame): DataFrame = part.select(
    (col("user_id") % 5000).as("src"),
    ((col("event_id") % 100000) * 2654435761L % 5000).as("dst"))

  /** Full-graph recompute (recursive-CTE reachability, min-id labels) —
   * shared by q88 (batch maintain) and q89 (streaming maintain): both
   * bounded paths hash-prove against the same from-scratch truth.
   * NOTE: declared BEFORE `all` — a forward reference from the
   * registry Seq would initialize to null (bitten once: Verify NPE'd
   * escaping a null oracle). */
  val incCcOracle: String =
    """WITH RECURSIVE raw AS (
      |  SELECT user_id % 5000 AS s,
      |         ((event_id % 100000) * 2654435761) % 5000 AS d
      |  FROM events),
      |e AS (SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
      |      FROM raw WHERE s <> d),
      |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
      |nodes AS (SELECT DISTINCT a AS id FROM sym),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT s2.b, r.r FROM reach r JOIN sym s2 ON s2.a = r.id)
      |SELECT id, MIN(r) AS cluster FROM reach
      |GROUP BY id ORDER BY id""".stripMargin

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // q51 — bucketed co-located join: the storage-layout answer to the
    // recurring shuffle (SURVEY.md §2.2's issue⋈story at every snapshot
    // run). Both sides land pre-hashed into 8 buckets on the join key;
    // the subsequent join reads bucket i against bucket i — no Exchange
    // in the plan (BucketingSpec pins that) — and the per-order
    // aggregation above it rides the same layout because hash(o_orderkey)
    // partitioning satisfies the (o_orderkey, o_orderstatus) clustering.
    // At 100 TB the bucket count is sized to the target scale at write
    // time and the shuffle is paid once, amortized over every later run.
    Q("q51_bucketed_join",
      (s, dir) => {
        q51Cleanup(s) // drop the previous invocation's tables + files
        val base = Scratch.dir("graft_bucketed")
        // per-invocation table names: the returned DataFrame is lazy, so
        // the tables cannot be dropped inside this body (the driver
        // executes the plan after it returns) — unique names keep
        // repeated runs in one session from racing on the catalog;
        // entries are session-scoped (in-memory catalog) and retired via
        // q51Dead at the NEXT invocation's entry
        val tag = q51Run.incrementAndGet()
        val (tblO, tblL) = (s"graft_bkt_orders_$tag", s"graft_bkt_lineitem_$tag")
        q51Dead.add((Seq(tblO, tblL), base))
        Bucketing.writeBucketed(
          t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderstatus")),
          tblO, s"$base/orders", buckets = 8,
          key = "o_orderkey", sortCols = Seq("o_orderkey"))
        Bucketing.writeBucketed(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice"),
              col("l_discount")),
          tblL, s"$base/lineitem", buckets = 8,
          key = "l_orderkey", sortCols = Seq("l_orderkey"))
        val bo = s.table(tblO)
          .filter(col("o_orderkey") % 20 === 0)
        val bl = s.table(tblL)
        bo.join(bl, col("o_orderkey") === col("l_orderkey"), "inner")
          .groupBy(col("o_orderkey"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_lines"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_orderstatus, COUNT(*) AS n_lines,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE o_orderkey % 20 = 0
              |GROUP BY o_orderkey, o_orderstatus
              |ORDER BY o_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q52 — gap-fill + forward-fill: regularize each user's event stream
    // onto an hourly grid between their first and last active hour
    // (sequence + explode — the grid is generated distributed, never on
    // the driver), left-join the actual hourly aggregates, and carry the
    // last observed value across gaps with last(ignoreNulls) over a
    // running window. One shuffle for the hourly aggregate, one window
    // pass per user — grid size is bounded by span, not corpus size.
    Q("q52_gapfill",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("user_id") < 10)
        val hourly = e
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        val span = hourly.groupBy(col("user_id"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        val grid = span.select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
            .as("h"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "h"), "left_outer")
          .select(col("user_id"),
            unix_timestamp(col("h")).as("hour_epoch"),
            coalesce(col("n"), lit(0L)).as("n"),
            last(col("sum_value"), ignoreNulls = true).over(w)
              .as("filled_sum"),
            col("n").isNull.as("is_gap"))
          .orderBy(col("user_id"), col("hour_epoch"))
      },
      Some(s"""WITH h AS (
              |  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
              |    COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
              |  FROM events WHERE user_id < 10 GROUP BY 1, 2),
              |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1
              |         FROM h GROUP BY user_id),
              |grid AS (SELECT user_id,
              |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              |  FROM span),
              |j AS (SELECT g.user_id, g.h, n, sum_value
              |      FROM grid g LEFT JOIN h ON h.user_id = g.user_id AND h.h = g.h)
              |SELECT user_id, CAST(epoch(h) AS BIGINT) AS hour_epoch,
              |  COALESCE(n, 0) AS n,
              |  last_value(sum_value IGNORE NULLS) OVER (
              |    PARTITION BY user_id ORDER BY h
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
              |  n IS NULL AS is_gap
              |FROM j ORDER BY user_id, hour_epoch""".stripMargin)),

    // ----------------------------------------------------------------
    // q54 — exact-moment statistics: var/stddev/covar/corr from EXACT
    // integer power sums. Round 5 taught the hard lesson twice over:
    // (a) the multi-op double chain (sxx - sx*sx/n)/(n-1) is NOT
    // cross-engine bit-stable (reassociation / FMA contraction / cast
    // rounding differ in final ulps), and (b) round(x, 6) cannot repair
    // it at 1e9 magnitudes, where the 6dp grid sits ~15 significant
    // digits deep — the two engines' round() algorithms themselves
    // disagree there (930580260.482368 vs …69, observed). The stable
    // contract is: every emitted moment is ONE IEEE operation chain of
    // ≤3 single correctly-rounded ops (div; mul→div; mul→sqrt→div) on
    // bit-identical inputs — single IEEE ops are deterministic, and only
    // reassociable chains are not. Inputs are made bit-identical by
    // computing the textbook numerators n·Σx²−(Σx)² etc. in scale-0
    // DECIMAL (micro-unit fixed point, S=1e6): every sum/product/
    // difference is exact integer arithmetic with NO decimal-scale
    // adjustment on either engine, then one cast to double.
    //   mean  = sx / (S·n)                        — 1 div
    //   var   = m2 / (S²·n(n-1)), m2 = n·sxx−sx²  — 1 mul + 1 div
    //   corr  = mxy / sqrt(m2x·m2y)               — S² cancels; mul,sqrt,div
    // Range check (sf0.1: n≤6e5, y≤1.05e5): Σ(yS)² ≤ 6.6e27, n·Σ(yS)²
    // ≤ 4e33 < 10^38 — inside DECIMAL(38,0)/HUGEINT. At a 100 TB run the
    // micro-scale would be lowered (S=1e2 for prices) or the group split;
    // the gate's contract is the sf0.1 envelope. StatsSpec checks the
    // moments agree with Spark's built-in var_samp/covar_samp/corr to
    // 1e-9 relative.
    Q("q54_exact_stats",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val l = t(s, dir, "lineitem")
        // exact micro-unit view: dec() (the repo's bit-equal 6dp decimal
        // cast contract) scaled to an integer, scale-0 DECIMAL(38,0)
        def fx(c: Column) = (dec(c) * lit(1000000L)).cast(DecimalType(38, 0))
        val x = fx(col("l_quantity")); val y = fx(col("l_extendedprice"))
        val sums = l.select(col("l_returnflag"), x.as("x"), y.as("y"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            sum(col("x") * col("y")).as("sxy"))
        val m2x = (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("double")
        val m2y = (col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double")
        val mxy = (col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double")
        val sn = (col("n") * 1000000L).cast("double")        // S·n, exact
        val nn1 = (col("n") * (col("n") - 1)).cast("double") // n(n-1), exact
        sums.select(col("l_returnflag"), col("n"),
            (col("sx").cast("double") / sn).as("mean_x"),
            (col("sy").cast("double") / sn).as("mean_y"),
            (m2x / (lit(1.0e12) * nn1)).as("var_x"),
            (m2y / (lit(1.0e12) * nn1)).as("var_y"),
            (mxy / (lit(1.0e12) * nn1)).as("covar_xy"),
            (mxy / sqrt(m2x * m2y)).as("corr_xy"))
          .orderBy(col("l_returnflag"))
      },
      Some {
        // HUGEINT (int128) is DuckDB's scale-0 exact integer domain; the
        // (18,6)×1e6 product runs at decimal width 26 → int128 (the
        // repo's documented width-19+ rule), and the HUGEINT cast of the
        // integral value is exact.
        def fx(e: String) =
          s"CAST(CAST($e AS DECIMAL(18,6)) * 1000000 AS HUGEINT)"
        s"""WITH f AS (
           |  SELECT l_returnflag,
           |    ${fx("l_quantity")} AS x, ${fx("l_extendedprice")} AS y
           |  FROM lineitem),
           |sums AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    SUM(x) AS sx, SUM(y) AS sy,
           |    SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
           |  FROM f GROUP BY l_returnflag)
           |SELECT l_returnflag, n,
           |  CAST(sx AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_x,
           |  CAST(sy AS DOUBLE) / CAST(n * 1000000 AS DOUBLE) AS mean_y,
           |  CAST(n*sxx - sx*sx AS DOUBLE)
           |    / (1e12 * CAST(n*(n-1) AS DOUBLE)) AS var_x,
           |  CAST(n*syy - sy*sy AS DOUBLE)
           |    / (1e12 * CAST(n*(n-1) AS DOUBLE)) AS var_y,
           |  CAST(n*sxy - sx*sy AS DOUBLE)
           |    / (1e12 * CAST(n*(n-1) AS DOUBLE)) AS covar_xy,
           |  CAST(n*sxy - sx*sy AS DOUBLE)
           |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           |           * CAST(n*syy - sy*sy AS DOUBLE)) AS corr_xy
           |FROM sums ORDER BY l_returnflag""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q55 — the array / higher-order-function family over per-group
    // collected arrays: transform, filter, aggregate (fold), distinct,
    // intersect, zip_with — all codegen-friendly builtins, no UDFs.
    // Arrays are collected with a deterministic in-array order
    // (array_sort on the linenumber key) and emitted as CSV strings
    // because the driver's comparator cannot sort array cells.
    Q("q55_array_hof",
      (s, dir) => {
        val l = t(s, dir, "lineitem").filter(col("l_orderkey") % 500 === 0)
        val arrs = l.groupBy(col("l_orderkey"))
          .agg(transform(
            array_sort(collect_list(struct(col("l_linenumber").as("k"),
              col("l_quantity").cast("int").as("v")))),
            e => e.getField("v")).as("qty"))
        arrs.select(col("l_orderkey"),
            array_join(col("qty"), ",").as("qty_csv"),
            array_join(transform(col("qty"), x => x * 2), ",")
              .as("doubled_csv"),
            array_join(filter(col("qty"), x => x > 25), ",").as("big_csv"),
            aggregate(col("qty"), lit(0L), (acc, x) => acc + x)
              .as("total_qty"),
            array_join(array_sort(array_distinct(col("qty"))), ",")
              .as("distinct_csv"),
            array_join(array_sort(array_intersect(col("qty"),
              sequence(lit(1), lit(25)))), ",").as("small_inter_csv"),
            array_join(zip_with(col("qty"), reverse(col("qty")),
              (a, b) => a + b), ",").as("palindrome_csv"),
            size(col("qty")).as("n_items"))
          .orderBy(col("l_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT l_orderkey,
             |    -- l_linenumber ties exist in the synthetic data; the value
             |    -- itself is the tiebreaker (= Spark's struct sort order)
             |    list(CAST(l_quantity AS INT) ORDER BY l_linenumber, l_quantity) AS qty
             |  FROM lineitem WHERE l_orderkey % 500 = 0 GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  array_to_string(qty, ',') AS qty_csv,
             |  array_to_string(list_transform(qty, x -> x * 2), ',') AS doubled_csv,
             |  -- COALESCE: DuckDB's array_to_string([]) is NULL where
             |  -- Spark's array_join([]) is ''
             |  COALESCE(array_to_string(list_filter(qty, x -> x > 25), ','), '') AS big_csv,
             |  CAST(list_sum(qty) AS BIGINT) AS total_qty,
             |  array_to_string(list_sort(list_distinct(qty)), ',') AS distinct_csv,
             |  COALESCE(array_to_string(list_sort(list_distinct(list_intersect(qty,
             |    generate_series(1, 25)))), ','), '') AS small_inter_csv,
             |  array_to_string(list_transform(generate_series(1, len(qty)),
             |    i -> qty[i] + qty[len(qty) - i + 1]), ',') AS palindrome_csv,
             |  CAST(len(qty) AS INT) AS n_items
             |FROM o ORDER BY l_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q57 — UNPIVOT (melt): wide per-group metrics rotated into long
    // (group, metric, value) form — the inverse of q32's pivot and the
    // standard reshape before charting/feature stores. Spark's native
    // unpivot generates the rows map-side (no shuffle beyond the
    // aggregate producing the wide table); the oracle restates it as the
    // equivalent UNION ALL.
    Q("q57_unpivot",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val wide = l.groupBy(col("l_returnflag"))
          .agg(dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_price"),
            davg(col("l_discount")).as("avg_disc"))
        wide.unpivot(
            Array(col("l_returnflag")),
            Array(col("sum_qty"), col("sum_price"), col("avg_disc")),
            "metric", "value")
          .orderBy(col("l_returnflag"), col("metric"))
      },
      Some(s"""WITH wide AS (
              |  SELECT l_returnflag,
              |    ${sqlDsum("l_quantity")} AS sum_qty,
              |    ${sqlDsum("l_extendedprice")} AS sum_price,
              |    ${sqlDavg("l_discount")} AS avg_disc
              |  FROM lineitem GROUP BY l_returnflag)
              |SELECT l_returnflag, metric, value FROM (
              |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
              |  UNION ALL
              |  SELECT l_returnflag, 'sum_price', sum_price FROM wide
              |  UNION ALL
              |  SELECT l_returnflag, 'avg_disc', avg_disc FROM wide)
              |ORDER BY l_returnflag, metric""".stripMargin)),

    // ----------------------------------------------------------------
    // q58 — the scalar string-function family (pad, translate, repeat,
    // reverse, position, case mapping, slicing) — the reference's string
    // surface (SURVEY.md §2.4: regex, split, zero-pad via format) plus
    // the rest of the everyday query-layer toolkit, restated
    // function-for-function in DuckDB. All scan-stage codegen, no UDFs.
    Q("q58_string_suite",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_custkey") % 100 === 0)
        c.select(col("c_custkey"),
            upper(col("c_mktsegment")).as("seg_upper"),
            lower(col("c_name")).as("name_lower"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
            translate(col("c_name"), "#0", "_x").as("name_translated"),
            regexp_replace(col("c_name"), "0+", "0").as("name_squeezed"),
            reverse(col("c_name")).as("name_rev"),
            repeat(substring(col("c_name"), 1, 3), 2).as("name_rep"),
            instr(col("c_name"), "#").cast("long").as("hash_pos"),
            substring(col("c_name"), -4, 4).as("name_tail"),
            concat_ws("/", col("c_mktsegment"),
              col("c_custkey").cast("string")).as("seg_key"),
            length(col("c_name")).as("name_len"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  upper(c_mktsegment) AS seg_upper,
             |  lower(c_name) AS name_lower,
             |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
             |  rpad(c_mktsegment, 12, '.') AS seg_rpad,
             |  translate(c_name, '#0', '_x') AS name_translated,
             |  regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
             |  reverse(c_name) AS name_rev,
             |  repeat(substr(c_name, 1, 3), 2) AS name_rep,
             |  CAST(instr(c_name, '#') AS BIGINT) AS hash_pos,
             |  substr(c_name, len(c_name) - 3, 4) AS name_tail,
             |  concat_ws('/', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
             |  CAST(len(c_name) AS INT) AS name_len
             |FROM customer WHERE c_custkey % 100 = 0
             |ORDER BY c_custkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q59 — explicit GROUPING SETS with grouping() flags: the general
    // form behind q18's ROLLUP and q37's CUBE, with hand-picked sets and
    // the grouping() indicator that disambiguates "NULL because
    // aggregated away" from a real NULL. One pass: Spark expands the
    // sets map-side and aggregates once. The Spark side runs AS SQL over
    // the registered table views (the engine's query layer, SURVEY.md
    // A4) — near-identical text to the DuckDB oracle.
    Q("q59_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(s"""
          |SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
          |  COALESCE(o_orderstatus, 'ALL') AS status,
          |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
          |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
          |  (c_mktsegment), (o_orderstatus), ())
          |ORDER BY seg, status""".stripMargin)
      },
      Some("""SELECT COALESCE(c_mktsegment, 'ALL') AS seg,
             |  COALESCE(o_orderstatus, 'ALL') AS status,
             |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus),
             |  (c_mktsegment), (o_orderstatus), ())
             |ORDER BY seg, status""".stripMargin)),

    // ----------------------------------------------------------------
    // q60 — schema evolution on read: two parquet batches written months
    // apart, the newer one carrying an added column; `mergeSchema=true`
    // reconciles the footers and the old batch surfaces NULLs for the
    // new column — the append-only table lifecycle every long-lived
    // dataset goes through. (Spark reads a single footer by default
    // precisely because footer-merging is an extra cost at 100k-file
    // scale — pay it explicitly, or pin the union schema in the catalog.)
    // The oracle derives the same batch split relationally.
    Q("q60_schema_evolution",
      (s, dir) => {
        val base = Scratch.dir("schema_evo")
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        o.filter(col("o_orderkey") % 2 === 0)
          .write.mode("overwrite").parquet(s"$base/b=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_channel", lit("web"))
          .write.mode("overwrite").parquet(s"$base/b=2")
        s.read.option("mergeSchema", "true").parquet(base)
          .groupBy(coalesce(col("o_channel"), lit("legacy")).as("channel"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("channel"), col("o_orderstatus"))
      },
      Some(s"""SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'web' ELSE 'legacy' END AS channel,
              |  o_orderstatus, COUNT(*) AS n,
              |  ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY 1, 2 ORDER BY channel, o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q61 — nested struct / array-of-struct round-trip: the denormalized
    // DOCUMENT shape (order header struct + array of line structs) is
    // built with collect_list(struct(...)), written as genuinely nested
    // parquet, read back, and shredded (explode + field access) into a
    // relational aggregate. Nested columnar storage is how wide-event /
    // log tables actually land; Parquet stores the struct fields as
    // separate column chunks, so the shred reads only the accessed
    // fields. The oracle computes the same aggregate from the flat
    // tables directly — round-trip + shred must be lossless.
    Q("q61_nested_shred",
      (s, dir) => {
        val base = Scratch.dir("nested_shred")
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 10 === 0)
        val l = t(s, dir, "lineitem")
        val nested = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
          .agg(array_sort(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_quantity").cast("int").as("qty")))).as("items"))
          .select(col("o_orderkey"),
            struct(col("o_orderstatus").as("status"),
              col("o_totalprice").as("total")).as("hdr"),
            col("items"))
        nested.write.mode("overwrite").parquet(base)
        val back = s.read.parquet(base)
        back.select(col("o_orderkey"), col("hdr.status").as("status"),
            explode(col("items")).as("item"))
          .groupBy(col("status"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_items"),
            sum(col("item.qty").cast("long")).as("sum_qty"),
            max(col("item.ln")).as("max_ln"))
          .orderBy(col("status"))
      },
      Some("""SELECT o_orderstatus AS status,
             |  COUNT(DISTINCT o_orderkey) AS n_orders,
             |  COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
             |  MAX(l_linenumber) AS max_ln
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey % 10 = 0
             |GROUP BY o_orderstatus ORDER BY status""".stripMargin)),

    // ----------------------------------------------------------------
    // q62 — correlated subqueries: a per-row correlated SCALAR subquery
    // (order total vs 5× its own lines' average) and a correlated EXISTS
    // — written as subqueries, executed as decorrelated joins (Catalyst's
    // RewriteCorrelatedScalarSubquery / RewritePredicateSubquery turn
    // them into an aggregate + join, which is the only shape that
    // survives 100 TB; a per-row re-execution would be O(n²) scans).
    // Identical SQL text runs on both engines; the scalar comparison
    // goes through DECIMAL so the averages agree bitwise.
    Q("q62_correlated_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(s"""
          |SELECT o_orderkey, o_orderstatus, o_totalprice
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_quantity >= 45)
          |  AND o_totalprice > 5 * (
          |    SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
          |      / COUNT(*)
          |    FROM lineitem l2 WHERE l2.l_orderkey = o.o_orderkey)
          |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |              WHERE l.l_orderkey = o.o_orderkey
             |                AND l.l_quantity >= 45)
             |  AND o_totalprice > 5 * (
             |    SELECT CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             |      / COUNT(*)
             |    FROM lineitem l2 WHERE l2.l_orderkey = o.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q63 — iterative PageRank over a deterministic interaction graph
    // (src = user, dst = event_id mod 150), five power-iteration steps
    // in exact integer fixed-point (total mass 10^12, all updates
    // integer division) — which is what lets a hash gate verify an
    // ITERATIVE distributed algorithm at all: the oracle unrolls the
    // same five steps and matches bit-for-bit, where a floating-point
    // damping loop would drift per iteration. Plan per step: one edge⋈
    // rank join keyed by src, one aggregate keyed by dst, lineage
    // truncated per iteration (the connectedComponents shape).
    Q("q63_pagerank",
      (s, dir) => {
        val e = t(s, dir, "events")
        val edges = e.select(col("user_id").as("src"),
          (col("event_id") % 150).as("dst"))
        graft.operators.PageRank.run(edges, iterations = 5)
          .orderBy(col("id"))
      },
      Some {
        def iter(k: Int): String =
          s"""r$k AS (SELECT n.id,
             |    CAST((15 * (1000000000000 // nn.c)) // 100 +
             |         (85 * COALESCE(m.in_mass, 0)) // 100 AS BIGINT) AS r
             |  FROM nodes n CROSS JOIN nn
             |  LEFT JOIN (SELECT e.dst, SUM(rp.r // od.outdeg) AS in_mass
             |             FROM e JOIN r${k - 1} rp ON rp.id = e.src
             |             JOIN od ON od.src = e.src GROUP BY e.dst) m
             |    ON m.dst = n.id)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT user_id AS src, event_id % 150 AS dst
           |           FROM events WHERE user_id <> event_id % 150),
           |nodes AS (SELECT DISTINCT src AS id FROM e
           |          UNION SELECT DISTINCT dst FROM e),
           |nn AS (SELECT COUNT(*) AS c FROM nodes),
           |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
           |r0 AS (SELECT id, CAST(1000000000000 // c AS BIGINT) AS r
           |       FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT id, r AS rank FROM r5 ORDER BY id""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q64 — PageRank with dangling-mass redistribution: the same
    // interaction graph and integer fixed-point as q63, plus the
    // textbook correction for nodes with no outgoing edges (event-only
    // ids here): their mass Dₜ is summed each step (one anti-join +
    // one-row broadcast) and every node receives Dₜ div N inside the
    // damped term, so total mass is conserved instead of leaking
    // through sinks. The oracle unrolls the same five corrected steps;
    // every quantity stays integer, so the gate matches bit-for-bit.
    Q("q64_pagerank_dangling",
      (s, dir) => {
        val e = t(s, dir, "events")
        val edges = e.select(col("user_id").as("src"),
          (col("event_id") % 150).as("dst"))
        graft.operators.PageRank.run(edges, iterations = 5,
            redistributeDangling = true)
          .orderBy(col("id"))
      },
      Some {
        def iter(k: Int): String =
          s"""d$k AS (SELECT CAST(COALESCE(SUM(rp.r), 0) AS BIGINT) AS d
             |  FROM r${k - 1} rp
             |  WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = rp.id)),
             |r$k AS (SELECT n.id,
             |    CAST((15 * (1000000000000 // nn.c)) // 100 +
             |         (85 * (COALESCE(m.in_mass, 0) + d$k.d // nn.c)) // 100
             |      AS BIGINT) AS r
             |  FROM nodes n CROSS JOIN nn CROSS JOIN d$k
             |  LEFT JOIN (SELECT e.dst, SUM(rp.r // od.outdeg) AS in_mass
             |             FROM e JOIN r${k - 1} rp ON rp.id = e.src
             |             JOIN od ON od.src = e.src GROUP BY e.dst) m
             |    ON m.dst = n.id)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT user_id AS src, event_id % 150 AS dst
           |           FROM events WHERE user_id <> event_id % 150),
           |nodes AS (SELECT DISTINCT src AS id FROM e
           |          UNION SELECT DISTINCT dst FROM e),
           |nn AS (SELECT COUNT(*) AS c FROM nodes),
           |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
           |r0 AS (SELECT id, CAST(1000000000000 // c AS BIGINT) AS r
           |       FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT id, r AS rank FROM r5 ORDER BY id""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q71 — triangle counting over the interaction graph (user_id%200,
    // event_id%200), per-node participation counts. The Spark side runs
    // the degree-ordered orientation (every out-degree bounded by O(√m),
    // so no hub explodes the wedge join — see operators/Triangles.scala);
    // the oracle restates the semantics as the naive a<b<c triple join,
    // which is fine for DuckDB at gate scale and proves the oriented
    // plan counts exactly the same triangles.
    Q("q71_triangle_count",
      (s, dir) => {
        val e = t(s, dir, "events")
        val edges = e.select((col("user_id") % 200).as("src"),
          (col("event_id") % 200).as("dst"))
        graft.operators.Triangles.perNode(edges).orderBy(col("id"))
      },
      Some("""WITH raw AS (SELECT user_id % 200 AS s, event_id % 200 AS d
             |            FROM events),
             |e AS (SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
             |      FROM raw WHERE s <> d),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM e e1
             |        JOIN e e2 ON e2.a = e1.b
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |m AS (SELECT x AS id FROM tri
             |      UNION ALL SELECT y FROM tri
             |      UNION ALL SELECT z FROM tri)
             |SELECT id, COUNT(*) AS n_triangles FROM m
             |GROUP BY id ORDER BY id""".stripMargin)),

    // ----------------------------------------------------------------
    // q72 — market-basket frequent pairs with a-priori pruning: baskets
    // are orders, items are parts; items below 35 baskets are dropped
    // BEFORE the per-basket pair expansion (the a-priori property — a
    // pair is frequent only if both items are), pairs below 2 baskets
    // after. Lift = pair_n·N / (n1·n2) as ONE double division of exact
    // integers, so it is bit-identical cross-engine; ordering never
    // compares the float. See operators/FrequentPairs.scala for the
    // scale analysis of the pruned self-join.
    Q("q72_basket_pairs",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        graft.operators.FrequentPairs.mine(
          l.select(col("l_orderkey"), col("l_partkey")),
          basketCol = "l_orderkey", itemCol = "l_partkey",
          minSupport = 35L, minPair = 2L)
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS item
             |           FROM lineitem),
             |n AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM b),
             |ic AS (SELECT item, COUNT(*) AS item_n FROM b GROUP BY item),
             |f AS (SELECT item, item_n FROM ic WHERE item_n >= 35),
             |fb AS (SELECT bk, item FROM b
             |       WHERE item IN (SELECT item FROM f)),
             |pr AS (SELECT b1.item AS p1, b2.item AS p2,
             |         CAST(COUNT(*) AS BIGINT) AS pair_n
             |       FROM fb b1 JOIN fb b2
             |         ON b1.bk = b2.bk AND b1.item < b2.item
             |       GROUP BY 1, 2 HAVING COUNT(*) >= 2)
             |SELECT p1, p2, pair_n,
             |  f1.item_n AS n1, f2.item_n AS n2,
             |  CAST(pair_n * n.n_baskets AS DOUBLE) /
             |    CAST(f1.item_n * f2.item_n AS DOUBLE) AS lift
             |FROM pr
             |JOIN f f1 ON f1.item = pr.p1
             |JOIN f f2 ON f2.item = pr.p2
             |CROSS JOIN n
             |ORDER BY pair_n DESC, p1, p2""".stripMargin)),

    // ----------------------------------------------------------------
    // q75 — hierarchy flattening by pointer doubling: the observed user
    // ids induce a binary org tree (parent = id div 2, root 0), closed
    // under parent by exploding each id's shift chain; every node gets
    // (root, depth) in O(log depth) self-joins — operators/Hierarchy's
    // pointer-jumping, the O(d)-to-O(log d) shuffle reduction — plus
    // the per-node rollup (observed users whose chain passes through
    // it). The oracle walks the same tree with a RECURSIVE CTE — the
    // O(d) formulation DuckDB can afford at gate scale — so the gate
    // hash-proves the doubled walk ≡ the step-at-a-time one.
    Q("q75_hierarchy_flatten",
      (s, dir) => {
        val e = t(s, dir, "events")
        // non-negative ids only: for v >= 0 the 63-shift chain IS the
        // div-2 ancestor chain down to root 0, so the node set is
        // closed under parent for the ENTIRE long range (flatten's
        // contract); negative ids would break that (truncating div
        // disagrees with both shiftright and DuckDB's floor //) and
        // are excluded identically on both sides
        val ids = e.select(col("user_id").as("v"))
          .filter(col("v") >= 0).distinct()
        val anc = ids.select(col("v"),
            explode(expr("transform(sequence(0, 63), i -> shiftright(v, i))"))
              .as("a"))
          .distinct()
        val nodes = anc.select(col("a").as("id")).distinct()
          .select(col("id"), expr("id div 2").as("parent"))
        val flat = graft.operators.Hierarchy.flatten(nodes, maxIters = 6)
        val rollup = anc.groupBy(col("a").as("id"))
          .agg(count(lit(1)).as("n_users"))
        flat.join(rollup, Seq("id"))
          .select(col("id"), col("root"), col("depth"), col("n_users"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE ids AS (
             |  SELECT DISTINCT user_id AS v FROM events WHERE user_id >= 0),
             |anc AS (SELECT DISTINCT v, v >> s.i AS a FROM ids,
             |  (SELECT unnest(generate_series(0, 63)) AS i) s),
             |nodes AS (SELECT DISTINCT a AS id FROM anc),
             |walk(id, anc, d) AS (
             |  SELECT id, id, 0 FROM nodes
             |  UNION ALL
             |  SELECT id, anc // 2, d + 1 FROM walk WHERE anc <> anc // 2),
             |flat AS (SELECT w.id, w.anc AS root, dd.depth
             |  FROM walk w
             |  JOIN (SELECT id, MAX(d) AS depth FROM walk GROUP BY id) dd
             |    ON dd.id = w.id AND dd.depth = w.d),
             |sub AS (SELECT a AS id, COUNT(*) AS n_users FROM anc GROUP BY a)
             |SELECT f.id, f.root, CAST(f.depth AS BIGINT) AS depth,
             |  sub.n_users
             |FROM flat f JOIN sub ON sub.id = f.id
             |ORDER BY f.id""".stripMargin)),

    // ----------------------------------------------------------------
    // q76 — k-core extraction over the co-purchase graph: parts are
    // linked when ≥2 distinct orders contain both (the per-order pair
    // expansion is bounded by order size, ~7 lines, so the quadratic
    // term never explodes), then 12 peel rounds toward the 3-core.
    // Both engines run EXACTLY 12 rounds (peeling is monotone and
    // idempotent past the fixpoint — reached in ~11 rounds at sf0.01,
    // where the cascade prunes 1880 → 935 parts), so the oracle is the
    // same function restated as unrolled CTE rounds, not a convergence
    // test. Output never compares floats; core_deg is an exact count.
    Q("q76_kcore",
      (s, dir) => {
        val lp = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
        val edges = lp.select(col("ok"), col("pk").as("src"))
          .join(lp.select(col("ok"), col("pk").as("dst")), Seq("ok"))
          .filter(col("src") < col("dst"))
          .groupBy(col("src"), col("dst"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2)
          .select(col("src"), col("dst"))
        graft.operators.KCore.peel(edges, k = 3, rounds = 12)
          .orderBy(col("id"))
      },
      Some {
        // One peel round must reference the previous round's edge set
        // exactly ONCE: DuckDB inlines CTEs, so a (v_i, s_i) join pair
        // that references s_{i-1} three times expands 3^rounds scans of
        // lineitem (531k at 12 rounds — found the hard way as "too many
        // open files"). Degree-per-endpoint as two windows over the
        // symmetric list keeps the expansion linear in the round count.
        def round(i: Int): String =
          s"""s$i AS (SELECT s, d FROM (
             |    SELECT s, d, COUNT(*) OVER (PARTITION BY s) AS cs,
             |                 COUNT(*) OVER (PARTITION BY d) AS cd
             |    FROM s${i - 1})
             |  WHERE cs >= 3 AND cd >= 3)""".stripMargin
        s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           |            FROM lineitem),
           |pw AS (SELECT l1.pk AS a, l2.pk AS b, COUNT(*) AS w
           |       FROM lp l1 JOIN lp l2
           |         ON l1.ok = l2.ok AND l1.pk < l2.pk
           |       GROUP BY 1, 2),
           |e AS (SELECT a, b FROM pw WHERE w >= 2),
           |s0 AS (SELECT a AS s, b AS d FROM e
           |       UNION ALL SELECT b, a FROM e),
           |${(1 to 12).map(round).mkString(",\n")}
           |SELECT s AS id, COUNT(*) AS core_deg FROM s12
           |GROUP BY s ORDER BY id""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q77 — personalized PageRank on the q63/q64 interaction graph:
    // teleport (and the dangling mass) concentrated on the seed cohort
    // user_id % 5 = 0 instead of spread uniformly — "relevance to this
    // cohort" rather than global centrality. Same integer fixed-point
    // contract as q63/q64 (total mass 10^12, every update an integer
    // division) so five unrolled oracle iterations hash-match bit-exactly.
    Q("q77_personalized_pagerank",
      (s, dir) => {
        val e = t(s, dir, "events")
        val edges = e.select(col("user_id").as("src"),
          (col("event_id") % 150).as("dst"))
        val seeds = e.filter(col("user_id") % 5 === 0)
          .select(col("user_id").as("id"))
        graft.operators.PageRank.personalized(edges, seeds, iterations = 5)
          .orderBy(col("id"))
      },
      Some {
        def iter(k: Int): String =
          s"""d$k AS (SELECT CAST(COALESCE(SUM(rp.r), 0) AS BIGINT) AS d
             |  FROM r${k - 1} rp
             |  WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = rp.id)),
             |r$k AS (SELECT n.id,
             |    CAST(CASE WHEN sd.id IS NOT NULL
             |          THEN (15 * (1000000000000 // ns.c)) // 100
             |          ELSE 0 END +
             |         (85 * (COALESCE(m.in_mass, 0) +
             |                CASE WHEN sd.id IS NOT NULL
             |                 THEN d$k.d // ns.c ELSE 0 END)) // 100
             |      AS BIGINT) AS r
             |  FROM nodes n CROSS JOIN ns CROSS JOIN d$k
             |  LEFT JOIN sd ON sd.id = n.id
             |  LEFT JOIN (SELECT e.dst, SUM(rp.r // od.outdeg) AS in_mass
             |             FROM e JOIN r${k - 1} rp ON rp.id = e.src
             |             JOIN od ON od.src = e.src GROUP BY e.dst) m
             |    ON m.dst = n.id)""".stripMargin
        s"""WITH e AS (SELECT DISTINCT user_id AS src, event_id % 150 AS dst
           |           FROM events WHERE user_id <> event_id % 150),
           |nodes AS (SELECT DISTINCT src AS id FROM e
           |          UNION SELECT DISTINCT dst FROM e),
           |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
           |sd AS (SELECT DISTINCT user_id AS id FROM events
           |       WHERE user_id % 5 = 0
           |         AND user_id IN (SELECT id FROM nodes)),
           |ns AS (SELECT COUNT(*) AS c FROM sd),
           |r0 AS (SELECT n.id,
           |    CAST(CASE WHEN sd.id IS NOT NULL
           |          THEN 1000000000000 // ns.c ELSE 0 END AS BIGINT) AS r
           |  FROM nodes n CROSS JOIN ns LEFT JOIN sd ON sd.id = n.id),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT id, r AS rank FROM r5 ORDER BY id""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q88 — INCREMENTAL connected components: the graph family's
    // maintain operator (the g03/q83/s20 lifecycle applied to graphs).
    // A sparse interaction graph (5000 possible vertices, multiplier-
    // scrambled dst so components stay small and merges are genuine) is
    // split 3:1 by event id; the old 3/4 is labeled once, then the new
    // 1/4 arrives as a batch folded in by contract-merge-relabel
    // (operators/IncrementalCC.scala) — CC runs over the BATCH's
    // contracted edges only, never re-walking the old edge set. The
    // oracle recomputes components of the WHOLE graph from scratch
    // (recursive-CTE reachability); labels are min-ids so the
    // equivalence is exact, and sharing the full-recompute oracle is
    // the proof that the bounded maintain loses nothing.
    Q("q88_incremental_cc",
      (s, dir) => {
        val e = t(s, dir, "events")
        // the sparse graph can sit in the critical percolation regime
        // at small SFs, where component diameter exceeds the default
        // propagation bound — a generous maxIter costs nothing (the
        // loop early-stops at the fixpoint) and keeps the labeling
        // exact at every SF
        val prev = graft.operators.Dedup.connectedComponents(
          graft.operators.GraphEdges.canonical(
            interactionEdges(e.filter(col("event_id") % 4 =!= 0))),
          maxIter = 100)
        graft.operators.IncrementalCC.maintain(prev,
            interactionEdges(e.filter(col("event_id") % 4 === 0)),
            maxIter = 100)
          .orderBy(col("id"))
      },
      Some(incCcOracle))
  )
}
