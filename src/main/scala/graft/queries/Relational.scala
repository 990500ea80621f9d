package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.sources.Tables
import graft.functions.Transforms
import Exact._

/**
 * Relational operator inventory (SURVEY.md §2) exercised over the driver's
 * TPC-H-ish star schema. Each query maps one or more reference operators
 * (S/J/A/T ids from SURVEY.md §2.1-2.4) to its idiomatic Spark form; the
 * paired DuckDB oracle states the same semantics in ANSI SQL.
 *
 * Scale notes (the plans these produce at 100 TB):
 *  - dimension joins (region/nation/supplier) are `broadcast()` hash joins —
 *    no shuffle of the fact side;
 *  - fact-fact joins (orders⋈lineitem) shuffle on the join key once and AQE
 *    handles skew;
 *  - all aggregation is partial (map-side combine) before the exchange;
 *  - filters/projections sit directly on the parquet scan (pushdown+pruning).
 */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // q01 — S2/T2: scan + filter + projection, pushed to the parquet reader
    // (reference pushes this into MySQL, Main.java:134-216; Catalyst pushes
    // it into the columnar scan instead).
    Q("q01_scan_filter_project",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
             |FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ----------------------------------------------------------------
    // q02 — A4 (the downstream aggregation layer, Spark SQL replacing
    // Athena/Imhotep): TPC-H Q1-shaped grouped aggregate with exact sums.
    Q("q02_agg_groupby",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlDsum("l_quantity")} AS sum_qty,
              |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS sum_disc_price,
              |  ${sqlDavg("l_quantity")} AS avg_qty,
              |  ${sqlDavg("l_discount")} AS avg_disc,
              |  COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q03 — J1/J2: inner-join chain customer⋈orders⋈lineitem (the
    // issue⋈series⋈publisher shape, Main.java:212-213) + grouped revenue.
    Q("q03_join_inner",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"), "inner")
          .join(l, o("o_orderkey") === l("l_orderkey"), "inner")
          .groupBy(col("c_mktsegment"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue,
              |  COUNT(DISTINCT o_orderkey) AS n_orders,
              |  COUNT(*) AS n_lines
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ----------------------------------------------------------------
    // q04 — J3/J4: left-outer join with null probes (issue⟕indicia/brand,
    // Main.java:214-215): orders that have no lineitems at all.
    Q("q04_join_left_null",
      (s, dir) => {
        val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("l_orderkey")).as("n_matched"),
            countDistinct(when(col("l_orderkey").isNull, col("o_orderkey")))
              .as("n_orders_no_lines"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n_rows,
             |  COUNT(l_orderkey) AS n_matched,
             |  COUNT(DISTINCT CASE WHEN l_orderkey IS NULL THEN o_orderkey END) AS n_orders_no_lines
             |FROM orders LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q05 — J5: the fan-out left-outer join (issue⟕story row multiplication
    // with the no-story guard, Main.java:216,321,459): distribution of
    // children-per-parent including the zero-child case.
    Q("q05_fanout_histogram",
      (s, dir) => {
        val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
        val per = o.join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
          .groupBy(o("o_orderkey"))
          .agg(count(col("l_orderkey")).as("n_lines"))
        per.groupBy(col("n_lines"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_lines"))
      },
      Some("""SELECT n_lines, COUNT(*) AS n_orders FROM (
             |  SELECT o_orderkey, COUNT(l_orderkey) AS n_lines
             |  FROM orders LEFT OUTER JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY o_orderkey)
             |GROUP BY n_lines ORDER BY n_lines""".stripMargin)),

    // ----------------------------------------------------------------
    // q06 — J6: dictionary broadcast joins (the reference's in-heap
    // Map<Integer,String> lookups, GcdMetadata.java:74-86 / Main.java:549-558)
    // as explicit broadcast-hash joins over tiny dims.
    Q("q06_dict_broadcast",
      (s, dir) => {
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        val n = t(s, dir, "nation"); val r = t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
          .join(o, c("c_custkey") === o("o_custkey"), "inner")
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(s"""SELECT r_name, n_name, ${sqlDsum("o_totalprice")} AS revenue,
              |  COUNT(*) AS n_orders
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |JOIN orders ON c_custkey = o_custkey
              |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // ----------------------------------------------------------------
    // q07 — A1: grouped ordered accumulation (the reference's sort-based
    // streaming group-by over credits, GcdStoryCredit.java:122-133) —
    // collect_list over a deterministic order, joined to a string.
    Q("q07_collect_sorted",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(col("user_id"))
          .agg(
            array_join(
              transform(
                array_sort(collect_list(struct(col("event_id"), col("event_type")))),
                x => x.getField("event_type")),
              ";").as("journey"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  string_agg(event_type, ';' ORDER BY event_id) AS journey,
             |  COUNT(*) AS n_events
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q08 — A2: pivot-by-type into parallel per-type aggregates (the
    // per-CreditType routing of GcdStoryCredit.java:85-97) as conditional
    // aggregation.
    Q("q08_conditional_pivot",
      (s, dir) => {
        val e = t(s, dir, "events")
        def cnt(tp: String) =
          count(when(col("event_type") === tp, lit(1))).as(s"n_$tp")
        def sv(tp: String) =
          sum(when(col("event_type") === tp, dec(col("value"))))
            .cast("double").as(s"v_$tp")
        e.groupBy(col("user_id"))
          .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"),
            cnt("error"), sv("purchase"), sv("error"))
          .orderBy(col("user_id"))
      },
      Some(s"""SELECT user_id,
              |  COUNT(CASE WHEN event_type='click' THEN 1 END) AS n_click,
              |  COUNT(CASE WHEN event_type='view' THEN 1 END) AS n_view,
              |  COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS n_purchase,
              |  COUNT(CASE WHEN event_type='signup' THEN 1 END) AS n_signup,
              |  COUNT(CASE WHEN event_type='error' THEN 1 END) AS n_error,
              |  CAST(SUM(CASE WHEN event_type='purchase' THEN ${sqlDec("value")} END) AS DOUBLE) AS v_purchase,
              |  CAST(SUM(CASE WHEN event_type='error' THEN ${sqlDec("value")} END) AS DOUBLE) AS v_error
              |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q09 — A3: compound-type expansion via mapping-table join (the credit
    // macro recursion of GcdStoryCredit.java:86-90 flattened into a 20-row
    // relational mapping, broadcast-joined + fanned out).
    Q("q09_expand_compound",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders")
          .withColumn("credit_type_id", (col("o_orderkey") % 13 + 1).cast(IntegerType))
        val mapping = graft.etl.CreditTypes.flatMapping
          .toDF("credit_type_id", "base_field")
        o.join(broadcast(mapping), Seq("credit_type_id"), "inner")
          .groupBy(col("base_field"))
          .agg(count(lit(1)).as("n_credits"),
            countDistinct(col("o_orderkey")).as("n_orders"))
          .orderBy(col("base_field"))
      },
      Some {
        val values = graft.etl.CreditTypes.flatMapping
          .map { case (id, f) => s"($id, '$f')" }.mkString(", ")
        s"""SELECT base_field, COUNT(*) AS n_credits,
           |  COUNT(DISTINCT o_orderkey) AS n_orders
           |FROM (SELECT o_orderkey, CAST(o_orderkey % 13 + 1 AS INT) AS credit_type_id FROM orders) o
           |JOIN (VALUES $values) m(credit_type_id, base_field) USING (credit_type_id)
           |GROUP BY base_field ORDER BY base_field""".stripMargin
      }),

    // ----------------------------------------------------------------
    // q10 — T5/T6/T7/T9: the reference's scalar transforms (lenient int
    // parse Main.java:391-396, date-string→yyyyMMdd int Main.java:619-635,
    // epoch→yyyyMMdd int Main.java:637-650, 0/1→bool Main.java:410) applied
    // as pure Column combinators.
    Q("q10_scalar_transforms",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(
          col("o_orderkey"),
          Transforms.lenientInt(substring(col("o_orderpriority"), 1, 1))
            .as("prio_num"),
          Transforms.dateStrToYmdInt(date_format(col("o_orderdate"), "yyyy-MM-dd"))
            .as("odate_ymd"),
          Transforms.epochToYmdInt(unix_timestamp(col("o_orderdate")))
            .as("epoch_ymd"),
          Transforms.intToBool((col("o_orderkey") % 2).cast(IntegerType))
            .as("odd_key"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
             |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS odate_ymd,
             |  CAST(strftime(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)), '%Y%m%d') AS INT) AS epoch_ymd,
             |  (o_orderkey % 2 = 1) AS odd_key
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q11 — T8: semicolon multi-value split with Java String#split
    // trailing-empty semantics (Main.java:535-547), incl. a trailing
    // separator to exercise the drop.
    Q("q11_semisplit",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val sdf = l.select(col("l_returnflag"), col("l_linestatus")).distinct()
          .select(concat(col("l_returnflag"), lit(" ; "), col("l_linestatus"),
            lit(" ;")).as("s"))
        sdf.select(
          col("s"),
          array_join(Transforms.semiSplit(col("s")), "|").as("parts_str"),
          size(Transforms.semiSplit(col("s"))).as("n_parts"))
          .orderBy(col("s"))
      },
      Some("""SELECT s,
             |  array_to_string(string_split_regex(regexp_replace(s, '(\s*;\s*)+$', ''), '\s*;\s*'), '|') AS parts_str,
             |  CAST(len(string_split_regex(regexp_replace(s, '(\s*;\s*)+$', ''), '\s*;\s*')) AS INT) AS n_parts
             |FROM (SELECT DISTINCT l_returnflag || ' ; ' || l_linestatus || ' ;' AS s FROM lineitem)
             |ORDER BY s""".stripMargin)),

    // ----------------------------------------------------------------
    // q12 — window functions (the Spark SQL query layer that replaces
    // Athena/Imhotep, SURVEY.md §2.6/A4): top-3 orders per customer.
    Q("q12_window_topn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ----------------------------------------------------------------
    // q13 — semi/anti joins (the EXISTS shape of the credit-map probe J7,
    // Main.java:327-328,465-466).
    Q("q13_semi_anti",
      (s, dir) => {
        // Single orders scan: one left join against distinct lineitem keys
        // + conditional aggregation (the semi/anti split falls out of
        // count(lk) vs count(*) - count(lk), exactly the oracle's shape —
        // vs the naive 3-scan semi + anti + join-back formulation).
        val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
        val lk = l.select(col("l_orderkey").as("lk")).distinct()
        o.join(lk, col("lk") === col("o_orderkey"), "left_outer")
          .groupBy(col("o_orderstatus"))
          .agg(count(col("lk")).as("n_with"),
            (count(lit(1)) - count(col("lk"))).as("n_without"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  COUNT(lk) AS n_with, COUNT(*) - COUNT(lk) AS n_without
             |FROM orders LEFT JOIN (SELECT DISTINCT l_orderkey AS lk FROM lineitem)
             |  ON lk = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q14 — top-k with exact ordering (deterministic tiebreak on key).
    Q("q14_topk_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
        l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"), "inner")
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("s_suppkey"))
          .limit(10)
      },
      Some(s"""SELECT s_suppkey, s_name,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              |GROUP BY s_suppkey, s_name
              |ORDER BY revenue DESC, s_suppkey LIMIT 10""".stripMargin)),

    // ----------------------------------------------------------------
    // q15 — JSON extraction (query-layer capability over events.props).
    Q("q15_events_json",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
            count(col("k")).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k, COUNT(k) AS n
             |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q16 — time bucketing over the event stream (batch view of the
    // streaming windowed aggregation in graft.streaming).
    Q("q16_events_hourly",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("hour_epoch"))
      },
      Some(s"""SELECT CAST(epoch(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS BIGINT) AS hour_epoch,
              |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1 ORDER BY hour_epoch""".stripMargin)),

    // ----------------------------------------------------------------
    // q17 — set operations (INTERSECT / EXCEPT with set semantics).
    Q("q17_setops",
      (s, dir) => {
        val e = t(s, dir, "events")
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val err = e.filter(col("event_type") === "error")
          .select(col("user_id")).distinct()
        val both = p.intersect(err).withColumn("tag", lit("both"))
        val onlyP = p.except(err).withColumn("tag", lit("purchase_only"))
        both.unionByName(onlyP)
          .select(col("tag"), col("user_id"))
          .orderBy(col("tag"), col("user_id"))
      },
      Some("""SELECT tag, user_id FROM (
             |  SELECT 'both' AS tag, user_id FROM (
             |    SELECT DISTINCT user_id FROM events WHERE event_type='purchase'
             |    INTERSECT
             |    SELECT DISTINCT user_id FROM events WHERE event_type='error')
             |  UNION ALL
             |  SELECT 'purchase_only' AS tag, user_id FROM (
             |    SELECT DISTINCT user_id FROM events WHERE event_type='purchase'
             |    EXCEPT
             |    SELECT DISTINCT user_id FROM events WHERE event_type='error'))
             |ORDER BY tag, user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q18 — rollup (multi-level aggregation in the query layer).
    Q("q18_rollup",
      (s, dir) => {
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
          .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
            coalesce(col("n_name"), lit("ALL")).as("n_name"),
            col("n_cust"), col("sum_bal"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some(s"""SELECT COALESCE(r_name, 'ALL') AS r_name,
              |  COALESCE(n_name, 'ALL') AS n_name,
              |  COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
              |FROM customer JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP(r_name, n_name)
              |ORDER BY r_name, n_name""".stripMargin)),

    // ----------------------------------------------------------------
    // q37 — CUBE: every grouping-set combination (region×status, region,
    // status, grand total) in ONE pass — Spark expands the sets map-side
    // and aggregates once, where four separate GROUP BYs would scan the
    // join four times.
    Q("q37_cube",
      (s, dir) => {
        val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
        val r = t(s, dir, "region"); val o = t(s, dir, "orders")
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
          .cube(col("r_name"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"))
          .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
            col("n_orders"), col("sum_price"))
          .orderBy(col("r_name"), col("o_orderstatus"))
      },
      Some(s"""SELECT COALESCE(r_name, 'ALL') AS r_name,
              |  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
              |  COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY CUBE(r_name, o_orderstatus)
              |ORDER BY r_name, o_orderstatus""".stripMargin))
  )
}
