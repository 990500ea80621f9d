package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Scd2
import graft.sources.Tables
import Exact._

/**
 * Query-layer capabilities beyond the reference's own surface (SURVEY.md
 * §2.6 notes these come "for free" from Spark SQL): as-of/last-touch
 * attribution, gap-based sessionization, string-distance matching, and
 * bucketed histograms — each stated identically in Spark and DuckDB.
 */
object Advanced {

  /** Shared q65/q70 change log: bounded user set, integer-microsecond
   * timestamps (the cross-engine-exact domain). */
  private def scd2Events(s: SparkSession, dir: String): DataFrame =
    Tables.eventsUs(s, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("ts_us"),
        col("event_id"), col("event_type"))

  /** The full SCD2 rebuild restatement — oracle of BOTH q65 (direct
   * build) and q70 (incremental maintenance): sharing it IS the q70
   * correctness statement, maintain(build(old), batch) ≡ build(all). */
  private val scd2RebuildOracle: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
      |  FROM events WHERE user_id < 20),
      |f AS (SELECT *,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |          OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id
      |                      ORDER BY ts_us, event_id)),
      |v AS (SELECT *, CAST(SUM(chg) OVER (
      |    PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS ver
      |  FROM f),
      |g AS (SELECT user_id, ver, MIN(event_type) AS event_type,
      |    MIN(ts_us) AS valid_from_us, COUNT(*) AS n_events
      |  FROM v GROUP BY user_id, ver)
      |SELECT user_id, ver, event_type, valid_from_us,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver)
      |    AS valid_to_us,
      |  n_events,
      |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY ver)
      |    IS NULL AS is_current
      |FROM g ORDER BY user_id, ver""".stripMargin

  /** q90's pre-created small-file debt layouts — one consumed per
   * timed rep, refilled by the gate's setup thunk (r17 verdict #3).
   * Keyed by corpus dir like every sibling cache: a JVM that exercises
   * two sfDirs must never compact a layout built from the other one. */
  private val q90DebtPools = scala.collection.mutable
    .Map.empty[String, java.util.concurrent.ConcurrentLinkedQueue[String]]
  private def q90DebtPool(
      dir: String): java.util.concurrent.ConcurrentLinkedQueue[String] =
    q90DebtPools.synchronized {
      q90DebtPools.getOrElseUpdate(dir,
        new java.util.concurrent.ConcurrentLinkedQueue[String]())
    }

  /** One day-partitioned events layout with deliberate 12-files/day
   * small-file debt — q90's compaction scenario. */
  private def q90DebtLayout(s: SparkSession, dir: String): String = {
    val root = graft.sources.Scratch.dir("compact_sink") + "/events"
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        date_format(col("ts"), "yyyyMMdd").cast("int").as("day"))
      .repartition(12).write.partitionBy("day").parquet(root)
    root
  }

  val all: Seq[Q] = Seq(

    // ----------------------------------------------------------------
    // q39 — the skew-salted join (operators/Skew), driver-gated: the
    // lineitem fact salted 8 ways against a replicated orders projection,
    // then re-aggregated. The oracle is the PLAIN join — the driver's
    // hash gate is the proof that salting is semantics-preserving, which
    // is exactly the property you rely on when a hot key forces this
    // shape at 100 TB (broadcast-infeasible dim + Zipf fact key). Salt
    // comes from a high-cardinality column (l_partkey), never rand().
    Q("q39_salted_join",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"))
        graft.operators.Skew.saltedJoin(l, o, "l_orderkey", "o_orderkey",
            saltFrom = "l_partkey", factor = 8)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
              |  ${sqlDsum("l_extendedprice")} AS sum_price
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)),

    // ----------------------------------------------------------------
    // q19 — as-of (last-touch) attribution: each purchase matched to the
    // user's most recent earlier click, as an ordered window composition
    // (the "as-of join" of SURVEY §2.2 notes, built from existing ops).
    Q("q19_asof_last_touch",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        e.withColumn("last_click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("last_click_epoch",
            last(when(col("event_type") === "click",
              unix_timestamp(col("ts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("purchase_epoch"),
            col("last_click_id"), col("last_click_epoch"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, purchase_epoch, last_click_id, last_click_epoch
             |FROM (
             |  SELECT event_id, user_id, event_type,
             |    (epoch_us(ts) // 1000000) AS purchase_epoch,
             |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |      OVER w AS last_click_id,
             |    last_value(CASE WHEN event_type = 'click' THEN (epoch_us(ts) // 1000000) END IGNORE NULLS)
             |      OVER w AS last_click_epoch
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q20 — gap-based sessionization (30-min inactivity closes a session),
    // the manual window formulation both engines state identically; the
    // streaming twin is graft.streaming.EventStream.sessions.
    Q("q20_sessions",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
          .withColumn("ep", unix_timestamp(col("ts")))
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ep"), col("event_id"))
        val marked = e
          .withColumn("prev_ep", lag(col("ep"), 1).over(wOrd))
          .withColumn("new_sess",
            when(col("prev_ep").isNull ||
              col("ep") - col("prev_ep") > 1800, 1L).otherwise(0L))
          .withColumn("session_idx",
            sum(col("new_sess")).over(
              wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        marked.groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            dsum(col("value")).as("sum_value"),
            min(col("ep")).as("start_epoch"),
            max(col("ep")).as("end_epoch"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some(s"""SELECT user_id, session_idx, COUNT(*) AS n_events,
              |  ${sqlDsum("value")} AS sum_value,
              |  MIN(ep) AS start_epoch, MAX(ep) AS end_epoch
              |FROM (
              |  SELECT user_id, event_id, value, ep,
              |    CAST(SUM(CASE WHEN prev_ep IS NULL OR ep - prev_ep > 1800 THEN 1 ELSE 0 END)
              |      OVER (PARTITION BY user_id ORDER BY ep, event_id
              |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
              |  FROM (
              |    SELECT user_id, event_id, value,
              |      (epoch_us(ts) // 1000000) AS ep,
              |      lag((epoch_us(ts) // 1000000)) OVER
              |        (PARTITION BY user_id ORDER BY (epoch_us(ts) // 1000000), event_id) AS prev_ep
              |    FROM events))
              |GROUP BY user_id, session_idx
              |ORDER BY user_id, session_idx""".stripMargin)),

    // ----------------------------------------------------------------
    // q21 — string-distance matching (fuzzy-join scalar): levenshtein over
    // distinct dimension values.
    Q("q21_string_distance",
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val segs = c.select(col("c_mktsegment").as("seg")).distinct()
        segs.as("x").join(segs.as("y"), col("x.seg") < col("y.seg"))
          .select(col("x.seg").as("seg_a"), col("y.seg").as("seg_b"),
            levenshtein(col("x.seg"), col("y.seg")).as("lev"))
          .orderBy(col("seg_a"), col("seg_b"))
      },
      Some("""SELECT x.seg AS seg_a, y.seg AS seg_b,
             |  CAST(levenshtein(x.seg, y.seg) AS INT) AS lev
             |FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) x
             |JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) y
             |  ON x.seg < y.seg
             |ORDER BY seg_a, seg_b""".stripMargin)),

    // ----------------------------------------------------------------
    // q26 — window-relative filtering (the correlated-subquery shape
    // "orders above this customer's average"), with the window average on
    // DECIMAL so both engines compare against the identical exact value.
    Q("q26_above_customer_avg",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
        val avgExact = (sum(dec(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w))
        o.withColumn("cavg", avgExact)
          .filter(col("o_totalprice") > col("cavg"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_above"),
            dsum(col("o_totalprice")).as("sum_above"))
          .orderBy(col("o_custkey"))
      },
      Some(s"""SELECT o_custkey, COUNT(*) AS n_above,
              |  ${sqlDsum("o_totalprice")} AS sum_above
              |FROM (
              |  SELECT o_custkey, o_totalprice,
              |    CAST(SUM(${sqlDec("o_totalprice")}) OVER w AS DOUBLE) /
              |      COUNT(*) OVER w AS cavg
              |  FROM orders
              |  WINDOW w AS (PARTITION BY o_custkey))
              |WHERE o_totalprice > cavg
              |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q27 — exact interpolated percentiles (both engines implement the
    // same (1-g)·a + g·b definition over the sorted values, so the exact
    // form is oracle-comparable where the sketch form (q23) is not).
    // NOT Spark's percentile(): its aggregation buffer is a per-group
    // value map — unbounded state on a continuous domain at 100×. The
    // grid-rank operator computes the identical interpolation from a
    // bounded 256-cell histogram + a sort of only the cells the
    // percentile positions land in (operators/GridPercentile.scala);
    // the hash gate proves it reproduces percentile() bit-for-bit.
    Q("q27_exact_percentiles",
      (s, dir) => {
        import graft.operators.GridPercentile
        val e = Tables.load(s, dir, "events")
        val pctl = GridPercentile.exact(
          e.select(col("event_type"), col("value")),
          "event_type", "value", Seq("p50" -> 0.5, "p90" -> 0.9))
        e.groupBy(col("event_type"))
          .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
          .join(pctl, Seq("event_type"))
          .select(col("event_type"), col("p50"), col("p90"),
            col("vmin"), col("vmax"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  quantile_cont(value, 0.5) AS p50,
             |  quantile_cont(value, 0.9) AS p90,
             |  MIN(value) AS vmin, MAX(value) AS vmax
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q28 — ordered-sequence funnel over the event stream: per user,
    // did a view → click → purchase chain occur in order? Window-min
    // timestamps per stage, then ordering comparisons — identical
    // formulation in both engines.
    Q("q28_funnel",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val staged = e.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view",
            unix_timestamp(col("ts")))).as("t_view"),
          min(when(col("event_type") === "click",
            unix_timestamp(col("ts")))).as("t_click"),
          min(when(col("event_type") === "purchase",
            unix_timestamp(col("ts")))).as("t_purchase"))
        staged.select(col("user_id"),
          col("t_view").isNotNull.as("reached_view"),
          (col("t_click").isNotNull && col("t_click") > col("t_view"))
            .as("clicked_after_view"),
          (col("t_purchase").isNotNull && col("t_purchase") > col("t_click") &&
            col("t_click") > col("t_view")).as("full_funnel"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  t_view IS NOT NULL AS reached_view,
             |  (t_click IS NOT NULL AND t_click > t_view) AS clicked_after_view,
             |  (t_purchase IS NOT NULL AND t_purchase > t_click AND t_click > t_view) AS full_funnel
             |FROM (
             |  SELECT user_id,
             |    MIN(CASE WHEN event_type = 'view' THEN (epoch_us(ts) // 1000000) END) AS t_view,
             |    MIN(CASE WHEN event_type = 'click' THEN (epoch_us(ts) // 1000000) END) AS t_click,
             |    MIN(CASE WHEN event_type = 'purchase' THEN (epoch_us(ts) // 1000000) END) AS t_purchase
             |  FROM events GROUP BY user_id)
             |ORDER BY user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q23 — sketch aggregates (HLL cardinality + quantile sketch): the
    // approximate layer every 100 TB pipeline leans on. Sketch INTERNALS
    // are engine-specific, so raw sketch values can't hash-match DuckDB —
    // instead the gate checks the exact companions (count, exact distinct)
    // directly and asserts the sketch ERROR BOUNDS as booleans: HLL(rsd
    // 0.02) within 5% of the exact cardinality, KLL(accuracy 1000, rank
    // error ≤ 0.001) between the exact 49th/51st (94th/96th) percentiles.
    // The oracle states the bounds hold (TRUE); a sketch regression flips
    // a boolean and fails the hash.
    Q("q23_sketches",
      (s, dir) => {
        // the exact percentile BANDS come from the bounded-state grid
        // rank (operators/GridPercentile.scala), not percentile()'s
        // unbounded per-group value map — same q27 scale contract
        val e = Tables.load(s, dir, "events")
        val bands = graft.operators.GridPercentile.exact(
          e.select(col("event_type"), col("value")),
          "event_type", "value",
          Seq("p49" -> 0.49, "p51" -> 0.51, "p94" -> 0.94, "p96" -> 0.96))
        e.groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), rsd = 0.02)
              .as("approx_users"),
            percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50s"),
            percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95s"))
          .join(bands, Seq("event_type"))
          .select(col("event_type"), col("n_events"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")) <=
              col("exact_users").cast("double") * 0.05).as("approx_users_ok"),
            (col("p50s") >= col("p49") && col("p50s") <= col("p51"))
              .as("p50_ok"),
            (col("p95s") >= col("p94") && col("p95s") <= col("p96"))
              .as("p95_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_users_ok, TRUE AS p50_ok, TRUE AS p95_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q24 — deterministic train/val/test split: hash-bucket labels that
    // are stable across engines, reruns, and parallelism (the reproducible
    // holdout every training pipeline needs).
    Q("q24_hash_split",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        d.select(col("lang"),
          graft.operators.Sampling.splitLabel(col("doc_id"),
            Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("split"))
      },
      Some("""SELECT lang, split, COUNT(*) AS n FROM (
             |  SELECT lang,
             |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT lang,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
             |    FROM documents))
             |GROUP BY lang, split ORDER BY lang, split""".stripMargin)),

    // ----------------------------------------------------------------
    // q25 — deterministic sample + reproducible shuffle order: 10%
    // hash-sample of documents, emitted in hash order (the seedless
    // "randomize training order" pass), first 20 rows.
    Q("q25_det_sample_shuffle",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        graft.operators.Sampling.sample(d, "doc_id", 10)
          .select(col("doc_id"),
            graft.functions.TextFunctions.hash60(
              col("doc_id").cast("string")).as("h"))
          .orderBy(col("h"), col("doc_id"))
          .limit(20)
      },
      Some("""SELECT doc_id, h FROM (
             |  SELECT doc_id,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM documents)
             |WHERE h % 100 < 10 ORDER BY h, doc_id LIMIT 20""".stripMargin)),

    // ----------------------------------------------------------------
    // q22 — fixed-width histogram via arithmetic bucketing (engine-neutral
    // floor division, no width_bucket dialect differences).
    Q("q22_histogram",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        o.select(floor(col("o_totalprice") / 50000).cast("int").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
             |  COUNT(*) AS n
             |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // ----------------------------------------------------------------
    // q35 — table profile (operators/Profile): per-column row/null/exact
    // distinct counts in one scan + per-column grouped aggregates — the
    // first query against an unfamiliar table. (At 100 TB flip
    // exactDistinct=false for one-pass HLL ndv.)
    Q("q35_profile",
      (s, dir) => {
        graft.operators.Profile.profile(Tables.load(s, dir, "orders"),
            Seq("o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderpriority"))
          .orderBy(col("col_name"))
      },
      Some("""SELECT col_name, n, n_null, n_distinct FROM (
             |  SELECT 'o_custkey' AS col_name, COUNT(*) AS n,
             |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_null,
             |    COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus', COUNT(*),
             |    COUNT(*) FILTER (WHERE o_orderstatus IS NULL),
             |    COUNT(DISTINCT o_orderstatus) FROM orders
             |  UNION ALL
             |  SELECT 'o_totalprice', COUNT(*),
             |    COUNT(*) FILTER (WHERE o_totalprice IS NULL),
             |    COUNT(DISTINCT o_totalprice) FROM orders
             |  UNION ALL
             |  SELECT 'o_orderpriority', COUNT(*),
             |    COUNT(*) FILTER (WHERE o_orderpriority IS NULL),
             |    COUNT(DISTINCT o_orderpriority) FROM orders)
             |ORDER BY col_name""".stripMargin)),

    // ----------------------------------------------------------------
    // q34 — generic as-of join (operators/AsofJoin): latest click strictly
    // before each purchase, per user — the two-table quotes-for-trade
    // operator, executed as union + ONE keyed window (never a per-key
    // theta join). The oracle states the same semantics as a lateral
    // argmax; q19 is the inlined single-table cousin.
    Q("q34_asof_join",
      (s, dir) => {
        val e = Tables.eventsUs(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts_us"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts_us"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts_us").as("click_us"))
        graft.operators.AsofJoin.asofJoin(purchases, clicks,
            Seq("user_id"), "ts_us", "click_us", tieBreak = "click_id")
          .select(col("purchase_id"), col("user_id"), col("ts_us"),
            col("asof.click_id").as("click_id"),
            col("asof.click_us").as("click_us"))
          .orderBy(col("purchase_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events),
             |p AS (SELECT event_id AS purchase_id, user_id, ts_us FROM e
             |      WHERE event_type = 'purchase'),
             |c AS (SELECT event_id AS click_id, user_id,
             |        ts_us AS click_us FROM e WHERE event_type = 'click')
             |SELECT p.purchase_id, p.user_id, p.ts_us,
             |  l.click_id, l.click_us
             |FROM p LEFT JOIN LATERAL (
             |  SELECT click_id, click_us FROM c
             |  WHERE c.user_id = p.user_id AND c.click_us < p.ts_us
             |  ORDER BY c.click_us DESC, c.click_id DESC LIMIT 1) l ON TRUE
             |ORDER BY purchase_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q33 — bucketed time-range join (operators/RangeJoin): every event
    // of the same user in the 5 minutes BEFORE each error event. Spark
    // would execute the raw inequality join as a per-key theta join
    // (quadratic on a busy user); the operator quantizes time into
    // window-width buckets so candidates come from an EQUALITY join on
    // (user, bucket) — one ordinary shuffle — and the exact range
    // predicate filters. The oracle states the pure inequality join, so
    // the hash gate proves the bucketing loses and invents nothing.
    Q("q33_range_join",
      (s, dir) => {
        val e = Tables.eventsUs(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts_us"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id"),
            col("ts_us").as("err_ts"))
        val prior = e.select(col("event_id").as("prior_id"), col("user_id"),
          col("ts_us").as("prior_ts"), col("event_type").as("prior_type"))
        graft.operators.RangeJoin.timeWindowJoin(errors, prior,
            Seq("user_id"), "err_ts", "prior_ts",
            loUs = -300000000L, hiUs = 0L)
          .select(col("err_id"), col("prior_id"), col("prior_type"))
          .orderBy(col("err_id"), col("prior_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_ns(ts) // 1000 AS ts_us FROM events)
             |SELECT err.event_id AS err_id, p.event_id AS prior_id,
             |  p.event_type AS prior_type
             |FROM e err JOIN e p ON err.user_id = p.user_id
             |  AND p.ts_us >= err.ts_us - 300000000
             |  AND p.ts_us < err.ts_us
             |WHERE err.event_type = 'error'
             |ORDER BY err_id, prior_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q32 — relational pivot: long → wide (per-user event-type counts as
    // columns). Spark's pivot with an EXPLICIT value list stays a single
    // groupBy with conditional aggregates — one shuffle, no second pass
    // to discover the domain (an implicit pivot would collect the value
    // set to the driver first; at 100 TB the explicit list is the only
    // sane form).
    Q("q32_pivot",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        e.groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "view", "purchase", "error"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("click", "view", "purchase", "error"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             |  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
             |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             |  COUNT(*) FILTER (WHERE event_type = 'error') AS error
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q31 — deterministic stratified sampling (corpus rebalancing): keep
    // 10% of English, 50% of German, everything else whole — per-stratum
    // rates as a broadcast CASE over the same seedless hash-bucket as
    // q24/q25. Pure narrow filter: no shuffle, no RNG, rerun-stable.
    // Gated on the full survivor SET, not just counts.
    Q("q31_stratified_sample",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
        graft.operators.Sampling.stratifiedSample(d, "doc_id", "lang",
            Map("en" -> 10, "de" -> 50), defaultPercent = 100)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
             |  FROM documents)
             |WHERE b < CASE WHEN lang = 'en' THEN 10
             |               WHEN lang = 'de' THEN 50 ELSE 100 END
             |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q29 — snapshot diff (operators/SnapshotDiff): the month-over-month
    // dump comparison a GCD operator runs between consecutive
    // snapshot=YYYYMMDD partitions, exercised over orders with
    // deterministic mutations (≈1% removed, ≈1% changed, ≈1% re-keyed as
    // added). One full-outer shuffle on the key; row equality is a
    // null-safe codegen conjunction — no hashing, no driver round-trips.
    Q("q29_snapshot_diff",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val base = o.filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")))
        val added = o.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        val newer = base.unionByName(added)
        graft.operators.SnapshotDiff.diff(o, newer, Seq("o_orderkey"))
          .filter(col("change_type") =!= "unchanged")
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH newer AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus,
             |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1
             |         ELSE o_totalprice END AS o_totalprice,
             |    o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 97 <> 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             |    o_totalprice, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 101 = 0),
             |d AS (
             |  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
             |         WHEN n.o_orderkey IS NULL THEN 'removed'
             |         WHEN (o.o_custkey IS NOT DISTINCT FROM n.o_custkey)
             |          AND (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
             |          AND (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice)
             |          AND (o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate)
             |          AND (o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
             |         THEN 'unchanged' ELSE 'changed' END AS change_type
             |  FROM orders o FULL OUTER JOIN newer n
             |    ON o.o_orderkey = n.o_orderkey)
             |SELECT o_orderkey, change_type FROM d
             |WHERE change_type <> 'unchanged' ORDER BY o_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q41 — Bloom-filter semi-join reduction (operators/BloomJoin),
    // driver-gated: lineitem probed against a Bloom filter of a selective
    // orders subset's keys BEFORE the exact join, so the shuffle carries
    // only candidates. The oracle is the PLAIN filtered join — the hash
    // gate proves the reduction is exact (the join removes the Bloom's
    // false positives), the property a runtime filter relies on at 100 TB.
    Q("q41_bloom_join",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        val o = Tables.load(s, dir, "orders")
          .filter(col("o_orderkey") % 37 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"))
        graft.operators.BloomJoin
          .bloomJoin(l, o, "l_orderkey", "o_orderkey",
            expectedItems = 100000L)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
              |  ${sqlDsum("l_extendedprice")} AS sum_price
              |FROM lineitem
              |JOIN (SELECT o_orderkey, o_orderpriority FROM orders
              |      WHERE o_orderkey % 37 = 0) o
              |  ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)),

    // ----------------------------------------------------------------
    // q42 — Z-order curve math (operators/ZOrder), driver-gated: the
    // Morton z-value over (l_partkey, l_suppkey) bucketed into 2-D tiles,
    // with per-tile stats. The oracle recomputes the identical interleave
    // via ZOrder.zSql — proving the curve any external reader of a
    // z-clustered layout would compute matches the one the writer sorted
    // by, which is what makes cross-engine row-group pruning sound.
    Q("q42_zorder",
      (s, dir) => {
        val l = Tables.load(s, dir, "lineitem")
        l.withColumn("z",
            graft.operators.ZOrder.zValue(col("l_partkey"), col("l_suppkey"), 6))
          .withColumn("tile", shiftright(col("z"), 6))
          .groupBy(col("tile"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("z")).as("z_min"), max(col("z")).as("z_max"),
            dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("tile"))
      },
      Some(s"""SELECT tile, COUNT(*) AS n_rows,
              |  MIN(z) AS z_min, MAX(z) AS z_max,
              |  ${sqlDsum("l_quantity")} AS sum_qty
              |FROM (SELECT (${graft.operators.ZOrder.zSql("l_partkey", "l_suppkey", 6)}) >> 6 AS tile,
              |             (${graft.operators.ZOrder.zSql("l_partkey", "l_suppkey", 6)}) AS z,
              |             l_quantity
              |      FROM lineitem)
              |GROUP BY tile ORDER BY tile""".stripMargin)),

    // ----------------------------------------------------------------
    // q44 — blocked fuzzy self-match (entity resolution): candidate pairs
    // come from a BLOCKING key (first name word) — one shuffle on the
    // block, never the O(n²) cross join — then exact Levenshtein scores
    // the candidates (codegen'd integer DP in both engines). Per-block
    // match stats gate the whole chain: blocking, pair generation,
    // distance math. The blocking key is the standard recall/cost knob:
    // at 100 TB you'd block on several keys and union, but each block
    // join keeps this exact shape.
    Q("q44_fuzzy_blocked_join",
      (s, dir) => {
        // COMPOSITE blocking key (first two words), not the first word
        // alone: blocking only works if it bounds block sizes. The
        // one-word key has 8 distinct values over part — Σ|block|²/2 made
        // 25M candidate pairs at sf0.1 (and quadratically worse beyond;
        // round 6's honest bench forcing exposed 23.7 s of levenshtein
        // that count()-forcing had let Catalyst prune). Two words give
        // ~|v|² blocks and ~8× fewer pairs with identical match
        // semantics for the ≤10-edit threshold here (near matches share
        // their leading words in this corpus).
        val p = Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_name"),
            substring_index(col("p_name"), " ", 2).as("blk"))
        // SPREAD THE STREAM SIDE (guide §2.5 input parallelism): the
        // join is broadcast (y is tiny), so each stream task computes
        // the levenshtein DP for ITS rows' candidate pairs — but a
        // compact `part` arrives as one scan split and the whole
        // Σ|block|² DP ran in a single task while every other core
        // idled. Repartitioning the stream side on the unique key
        // spreads pair generation evenly (key-deterministic, not
        // round-robin — no re-run hazard under retries). The partition
        // count is PINNED (repartition-by-num, which AQE honors):
        // byte-based coalescing folded the un-numbered exchange
        // straight back to one partition — AQE sizes by bytes and
        // cannot see that each row fans out into |block| DP cells.
        // defaultParallelism scales with the session's cores, never a
        // local constant.
        val x = p.repartition(s.sparkContext.defaultParallelism,
          col("p_partkey")).as("x")
        val y = p.as("y")
        x.join(broadcast(y), col("x.blk") === col("y.blk") &&
            col("x.p_partkey") < col("y.p_partkey"))
          .select(col("x.blk").as("blk"),
            levenshtein(col("x.p_name"), col("y.p_name")).cast("long")
              .as("dist"))
          .groupBy(col("blk"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("dist") <= 10, 1L).otherwise(0L)).as("n_matches"),
            min(col("dist")).as("min_dist"))
          .orderBy(col("blk"))
      },
      Some("""WITH p AS (SELECT p_partkey, p_name,
             |    array_to_string(string_split(p_name, ' ')[1:2], ' ')
             |      AS blk FROM part)
             |SELECT x.blk AS blk, COUNT(*) AS n_candidates,
             |  CAST(SUM(CASE WHEN levenshtein(x.p_name, y.p_name) <= 10
             |                THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
             |  CAST(MIN(levenshtein(x.p_name, y.p_name)) AS BIGINT) AS min_dist
             |FROM p x JOIN p y
             |  ON x.blk = y.blk AND x.p_partkey < y.p_partkey
             |GROUP BY x.blk ORDER BY x.blk""".stripMargin)),

    // ----------------------------------------------------------------
    // q45 — relational top-k per group through the bounded-heap PARTIAL
    // aggregate (functions/TopKAggregate): top-3 lineitems by price per
    // supplier. Same answer as q12's window row_number, but the map side
    // reduces each partition to ≤ k pairs per group BEFORE the exchange
    // — the shuffle carries O(groups × k), not every row. That is the
    // shape that survives a supplier with a billion lines; the oracle is
    // the window formulation, so the hash gate proves heap ≡ sort.
    Q("q45_topk_partial_agg",
      (s, dir) => {
        import graft.functions.TopKAggregate.topKPairs
        val l = Tables.load(s, dir, "lineitem")
        val scored = l.select(col("l_suppkey"),
          col("l_extendedprice").as("score"),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast("long")
            .as("line_id"))
        scored.groupBy(col("l_suppkey"))
          .agg(topKPairs(struct(col("score"), col("line_id")), 3).as("top"))
          .select(col("l_suppkey"), posexplode(col("top")))
          .select(col("l_suppkey"), (col("pos") + 1).cast("long").as("rank"),
            col("col.id").as("line_id"), col("col.score").as("price"))
          .orderBy(col("l_suppkey"), col("rank"))
      },
      Some("""SELECT l_suppkey, rank, line_id, price FROM (
             |  SELECT l_suppkey, line_id, price,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY price DESC, line_id) AS rank
             |  FROM (SELECT l_suppkey,
             |          CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS line_id,
             |          l_extendedprice AS price
             |        FROM lineitem))
             |WHERE rank <= 3 ORDER BY l_suppkey, rank""".stripMargin)),

    // ----------------------------------------------------------------
    // q46 — the ranking/distribution window family in one gated shape:
    // row_number, ntile, percent_rank, cume_dist, lag, lead, all over
    // PARTITION BY o_orderpriority ORDER BY (o_totalprice, o_orderkey).
    //
    // NOT as literal window calls: o_orderpriority has ~5 distinct
    // values, so that window sorts ~N/5 of ALL orders in ONE task — the
    // straggler/OOM cliff q68 was decomposed to avoid. Instead every
    // function derives from the q68 cell-grid rank (per-(priority,cell)
    // offsets over a ~1,280-row histogram + row_number within the cell,
    // 256-way parallel per priority):
    //   - rn         = cell offset + local row_number (exact global rank;
    //                  the (price, orderkey) order is strict — orderkey is
    //                  the table key — so rank ≡ row_number, no tie terms)
    //   - quartile   = ntile(4)'s floor/ceil bucket rule from (rn, n)
    //   - pct_rank   = (rn-1)/(n-1), cume_dist = rn/n — each one single
    //                  correctly-rounded IEEE division of exact integers,
    //                  bit-identical to the engines' internal forms
    //   - lag/lead   = local within the cell; the cell's edge rows take
    //                  the neighboring cell's boundary value from the
    //                  tiny table (lag/lead over the histogram itself)
    // The oracle stays the direct six-window statement — the hash gate
    // proves the decomposition reproduces every function bit-for-bit.
    // percent_rank/cume_dist round to 6 dp on both sides as before (the
    // round just pins the hashed text form).
    Q("q46_window_suite",
      (s, dir) => {
        val nCells = 256
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
        val bounds = o.agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
        val cell = when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("o_totalprice") - col("mn")) * nCells /
              (col("mx") - col("mn"))).cast("long"),
            lit(nCells - 1L)))
        val withCell = o.crossJoin(broadcast(bounds))
          .withColumn("__cell", cell)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), col("__cell"))
        // tiny per-(priority,cell) histogram: counts → running offsets +
        // totals, plus each cell's first/last value in the full order so
        // lag/lead can cross cell boundaries without a whole-priority sort
        val wOff = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("__cell"))
        val offs = withCell
          .groupBy(col("o_orderpriority"), col("__cell"))
          .agg(count(lit(1)).as("__c"),
            min(struct(col("o_totalprice"), col("o_orderkey")))
              .as("__first"),
            max(struct(col("o_totalprice"), col("o_orderkey")))
              .as("__last"))
          .withColumn("__off", coalesce(sum(col("__c")).over(
            wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("__n", sum(col("__c")).over(
            Window.partitionBy(col("o_orderpriority"))))
          .withColumn("__prev_last",
            lag(col("__last.o_totalprice"), 1).over(wOff))
          .withColumn("__next_first",
            lead(col("__first.o_totalprice"), 1).over(wOff))
          .select(col("o_orderpriority"), col("__cell"), col("__c"),
            col("__off"), col("__n"), col("__prev_last"),
            col("__next_first"))
        val wLoc = Window.partitionBy(col("o_orderpriority"), col("__cell"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        withCell.join(broadcast(offs), Seq("o_orderpriority", "__cell"))
          .withColumn("__lrn", row_number().over(wLoc).cast("long"))
          .withColumn("rn", col("__off") + col("__lrn"))
          .withColumn("__q", expr("__n div 4"))
          .withColumn("__r", expr("__n % 4"))
          .withColumn("quartile",
            when(col("rn") <= (col("__q") + 1) * col("__r"),
              expr("(rn - 1) div (__q + 1) + 1"))
            .otherwise(expr(
              "__r + (rn - __r * (__q + 1) - 1) div greatest(__q, 1) + 1"))
            .cast("long"))
          // exact-6dp ratios (TextFunctions.ratio6): (rn−1)/(N−1) and
          // rn/N land on dyadic 6dp halves when N−1 / N are high
          // powers of two — the engine round() half-mode class
          .withColumn("pct_rank", when(col("__n") === 1, lit(0.0))
            .otherwise(graft.functions.TextFunctions.ratio6(
              col("rn") - 1, col("__n") - 1)))
          .withColumn("cume",
            graft.functions.TextFunctions.ratio6(col("rn"), col("__n")))
          .withColumn("prev_price",
            when(col("__lrn") === 1, col("__prev_last"))
              .otherwise(lag(col("o_totalprice"), 1).over(wLoc)))
          .withColumn("next_price",
            when(col("__lrn") === col("__c"), col("__next_first"))
              .otherwise(lead(col("o_totalprice"), 1).over(wLoc)))
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), col("rn"), col("quartile"),
            col("pct_rank"), col("cume"), col("prev_price"),
            col("next_price"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice, rn,
             |  quartile,
             |  CASE WHEN nn = 1 THEN 0.0
             |    ELSE ${graft.functions.TextFunctions.ratio6Sql(
                 "rn - 1", "nn - 1")} END AS pct_rank,
             |  ${graft.functions.TextFunctions.ratio6Sql(
                 "rn", "nn")} AS cume,
             |  prev_price, next_price
             |FROM (
             |  SELECT o_orderkey, o_orderpriority, o_totalprice,
             |    CAST(row_number() OVER w AS BIGINT) AS rn,
             |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |    CAST(count(*) OVER (PARTITION BY o_orderpriority)
             |      AS BIGINT) AS nn,
             |    lag(o_totalprice) OVER w AS prev_price,
             |    lead(o_totalprice) OVER w AS next_price
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice, o_orderkey))
             |WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin)),

    // ----------------------------------------------------------------
    // q47 — CSV + JSON-lines + ORC source round-trip: the engine's
    // non-parquet ingest surface, gated. A deterministic orders
    // projection is written in each format, read back through the
    // respective sources with an EXPLICIT schema (schema inference is a
    // scale anti-pattern — it costs an extra full pass and can flip
    // types between runs), and aggregated per format; the oracle
    // computes the same aggregate from the parquet table once per
    // format. Identical rows per format = every parser round-trips
    // values exactly.
    Q("q47_format_roundtrip",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        val tmp = graft.sources.Scratch.dir("fmt_roundtrip")
        o.write.mode("overwrite").option("header", "true")
          .csv(s"$tmp/csv")
        o.write.mode("overwrite").json(s"$tmp/jsonl")
        o.write.mode("overwrite").orc(s"$tmp/orc")
        val schema = o.schema
        val fromCsv = s.read.schema(schema).option("header", "true")
          .csv(s"$tmp/csv").withColumn("fmt", lit("csv"))
        val fromJson = s.read.schema(schema).json(s"$tmp/jsonl")
          .withColumn("fmt", lit("jsonl"))
        val fromOrc = s.read.schema(schema).orc(s"$tmp/orc")
          .withColumn("fmt", lit("orc"))
        fromCsv.unionByName(fromJson).unionByName(fromOrc)
          .groupBy(col("fmt"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy(col("fmt"), col("o_orderstatus"))
      },
      Some(s"""WITH agg AS (
              |  SELECT o_orderstatus, COUNT(*) AS n,
              |    ${sqlDsum("o_totalprice")} AS sum_price,
              |    MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
              |  FROM orders GROUP BY o_orderstatus)
              |SELECT fmt, o_orderstatus, n, sum_price, min_key, max_key
              |FROM agg CROSS JOIN (VALUES ('csv'), ('jsonl'), ('orc')) f(fmt)
              |ORDER BY fmt, o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q48 — MERGE-apply (upsert + delete): the monthly-dump maintenance
    // operation — a change batch (updates, inserts, tombstones) applied
    // to a base table in ONE pass: tombstones drop rows, updates replace,
    // everything else carries over. Stated as a full-outer-free plan:
    // changes ∪ (base left-anti changes) — one shuffle each side, no
    // row-by-row driver logic. The oracle restates it relationally.
    Q("q48_merge_apply",
      (s, dir) => {
        val base = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus"))
        // deterministic change batch: %7 rows are updates (+100 price),
        // %11 rows are tombstones, and shifted-key rows are inserts
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("op", lit("u"))
        val deletes = base.filter(col("o_orderkey") % 11 === 0)
          .withColumn("op", lit("d"))
        val inserts = base.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
          .withColumn("op", lit("u"))
        // precedence: a key both updated and tombstoned (%77) is deleted
        // ('d' < 'u', so ascending op puts the tombstone first)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderkey")).orderBy(col("op"))
        val changes = updates.unionByName(deletes).unionByName(inserts)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val applied = changes.filter(col("op") === "u").drop("op")
          .unionByName(base.join(changes.select(col("o_orderkey")),
            Seq("o_orderkey"), "left_anti"))
        applied.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""WITH changes AS (
              |  SELECT o_orderkey,
              |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
              |         ELSE o_totalprice + 100 END AS o_totalprice,
              |    o_orderstatus,
              |    CASE WHEN o_orderkey % 11 = 0 THEN 'd' ELSE 'u' END AS op
              |  FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 0
              |  UNION ALL
              |  SELECT o_orderkey + 20000000, o_totalprice, o_orderstatus, 'u'
              |  FROM orders WHERE o_orderkey % 13 = 0),
              |applied AS (
              |  SELECT o_orderkey, o_totalprice, o_orderstatus
              |  FROM changes WHERE op = 'u'
              |  UNION ALL
              |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
              |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes))
              |SELECT o_orderstatus, COUNT(*) AS n,
              |  ${sqlDsum("o_totalprice")} AS sum_price
              |FROM applied GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // ----------------------------------------------------------------
    // q49 — partitioned-sink round-trip with partition pruning: orders
    // written hive-partitioned by status (the K1 snapshot layout), read
    // back with a partition-key predicate — the scan must touch ONE
    // directory (pruning is what makes a date-partitioned 100 TB store
    // queryable at all) — and aggregated per month. The partition column
    // comes back as a directory VALUE, not file data; the hash gate
    // proves the layout round-trips values and the pruned read misses
    // nothing. Pruning itself is also pinned in SinkSpec.
    Q("q49_partitioned_sink",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderdate"), col("o_orderstatus"))
        val tmp = graft.sources.Scratch.dir("part_sink")
        o.write.mode("overwrite").partitionBy("o_orderstatus")
          .option("compression", "snappy").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("o_orderstatus") === "F")
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice")).as("sum_price"))
          .select(unix_timestamp(col("month")).as("month_epoch"),
            col("n"), col("sum_price"))
          .orderBy(col("month_epoch"))
      },
      Some(s"""SELECT epoch_us(date_trunc('month', o_orderdate)) // 1000000
              |    AS month_epoch,
              |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
              |FROM orders WHERE o_orderstatus = 'F'
              |GROUP BY 1 ORDER BY month_epoch""".stripMargin)),

    // ----------------------------------------------------------------
    // q90 — small-file COMPACTION of a partitioned sink (the data-lake
    // OPTIMIZE op — operators/TableCompaction): a day-partitioned events
    // table is written with deliberate small-file debt (12 files per
    // day — what a streaming sink or frequent incremental maintain
    // accretes), then compacted: the plan is METADATA-ONLY (file
    // listings, no data read), every in-debt partition is rewritten in
    // ONE job to its size-derived target file count, and the swap is
    // staged per partition. The oracle aggregates the raw events table —
    // the hash gate proves the compacted layout lost and invented
    // nothing. File-count collapse, clean-partition byte-identity and
    // idempotence are pinned in TableCompactionSpec.
    Q("q90_sink_compaction",
      (s, dir) => {
        // a rep consumes one pre-created debt layout (pool filled in
        // setup); outside the bench — or if the pool runs dry — it
        // builds its own inline, same layout either way
        val root = Option(q90DebtPool(dir).poll())
          .getOrElse(q90DebtLayout(s, dir))
        val report = graft.operators.TableCompaction.compact(
          s, root, "day", targetBytes = 64L * 1024 * 1024)
        require(report.touched.nonEmpty,
          "compaction scenario produced no small-file debt")
        s.read.parquet(root)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy(col("day"))
      },
      Some(s"""SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS day,
              |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1 ORDER BY day""".stripMargin),
      // pre-create ONE debt layout per bench rep (r17 verdict #3:
      // the rep used to re-write the full 12-files/day table before
      // compacting, so its timings measured a table write + compaction
      // and I/O-pressure days produced escalating rep shapes that READ
      // as generation accumulation). The writes are setup-shaped work
      // and now land in the setup metric under their own name; reps
      // time TableCompaction.compact + the compacted read only.
      setup = Some((ss, dir) => graft.SetupTimer.time("q90_debt_layouts") {
        (1 to graft.Bench.repCount).foreach(_ =>
          q90DebtPool(dir).add(q90DebtLayout(ss, dir)))
      })),

    // ----------------------------------------------------------------
    // q94 — persisted PER-FILE data-skipping index
    // (operators/SkippingIndex): point lookups on a column the table is
    // neither partitioned nor sorted by. The events table is written
    // range-clustered into plain files (no hive partitions), a sidecar
    // of per-file (min, max, Bloom sketch of the key set) is built with
    // one file-count-sized job, and the lookup scans ONLY range-covered
    // Bloom-positive files plus an exact residual filter — the q41
    // runtime Bloom filter made durable (Delta/Iceberg's data-skipping
    // stats as an engine-side operator). The oracle is the plain IN
    // lookup over the whole table: the hash gate proves skipping loses
    // no row; actual file-count pruning is pinned in SkippingIndexSpec.
    Q("q94_skipping_index",
      (s, dir) => {
        val e = Tables.eventsUs(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts_us"), col("value"))
        val root = graft.sources.Scratch.dir("skip_idx") + "/events"
        e.repartitionByRange(16, col("user_id"))
          .write.parquet(root)
        graft.operators.SkippingIndex.build(s, root, "user_id",
          expectedItemsPerFile = 10000L)
        graft.operators.SkippingIndex.lookup(s, root, "user_id",
            Seq(3L, 11L, 42L))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type,
             |  epoch_ns(ts) // 1000 AS ts_us, value
             |FROM events WHERE user_id IN (3, 11, 42)
             |ORDER BY event_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q97 — declarative data-quality EXPECTATIONS
    // (operators/Expectations): the constraint-validation gate a
    // pipeline runs before committing a corpus version (Delta Live
    // Tables expectations / dbt tests as an engine operator). Four
    // rules over events — a JSON-field range, a categorical domain, a
    // numeric bound, and TWO REFERENTIAL checks against the SAME
    // customer dim on different fact keys (user_id, and a derived
    // referrer key — the two-rules-one-dimension shape that exercises
    // the per-call join-marker uniqueness; each is a broadcast of the
    // dim's distinct keys and the fact side stays one scan) — all
    // counted in ONE pass: each rule is a conditional-sum aggregate
    // over the same map-side partial, so 50 rules on 100 TB still cost
    // one read. Not-true = violation (null never passes). The oracle
    // restates every count; ExpectationsSpec pins the one-scan plan and
    // the audit/quarantine split.
    Q("q97_expectations",
      (s, dir) => {
        import graft.operators.Expectations
        import graft.operators.Expectations.Rule
        val ev = Tables.load(s, dir, "events")
          .withColumn("referrer_id", col("user_id") * 7 + 1)
        val cust = Tables.load(s, dir, "customer")
        val (j1, refUser) = Expectations.refRule(ev, "user_id", cust,
          "c_custkey", "user_in_dim")
        val (joined, refReferrer) = Expectations.refRule(j1,
          "referrer_id", cust, "c_custkey", "referrer_in_dim")
        Expectations.report(joined, Seq(
          Rule("props_k_lt90",
            get_json_object(col("props"), "$.k").cast("long") < 90),
          Rule("type_known", col("event_type")
            .isin("click", "view", "purchase", "signup")),
          Rule("value_pos", col("value") > 0),
          refUser, refReferrer))
      },
      Some("""WITH t AS (SELECT e.*, c.c_custkey AS ref,
             |      c2.c_custkey AS ref2 FROM events e
             |    LEFT JOIN customer c ON e.user_id = c.c_custkey
             |    LEFT JOIN customer c2
             |      ON e.user_id * 7 + 1 = c2.c_custkey),
             |v AS (
             |  SELECT 'props_k_lt90' AS rule,
             |    SUM(CASE WHEN NOT COALESCE(
             |      CAST(json_extract_string(props, '$.k') AS BIGINT) < 90,
             |      FALSE) THEN 1 ELSE 0 END) AS violations,
             |    COUNT(*) AS n_rows FROM t
             |  UNION ALL SELECT 'type_known',
             |    SUM(CASE WHEN NOT COALESCE(event_type IN
             |      ('click', 'view', 'purchase', 'signup'), FALSE)
             |      THEN 1 ELSE 0 END), COUNT(*) FROM t
             |  UNION ALL SELECT 'value_pos',
             |    SUM(CASE WHEN NOT COALESCE(value > 0, FALSE)
             |      THEN 1 ELSE 0 END), COUNT(*) FROM t
             |  UNION ALL SELECT 'user_in_dim',
             |    SUM(CASE WHEN ref IS NULL THEN 1 ELSE 0 END),
             |    COUNT(*) FROM t
             |  UNION ALL SELECT 'referrer_in_dim',
             |    SUM(CASE WHEN ref2 IS NULL THEN 1 ELSE 0 END),
             |    COUNT(*) FROM t)
             |SELECT rule, CAST(violations AS BIGINT) AS violations,
             |  CAST(n_rows AS BIGINT) AS n_rows
             |FROM v ORDER BY rule""".stripMargin)),

    // ----------------------------------------------------------------
    // q98 — CONJUNCTIVE multi-column data skipping: one sidecar per key
    // column (q94's per-file min/max + Bloom), a lookup with predicates
    // on BOTH columns prunes with each sidecar independently and scans
    // only files no sidecar could rule out — sound because a file may
    // be skipped the moment ANY conjunct is provably absent from it
    // (Delta/Iceberg skip on per-file stats of every indexed column the
    // same way). The table is range-clustered by user_id, so the
    // user_id sidecar prunes by RANGE while the scattered event_id
    // sidecar prunes by BLOOM — the two pruning modes compose. Oracle =
    // the plain conjunctive IN lookup; the intersection pruning (fewer
    // files than either single-column lookup) is pinned in
    // SkippingIndexSpec.
    Q("q98_conjunctive_skipping",
      (s, dir) => {
        val e = Tables.eventsUs(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts_us"), col("value"))
        val root = graft.sources.Scratch.dir("skip_conj") + "/events"
        e.repartitionByRange(16, col("user_id"))
          .write.parquet(root)
        graft.operators.SkippingIndex.build(s, root, "user_id",
          expectedItemsPerFile = 10000L)
        graft.operators.SkippingIndex.build(s, root, "event_id",
          expectedItemsPerFile = 10000L)
        graft.operators.SkippingIndex.lookupAll(s, root, Seq(
            "user_id" -> Seq(3L, 11L, 42L),
            "event_id" -> Seq(5L, 12L, 47L, 81L, 999999999L)))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, event_type,
             |  epoch_ns(ts) // 1000 AS ts_us, value
             |FROM events WHERE user_id IN (3, 11, 42)
             |  AND event_id IN (5, 12, 47, 81, 999999999)
             |ORDER BY event_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q101 — STRING-KEY data skipping: the q94 sidecar over a document
    // FINGERPRINT column (the engine's own dedup/fingerprint stores key
    // on string hashes — q91's ledger, d01's exact-dup signature — so
    // the first real lookup against a persisted corpus is "which files
    // hold these fingerprints"). Both sides of the Bloom hash go
    // through the same typed xxhash64 path (build hashes the string
    // column, probe hashes string literals); the string min/max range
    // stats ride along but the scattered fingerprints make BLOOM the
    // effective pruner here — the complement of q94's range-clustered
    // case. Probes are acquired by doc id first (a bounded driver-side
    // scalar list, the lookup-key shape); the oracle restates that
    // acquisition as a self-join IN. Actual file pruning + the
    // wrong-probe-type loud failure are pinned in SkippingIndexSpec.
    Q("q101_string_key_skipping",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("fp"),
            col("lang"), col("source"), col("n_chars"))
        val root = graft.sources.Scratch.dir("skip_str") + "/docs"
        d.repartition(8, col("doc_id")).write.parquet(root)
        graft.operators.SkippingIndex.build(s, root, "fp",
          expectedItemsPerFile = 10000L)
        val probes = d.filter(col("doc_id").isin(3L, 111L, 222L))
          .select(col("fp")).collect().map(_.getString(0)).toSeq
        graft.operators.SkippingIndex.lookup(s, root, "fp", probes)
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, md5(text) AS fp, lang, source,
             |    n_chars FROM documents)
             |SELECT doc_id, fp, lang, source, n_chars FROM d
             |WHERE fp IN (SELECT fp FROM d WHERE doc_id IN (3, 111, 222))
             |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q104 — SEQUENCE PACKING (operators/Packing): GPT-style
    // concat-and-chunk — the corpus token stream cut into fixed-256-
    // token training sequences, each document learning its sequence
    // span and offset. The engine side is the two-phase EXACT
    // distributed prefix sum (range-shard → per-shard totals as a
    // bounded driver list → broadcast offsets + within-shard window),
    // never a single-partition window — the oracle restates the whole
    // operator WITH the naive global window, which is exactly the
    // proof the sharded plan loses nothing. Token counts are the
    // t02-proven whitespace tokenization; all downstream arithmetic is
    // integral (div/pmod), so the gate is hash-exact. PackingSpec pins
    // equality-to-naive at 10k rows, straddle/zero-token edges, and
    // gap-free sequence coverage.
    Q("q104_sequence_packing",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("n_tokens"))
        graft.operators.Packing.pack(d, "n_tokens", budget = 256L,
            orderCols = Seq(col("doc_id")), nShards = 16)
          .select(col("doc_id"), col("n_tokens"), col("cum"),
            col("start_seq"), col("start_off"), col("end_seq"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    CASE WHEN ${DedupQueries.normT} = ''
             |      THEN CAST(0 AS BIGINT)
             |      ELSE CAST(len(string_split_regex(${DedupQueries.normT},
             |        ' ')) AS BIGINT) END AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum FROM d)
             |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum,
             |  CAST((cum - n_tokens) // 256 AS BIGINT) AS start_seq,
             |  CAST((cum - n_tokens) % 256 AS BIGINT) AS start_off,
             |  CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // 256
             |    ELSE (cum - 1) // 256 END AS BIGINT) AS end_seq
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q105 — TOKEN-BUDGET SELECTION (operators/Packing): "take
    // documents longest-first until the 20k-token budget is spent" —
    // the deterministic corpus-curation cut a training run makes when
    // the budget, not the corpus, is the constraint. Same two-phase
    // prefix sum as q104 over the (n_tokens DESC, doc_id) priority
    // order; a document is kept iff its STARTING offset is inside the
    // budget (the first overflowing document is kept for training-time
    // truncation — stated, deterministic, restated by the oracle). The
    // `cum` column rides as selection evidence.
    Q("q105_token_budget_select",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("n_tokens"))
        graft.operators.Packing.selectToBudget(d, "n_tokens",
            budget = 20000L,
            orderCols = Seq(col("n_tokens").desc, col("doc_id")),
            nShards = 16)
          .select(col("doc_id"), col("n_tokens"), col("cum"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    CASE WHEN ${DedupQueries.normT} = ''
             |      THEN CAST(0 AS BIGINT)
             |      ELSE CAST(len(string_split_regex(${DedupQueries.normT},
             |        ' ')) AS BIGINT) END AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum FROM d)
             |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum
             |FROM c WHERE cum - n_tokens < 20000
             |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q106 — INCREMENTAL packing: an arriving dump of documents
    // extends the packed sequence stream WITHOUT re-packing history —
    // its prefix sum starts at the carried running total (one durable
    // long), so each append costs O(batch), never O(corpus): the
    // maintain-side economics of every persisted artifact here applied
    // to training-sequence assignment. Two deterministic arrivals
    // (even doc_ids, then odd); the oracle is the ONE-SHOT q104 window
    // over the arrival order — the hash proves the incremental
    // assignment equals re-packing from scratch (PackingSpec pins the
    // same equality over 3 batches at 10k rows).
    Q("q106_incremental_packing",
      (s, dir) => {
        val d = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .as("n_tokens"))
        val (p1, st1) = graft.operators.Packing.PackState(0L)
          .append(d.filter(col("doc_id") % 2 === 0), "n_tokens",
            budget = 256L, Seq(col("doc_id")), nShards = 16)
        val (p2, _) = st1
          .append(d.filter(col("doc_id") % 2 === 1), "n_tokens",
            budget = 256L, Seq(col("doc_id")), nShards = 16)
        p1.unionByName(p2)
          .select(col("doc_id"), col("n_tokens"), col("cum"),
            col("start_seq"), col("start_off"), col("end_seq"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    CASE WHEN ${DedupQueries.normT} = ''
             |      THEN CAST(0 AS BIGINT)
             |      ELSE CAST(len(string_split_regex(${DedupQueries.normT},
             |        ' ')) AS BIGINT) END AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY doc_id % 2, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum FROM d)
             |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum,
             |  CAST((cum - n_tokens) // 256 AS BIGINT) AS start_seq,
             |  CAST((cum - n_tokens) % 256 AS BIGINT) AS start_off,
             |  CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // 256
             |    ELSE (cum - 1) // 256 END AS BIGINT) AS end_seq
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // p04 — the WHOLE training-data pipeline as one gate: the
    // composition a real corpus build runs end-to-end, each stage an
    // operator this engine already gates individually —
    //   1. QUALITY filter (≥10 whitespace tokens — t02's counting),
    //   2. exact DEDUP keeping the smallest doc_id per fingerprint
    //      (d01's signature + keeper rule),
    //   3. DECONTAMINATION against a held-out eval slice
    //      (doc_id % 97 = 0): any training doc sharing a fingerprint
    //      with a held-out doc is dropped, and the held-out docs
    //      themselves never train (t15/q-contamination's exact-leak
    //      form as a broadcast-able anti-join),
    //   4. sequence PACKING of the survivors into 256-token training
    //      sequences in doc_id order (q104's two-phase prefix sum).
    // Plan shape: three scan-stage projections + one aggregate + one
    // anti-join + the sharded prefix sum — nothing quadratic, nothing
    // single-partition, every shuffle keyed. The oracle restates all
    // four stages as one WITH-chain; the hash gate proves the
    // composition, not just the parts.
    Q("p04_training_pipeline",
      (s, dir) => {
        import graft.functions.{TextFunctions => TF}
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            TF.fingerprint(col("text")).as("fp"),
            TF.tokenCount(col("text")).as("n_tokens"))
        val quality = docs.filter(col("n_tokens") >= 10)
        val deduped = quality
          .groupBy(col("fp"))
          .agg(min(struct(col("doc_id"), col("n_tokens"))).as("__m"))
          .select(col("__m.doc_id").as("doc_id"), col("fp"),
            col("__m.n_tokens").as("n_tokens"))
        val heldOutFps = docs.filter(col("doc_id") % 97 === 0)
          .select(col("fp")).distinct()
        val train = deduped
          .filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(heldOutFps), Seq("fp"), "left_anti")
        graft.operators.Packing.pack(train, "n_tokens", budget = 256L,
            orderCols = Seq(col("doc_id")), nShards = 16)
          .select(col("doc_id"), col("n_tokens"), col("cum"),
            col("start_seq"), col("start_off"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
             |    md5(${DedupQueries.normT}) AS fp,
             |    CASE WHEN ${DedupQueries.normT} = ''
             |      THEN CAST(0 AS BIGINT)
             |      ELSE CAST(len(string_split_regex(${DedupQueries.normT},
             |        ' ')) AS BIGINT) END AS n_tokens
             |  FROM documents),
             |q AS (SELECT * FROM d WHERE n_tokens >= 10),
             |dd AS (SELECT fp, min(doc_id) AS doc_id,
             |    min_by(n_tokens, doc_id) AS n_tokens
             |  FROM q GROUP BY fp),
             |held AS (SELECT DISTINCT fp FROM d WHERE doc_id % 97 = 0),
             |train AS (SELECT dd.* FROM dd
             |  WHERE dd.doc_id % 97 <> 0
             |    AND NOT EXISTS (SELECT 1 FROM held h
             |      WHERE h.fp = dd.fp)),
             |c AS (SELECT doc_id, n_tokens,
             |    SUM(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum FROM train)
             |SELECT doc_id, n_tokens, CAST(cum AS BIGINT) AS cum,
             |  CAST((cum - n_tokens) // 256 AS BIGINT) AS start_seq,
             |  CAST((cum - n_tokens) % 256 AS BIGINT) AS start_off
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q65 — SCD type-2 dimension build from a change log: each user's
    // event stream becomes versioned attribute history — a new version
    // opens only when the attribute CHANGES (lag-compare), versions get
    // [valid_from, valid_to) intervals via lead(), the open version is
    // flagged current. This is the standard warehouse dimension-history
    // operator (Kimball SCD2) the reference's monthly snapshot pipeline
    // sidesteps by full recompute. Plan: one window pass keyed by
    // user_id (change flag + running version number ride the same sort),
    // one aggregate per version, one lead() window on the per-version
    // table — shuffles scale by keys, never by history length. All
    // timestamps stay integer nanos end-to-end, so the gate is exact.
    Q("q65_scd2_dimension",
      (s, dir) => {
        // microsecond precision on both sides: DuckDB's parquet reader
        // surfaces TIMESTAMP(NANOS) at us precision, so the shared
        // ordering/interval domain is integer microseconds (event_id
        // breaks any within-us tie identically on both engines)
        Scd2.build(scd2Events(s, dir), "user_id", "event_type",
            "ts_us", "event_id")
          .orderBy(col("user_id"), col("ver"))
      },
Some(scd2RebuildOracle)),

    // ----------------------------------------------------------------
    // q66 — count-min sketch heavy hitters: a 4×1024 integer counter
    // grid built in ONE bounded aggregation (4,096 groups at ANY input
    // size — the sketch answer to "top users" without a full groupBy
    // over the key space; disjoint partitions merge cell-wise). The
    // exact top-20 keys are then point-estimated against the broadcast
    // grid; output carries exact count, CMS estimate, overestimate and
    // the est ≥ exact guarantee. Hashing is the engine-portable
    // md5-prefix pattern, so every counter — and therefore every
    // estimate — is an exact integer the oracle reproduces bit-for-bit.
    // (The oracle's `e CROSS JOIN d` is a CONSTANT ×4 fan-out — d is
    // generate_series(0,3), the sketch depth — mirroring the Spark
    // side's 4-element explode, not a data-dependent cartesian.)
    Q("q66_countmin_heavy_hitters",
      (s, dir) => {
        import graft.operators.CountMin
        val e = Tables.load(s, dir, "events")
        val cms = CountMin.counters(e, "user_id", depth = 4, width = 1024)
        val top = e.groupBy(col("user_id"))
          .agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("user_id"))
          .limit(20)
        CountMin.estimate(top, "user_id", cms, depth = 4, width = 1024)
          .join(top, "user_id")
          .select(col("user_id"), col("exact_n"), col("cms_est"),
            (col("cms_est") - col("exact_n")).as("overestimate"),
            (col("cms_est") >= col("exact_n")).as("est_ok"))
          .orderBy(col("exact_n").desc, col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id AS k FROM events),
             |d AS (SELECT unnest(generate_series(0, 3)) AS i),
             |c AS (SELECT i,
             |    CAST(('0x' || substr(md5(i || ':' || k), 1, 15)) AS BIGINT)
             |      % 1024 AS b,
             |    COUNT(*) AS n
             |  FROM e CROSS JOIN d GROUP BY 1, 2),
             |ex AS (SELECT k, COUNT(*) AS exact_n FROM e GROUP BY k),
             |top AS (SELECT k, exact_n FROM ex
             |        ORDER BY exact_n DESC, k LIMIT 20),
             |est AS (SELECT t.k, t.exact_n, MIN(c.n) AS cms_est
             |  FROM top t CROSS JOIN d
             |  JOIN c ON c.i = d.i AND c.b =
             |    CAST(('0x' || substr(md5(d.i || ':' || t.k), 1, 15)) AS BIGINT)
             |      % 1024
             |  GROUP BY t.k, t.exact_n)
             |SELECT k AS user_id, exact_n, cms_est,
             |  cms_est - exact_n AS overestimate,
             |  cms_est >= exact_n AS est_ok
             |FROM est ORDER BY exact_n DESC, user_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q68 — quantile binning (feature discretization): each event gets an
    // equal-frequency decile per type under the deterministic total order
    // (value, event_id tiebreak); per-bin boundaries and mass come back
    // as the bin dictionary a feature pipeline ships.
    //
    // NOT ntile().over(partitionBy(event_type)): with ~5 distinct types
    // that window sorts ~N/5 of ALL events in ONE task — a straggler/OOM
    // cliff at 100×. Instead the exact rank is computed scalably in two
    // fully-parallel passes over a deterministic value-histogram grid:
    //   1. bucket = monotone value bin (256 cells over the global
    //      [min,max]; a pure function of the value — no sampling, no
    //      partition-id dependence, so recomputation is stable);
    //   2. per-(type,bucket) counts (a ~1280-group aggregate) → running
    //      offsets + per-type totals via a window over that TINY table;
    //   3. rank = broadcast-joined bucket offset + row_number within
    //      (type,bucket) — each window partition holds ~N/1280 rows,
    //      parallel across the grid — then NTILE's exact floor/ceil
    //      bucket-size rule applied arithmetically from (rank, total).
    // Adversarially-constant values collapse buckets (documented limit);
    // uniform-ish features parallelize 256-ways per type. The oracle
    // stays the direct NTILE statement — the hash gate proves the
    // decomposition reproduces it bit-for-bit.
    Q("q68_quantile_binning",
      (s, dir) => {
        val nCells = 256
        val e = Tables.load(s, dir, "events")
          .select(col("event_type"), col("value"), col("event_id"))
        val bounds = e.agg(min(col("value")).as("mn"),
          max(col("value")).as("mx"))
        val cell = when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("mn")) * nCells /
              (col("mx") - col("mn"))).cast("long"),
            lit(nCells - 1L)))
        val withCell = e.crossJoin(broadcast(bounds))
          .withColumn("__cell", cell)
          .select(col("event_type"), col("value"), col("event_id"),
            col("__cell"))
        // tiny per-(type,cell) histogram → running offsets + totals
        val wOff = Window.partitionBy(col("event_type"))
          .orderBy(col("__cell"))
        val offs = withCell.groupBy(col("event_type"), col("__cell"))
          .agg(count(lit(1)).as("__c"))
          .withColumn("__off", coalesce(sum(col("__c")).over(
            wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("__n", sum(col("__c")).over(
            Window.partitionBy(col("event_type"))))
          .select(col("event_type"), col("__cell"), col("__off"),
            col("__n"))
        // exact global rank per type = cell offset + local row_number;
        // then NTILE(10)'s bucket rule: first (n % 10) bins hold
        // ceil(n/10) rows, the rest floor(n/10)
        val wLoc = Window.partitionBy(col("event_type"), col("__cell"))
          .orderBy(col("value"), col("event_id"))
        withCell.join(broadcast(offs), Seq("event_type", "__cell"))
          .withColumn("__rn",
            col("__off") + row_number().over(wLoc).cast("long"))
          .withColumn("__q", expr("__n div 10"))
          .withColumn("__r", expr("__n % 10"))
          .withColumn("bin",
            when(col("__rn") <= (col("__q") + 1) * col("__r"),
              expr("(__rn - 1) div (__q + 1) + 1"))
            .otherwise(expr(
              "__r + (__rn - __r * (__q + 1) - 1) div greatest(__q, 1) + 1"))
            .cast("int"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("lo"), max(col("value")).as("hi"),
            dsum(col("value")).as("sum_value"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some(s"""SELECT event_type, bin, COUNT(*) AS n,
              |  MIN(value) AS lo, MAX(value) AS hi,
              |  ${sqlDsum("value")} AS sum_value
              |FROM (SELECT event_type, value,
              |    CAST(ntile(10) OVER (PARTITION BY event_type
              |      ORDER BY value, event_id) AS INT) AS bin
              |  FROM events)
              |GROUP BY event_type, bin
              |ORDER BY event_type, bin""".stripMargin)),

    // ----------------------------------------------------------------
    // q69 — time-RANGE rolling window (the sliding-hour feature): per
    // user, each event carries the count and exact sum of that user's
    // events in the PRECEDING HOUR — a RANGE frame over integer
    // microseconds, not a ROWS frame (q46's family), so peers at the
    // same instant aggregate identically on both engines with no
    // tiebreak sensitivity. One window shuffle per user key.
    //
    // State bound: WindowExec holds the FRAME's rows per partition —
    // here one hour of one user's events — so executor memory is sized
    // by the HOTTEST key's in-frame event rate, not by data volume. At
    // 100× a pathological key (bot traffic at ~10k events/min is ~600k
    // in-frame rows) is the hazard; the remedy is the dedup-style cap:
    // pre-aggregate the hot key's events to a coarser grain (e.g.
    // per-second count/sum partials — the frame then holds ≤3600 rows
    // per user regardless of rate, and count/sum over partials is
    // exact) or cap-and-flag keys beyond a rate threshold upstream,
    // exactly like Dedup's maxShingleDf hot-bucket cap.
    Q("q69_rolling_time_window",
      (s, dir) => {
        val e = Tables.eventsUs(s, dir)
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            col("ts_us").as("us"), col("value"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L)
        e.select(col("user_id"), col("event_id"), col("us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(dec(col("value"))).over(w).cast("double").as("sum_1h"))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, us,
             |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w
             |    AS DECIMAL(38,6)) AS DOUBLE) AS sum_1h
             |FROM (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
             |        value
             |      FROM events WHERE user_id < 10)
             |WINDOW w AS (PARTITION BY user_id ORDER BY us
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, us, event_id""".stripMargin)),

    // ----------------------------------------------------------------
    // q70 — INCREMENTAL SCD2 maintenance: the change log is split at
    // its midpoint timestamp into "already loaded" and "new batch"; the
    // base SCD2 table is built from the first half, then the batch is
    // applied via Scd2.maintain — touched keys rebuilt from their full
    // history, untouched keys carried over verbatim (the partition-
    // upsert strategy; at scale only touched keys shuffle). The oracle
    // is q65's FULL-rebuild restatement — sharing it is the correctness
    // statement this gate hash-proves: maintain(build(old), batch) ≡
    // build(old ∪ batch), cross-engine, bit-for-bit.
    Q("q70_scd2_incremental",
      (s, dir) => {
        val all = scd2Events(s, dir)
        val bounds = all.agg(min(col("ts_us")).as("mn"),
          max(col("ts_us")).as("mx"))
        val withT0 = all.crossJoin(broadcast(bounds))
          .withColumn("t0", expr("(mn + mx) div 2"))
        val baseEv = withT0.filter(col("ts_us") < col("t0"))
          .select(all.columns.map(col): _*)
        val batchEv = withT0.filter(col("ts_us") >= col("t0"))
          .select(all.columns.map(col): _*)
        val baseScd = Scd2.build(baseEv, "user_id", "event_type",
          "ts_us", "event_id")
        Scd2.maintain(baseScd, baseEv, batchEv, "user_id", "event_type",
            "ts_us", "event_id")
          .orderBy(col("user_id"), col("ver"))
      },
      Some(scd2RebuildOracle)),

    // ----------------------------------------------------------------
    // q73 — MERGEABLE sketch rollup (the pre-aggregate-then-merge
    // pattern that makes 100 TB distinct counts affordable): stage 1
    // builds one Datasketches HLL per (event_type, day) — the small
    // artifact a pipeline persists per ingest partition; stage 2 merges
    // the sketches per type with hll_union_agg and estimates, WITHOUT
    // re-touching a single raw event row. That restructuring is the
    // whole point: a month-over-month distinct-user rollup re-reads
    // ~30 sketch rows per type instead of the raw 100 TB, and sketch
    // union is associative/commutative so any partitioning works.
    // Like q23, the sketch estimate itself is checked in-engine (the
    // register state is order-independent, but Datasketches abandons
    // its HIP estimator on union, so a merged sketch can differ from a
    // single-pass one by a few counts — HllMergeSpec pins exact-in-
    // sparse-mode and the dense-mode error bound), and the gate hashes
    // the exact columns + the ok flag.
    Q("q73_hll_mergeable",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val daily = e.groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        val merged = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        val exact = e.groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("exact_users"))
        merged.join(exact, "event_type")
          .select(col("event_type"), col("n_days"), col("exact_users"),
            (abs(col("est") - col("exact_users")) <=
              greatest(col("exact_users").cast("double") * 0.05, lit(4.0)))
              .as("approx_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
             |  COUNT(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q78 — mergeable KLL quantile rollup, the rank counterpart of
    // q73's HLL distinct rollup: per-(type, day) sketches at ingest
    // grain, merged per type WITHOUT re-touching raw rows. Values ride
    // as exact integer cents (decimal *100 — value has 2 decimals) so
    // every gated column is integer-exact; the exact reference median
    // comes from the bounded cents dictionary (value-frequency table +
    // running counts — a window over the SMALL dictionary, never a
    // whole-type row sort, the q68 lesson) with the pure-integer rank
    // rule ceil(q*n) = (q%*n + 99) div 100. KLL compaction is
    // randomized, so the sketch estimate is gated as a tolerance flag
    // (inside the exact p45..p55 band — rank error at k=200 is ~1.65%,
    // the band is ±5%), the q73 contract.
    Q("q78_kll_quantiles",
      (s, dir) => {
        import graft.functions.KllAggregate._
        val e = Tables.load(s, dir, "events")
        val ev = e.select(col("event_type"), to_date(col("ts")).as("day"),
          (dec(col("value")) * 100).cast("long").as("cents"))
        val daily = ev.groupBy(col("event_type"), col("day"))
          .agg(kllBuild(col("cents").cast("double"), 200).as("sk"))
        val merged = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), kllMerge(col("sk")).as("msk"))
          .select(col("event_type"), col("n_days"),
            kllQuantile(col("msk"), 0.5).cast("long").as("sk_p50"))
        val freq = ev.groupBy(col("event_type"), col("cents"))
          .agg(count(lit(1)).as("c"))
        val cum = freq
          .withColumn("cum",
            sum(col("c")).over(Window.partitionBy("event_type")
              .orderBy("cents")))
          .withColumn("n",
            sum(col("c")).over(Window.partitionBy("event_type")))
        def sel(p: Int, name: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("cents"))).as(name)
        val exact = cum.groupBy(col("event_type"))
          .agg(max(col("n")).as("n_rows"), sel(45, "p45"),
            sel(50, "p50_cents"), sel(55, "p55"))
        merged.join(exact, "event_type")
          .select(col("event_type"), col("n_days"), col("n_rows"),
            col("p50_cents"),
            (col("sk_p50") >= col("p45") && col("sk_p50") <= col("p55"))
              .as("sk_ok"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day,
              |    CAST(${sqlDec("value")} * 100 AS BIGINT) AS cents
              |  FROM events),
              |freq AS (SELECT event_type, cents, COUNT(*) AS c
              |         FROM ev GROUP BY 1, 2),
              |cum AS (SELECT event_type, cents,
              |    CAST(SUM(c) OVER (PARTITION BY event_type
              |                      ORDER BY cents) AS BIGINT) AS cum,
              |    CAST(SUM(c) OVER (PARTITION BY event_type)
              |         AS BIGINT) AS n
              |  FROM freq),
              |ex AS (SELECT event_type, MAX(n) AS n_rows,
              |    MIN(CASE WHEN cum >= (50 * n + 99) // 100
              |        THEN cents END) AS p50_cents
              |  FROM cum GROUP BY event_type),
              |nd AS (SELECT event_type, COUNT(DISTINCT day) AS n_days
              |       FROM ev GROUP BY 1)
              |SELECT ex.event_type, nd.n_days, ex.n_rows, ex.p50_cents,
              |  TRUE AS sk_ok
              |FROM ex JOIN nd ON nd.event_type = ex.event_type
              |ORDER BY ex.event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q79 — theta-sketch audience overlap: the set operation HLL cannot
    // do. Per-(type, day) theta sketches of user_id union-merge per
    // type (never re-touching raw rows), then every type PAIR's overlap
    // ("users who did both") comes from scalar sketch intersection.
    // The pair join is a constant 5x5 type fan-out, not data-dependent.
    // Below nominal entries (4096) theta is in exact mode, so at every
    // test SF (<=1500 users) the estimate is exact and partitioning-
    // independent — the est_ok tolerance flag (q73 contract) is
    // deterministic here and headroom for the estimation regime.
    Q("q79_theta_overlap",
      (s, dir) => {
        import graft.functions.ThetaAggregate._
        val e = Tables.load(s, dir, "events")
        val daily = e.groupBy(col("event_type"),
            to_date(col("ts")).as("day"))
          .agg(thetaBuild(col("user_id")).as("sk"))
        val perType = daily.groupBy(col("event_type"))
          .agg(thetaUnion(col("sk")).as("sk"))
        val est = perType.as("x").join(perType.as("y"),
            col("x.event_type") < col("y.event_type"))
          .select(col("x.event_type").as("ta"),
            col("y.event_type").as("tb"),
            thetaEstimate(thetaIntersect(col("x.sk"), col("y.sk")))
              .as("est"))
        val ut = e.select(col("event_type"), col("user_id")).distinct()
        val exact = ut.as("x").join(ut.as("y"),
            col("x.user_id") === col("y.user_id") &&
              col("x.event_type") < col("y.event_type"))
          .groupBy(col("x.event_type").as("ta"),
            col("y.event_type").as("tb"))
          .agg(count(lit(1)).as("exact_overlap"))
        est.join(exact, Seq("ta", "tb"))
          .select(col("ta"), col("tb"), col("exact_overlap"),
            (abs(col("est") - col("exact_overlap")) <=
              greatest(col("exact_overlap").cast("double") * 0.05,
                lit(4.0))).as("est_ok"))
          .orderBy(col("ta"), col("tb"))
      },
      Some("""WITH ut AS (SELECT DISTINCT event_type, user_id
             |            FROM events)
             |SELECT x.event_type AS ta, y.event_type AS tb,
             |  COUNT(*) AS exact_overlap, TRUE AS est_ok
             |FROM ut x JOIN ut y
             |  ON x.user_id = y.user_id AND x.event_type < y.event_type
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ----------------------------------------------------------------
    // q81 — theta-sketch DIFFERENCE (A \ B), completing the audience
    // algebra (q73/q74 union, q79 intersection): per-day "viewed but
    // never clicked that day" from per-(day, type) sketches — the
    // unconverted-audience / retention shape, answered from persisted
    // segment sketches without re-scanning raw rows. The exact verifier
    // is the day-keyed anti-join; the estimate gates as a tolerance
    // flag that is deterministic in theta's exact mode (<=1500 users
    // at every test SF). Day rides as an integer epoch-day so no
    // engine-specific date hashing enters the gate.
    Q("q81_theta_unconverted",
      (s, dir) => {
        import graft.functions.ThetaAggregate._
        val e = Tables.load(s, dir, "events")
        val daily = e.filter(col("event_type").isin("view", "click"))
          .groupBy(to_date(col("ts")).as("d"), col("event_type"))
          .agg(thetaBuild(col("user_id")).as("sk"))
        val v = daily.filter(col("event_type") === "view")
          .select(col("d"), col("sk").as("vsk"))
        val c = daily.filter(col("event_type") === "click")
          .select(col("d"), col("sk").as("csk"))
        val est = v.join(c, Seq("d"), "left_outer")
          .select(col("d"),
            coalesce(
              thetaEstimate(thetaDiff(col("vsk"), col("csk"))),
              thetaEstimate(col("vsk"))).as("est"))
        val viewers = e.filter(col("event_type") === "view")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val clickers = e.filter(col("event_type") === "click")
          .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        val exact = viewers.join(clickers, Seq("d", "user_id"), "left_anti")
          .groupBy(col("d"))
          .agg(count(lit(1)).as("exact_unconverted"))
        est.join(exact, Seq("d"))
          .select(datediff(col("d"), lit("1970-01-01")).cast("long")
              .as("day_num"),
            col("exact_unconverted"),
            (abs(col("est") - col("exact_unconverted")) <=
              greatest(col("exact_unconverted").cast("double") * 0.05,
                lit(4.0))).as("est_ok"))
          .orderBy(col("day_num"))
      },
      Some("""WITH viewers AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
             |  FROM events WHERE event_type = 'view'),
             |clickers AS (
             |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
             |  FROM events WHERE event_type = 'click')
             |SELECT CAST(datediff('day', DATE '1970-01-01', v.d)
             |            AS BIGINT) AS day_num,
             |  COUNT(*) AS exact_unconverted, TRUE AS est_ok
             |FROM viewers v
             |LEFT JOIN clickers c ON c.d = v.d AND c.user_id = v.user_id
             |WHERE c.user_id IS NULL
             |GROUP BY v.d ORDER BY day_num""".stripMargin)),

    // ----------------------------------------------------------------
    // q82 — PERSISTED sketch-store serve: q73/q78's rollups answered
    // from a persisted artifact instead of in-query sketches. The
    // per-(type, day) sketch table is built once (the ingest side) and
    // the rollup's SERVE PLAN reads ONLY that artifact — exact counts
    // by integer sum, distinct users from the HLL union, the median
    // cents from the KLL merge; SketchStoreSpec pins that the serve
    // plan contains exactly one scan and it is the sketch table. The
    // raw events are touched here solely to compute the gate's exact
    // references (exact_users, the p45..p55 cents band) that the
    // sketch estimates are tolerance-checked against — the q73
    // contract, since KLL compaction is randomized and HLL drops HIP
    // on union.
    Q("q82_sketch_store_serve",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        // build-once / serve-many literal: the artifact is the
        // once-per-JVM template (sketch_store_full setup line); the
        // rep measures the artifact-only serve — read-only, no clone
        sketchStoreGate(e,
          graft.operators.SketchStore.serve(s, skFull(s, dir)))
      },
      Some(sketchStoreOracle),
      setup = Some((ss, dir) => { skFull(ss, dir); () })),

    // ----------------------------------------------------------------
    // q83 — sketch-store MAINTENANCE: the event history splits at its
    // midpoint day; the store is built from the older half, then the
    // newer days are ingested via maintain — a pure day-partition
    // APPEND whose rows are computed from the new events alone, with
    // every existing day file byte-untouched (the k03 generation
    // contract). Sharing q82's oracle is the correctness statement the
    // gate hash-proves: maintain(build(days<mid), days>=mid) serves
    // identically to build(all) — exact because per-day sketch rows
    // depend only on that day's events.
    Q("q83_sketch_store_maintain",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val bounds = e.agg(min(to_date(col("ts"))).as("mn"),
          max(to_date(col("ts"))).as("mx"))
        val withMid = e.crossJoin(broadcast(bounds))
          .withColumn("__mid", date_add(col("mn"),
            (datediff(col("mx"), col("mn")) / 2).cast("int")))
        val fresh = withMid.filter(to_date(col("ts")) >= col("__mid"))
          .select(e.columns.map(col): _*)
        // the op under test is the day-partition APPEND: each rep
        // link-clones the committed older-half template and maintains
        // the new days into the clone
        val root = RepClones.fresh(s, skOldDays(s, dir),
          "q83_sketch_store_maintain")
        graft.StageTimer.time("q83_sketch_store_maintain", "maintain") {
          graft.operators.SketchStore.maintain(root, fresh)
        }
        sketchStoreGate(e, graft.operators.SketchStore.serve(s, root))
      },
      Some(sketchStoreOracle),
      setup = Some((ss, dir) => { skOldDays(ss, dir); () })),

    // ----------------------------------------------------------------
    // q84 — sketch-store LATE-DATA upsert: unlike q83's whole-day
    // append, real ingest (a micro-batch stream, a backfill) re-feeds
    // days the store already holds. Every store column is a mergeable
    // monoid (counts sum; HLL registers max; KLL/theta union), so a
    // batch's partial day rows merge with the existing rows of exactly
    // the touched days — read partition-pruned, rewritten via dynamic
    // partition overwrite, untouched day partitions left alone
    // (O(batch + touched days) per batch, the q56 economics applied to
    // the artifact). The history is dealt into three hash-disjoint
    // subsets, built from the first and upserted twice with the
    // others — every day is re-fed — and sharing q82's oracle
    // hash-proves upsert(upsert(build(⅓))) serves ≡ build(all): exact
    // columns exactly (counts sum associatively), HLL identically
    // (register max is order-independent), KLL/theta inside their
    // gated bands.
    Q("q84_sketch_store_upsert",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        val h = pmod(xxhash64(col("event_id")), lit(4))
        // the op under test is the LATE-DATA upsert: each rep
        // link-clones the committed two-quarter template and re-feeds
        // the other two quarters into the clone
        val root = RepClones.fresh(s, skTwoQuarters(s, dir),
          "q84_sketch_store_upsert")
        graft.StageTimer.time("q84_sketch_store_upsert", "upserts") {
          graft.operators.SketchStore.upsertDays(s, root, e.filter(h === 2))
          graft.operators.SketchStore.upsertDays(s, root, e.filter(h === 3))
        }
        sketchStoreGate(e, graft.operators.SketchStore.serve(s, root))
      },
      Some(sketchStoreOracle),
      setup = Some((ss, dir) => { skTwoQuarters(ss, dir); () })),

    // ----------------------------------------------------------------
    // q85 — sketch-store RANGE serve with partition pruning: "distinct
    // users / median over the first half of the history" answered from
    // the in-range day DIRECTORIES alone — day is the artifact's
    // partition column, and the range rides as a STATIC literal filter
    // (a join-derived bound would not prune partitions), so the scan
    // never opens an out-of-range day file (SketchStoreSpec pins the
    // PartitionFilters and the pruned file count). The two range
    // bounds come from a bounded one-row collect (two dates — the
    // documented driver-side-scalar shape, not a data collect). The
    // raw side of the gate restricts to the same range to produce the
    // exact references.
    Q("q85_sketch_store_range",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        // read-only range serve over the shared full template
        val root = skFull(s, dir)
        val r = e.agg(min(to_date(col("ts"))).as("mn"),
          max(to_date(col("ts"))).as("mx")).head()
        val mn = r.getDate(0)
        val mid = java.sql.Date.valueOf(mn.toLocalDate.plusDays(
          java.time.temporal.ChronoUnit.DAYS.between(
            mn.toLocalDate, r.getDate(1).toLocalDate) / 2))
        val served = graft.operators.SketchStore.serveRange(
          s, root, mn, mid)
        sketchStoreGate(
          e.filter(to_date(col("ts")).between(lit(mn), lit(mid))),
          served)
      },
      setup = Some((ss, dir) => { skFull(ss, dir); () }),
      oracle = Some("""WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS mn,
             |    MAX(CAST(ts AS DATE)) AS mx FROM events),
             |ev AS (SELECT e.* FROM events e, b
             |  WHERE CAST(e.ts AS DATE) BETWEEN b.mn
             |    AND b.mn + CAST((b.mx - b.mn) // 2 AS INTEGER))
             |SELECT event_type,
             |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
             |  COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS exact_users,
             |  TRUE AS users_ok, TRUE AS p50_ok
             |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ----------------------------------------------------------------
    // q87 — sketch-store COMPACTION: the storage-lifecycle op the day
    // tier needs at 100 TB (years of days = thousands of files per
    // type; cold rollups don't need day grain). Days older than the
    // history midpoint are tiered into per-(type, month) rollup rows —
    // existing-month-tier merge + day-partition drop committed through
    // the same intent/stage two-phase idiom as q86's ingest — and the
    // serve reads BOTH tiers transparently. Because every store column
    // is an associatively-mergeable monoid, compaction is exact for
    // the gate: counts sum, HLL union is register-max (est_users is
    // bit-identical pre/post — SketchStoreSpec pins that), KLL/theta
    // stay in their gated bands. Sharing q82's oracle hash-proves
    // serve(compact(build(all))) ≡ build(all)'s rollup; the spec adds
    // the file-level half (recent day files byte-untouched, old day
    // partitions gone) and SketchSoak measures the file-count collapse.
    Q("q87_sketch_store_compact",
      (s, dir) => {
        val e = Tables.load(s, dir, "events")
        // the op under test is the month-tier COMPACTION: each rep
        // link-clones the committed full template and compacts the clone
        val root = RepClones.fresh(s, skFull(s, dir),
          "q87_sketch_store_compact")
        val r = e.agg(min(to_date(col("ts"))).as("mn"),
          max(to_date(col("ts"))).as("mx")).head()
        val mn = r.getDate(0)
        val cutoff = java.sql.Date.valueOf(mn.toLocalDate.plusDays(
          java.time.temporal.ChronoUnit.DAYS.between(
            mn.toLocalDate, r.getDate(1).toLocalDate) / 2))
        graft.StageTimer.time("q87_sketch_store_compact", "compact") {
          graft.operators.SketchStore.compact(s, root, cutoff)
        }
        sketchStoreGate(e, graft.operators.SketchStore.serve(s, root))
      },
      Some(sketchStoreOracle),
      setup = Some((ss, dir) => { skFull(ss, dir); () }))
  )

  // ---- sketch-store TEMPLATES (the r19 ANN/GCD link-clone trade
  // applied to the day-tier sketch artifact): each lifecycle gate's
  // byte-identical scenario build is committed once per JVM as its own
  // priced setup line; mutating gates (q83/q84/q86/q87) link-clone it
  // per rep (RepClones — store files are immutable: maintain appends
  // day partitions, upsert/compact replace via dynamic-overwrite/
  // stage-swap, so hard links never alias a rewritten byte) and run
  // the maintenance op under test on the clone; read-only serves
  // (q82/q85) read the template directly — build-once/serve-many made
  // literal.
  private val skTemplateCache =
    scala.collection.mutable.Map.empty[(String, String), String]
  private[queries] def skTemplate(dir: String, key: String)(
      build: => String): String =
    skTemplateCache.synchronized {
      skTemplateCache.getOrElseUpdate((dir, key),
        graft.SetupTimer.time(s"sketch_store_$key") {
          val root = build
          graft.operators.SketchStore.retain(root)
          root
        })
    }

  private[queries] def skFull(s: SparkSession, dir: String): String =
    skTemplate(dir, "full") {
      graft.operators.SketchStore.build(Tables.load(s, dir, "events"))
    }

  /** q83's template: the store built from the older half of the
   * history (day grain). */
  private[queries] def skOldDays(s: SparkSession, dir: String): String =
    skTemplate(dir, "old_days") {
      val e = Tables.load(s, dir, "events")
      val bounds = e.agg(min(to_date(col("ts"))).as("mn"),
        max(to_date(col("ts"))).as("mx"))
      val withMid = e.crossJoin(broadcast(bounds))
        .withColumn("__mid", date_add(col("mn"),
          (datediff(col("mx"), col("mn")) / 2).cast("int")))
      graft.operators.SketchStore.build(
        withMid.filter(to_date(col("ts")) < col("__mid"))
          .select(e.columns.map(col): _*))
    }

  /** q84's template: the store built from the first two of the four
   * hash-disjoint event subsets. */
  private[queries] def skTwoQuarters(s: SparkSession, dir: String): String =
    skTemplate(dir, "two_quarters") {
      val e = Tables.load(s, dir, "events")
      val h = pmod(xxhash64(col("event_id")), lit(4))
      graft.operators.SketchStore.build(e.filter(h === 0 || h === 1))
    }

  /** Shared q82-q86 gate shape: the store's artifact-only serve output
   * joined with exact references computed from raw events (exact
   * distinct users; the q78 bounded-cents-dictionary p45..p55 band) —
   * the raw side exists ONLY to give the gate its exact reference, the
   * serve plan itself never touches it. `e` is the raw event set the
   * serve output is supposed to summarize (range-restricted for q85;
   * q86 in StreamingQueries gates its streamed ingest through the same
   * shape). */
  private[queries] def sketchStoreGate(e: DataFrame,
      served: DataFrame): DataFrame = {
    val exact = e.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("exact_users"))
    val ev = e.select(col("event_type"),
      (dec(col("value")) * 100).cast("long").as("cents"))
    val cum = ev.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("event_type").orderBy("cents")))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy("event_type")))
    def sel(p: Int, name: String) =
      min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
        col("cents"))).as(name)
    val band = cum.groupBy(col("event_type"))
      .agg(sel(45, "p45"), sel(55, "p55"))
    served.join(exact, Seq("event_type")).join(band, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("exact_users"),
        (abs(col("est_users") - col("exact_users")) <=
          greatest(col("exact_users").cast("double") * 0.05, lit(4.0)))
          .as("users_ok"),
        (col("sk_p50_cents") >= col("p45") &&
          col("sk_p50_cents") <= col("p55")).as("p50_ok"))
      .orderBy(col("event_type"))
  }

  private[queries] def sketchStoreOracle: String =
    """SELECT event_type,
      |  COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS users_ok, TRUE AS p50_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
