package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality EXPECTATIONS over a DataFrame — the
 * constraint-validation gate a training-data pipeline runs before any
 * corpus version is committed (Delta Live Tables expectations / Great
 * Expectations / dbt tests as an engine-side operator). A rule is a
 * named pass-predicate; a row VIOLATES a rule when the predicate is not
 * true (false OR null — a null check result is a failure, not a pass,
 * so a corrupt column can never slip through as "unknown").
 *
 * Scale design: [[report]] computes every rule's violation count in
 * ONE scan — each rule becomes one conditional-sum aggregate, all of
 * them map-side partial over the same pass, so 50 rules on 100 TB cost
 * one read, not 50 (the naive loop-of-counts is a job per rule).
 * [[audit]]/[[quarantine]] are scan-stage row transforms (no shuffle,
 * no join): the violation list is computed per row inside whole-stage
 * codegen and rows route to the main or quarantine side by one filter
 * each. Referential rules ([[refRule]]) compose as a broadcast left
 * join against the (small) dimension's distinct keys — the fact table
 * is still scanned once; fact-sized dimensions should use a bloom-side
 * check (q41) instead.
 *
 * The reference validates per-row during its JDBC copy (lenient parses,
 * null-skipping setters — SURVEY §2.4 T5/T10/T13); this is that
 * tolerance turned into an explicit, countable, enforceable contract.
 */
object Expectations {

  /** One named expectation: `passes` must evaluate TRUE for a row to
   * pass; false OR NULL counts as a violation. */
  final case class Rule(name: String, passes: Column)

  private def violates(r: Rule): Column = !coalesce(r.passes, lit(false))

  /** Per-rule violation counts in ONE scan of `df`: columns
   * `(rule, violations, n_rows)`, one row per rule, rule-name order.
   * `n_rows` repeats the scanned total so every row carries its own
   * denominator (violation RATE = violations / n_rows). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: no rules")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectations: duplicate rule names")
    // internal columns are INDEX-named — rule names are data (lit),
    // never identifiers, so any human-written name ("value > 0, eh?")
    // is legal
    // coalesce to 0: sum over ZERO rows is null, and an empty frame must
    // report 0 violations of every rule, not null (callers read the
    // count with getLong)
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) =>
        coalesce(sum(violates(r).cast("long")), lit(0L)).as(s"__v_$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one-row wide → long: explode over a literal struct array is a
    // plain projection of the single aggregate row, no second pass
    wide.select(
        explode(array(rules.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"),
            col(s"__v_$i").as("violations")) }: _*)).as("__r"),
        col("__n").as("n_rows"))
      .select(col("__r.rule").as("rule"),
        col("__r.violations").as("violations"), col("n_rows"))
      .orderBy(col("rule"))
  }

  /** `df` plus a `violations` array column naming every rule the row
   * fails (empty array = clean row). Pure scan-stage projection. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("violations",
      array_compact(array(rules.map(r =>
        when(violates(r), lit(r.name))): _*)))

  /** Split into (clean, quarantined) — quarantined rows carry the
   * `violations` column naming why. Two filters over the same audited
   * scan; Spark will not double-read a cached/reused exchange, and at
   * pipeline scale the two sides are written to different sinks anyway. */
  def quarantine(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, DataFrame) = {
    val a = audit(df, rules)
    (a.filter(size(col("violations")) === 0).drop("violations"),
      a.filter(size(col("violations")) > 0))
  }

  /** REPAIR-AND-READMIT — the patch half of the quarantine lifecycle
   * (gate → quarantine → repair → replay): apply per-rule PATCHES to
   * an audited quarantine frame (rows carrying the [[audit]]
   * `violations` column). A patch maps a violated rule's name to the
   * column assignments that fix it; assignments apply ONLY to rows the
   * audit convicted of that rule (the audit column is the routing
   * evidence — rules are not re-evaluated to decide who gets patched),
   * and a patch expression may reference the row's other columns (so
   * a dimension backfill is "join, then patch from the joined
   * column"). The patched rows are then RE-AUDITED against the full
   * rule set — nothing re-admits on trust: returns (readmitted,
   * unrepairable), the second still carrying its fresh violation list.
   * All of it is scan-stage projection + one re-audit pass — no
   * shuffle, no join beyond what the caller's patch expressions add. */
  def repair(quarantined: DataFrame, rules: Seq[Rule],
      patches: Map[String, Map[String, Column]])
      : (DataFrame, DataFrame) = {
    require(quarantined.columns.contains("violations"),
      "repair: input must carry the audit's `violations` column")
    val unknown = patches.keySet -- rules.map(_.name).toSet
    require(unknown.isEmpty,
      s"repair: patches for unknown rules: ${unknown.mkString(", ")}")
    // patches apply in RULE-LIST order (never Map iteration order): a
    // row convicted of two rules patching the same column repairs
    // DETERMINISTICALLY — the later rule's patch sees (and overrides)
    // the earlier one's output, same JVM to JVM
    val patched = rules.flatMap(r => patches.get(r.name).map(r.name -> _))
      .foldLeft(quarantined) { case (df, (rule, assigns)) =>
        assigns.toSeq.sortBy(_._1).foldLeft(df) { case (d, (c, v)) =>
          d.withColumn(c,
            when(array_contains(col("violations"), rule), v)
              .otherwise(col(c)))
        }
      }
    quarantine(patched.drop("violations"), rules)
  }

  /** Referential expectation: `factKey` must exist in `dim`'s
   * `dimKey` column. Returns the joined frame plus the rule to pass to
   * [[report]]/[[audit]] — the join is a broadcast of the dimension's
   * DISTINCT keys, so the fact side stays a single unshuffled scan. */
  private val refMarker = new java.util.concurrent.atomic.AtomicLong(0)

  def refRule(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, name: String): (DataFrame, Rule) = {
    // the marker column is referenced through the DataFrame (an
    // attribute, not a re-parsed name), so `name` may contain any
    // characters — it's only ever emitted as data. The marker is
    // PER-CALL unique (a counter, not dim.hashCode): two rules against
    // the same dimension frame (user_id AND referrer_id vs customer)
    // must not collide into one ambiguous column name.
    val keys = dim
      .select(col(dimKey).as(s"__ref_${refMarker.incrementAndGet()}"))
      .distinct()
    val refCol = keys(keys.columns.head)
    val joined = fact.join(broadcast(keys),
      fact(factKey) === refCol, "left")
    (joined, Rule(name, refCol.isNotNull))
  }

  /** The rules whose violation rate exceeds their budget, as
   * "name violations/n_rows" strings (empty = all within budget). */
  private def blownBudgets(df: DataFrame, rules: Seq[Rule],
      budgets: Map[String, Double]): Seq[String] = {
    // FAIL CLOSED: a budget key that names no rule is a configuration
    // bug — silently ignoring it would disable the intended gate
    val unknown = budgets.keySet -- rules.map(_.name).toSet
    require(unknown.isEmpty,
      s"expectations: budgets for unknown rules: ${unknown.mkString(", ")}")
    report(df, rules).filter(
        coalesce(udfFreeRate, lit(0.0)) >
          coalesce(budgetCol(budgets), lit(Double.MaxValue)))
      .collect()
      .map(r => s"${r.getString(0)} ${r.getLong(1)}/${r.getLong(2)}")
      .toSeq
  }

  /** Non-throwing budget check — the PRE-COMMIT gate shape for a
   * streamed ingest (q102): evaluate every rule in one scan, return
   * None when all are within budget, else Some(message) naming the
   * blown rules so the caller can quarantine the batch instead of
   * merging it. */
  def check(df: DataFrame, rules: Seq[Rule],
      budgets: Map[String, Double]): Option[String] = {
    val over = blownBudgets(df, rules, budgets)
    if (over.isEmpty) None
    else Some("expectations exceeded budget: " + over.mkString(", "))
  }

  /** Enforcement: raise (fail the pipeline) when any rule's violation
   * RATE exceeds its budget. `budgets` maps rule name → max allowed
   * fraction (0.0 = zero tolerance). Returns the report for logging. */
  def enforce(df: DataFrame, rules: Seq[Rule],
      budgets: Map[String, Double]): DataFrame = {
    check(df, rules, budgets).foreach(msg =>
      throw new IllegalArgumentException(s"requirement failed: $msg"))
    report(df, rules)
  }

  // zero rows = zero violations = a clean 0.0 rate (ANSI mode makes
  // the bare division throw DIVIDE_BY_ZERO on an empty frame)
  private def udfFreeRate: Column =
    when(col("n_rows") === 0, lit(0.0))
      .otherwise(col("violations").cast("double") / col("n_rows"))

  private def budgetCol(budgets: Map[String, Double]): Column =
    budgets.foldLeft(lit(null).cast("double")) { case (acc, (n, b)) =>
      when(col("rule") === n, lit(b)).otherwise(acc)
    }
}
