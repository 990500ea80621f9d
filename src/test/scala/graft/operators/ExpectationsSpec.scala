package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations.Rule

/** Pins what the q97 hash gate can't see: the report is ONE scan of the
 * fact regardless of rule count, null never passes a rule, and the
 * audit/quarantine split is a lossless partition of the input. */
class ExpectationsSpec extends SparkSpec {

  private def facts = {
    import spark.implicits._
    Seq(
      (1L, Some(5.0), "a"), // clean
      (2L, Some(-1.0), "a"), // violates pos
      (3L, None, "b"), // null value -> violates pos; bad cat
      (4L, Some(2.0), "zz") // bad cat
    ).toDF("id", "value", "cat")
  }

  private val rules = Seq(
    Rule("value_pos", col("value") > 0),
    Rule("cat_known", col("cat").isin("a", "b")))

  test("report counts violations with null-never-passes semantics") {
    val rep = Expectations.report(facts, rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("cat_known", 1L, 4L),
      ("value_pos", 2L, 4L)))
  }

  test("report is ONE scan of the fact no matter how many rules") {
    val dir = graft.sources.Scratch.dir("exp_spec") + "/f"
    facts.write.parquet(dir)
    val pf = spark.read.parquet(dir)
    val many = (1 to 20).map(i => Rule(s"r$i", col("value") > i))
    val plan = Expectations.report(pf, many).queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int =
      (p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("exp_spec")) => 1
        case _ => 0
      }) + p.children.map(scans).sum + p.subqueries.map(scans).sum
    assert(scans(plan) == 1,
      s"expected exactly one fact scan, plan:\n$plan")
  }

  test("audit names each row's failed rules; quarantine is a lossless " +
      "partition") {
    val audited = Expectations.audit(facts, rules)
      .select(col("id"), col("violations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .toMap
    assert(audited(1L) == Set())
    assert(audited(2L) == Set("value_pos"))
    assert(audited(3L) == Set("value_pos")) // null value fails pos only
    assert(audited(4L) == Set("cat_known"))

    val (clean, bad) = Expectations.quarantine(facts, rules)
    assert(clean.columns.toSeq == facts.columns.toSeq)
    assert(clean.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L))
    assert(bad.select("id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L))
    assert(clean.count() + bad.count() == facts.count())
  }

  test("refRule counts fact keys missing from the dimension; fact side " +
      "broadcast-joins") {
    import spark.implicits._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val (joined, r) = Expectations.refRule(facts, "id", dim, "k",
      "id_in_dim")
    val rep = Expectations.report(joined, Seq(r)).collect()
    assert(rep.head.getString(0) == "id_in_dim" &&
      rep.head.getLong(1) == 1L && rep.head.getLong(2) == 4L)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastHashJoin") ||
      planStr.contains("BroadcastNestedLoopJoin"),
      s"referential join is not broadcast:\n$planStr")
  }

  test("rule names are data, not identifiers: quotes/spaces/dots work") {
    val weird = Seq(
      Rule("value > 0, really?", col("value") > 0),
      Rule("cat. can't be 'zz'", col("cat") =!= "zz"))
    val rep = Expectations.report(facts, weird)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep.toMap == Map("value > 0, really?" -> 2L,
      "cat. can't be 'zz'" -> 1L))
    val audited = Expectations.audit(facts, weird)
      .filter(col("id") === 4L).select(col("violations")).head()
      .getSeq[String](0)
    assert(audited == Seq("cat. can't be 'zz'"))
  }

  test("two referential rules against the SAME dimension compose") {
    import spark.implicits._
    val dim = Seq(1L, 2L, 3L).toDF("k")
    // both rules join the identical dimension frame — the per-call
    // marker must keep their join columns distinct
    val (j1, r1) = Expectations.refRule(facts, "id", dim, "k",
      "id_in_dim")
    val (j2, r2) = Expectations.refRule(j1, "id", dim, "k",
      "id_in_dim_again")
    val rep = Expectations.report(j2, Seq(r1, r2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("id_in_dim" -> 1L, "id_in_dim_again" -> 1L))
  }

  test("report on an EMPTY frame is 0 violations per rule, never null") {
    val rep = Expectations.report(facts.limit(0), rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.toSeq == Seq(("cat_known", 0L, 0L), ("value_pos", 0L, 0L)))
    // and enforce's error path must not NPE on the empty report
    val r = Expectations.enforce(facts.limit(0), rules,
      Map("value_pos" -> 0.0))
    assert(r.count() == 2)
  }

  test("check is the non-throwing gate: None within budget, a message " +
      "naming the blown rule otherwise") {
    assert(Expectations.check(facts, rules,
      Map("value_pos" -> 0.5, "cat_known" -> 0.25)).isEmpty)
    val msg = Expectations.check(facts, rules, Map("value_pos" -> 0.0))
    assert(msg.exists(_.contains("value_pos")), s"$msg")
  }

  test("pre-commit gate on CLEAN batches is the unguarded pipeline: " +
      "gated and unguarded stores converge identically") {
    import graft.streaming.BucketedUpsert
    import graft.operators.Expectations.Rule
    val payload = Seq("ver", "x")
    def batch(ver: Long) = spark.range(20).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val gateRules = Seq(Rule("x_nonneg", col("x") >= 0))
    val budgets = Map("x_nonneg" -> 0.0)
    val gated = new BucketedUpsert.State(spark, "k", payload, 4)
    val plain = new BucketedUpsert.State(spark, "k", payload, 4)
    (1L to 3L).foreach { v =>
      val b = batch(v)
      // the gate adds one scan and must not change WHAT merges
      Expectations.check(b, gateRules, budgets) match {
        case None      => gated.merge(b, v)
        case Some(msg) => fail(s"clean batch rejected: $msg")
      }
      plain.merge(b, v)
    }
    val g = gated.view(spark).select(col("k"), col("ver"), col("x"))
    val p = plain.view(spark).select(col("k"), col("ver"), col("x"))
    assert(g.except(p).isEmpty && p.except(g).isEmpty,
      "gated clean run diverged from the unguarded pipeline")
  }

  test("repair patches exactly the convicted rows, re-audits before " +
      "readmitting, and reports the unrepairable remainder") {
    val (_, quarantined) = Expectations.quarantine(facts, rules)
    // patch value violations to 1.0; leave cat violations unpatched —
    // rows 2 (bad value) and 3 (null value) repair fully and readmit;
    // row 4 (cat only) must NOT receive the value patch and stays
    // unrepairable with a FRESH violation list
    val (readmitted, unrepairable) = Expectations.repair(
      quarantined, rules,
      Map("value_pos" -> Map("value" -> lit(1.0))))
    val ok = readmitted.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(ok.toSeq == Seq((2L, 1.0, "a"), (3L, 1.0, "b")),
      s"readmitted set wrong: ${ok.toSeq}")
    val bad = unrepairable.orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[String](r.fieldIndex("violations"))))
    assert(bad.toSeq == Seq((4L, 2.0, Seq("cat_known"))),
      s"unrepairable set wrong (the value patch must not touch a row " +
        s"convicted only of cat_known): ${bad.toSeq}")
    // two rules patching the SAME column repair deterministically in
    // rule-list order: the later rule's patch overrides the earlier's
    // for a row convicted of both (never Map iteration order)
    val bothRules = Seq(
      Rule("neg", col("value") > 0),
      Rule("null_val", col("value").isNotNull))
    val (_, q2) = Expectations.quarantine(facts, bothRules)
    val (fixed, _) = Expectations.repair(q2, bothRules, Map(
      "null_val" -> Map("value" -> lit(2.0)),
      "neg" -> Map("value" -> lit(1.0))))
    // row 3 (null value) violates BOTH rules; null_val is LATER in
    // the rule list, so its patch wins
    val r3 = fixed.filter(col("id") === 3L).head().getDouble(1)
    assert(r3 == 2.0, s"patch order nondeterministic: row 3 -> $r3")
    // a patch for a rule no one defined fails closed
    intercept[IllegalArgumentException] {
      Expectations.repair(quarantined, rules,
        Map("value_positive" -> Map("value" -> lit(1.0))))
    }
    // input without the audit column fails loudly
    intercept[IllegalArgumentException] {
      Expectations.repair(facts, rules, Map.empty)
    }
  }

  test("enforce fails closed on a budget naming no rule") {
    intercept[IllegalArgumentException] {
      Expectations.enforce(facts, rules,
        Map("value_positive" -> 0.0)) // typo'd rule name
    }
  }

  test("enforce raises on a blown budget, passes within budget") {
    intercept[IllegalArgumentException] {
      Expectations.enforce(facts, rules,
        Map("value_pos" -> 0.0))
    }
    // 2/4 violations <= 50% budget: passes and returns the report
    val rep = Expectations.enforce(facts, rules,
      Map("value_pos" -> 0.5, "cat_known" -> 0.25))
    assert(rep.count() == 2)
  }
}
