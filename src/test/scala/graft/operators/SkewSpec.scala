package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape that pins a reducer
  private lazy val skewed = spark.range(10000).select(
    when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 50).as("k"),
    $"id".as("row_id"))

  test("salted count equals plain groupBy count") {
    val plain = skewed.groupBy($"k").count()
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCount(skewed, "k", "row_id", factor = 16)
      .as[(Long, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted join equals plain join row-for-row") {
    val dim = spark.range(50).select($"id".as("dk"),
      concat(lit("v"), $"id").as("dv"))
    val plain = skewed.join(dim, $"k" === $"dk")
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", "row_id", 16)
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    assert(salted == plain)
  }

  test("AQE splits an injected skewed key at runtime (optimizeSkewedJoin)") {
    // the OTHER half of the skew story: q39's manual salt is the static
    // answer; at real scale AQE's runtime re-plan splits a hot shuffle
    // partition into task-sized slices using actual map output sizes.
    // This pins the split in the EXECUTED plan: with thresholds sized to
    // the test data, the final adaptive plan must carry a
    // skew=true SortMergeJoin, and the join result must equal the
    // non-adaptive join bit-for-bit (the re-plan is semantics-free).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // one hot key ≫ factor × median partition: force detection on
      // test-sized bytes (defaults target 256 MB partitions)
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      // keep both sides out of broadcast range so the join stays SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~40 MB concentrated on key 7 vs a ~1000-key tail. The aggregate
      // CONSUMES pad (sum(length)) so the padding survives column
      // pruning into the fact-side join shuffle, and the pad is md5
      // material, not a repeated character — skew detection reads
      // COMPRESSED map-output bytes, and an lz4'd constant run would
      // never trip the threshold
      val pad = concat((0 until 12).map(i =>
        md5(concat($"id".cast("string"), lit(s":$i")))): _*)
      val fact = spark.range(120000).select(
        when($"id" % 10 =!= 0, lit(7L)).otherwise($"id" % 1000).as("k"),
        pad.as("pad"))
      val dim = spark.range(3000).select(($"id" % 1000).as("dk"),
        $"id".as("dim_id"))
      // the validation aggregate is GLOBAL, not keyed by k: a groupBy(k)
      // above the join would require the join's hashpartitioning(k), and
      // OptimizeSkewedJoin declines to split when that breaks a required
      // downstream distribution (unless forceOptimizeSkewedJoin) — the
      // realistic skew-join shape is join output flowing to a sink or a
      // differently-keyed stage
      def agg(adaptive: Boolean) = {
        spark.conf.set("spark.sql.adaptive.enabled", adaptive.toString)
        fact.join(dim, $"k" === $"dk")
          .agg(count(lit(1)).as("n"), sum($"dim_id").as("s"),
            sum(length($"pad")).as("pl"))
      }
      val joined = agg(adaptive = true)
      // execute THIS dataset, then read its final adaptive plan (a
      // derived .as[]/.collect() dataset would leave it unexecuted)
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan never executed:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition; executed plan:\n$plan")
      // semantics unchanged vs the non-adaptive plan
      val want = agg(adaptive = false).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
