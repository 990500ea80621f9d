package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k probe rows over 500 distinct keys; build side keeps only 50 of them
  private lazy val probe = spark.range(10000).select(
    ($"id" % 500).as("k"), $"id".as("row_id"))
  private lazy val build = spark.range(50).select(
    ($"id" * 7).as("k"), concat(lit("v"), $"id").as("dv"))

  test("bloomJoin equals plain join row-for-row (shared key name)") {
    // probeKey == buildKey — the round-4 advice case: both names resolve in
    // the joined plan, so the condition must be side-resolved
    val plain = probe.join(build, probe("k") === build("k"))
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    val bloomed = BloomJoin.bloomJoin(probe, build, "k", "k", 1000L)
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("bloomJoin equals plain join with distinct key names") {
    val dim = build.withColumnRenamed("k", "dk")
    val plain = probe.join(dim, $"k" === $"dk")
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    val bloomed = BloomJoin.bloomJoin(probe, dim, "k", "dk", 1000L)
      .select($"row_id", $"dv").as[(Long, String)].collect().sorted.toSeq
    assert(bloomed == plain)
  }

  test("empty build side yields empty result, not an error") {
    val empty = build.filter(lit(false))
    assert(BloomJoin.bloomJoin(probe, empty, "k", "k", 10L).count() == 0L)
  }

  test("mightContain never drops a real match (no false negatives)") {
    val bloom = BloomJoin.buildBloom(build, $"k", 50L)
    val kept = BloomJoin.mightContain(probe, $"k", bloom)
      .select($"k").distinct().as[Long].collect().toSet
    val buildKeys = build.select($"k").as[Long].collect().toSet
    val probeKeys = probe.select($"k").distinct().as[Long].collect().toSet
    assert((buildKeys & probeKeys).subsetOf(kept))
  }

  test("probe-side reduction actually filters (fpp keeps it near the match set)") {
    val bloom = BloomJoin.buildBloom(build, $"k", 50L)
    val kept = BloomJoin.mightContain(probe, $"k", bloom).count()
    // 50 build keys / 500 probe keys → ~10% + ε·90% survives; assert well
    // under half so a no-op filter (or an inverted one) fails loudly
    assert(kept < probe.count() / 2)
  }
}
