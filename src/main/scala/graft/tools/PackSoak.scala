package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * At-volume evidence for the q104/q105 prefix-sum operators: the
 * two-phase distributed cumulative must stay EXACT at row counts where
 * the naive single-partition window is already the wrong plan, and its
 * wall must scale with shards, not collapse into one task.
 *
 * Exactness at 20M rows is checked against the CLOSED FORM of the
 * synthetic token column (tokens = id % 50, so
 * cum(id) = 1225 * (id div 50) + partial-cycle sum) — no naive window
 * recompute needed, every row checked.
 */
object PackSoak {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.range(n).select(
      col("id").as("doc_id"), (col("id") % 50).as("n_tokens"))

    val t0 = System.nanoTime()
    val cum = graft.operators.Packing.withCumulative(
      docs, "n_tokens", Seq(col("doc_id")), nShards = 64)
    // closed form of sum_{j<=id} (j % 50): full 50-cycles contribute
    // 0+1+..+49 = 1225 each; the partial cycle 0..(id%50) contributes
    // k(k+1)/2 for k = id % 50
    val expected = expr(
      "(doc_id div 50) * 1225L + ((doc_id % 50) * (doc_id % 50 + 1)) div 2")
    val bad = cum.filter(col("cum") =!= expected).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"== pack: two-phase cum over $n%,d rows in $wall%.1fs, " +
      s"mismatches vs closed form: $bad")
    assert(bad == 0, s"$bad rows diverged from the closed form")

    val t1 = System.nanoTime()
    val packed = graft.operators.Packing.pack(
      docs, "n_tokens", budget = 2048L, Seq(col("doc_id")), nShards = 64)
    val seqs = packed.agg(max(col("end_seq"))).head().getLong(0) + 1
    val straddlers = packed
      .filter(col("end_seq") > col("start_seq")).count()
    println(f"== pack: $n%,d docs -> $seqs%,d sequences of 2048 " +
      f"tokens, $straddlers%,d straddlers, " +
      f"${(System.nanoTime() - t1) / 1e9}%.1fs")
    assert(seqs > 0 && straddlers > 0)
    println(s"== soak OK: n=$n")
    spark.stop()
  }
}
