package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: wall-time one registered query END-TO-END (construction +
 * execution — unlike PlanDump this includes work done eagerly inside the
 * query function, e.g. a streaming run-to-completion).
 * Usage: runMain graft.tools.BenchOne <name> [sfDir] [reps]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // same full-column forcing as the round bench — count() would let
      // Catalyst prune the projection (and sometimes whole joins) out of
      // the measurement
      graft.Bench.force(df)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"== $name run $i: forced in $secs%.3f s")
    }
    if (graft.StageTimer.json != "{}")
      println(s"== stages (last rep): ${graft.StageTimer.json}")
    spark.stop()
  }
}
