package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan + wall time of one
 * registered query. Usage: runMain graft.tools.PlanDump <name> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"== run $i: $n rows in ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
