package graft

import org.apache.spark.sql.SparkSession

/**
 * Round benchmark: runs every registered query against
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) on local[32] and prints one JSON
 * line `{"metric":"total","value":…,"queries":{…},"sf":…}`.
 * Each query is fully executed via count() (forces scans, shuffles and
 * the final projection — no collect of payload to the driver).
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-index paths once so per-query numbers
    // reflect steady state, not first-query session initialization.
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try { q.run(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    // Keep the line SHORT (3dp, basename sf): the driver records only a
    // bounded tail of the output, and round 2's full-precision line
    // overflowed it. It must also be the LAST line printed.
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
  }
}
