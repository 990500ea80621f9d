package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke: load every testdata table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.all.foreach { t =>
      try {
        val df = graft.sources.Tables.load(spark, dir, t)
        println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Exception => println(s"== $t FAILED: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
