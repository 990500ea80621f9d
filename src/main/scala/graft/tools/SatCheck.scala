package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic (r16): is LedgerSoak's default-size saturation
 * a corpus property (15-bit band-value collisions across 50k groups)
 * independent of the store mode? Counts, with NO ledger at all, the
 * (batch, band-key) observations whose ACCUMULATED posting total
 * reaches the 64 cap — the exact quantity the soak's saturation
 * metric measures. */
object SatCheck {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val nBatches = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nGroups = n / 10
    val gsig = abs(xxhash64(concat(lit("g:"), col("id") % nGroups)))
      .bitwiseAND(lit((1L << 60) - 1))
    val sigs = spark.range(n).select(col("id"),
      when(col("id") >= nGroups * 9,
        gsig.bitwiseXOR(
          expr(s"shiftleft(1L, cast((id % $nGroups) % 60 as int))")))
        .otherwise(gsig).as("sig"))
    val per = n / nBatches
    // NearDupLedger banding: 4 bands of 15 bits
    val bands = (0 until 4).map(b =>
      concat(lit(s"$b|"), shiftright(col("sig"), b * 15)
        .bitwiseAND(lit((1L << 15) - 1)).cast("string")))
    val keyed = sigs.select(col("id"), explode(array(bands: _*)).as("bkey"),
      expr(s"id div $per").as("batch"))
    // accumulated postings per band at each batch boundary
    val acc = keyed.groupBy(col("bkey"), col("batch"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bkey")
          .orderBy("batch")))
    // a batch's saturation count = bands IT TOUCHES whose cum >= 64
    val sat = acc.filter(col("cum") >= 64).count()
    println(s"== satcheck: $sat (batch, band) observations at cap>=64 " +
      s"for n=$n nBatches=$nBatches — ledger-free corpus arithmetic")
    spark.stop()
  }
}
