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
}
