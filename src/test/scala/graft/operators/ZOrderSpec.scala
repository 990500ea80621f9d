package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known small values)") {
    // z(x=0b11, y=0b01, 2 bits) = x bits at even positions + y at odd:
    // x0=1→1, y0=1→2, x1=1→4, y1=0→0  ⇒ 7
    val got = spark.range(1).select(
      ZOrder.zValue(lit(3L), lit(1L), 2).as("z")).as[Long].head()
    assert(got == 7L)
  }

  test("zSql equals zValue for all inputs including negatives") {
    val df = spark.range(2000).select(
      ($"id" * 2654435761L % 5000 - 2500).as("x"),
      ($"id" * 40503L % 3000 - 1500).as("y"))
    df.createOrReplaceTempView("zorder_probe")
    val bits = 8
    val viaExpr = df.select(ZOrder.zValue($"x", $"y", bits).as("z"), $"x", $"y")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val viaSql = spark.sql(
      s"SELECT ${ZOrder.zSql("x", "y", bits)} AS z, x, y FROM zorder_probe")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(viaExpr == viaSql)
  }

  test("cluster preserves rows and tolerates a caller-owned __z column") {
    val df = spark.range(1000).select(
      ($"id" % 64).as("x"), (($"id" * 31) % 64).as("y"),
      $"id".as("__z")) // caller's own __z must survive untouched
    val out = ZOrder.cluster(df, "x", "y", bits = 6, numPartitions = 4)
    assert(out.columns.toSeq == Seq("x", "y", "__z"))
    val got = out.select($"__z").as[Long].collect().sorted.toSeq
    assert(got == (0L until 1000L).toSeq)
  }

  test("clustered layout co-locates 2-D boxes (skipping proxy)") {
    // After z-clustering, a small (x, y) box should touch FEW partitions;
    // this is the row-group-pruning property the layout exists for.
    val n = 4096
    val df = spark.range(n).select(
      ($"id" % 64).as("x"), (($"id" / 64) % 64).as("y"))
    val parts = 16
    val clustered = ZOrder.cluster(df, "x", "y", bits = 6, parts)
    val boxPartitions = clustered
      .select($"x", $"y", spark_partition_id().as("p"))
      .filter($"x".between(8, 15) && $"y".between(8, 15))
      .select($"p").distinct().count()
    // 64 rows of 4096 (1/64 of data) over 16 partitions: random layout
    // would hit ~16; a z-layout confines the box to a handful of tiles
    assert(boxPartitions <= 4, s"box touched $boxPartitions partitions")
  }
}
