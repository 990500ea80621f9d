package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Driver-cost repro for the checkpoint-stats compounding bug
 * [[graft.Frames]] fixes: ClusterLedger folds where every batch
 * relabels the whole accumulated labeling (descending-min arrival —
 * the adversarial shape CurationSoak streams). Prints per-batch wall,
 * job/task counts, summed task time, and the labeling plan's
 * `stats.sizeInBytes.bitLength`. Before the fix: task time flat,
 * statsBits ×5 per batch (57M bits by batch 9), wall exploding into
 * driver-side BigInt multiplication; after: statsBits pinned at 63,
 * walls flat.
 *
 * Modes: default drives the real ClusterLedger; `inline` re-derives
 * maintainAnnotated step-by-step with per-step walls; `solo` runs one
 * batch-9-shaped fold in a fresh ledger (proves the blowup was
 * accumulated JVM/plan state, not data shape).
 *
 * Usage: runMain graft.tools.CcRepro [nGroups] [inline|solo]
 */
object CcRepro {
  def main(args: Array[String]): Unit = {
    val nGroups = if (args.nonEmpty) args(0).toLong else 2000L
    val nBatches = 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          taskMs.addAndGet(t.taskInfo.duration); ()
        }
      })
    val clusters = new graft.streaming.ClusterLedger(spark, nBuckets = 64)
    var inlineLabels = spark.range(0)
      .select(col("id"), col("id").as("cluster")).localCheckpoint(true)
    if (args.length > 1 && args(1) == "solo") {
      // batch-9-shaped fold in a FRESH ledger: prev labels = members
      // 1..9 all labeled 1*nG+g, pairs = member 0 vs every prior
      val prev = spark.range(nGroups * 9).select(
        (col("id") + nGroups).as("id"),
        (pmod(col("id"), lit(nGroups)) + nGroups).as("cluster"))
      val pairs = spark.range(nGroups).selectExpr("id AS a")
        .crossJoin(spark.range(1, 10).selectExpr("id AS mm"))
        .selectExpr("a", s"a % $nGroups + mm * $nGroups AS b")
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (full, _) = graft.operators.IncrementalCC.maintainWithDelta(
        prev.localCheckpoint(), pairs.selectExpr("a AS src", "b AS dst"),
        100)
      full.localCheckpoint(true)
      println(f"== solo batch-9-shape fold " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.getAndSet(0)} tasks=${tasks.getAndSet(0)}")
      spark.stop(); return
    }
    (0 until nBatches).foreach { k =>
      val m = nBatches - 1 - k
      // batch k: member m pairs with every previously arrived sibling
      // (members m+1 .. nBatches-1), exactly the soak's pair shape
      val pairs = spark.range(nGroups).selectExpr(
          s"id + $m * $nGroups AS a")
        .crossJoin(spark.range(m + 1, nBatches).selectExpr("id AS mm"))
        .selectExpr("a", s"a % $nGroups + mm * $nGroups AS b")
      val t0 = System.nanoTime()
      if (args.length > 1 && args(1) == "inline") {
        // maintainAnnotated inlined with per-step walls
        import graft.operators.{Dedup, GraphEdges}
        val prevLabels = inlineLabels
        val newEdges = GraphEdges.canonical(
          pairs.selectExpr("a AS src", "b AS dst").localCheckpoint())
        val la = prevLabels.select(col("id").as("a"), col("cluster").as("__ca"))
        val lb = prevLabels.select(col("id").as("b"), col("cluster").as("__cb"))
        val contracted = newEdges
          .join(la, Seq("a"), "left").join(lb, Seq("b"), "left")
          .select(coalesce(col("__ca"), col("a")).as("a"),
            coalesce(col("__cb"), col("b")).as("b"))
          .filter(col("a") =!= col("b"))
        var t = System.nanoTime()
        val ccLabels = Dedup.connectedComponents(contracted, 100)
          .localCheckpoint()
        println(f"==   cc ${(System.nanoTime() - t) / 1e9}%.2fs")
        t = System.nanoTime()
        val merges = ccLabels
          .filter(col("cluster") =!= col("id"))
          .select(col("id").as("__old"), col("cluster").as("__new"))
        val relabeled = prevLabels
          .join(merges, prevLabels("cluster") === merges("__old"), "left")
          .select(prevLabels("id"),
            coalesce(col("__new"), prevLabels("cluster")).as("cluster"),
            col("__new").isNotNull.as("__changed"))
        val fresh = newEdges.select(col("a").as("id"))
          .union(newEdges.select(col("b").as("id"))).distinct()
          .join(prevLabels.select(col("id")), Seq("id"), "left_anti")
          .join(merges, col("id") === merges("__old"), "left")
          .select(col("id"), coalesce(col("__new"), col("id")).as("cluster"),
            lit(true).as("__changed"))
        val combined = relabeled.unionByName(fresh).localCheckpoint(true)
        println(f"==   annotate+cp ${(System.nanoTime() - t) / 1e9}%.2fs " +
          s"rows=${combined.count()}")
        inlineLabels = combined.select(col("id"), col("cluster"))
      } else
        clusters.observe(pairs.localCheckpoint(), k.toLong)
      println(f"== batch $k fold+merge ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.getAndSet(0)} tasks=${tasks.getAndSet(0)} " +
        s"taskMs=${taskMs.getAndSet(0)} statsBits=" +
        (if (args.length > 1 && args(1) == "inline")
          inlineLabels.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
        else
          clusters.labeling.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength))
    }
    spark.stop()
  }
}
