package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the persisted ANN index (s19/s20): synthesizes a
 * deterministic 1M × 64-dim corpus with spark.range, builds the
 * cid-partitioned artifact once, then serves a small query batch and
 * reports what the posting scan actually READ (files + rows) — the
 * economics of the layout: the literal probe-set filter restricts the
 * scan to nProbe·batch of the 256 lists. This soak is also what caught
 * two real defects: the un-repartitioned partitioned write (32 tiny
 * files per list dir) and dynamic partition pruning silently degrading
 * to dynamicpruningexpression(true) while the plan string still said
 * "dynamicpruning". Finishes with a 1% incremental maintain and a
 * re-serve to show ingest cost is batch-sized, not index-sized.
 *
 * Usage: runMain graft.tools.AnnSoak [nVectors]
 */
object AnnSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    require(n >= 10000, s"soak needs a non-degenerate corpus (n=$n)")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    def vecs(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
              |  float(pmod(xxhash64(id, i), 1000L) / 1000.0))"""
        .stripMargin).as("embedding"))

    // SMALL query batch (5): per-batch pruning reads the UNION of the
    // batch's probed lists, so a 100-query batch touches most of a
    // 256-list index and pruning can't help — the online-serving
    // economics show up at small batch sizes (5 queries × 2 probes →
    // ≤ 10/256 lists read)
    val emb = vecs(spark.range(n).toDF())
    val queries = emb.filter(col("vec_id") % (n / 5) === 0) // ~5
    val stride = (n / 256).toInt

    val root = timed(s"build ($n vectors, 256 lists)") {
      graft.operators.AnnIndex.build(emb, "vec_id", "embedding",
        centroidStride = stride, maxCentroids = 256)
    }

    // wall time on page-cached local NVMe can't show the pruning (the
    // probe computation dominates) — what matters is what the posting
    // scan actually READ, which is what object-storage serving pays for
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    def serve(label: String): Long = timed(label) {
      val df = graft.operators.AnnIndex.search(spark, root, queries,
        "vec_id", "embedding", nProbe = 2, k = 5)
      // collect() (not count()) so the metrics land on THIS plan — a
      // count() builds a second execution and leaves these at zero
      val n0 = df.collect().length.toLong
      scans(df.queryExecution.executedPlan)
        .filter(_.relation.location.rootPaths.mkString.contains("postings"))
        .foreach { s =>
          println(s"==   posting scan: files=${s.metrics("numFiles").value}" +
            s" rows=${s.metrics("numOutputRows").value}")
        }
      n0
    }
    val rows = serve("serve (warm-up)")
    serve("serve")
    println(s"== served rows: $rows (index: 256 files, $n rows total)")

    timed("maintain +1% batch") {
      graft.operators.AnnIndex.maintain(spark,
        root, vecs(spark.range(n, n + n / 100).toDF()), "vec_id", "embedding")
    }
    println(s"== post-maintain rows: ${serve("serve after maintain")}")

    // DRIFT LIFECYCLE at volume (s24/s25): the undrifted index must
    // NOT fire; a 10% arrival wave concentrated on the ones-direction
    // (a region the original quantizer never carved) must collapse
    // into one hot list, cross the imbalance threshold, trigger the
    // refit, and come back to the fit-time regime — serve intact.
    //
    // The threshold is calibrated to THIS corpus's fit-time baseline
    // (requantizeIfDrifted's contract): positive-orthant uniform
    // vectors all lean toward the mean direction, so their natural
    // occupancy skew under nearest-centroid assignment is ~6× uniform
    // on 256 lists — an absolute bar tuned on the zero-centered gate
    // embeddings (baseline ~1.2) would misfire here. This soak run is
    // what surfaced that the statistic is only meaningful RELATIVE to
    // its fit-time read.
    // one imbalance read per decision: requantizeIfDrifted returns
    // the statistic it measured (ADVICE r14 — the separate pre-read
    // paid the posting-metadata scan twice)
    val im0 = graft.operators.AnnIndex.imbalance(spark, root)
    val bar = im0 * 3
    val d0 = graft.operators.AnnIndex.requantizeIfDrifted(spark, root,
      maxImbalance = bar, centroidStride = stride, maxCentroids = 256)
    require(!d0.fired,
      f"undrifted index (imbalance ${d0.imbalance}%.2f) fired a refit")
    println(f"== undrifted imbalance: ${d0.imbalance}%.2f, bar $bar%.2f " +
      "(no refit — correct)")
    val driftBase = n + n / 100
    def driftVecs(ids: org.apache.spark.sql.DataFrame) = ids.select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
              |  float(0.05 * (pmod(xxhash64(id, i), 1000L) / 1000.0)
              |        + 1.0))""".stripMargin).as("embedding"))
    timed("maintain +10% DRIFTED wave") {
      graft.operators.AnnIndex.maintain(spark, root,
        driftVecs(spark.range(driftBase, driftBase + n / 10).toDF()),
        "vec_id", "embedding")
    }
    val total = driftBase + n / 10
    val stride2 = (total / 256).toInt
    val d1 = timed("requantize (drift-triggered)") {
      graft.operators.AnnIndex.requantizeIfDrifted(spark, root,
        maxImbalance = bar, centroidStride = stride2,
        maxCentroids = 256)
    }
    val im1 = d1.imbalance
    require(im1 > bar,
      f"drifted wave read imbalance $im1%.2f <= bar $bar%.2f — " +
        "construction broke")
    require(d1.fired, "drifted index did not fire")
    val im2 = graft.operators.AnnIndex.imbalance(spark, root)
    require(im2 < im1 / 2 && im2 < bar,
      f"refit left imbalance $im2%.2f (was $im1%.2f, bar $bar%.2f) — " +
        "quantizer did not re-cover the drifted region")
    println(f"== refit imbalance: $im1%.2f -> $im2%.2f")
    println(s"== post-requantize rows: ${serve("serve after requantize")}")
    spark.stop()
  }
}
