package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the graph operators: synthesizes a deterministic
 * hub-skewed graph with spark.range (no driver data, no files) and
 * shows, at a volume where it matters, WHY the degree-ordered
 * orientation exists — the naive wedge count includes deg(hub)² from
 * the celebrity node while the oriented count is bounded by Σ outdeg²
 * with outdeg ≤ O(√m); the hub's own out-degree is 0 (every incident
 * edge orients INTO the highest-degree node). Then times
 * Triangles.perNode end-to-end and Hierarchy.flatten on a 2^20-node
 * binary tree, asserting every depth against the arithmetic truth
 * (depth = bit-length of the id).
 *
 * Usage: runMain graft.tools.GraphSoak [nNodes]
 */
object GraphSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    require(n >= 100, s"soak needs a non-degenerate graph (nNodes=$n)")
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

    // Graph: each node i gets 3 hash-pseudo-random neighbors (local
    // structure that closes triangles), and every 3rd node also links
    // the hub (node 0) — a deg ~ n/3 celebrity.
    val base = spark.range(1, n)
    val localEdges = (0 until 3).map { j =>
      base.select(col("id").as("src"),
        pmod(conv(substring(md5(concat(lit(s"e$j:"), col("id"))), 1, 12),
          16, 10).cast("long"), lit(n)).as("dst"))
    }.reduce(_ unionAll _)
    val hubEdges = base.filter(col("id") % 3 === 0)
      .select(col("id").as("src"), lit(0L).as("dst"))
    val edges = localEdges.unionAll(hubEdges).cache()
    println(s"== edges: ${edges.count()}")

    // The scale argument, measured not claimed: naive wedge candidates
    // (Σ deg·(deg−1)/2 — what a center-node self-join enumerates) vs
    // the oriented count (Σ outdeg·(outdeg−1)/2).
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().cache()
    val deg = canon.select(col("a").as("id"))
      .union(canon.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val naive = deg.agg(sum(expr("deg * (deg - 1) div 2"))).head.getLong(0)
    val orientedDeg = canon
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
    val oriented = orientedDeg.agg(sum(expr("od * (od - 1) div 2")))
      .head.getLong(0)
    val maxOd = orientedDeg.agg(max(col("od"))).head.getLong(0)
    val ratio = if (oriented > 0) f"(${naive.toDouble / oriented}%.0fx fewer)"
      else "(no oriented wedges)"
    println(s"== wedges naive=$naive oriented=$oriented $ratio, " +
      s"max outdeg=$maxOd")

    val tri = timed("triangles perNode") {
      val t = graft.operators.Triangles.perNode(edges)
      t.agg(sum(col("n_triangles"))).head.getLong(0) / 3
    }
    println(s"== triangles: $tri")

    // Incremental CC at volume: maintain folds a daily-scale batch into
    // the accumulated graph's LABELING without re-walking its edges —
    // the measured claim is boundedness (the contracted delta that CC
    // actually iterates over is ≤ the batch, not the graph; on a graph
    // dominated by a giant component most batch edges contract to
    // self-loops and vanish before any iteration) plus exactness
    // (maintain ≡ full recompute, compared distributed — no collect).
    timed("incremental CC: maintain vs full recompute") {
      val t0 = System.nanoTime()
      val prev = graft.operators.Dedup.connectedComponents(canon,
        maxIter = 60).localCheckpoint(true)
      val tPrev = (System.nanoTime() - t0) / 1e9
      // the day's batch: n/100 edges, 2% of endpoints never seen before
      val nb = n / 100
      val batch = spark.range(nb).select(
        pmod(conv(substring(md5(concat(lit("b:"), col("id"))), 1, 12),
          16, 10).cast("long"), lit(n + nb / 50)).as("src"),
        pmod(conv(substring(md5(concat(lit("c:"), col("id"))), 1, 12),
          16, 10).cast("long"), lit(n + nb / 50)).as("dst"))
        .localCheckpoint(true)
      val canonBatch = graft.operators.GraphEdges.canonical(batch)
      val contracted = canonBatch
        .join(prev.select(col("id").as("a"), col("cluster").as("__ca")),
          Seq("a"), "left")
        .join(prev.select(col("id").as("b"), col("cluster").as("__cb")),
          Seq("b"), "left")
        .select(coalesce(col("__ca"), col("a")).as("a"),
          coalesce(col("__cb"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).count()
      val mOld = canon.count()
      val t1 = System.nanoTime()
      val inc = graft.operators.IncrementalCC.maintain(prev, batch,
        maxIter = 60).localCheckpoint(true)
      val tInc = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val full = graft.operators.Dedup.connectedComponents(
        graft.operators.GraphEdges.canonical(edges.unionAll(batch)),
        maxIter = 60).localCheckpoint(true)
      val tFull = (System.nanoTime() - t2) / 1e9
      val diff = inc.exceptAll(full).count() + full.exceptAll(inc).count()
      assert(diff == 0L, s"$diff label rows diverge from full recompute")
      println(f"== inc-cc: batch=${canonBatch.count()} edges over " +
        f"$mOld accumulated; contracted delta=$contracted edges " +
        f"(what maintain iterates); maintain=$tInc%.1fs vs " +
        f"recompute=$tFull%.1fs (prev build $tPrev%.1fs); labels equal")
    }

    // k-core peel at volume: the defining invariant — every survivor
    // keeps degree ≥ k IN the surviving subgraph — is assertable from
    // the output alone, so the soak checks correctness (at fixpoint),
    // not just wall time. Near the critical k an ER-ish graph's
    // removal cascade runs DEEP, and past the critical k the whole
    // graph collapses (mean degree here is 6.6; the ER 5-core
    // emergence threshold is ~6.8, so k=5 empties it over a ~20-round
    // cascade while k=4, threshold ~5.1, keeps a giant core) — so the
    // soak peels in 10-round
    // batches, re-feeding the surviving subgraph, until a batch
    // removes nobody — measuring the cascade depth instead of
    // guessing it. Each resumed batch is legal because peeling is a
    // pure function of the surviving edge set.
    timed("k-core peel to fixpoint (k=4)") {
      var cur = edges
      var rounds = 0
      var nCore = -1L
      var done = false
      while (!done && rounds < 100) {
        val core = graft.operators.KCore.peel(cur, k = 4, rounds = 10)
          .cache()
        rounds += 10
        val survivors = core.count()
        done = core.filter(col("core_deg") < 4).count() == 0L ||
          survivors == 0L
        nCore = survivors
        val ids = core.select(col("id"))
        cur = cur
          .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")).localCheckpoint(true)
      }
      assert(done, s"cascade still running after $rounds rounds")
      val hubIn = cur.filter(col("src") === 0L || col("dst") === 0L)
        .count() > 0L
      println(s"== core: $nCore survivors of $n nodes after <=$rounds " +
        s"rounds, hub in core: $hubIn")
    }

    // Pointer doubling: 2^20-node binary tree, every depth checked
    // against the id's bit length (integer-exact truth).
    timed("hierarchy flatten 2^20") {
      val nodes = spark.range(0, 1L << 20)
        .select(col("id"), expr("id div 2").as("parent"))
      val flat = graft.operators.Hierarchy.flatten(nodes, maxIters = 6)
      val bad = flat.filter(
        col("depth") =!= when(col("id") === 0, 0L)
          .otherwise(length(expr("bin(id)")).cast("long"))).count()
      assert(bad == 0L, s"$bad wrong depths")
      println(s"== depths verified: ${flat.count()} nodes, 0 mismatches")
    }
    spark.stop()
  }
}
