package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The persisted-IVF contract behind s19: serving from the artifact is
 * bit-equal to the in-memory IVF chain, and the posting scan is
 * restricted to the PROBED partitions by dynamic partition pruning —
 * the property that makes an object-storage ANN index affordable.
 */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"${sf()}/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  test("serve-from-artifact == in-memory ivfTopK, bit for bit") {
    val root = AnnIndex.build(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32)
    val served = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5)
    val inMem = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      centroidStride = 50, nProbe = 2, k = 5, maxCentroids = 32)
    assert(served.exceptAll(inMem).isEmpty && inMem.exceptAll(served).isEmpty)
  }

  test("posting scan reads exactly the probed lists (file-count, not plan text)") {
    // a plan-string assertion is vacuous here: Spark happily plans
    // dynamicpruningexpression(true) — "dynamicpruning" present, zero
    // files pruned. Assert what the scan actually read.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => (other.children ++ other.subqueries).flatMap(scans)
    }
    val root = AnnIndex.build(emb, "vec_id", "embedding",
      centroidStride = 50, maxCentroids = 32)
    val nLists = spark.read.parquet(s"$root/postings")
      .select("cid").distinct().count()
    // 2 queries × 2 probes → at most 4 of the lists
    val twoQueries = emb.filter(col("vec_id") % 250 === 0)
    val served = AnnIndex.search(spark, root, twoQueries, "vec_id",
      "embedding", nProbe = 2, k = 5)
    served.collect()
    val scan = scans(served.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.mkString.contains("postings"))
    assert(scan.nonEmpty)
    val files = scan.map(_.metrics("numFiles").value).sum
    assert(files <= 4 && files < nLists,
      s"posting scan read $files files of $nLists lists — not pruned")
  }

  test("maintain(build(half), rest) == build(all): frozen-quantizer append") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val rFull = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val full = AnnIndex.search(spark, rFull, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    val rInc = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    AnnIndex.maintain(spark, rInc, odds, "vec_id", "embedding")
    val inc = AnnIndex.search(spark, rInc, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(inc === full)
  }

  test("compact: fragmented lists -> one file per list, serve identical") {
    val base = emb.filter(col("vec_id") % 2 === 0)
    val root = AnnIndex.build(base, "vec_id", "embedding", 50, 32)
    AnnIndex.maintain(spark, root, emb.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding")
    AnnIndex.maintain(spark, root, emb.filter(col("vec_id") % 4 === 3),
      "vec_id", "embedding")
    def filesPerList(): Map[String, Int] = {
      val dirs = new java.io.File(s"$root/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
      dirs.map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(filesPerList().values.max > 1,
      "two appends should leave fragmented lists (else the test is vacuous)")
    AnnIndex.compact(spark, root)
    val fp = filesPerList()
    assert(fp.nonEmpty && fp.values.forall(_ == 1),
      s"lists not compacted to one file each: $fp")
    val after = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(after === before, "compaction changed serve results")
  }

  test("forget: victims vanish from their lists only, untouched lists " +
      "keep their files, serve == build over survivors, re-invoke is " +
      "a no-op") {
    val root = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val victims = emb.filter(col("vec_id") % 17 === 0)
    // the lists the victims live in = their frozen-quantizer routes
    val cent = spark.read.parquet(s"$root/centroids")
    val victimCids = Similarity.assignToCentroids(victims, "vec_id",
        "embedding", cent)
      .select(col("cid")).distinct().collect().map(_.getLong(0)).toSet
    def listFiles(): Map[String, Set[String]] =
      new java.io.File(s"$root/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cid="))
        .map(d => d.getName ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet"))
            .toSet).toMap
    val before = listFiles()
    AnnIndex.forget(spark, root, victims, "vec_id", "embedding")
    val after = listFiles()
    // pruned economics: a list no victim routes to is not rewritten —
    // its files are bit-identical by NAME (rename would change them)
    before.foreach { case (d, fs0) =>
      val cid = d.stripPrefix("cid=").toLong
      if (!victimCids.contains(cid))
        assert(after.get(d).contains(fs0),
          s"untouched list $d was rewritten")
    }
    val left = spark.read.parquet(s"$root/postings")
    assert(left.filter(col("vid") % 17 === 0).count() == 0,
      "victims survived the forget")
    val served = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    // reference = the s03 chain over the SURVIVING corpus with the
    // SAME frozen quantizer (vec_id 0 is both a centroid seed and a
    // victim, so build(survivors) would pick different centroids —
    // the quantizer is a parameter of the artifact, not of the corpus)
    val survAssign = Similarity.assignToCentroids(
      emb.filter(col("vec_id") % 17 =!= 0), "vec_id", "embedding", cent)
    val probes = Similarity.probeCentroids(queries, "vec_id",
      "embedding", cent, nProbe = 2)
    val scored = survAssign.join(broadcast(probes), Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        round(graft.functions.VectorFunctions.cosineFromParts(
          graft.functions.VectorFunctions.dot(col("qv"), col("vv")),
          col("qn"), col("vn")), 6).as("cos"))
    val want = Similarity.ranked(scored, 5).collect().toSet
    assert(served === want,
      "post-forget serve differs from an index that never held the victims")
    // compliance replay (the crash-recovery path): idempotent
    AnnIndex.forget(spark, root, victims, "vec_id", "embedding")
    val again = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(again === served, "replayed forget changed the index")
  }

  test("forget: a crash between the two swap renames (live list only " +
      "in .bak) recovers on re-invocation with no rows lost") {
    val root = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val victims = emb.filter(col("vec_id") % 17 === 0)
    // collect eagerly: forget retires these files
    val before = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    AnnIndex.forget(spark, root, victims, "vec_id", "embedding")
    val want = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(before != want, "fixture vacuous: forget changed nothing")
    // simulate the mid-swap crash on one list: live renamed to .bak,
    // staged install never happened — the .bak holds the list's ONLY copy
    val postings = new java.io.File(s"$root/postings")
    val someList = postings.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head
    val bak = new java.io.File(postings, s".${someList.getName}.bak")
    assert(someList.renameTo(bak), "test setup: rename failed")
    // re-invoking the same forget must restore the list, then rewrite
    AnnIndex.forget(spark, root, victims, "vec_id", "embedding")
    val got = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got === want,
      "mid-swap crash recovery lost rows or diverged")
    assert(!bak.exists(), "recovery left the .bak behind")
  }

  test("ingestBatch: replayed batch id is a no-op; result == one maintain") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val root = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    AnnIndex.ingestBatch(spark, root, odds, 7L, "vec_id", "embedding")
    val once = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    val rows = spark.read.parquet(s"$root/postings").count()
    // foreachBatch retry of the same batch id after a sink failure
    AnnIndex.ingestBatch(spark, root, odds, 7L, "vec_id", "embedding")
    assert(spark.read.parquet(s"$root/postings").count() == rows,
      "replayed batch id re-appended its vectors")
    val twice = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(twice === once)
  }

  test("ingestBatch: crash between intent and apply recovers exactly-once") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val root = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    // simulate the crash: stage + intent committed, apply never ran
    AnnIndex.stageIngest(spark, root, odds, 3L, "vec_id", "embedding")
    // re-invocation (the foreachBatch retry) must complete the apply
    AnnIndex.ingestBatch(spark, root, odds, 3L, "vec_id", "embedding")
    val got = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    val rRef = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val want = AnnIndex.search(spark, rRef, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got === want, "recovered ingest differs from build(all)")
  }

  test("rebuild keeps the PREVIOUS generation alive, retires older ones") {
    val r1 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val r2 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    // a holder of r1's lazy search() plan must still read intact files
    assert(r1 != r2 && new java.io.File(r1).exists &&
      new java.io.File(r2).exists)
    val r3 = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    assert(!new java.io.File(r1).exists, "two-generations-old not retired")
    assert(new java.io.File(r2).exists && new java.io.File(r3).exists)
  }
}
