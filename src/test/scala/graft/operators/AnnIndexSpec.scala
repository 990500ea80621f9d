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
    // the simulated crash killed the JVM: the per-JVM verified-layout
    // marker died with it (the rename above is out-of-band mutation no
    // live process would see)
    AnnIndex.invalidateLayout(root)
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

  test("a mid-swap crash recovers on ANY next operation, not only a " +
      "re-invoked forget (maintain used to recreate the live dir and " +
      "the stale-bak cleanup then destroyed the only copy)") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    val victims = evens.filter(col("vec_id") % 16 === 0)
    // expected end state: forget completed, THEN the odd half appended
    val rWant = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    AnnIndex.forget(spark, rWant, victims, "vec_id", "embedding")
    AnnIndex.maintain(spark, rWant, odds, "vec_id", "embedding")
    val want = AnnIndex.search(spark, rWant, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    // crash run: forget completes, then one list is put back into the
    // mid-swap state (live renamed to .bak, install "lost")
    val root = AnnIndex.build(evens, "vec_id", "embedding", 50, 32)
    AnnIndex.forget(spark, root, victims, "vec_id", "embedding")
    val postings = new java.io.File(s"$root/postings")
    val someList = postings.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head
    val bak = new java.io.File(postings, s".${someList.getName}.bak")
    assert(someList.renameTo(bak), "test setup: rename failed")
    // the crash killed the JVM: clear the per-JVM verified marker
    AnnIndex.invalidateLayout(root)
    // the NEXT operation is a maintain (parquet append would recreate
    // the live list dir) — its preamble must restore the .bak FIRST
    AnnIndex.maintain(spark, root, odds, "vec_id", "embedding")
    assert(!bak.exists(), "recovery left the .bak behind")
    val got = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got === want,
      "mid-swap crash + maintain lost the .bak'd list's rows")
  }

  test("an index emptied by forget serves empty results and further " +
      "ops are no-ops, not schema-inference crashes") {
    val tiny = emb.filter(col("vec_id") < 64)
    val root = AnnIndex.build(tiny, "vec_id", "embedding", 8, 8)
    AnnIndex.forget(spark, root, tiny, "vec_id", "embedding")
    val served = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5)
    assert(served.count() == 0, "emptied index served rows")
    assert(served.columns.toSeq ===
      Seq("qid", "rank", "nid", "cos"), "empty serve lost the shape")
    // a re-invoked forget (the crash-retry path) and a compact must
    // both be graceful no-ops on the empty layout
    AnnIndex.forget(spark, root, tiny, "vec_id", "embedding")
    AnnIndex.compact(spark, root)
    assert(AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).count() == 0)
  }

  test("requantize == build-from-scratch on the refit quantizer; a " +
      "crash after the intent commits resumes on the next search") {
    val evens = emb.filter(col("vec_id") % 2 === 0)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    // from-scratch reference on the refit quantizer
    val rRef = AnnIndex.build(emb, "vec_id", "embedding", 50, 32)
    val want = AnnIndex.search(spark, rRef, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    // drifted index: coarse quantizer from the early half, frozen append
    val root = AnnIndex.build(evens, "vec_id", "embedding", 100, 16)
    AnnIndex.maintain(spark, root, odds, "vec_id", "embedding")
    AnnIndex.requantize(spark, root, centroidStride = 50,
      maxCentroids = 32)
    val got = AnnIndex.search(spark, root, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got === want, "requantized index differs from build(all)")
    // crash sim: stage + intent committed, apply never ran — the next
    // artifact operation (a search) must resume the swap
    val root2 = AnnIndex.build(evens, "vec_id", "embedding", 100, 16)
    AnnIndex.maintain(spark, root2, odds, "vec_id", "embedding")
    AnnIndex.stageRequant(spark, root2, 50, 32)
    AnnIndex.invalidateLayout(root2) // the crash killed the JVM
    val got2 = AnnIndex.search(spark, root2, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got2 === want, "intent-committed requantize did not resume")
    assert(!new java.io.File(s"$root2/_requant.intent").exists(),
      "resumed swap left the intent marker behind")
    assert(!new java.io.File(s"$root2/.requant").exists(),
      "resumed swap left the stage dir behind")
  }

  test("requantize recall floor: refit recall >= frozen recall on a " +
      "drifted corpus (and the drift genuinely hurt the frozen index)") {
    // synthetic drift: region A (ids 0..199) clusters around axis 0;
    // region B (ids 200..399) arrives LATER around axes 2/3 — but each
    // B vector carries a tiny parity-keyed A-axis component, so under
    // the A-only frozen quantizer the B corpus SPLITS BY PARITY across
    // two A lists while true neighborhoods (same B axis, both
    // parities) span both — exactly how drift degrades IVF recall at
    // fixed nProbe. The refit quantizer (stride over the accumulated
    // corpus) gains B centroids on both axes, reuniting each
    // neighborhood into one probed list.
    import scala.jdk.CollectionConverters._
    val dim = 8
    def mk(id: Long): Array[Float] = {
      val a = Array.fill(dim)(0.0f)
      if (id < 200) {
        a(0) = 1.0f; a(1) = 0.05f * (id % 7)
      } else {
        // routing components: magnitude 0.004 — decisive for the
        // centroid argmax (margins ~2e-4 ≫ the 6dp rounding) while the
        // same-parity pair bonus (0.004² = 1.6e-5) is DOMINATED by one
        // jitter step (~1e-3), so routing never reorders true
        // neighborhoods
        a(0) = 0.004f * (id % 2)       // odd B → A-list of cid 0
        a(1) = 0.004f * ((id + 1) % 2) // even B → A-list of cid 150
        // axis and jitters keyed by id/2: ids 2k and 2k+1 are
        // opposite-parity TWINS (identical but for the routing dims),
        // so every vector's nearest drifted neighbor sits in the OTHER
        // frozen list — the recall loss is structural, not accidental
        a((2 + (id / 2) % 2).toInt) = 1.0f
        a(6) = 0.05f * ((id / 2) % 5)
        a(7) = 0.03f * ((id / 2) % 7)
      }
      a
    }
    val rows = (0L until 400L).map(i =>
      org.apache.spark.sql.Row(i, mk(i).toSeq)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val vecs = spark.createDataFrame(rows, schema).localCheckpoint()
    val qs = vecs.filter(col("vec_id") >= 200 && col("vec_id") % 5 === 0)
    val truth = Similarity.cosineTopK(vecs, qs, "vec_id", "embedding",
        k = 5).select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(served: Set[(Long, Long)]): Double =
      (served & truth).size.toDouble / truth.size
    // frozen: quantizer trained on region A only, B appended frozen
    val root = AnnIndex.build(vecs.filter(col("vec_id") < 200),
      "vec_id", "embedding", centroidStride = 50, maxCentroids = 4)
    AnnIndex.maintain(spark, root,
      vecs.filter(col("vec_id") >= 200), "vec_id", "embedding")
    def servedSet(): Set[(Long, Long)] =
      AnnIndex.search(spark, root, qs, "vec_id", "embedding",
          nProbe = 1, k = 5)
        .select(col("qid"), col("nid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val frozen = recall(servedSet())
    AnnIndex.requantize(spark, root, centroidStride = 50,
      maxCentroids = 8)
    val refit = recall(servedSet())
    assert(frozen < 0.9,
      f"fixture vacuous: drift did not hurt the frozen index " +
        f"(frozen recall $frozen%.2f)")
    assert(refit >= frozen,
      f"refit recall $refit%.2f fell below frozen $frozen%.2f")
    assert(refit > 0.9,
      f"refit recall $refit%.2f — the retrained quantizer should " +
        "reunite each drifted neighborhood into one probed list")
  }

  test("imbalance trigger: a balanced append reads ~1 and refit is a " +
      "NO-OP; collapsed arrivals cross the threshold, fire, and serve " +
      "== build-from-scratch on the drifted corpus") {
    // negative control: the odd half is the same distribution the
    // quantizer was fit on — the statistic must sit near 1 and the
    // conditional refit must leave the layout untouched
    val r0 = AnnIndex.build(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", 100, 16)
    AnnIndex.maintain(spark, r0, emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding")
    val quantBefore = spark.read.parquet(s"$r0/centroids")
      .orderBy("cid").collect().toSeq
    val d0 = AnnIndex.requantizeIfDrifted(spark, r0,
      maxImbalance = 2.0, centroidStride = 50, maxCentroids = 32)
    assert(d0.imbalance >= 1.0 && d0.imbalance < 2.0,
      f"undrifted imbalance ${d0.imbalance}%.3f outside the balanced regime")
    assert(!d0.fired, "undrifted corpus fired a refit")
    assert(spark.read.parquet(s"$r0/centroids")
        .orderBy("cid").collect().toSeq == quantBefore,
      "a non-firing trigger mutated the quantizer")

    // drift: every arrival rides the ones-direction the original
    // quantizer never carved — the whole stream lands in one list
    val embD = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val arrivals = embD.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), transform(col("embedding"),
        x => x * lit(0.05) + lit(1.0)).as("embedding"))
    val r1 = AnnIndex.build(embD.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", 100, 16)
    AnnIndex.maintain(spark, r1, arrivals, "vec_id", "embedding")
    val d1 = AnnIndex.requantizeIfDrifted(spark, r1,
      maxImbalance = 2.0, centroidStride = 50, maxCentroids = 32)
    assert(d1.imbalance > 2.0,
      f"collapsed arrivals read imbalance ${d1.imbalance}%.3f")
    assert(d1.fired, "drifted corpus did not fire")
    // the fired refit serves exactly what a from-scratch build on the
    // drifted corpus serves (r1 stays live: build retires only roots
    // two generations back)
    val rRef = AnnIndex.build(
      embD.filter(col("vec_id") % 2 === 0).unionByName(arrivals),
      "vec_id", "embedding", 50, 32)
    val want = AnnIndex.search(spark, rRef, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    val got = AnnIndex.search(spark, r1, queries, "vec_id",
      "embedding", nProbe = 2, k = 5).collect().toSet
    assert(got === want,
      "drift-triggered refit differs from build-from-scratch")
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
