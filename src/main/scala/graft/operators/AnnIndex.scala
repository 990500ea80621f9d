package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * Persisted IVF index: the build-once / serve-many shape that separates
 * [[Similarity.ivfTopK]]'s one-shot search into an INDEX ARTIFACT on
 * storage and a serving path that reads only what a query probes —
 * the same progression k01/k02 gave the text postings.
 *
 * Layout: a small centroid table plus the posting lists written
 * `partitionBy(cid)` (repartitioned on cid first, so each inverted
 * list is one contiguous file) — one directory per list. At serve time
 * the collected probe set becomes a literal partition filter, so the
 * scan reads ONLY the probed lists: a 2-probe query against a
 * 1024-list index touches 2/1024 of the corpus bytes, which is the
 * entire economics of serving ANN from object storage (AnnIndexSpec
 * asserts the scan's actual file count, and the gate hash-proves
 * serve-from-artifact ≡ the s03 in-memory chain).
 *
 * Scale notes: the build pays one bounded-broadcast assignment scan +
 * one partitioned write (amortized over every later query batch, the
 * q51 argument); the serving plan never materializes candidates beyond
 * the probed lists and ranks through the bounded-heap partial
 * aggregate, so the exchange carries O(queries × k).
 */
object AnnIndex {

  /** Roots of finished [[build]] generations, retired lazily: the
   * NEWEST finished generation stays on disk so a caller still holding
   * (or re-executing) the previous build's lazy search() plan reads
   * intact files, and everything older is deleted — a Verify/Bench
   * loop is bounded to two live generations (the q51 two-generation
   * cleanup contract). Holding a plan across TWO newer builds, or
   * building concurrently, remains out of contract. */
  private val deadRoots = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Per-JVM VERIFIED-LAYOUT cache (ADVICE r14): [[recoverLayout]] +
   * [[hasPostings]] walk the artifact's FS metadata — an exists probe
   * plus per-list listStatus — at the head of EVERY operation,
   * including every search() and imbalance(); negligible on local FS,
   * a per-query metadata storm on object-store roots. A root verified
   * once stays verified (key present; value caches the hasPostings
   * answer once a read path computed it) until a MUTATING op
   * invalidates it — at entry, so a crash mid-mutation leaves the root
   * unverified and the next operation re-walks. */
  private val verifiedLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Boolean]]()

  /** Also the specs' "JVM died here" hook: a real crash clears this
   * per-JVM map with the process, so a test that simulates the crash
   * by mutating the layout out-of-band must clear the marker too. */
  private[operators] def invalidateLayout(root: String): Unit = {
    verifiedLayouts.remove(root); ()
  }

  /** Pin a finished build OUT of the lazy two-generation retirement
   * queue: a TEMPLATE root (a committed index that later reps clone
   * from) must survive every subsequent [[build]], which would
   * otherwise retire it as "older generation". */
  def retain(root: String): Unit = {
    deadRoots.remove(root); ()
  }

  /**
   * Build the index artifact under a fresh scratch root: `centroids`
   * (cid, cv, cn) and `postings` (vid, vv, vn) partitioned by cid.
   * Returns the artifact root path.
   */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
      centroidStride: Int, maxCentroids: Int): String = {
    while (deadRoots.size() > 1) {
      val dead = deadRoots.poll()
      invalidateLayout(dead)
      graft.sources.Scratch.deleteNow(dead)
    }
    val root = graft.sources.Scratch.dir("ann_index")
    deadRoots.add(root)
    val cent = Similarity.strideCentroids(vectors, idCol, vecCol,
      centroidStride, maxCentroids)
    cent.write.mode("overwrite").parquet(s"$root/centroids")
    // repartition on the partition column before the partitioned write:
    // without it every write task emits one file into every cid dir
    // (tasks × lists tiny files — 8022 files for a 256-list 200k-row
    // index, measured in AnnSoak); with it each inverted list is one
    // contiguous file, which is what the pruned serve path should read
    Similarity.assignToCentroids(vectors, idCol, vecCol, cent)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$root/postings")
    root
  }

  /** Hadoop FS for an artifact root. */
  private def hfs(spark: SparkSession,
      root: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())

  /**
   * CRASH-RECOVERY PREAMBLE shared by EVERY artifact operation. Two
   * mid-swap layouts are repairable only while their transient copies
   * survive, so recovery must run before ANY operation reads or
   * rewrites the layout — not just a re-invoke of the op that crashed
   * (a crashed [[forget]] followed by [[maintain]] used to recreate
   * the live list dir via parquet append, after which forget's own
   * preamble saw "live exists" and deleted the `.bak` holding the only
   * copy of the pre-crash survivors):
   *
   *  1. a [[requantize]] whose intent marker committed — the staged
   *     quantizer+postings are complete; resume the swap (idempotent);
   *  2. a per-list [[forget]] swap caught between its two renames —
   *     the `.cid=N.bak` dir briefly holds the ONLY copy of that
   *     list's surviving rows; restore any list whose live dir is
   *     missing, drop the stale `.bak` otherwise.
   */
  private[operators] def recoverLayout(spark: SparkSession,
      root: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (verifiedLayouts.containsKey(root)) return
    val fs = hfs(spark, root)
    if (graft.sources.StoreIO.exists(spark, s"$root/_requant.intent"))
      applyRequant(spark, root)
    val liveDir = new Path(s"$root/postings")
    if (fs.exists(liveDir))
      fs.listStatus(liveDir)
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(".cid=") &&
          st.getPath.getName.endsWith(".bak"))
        .foreach { st =>
          val lv = new Path(liveDir,
            st.getPath.getName.stripPrefix(".").stripSuffix(".bak"))
          if (!fs.exists(lv))
            require(fs.rename(st.getPath, lv),
              s"recovery: cannot restore $lv from ${st.getPath}")
          else fs.delete(st.getPath, true)
        }
    verifiedLayouts.put(root, None); ()
  }

  /** Does the live postings layout hold any data file? An index whose
   * every list was forgotten (or a re-invoked forget on one) has an
   * empty dir that schema inference cannot read — callers branch to
   * their empty-layout contract instead of throwing 'Unable to infer
   * schema'. */
  private def hasPostings(spark: SparkSession, root: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val cached = verifiedLayouts.get(root)
    if (cached != null && cached.isDefined) return cached.get
    val fs = hfs(spark, root)
    val live = new Path(s"$root/postings")
    val has = fs.exists(live) && fs.listStatus(live).exists { d =>
      d.isDirectory && d.getPath.getName.startsWith("cid=") &&
        fs.listStatus(d.getPath).exists(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet"))
    }
    // cache only under a verified (recovered) layout — the map key is
    // the verification marker, so a root no read path recovered yet
    // must not get one as a side effect
    if (cached != null) verifiedLayouts.put(root, Some(has))
    has
  }

  /** The posting scan with the partition column read at the probe
   * key's type (directory inference yields INT for small values; the
   * mismatch would put a cast over the partition column and defeat
   * pruning). */
  private def typedPostings(spark: SparkSession, root: String): DataFrame = {
    val inferred = spark.read.parquet(s"$root/postings").schema
    val typed = org.apache.spark.sql.types.StructType(inferred.map { f =>
      if (f.name == "cid") f.copy(dataType =
        org.apache.spark.sql.types.LongType)
      else f
    })
    spark.read.schema(typed).parquet(s"$root/postings")
  }

  /**
   * Incremental maintenance: assign ONLY the new batch against the
   * artifact's existing centroids and append its posting rows into the
   * cid-partitioned layout — no rebuild, no touch of existing posting
   * files (parquet append adds files per partition directory). The
   * quantizer is intentionally frozen: that is how production IVF
   * indexes ingest (re-training centroids would move existing vectors'
   * assignments and force a rebuild); s20's gate hash-proves
   * maintain(build(half), rest) ≡ build(all) BECAUSE the frozen
   * stride quantizer is identical either way.
   */
  def maintain(spark: SparkSession, root: String, newVectors: DataFrame,
      idCol: String, vecCol: String): Unit = {
    recoverLayout(spark, root)
    invalidateLayout(root)
    val cent = spark.read.parquet(s"$root/centroids")
    Similarity.assignToCentroids(newVectors, idCol, vecCol, cent)
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid")
      .parquet(s"$root/postings")
  }

  /**
   * EXACTLY-ONCE streaming ingest (the s22 foreachBatch body).
   * [[maintain]] is a blind append, so a foreachBatch RETRY of a batch
   * id — crash recovery, transient sink failure — would double its
   * vectors. This wraps the same frozen-quantizer append in the
   * SketchStore intent idiom: the batch's assigned posting files are
   * STAGED first, an intent marker naming the stage commits atomically,
   * then the staged part files MOVE into the live cid dirs and an
   * applied marker retires the batch id. Every crash point recovers on
   * re-invocation: applied → no-op; intent → resume the move (a part
   * file lives in the stage or the live dir, never both — file moves
   * are idempotent, and staged filenames are write-unique so resumed
   * moves never collide); no marker → full path.
   */
  def ingestBatch(spark: SparkSession, root: String, batch: DataFrame,
      batchId: Long, idCol: String, vecCol: String): Unit = {
    import graft.sources.StoreIO
    recoverLayout(spark, root)
    val applied = s"$root/_ingest_$batchId.applied"
    if (StoreIO.exists(spark, applied)) return
    invalidateLayout(root)
    val intent = s"$root/_ingest_$batchId.intent"
    val stage: String =
      if (StoreIO.exists(spark, intent))
        StoreIO.readString(spark, intent) // crashed attempt
      else stageIngest(spark, root, batch, batchId, idCol, vecCol)
    // apply: promote every staged part file into its live list dir
    val fs = StoreIO.fs(spark, root)
    val live = new org.apache.hadoop.fs.Path(s"$root/postings")
    StoreIO.list(spark, stage)
      .filter(d => d.getName.startsWith("cid=") && fs.isDirectory(d))
      .foreach { d =>
        val dst = new org.apache.hadoop.fs.Path(live, d.getName)
        fs.mkdirs(dst)
        fs.listStatus(d).filter(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet")).foreach { f =>
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(dst, f.getPath.getName)),
            s"ingest apply: cannot move ${f.getPath} into $dst")
        }
      }
    StoreIO.writeAtomic(spark, applied, stage)
    StoreIO.delete(spark, stage)
    StoreIO.delete(spark, intent)
  }

  /** First half of [[ingestBatch]]: write the assigned batch postings
   * to a stage dir, then atomically commit the intent marker naming
   * it. Split out so the spec can pin crash-between-intent-and-apply
   * recovery. */
  private[operators] def stageIngest(spark: SparkSession, root: String,
      batch: DataFrame, batchId: Long, idCol: String,
      vecCol: String): String = {
    val st = s"$root/.ingest_stage_$batchId"
    val cent = spark.read.parquet(s"$root/centroids")
    Similarity.assignToCentroids(batch, idCol, vecCol, cent)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(st)
    graft.sources.StoreIO.writeAtomic(spark,
      s"$root/_ingest_$batchId.intent", st)
    st
  }

  /**
   * Compaction: every [[maintain]] appends one file per touched list
   * (parquet append semantics), so a daily-ingest index accumulates
   * batch-count files per inverted list — and the serve path's
   * economics are file-count economics (each probed list should be ONE
   * contiguous read, not a seek per historical batch). Rewrite the
   * posting rows clustered back to one file per list and swap the
   * compacted layout in: stage to a sibling dir first (Spark refuses
   * to overwrite a path it reads, and a crash mid-stage leaves the
   * live layout untouched), then two renames install it — the same
   * swap contract as `GcdSink.compactSnapshot`. Row content is
   * unchanged, so serve results are identical pre/post (spec-pinned,
   * along with the 1-file-per-list invariant); the k03/q87 tiering
   * stage applied to the vector index.
   */
  def compact(spark: SparkSession, root: String): Unit = {
    import org.apache.hadoop.fs.Path
    recoverLayout(spark, root)
    if (!hasPostings(spark, root)) return // nothing to compact
    invalidateLayout(root)
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val live = new Path(s"$root/postings")
    val staged = new Path(s"$root/postings.compact")
    val bak = new Path(s"$root/.postings.bak")
    spark.read.parquet(live.toString)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(staged.toString)
    fs.delete(bak, true)
    require(fs.rename(live, bak), s"cannot stage $live")
    require(fs.rename(staged, live), s"cannot install compacted $live")
    fs.delete(bak, true)
  }

  /**
   * COMPLIANCE FORGET on the index artifact — the right-to-be-forgotten
   * path the other persisted artifacts already carry (ledger `forget`,
   * store `delete`), applied to the IVF layout. Victims are `(id, vec)`
   * rows: the caller supplies the vector (exactly like PostingLedger
   * .forget takes signatures) because the FROZEN quantizer routes it to
   * the ONE list the vector lives in — build/maintain/ingest all place
   * a vector via [[Similarity.assignToCentroids]], so recomputing that
   * assignment names the only lists that can hold a victim's posting
   * row, and ONLY those lists are read and rewritten (an id-only forget
   * would scan every list). Centroids are PARAMETERS of the frozen
   * quantizer, not corpus rows: forgetting a vector that seeded a
   * centroid removes its posting row while the centroid keeps serving
   * (retraining would move every existing assignment — s20's frozen
   * rule).
   *
   * Crash contract: the rewritten lists stage to a sibling dir first
   * (a crash before any swap leaves the live layout untouched), then
   * each victim list swaps in via two renames (live → .bak, staged →
   * live). A crash ANYWHERE recovers on re-invocation: the preamble
   * below restores any list caught between its two renames (the .bak
   * briefly holds the ONLY copy of that list's surviving rows), and
   * the rewrite itself is idempotent (anti-joining absent keys
   * rewrites a list identically; a list emptied by the delete stays
   * deleted). A list whose every row was a victim's disappears from
   * the layout entirely.
   */
  def forget(spark: SparkSession, root: String, victims: DataFrame,
      idCol: String, vecCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    // recover any crashed prior swap FIRST: a live list missing while
    // its .bak survives is mid-swap — restore it before anything reads
    // the layout (without this, the re-invoke would read a hole and
    // the bak cleanup below would delete the rows' only copy)
    recoverLayout(spark, root)
    // a layout already emptied (every list forgotten) has nothing to
    // forget — and no data file to infer a schema from
    if (!hasPostings(spark, root)) return
    invalidateLayout(root)
    val cent = spark.read.parquet(s"$root/centroids")
    val assigned = Similarity.assignToCentroids(victims, idCol, vecCol,
      cent).select(col("vid"), col("cid")).localCheckpoint()
    // bounded driver-side list (≤ the list count), the search() shape
    val cids = assigned.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (cids.isEmpty) return
    val fs = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val live = new Path(s"$root/postings")
    // victim lists only, pruned through the same literal partition
    // filter (and the same typed-cid read) the serve path uses
    val remaining = typedPostings(spark, root)
      .filter(col("cid").isin(cids: _*))
      .join(broadcast(assigned.select(col("vid"))), Seq("vid"),
        "left_anti")
    val staged = new Path(s"$root/postings.forget")
    fs.delete(staged, true)
    remaining.repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(staged.toString)
    cids.foreach { c =>
      val liveList = new Path(live, s"cid=$c")
      val stagedList = new Path(staged, s"cid=$c")
      val bak = new Path(live, s".cid=$c.bak")
      fs.delete(bak, true)
      if (fs.exists(liveList))
        require(fs.rename(liveList, bak), s"cannot stage out $liveList")
      // a fully-emptied list has no staged dir — it simply disappears
      if (fs.exists(stagedList))
        require(fs.rename(stagedList, liveList),
          s"cannot install forgotten list $liveList")
      fs.delete(bak, true)
    }
    fs.delete(staged, true)
  }

  /**
   * Serve top-k from the artifact: queries probe the centroid table
   * (small broadcast), and the posting scan is restricted to the
   * probed cid partitions by a LITERAL partition filter built from the
   * collected probe set.
   *
   * Why driver-collected and not dynamic partition pruning: the probe
   * set is bounded by the LIST COUNT (≤ maxCentroids — a few hundred
   * longs) regardless of corpus or query-batch size, so collecting it
   * is the bounded-scalar runtime-filter shape (BloomJoin's). DPP was
   * tried first and silently degrades to dynamicpruningexpression(true)
   * for this plan under AQE (the probe side is a windowed subplan; the
   * planner declines the subquery and the serve path reads EVERY
   * list — caught by AnnSoak's scan metrics, while the plan STRING
   * still advertised "dynamicpruning"). The literal IN filter prunes
   * statically and verifiably: AnnIndexSpec asserts the scan's
   * numFiles equals the probed-list count.
   */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    recoverLayout(spark, root)
    // an index whose every posting was forgotten serves EMPTY results
    // (the [[ranked]] output shape), not a schema-inference crash
    if (!hasPostings(spark, root))
      return queries.limit(0).select(col(idCol).as("qid"),
        lit(1).cast("int").as("rank"), col(idCol).as("nid"),
        lit(0.0).as("cos"))
    val cent = spark.read.parquet(s"$root/centroids")
    val probes = Similarity.probeCentroids(queries, idCol, vecCol,
      cent, nProbe)
    val probedCids = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    val postings = typedPostings(spark, root)
      .filter(col("cid").isin(probedCids: _*))
    val scored = postings.join(broadcast(probes), Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid").as("nid"),
        round(VF.cosineFromParts(VF.dot(col("qv"), col("vv")),
          col("qn"), col("vn")), 6).as("cos"))
    Similarity.ranked(scored, k)
  }

  /**
   * RE-QUANTIZATION — the one lifecycle operation the frozen-quantizer
   * rule forbids in-flight and production IVF indexes therefore run
   * OFFLINE: on a drifting corpus the original centroids stop covering
   * the data (a coarse quantizer trained on last year's embedding
   * distribution routes this year's vectors into a few overfull,
   * badly-separated lists) and recall at fixed nProbe decays until the
   * quantizer is REFIT. This retrains the coarse quantizer on the
   * ACCUMULATED corpus — the same deterministic stride seeding
   * [[build]] uses, now over every ingested id, so the refit index is
   * bit-identical to an index built from scratch on today's corpus
   * (the s24 gate hash-proves exactly that; the recall-floor spec
   * shows refit ≥ frozen on a drifted synthetic corpus) — reassigns
   * every posting row, and installs centroids + postings TOGETHER.
   *
   * Crash contract (the two pieces must swap atomically — serving new
   * centroids over old postings would route probes into lists built by
   * a different quantizer): both stage under `.requant/` first (a
   * crash before the intent marker leaves the live layout untouched
   * and the stale stage is deleted on the next attempt), then an
   * intent marker commits the swap; [[recoverLayout]] — which every
   * operation runs first — resumes a committed swap idempotently, so
   * any crash point recovers on the next artifact operation of ANY
   * kind.
   */
  def requantize(spark: SparkSession, root: String, centroidStride: Int,
      maxCentroids: Int): Unit = {
    recoverLayout(spark, root)
    invalidateLayout(root)
    stageRequant(spark, root, centroidStride, maxCentroids)
    applyRequant(spark, root)
  }

  /** First half of [[requantize]]: retrain + reassign into the stage
   * dir, then atomically commit the intent marker. Split out so the
   * spec can pin crash-between-intent-and-apply recovery (any
   * subsequent artifact operation resumes the swap). */
  private[operators] def stageRequant(spark: SparkSession, root: String,
      centroidStride: Int, maxCentroids: Int): Unit = {
    require(hasPostings(spark, root),
      s"requantize: $root holds no postings — nothing to retrain on")
    val stage = s"$root/.requant"
    graft.sources.StoreIO.delete(spark, stage) // un-committed leftovers
    val corpus = typedPostings(spark, root)
      .select(col("vid"), col("vv"))
    val cent = Similarity.strideCentroids(corpus, "vid", "vv",
      centroidStride, maxCentroids).localCheckpoint()
    cent.write.mode("overwrite").parquet(s"$stage/centroids")
    Similarity.assignToCentroids(corpus, "vid", "vv", cent)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$stage/postings")
    graft.sources.StoreIO.writeAtomic(spark, s"$root/_requant.intent",
      stage)
  }

  /** The committed half of [[requantize]]'s swap — idempotent, so
   * [[recoverLayout]] can resume it from any crash point: per piece,
   * a staged dir present means "not yet installed" (rename live out,
   * staged in); absent means that piece already swapped. The intent
   * marker retires LAST, after both pieces and the stage dir are
   * gone. */
  private def applyRequant(spark: SparkSession, root: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = hfs(spark, root)
    Seq("centroids", "postings").foreach { part =>
      val staged = new Path(s"$root/.requant/$part")
      val live = new Path(s"$root/$part")
      val old = new Path(s"$root/.$part.old")
      if (fs.exists(staged)) {
        fs.delete(old, true)
        if (fs.exists(live))
          require(fs.rename(live, old), s"requantize: cannot stage out $live")
        require(fs.rename(staged, live),
          s"requantize: cannot install $live")
      }
      fs.delete(old, true)
    }
    fs.delete(new Path(s"$root/.requant"), true)
    fs.delete(new Path(s"$root/_requant.intent"), false)
  }

  /**
   * LIST-OCCUPANCY IMBALANCE — the drift statistic that decides WHEN
   * [[requantize]] is worth its full-rewrite cost. On a drifting corpus
   * the frozen quantizer routes arrivals into lists it never carved
   * boundaries for, so occupancy concentrates: the hottest list's share
   * of the corpus climbs far past the uniform 1/nLists, probe cost on
   * that list grows with the list (the serve scan reads whole lists),
   * and fixed-nProbe recall decays because one list holds most of the
   * answers. This is the signal production IVF deployments monitor —
   * it is computable from the ARTIFACT alone (posting-list row counts
   * plus the quantizer's list count; no vector math, no corpus scan
   * beyond a count-by-partition-key that partition pruning keeps
   * columnar-metadata-cheap), unlike recall, which needs ground truth.
   *
   * Normalized as `max(share) · nLists`: ≈1 when balanced, → nLists
   * when fully collapsed into one list — one threshold works at any
   * list count. The denominator counts the QUANTIZER's lists (the
   * centroid table), not occupied lists: emptied lists are themselves
   * a drift symptom and must not shrink the scale.
   *
   * 0.0 on an empty layout (nothing ingested → nothing drifted).
   */
  def imbalance(spark: SparkSession, root: String): Double = {
    recoverLayout(spark, root)
    if (!hasPostings(spark, root)) return 0.0
    val nLists = spark.read.parquet(s"$root/centroids").count()
    val r = typedPostings(spark, root)
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot"))
      .head()
    r.getLong(0).toDouble / r.getLong(1) * nLists
  }

  /**
   * Drift-TRIGGERED [[requantize]]: refit the coarse quantizer only
   * when [[imbalance]] crosses `maxImbalance` — the maintenance policy
   * a scheduled index-hygiene job runs, so a stable corpus never pays
   * the full reassign rewrite and a drifted one is refit before recall
   * decays further.
   *
   * `maxImbalance` is CALIBRATED TO THE FIT-TIME BASELINE, not
   * universal: read [[imbalance]] right after [[build]] and set the
   * threshold as a multiple of it. A distribution's natural occupancy
   * skew under nearest-centroid assignment varies widely — the
   * zero-centered gate embeddings sit at 1.05–1.3× uniform (so the
   * gate's 2.0 separates regimes), while AnnSoak's positive-orthant
   * uniform corpus sits at ~6× on 256 lists (every vector leans
   * toward the mean direction) and the soak therefore triggers at
   * 3× ITS OWN baseline. What drift changes is the statistic
   * RELATIVE to fit time; an absolute bar chosen without a baseline
   * read would misfire either way. Returns the measured statistic
   * ALONGSIDE whether the refit ran (ADVICE r14: callers were reading
   * [[imbalance]] immediately before calling this, paying the
   * posting-metadata scan 2-3× per decision); crash safety is
   * [[requantize]]'s staged two-phase swap.
   */
  final case class DriftDecision(imbalance: Double, fired: Boolean)

  def requantizeIfDrifted(spark: SparkSession, root: String,
      maxImbalance: Double, centroidStride: Int,
      maxCentroids: Int): DriftDecision = {
    val im = imbalance(spark, root)
    val drifted = im > maxImbalance
    if (drifted) requantize(spark, root, centroidStride, maxCentroids)
    DriftDecision(im, drifted)
  }
}
