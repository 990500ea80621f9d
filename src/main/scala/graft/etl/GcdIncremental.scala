package graft.etl

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import GcdSchemas.GcdFlags
import graft.sources.Scratch

/**
 * Incremental snapshot maintenance — the answer to the reference's real
 * operational pain: its pipeline recomputes the ENTIRE denormalized
 * snapshot from every dump (reference Main.java:380-513 re-runs the full
 * 5-way join for all ~2.5M issues even when a weekly dump touches a few
 * thousand). Every snapshot row derives from exactly ONE issue (the join
 * tree is rooted at `gcd_issue`; stories, credits and dictionary probes
 * are all per-issue satellites), so the snapshot is maintainable:
 *
 *   - rebuild ONLY the touched issues — run the full
 *     [[GcdSnapshot.build]] plan over the source tables semi-join-
 *     restricted to the touched issue set (at scale: partition-pruned
 *     reads of the issue/story/credit tables, dictionary dims broadcast
 *     as always);
 *   - carry every other issue's rows over from the previous snapshot
 *     verbatim;
 *   - deletions (issues absent from the new dump) fall out of the same
 *     carry by including them in the touched set with no rebuild rows
 *     to contribute.
 *
 * Two forms ship. [[maintain]] is the ALGEBRA — carried ∪ rebuilt as
 * pure DataFrames, retained for in-JVM property pins (identity /
 * deletion / ≡-full-rebuild in GcdIncrementalSpec); its carry anti-joins
 * the whole base, so as a physical plan it reads and rewrites O(base)
 * per dump. [[SnapshotStore]] is the PHYSICAL operator the driver gates
 * (g03): the snapshot persists bucketed by `pmod(issue_id, nBuckets)`,
 * the carry anti-join runs only INSIDE the buckets the dump touches, and
 * every untouched bucket's files carry over by pointer with zero I/O —
 * [[graft.streaming.BucketedUpsert]]'s merge strategy applied to the
 * flagship. A dump touching k of n buckets pays O(dump + base·k/n)
 * instead of O(base); at 100 TB, nBuckets is sized so a bucket is a few
 * files (~1 GB) and a weekly dump reads thousands of bucket files, not
 * the whole store. GcdSoak's `incremental` stage measures exactly that
 * (the StreamSoak evidence pattern).
 *
 * Correctness contract (hash-gated by g03 against the FULL-rebuild g01
 * oracle): maintain(build(yesterday), touched) ≡ build(today).
 */
object GcdIncremental {

  /** Rebuild rows for the touched issues only: the full snapshot plan
   * over semi-join-restricted per-issue sources (dictionary dims stay
   * whole — they broadcast regardless). Shared by [[maintain]] and
   * [[SnapshotStore.maintain]]. */
  private[etl] def rebuildTouched(spark: SparkSession,
      tables: Map[String, DataFrame], touched: DataFrame,
      date: String, flags: GcdFlags): DataFrame = {
    val issueTab = tables("gcd_issue")
    val issues = issueTab
      .join(touched, issueTab("id") === touched("issue_id"), "left_semi")
    val storyTab = tables("gcd_story")
    val stories = storyTab
      .join(touched, storyTab("issue_id") === touched("issue_id"),
        "left_semi")
    val credits = tables.get("gcd_story_credit").map(
      _.join(stories.select(col("id").as("__sid")),
        col("story_id") === col("__sid"), "left_semi"))
    val restricted = tables +
      ("gcd_issue" -> issues) + ("gcd_story" -> stories) ++
      credits.map("gcd_story_credit" -> _)
    GcdSnapshot.build(spark, restricted, date, flags)
  }

  /**
   * Dataframe-level maintenance algebra: carried ∪ rebuilt. This is the
   * SPECIFICATION the store is proven against (GcdIncrementalSpec pins
   * identity, deletion, and ≡-full-rebuild on it in-JVM); as a physical
   * plan its carry scans the entire base, so production maintenance goes
   * through [[SnapshotStore]], whose carry is partition-pruned.
   *
   * @param baseSnapshot   the previous snapshot (88-column
   *                       [[GcdSnapshot.build]] output, array-typed)
   * @param tables         TODAY's source tables ([[GcdSnapshot.sourceTables]])
   * @param touchedIssues  one-column DataFrame `issue_id` of issues whose
   *                       rows must be (re)built — changed, added, or
   *                       deleted in the new dump
   */
  def maintain(spark: SparkSession, baseSnapshot: DataFrame,
      tables: Map[String, DataFrame], touchedIssues: DataFrame,
      date: String, flags: GcdFlags = GcdFlags()): DataFrame = {
    val touched = touchedIssues.select(col("issue_id")).distinct()
    val rebuilt = rebuildTouched(spark, tables, touched, date, flags)
    // the using-column anti-join hoists issue_id to the front — restore
    // the snapshot's canonical column order before the union
    val carried = baseSnapshot.join(touched, Seq("issue_id"), "left_anti")
      .select(baseSnapshot.columns.map(col): _*)
    carried.unionByName(rebuilt)
  }

  /** Per-maintain evidence for the soak: what the carry actually read. */
  final case class MaintainMetrics(touchedBuckets: Int, nBuckets: Int,
      carryRowsRead: Long, wallMs: Long)

  /**
   * The persisted, bucket-partitioned snapshot store. One attempt-unique
   * directory per write; within it, one `__bucket=<b>` leaf dir (one
   * file — the write is repartitioned on the bucket key) per key bucket.
   * The per-bucket pointer map is COMMITTED to a durable manifest after
   * every init/maintain through the shared [[graft.streaming.TxLog]]
   * (the same transaction log the streaming upsert store uses): a
   * driver loss no longer loses the store — [[GcdIncremental.recover]]
   * reattaches from the last committed manifest, and with
   * `retainHistory` every committed generation stays readable via
   * [[SnapshotStore.snapshotAsOf]] under STABLE version numbers
   * (1 = init, 2 = after the first dump, … — numbers survive pruning
   * and recovery). Superseded bucket versions retire only AFTER the
   * replacing commit (non-history stores), so any crash point leaves
   * the last committed manifest fully readable.
   *
   * @param collectMetrics when true (soak), each maintain also counts
   *   the carry rows it read — an extra pass over the TOUCHED buckets
   *   only, left off in gated runs.
   * @param root an existing store root to attach to (recovery); default
   *   a fresh scratch dir.
   *
   * On the g03/g04 gates' two-generation wall cost: a gate run pays
   * init (full bucketed write of yesterday's base) + maintain. Neither
   * write is skippable without un-testing the operator — if init didn't
   * persist, the carry would have to recompute yesterday's build plan
   * instead of reading bucket files, which is exactly the in-memory
   * [[GcdIncremental.maintain]] ALGEBRA the store exists to supersede.
   * The init write is a once-per-store cost amortized over every later
   * dump; GcdSoak's `incremental` stage prints the maintain/rebuild
   * wall ratio to prove the per-dump side pays for itself.
   */
  final class SnapshotStore(ss: SparkSession, nBuckets: Int = 64,
      collectMetrics: Boolean = false, retainHistory: Boolean = false,
      root: Option[String] = None) {

    private val storeRoot = root.getOrElse(Scratch.dir("gcd_snap_store"))
    private var columns: Array[String] = Array.empty
    private val feedPaths = mutable.ArrayBuffer.empty[String]
    // attempt-unique feed-dir numbering (the tx.attemptDir idea for the
    // change log): incremented BEFORE each feed write, restored past
    // every existing changes/ entry on recovery — a maintain retried
    // after a crash mid-feed-write can never collide with the crashed
    // attempt's half-written directory
    private var feedAttempt = 0L
    // the shared transaction-log core (commit mechanics, recovery,
    // retention vacuum, orphan gc — see TxLog). The feed-path list
    // rides in the manifest header, so the change log is crash-
    // consistent with the pointer map it describes.
    private val tx = new graft.streaming.TxLog(ss, storeRoot,
      retainHistory, () => Seq(
        "nBuckets" -> nBuckets.toString, "key" -> "issue_id",
        "history" -> retainHistory.toString,
        "columns" -> columns.mkString(","),
        "feeds" -> feedPaths.mkString(";")))
    private def current = tx.current
    val metrics: mutable.ArrayBuffer[MaintainMetrics] =
      mutable.ArrayBuffer()

    private def bucketOf = pmod(col("issue_id"), lit(nBuckets)).cast("int")

    /** One file per bucket per write: repartition on the bucket key
     * so each bucket's rows land in a single task's single leaf file. */
    private def writeBuckets(df: DataFrame): Map[Int, String] = {
      val out = tx.attemptDir(tx.seq + 1)
      df.withColumn("__bucket", bucketOf)
        .repartition(nBuckets, col("__bucket"))
        .write.partitionBy("__bucket").parquet(out)
      graft.sources.StoreIO.list(df.sparkSession, out)
        .filter(_.getName.startsWith("__bucket="))
        .map(p => p.getName.stripPrefix("__bucket=").toInt ->
          p.toUri.getPath)
        .toMap
    }

    /** Full (re)build of the store from a complete snapshot. */
    def init(snapshot: DataFrame): Unit = {
      columns = snapshot.columns
      val superseded = current.values.toSeq
      val written = writeBuckets(snapshot)
      current.clear()
      current ++= written
      tx.commit("init")
      if (!retainHistory) tx.retire(superseded)
    }

    private[etl] def loadManifest(): Unit = {
      val tokens = tx.load()
      // same pin semantics as the upsert store: the bucketing function's
      // free parameters and the retention mode must match the committed
      // store or keys silently mis-route / history gets destroyed
      tokens.get("nBuckets").map(_.toInt).foreach { mfN =>
        require(mfN == nBuckets,
          s"recover: manifest nBuckets=$mfN but store was built with " +
            s"nBuckets=$nBuckets — issues would route to wrong buckets")
      }
      val mfHistory = tokens.get("history").map(_.toBoolean)
        .getOrElse(tx.history().nonEmpty)
      require(mfHistory == retainHistory,
        s"recover: manifest retainHistory=$mfHistory but store was " +
          s"built with retainHistory=$retainHistory")
      columns = tokens.getOrElse("columns", "").split(",")
        .filter(_.nonEmpty)
      require(columns.nonEmpty,
        s"recover: manifest at $storeRoot carries no column list")
      feedPaths.clear()
      feedPaths ++= tokens.getOrElse("feeds", "").split(";")
        .filter(_.nonEmpty)
      // resume feed numbering past every existing changes/ entry —
      // committed or crashed — so retries never collide
      feedAttempt = graft.sources.StoreIO
        .list(ss, s"$storeRoot/changes")
        .flatMap(p => p.getName.stripPrefix("f").toLongOption)
        .maxOption.map(_ + 1).getOrElse(0L)
    }

    /** Apply one dump: rebuild touched issues, anti-join-carry ONLY the
     * touched buckets, carry every untouched bucket by pointer.
     *
     * With `emitFeed` set, the maintain also appends a CHANGE-DATA-FEED
     * generation under `<root>/changes/` — the row-level delta this dump
     * caused, as 'D' before-images ∪ 'I' after-images (an update is its
     * D+I pair; unchanged rows of a touched issue cancel in the
     * symmetric diff). Both sides are parquet re-reads of the TOUCHED
     * buckets only — before-images from the superseded bucket files
     * (diffed before retirement), after-images from the replacing ones —
     * so the feed costs O(dump + touched buckets), never O(base): the
     * same economics as the carry, and the reason a consumer can tail
     * the feed instead of diffing snapshots (a full-snapshot diff is the
     * 100 TB anti-pattern; g04 hash-proves the bounded diff equals it). */
    def maintain(tables: Map[String, DataFrame], touchedIssues: DataFrame,
        date: String, flags: GcdFlags = GcdFlags(),
        emitFeed: Boolean = false): Unit = {
      val t0 = System.nanoTime()
      // materialized ONCE: the touched set feeds six-plus separate
      // subtrees (three rebuild semi-joins, the bucket-routing collect,
      // the carry anti-join, the feed images' semi-joins), and each
      // would otherwise re-evaluate its derivation — at production
      // scale that is re-diffing the dump once per consumer (guide
      // §7.2 duplicated subtrees / §5 lineage truncation)
      val touched = touchedIssues.select(col("issue_id")).distinct()
        .localCheckpoint()
      val rebuilt = rebuildTouched(ss, tables, touched, date, flags)
      // bounded driver-side list (≤ nBuckets ints), not a data collect
      val tb = touched.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (tb.nonEmpty) {
        val prevPaths = tb.toSeq.flatMap(current.get)
        // ONE read (one FileIndex) of the touched buckets' previous
        // version, shared by the carry anti-join, the metrics count and
        // the feed's before-images — each separate read.parquet() paid
        // its own file-listing pass (a listing JOB past the parallel-
        // discovery threshold) over the same dirs
        val prevDf = prevPaths.headOption.map(_ =>
          ss.read.parquet(prevPaths: _*))
        val carried = prevDf.map(
          _.join(touched, Seq("issue_id"), "left_anti")
            .select(columns.map(col): _*))
        val carryRows =
          if (collectMetrics) prevDf.map(_.count()).getOrElse(0L)
          else -1L
        val written = writeBuckets(
          carried.map(_.unionByName(rebuilt)).getOrElse(rebuilt))
        if (emitFeed) {
          // touched-issue row images on each side of this maintain; a
          // missing side (all-new buckets / full deletion) is an empty
          // relation with the snapshot schema
          def images(df: Option[DataFrame]): DataFrame = {
            val any = (prevPaths ++ written.values).head
            df.getOrElse(ss.read.parquet(any).limit(0))
              .join(touched, Seq("issue_id"), "left_semi")
              .select(columns.map(col): _*)
          }
          // before-images ride the SAME prevDf read as the carry
          val before = images(prevDf)
          val afterPaths = tb.toSeq.flatMap(written.get)
          val after = images(
            afterPaths.headOption.map(_ =>
              ss.read.parquet(afterPaths: _*)))
          // symmetric diff in ONE shuffle: tag each side, group on the
          // full row, keep rows present on exactly one side. min/max of
          // the tag distinguishes only-before (max=-1 → 'D') from
          // only-after (min=1 → 'I'); both-sides rows have min<max and
          // cancel. Set semantics identical to the two-EXCEPT form
          // (groupBy dedupes within a side), at half the shuffle cost —
          // each EXCEPT was itself a full aggregate over both sides.
          val tagged = before.withColumn("__side", lit(-1))
            .unionByName(after.withColumn("__side", lit(1)))
          val feed = tagged
            .groupBy(columns.map(col).toIndexedSeq: _*)
            .agg(min(col("__side")).as("__mn"),
              max(col("__side")).as("__mx"))
            .filter(col("__mn") === col("__mx"))
            .select(when(col("__mx") === -1, lit("D"))
              .otherwise(lit("I")).as("op") +: columns.map(col): _*)
          // the feed generation is WRITTEN before the commit and its
          // path rides in the manifest header ("feeds"), so the change
          // log is atomic with the pointer map: a crash before the
          // commit leaves an unreferenced dir (orphan, reclaimed by
          // [[gc]] on recovery, never served), a crash after serves
          // both the new pointers and the new feed
          val out = s"$storeRoot/changes/f$feedAttempt"
          feedAttempt += 1
          feed.write.parquet(out)
          feedPaths += out
        }
        // every written bucket is a touched bucket (rebuilt rows belong
        // to touched issues; carried rows came from touched buckets)
        tb.foreach { b =>
          written.get(b) match {
            case Some(p) => current(b) = p
            case None    => current.remove(b) // bucket fully deleted
          }
        }
        // commit the pointer map, THEN retire the superseded bucket
        // versions (non-history stores) — any crash point leaves the
        // last committed manifest referencing only live files. A
        // history-retaining store retires nothing: prior generations
        // stay readable via snapshotAsOf until pruneHistory.
        tx.commit("maintain")
        if (!retainHistory) tx.retire(prevPaths)
        metrics += MaintainMetrics(tb.length, nBuckets, carryRows,
          (System.nanoTime() - t0) / 1000000)
      }
    }

    /** The persisted change log: every feed generation emitted so far
     * (op 'D'/'I' + the 88 snapshot columns), the append-only artifact
     * downstream consumers tail. Survives recovery — the path list is
     * committed in the manifest header. */
    def changeFeed: DataFrame = {
      require(feedPaths.nonEmpty, "no change-feed generations emitted")
      ss.read.parquet(feedPaths.toSeq: _*)
    }

    /** The maintained snapshot: the union of every bucket's current
     * version (bucket dirs are leaf paths, so the partition column is
     * absent and the schema is exactly the snapshot's 88 columns). */
    def view: DataFrame = {
      val paths = current.values.toSeq
      require(paths.nonEmpty, "snapshot store read before init")
      ss.read.parquet(paths: _*)
    }

    /** BUCKET-PRUNED POINT LOOKUP: the rows of THESE issues, reading
     * only the buckets they can live in — `pmod(issue_id, nBuckets)`
     * computed driver-side (bit-identical to the maintain path's
     * bucketing, no Spark job for routing) plus the exact residual.
     * O(store · k/n) instead of the O(store) a view.filter pays: the
     * flagship's serving path, the answer to "show me issue X's rows
     * in today's snapshot" without a table scan (the
     * [[graft.streaming.BucketedUpsert.State.lookupKeys]] contract on
     * the GCD store). */
    // the ONE routing expression both lookup entry points share —
    // bit-identical to bucketOf's pmod, and a future routing change
    // lands once (the BucketedUpsert probeBuckets idiom)
    private def probeBucketPaths(ids: Seq[Long]): Seq[String] = {
      require(current.nonEmpty, "snapshot store read before init")
      val n = nBuckets.toLong
      ids.distinct.map(i => (((i % n) + n) % n).toInt)
        .distinct.flatMap(current.get)
    }

    def lookupIssues(ids: Seq[Long]): DataFrame = {
      require(ids.nonEmpty, "lookupIssues: no ids")
      val paths = probeBucketPaths(ids)
      if (paths.isEmpty) return view.limit(0)
      ss.read.parquet(paths: _*)
        .filter(col("issue_id").isin(ids.distinct.map(Long.box): _*))
    }

    /** The bucket dirs [[lookupIssues]] would read — spec evidence. */
    def lookupIssuePaths(ids: Seq[Long]): Seq[String] =
      probeBucketPaths(ids).sorted

    /** The store root (pass to [[GcdIncremental.recover]] after a
     * simulated or real driver loss). */
    def rootDir: String = storeRoot

    /** LINK-CLONE of the LIVE snapshot into `newRoot` — the
     * [[graft.streaming.BucketedUpsert.State.cloneTo]] trade applied
     * to the flagship store: every live bucket version clones into the
     * new root via [[graft.sources.StoreIO.cloneDir]] (hard links on a
     * local FS — bucket files are immutable, write-new retire-by-
     * delete, so unlinking one name never disturbs the other; any
     * other FS pair falls back to the byte copy) and ONE fresh
     * manifest commits over the clones. The clone is a fully
     * independent store: maintains/retires on either side can never
     * rewrite or retire the other's files. History and the change
     * feed are NOT carried — a `retainHistory` clone starts its own
     * generation 1 at the live view (1 = this clone's init state,
     * 2 = after its first dump — the same stable numbering a fresh
     * init'd store has). */
    def cloneTo(newRoot: String, retainHistory: Boolean = false)
        : SnapshotStore = {
      require(current.nonEmpty, "cloneTo before init")
      val st = new SnapshotStore(ss, nBuckets, collectMetrics = false,
        retainHistory, Some(newRoot))
      st.columns = columns
      val out = st.tx.attemptDir(0L)
      current.toSeq.sortBy(_._1).foreach { case (b, p) =>
        val dest = s"$out/__bucket=$b"
        graft.sources.StoreIO.cloneDir(ss, p, dest)
        st.tx.current(b) = dest
      }
      st.tx.commit("clone")
      st
    }

    /** Number of committed generations still readable via
     * [[snapshotAsOf]] (history-retaining stores). */
    def generations: Int = tx.history().size

    /** Committed generation numbers still readable, oldest first
     * (1 = the init build, 2 = after the first dump, …). STABLE: a
     * generation keeps its number across [[pruneHistory]] and
     * recovery. */
    def retainedGenerations: Seq[Long] = tx.history()

    /** TIME TRAVEL over the dump history: the snapshot exactly as
     * committed generation `g` left it — what the reference recomputes
     * from scratch per monthly dump (Main.java:380-513), served here
     * from retained bucket versions (only buckets the later dumps
     * touched exist twice). Durable: the numbered manifests live at the
     * store root, so generations survive a driver loss and re-serve
     * after [[GcdIncremental.recover]]. Fails loudly on a pruned or
     * unknown generation. */
    def snapshotAsOf(g: Long): DataFrame = {
      require(retainHistory, "snapshotAsOf: store built without " +
        "retainHistory")
      val paths = tx.manifestPaths(g)
      if (paths.isEmpty) {
        // a retained generation can be LEGITIMATELY empty (a dump that
        // deleted every issue): serve zero rows with the column list
        // THAT generation's own manifest header committed — schema is
        // deterministic, not a function of filesystem listing order
        // (mirrors BucketedUpsert.emptyVersion)
        val committed = tx.manifestTokens(g).getOrElse("columns",
          columns.mkString(",")).split(",").toSeq
        val dirs = tx.allBucketDirs()
        require(dirs.nonEmpty,
          s"snapshotAsOf($g): generation is empty and no bucket file " +
            "exists to derive the schema")
        val base = ss.read.option("mergeSchema", "true")
          .parquet(dirs: _*).limit(0)
        // a committed column may exist in NO surviving file (a widened
        // store whose post-widening buckets were all deleted): pad it
        // as a null column instead of a raw AnalysisException (mirrors
        // BucketedUpsert.emptyVersion; type is unrecoverable from data)
        return committed.filterNot(base.columns.contains)
          .foldLeft(base)((d, c) => d.withColumn(c, lit(null)))
          .select(committed.map(col): _*)
      }
      ss.read.parquet(paths: _*)
    }

    /** Retention for the dump history: keep the newest `keep`
     * generations (and the live pointer map), drop older numbered
     * manifests FIRST, then delete every bucket version nothing
     * retained references (the shared [[graft.streaming.TxLog]]
     * vacuum) — a surviving generation never references a deleted
     * file; metadata-only. Returns the number of bucket versions
     * deleted. */
    def pruneHistory(keep: Int): Int = {
      val (_, deleted, _) = tx.vacuum(retainPrior = keep - 1)
      deleted
    }

    /** Orphan GC: the shared bucket sweep ([[graft.streaming.TxLog.gc]])
     * PLUS the change log's — a crash between a feed write and its
     * commit leaves a `changes/f<n>` dir no manifest references, which
     * the bucket sweep cannot see. Runs automatically on
     * [[GcdIncremental.recover]]. */
    def gc(): Int = {
      // qualify BOTH sides through the root's FileSystem, mirroring
      // TxLog.qualify/sweep — a relative storeRoot (recover() runs gc()
      // automatically) must not make committed feed paths look like
      // orphans and silently delete the durable change log
      val fs = graft.sources.StoreIO.fs(ss, storeRoot)
      val committed = feedPaths.map(p =>
        fs.makeQualified(new org.apache.hadoop.fs.Path(p)).toString).toSet
      val orphanFeeds = graft.sources.StoreIO
        .list(ss, s"$storeRoot/changes")
        .filterNot(p => committed.contains(fs.makeQualified(p).toString))
      orphanFeeds.foreach(p =>
        graft.sources.StoreIO.delete(ss, p.toString))
      tx.gc() + orphanFeeds.size
    }
  }

  /** Reattach a [[SnapshotStore]] to its root from the last committed
   * manifest — the recovery half of the flagship's transaction log
   * (column list, feed paths, and with `retainHistory` every retained
   * generation all come back; crashed-attempt orphans are reclaimed).
   * The bucketing/retention config must match the committed store —
   * mismatches fail loudly, same contract as
   * [[graft.streaming.BucketedUpsert.recover]]. */
  def recover(ss: SparkSession, storeRoot: String, nBuckets: Int = 64,
      collectMetrics: Boolean = false,
      retainHistory: Boolean = false): SnapshotStore = {
    val st = new SnapshotStore(ss, nBuckets, collectMetrics,
      retainHistory, Some(storeRoot))
    st.loadManifest()
    st.gc()
    st
  }
}
