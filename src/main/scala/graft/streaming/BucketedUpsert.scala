package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Scratch

/**
 * Partition-pruned incrementally-maintained "latest row per key" view —
 * the streaming-upsert state layout that bounds per-micro-batch cost by
 * the BATCH, not by accumulated state size.
 *
 * State is parquet partitioned into `nBuckets` key buckets
 * (`pmod(key, n)` — a pure function of the key, so a key lives in
 * exactly one bucket forever). Each micro-batch:
 *
 *   1. reduces the batch to its per-key latest row (map-side combinable
 *      aggregate over the batch only);
 *   2. computes the TOUCHED bucket set from those keys (a bounded
 *      ≤nBuckets-element driver list — same driver-side-scalar shape as
 *      a runtime Bloom filter, not a data collect);
 *   3. reads ONLY the touched buckets' current state partitions, merges,
 *      and writes new versions of just those buckets;
 *   4. carries every untouched bucket over BY POINTER — zero I/O.
 *
 * This is `Scd2.maintain`'s partition-upsert strategy applied to
 * streaming state (and the mechanism table formats' MERGE INTO relies
 * on: rewrite matched files only). The naive alternative — union the
 * batch with the FULL state and rewrite all of it — pays O(state) per
 * micro-batch and fails at 100 TB of keyed state; here a batch touching
 * k of n buckets pays O(batch + state·k/n).
 *
 * Durability — the mini transaction log: after every merge the
 * per-bucket pointer map is COMMITTED to a `_manifest` file at the
 * state root (tmp-write + atomic rename, one tiny write per batch),
 * and superseded bucket versions are deleted only AFTER that commit.
 * So at any crash point the last committed manifest references only
 * live files, and [[BucketedUpsert.recover]] reattaches a fresh State
 * to it. Batch writes go to attempt-unique directories (`v<id>_a<k>`),
 * so a foreachBatch RETRY of a batch id — after a crash or a transient
 * failure — never collides with the half-written previous attempt and
 * re-merges against the last committed state; the latest-wins merge
 * makes the replay idempotent. (Delta/Iceberg formalize exactly this
 * log; the merge plan — the part that scales — is identical.)
 *
 * All state I/O — manifest commit/read, bucket existence, superseded
 * retirement — goes through the Hadoop FileSystem/FileContext API
 * resolved from the state root, so the store works unchanged on any
 * object store Spark can write (HDFS, S3A, …), matching SkippingIndex /
 * TableCompaction / AnnIndex. The manifest swap uses FileContext's
 * rename-with-OVERWRITE — the atomic replace the commit contract needs.
 * The manifest records the bucketing function (`hashKey`) and merge
 * kind (`latest` vs custom combine), so recovering with mismatched
 * semantics fails loudly instead of silently re-bucketing keys or
 * merging with the wrong reduce.
 *
 * TIME TRAVEL + VACUUM (the rest of the transaction-log contract):
 * with `retainHistory = true` every commit ALSO writes an immutable
 * numbered manifest (`_manifest.v<seq>`) and superseded bucket versions
 * are NOT retired at merge time — each numbered manifest stays a fully
 * readable snapshot of the view as of that commit ([[State.readAsOf]]),
 * which is how a training pipeline reproduces "the corpus exactly as
 * the run that trained checkpoint N saw it". Storage is reclaimed by
 * the explicit [[State.vacuum]]: keep the newest `retainPrior + 1`
 * snapshots, drop older manifests FIRST, then delete every bucket
 * version no retained manifest references. That ordering is the crash
 * contract — at any crash point every surviving manifest references
 * only live files (a crash after the manifest drop merely leaves
 * orphaned bucket dirs for the next vacuum, which is a natural no-op
 * re-run). Reading a vacuumed version fails loudly, never partially.
 * Vacuum cost is metadata-only: it lists and parses file-count-sized
 * manifests and issues deletes — no data is read or moved, so it holds
 * at 100 TB of state. (Delta's VACUUM / Iceberg's expire_snapshots are
 * exactly this operation over their logs.)
 */
object BucketedUpsert {

  /** Per-batch evidence for the soak: what the merge actually read. */
  final case class BatchMetrics(batchId: Long, touchedBuckets: Int,
      stateRowsRead: Long, wallMs: Long)

  /** What a [[State.vacuum]] actually reclaimed — metadata-only
   * evidence, mirror of the soaks' per-batch metrics. */
  final case class VacuumReport(droppedManifests: Int, deletedDirs: Int,
      keptDirs: Int)

  /**
   * Mutable state handle for one upsert view. By default `payloadCols`
   * order defines "latest": the per-key max of `struct(payloadCols)`
   * wins (put the event-time column first, a unique id second as
   * tiebreak). Pass `combine` for non-replace merge semantics: any
   * per-key reduce that is COMMUTATIVE and ASSOCIATIVE over
   * key+payload rows (a monoid fold — e.g. min/sum accumulators for a
   * dedup-fingerprint store). The same reduce runs over a raw batch
   * and over batch ∪ prior state, which is exactly what makes the
   * merged view independent of how the engine batched the stream.
   *
   * @param collectMetrics when true (soak), each merge also counts the
   *   state rows it read — an extra pass over the TOUCHED buckets only,
   *   left off in gated runs.
   * @param root an existing state root to attach to (recovery); default
   *   a fresh scratch dir.
   * @param hashKey bucket on `pmod(xxhash64(key), n)` instead of
   *   `pmod(key, n)` — required for non-numeric keys (string
   *   fingerprints); still a pure function of the key.
   * @param retainHistory keep every commit readable ([[readAsOf]]) by
   *   writing numbered manifests and deferring superseded-file
   *   retirement to [[vacuum]]; default false = the legacy eager
   *   retirement (only the newest version ever exists on disk).
   * @param lsm LSM-GENERATION mode: [[merge]] APPENDS the reduced
   *   batch as a new per-bucket generation instead of reading and
   *   rewriting the touched buckets — per-batch arrival cost is
   *   O(batch), independent of accumulated state (the classic mode
   *   pays O(state · k/n) per batch, which for uniformly-hashed keys
   *   touching all buckets is a FULL state rewrite per batch — the
   *   r15 XsubstrSoak measured exactly that linear growth). The
   *   reduce runs AT READ instead ([[view]]/[[lookupKeys]]/
   *   [[lookupJoin]] collapse the generations through the combine
   *   monoid), and [[compact]] folds a bucket's generations back to
   *   one — the LSM merge the k03 inverted-index sink and the
   *   s21/q87 tiered stores already apply, generalized to the keyed
   *   store. CALLER CONTRACT: the reduce must be IDEMPOTENT over
   *   re-delivered rows (min/max/latest/keyed-constant are; a concat
   *   monoid is NOT unless the caller suppresses replays with a
   *   lastOp token BEFORE calling merge, as PostingLedger.observe
   *   does) — a crashed-and-replayed foreachBatch batch appends its
   *   generation twice, and only reduce-idempotence makes that pair
   *   collapse to the single-delivery state.
   */
  final class State(ss: SparkSession, keyCol: String,
      payloadCols: Seq[String], nBuckets: Int,
      collectMetrics: Boolean = false, root: Option[String] = None,
      combine: Option[DataFrame => DataFrame] = None,
      hashKey: Boolean = false, retainHistory: Boolean = false,
      lsm: Boolean = false) {

    private val stateRoot = root.getOrElse(Scratch.dir("upsert_state"))
    // comma-free roots are enforced for EVERY store by the TxLog
    // constructor below (splitPaths runs on all stores' pointer
    // values in the vacuum/gc referenced set, not just lsm ones)
    private def mergeKind = if (combine.isDefined) "custom" else "latest"
    // the commit/recover/vacuum/gc mechanics live in the shared TxLog
    // (one implementation for this store and the flagship
    // SnapshotStore); this class owns only the upsert SEMANTICS —
    // bucketing function, merge reduce, config-pin validation
    private val tx = new TxLog(ss, stateRoot, retainHistory, () => Seq(
      "hashKey" -> hashKey.toString, "merge" -> mergeKind,
      "history" -> retainHistory.toString, "lsm" -> lsm.toString,
      "nBuckets" -> nBuckets.toString, "key" -> keyCol,
      "payload" -> payloadCols.mkString(",")) ++
      extras.toSeq.sortBy(_._1))

    // Caller-attached DURABLE tokens: committed with every manifest
    // commit and restored by recover — the channel for small stream
    // state that must move atomically with the batch that produced it
    // (e.g. Packing.PackState's running token total: set the token,
    // then merge — the same commit that lands the packed batch lands
    // the carried total, so a crash can never desynchronize them).
    private val extras = mutable.Map.empty[String, String]
    private val reservedTokens = Set("hashKey", "merge", "history",
      "lsm", "nBuckets", "key", "payload", "seq", "attempt")
    def setToken(k: String, v: String): Unit = {
      require(!reservedTokens.contains(k),
        s"setToken: '$k' is a reserved store token")
      extras(k) = v
    }
    /** Remove a caller token from the NEXT commit (and the in-memory
     * view) — the rollback half callers need when the commit they
     * staged a token for fails (see PostingLedger.observe). */
    def clearToken(k: String): Unit = { extras.remove(k); () }

    /** Run `body` (which must end in ONE commit on this store) at
     * most once per `opId`, guarded by durable token `tokenKey` — the
     * replay contract a NON-idempotent combine needs under
     * foreachBatch's at-least-once delivery (an idempotent monoid
     * needs no guard; a concat/sum fold double-applies without one).
     * The opId marker rides the SAME commit as the fold (atomic on
     * the success path); a FAILED body resynchronizes the in-memory
     * token from the COMMITTED manifest, because memory cannot tell
     * "commit landed, post-commit step threw" from "commit never
     * happened" — restoring the stale pre-call value in the former
     * case would make a same-process retry re-fold a landed batch.
     * Returns false when `opId` was already applied (body skipped). */
    def replayGuarded(tokenKey: String, opId: Long)(body: => Unit): Boolean = {
      if (token(tokenKey).contains(opId.toString)) return false
      setToken(tokenKey, opId.toString)
      try { body; true }
      catch {
        case t: Throwable =>
          committedToken(tokenKey) match {
            case Some(v) => setToken(tokenKey, v)
            case None    => clearToken(tokenKey)
          }
          throw t
      }
    }
    def token(k: String): Option[String] = extras.get(k)
    /** The value of caller token `k` as of the last COMMITTED manifest
     * (None before any commit, or if that commit carried no such
     * token). This is the rollback source of truth after a FAILED
     * operation that had staged a token: the in-memory token cannot
     * distinguish "commit landed, post-commit step threw" from "commit
     * never happened" — the durable manifest can (see
     * PostingLedger.observe). */
    def committedToken(k: String): Option[String] =
      tx.liveTokens().flatMap(_.get(k))
    private def current = tx.current
    val metrics: mutable.ArrayBuffer[BatchMetrics] = mutable.ArrayBuffer()

    private def bucketOf = {
      val k = if (hashKey) xxhash64(col(keyCol)) else col(keyCol)
      pmod(k, lit(nBuckets)).cast("int")
    }

    /** Per-key latest row of `df` under the payload-struct order. */
    def latest(df: DataFrame): DataFrame =
      df.groupBy(col(keyCol))
        .agg(max(struct(payloadCols.map(col): _*)).as("__m"))
        .select(col(keyCol) +:
          payloadCols.map(c => col(s"__m.$c").as(c)): _*)

    private def reduce(df: DataFrame): DataFrame =
      combine.getOrElse(latest _)(df)

    /** A bucket's REAL directory list: one path (classic) or the
     * comma-joined generation list (lsm). */
    private def bucketDirs(b: Int): Seq[String] =
      current.get(b).toSeq.flatMap(tx.splitPaths)

    private def dirsOf(bs: Seq[Int]): Seq[String] = bs.flatMap(bucketDirs)

    /** Whether any LIVE bucket holds more than one generation — when
     * false, every stored row came out of one reduce (a single merge
     * or a compaction), so each key appears exactly once and the
     * read-side reduce is the identity: the hot read paths skip it
     * (pointer-map arithmetic, no I/O). A freshly-maintained lsm
     * store therefore reads at classic-store cost. */
    private def multiGen: Boolean =
      lsm && current.values.exists(v => tx.splitPaths(v).length > 1)

    /** True when the read-side reduce is provably unnecessary (see
     * [[multiGen]]) — exposed so composite readers (e.g.
     * ExactSubstrLedger.spans deriving cross-batch losers, which can
     * only exist among keys with ≥2 stored rows) can skip their own
     * state-sized derivations after maintenance. */
    def singleGeneration: Boolean = !multiGen

    /** Largest per-bucket generation count in the live view — pointer-
     * map arithmetic only, no filesystem calls. This IS the serve-cost
     * bound: every read (view / lookup / a ledger's mine) unions at
     * most this many generations per bucket before the reduce monoid
     * collapses them, so an un-maintained serve costs
     * ≤ maxGens + batches-since-maintenance generation reads per
     * bucket by construction (spec-pinned in UpsertStreamSpec; the
     * q111 forget+mine serve price rides exactly this bound). */
    def maxGenerationsPerBucket: Int =
      if (current.isEmpty) 0
      else current.keys.map(b => bucketDirs(b).length).max

    /** The foreachBatch body: merge one micro-batch into the view. */
    def merge(batch: DataFrame, id: Long): Unit = {
      val t0 = System.nanoTime()
      val newest = reduce(batch)
      // bounded driver-side list (≤ nBuckets ints), not a data collect
      val touched = newest.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.nonEmpty && lsm) {
        // LSM append: the batch's reduced rows land as a NEW generation
        // of each touched bucket — zero state read, zero rewrite; the
        // reduce-at-read collapses the generations (class doc).
        val out = tx.attemptDir(id)
        newest.withColumn("__bucket", bucketOf)
          .write.partitionBy("__bucket").parquet(out)
        touched.foreach { b =>
          current(b) = (bucketDirs(b) :+ s"$out/__bucket=$b")
            .mkString(",")
        }
        tx.commit(s"batch $id")
        metrics += BatchMetrics(id, touched.length, 0L,
          (System.nanoTime() - t0) / 1000000)
      } else if (touched.nonEmpty) {
        val prevPaths = dirsOf(touched.toSeq)
        // mergeSchema + allowMissingColumns: buckets written before a
        // payload widening lack the new columns; they read and merge as
        // typed nulls (the schema-evolution contract in loadManifest)
        val prev = prevPaths.headOption.map(_ =>
          ss.read.option("mergeSchema", "true").parquet(prevPaths: _*))
        val stateRows =
          if (collectMetrics) prev.map(_.count()).getOrElse(0L) else -1L
        val merged = prev match {
          case Some(p) =>
            reduce(newest.unionByName(p, allowMissingColumns = true))
          case None => newest
        }
        // attempt-unique dir: a retried batch id never collides with a
        // previous half-written attempt
        val out = tx.attemptDir(id)
        merged.withColumn("__bucket", bucketOf)
          .write.partitionBy("__bucket").parquet(out)
        val superseded = dirsOf(touched.toSeq)
        touched.foreach(b => current(b) = s"$out/__bucket=$b")
        // commit the pointer map BEFORE retiring the superseded files:
        // any crash leaves the last committed manifest fully readable.
        // A history-retaining store retires nothing here — prior
        // versions stay readable via readAsOf until vacuum.
        tx.commit(s"batch $id")
        if (!retainHistory) tx.retire(superseded)
        metrics += BatchMetrics(id, touched.length, stateRows,
          (System.nanoTime() - t0) / 1000000)
      }
    }

    /** Targeted KEY DELETION — the compliance (right-to-be-forgotten)
     * path every persisted keyed store eventually needs. Same
     * partition-pruned economics as [[merge]]: only the buckets
     * holding a requested key are read, anti-joined and rewritten;
     * every other bucket carries by pointer with zero I/O; a bucket
     * emptied by the delete drops its pointer entirely. The manifest
     * commits before superseded files retire (crash-safe), and
     * re-running the same delete is a natural no-op (anti-join of
     * absent keys rewrites the bucket identically). `opId` namespaces
     * the write dir like a batch id.
     *
     * COMPLIANCE NOTE for history-retaining stores: the delete removes
     * the key from the LIVE view and every later version, but earlier
     * retained versions still hold the victim's rows on disk (time
     * travel exists to reproduce them). Full forgetting = this delete
     * followed by [[vacuum]] with retention short enough to drop every
     * pre-delete version — spec-pinned: after delete + vacuum(0) no
     * file under the state root contains the key. */
    def delete(keys: DataFrame, opId: Long): Unit = {
      val t0 = System.nanoTime()
      val ks = keys.select(col(keyCol)).distinct()
      val touched = ks.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      val present = touched.toSeq.filter(current.contains)
      if (present.nonEmpty) {
        val prevPaths = dirsOf(present)
        val stateRows =
          if (collectMetrics) ss.read.parquet(prevPaths: _*).count()
          else -1L
        // an lsm bucket's generations collapse through the reduce on
        // this rewrite (the delete doubles as a compaction of the
        // touched buckets — the pointer list becomes one path again)
        val remainingRaw = ss.read.option("mergeSchema", "true")
          .parquet(prevPaths: _*)
          .join(ks, Seq(keyCol), "left_anti")
        val remaining = if (lsm) reduce(remainingRaw) else remainingRaw
        val out = tx.attemptDir(opId)
        remaining.withColumn("__bucket", bucketOf)
          .write.partitionBy("__bucket").parquet(out)
        present.foreach { b =>
          val p = s"$out/__bucket=$b"
          if (tx.exists(p)) current(b) = p
          else current.remove(b)
        }
        tx.commit(s"batch $opId")
        if (!retainHistory) tx.retire(prevPaths)
        metrics += BatchMetrics(opId, present.length, stateRows,
          (System.nanoTime() - t0) / 1000000)
      }
    }

    /** MERGE-THEN-DELETE in ONE commit — the MERGE INTO shape (matched
     * updates + matched deletes in a single maintenance round). A
     * caller that upserts a batch and then deletes a (disjoint or
     * overlapping) key set pays two read-modify-write rounds over
     * largely the SAME touched buckets plus two manifest commits; this
     * fuses them: one read of the touched buckets, one rewrite, one
     * commit. Semantics are exactly [[merge]]`(upserts, opId)` followed
     * by [[delete]]`(deleteKeys, opId)` — a key in both ends deleted —
     * and the touched buckets come out single-generation (the delete
     * path's lsm-collapse contract). Commits iff either side touches a
     * bucket, so version-boundary consumers (readAsOf audits) see the
     * same boundary the two-commit form's LAST commit exposed. */
    def applyBatch(upserts: DataFrame, deleteKeys: DataFrame,
        opId: Long): Unit = {
      val t0 = System.nanoTime()
      val newest = reduce(upserts)
      val dks = deleteKeys.select(col(keyCol)).distinct()
      // bounded driver-side list (≤ 2·nBuckets (side, bucket) rows),
      // both sides routed in ONE job — two separate collects paid two
      // full evaluations' scheduling per batch
      val routed = newest.select(bucketOf.as("__b"), lit(0).as("__side"))
        .unionByName(dks.select(bucketOf.as("__b"), lit(1).as("__side")))
        .distinct().collect()
      val upB = routed.filter(_.getInt(1) == 0).map(_.getInt(0))
      val delB = routed.filter(_.getInt(1) == 1).map(_.getInt(0))
        .filter(current.contains)
      val touched = (upB ++ delB).distinct.sorted
      if (touched.isEmpty) return
      val prevPaths = dirsOf(touched.toSeq)
      val stateRows =
        if (collectMetrics)
          prevPaths.headOption
            .map(_ => ss.read.parquet(prevPaths: _*).count())
            .getOrElse(0L)
        else -1L
      val merged0 = prevPaths.headOption match {
        case Some(_) =>
          val prev = ss.read.option("mergeSchema", "true")
            .parquet(prevPaths: _*)
          reduce(newest.unionByName(prev, allowMissingColumns = true))
        case None => newest
      }
      val merged = merged0.join(dks, Seq(keyCol), "left_anti")
      val out = tx.attemptDir(opId)
      merged.withColumn("__bucket", bucketOf)
        .write.partitionBy("__bucket").parquet(out)
      touched.foreach { b =>
        val p = s"$out/__bucket=$b"
        if (tx.exists(p)) current(b) = p
        else current.remove(b)
      }
      tx.commit(s"batch $opId")
      if (!retainHistory) tx.retire(prevPaths)
      // soak/observability parity with merge()/delete(), which this op
      // replaces (ADVICE r18): the fused commit must not silently drop
      // the BatchMetrics evidence trail
      metrics += BatchMetrics(opId, touched.length, stateRows,
        (System.nanoTime() - t0) / 1000000)
    }

    /** REPLACE the full state of a key set in ONE commit: after the
     * call, every key of `keys` holds exactly its rows in `rows` (a
     * key of `keys` with no row in `rows` is removed). [[merge]] can
     * only fold THROUGH the combine monoid — it cannot subtract from
     * an accumulated value — so this is the honest primitive for
     * read-modify-write maintenance of monoid state (a posting list
     * losing a forgotten member, a counter being corrected). Same
     * partition-pruned economics and crash contract as merge/delete:
     * only the buckets `keys` route to are read and rewritten, rows
     * for OTHER keys in those buckets carry unchanged, untouched
     * buckets carry by pointer, the manifest commits before superseded
     * files retire, and a replay of the same (rows, keys) is a natural
     * no-op. Rows for keys outside `keys` are rejected loudly — they
     * would land in bucket files whose pointers this commit does not
     * take over. */
    def replaceKeys(rows: DataFrame, keys: DataFrame, opId: Long): Unit = {
      val ks = keys.select(col(keyCol)).distinct()
      // stray check FIRST: an (accidentally) empty key set with
      // non-empty rows must fail loudly, not silently drop the rows
      val strays = rows.join(ks, Seq(keyCol), "left_anti")
      require(strays.isEmpty,
        s"replaceKeys: rows carry keys outside the replaced key set " +
          s"(e.g. ${strays.select(col(keyCol)).head()})")
      replaceKeysPrechecked(rows, keys, opId)
    }

    /** [[replaceKeys]] minus the stray-keys evaluation, for callers
     * whose rows⊆keys containment holds BY CONSTRUCTION (e.g.
     * [[PostingLedger.forget]] derives its replacement rows from a
     * semi-join against the very key set it replaces). The stray check
     * costs one full evaluation of `rows` — on a read-modify-write
     * maintenance op that is a second scan of every touched bucket —
     * so the guard is worth skipping exactly when the containment is
     * structural rather than caller-supplied data. */
    private[streaming] def replaceKeysPrechecked(rows: DataFrame,
        keys: DataFrame, opId: Long): Unit = {
      val ks = keys.select(col(keyCol)).distinct()
      val touched = ks.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (touched.isEmpty) return
      val prevPaths = dirsOf(touched.toSeq)
      val kept = prevPaths.headOption.map { _ =>
        val raw = ss.read.option("mergeSchema", "true")
          .parquet(prevPaths: _*)
          .join(ks, Seq(keyCol), "left_anti")
        // lsm: collapse the kept keys' generations on this rewrite —
        // the touched buckets come out single-generation
        if (lsm) reduce(raw) else raw
      }
      val merged = kept match {
        case Some(k) => rows.unionByName(k, allowMissingColumns = true)
        case None    => rows
      }
      val out = tx.attemptDir(opId)
      merged.withColumn("__bucket", bucketOf)
        .write.partitionBy("__bucket").parquet(out)
      touched.foreach { b =>
        val p = s"$out/__bucket=$b"
        if (tx.exists(p)) current(b) = p
        else current.remove(b)
      }
      tx.commit(s"batch $opId")
      if (!retainHistory) tx.retire(prevPaths)
    }

    /** FILE COMPACTION of the live view: rewrite every bucket whose
     * current version holds more than `maxFiles` data files into ONE
     * key-sorted file each, in one commit. Merges write one part file
     * per shuffle partition carrying the bucket's rows, so a long-
     * lived store accumulates many small fragments per touched bucket
     * — the read-amplification problem every LSM/table format answers
     * with compaction (Delta OPTIMIZE / Iceberg rewrite_data_files;
     * the k03 inverted-index and s21/q87 tiered compactions are this
     * engine's other instances). CONTENT is untouched: rows pass
     * through unreduced, so compaction commutes with any combine
     * monoid and a compacted view is bit-equal to the fragmented one
     * (spec-pinned). Same crash contract as merge: pointer map commits
     * before superseded files retire; a history store's prior versions
     * keep reading until vacuum. Candidate selection is metadata-only;
     * only fragmented buckets are read and rewritten, each routed to
     * one writer partition (one file per bucket). Returns
     * (compacted buckets, files before, files after). */
    def compact(opId: Long, maxFiles: Int = 1): (Int, Int, Int) = {
      require(current.nonEmpty, "compact before any batch merged")
      val frag = current.toSeq.sortBy(_._1)
        .map { case (b, _) =>
          // one listStatus per generation, dirs bound once per bucket
          val dirs = bucketDirs(b)
          (b, dirs, dirs.map(tx.dataFileCount).sum) }
        .filter { case (_, dirs, files) =>
          // lsm: a bucket with >1 generation is a merge candidate even
          // if each generation is a single file — the read path pays
          // per GENERATION (one reduce input per gen), not per file
          files > maxFiles || (lsm && dirs.length > 1) }
      if (frag.isEmpty) return (0, 0, 0)
      val before = frag.map(_._3).sum
      val paths = frag.flatMap(_._2)
      val out = tx.attemptDir(opId)
      val raw = ss.read.option("mergeSchema", "true").parquet(paths: _*)
      // the LSM merge: generations collapse through the reduce monoid
      // (content-preserving for the classic store, where the state is
      // already reduced and compaction stays a pass-through rewrite)
      (if (lsm) reduce(raw) else raw)
        .withColumn("__bucket", bucketOf)
        .repartition(frag.size, col("__bucket"))
        .sortWithinPartitions(keyCol)
        .write.partitionBy("__bucket").parquet(out)
      frag.foreach { case (b, _, _) =>
        val p = s"$out/__bucket=$b"
        // pass-through rewrite: every selected bucket has rows, so its
        // output dir must exist — a miss means rows were LOST, and
        // repointing (or retiring the old version) would corrupt the view
        require(tx.exists(p), s"compact: rewritten bucket $b missing at $p")
        current(b) = p
      }
      tx.commit(s"compact $opId")
      if (!retainHistory) tx.retire(paths)
      val after = frag.map { case (b, _, _) =>
        tx.dataFileCount(s"$out/__bucket=$b") }.sum
      (frag.size, before, after)
    }

    /** SIZE-TIERED generation merge for an lsm store — the
     * amortized-LOGARITHMIC alternative to [[compact]]'s full fold
     * (which reads O(state) per call: honest as a final fold, a
     * linearly-growing maintenance bill when called periodically —
     * the XsubstrSoak maintain walls grew 41→80 s across one run).
     * Any bucket holding more than `maxGens` generations merges its
     * `fanout` SMALLEST (by data bytes — the classic size-tiered
     * policy: small young generations merge often and cheaply, big
     * folded ones rarely) into one through the reduce monoid; the
     * rest carry untouched. Each row therefore participates in
     * O(log_fanout(batches)) merges over the store's lifetime, and a
     * single call reads only the selected generations — never the
     * whole store. One Spark job covers every selected bucket (the
     * selected dirs union-read, reduced, rewritten partitionBy
     * bucket), one commit, same crash contract as [[merge]].
     *
     * @param beforeFold hook handed the UN-reduced union of the
     *   selected generations BEFORE the fold commits — the seam a
     *   caller whose reduce DISCARDS derivable information uses to
     *   flush it durably first (ExactSubstrLedger appends the
     *   subset's losing minima to its victims store here; the hook's
     *   own commit landing before this one is the crash contract). A
     *   hook failure aborts the compaction with nothing committed.
     * Returns (buckets selected in the first round, STORE-WIDE total
     * generations before, store-wide total after) — totals are
     * pointer-map arithmetic, so the log line reads as the absolute
     * generation count the next read will touch. */
    def compactTiered(opId: Long, fanout: Int = 4, maxGens: Int = 8,
        beforeFold: Option[DataFrame => Unit] = None): (Int, Int, Int) = {
      require(lsm, "compactTiered: classic stores have no generations")
      require(fanout >= 2 && maxGens >= fanout,
        s"compactTiered: fanout $fanout / maxGens $maxGens")
      require(current.nonEmpty, "compactTiered before any batch merged")
      // ONE merge round per bucket leaves a bucket at maxGens+k above
      // the bound by k−fanout+1 — iterate rounds (each its own
      // crash-safe commit) until every bucket is inside it; round
      // count is bounded by gens/fanout and in steady state is 1.
      def totalGens: Int =
        current.keys.toSeq.map(b => bucketDirs(b).length).sum
      val before = totalGens
      // per-CALL size memo: a generation that survives a round keeps
      // its bytes, so later rounds reuse the stat instead of paying
      // one filesystem metadata RPC per generation per round (retired
      // paths are never re-queried; new merged outputs stat once)
      val sizeMemo = scala.collection.mutable.Map.empty[String, Long]
      val (buckets, _, _) =
        tieredRound(opId, fanout, maxGens, beforeFold, sizeMemo)
      if (buckets == 0) return (0, 0, 0)
      var round = 1
      var merged = true
      while (merged) {
        merged = tieredRound(opId + round, fanout, maxGens,
          beforeFold, sizeMemo)._1 > 0
        round += 1
      }
      (buckets, before, totalGens)
    }

    private def tieredRound(opId: Long, fanout: Int, maxGens: Int,
        beforeFold: Option[DataFrame => Unit],
        sizeMemo: scala.collection.mutable.Map[String, Long] =
          scala.collection.mutable.Map.empty): (Int, Int, Int) = {
      val plan = current.toSeq.sortBy(_._1).flatMap { case (b, _) =>
        val gens = bucketDirs(b)
        if (gens.length <= maxGens) None
        else {
          val merge = gens
            .map(p => (p, sizeMemo.getOrElseUpdate(p, tx.dirBytes(p))))
            .sortBy(_._2).take(fanout).map(_._1)
          Some((b, merge, gens.filterNot(merge.contains)))
        }
      }
      if (plan.isEmpty) return (0, 0, 0)
      val selected = plan.flatMap { case (_, m, _) => m }
      val before = plan.map { case (_, m, k) => m.length + k.length }.sum
      val raw = ss.read.option("mergeSchema", "true")
        .parquet(selected: _*)
      beforeFold.foreach(f => f(raw))
      val out = tx.attemptDir(opId)
      reduce(raw)
        .withColumn("__bucket", bucketOf)
        .repartition(plan.size, col("__bucket"))
        .sortWithinPartitions(keyCol)
        .write.partitionBy("__bucket").parquet(out)
      plan.foreach { case (b, _, keep) =>
        val p = s"$out/__bucket=$b"
        require(tx.exists(p),
          s"compactTiered: merged bucket $b missing at $p")
        current(b) = (keep :+ p).mkString(",")
      }
      tx.commit(s"compactTiered $opId")
      if (!retainHistory) tx.retire(selected)
      (plan.size, before,
        plan.map { case (_, _, k) => k.length + 1 }.sum)
    }

    /** Committed version numbers still readable via [[readAsOf]],
     * oldest first (history-retaining stores only). */
    def history(): Seq[Long] = tx.history()

    /** TIME TRAVEL: the view exactly as of committed version `seq` —
     * the corpus a run that consumed version `seq` saw, reproducible
     * until [[vacuum]] drops the version. Fails loudly (never
     * partially) on a vacuumed or unknown version. */
    def readAsOf(reader: SparkSession, seq: Long): DataFrame = {
      val paths = tx.manifestPaths(seq)
      if (paths.isEmpty) return emptyVersion(reader, seq)
      // a version may span a payload widening; missing columns read as
      // typed nulls (a purely pre-widening version keeps its old schema)
      val raw = reader.read.option("mergeSchema", "true")
        .parquet(paths: _*)
      // an lsm version's per-key state is the reduce over the
      // generations that version references — same contract as view()
      if (lsm) reduce(raw) else raw
    }

    /** Zero rows with the schema THAT version committed — a committed
     * version can be LEGITIMATELY empty (a delete that removed every
     * key). Its own numbered-manifest header records the payload
     * column list as of the commit, so whether an empty pre-widening
     * version surfaces the old or the widened schema is DETERMINISTIC,
     * not a function of which bucket file a directory listing happens
     * to return first; types come from a footer-merge over every file
     * still on disk (metadata-only, and only on this edge read). */
    private def emptyVersion(reader: SparkSession, seq: Long): DataFrame = {
      val committed = keyCol +: tx.manifestTokens(seq)
        .getOrElse("payload", payloadCols.mkString(","))
        .split(",").toSeq
      val dirs = tx.allBucketDirs()
      require(dirs.nonEmpty,
        s"readAsOf($seq): version is empty and no bucket file " +
          "exists to derive the schema")
      val base = reader.read.option("mergeSchema", "true")
        .parquet(dirs: _*).limit(0)
      // a committed widened column may exist in NO surviving file
      // (delete-all right after recovering with widened payloadCols,
      // before any widened row merged): pad it as a null column rather
      // than letting the select throw a raw AnalysisException. Its
      // TYPE is unrecoverable from data (the manifest records names
      // only) — zero rows, and unionByName on the widened side
      // reconciles the type.
      committed.filterNot(base.columns.contains)
        .foldLeft(base)((d, c) => d.withColumn(c, lit(null)))
        .select(committed.map(col): _*)
    }

    /** VERSION-TO-VERSION CHANGE FEED (the Delta CDF shape served from
     * the manifest history): every row whose state differs between two
     * committed versions, tagged `op` = insert / update / delete (for
     * updates the NEW payload is emitted). Cost scales with the CHANGE,
     * not the store: the two pointer maps identify the buckets whose
     * pointers differ — identical pointers mean identical bytes, those
     * buckets are never read — and only differing buckets are loaded
     * and full-outer-joined on the key. This is g04's bucket-pruned
     * snapshot diff generalized to ANY two retained versions of the
     * keyed store. */
    def changesBetween(reader: SparkSession, fromSeq: Long,
        toSeq: Long): DataFrame = {
      require(fromSeq < toSeq,
        s"changesBetween: fromSeq $fromSeq must precede toSeq $toSeq")
      val before = tx.manifestMap(fromSeq)
      val after = tx.manifestMap(toSeq)
      val diffBuckets = (before.keySet ++ after.keySet)
        .filter(b => before.get(b) != after.get(b))
      // BOTH versions can be legitimately empty (diffing across a
      // delete-all): no buckets differ and no pointer exists to derive
      // a schema from — the feed is the later version's empty schema,
      // not a .head throw
      val schemaSrc = (before.values ++ after.values).toSeq
        .flatMap(tx.splitPaths)
      val emptySide =
        if (schemaSrc.nonEmpty)
          reader.read.parquet(schemaSrc.head).limit(0)
        else emptyVersion(reader, toSeq)
      def side(m: Map[Int, String]): DataFrame = {
        val ps = diffBuckets.toSeq.sorted.flatMap(m.get)
          .flatMap(tx.splitPaths)
        if (ps.isEmpty) emptySide
        else {
          val raw = reader.read.option("mergeSchema", "true")
            .parquet(ps: _*)
          // lsm: a version's per-key state is the reduce over its
          // generations — diff the collapsed states, not raw rows
          if (lsm) reduce(raw) else raw
        }
      }
      // versions may straddle a payload widening: pad each side with
      // the columns only the other side carries (typed nulls), so the
      // payload structs compare field-for-field
      def pad(df: DataFrame, ref: DataFrame): DataFrame =
        ref.schema.fields.filterNot(f => df.columns.contains(f.name))
          .foldLeft(df)((d, f) =>
            d.withColumn(f.name, lit(null).cast(f.dataType)))
      val oRaw = side(before)
      val nRaw = side(after)
      val pay = payloadCols.filter(c =>
        oRaw.columns.contains(c) || nRaw.columns.contains(c))
      val o = pad(oRaw, nRaw).select(col(keyCol).as("__k"),
        struct(pay.map(col): _*).as("__old"))
      val n = pad(nRaw, oRaw).select(col(keyCol).as("__k"),
        struct(pay.map(col): _*).as("__new"))
      o.join(n, Seq("__k"), "full_outer")
        .withColumn("op",
          when(col("__old").isNull, lit("insert"))
            .when(col("__new").isNull, lit("delete"))
            .when(!(col("__old") <=> col("__new")), lit("update")))
        .filter(col("op").isNotNull)
        // SIDE-wise payload selection, not per-column coalesce: an
        // update whose new payload legitimately carries a null field
        // must emit that null, never resurrect the old field's value
        .select(col("op") +: col("__k").as(keyCol) +:
          pay.map(c => when(col("__new").isNotNull, col(s"__new.$c"))
            .otherwise(col(s"__old.$c")).as(c)): _*)
    }

    /** RETENTION VACUUM: keep the newest `retainPrior + 1` committed
     * versions, reclaim everything older. Old manifests are dropped
     * FIRST, then every bucket version no surviving manifest (or the
     * live pointer map) references — so a crash at any point leaves
     * every surviving manifest fully readable, and the worst leftover
     * is orphaned bucket dirs the next vacuum (an idempotent re-run)
     * removes. Metadata-only: parses file-count-sized manifests,
     * reads no data. Attempt shells emptied by the sweep are reclaimed
     * with it — numbering stays collision-free via the manifest's
     * attempt high-water mark, not a directory count. */
    def vacuum(retainPrior: Int = 0): VacuumReport = {
      val (dropped, deleted, kept) = tx.vacuum(retainPrior)
      VacuumReport(dropped, deleted, kept)
    }

    /** ORPHAN GC: delete bucket versions NO committed manifest
     * references — the leftovers of attempts that crashed between the
     * bucket write and the manifest commit (the shared [[TxLog]]
     * referenced-set sweep). Idempotent, metadata-only, runs
     * automatically on [[BucketedUpsert.recover]]. */
    def gc(): Int = tx.gc()

    private[streaming] def loadManifest(): Unit = {
      val tokens = tx.load()
      // the manifest pins the store's semantic config: recovering with
      // a different bucketing function or merge kind would silently
      // route keys to wrong buckets / merge with wrong semantics
      val mfHashKey = tokens.get("hashKey").exists(_.toBoolean)
      val mfMerge = tokens.getOrElse("merge", "latest")
      require(mfHashKey == hashKey,
        s"recover: manifest bucketing hashKey=$mfHashKey but State " +
          s"was built with hashKey=$hashKey — keys would route to " +
          "wrong buckets")
      require(mfMerge == mergeKind,
        s"recover: manifest merge kind '$mfMerge' but State was built " +
          s"with '$mergeKind' — pass the same combine to recover()")
      // a history-retaining store recovered WITHOUT retainHistory would
      // silently start eager-retiring bucket versions the numbered
      // manifests still reference — destroying the retained history on
      // the next merge. The manifest pins the mode like hashKey/merge.
      val mfHistory = tokens.get("history").map(_.toBoolean)
        .getOrElse(history().nonEmpty)
      require(mfHistory == retainHistory,
        s"recover: manifest retainHistory=$mfHistory but State was " +
          s"built with retainHistory=$retainHistory — the next merge " +
          "would delete (or wrongly retain) versioned state")
      // an lsm store recovered as classic would treat a generation
      // LIST as one unreduced bucket version (duplicate keys served);
      // a classic store recovered as lsm would re-reduce already-
      // reduced state (harmless for idempotent combines, wrong for
      // guarded-concat ones) — pin the mode like hashKey/merge
      val mfLsm = tokens.get("lsm").exists(_.toBoolean)
      require(mfLsm == lsm,
        s"recover: manifest lsm=$mfLsm but State was built with " +
          s"lsm=$lsm — generation lists and read-side reduction " +
          "would disagree")
      // nBuckets and keyCol are the last two free parameters of the
      // bucketing function: recovering a 64-bucket store as 32 buckets
      // (or on a different key column) changes pmod(key, n) — new rows
      // for a committed key land in a DIFFERENT bucket than its
      // committed rows, the touched-bucket merge never sees the old
      // version, and view() silently serves duplicate keys.
      tokens.get("nBuckets").map(_.toInt).foreach { mfN =>
        require(mfN == nBuckets,
          s"recover: manifest nBuckets=$mfN but State was built with " +
            s"nBuckets=$nBuckets — keys would route to wrong buckets " +
            "and the view would serve duplicate rows")
      }
      tokens.get("key").foreach { mfKey =>
        require(mfKey == keyCol,
          s"recover: manifest key column '$mfKey' but State was built " +
            s"with '$keyCol' — rows would bucket and merge on the " +
            "wrong key")
      }
      // SCHEMA EVOLUTION contract: recovering with MORE payload columns
      // is allowed iff the committed payload is a PREFIX of the new one
      // (widening appends — the struct-ordering semantics of every
      // already-written row are preserved, and old bucket files read
      // with the new columns as typed nulls). Anything else — dropped,
      // reordered, or renamed columns — would silently change merge
      // semantics or lose data, so it fails loudly.
      tokens.get("payload").map(_.split(",").toSeq).foreach { mfPayload =>
        require(payloadCols.take(mfPayload.length) == mfPayload,
          s"recover: committed payload [${mfPayload.mkString(",")}] is " +
            s"not a prefix of [${payloadCols.mkString(",")}] — only " +
            "appending new payload columns is a safe evolution")
      }
      // everything the header carries beyond the store's own pins is a
      // caller token — restore it for token()/the next commit
      extras.clear()
      extras ++= tokens.view.filterKeys(!reservedTokens.contains(_))
    }

    /** The state root (pass to [[BucketedUpsert.recover]] after a
     * simulated or real driver loss). */
    def rootDir: String = stateRoot

    /** Whether any batch has merged yet (false on a fresh store; true
     * after recovery of a committed one) — the guard callers need
     * before probing ([[lookupKeys]]/[[lookupJoin]] fail loudly on an
     * un-merged store). */
    def hasState: Boolean = current.nonEmpty

    /** DEEP CLONE of the LIVE view into `newRoot`: copy every bucket
     * version the live pointer map references and commit a fresh
     * manifest over the copies (Delta's deep CLONE over its log). The
     * clone is a fully independent store with the same key/payload/
     * bucketing semantics — mutating it (a what-if replay, a repair
     * experiment, a branched backfill) can never retire or rewrite a
     * byte of the source store, which is what makes speculative
     * pipelines against a shared committed store safe. History is NOT
     * carried over: the clone starts its own version 1 at the live
     * view (retained source versions remain readable on the source).
     * Cost: one file copy per live bucket + one manifest write —
     * O(state), no shuffle, no Spark job. */
    def cloneTo(newRoot: String): State = {
      require(current.nonEmpty, "cloneTo before any batch merged")
      val st = new State(ss, keyCol, payloadCols, nBuckets,
        collectMetrics = false, Some(newRoot), combine, hashKey,
        retainHistory = false, lsm = lsm)
      val out = st.tx.attemptDir(0L)
      current.toSeq.sortBy(_._1).foreach { case (b, _) =>
        // lsm: every generation copies as its own dir (suffix keeps
        // the `__bucket=` prefix the referenced-set sweep filters on)
        val copied = bucketDirs(b).zipWithIndex.map { case (p, gi) =>
          val dest =
            if (lsm) s"$out/__bucket=${b}_g$gi" else s"$out/__bucket=$b"
          // bucket files are immutable (merge/replace write new files
          // and retire by delete), so the clone hard-links on a local
          // FS instead of copying bytes — see StoreIO.cloneDir
          graft.sources.StoreIO.cloneDir(ss, p, dest)
          dest
        }
        st.tx.current(b) = copied.mkString(",")
      }
      // caller-attached durable tokens are store semantics too (a
      // packed-ingest clone must carry its running total): they ride
      // the clone's first commit like every other pin
      st.extras ++= extras
      st.tx.commit("clone")
      st
    }

    /** BUCKET-PRUNED POINT LOOKUP on the maintained view: serve "the
     * current rows of THESE keys" by reading only the buckets those
     * keys can live in. The bucket of each probe is computed DRIVER-
     * side with the same function the merge path uses — Catalyst's
     * XxHash64 literal eval for hashed (string) keys, pmod for raw
     * numeric keys — so probe routing is bit-identical to build
     * routing and false negatives cannot happen; an exact residual
     * filter runs over the selected buckets. Cost is O(state · k/n)
     * for k probe buckets of n, never O(state): the serving-path
     * complement of [[merge]]'s write-side pruning (a view().filter
     * reads every bucket — at 100 TB that is the difference between a
     * point lookup and a table scan). No Spark job runs for the
     * routing itself. */
    /** Normalize probes against the COMMITTED key type (read from a
     * bucket file's footer — one metadata read): a probe whose runtime
     * type differs from the key column would hash differently than the
     * build side (XxHash64 of an Int literal hashes 4 bytes, of the
     * stored Long column 8) and silently probe the wrong bucket — the
     * same silent-false-negative class SkippingIndex.normProbes guards.
     * Int widens safely to a long key; any other mismatch fails
     * loudly. */
    private def normProbes(keys: Seq[Any]): Seq[Any] = {
      import org.apache.spark.sql.types.{IntegerType, LongType,
        StringType}
      require(current.nonEmpty, "lookup before any batch merged")
      val kt = ss.read.parquet(tx.splitPaths(current.values.head).head)
        .schema(keyCol).dataType
      // a non-hashed store routes via pmod(key, n) directly — only a
      // numeric key can take that path, so a string-keyed probe must
      // fail with the designed type-mismatch message, not a raw
      // ClassCastException downstream in probeBuckets
      require(hashKey || kt == LongType || kt == IntegerType,
        s"lookupKeys: store key type $kt is bucketed without hashKey — " +
          "only numeric keys route via pmod; rebuild the store with " +
          "hashKey=true for string keys")
      keys.distinct.map { k =>
        (kt, k) match {
          case (LongType, x: Long)     => x
          case (LongType, x: Int)      => x.toLong
          case (IntegerType, x: Int)   => x
          case (StringType, x: String) => x
          case _ => throw new IllegalArgumentException(
            s"lookupKeys: probe $k (${k.getClass.getSimpleName}) does " +
              s"not match the store's key type $kt — it would hash to " +
              "the wrong bucket and silently miss the key")
        }
      }
    }

    private def probeBuckets(probes: Seq[Any]): Seq[Int] = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      val n = nBuckets.toLong
      probes.map { k =>
        val h: Long =
          if (hashKey)
            new XxHash64(Seq(Literal(k))).eval(null).asInstanceOf[Long]
          else k.asInstanceOf[Number].longValue()
        (((h % n) + n) % n).toInt
      }.distinct
    }

    def lookupKeys(reader: SparkSession, keys: Seq[Any]): DataFrame = {
      require(keys.nonEmpty, "lookupKeys: no keys")
      require(current.nonEmpty, "lookupKeys before any batch merged")
      val probes = normProbes(keys)
      val paths = dirsOf(probeBuckets(probes))
      if (paths.isEmpty)
        return view(reader).limit(0) // schema-stable empty result
      val hit = reader.read.option("mergeSchema", "true")
        .parquet(paths: _*)
        .filter(col(keyCol).isin(probes: _*))
      // lsm: the probed keys' generations collapse at read; the filter
      // runs FIRST so the reduce shuffles only the probed rows (and a
      // single-generation store skips the identity reduce entirely)
      if (multiGen) reduce(hit) else hit
    }

    /** The bucket dirs [[lookupKeys]] would read for `keys` — exposed
     * so specs can assert the actual pruning, not a plan string. */
    def lookupPaths(keys: Seq[Any]): Seq[String] =
      dirsOf(probeBuckets(normProbes(keys))).sorted

    /** Bucket-pruned SET lookup — [[lookupKeys]] for probe RELATIONS
     * too large to collect to the driver: the current rows of every
     * key present in `keys` (a DataFrame carrying the key column),
     * served by reading only the buckets those keys route to. The
     * touched-bucket set is the only thing collected (≤ nBuckets ints,
     * computed with the SAME bucketing expression the merge path
     * uses); the exact membership check is a distributed semi-join.
     * Cost: O(probe) + O(state · k/n) for k touched buckets — the
     * arrival-time "which of these million fingerprints have we seen"
     * probe a streaming dedup ledger answers per batch. */
    def lookupJoin(reader: SparkSession, keys: DataFrame): DataFrame = {
      require(current.nonEmpty, "lookup before any batch merged")
      val touched = keys.select(bucketOf.as("__b")).distinct()
        .collect().map(_.getInt(0)).sorted
      val paths = dirsOf(touched.toSeq)
      if (paths.isEmpty)
        return view(reader).limit(0) // schema-stable empty result
      val hit = reader.read.option("mergeSchema", "true")
        .parquet(paths: _*)
        .join(keys.select(col(keyCol)).distinct(), Seq(keyCol),
          "left_semi")
      // lsm: collapse generations after the semi-join pruned the rows
      // (identity-skip on a single-generation store)
      if (multiGen) reduce(hit) else hit
    }

    /** The maintained view: the union of every bucket's current version
     * (bucket dirs are leaf paths, so the partition column is absent and
     * the schema is exactly key + payload). An lsm store reduces the
     * generations here — the merge-at-read half of the append-at-write
     * trade. */
    def view(reader: SparkSession): DataFrame = {
      val raw = rawView(reader)
      if (multiGen) reduce(raw) else raw
    }

    /** The UN-reduced union of every live generation — each batch's
     * reduced contribution as appended, before the read-side collapse.
     * For a classic store this IS the view (state is already reduced).
     * Callers that need per-batch provenance the reduce would fold
     * away (e.g. ExactSubstrLedger deriving which batch-minima LOST to
     * the global minimum) read this; everything else wants [[view]]. */
    def rawView(reader: SparkSession): DataFrame = {
      val paths = current.values.toSeq.flatMap(tx.splitPaths)
      require(paths.nonEmpty, "upsert view read before any batch merged")
      // mergeSchema: buckets not rewritten since a payload widening
      // still carry the old schema; their rows surface with the new
      // columns as typed nulls (footer-merge is file-count-sized work)
      reader.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** Reattach to a state root from its last committed manifest: the
   * recovery half of the transaction log. Requires at least one
   * committed batch (a State that never merged has no manifest — a
   * fresh root needs a fresh State, not recovery). A store built with
   * non-default `combine`/`hashKey` must recover with the SAME config —
   * the manifest records both and [[State.loadManifest]] rejects a
   * mismatch loudly. */
  def recover(ss: SparkSession, keyCol: String, payloadCols: Seq[String],
      nBuckets: Int, stateRoot: String,
      collectMetrics: Boolean = false,
      combine: Option[DataFrame => DataFrame] = None,
      hashKey: Boolean = false, retainHistory: Boolean = false,
      lsm: Boolean = false): State = {
    val st = new State(ss, keyCol, payloadCols, nBuckets, collectMetrics,
      Some(stateRoot), combine, hashKey, retainHistory, lsm)
    st.loadManifest()
    // reclaim crashed-attempt orphans the moment we reattach — the
    // committed manifests define what is live, so this is always safe
    st.gc()
    st
  }
}
