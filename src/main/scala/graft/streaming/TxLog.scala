package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/**
 * The shared bucket-pointer TRANSACTION LOG both keyed stores wrap —
 * [[BucketedUpsert.State]] (streaming upsert state) and
 * [[graft.etl.GcdIncremental.SnapshotStore]] (the flagship snapshot) —
 * so the commit/recover/vacuum contract is implemented ONCE:
 *
 *   - a live `_manifest` at the store root holds the bucket→path
 *     pointer map plus the store's semantic config tokens, committed by
 *     tmp-write + FileContext rename-with-OVERWRITE (readers see the
 *     old complete manifest or the new one, never a torn write);
 *   - with `retainHistory`, every commit ALSO writes an immutable
 *     numbered `_manifest.v<seq>` — and writes it FIRST, so a live
 *     manifest can never claim a seq whose numbered snapshot is
 *     unreadable (the inverse crash — numbered N exists, live still
 *     says N−1 — leaves a PHANTOM version that was never acknowledged;
 *     [[load]] deletes it, keeping generation numbering exact);
 *   - bucket data lands in ATTEMPT-UNIQUE directories ([[attemptDir]]):
 *     a retried operation id never collides with a crashed attempt's
 *     half-written files;
 *   - [[vacuum]] drops old numbered manifests FIRST, then deletes every
 *     bucket version no surviving manifest (or the live map)
 *     references — at any crash point every surviving manifest
 *     references only live files; [[gc]] is the same referenced-set
 *     sweep without dropping anything, reclaiming crashed-attempt
 *     orphans on recovery;
 *   - all path comparison is fully QUALIFIED through the root's
 *     FileSystem on both sides, so relative roots / scheme-prefixed
 *     manifest strings can never make the sweep delete live buckets.
 *
 * Config SEMANTICS stay with the callers: the log records each store's
 * `config` tokens verbatim in the header and [[load]] hands the parsed
 * tokens back; the store decides which mismatches are fatal (bucketing
 * pins, merge kind, payload-prefix widening, …). Cost model: every
 * operation here is metadata-only — manifests are file-count-sized, no
 * data is ever read or moved — so the log holds unchanged at 100 TB of
 * bucketed state. (Delta's _delta_log / Iceberg's snapshot metadata
 * formalize exactly this shape; the reference has no incremental story
 * at all — it recomputes the world per dump, Main.java:380-513.)
 */
final class TxLog(ss: SparkSession, val root: String,
    retainHistory: Boolean, config: () => Seq[(String, String)]) {

  // pointer values may be comma-joined generation lists (lsm stores),
  // and [[splitPaths]] runs on EVERY store's values in the
  // vacuum/gc referenced set — a comma in any store's root would
  // fragment its single-path values there and the sweep would delete
  // live committed buckets. Rejected for every TxLog store, loudly,
  // at construction.
  require(!root.contains(","),
    s"TxLog root '$root' contains a comma — pointer values are " +
      "comma-split by the generation-list machinery")

  private val rootPath = new Path(root)
  private val fs = rootPath.getFileSystem(ss.sessionState.newHadoopConf())
  private val fc = FileContext.getFileContext(rootPath.toUri,
    ss.sessionState.newHadoopConf())

  /** Live bucket→path pointer map. Mutated by the owning store between
   * commits; [[commit]] persists it, [[load]] restores it. An
   * LSM-generation store ([[BucketedUpsert.State]] `lsm = true`)
   * stores a COMMA-JOINED generation path list as the value — the log
   * treats the value opaquely except where it must resolve real
   * directories ([[splitPaths]] in the sweep/read paths), so classic
   * single-path stores are byte-identical on disk. */
  val current: mutable.Map[Int, String] = mutable.Map.empty

  /** A pointer value as its real directory list: classic stores hold
   * one path, LSM stores a comma-joined generation list. Every
   * consumer that RESOLVES paths (reads, sweeps) must go through
   * this; paths never contain commas (the constructor rejects a
   * comma-carrying root for every store, lsm or not — see above). */
  def splitPaths(v: String): Seq[String] =
    v.split(",").toSeq.filter(_.nonEmpty)

  private var commitSeq = 0L
  private var attempt = 0L

  /** Last committed version number (0 before any commit). */
  def seq: Long = commitSeq

  /** A fresh attempt-unique data directory for operation `opId` —
   * `v<opId>_a<k>` with a monotonically increasing k, so a RETRY of the
   * same operation id (foreachBatch replay after a crash) never
   * collides with the previous attempt's half-written files. */
  def attemptDir(opId: Long): String = {
    val d = s"$root/v${opId}_a$attempt"; attempt += 1; d
  }

  /** Commit the live pointer map as version seq+1. With retainHistory
   * the immutable numbered manifest commits FIRST (see class doc).
   * Returns the committed seq. One tiny write (or two) per commit. */
  def commit(opLabel: String): Long = {
    commitSeq += 1
    val tokens = config()
    // the header is space-tokenized on load — a config value carrying
    // whitespace (e.g. a feed path under a root with a space in it)
    // would silently truncate on recovery, so it fails loudly here at
    // commit time instead
    tokens.foreach { case (k, v) =>
      require(!k.exists(_.isWhitespace) && !v.exists(_.isWhitespace),
        s"manifest config token '$k=$v' contains whitespace — it would " +
          "mis-parse on recovery (store roots/paths must be space-free)")
    }
    // `attempt` is the log's OWN token (callers never set it): the
    // high-water mark of attempt numbering, so recovery stays
    // collision-free even after empty attempt shells are reclaimed —
    // numbering no longer depends on counting surviving directories
    val header = (s"$opLabel seq=$commitSeq attempt=$attempt" +:
      tokens.map { case (k, v) => s"$k=$v" }).mkString(" ")
    val body =
      (header +:
        current.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" })
        .mkString("\n")
    if (retainHistory)
      writeAtomic(s"_manifest.v$commitSeq", body)
    writeAtomic("_manifest", body)
    commitSeq
  }

  private def writeAtomic(name: String, body: String): Unit = {
    val tmp = new Path(rootPath, s"$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    fc.rename(tmp, new Path(rootPath, name), Options.Rename.OVERWRITE)
  }

  /** Committed version numbers still readable via their numbered
   * manifests, oldest first (history-retaining logs only). */
  def history(): Seq[Long] =
    fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
      .filter(_.matches("_manifest\\.v\\d+")) // excludes .tmp leftovers
      .map(_.stripPrefix("_manifest.v").toLong).sorted

  private def readManifest(p: Path): Seq[String] = {
    val in = fs.open(p)
    val body =
      try new String(in.readAllBytes(), UTF_8)
      finally in.close()
    body.linesIterator.toSeq
  }

  private def parseMap(lines: Seq[String]): Map[Int, String] =
    lines.drop(1).filter(_.nonEmpty).map { l =>
      val Array(b, p) = l.split("\t", 2); b.toInt -> p
    }.toMap

  /** Bucket→path pointer map of one committed version. Fails loudly on
   * a never-committed or vacuumed version — never reads partially. */
  def manifestMap(seq: Long): Map[Int, String] = parseMap(numbered(seq))

  /** The `k=v` config tokens one committed version's header recorded —
   * the store's semantic config AS OF that commit (payload/column list,
   * bucketing pins). This is what makes an EMPTY version's schema
   * deterministic: the columns that version committed are in its own
   * header, independent of which bucket file a directory listing
   * happens to surface first. */
  def manifestTokens(seq: Long): Map[String, String] =
    numbered(seq).head.split(" ").toSeq.filter(_.contains("="))
      .map { t => val Array(k, v) = t.split("=", 2); k -> v }.toMap

  private def numbered(seq: Long): Seq[String] = {
    val mf = new Path(rootPath, s"_manifest.v$seq")
    require(fs.exists(mf),
      s"version $seq: no such committed version at $root — never " +
        "committed, vacuumed past retention, or the store was built " +
        "without retainHistory")
    readManifest(mf)
  }

  def manifestPaths(seq: Long): Seq[String] =
    manifestMap(seq).values.toSeq.flatMap(splitPaths)

  /** Header tokens of the LIVE manifest as committed on disk, WITHOUT
   * restoring the log's in-memory state (None before any commit) — the
   * source of truth for a caller that must distinguish "the commit
   * landed and then something post-commit threw" from "the commit never
   * happened" after a failed operation (see PostingLedger.observe's
   * token rollback). */
  def liveTokens(): Option[Map[String, String]] = {
    val mf = new Path(rootPath, "_manifest")
    if (!fs.exists(mf)) None
    else Some(readManifest(mf).head.split(" ").toSeq
      .filter(_.contains("="))
      .map { t => val Array(k, v) = t.split("=", 2); k -> v }.toMap)
  }

  /** Restore the log from the live manifest: pointer map, seq, attempt
   * numbering (past every existing `v*` dir, committed or crashed).
   * Returns the header's `k=v` tokens for the OWNING STORE to validate
   * against its own config — which mismatches are fatal is store
   * semantics, not log mechanics.
   *
   * The LIVE manifest is the commit point: a numbered manifest with a
   * seq the live header does not (yet) acknowledge is the leftover of
   * a crash between the numbered-first write and the live swap — a
   * PHANTOM version whose content was never served. It is deleted
   * here, not resumed past: keeping it would make history() list a
   * version the store never acknowledged, shift the stable generation
   * numbering by one, and serve never-committed data via readAsOf.
   * The retried operation then re-commits the same seq (the numbered
   * write overwrites atomically), keeping '1 = init, 2 = first dump'
   * numbering exact across any crash point. */
  def load(): Map[String, String] = {
    val mf = new Path(rootPath, "_manifest")
    require(fs.exists(mf), s"recover: no committed manifest at $root")
    val lines = readManifest(mf)
    val tokens = lines.head.split(" ").toSeq
      .filter(_.contains("=")).map { t =>
        val Array(k, v) = t.split("=", 2); k -> v
      }.toMap
    commitSeq = tokens.get("seq").map(_.toLong).getOrElse(0L)
    history().filter(_ > commitSeq).foreach { phantom =>
      fs.delete(new Path(rootPath, s"_manifest.v$phantom"), true)
    }
    current.clear()
    current ++= parseMap(lines)
    // attempt numbering resumes past BOTH the committed high-water
    // mark and any surviving dir's own `_a<k>` suffix (a crash after
    // attemptDir() but before the recording commit leaves a dir the
    // mark doesn't cover) — either source alone could collide
    val dirMax = fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .flatMap { n =>
        val m = "^v.*_a(\\d+)$".r.findFirstMatchIn(n)
        m.map(_.group(1).toLong + 1)
      }
    attempt = (tokens.get("attempt").map(_.toLong).toSeq ++ dirMax ++
      Seq(fs.listStatus(rootPath)
        .count(_.getPath.getName.startsWith("v")).toLong)).max
    tokens
  }

  /** Eagerly delete superseded bucket versions (non-history stores,
   * AFTER the replacing commit). A shell whose last bucket dir retires
   * is reclaimed with it (see [[sweep]] — numbering survives via the
   * manifest's attempt high-water mark). */
  def retire(paths: Seq[String]): Unit =
    paths.foreach { p =>
      val bp = new Path(p)
      fs.delete(bp, true)
      val shell = bp.getParent
      if (shell != null && shell.getName.startsWith("v") &&
          fs.exists(shell) &&
          !fs.listStatus(shell).exists(_.isDirectory))
        fs.delete(shell, true)
    }

  def exists(path: String): Boolean = fs.exists(new Path(path))

  /** Number of data files under a bucket dir (metadata-only) — the
   * fragmentation measure [[BucketedUpsert.State.compact]] selects
   * rewrite candidates by. */
  def dataFileCount(path: String): Int =
    fs.listStatus(new Path(path))
      .count(f => f.isFile && !f.getPath.getName.startsWith("_"))

  /** Total data bytes under a bucket/generation dir (metadata-only) —
   * the size measure [[BucketedUpsert.State.compactTiered]] picks its
   * merge candidates by (size-tiered: always the smallest). */
  def dirBytes(path: String): Long =
    fs.listStatus(new Path(path))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getLen).sum

  /** EVERY bucket leaf dir still on disk — the union schema source for
   * an empty committed version that must surface a column only SOME
   * files carry (a post-widening empty version with only pre-widening
   * files in its listing prefix). Footer-merge over these is
   * file-count-sized metadata work, and this path only runs on the
   * zero-row edge read. */
  def allBucketDirs(): Seq[String] =
    fs.listStatus(rootPath).iterator
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("v"))
      .flatMap(d => fs.listStatus(d.getPath).iterator)
      .filter(b => b.isDirectory &&
        b.getPath.getName.startsWith("__bucket="))
      .map(_.getPath.toString).toSeq.sorted

  /** Referenced-set sweep shared by [[vacuum]] and [[gc]]: delete every
   * bucket dir under a `v*` shell that `referenced` does not name. Both
   * sides fully qualified through the same fs (see class doc). A shell
   * left with NO children is reclaimed too — a long-lived store no
   * longer accumulates one empty directory per superseded batch
   * forever; numbering stays collision-free because the manifest
   * header records the attempt high-water mark ([[commit]]/[[load]]),
   * not a directory count. Returns (deleted, kept) bucket dirs. */
  private def sweep(referenced: Set[String]): (Int, Int) = {
    var deleted = 0; var kept = 0
    fs.listStatus(rootPath).iterator
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("v"))
      .foreach { shell =>
        fs.listStatus(shell.getPath).iterator
          .filter(b => b.isDirectory &&
            b.getPath.getName.startsWith("__bucket="))
          .foreach { b =>
            if (referenced.contains(fs.makeQualified(b.getPath).toString))
              kept += 1
            else { fs.delete(b.getPath, true); deleted += 1 }
          }
        // "no child dirs" not "no children": partitionBy leaves a
        // _SUCCESS marker file; only bucket DIRS are ever referenced
        if (!fs.listStatus(shell.getPath).exists(_.isDirectory))
          fs.delete(shell.getPath, true)
      }
    (deleted, kept)
  }

  private def qualify(rs: Seq[String]): Set[String] =
    rs.map(r => fs.makeQualified(new Path(r)).toString).toSet

  /** RETENTION VACUUM: keep the newest `retainPrior + 1` committed
   * versions, drop older numbered manifests FIRST, then sweep every
   * bucket version no survivor (or the live map) references. Returns
   * (droppedManifests, deletedDirs, keptDirs). Metadata-only. */
  def vacuum(retainPrior: Int): (Int, Int, Int) = {
    require(retainHistory,
      "vacuum: store was built without retainHistory (eager " +
        "retirement already reclaims superseded files)")
    val seqs = history()
    val (drop, keep) = seqs.splitAt(
      math.max(0, seqs.length - (retainPrior + 1)))
    drop.foreach(v =>
      fs.delete(new Path(rootPath, s"_manifest.v$v"), true))
    val (deleted, kept) = sweep(
      qualify(keep.flatMap(manifestPaths) ++
        current.values.flatMap(splitPaths)))
    (drop.length, deleted, kept)
  }

  /** ORPHAN GC: delete bucket versions NO committed manifest
   * references — leftovers of attempts that crashed between the bucket
   * write and the manifest commit. The referenced set spans every
   * retained numbered manifest plus the live map, so gc can never
   * delete a readable version; idempotent; runs on recovery. */
  def gc(): Int = {
    val referenced = qualify(
      (if (retainHistory) history().flatMap(manifestPaths)
       else Seq.empty[String]) ++ current.values.flatMap(splitPaths))
    sweep(referenced)._1
  }
}
