package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.sources.{Scratch, Tables}

/** The q56 upsert-view contract depends on the source actually being
 * split into several micro-batches (otherwise the merge loop degenerates
 * to a single batch and the incremental path is untested). This pins the
 * mechanism: an 8-file source with maxFilesPerTrigger=2 under
 * AvailableNow must run ≥ 4 foreachBatch invocations, and the merged
 * view must equal the batch recompute. */
class UpsertStreamSpec extends SparkSpec {

  test("multi-batch foreachBatch upsert equals the batch argmax") {
    val src = Scratch.dir("upsert_spec_src")
    val ev = Tables.load(spark, sf(), "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
    ev.repartition(8).write.mode("overwrite").parquet(src)

    def latest(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("m.us").as("us"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))

    val batches = new AtomicInteger(0)
    var current: Option[String] = None
    val stateRoot = Scratch.dir("upsert_spec_state")
    val q = spark.readStream.schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Scratch.dir("upsert_spec_cp"))
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches.incrementAndGet()
        val merged = current match {
          case Some(p) => latest(latest(b).unionByName(spark.read.parquet(p)))
          case None => latest(b)
        }
        val out = s"$stateRoot/v$id"
        merged.write.mode("overwrite").parquet(out)
        current = Some(out)
        ()
      }
      .start()
    q.awaitTermination()

    assert(batches.get() >= 4, s"expected >= 4 micro-batches, got $batches")
    val got = spark.read.parquet(current.get)
    val want = latest(ev)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("manifest recovery + batch replay: reattached state is exact, replay idempotent") {
    import graft.streaming.BucketedUpsert
    val ev = spark.range(1000).select(
      (col("id") % 50).as("user_id"), col("id").as("event_id"),
      (col("id") * 1000L).as("us"),
      (col("id") % 7).cast("double").as("value"))
    val payload = Seq("us", "event_id", "value")
    def latest(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("m.us").as("us"),
          col("m.event_id").as("event_id"), col("m.value").as("value"))

    val st = new BucketedUpsert.State(spark, "user_id", payload,
      nBuckets = 8)
    st.merge(ev.filter(col("id") < 400), 0)
    st.merge(ev.filter(col("id") >= 400 && col("id") < 700), 1)
    // driver loss: only the state root (files + committed _manifest)
    // survives; reattach a fresh State to it
    val rec = BucketedUpsert.recover(spark, "user_id", payload, 8,
      st.rootDir)
    // foreachBatch retry of the last batch id after recovery: the
    // attempt-unique write dir avoids any collision with the previous
    // attempt, and the latest-wins merge makes the replay idempotent
    rec.merge(ev.filter(col("id") >= 400 && col("id") < 700), 1)
    rec.merge(ev.filter(col("id") >= 700), 2)
    val got = rec.view(spark)
      .select(col("user_id"), col("us"), col("event_id"), col("value"))
    val want = latest(ev)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "recovered+replayed view differs from batch argmax")
  }

  test("targeted delete: pruned rewrite, emptied-bucket drop, idempotent") {
    import graft.streaming.BucketedUpsert
    val ev = spark.range(640).select(
      (col("id") % 64).as("user_id"), col("id").as("event_id"),
      (col("id") * 1000L).as("us"),
      (col("id") % 5).cast("double").as("value"))
    val payload = Seq("us", "event_id", "value")
    val st = new BucketedUpsert.State(spark, "user_id", payload,
      nBuckets = 8, collectMetrics = true)
    st.merge(ev, 0)
    // keys 0..63 over pmod 8: users ≡ 2 (mod 8) live in exactly bucket 2
    val victims = spark.range(64).select(col("id").as("user_id"))
      .filter(col("user_id") % 8 === 2)
    st.delete(victims, 1L)
    val m = st.metrics.last
    assert(m.touchedBuckets == 1, s"delete read ${m.touchedBuckets} buckets")
    // bucket 2 is fully emptied -> its pointer must drop, view intact
    val got = st.view(spark)
    assert(got.filter(col("user_id") % 8 === 2).count() == 0)
    assert(got.count() == 56)
    // replaying the same delete is a no-op on content
    st.delete(victims, 2L)
    assert(st.view(spark).count() == 56)
  }

  test("recover carries combine+hashKey; a mismatched recovery fails loudly") {
    import graft.streaming.BucketedUpsert
    val docs = spark.range(300).select(
      concat(lit("fp"), col("id") % 20).as("fp"),
      col("id").as("keeper_id"), lit(1L).as("n_docs"))
    val payload = Seq("keeper_id", "n_docs")
    def combine(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("fp"))
        .agg(min(col("keeper_id")).as("keeper_id"),
          sum(col("n_docs")).as("n_docs"))
    val st = new BucketedUpsert.State(spark, "fp", payload,
      nBuckets = 8, combine = Some(combine), hashKey = true)
    st.merge(docs.filter(col("keeper_id") < 150), 0)
    // recovery WITHOUT the store's combine/hashKey config must fail
    // loudly (it would silently reattach latest-wins over pmod(raw key)
    // — string keys cast to null buckets, merges route wrong)
    val ex = intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "fp", payload, 8, st.rootDir)
    }
    assert(ex.getMessage.contains("hashKey") ||
      ex.getMessage.contains("merge"), ex.getMessage)
    // recovery WITH the config resumes the monoid fold exactly
    val rec = BucketedUpsert.recover(spark, "fp", payload, 8,
      st.rootDir, combine = Some(combine), hashKey = true)
    rec.merge(docs.filter(col("keeper_id") >= 150), 1)
    val cols = Seq("fp", "keeper_id", "n_docs").map(col)
    val got = rec.view(spark).select(cols: _*)
    val want = combine(docs).select(cols: _*)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "recovered monoid store differs from whole-corpus reduce")
  }

  test("monoid combine: merged store is independent of batch order") {
    import graft.streaming.BucketedUpsert
    // string-keyed store with min/sum accumulators (the q91 dedup
    // ledger shape): 20 fingerprints × repeated docs
    val docs = spark.range(300).select(
      concat(lit("fp"), col("id") % 20).as("fp"),
      col("id").as("keeper_id"), lit(1L).as("n_docs"))
    val payload = Seq("keeper_id", "n_docs")
    def combine(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("fp"))
        .agg(min(col("keeper_id")).as("keeper_id"),
          sum(col("n_docs")).as("n_docs"))
    def mkState() = new BucketedUpsert.State(spark, "fp", payload,
      nBuckets = 8, combine = Some(combine), hashKey = true)

    val slices = Seq(
      docs.filter(col("keeper_id") < 100),
      docs.filter(col("keeper_id") >= 100 && col("keeper_id") < 200),
      docs.filter(col("keeper_id") >= 200))
    val fwd = mkState()
    slices.zipWithIndex.foreach { case (b, i) => fwd.merge(b, i.toLong) }
    val rev = mkState()
    slices.reverse.zipWithIndex.foreach { case (b, i) =>
      rev.merge(b, i.toLong) }

    val cols = Seq("fp", "keeper_id", "n_docs").map(col)
    val a = fwd.view(spark).select(cols: _*)
    val b = rev.view(spark).select(cols: _*)
    val want = combine(docs).select(cols: _*)
    assert(a.except(want).isEmpty && want.except(a).isEmpty,
      "forward-merged store differs from whole-corpus reduce")
    assert(b.except(want).isEmpty && want.except(b).isEmpty,
      "reverse-merged store differs from whole-corpus reduce")
  }

  test("time travel: every retained version reads back exactly; " +
      "vacuum enforces retention, reclaims, and is idempotent") {
    import graft.streaming.BucketedUpsert
    // 10 keys × 3 overlapping batches, ver strictly increasing — every
    // batch supersedes every key's bucket version
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    def latest(df: DataFrame) = df.groupBy(col("k"))
      .agg(max(struct(col("ver"), col("x"))).as("m"))
      .select(col("k"), col("m.ver").as("ver"), col("m.x").as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    (1L to 3L).foreach(v => st.merge(batch(v), v))

    assert(st.history() == Seq(1L, 2L, 3L))
    val cols = Seq("k", "ver", "x").map(col)
    (1L to 3L).foreach { v =>
      val got = st.readAsOf(spark, v).select(cols: _*)
      val want = latest((1L to v).map(batch).reduce(_ unionByName _))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"readAsOf($v) differs from the cumulative recompute")
    }

    val r1 = st.vacuum(retainPrior = 1)
    assert(r1.droppedManifests == 1 && r1.deletedDirs > 0,
      s"expected version 1 reclaimed, got $r1")
    assert(st.history() == Seq(2L, 3L))
    // retained version still exact; dropped version fails loudly
    val keep2 = st.readAsOf(spark, 2L).select(cols: _*)
    val want2 = latest(batch(1L).unionByName(batch(2L)))
    assert(keep2.except(want2).isEmpty && want2.except(keep2).isEmpty)
    intercept[IllegalArgumentException](st.readAsOf(spark, 1L))
    // live view untouched by the vacuum
    val live = st.view(spark).select(cols: _*)
    val want3 = latest((1L to 3L).map(batch).reduce(_ unionByName _))
    assert(live.except(want3).isEmpty && want3.except(live).isEmpty)
    // idempotent re-run reclaims nothing further
    val r2 = st.vacuum(retainPrior = 1)
    assert(r2.droppedManifests == 0 && r2.deletedDirs == 0, s"$r2")

    // a non-history store has nothing to vacuum — loud, not silent
    val eager = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    eager.merge(batch(1L), 0L)
    intercept[IllegalArgumentException](eager.vacuum())
  }

  test("changesBetween reads only differing buckets and emits " +
      "insert/update/delete exactly") {
    import graft.streaming.BucketedUpsert
    def rows(ks: Seq[Long], ver: Long) = {
      import spark.implicits._
      ks.map(k => (k, ver, k * ver)).toDF("k", "ver", "x")
    }
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge(rows(0L to 9L, 1L), 0L) // v1: keys 0-9 across all buckets
    st.merge(rows(Seq(0L, 100L), 2L), 1L) // v2: update 0, insert 100
    val ch = st.changesBetween(spark, 1L, 2L)
    // keys 0 and 100 both hash to bucket 0 — every OTHER bucket's
    // pointer is unchanged between v1 and v2 and must never be read
    assert(ch.inputFiles.nonEmpty &&
      ch.inputFiles.forall(_.contains("__bucket=0")),
      s"change feed read unchanged buckets: ${ch.inputFiles.toSeq}")
    val got = ch.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("update", 0L, 2L), ("insert", 100L, 2L)),
      s"unexpected change rows: $got")

    // targeted delete commits v3; the feed shows it as a delete op
    // carrying the last payload, and unchanged co-bucketed keys are
    // correctly absent (same content, new file)
    import spark.implicits._
    st.delete(Seq(5L).toDF("k"), 100L)
    val got2 = st.changesBetween(spark, 2L, 3L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got2 == Set(("delete", 5L, 1L)), s"$got2")
    // spanning diff composes: v1 -> v3 sees the update, insert, delete
    val got13 = st.changesBetween(spark, 1L, 3L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got13 == Set(("update", 0L), ("insert", 100L),
      ("delete", 5L)), s"$got13")
  }

  test("compliance purge: delete removes from live, history keeps the " +
      "victim until vacuum drops every pre-delete version") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge((0L to 9L).map(k => (k, 1L, k)).toDF("k", "ver", "x"), 0L)
    st.delete(Seq(3L).toDF("k"), 1L) // commits version 2
    // live + as-of-v2 forget the key; as-of-v1 reproduces it (that IS
    // time travel), and the bytes are still on disk
    assert(st.view(spark).filter(col("k") === 3).count() == 0)
    assert(st.readAsOf(spark, 1L).filter(col("k") === 3).count() == 1)
    // every bucket version still on disk, read as leaf dirs (the same
    // shape view() reads) — shells without buckets contribute nothing
    def onDisk = {
      val dirs = new java.io.File(st.rootDir).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("v"))
        .flatMap(_.listFiles())
        .filter(d => d.isDirectory && d.getName.startsWith("__bucket="))
        .map(_.getPath).toSeq
      if (dirs.isEmpty) 0L
      else spark.read.parquet(dirs: _*).filter(col("k") === 3).count()
    }
    assert(onDisk == 1, "victim bytes should still exist pre-vacuum")
    // full forgetting: vacuum past every pre-delete version
    st.vacuum(retainPrior = 0)
    assert(st.history() == Seq(2L))
    assert(onDisk == 0, "victim bytes survived delete + vacuum(0)")
    assert(st.view(spark).count() == 9)
  }

  test("schema evolution: prefix-widening recovery merges old buckets " +
      "as typed nulls; narrowing or reorder fails loudly") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge((0L to 9L).map(k => (k, 1L, k)).toDF("k", "ver", "x"), 0L)
    val root = st.rootDir

    // narrowing and reordering are rejected — they would silently
    // change merge semantics or lose committed data
    intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "k", Seq("ver"), 4, root,
        retainHistory = true)
    }
    intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "k", Seq("x", "ver"), 4, root,
        retainHistory = true)
    }

    // widening appends a column; only keys 0-4 get post-widening rows
    val wide = BucketedUpsert.recover(spark, "k",
      Seq("ver", "x", "extra"), 4, root, retainHistory = true)
    wide.merge((0L to 4L).map(k => (k, 2L, k * 2, s"e$k"))
      .toDF("k", "ver", "x", "extra"), 1L)
    val got = wide.view(spark).orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(3)).getOrElse("-"))).toSeq
    assert(got == (0L to 4L).map(k => (k, 2L, s"e$k")) ++
      (5L to 9L).map(k => (k, 1L, "-")),
      s"widened view wrong: $got")
    // the pre-widening version still reads with its own (old) schema
    assert(wide.readAsOf(spark, 1L).columns.toSeq ==
      Seq("k", "ver", "x"))
    // the change feed across the widening pads the old side with nulls
    val ch = wide.changesBetween(spark, 1L, 2L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ch == (0L to 4L).map(k => ("update", k)).toSet, s"$ch")
  }

  test("change feed emits a legitimately-null updated field as null; " +
      "emptied version reads as zero rows; history mode pinned on " +
      "recovery") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge(Seq((1L, 1L, Option(10L))).toDF("k", "ver", "x"), 0L)
    // v2: the payload field GOES NULL — the feed must emit null, not
    // resurrect v1's value via a per-column fallback
    st.merge(Seq((1L, 2L, Option.empty[Long])).toDF("k", "ver", "x"), 1L)
    val upd = st.changesBetween(spark, 1L, 2L).collect()
    assert(upd.length == 1 && upd.head.getString(0) == "update")
    assert(upd.head.isNullAt(upd.head.fieldIndex("x")),
      s"nulled field resurrected old value: ${upd.head}")

    // delete the only key: version 3 is legitimately EMPTY and must
    // read as zero rows with the store schema, not crash
    st.delete(Seq(1L).toDF("k"), 2L)
    val empty = st.readAsOf(spark, 3L)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("k", "ver", "x"))
    // and the feed shows the delete with the last payload
    val del = st.changesBetween(spark, 2L, 3L).collect()
    assert(del.length == 1 && del.head.getString(0) == "delete")

    // recovering a history store WITHOUT retainHistory would start
    // eager-retiring versioned state — must fail loudly
    val ex = intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4, st.rootDir)
    }
    assert(ex.getMessage.contains("retainHistory"), ex.getMessage)
  }

  test("recovered history store resumes version numbering; prior " +
      "versions stay readable") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge(batch(1L), 0L); st.merge(batch(2L), 1L)
    val root = st.rootDir

    val re = BucketedUpsert.recover(spark, "k", Seq("ver", "x"),
      nBuckets = 4, stateRoot = root, retainHistory = true)
    re.merge(batch(3L), 2L)
    // numbering continued past the pre-crash commits — no collision,
    // and the pre-crash versions still read exactly
    assert(re.history() == Seq(1L, 2L, 3L))
    val cols = Seq("k", "ver", "x").map(col)
    val v1 = re.readAsOf(spark, 1L).select(cols: _*)
    val want1 = spark.range(10).select(col("id").as("k"),
      lit(1L).as("ver"), col("id").as("x"))
    assert(v1.except(want1).isEmpty && want1.except(v1).isEmpty,
      "version 1 changed across recovery")
  }

  test("recovery pins nBuckets and keyCol: a mismatch fails loudly, " +
      "the matching config recovers exactly") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(64).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 8)
    st.merge(batch(1L), 0L)
    val root = st.rootDir
    // a different bucket count changes pmod(key, n): new rows for a
    // committed key would land in a different bucket and the view
    // would serve duplicate keys — must fail loudly instead
    val exN = intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4, root)
    }
    assert(exN.getMessage.contains("nBuckets"), exN.getMessage)
    // a different key column mis-buckets AND mis-merges
    val exK = intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "ver", Seq("k", "x"), 8, root)
    }
    assert(exK.getMessage.contains("key"), exK.getMessage)
    // the matching config still recovers and merges exactly
    val rec = BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 8, root)
    rec.merge(batch(2L), 1L)
    assert(rec.view(spark).count() == 64)
    assert(rec.view(spark).filter(col("ver") === 2L).count() == 64)
  }

  test("orphan gc: recover reclaims crashed-attempt bucket dirs no " +
      "manifest references; the recovered view is unchanged") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(16).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    st.merge(batch(1L), 0L); st.merge(batch(2L), 1L)
    val root = st.rootDir
    // simulate an attempt that died between the bucket write and the
    // manifest commit: a full v*_a* directory nothing references
    val orphan = s"$root/v9_a9"
    batch(3L).withColumn("__bucket",
        pmod(col("k"), lit(4)).cast("int"))
      .write.partitionBy("__bucket").parquet(orphan)
    def orphanBuckets = {
      val d = new java.io.File(orphan)
      if (!d.exists()) 0
      else d.listFiles().count(f => f.isDirectory &&
        f.getName.startsWith("__bucket="))
    }
    assert(orphanBuckets == 4, "orphan setup failed")
    val rec = BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4, root)
    assert(orphanBuckets == 0,
      "recover did not reclaim the crashed attempt's bucket dirs")
    // the recovered view never saw the orphan's rows
    val got = rec.view(spark).select(col("k"), col("ver"), col("x"))
    assert(got.count() == 16 &&
      got.filter(col("ver") === 3L).count() == 0,
      "orphan rows leaked into the recovered view")
    // and the store still merges normally afterwards
    rec.merge(batch(3L), 2L)
    assert(rec.view(spark).filter(col("ver") === 3L).count() == 16)
  }

  test("vacuum on a RELATIVE state root keeps every referenced bucket " +
      "(path qualification must match the fs listing)") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    // a store rooted at a RELATIVE path: manifest strings and the
    // listStatus output qualify differently unless vacuum normalizes
    // both sides through the same fs — the failure mode is vacuum
    // deleting LIVE buckets (data loss), so the pin is view-after-vacuum
    val rel = s"target/upsert_rel_${System.nanoTime()}"
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, root = Some(rel), retainHistory = true)
    (1L to 3L).foreach(v => st.merge(batch(v), v))
    val r = st.vacuum(retainPrior = 0)
    assert(r.keptDirs > 0, s"vacuum kept nothing: $r")
    val live = st.view(spark)
    assert(live.count() == 10 &&
      live.filter(col("ver") === 3L).count() == 10,
      "vacuum on a relative root deleted live buckets")
    assert(st.readAsOf(spark, 3L).count() == 10)
    graft.sources.Scratch.deleteNow(rel)
  }

  test("lookupKeys reads only the probes' buckets and equals the " +
      "filtered view, for hashed-string and raw-numeric keys") {
    import graft.streaming.BucketedUpsert
    // hashed string keys (the dedup-ledger shape)
    val docs = spark.range(400).select(
      concat(lit("fp"), col("id") % 100).as("fp"),
      col("id").as("keeper_id"), lit(1L).as("n_docs"))
    def combine(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("fp"))
        .agg(min(col("keeper_id")).as("keeper_id"),
          sum(col("n_docs")).as("n_docs"))
    val st = new BucketedUpsert.State(spark, "fp",
      Seq("keeper_id", "n_docs"), nBuckets = 16,
      combine = Some(combine), hashKey = true)
    st.merge(docs, 0L)
    val probes = Seq("fp3", "fp42")
    val paths = st.lookupPaths(probes)
    assert(paths.nonEmpty && paths.size <= 2 && paths.size < 16,
      s"point lookup read ${paths.size} buckets")
    val got = st.lookupKeys(spark, probes)
      .select(col("fp"), col("keeper_id"), col("n_docs"))
    val want = st.view(spark).filter(col("fp").isin(probes: _*))
      .select(col("fp"), col("keeper_id"), col("n_docs"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty &&
      got.count() == 2)
    // absent key: empty with the store schema, never an error
    val none = st.lookupKeys(spark, Seq("no_such_fp"))
    assert(none.count() == 0 &&
      none.columns.toSeq == Seq("fp", "keeper_id", "n_docs"))

    // raw numeric keys route by pmod; a string probe must fail loudly
    // (it cannot route without the hash the store wasn't built with)
    val num = new BucketedUpsert.State(spark, "k", Seq("ver"),
      nBuckets = 8)
    num.merge(spark.range(64).select(col("id").as("k"),
      lit(1L).as("ver")), 0L)
    assert(num.lookupPaths(Seq(5L, 13L)).size <= 2)
    assert(num.lookupKeys(spark, Seq(5L, 13L)).count() == 2)
    intercept[IllegalArgumentException](num.lookupKeys(spark, Seq("x")))
    // Int probes on a long-keyed store widen before hashing/routing —
    // without normalization a hashed Int literal would probe the wrong
    // bucket (4-byte vs 8-byte hash input) and silently miss
    assert(num.lookupKeys(spark, Seq(5, 13)).count() == 2)
    val hashedNum = new BucketedUpsert.State(spark, "k", Seq("ver"),
      nBuckets = 8, hashKey = true)
    hashedNum.merge(spark.range(64).select(col("id").as("k"),
      lit(1L).as("ver")), 0L)
    assert(hashedNum.lookupKeys(spark, Seq(5)).count() == 1,
      "Int probe on a hashed long-keyed store missed its key")
    intercept[IllegalArgumentException](
      hashedNum.lookupKeys(spark, Seq(5.0)))
  }

  test("a phantom numbered manifest (crash between numbered write and " +
      "live swap) is dropped on recovery; numbering stays exact") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge(batch(1L), 0L); st.merge(batch(2L), 1L)
    val root = st.rootDir
    // simulate the crash: the numbered manifest for seq 3 was written
    // but the live _manifest still says seq 2 — version 3 was never
    // acknowledged and must not surface as a committed generation
    val v2 = java.nio.file.Paths.get(root, "_manifest.v2")
    val phantom = new String(java.nio.file.Files.readAllBytes(v2))
      .replaceFirst("seq=2", "seq=3")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_manifest.v3"),
      phantom.getBytes("UTF-8"))

    val rec = BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4,
      root, retainHistory = true)
    assert(rec.history() == Seq(1L, 2L),
      s"phantom generation surfaced: ${rec.history()}")
    // the retried operation re-commits AS seq 3 — numbering exact
    rec.merge(batch(3L), 2L)
    assert(rec.history() == Seq(1L, 2L, 3L))
    assert(rec.readAsOf(spark, 3L).filter(col("ver") === 3L)
      .count() == 10)
  }

  test("every committed live seq has a readable numbered manifest " +
      "(numbered-first commit ordering)") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    (1L to 3L).foreach { v =>
      st.merge(batch(v), v)
      // the contract the numbered-first ordering guarantees: if the
      // live manifest says seq N, _manifest.v<N> is already committed
      // and readable (a crash between the two writes can never leave a
      // live pointer to an unreadable version)
      val live = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(st.rootDir, "_manifest")))
      val seq = live.linesIterator.next().split(" ")
        .collectFirst { case s if s.startsWith("seq=") =>
          s.stripPrefix("seq=").toLong }.get
      assert(st.history().contains(seq),
        s"live manifest seq=$seq has no numbered manifest")
      assert(st.readAsOf(spark, seq).count() == 10)
    }
  }

  test("changesBetween two legitimately-empty versions is an empty " +
      "feed, not a throw") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    def batch(ver: Long) = (0L to 3L).map(k => (k, ver, k))
      .toDF("k", "ver", "x")
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge(batch(1L), 0L)                       // v1
    st.delete((0L to 3L).toDF("k"), 1L)           // v2: empty
    st.merge(batch(2L), 2L)                       // v3
    st.delete((0L to 3L).toDF("k"), 3L)           // v4: empty
    val feed = st.changesBetween(spark, 2L, 4L)
    assert(feed.count() == 0,
      "diff of two empty versions must be an empty feed")
    assert(feed.columns.toSeq == Seq("op", "k", "ver", "x"),
      s"empty feed schema wrong: ${feed.columns.toSeq}")
  }

  test("compact consolidates fragmented buckets to one sorted file " +
      "each without changing content; history versions keep reading") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 2, retainHistory = true)
    // several merges with AQE coalescing OFF so the writes keep their
    // shuffle width — the many-writer-partition shape a 100 TB merge
    // has, where each touched bucket collects one part file per
    // partition per rewrite
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey, "true")
    try {
      spark.conf.set(coalesceKey, "false")
      (1L to 4L).foreach { v =>
        st.merge((0L to 63L).map(k => (k, v, k * v))
          .toDF("k", "ver", "x").repartition(8), v)
      }
    } finally spark.conf.set(coalesceKey, prevCoalesce)
    val before = st.view(spark).orderBy(col("k")).collect().toSeq
    val (buckets, fBefore, fAfter) = st.compact(opId = 100L)
    assert(buckets == 2 && fAfter < fBefore && fAfter <= 2,
      s"compact: $buckets buckets, $fBefore -> $fAfter files")
    assert(st.view(spark).orderBy(col("k")).collect().toSeq == before,
      "compaction changed the view's content")
    // serving path still routes after the pointer swap
    assert(st.lookupKeys(spark, Seq(7L)).head().getLong(1) == 4L)
    // a second compact is a no-op (nothing fragmented)
    assert(st.compact(opId = 101L) == ((0, 0, 0)))
    // prior retained versions still read (compaction committed a new
    // version; it retired nothing on a history store)
    val asOf = st.readAsOf(spark, 2L)
    assert(asOf.filter(col("k") === 7L).head().getLong(1) == 2L,
      "pre-compaction version unreadable after compact")
  }

  test("empty version whose committed widened column exists in NO " +
      "surviving file pads it as a null column instead of throwing") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge((0L to 3L).map(k => (k, 1L, k)).toDF("k", "ver", "x"), 0L)
    // recover with a widened payload and delete EVERYTHING before any
    // widened row merges: the empty version's own header commits
    // `extra`, but no file on disk carries the column — the footer
    // merge cannot type it, and a raw select would throw
    val wide = BucketedUpsert.recover(spark, "k",
      Seq("ver", "x", "extra"), 4, st.rootDir, retainHistory = true)
    wide.delete((0L to 3L).toDF("k"), 1L)
    val empty = wide.readAsOf(spark, 2L)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("k", "ver", "x", "extra"),
      s"empty delete-all version lost the committed widened column: " +
        s"${empty.columns.toSeq}")
  }

  test("empty version's schema is DETERMINISTIC: a pre-widening empty " +
      "version keeps its own committed (old) schema after widening") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    st.merge((0L to 3L).map(k => (k, 1L, k)).toDF("k", "ver", "x"), 0L)
    st.delete((0L to 3L).toDF("k"), 1L)           // v2: empty, OLD schema
    // widen and write post-widening files — an anyBucketDir-style
    // listing could now surface a widened file first; the committed
    // header, not listing order, must decide v2's schema
    val wide = BucketedUpsert.recover(spark, "k",
      Seq("ver", "x", "extra"), 4, st.rootDir, retainHistory = true)
    wide.merge((0L to 3L).map(k => (k, 2L, k, s"e$k"))
      .toDF("k", "ver", "x", "extra"), 2L)
    val empty = wide.readAsOf(spark, 2L)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("k", "ver", "x"),
      s"pre-widening empty version widened nondeterministically: " +
        s"${empty.columns.toSeq}")
    // and a POST-widening empty version carries the widened schema
    wide.delete((0L to 3L).toDF("k"), 3L)         // v4: empty, NEW schema
    val emptyWide = wide.readAsOf(spark, 4L)
    assert(emptyWide.columns.toSeq == Seq("k", "ver", "x", "extra"),
      s"post-widening empty version lost the widened column: " +
        s"${emptyWide.columns.toSeq}")
  }

  test("cloneTo: the clone serves the live view; mutating it never " +
      "disturbs the source store") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    st.merge((0L to 9L).map(k => (k, 1L, k)).toDF("k", "ver", "x"), 0L)
    val cl = st.cloneTo(Scratch.dir("clone_spec"))
    val cols = Seq("k", "ver", "x").map(col)
    assert(cl.view(spark).select(cols: _*)
      .except(st.view(spark).select(cols: _*)).isEmpty,
      "clone must equal the source live view")
    // mutate the clone: upsert every key; its eager retirement must
    // retire only COPIED files, the source store stays byte-identical
    cl.merge((0L to 9L).map(k => (k, 2L, k * 2)).toDF("k", "ver", "x"),
      1L)
    assert(cl.view(spark).filter(col("ver") === 2L).count() == 10)
    assert(st.view(spark).filter(col("ver") === 1L).count() == 10 &&
      st.view(spark).count() == 10,
      "mutating the clone disturbed the source store")
    // lookups route identically on the clone (same bucketing config)
    assert(cl.lookupKeys(spark, Seq(3L)).count() == 1)
    // caller-attached durable tokens survive the clone (a packed
    // ingest's running total must not silently reset in a what-if
    // replay) — and survive the clone's RECOVERY too
    st.setToken("packTokens", "12345")
    val cl2 = st.cloneTo(Scratch.dir("clone_spec_tok"))
    assert(cl2.token("packTokens").contains("12345"),
      "clone dropped the caller's durable token")
    val cl2rec = BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4,
      cl2.rootDir)
    assert(cl2rec.token("packTokens").contains("12345"),
      "recovered clone lost the caller's durable token")
    // cloning an un-merged store fails loudly
    val fresh = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    intercept[IllegalArgumentException](
      fresh.cloneTo(Scratch.dir("clone_spec_fresh")))
  }

  test("emptied attempt shells are reclaimed by vacuum and eager " +
      "retirement; attempt numbering stays collision-free after " +
      "recovery") {
    import graft.streaming.BucketedUpsert
    def batch(ver: Long) = spark.range(10).select(
      col("id").as("k"), lit(ver).as("ver"), (col("id") * ver).as("x"))
    def shells(root: String): Seq[String] =
      new java.io.File(root).listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("v"))
        .map(_.getName).sorted
    // history store: vacuum(0) empties the first two shells entirely —
    // they must disappear, not linger as empty dirs forever
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4, retainHistory = true)
    (1L to 3L).foreach(v => st.merge(batch(v), v))
    assert(shells(st.rootDir).size == 3)
    st.vacuum(retainPrior = 0)
    assert(shells(st.rootDir).size == 1,
      s"vacuum left empty attempt shells: ${shells(st.rootDir)}")
    // recovery after the reclaim must resume attempt numbering PAST
    // the reclaimed shells (manifest high-water mark): a retried old
    // batch id can never collide with a surviving dir
    val rec = BucketedUpsert.recover(spark, "k", Seq("ver", "x"), 4,
      st.rootDir, retainHistory = true)
    rec.merge(batch(4L), 1L) // retry of batch id 1
    assert(rec.view(spark).filter(col("ver") === 4L).count() == 10)
    assert(rec.history() == Seq(3L, 4L))

    // eager store: each merge supersedes the previous shell entirely —
    // the retired shell goes with its last bucket dir
    val eager = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    (1L to 3L).foreach(v => eager.merge(batch(v), v))
    assert(shells(eager.rootDir).size == 1,
      s"eager retirement left empty shells: ${shells(eager.rootDir)}")
  }

  test("durable caller tokens: committed with the next merge, " +
      "restored on recover, cleared tokens stay gone, reserved " +
      "names rejected") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    val st = new BucketedUpsert.State(spark, "k", Seq("ver"),
      nBuckets = 2)
    intercept[IllegalArgumentException](st.setToken("nBuckets", "9"))
    st.setToken("cursor", "42")
    st.merge(Seq((1L, 1L)).toDF("k", "ver"), 0L)
    val rec = BucketedUpsert.recover(spark, "k", Seq("ver"), 2,
      st.rootDir)
    assert(rec.token("cursor").contains("42"))
    rec.clearToken("cursor")
    rec.merge(Seq((2L, 1L)).toDF("k", "ver"), 1L)
    val rec2 = BucketedUpsert.recover(spark, "k", Seq("ver"), 2,
      st.rootDir)
    assert(rec2.token("cursor").isEmpty,
      "cleared token resurrected across recovery")
  }

  test("replaceKeys swaps exactly the named keys in one commit: " +
      "other keys in touched buckets carry, emptied keys drop, " +
      "strays fail loudly") {
    import graft.streaming.BucketedUpsert
    import spark.implicits._
    // monoid store (sum) — merge cannot subtract, replace can
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 2, combine = Some(df =>
        df.groupBy(col("k")).agg(sum(col("n")).as("n"))))
    st.merge((0L to 5L).map(k => (k, 10L)).toDF("k", "n"), 0L)
    // replace keys {0 -> 7, 2 -> removed}; key 4 shares bucket 0 with
    // them and must carry untouched
    st.replaceKeys(Seq((0L, 7L)).toDF("k", "n"),
      Seq(0L, 2L).toDF("k"), 1L)
    val got = st.view(spark).orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 7L), (1L, 10L), (3L, 10L), (4L, 10L),
      (5L, 10L)), s"replaceKeys result wrong: $got")
    // a row whose key is NOT in the replaced set is rejected
    intercept[IllegalArgumentException] {
      st.replaceKeys(Seq((1L, 99L)).toDF("k", "n"),
        Seq(0L).toDF("k"), 2L)
    }
    // ... including when the key set is accidentally EMPTY — rows
    // must never be silently dropped
    intercept[IllegalArgumentException] {
      st.replaceKeys(Seq((1L, 99L)).toDF("k", "n"),
        Seq.empty[Long].toDF("k"), 3L)
    }
    // replay of the same replace is a no-op
    st.replaceKeys(Seq((0L, 7L)).toDF("k", "n"),
      Seq(0L, 2L).toDF("k"), 1L)
    assert(st.view(spark).count() == 5)
  }

  test("lookupPaths before any merge fails with the descriptive " +
      "error, not a bare NoSuchElementException") {
    import graft.streaming.BucketedUpsert
    val st = new BucketedUpsert.State(spark, "k", Seq("ver", "x"),
      nBuckets = 4)
    val ex = intercept[IllegalArgumentException](st.lookupPaths(Seq(1L)))
    assert(ex.getMessage.contains("before any batch merged"),
      ex.getMessage)
  }
  test("lsm mode: merge appends generations without reading state; " +
      "view/lookup reduce at read and equal the classic store; " +
      "compact folds to one generation and preserves the view") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    def mk(lsm: Boolean) = new BucketedUpsert.State(spark, "k",
      Seq("n"), nBuckets = 4, combine = Some(minCombine), lsm = lsm)
    val classic = mk(lsm = false)
    val lsmSt = mk(lsm = true)
    // 4 batches over overlapping keys: min must settle identically
    val batches = Seq(
      Seq((1L, 9L), (2L, 5L), (3L, 7L)),
      Seq((1L, 4L), (4L, 8L)),
      Seq((2L, 6L), (3L, 2L), (5L, 1L)),
      Seq((1L, 5L), (5L, 3L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      classic.merge(b.toDF("k", "n"), i.toLong)
      lsmSt.merge(b.toDF("k", "n"), i.toLong)
    }
    def snap(df: DataFrame) = df.orderBy("k")
      .as[(Long, Long)].collect().toSeq
    val want = snap(classic.view(spark))
    assert(snap(lsmSt.view(spark)) == want, "lsm view != classic view")
    // the raw generations hold MORE rows than the reduced view (keys
    // re-merged across batches kept one row per touching batch)
    val rawRows = lsmSt.rawView(spark).count()
    assert(rawRows > want.size,
      s"expected un-reduced generations, got $rawRows rows")
    // no state was read at merge time
    assert(lsmSt.metrics.forall(_.stateRowsRead == 0L))
    // point + set lookups reduce at read
    assert(snap(lsmSt.lookupKeys(spark, Seq(1L, 5L))) ==
      want.filter(r => r._1 == 1L || r._1 == 5L))
    assert(snap(lsmSt.lookupJoin(spark, Seq(1L, 5L).toDF("k"))) ==
      want.filter(r => r._1 == 1L || r._1 == 5L))
    // compact folds every multi-generation bucket to one; the view is
    // unchanged and the raw view is now the reduced state
    lsmSt.compact(90L)
    assert(snap(lsmSt.view(spark)) == want, "view drifted on compact")
    assert(lsmSt.rawView(spark).count() == want.size)
  }

  test("lsm mode is pinned in the manifest: recovering with the " +
      "other mode fails loudly; same-mode recovery serves exactly") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    val root = Scratch.dir("lsm_pin_spec")
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 4, root = Some(root), combine = Some(minCombine),
      lsm = true)
    st.merge(Seq((1L, 9L), (2L, 5L)).toDF("k", "n"), 0L)
    st.merge(Seq((1L, 3L)).toDF("k", "n"), 1L)
    val rec = BucketedUpsert.recover(spark, "k", Seq("n"), 4, root,
      combine = Some(minCombine), lsm = true)
    assert(rec.view(spark).orderBy("k").as[(Long, Long)]
      .collect().toSeq == Seq((1L, 3L), (2L, 5L)))
    val ex = intercept[IllegalArgumentException] {
      BucketedUpsert.recover(spark, "k", Seq("n"), 4, root,
        combine = Some(minCombine), lsm = false)
    }
    assert(ex.getMessage.contains("lsm"), ex.getMessage)
  }

  test("lsm replay idempotence for an idempotent combine: a " +
      "re-merged batch id appends a duplicate generation that " +
      "collapses at read") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 4, combine = Some(minCombine), lsm = true)
    st.merge(Seq((1L, 9L), (2L, 5L)).toDF("k", "n"), 0L)
    val before = st.view(spark).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    st.merge(Seq((1L, 9L), (2L, 5L)).toDF("k", "n"), 0L) // replay
    assert(st.view(spark).orderBy("k").as[(Long, Long)]
      .collect().toSeq == before)
  }
  test("compactTiered merges only the smallest generations of " +
      "over-long buckets, preserves the view, and aborts with " +
      "nothing committed when the beforeFold hook throws") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 2, combine = Some(minCombine), lsm = true)
    // 6 generations per bucket (every batch touches both buckets)
    (0 until 6).foreach { i =>
      st.merge(Seq((0L, 20L - i), (1L, 30L - i), (2L, 40L + i))
        .toDF("k", "n"), i.toLong)
    }
    def snap() = st.view(spark).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    val want = snap()
    // hook failure: nothing committed, generations unchanged
    val gensBefore = st.lookupPaths(Seq(0L, 1L, 2L)).length
    intercept[RuntimeException] {
      st.compactTiered(50L, fanout = 3, maxGens = 4,
        beforeFold = Some(_ => throw new RuntimeException("boom")))
    }
    assert(st.lookupPaths(Seq(0L, 1L, 2L)).length == gensBefore,
      "a failed hook must leave the generation lists untouched")
    assert(snap() == want)
    // real run: hook sees the UN-reduced subset (more rows than keys),
    // each over-long bucket folds fanout gens into one
    var hookRows = -1L
    val (bks, before, after) = st.compactTiered(51L, fanout = 3,
      maxGens = 4, beforeFold = Some(raw => hookRows = raw.count()))
    assert(bks == 2 && before == 12 && after == 8,
      s"tiered plan wrong: ($bks, $before, $after)")
    assert(hookRows > 6,
      s"hook must see un-reduced subset rows, saw $hookRows")
    assert(snap() == want, "view drifted across compactTiered")
    // idempotent follow-up under the bound: nothing left over maxGens
    assert(st.compactTiered(52L, fanout = 3, maxGens = 4) ==
      ((0, 0, 0)))
  }

  test("bounded un-maintained serve (r16 verdict #5): generations per " +
      "bucket never exceed maxGens + batches-since-maintenance, so " +
      "maintenance cadence caps the q111-class serve price") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 2, combine = Some(minCombine), lsm = true)
    val maxGens = 4
    val cadence = 5
    var sinceMaint = 0
    (0 until 20).foreach { i =>
      // every batch touches both buckets, the worst case for growth
      st.merge(Seq((0L, 100L - i), (1L, 200L - i)).toDF("k", "n"),
        i.toLong)
      sinceMaint += 1
      if ((i + 1) % cadence == 0) {
        st.compactTiered(1000L + i * 10, fanout = 2, maxGens = maxGens)
        sinceMaint = 0
        // the post-maintenance invariant: inside the bound
        assert(st.maxGenerationsPerBucket <= maxGens,
          s"post-maintain gens ${st.maxGenerationsPerBucket} > $maxGens")
      }
      // the SERVE bound at any point between ticks: a read unions at
      // most maxGens + batches-appended-since generations per bucket
      assert(st.maxGenerationsPerBucket <= maxGens + sinceMaint,
        s"gens ${st.maxGenerationsPerBucket} > $maxGens + $sinceMaint")
    }
    // the bounded read serves the exact reduced answer
    assert(st.view(spark).orderBy("k").as[(Long, Long)]
      .collect().toSeq == Seq((0L, 81L), (1L, 181L)))
    // a forget-style delete REWRITES touched buckets single-generation
    // (q111's mutate-then-serve path can only shrink the bound)
    st.delete(Seq(0L).toDF("k"), 2000L)
    assert(st.maxGenerationsPerBucket <= maxGens,
      "delete must not grow the generation bound")
  }

  test("cadence→cost, MEASURED (r17 verdict #5): serving at a deep " +
      "un-maintained generation bound costs a bounded small multiple " +
      "of the maintained serve — the structural bound has a priced " +
      "consequence, not just a ceiling") {
    import spark.implicits._
    import graft.streaming.BucketedUpsert
    val minCombine: DataFrame => DataFrame = df =>
      df.groupBy(col("k")).agg(min(col("n")).as("n"))
    val st = new BucketedUpsert.State(spark, "k", Seq("n"),
      nBuckets = 4, combine = Some(minCombine), lsm = true)
    // 24 batches, never maintained: every bucket accumulates ~24
    // generations — the worst serve state the q111 class can reach at
    // maintenance cadence 24
    (0 until 24).foreach { i =>
      st.merge((0 until 2000).map(k =>
        (k.toLong, (i * 2000 + k).toLong)).toDF("k", "n"), i.toLong)
    }
    val deepGens = st.maxGenerationsPerBucket
    assert(deepGens >= 20, s"fixture too shallow: $deepGens gens")
    def serveSum(): (Double, Long) = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val s = st.view(spark).agg(sum(col("n"))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, s)
    }.minBy(_._1) // min-of-3: the steadiest sample on a shared box
    val (unmaintained, sumBefore) = serveSum()
    st.compactTiered(9999L, fanout = 2, maxGens = 2)
    assert(st.maxGenerationsPerBucket <= 2,
      s"full maintain left ${st.maxGenerationsPerBucket} generations")
    val (maintained, sumAfter) = serveSum()
    // answer unchanged by maintenance — VALUES, not just row count
    // (a compaction mis-folding the min combine would keep all keys)
    assert(sumAfter == sumBefore,
      s"maintenance changed the folded answer: $sumBefore -> $sumAfter")
    assert(st.view(spark).count() == 2000)
    val ratio = unmaintained / maintained
    info(f"serve at $deepGens gens: $unmaintained%.3f s; " +
      f"maintained: $maintained%.3f s; ratio $ratio%.1f×")
    // the priced claim: un-maintained serve cost is at most LINEAR in
    // the generation count — the property that makes the structural
    // bound a real cost cap (the r17 bench artifacts put the
    // production point at ~4-6×: q111 serves its un-maintained clone
    // in 5.6-5.8 s quiet-box while the maintained q126/q128 stores
    // serve at store cost; this fixture measured ~3× on a quiet box).
    // The assertion is a cost-MODEL bound, 2× the generation depth,
    // not a raw small constant: cross-phase wall ratios on a shared
    // box can legitimately stretch with FS-cache state, and the
    // failure this exists to catch is per-generation cost turning
    // superlinear, which blows straight through 2·gens.
    assert(ratio < 2.0 * deepGens,
      f"un-maintained serve $ratio%.1f× the maintained serve at " +
        f"$deepGens generations — per-generation cost looks " +
        "superlinear; the generation bound no longer caps real cost")
  }
}
