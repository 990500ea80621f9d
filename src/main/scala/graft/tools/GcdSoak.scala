package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/**
 * Volume soak for the GCD snapshot pipeline: generates a deterministic
 * synthetic dump (~200k issues / ~420k stories / 300k credits) with
 * spark.range — no driver-side data — runs the full build + partitioned
 * write, and prints row counts and wall times. Exercises the real shuffle
 * paths (fan-out join, credit groupBy, dictionary broadcasts) at a volume
 * where a quadratic or driver-bound mistake is obvious.
 *
 * Usage: runMain graft.tools.GcdSoak [nIssues]
 */
object GcdSoak {

  def synthTables(spark: SparkSession, nIssues: Long)
      : Map[String, DataFrame] = {
    val nSeries = math.max(nIssues / 40, 1)
    val nPublishers = math.max(nSeries / 50, 1)
    val nStories = nIssues * 21 / 10 // ~2.1 per issue
    val nCreators = 8000L

    val ts = to_timestamp(lit("2020-06-15 12:00:00"))

    val issues = spark.range(nIssues).select(
      col("id"),
      // ~5% non-numeric numbers, exercising the lenient parse
      when(col("id") % 20 === 0, concat(lit("Annual "), col("id") % 9))
        .otherwise((col("id") % 300).cast("string")).as("number"),
      // mix of valid, 00-month, and junk dates
      when(col("id") % 17 === 0, lit("junk"))
        .when(col("id") % 5 === 0,
          concat(lit("19"), lpad((col("id") % 60 + 30).cast("string"), 2, "0"),
            lit("-00-00")))
        .otherwise(concat(lit("19"), lpad((col("id") % 60 + 30).cast("string"), 2, "0"),
          lit("-"), lpad((col("id") % 12 + 1).cast("string"), 2, "0"),
          lit("-"), lpad((col("id") % 28 + 1).cast("string"), 2, "0")))
        .as("key_date"),
      when(col("id") % 3 === 0, lit("0.10 USD; 0.12 CAD"))
        .otherwise(lit("0.25 USD")).as("price"),
      when(col("id") % 7 === 0, lit(null).cast(IntegerType))
        .otherwise((col("id") % 64 + 16).cast(IntegerType)).as("page_count"),
      lit("monthly").as("indicia_frequency"),
      lit(null).cast("string").as("isbn"),
      lit(null).cast("string").as("variant_name"),
      lit(null).cast("bigint").as("variant_of_id"),
      lit(null).cast("string").as("barcode"),
      concat(lit("Issue "), col("id")).as("title"),
      lit("1962-01-15").as("on_sale_date"),
      lit(null).cast("string").as("rating"),
      (col("id") % 2).cast(IntegerType).as("volume_not_printed"),
      lit("Ed One ; Ed Two").as("editing"),
      lit(null).cast("string").as("notes"),
      ts.as("created"), ts.as("modified"),
      (col("id") % nSeries).as("series_id"),
      when(col("id") % 4 === 0, lit(null).cast("bigint"))
        .otherwise(col("id") % 500).as("indicia_publisher_id"),
      when(col("id") % 6 === 0, lit(null).cast("bigint"))
        .otherwise(col("id") % 300).as("brand_id"))

    val series = spark.range(nSeries).select(
      col("id"),
      concat(lit("Series "), col("id")).as("name"),
      (col("id") % 80 + 1940).cast(IntegerType).as("year_began"),
      lit(null).cast(IntegerType).as("year_ended"),
      (col("id") % 2).cast(IntegerType).as("is_current"),
      (col("id") % 40).cast(IntegerType).as("country_id"),
      (col("id") % 20).cast(IntegerType).as("language_id"),
      lit(0).cast(IntegerType).as("has_gallery"),
      lit(1).cast(IntegerType).as("is_comics_publication"),
      lit("color").as("color"),
      lit(null).cast("string").as("dimensions"),
      lit(null).cast("string").as("paper_stock"),
      lit("hard ; soft").as("binding"),
      lit("ongoing").as("publishing_format"),
      (col("id") % 5).cast(IntegerType).as("publication_type_id"),
      lit(0).cast(IntegerType).as("is_singleton"),
      ts.as("created"), ts.as("modified"),
      (col("id") % nPublishers).as("publisher_id"))

    val publishers = spark.range(nPublishers).select(
      col("id"), concat(lit("Publisher "), col("id")).as("name"),
      (col("id") % 40).cast(IntegerType).as("country_id"),
      lit(null).cast("string").as("url"), ts.as("created"), ts.as("modified"))

    val indicia = spark.range(500).select(
      col("id"), concat(lit("Indicia "), col("id")).as("name"),
      (col("id") % 40).cast(IntegerType).as("country_id"),
      (col("id") % 100).as("parent_id"),
      lit(1950).cast(IntegerType).as("year_began"),
      lit(null).cast(IntegerType).as("year_ended"),
      (col("id") % 2).cast(IntegerType).as("is_surrogate"),
      lit(null).cast("string").as("url"), ts.as("created"), ts.as("modified"))

    val brands = spark.range(300).select(
      col("id"), concat(lit("Brand "), col("id")).as("name"),
      lit(null).cast("string").as("url"), ts.as("created"), ts.as("modified"))

    // stories cover issues [0, nIssues*0.9): ~10% of issues have none
    val nCovered = nIssues * 9 / 10
    val stories = spark.range(nStories).select(
      col("id"),
      (col("id") % nCovered).as("issue_id"),
      concat(lit("Story "), col("id")).as("title"),
      lit("feature").as("feature"),
      (col("id") % 9 + 1).cast(IntegerType).as("sequence_number"),
      (col("id") % 30 + 2).cast(IntegerType).as("page_count"),
      lit("Legacy A ; Legacy B").as("script"),
      lit("Legacy C").as("pencils"),
      lit(null).cast("string").as("inks"),
      lit(null).cast("string").as("colors"),
      lit("L1;L2 ;").as("letters"),
      lit(null).cast("string").as("editing"),
      lit("horror; sci-fi").as("genre"),
      lit("Hero; Villain").as("characters"),
      (col("id") % 30).cast(IntegerType).as("type_id"),
      lit(null).cast("string").as("job_number"),
      lit("It began...").as("first_line"),
      ts.as("created"), ts.as("modified"))

    // curated credits over 1/3 of stories, incl. compound types
    val credits = spark.range(nStories / 3 * 2).select(
      // every 3rd story gets 2 credits; integer division keeps LongType
      ((col("id") / 2).cast("long") * 3).as("story_id"),
      (col("id") % 13 + 1).cast(IntegerType).as("credit_type_id"),
      (col("id") % 10000).as("creator_id"))

    val nameDetail = spark.range(10000).select(
      col("id"), (col("id") % nCreators).as("creator_id"))
    val creators = spark.range(nCreators).select(
      col("id"), concat(lit("Creator "), col("id")).as("gcd_official_name"))

    def dictN(n: Int, prefix: String, valueCol: String) =
      spark.range(n).select(col("id").cast(IntegerType).as("id"),
        concat(lit(prefix), col("id")).as(valueCol))

    Map(
      "gcd_issue" -> issues, "gcd_series" -> series,
      "gcd_publisher" -> publishers, "gcd_indicia_publisher" -> indicia,
      "gcd_brand" -> brands, "gcd_story" -> stories,
      "gcd_story_credit" -> credits,
      "gcd_creator_name_detail" -> nameDetail, "gcd_creator" -> creators,
      "stddata_country" -> dictN(40, "cc", "code"),
      "stddata_language" -> dictN(20, "ll", "code"),
      "gcd_series_publication_type" -> dictN(5, "pt", "name"),
      "gcd_story_type" -> dictN(30, "st", "name"))
  }

  /** Stages are COMPOSABLE in one invocation: name any subset
   * (`build incremental history explain`) after the optional numeric
   * nIssues arg, or `full` for the whole lifecycle chain
   * build → incremental → history (the history stage itself covers
   * kill → recover → prune) — one JVM, one synthetic dump, every
   * stage green or the run fails. No args = `build` (the original
   * default). */
  def main(args: Array[String]): Unit = {
    val nIssues = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toLong).getOrElse(200000L)
    val known = Set("build", "incremental", "history", "explain", "full")
    val unknown = args.drop(if (args.headOption.exists(_.forall(_.isDigit))) 1 else 0)
      .filterNot(known.contains)
    require(unknown.isEmpty,
      s"GcdSoak: unknown stage(s) ${unknown.mkString(", ")} — " +
        s"expected [nIssues] then any of ${known.mkString("/")}")
    val named = args.filter(Set("build", "incremental", "history",
      "explain").contains)
    // `full` is the whole-chain shorthand — a further named stage
    // would be silently dropped, so reject the combination loudly
    require(!args.contains("full") || named.isEmpty,
      s"GcdSoak: 'full' already names build/incremental/history — " +
        s"drop it or drop ${named.mkString(", ")}")
    val stages: Seq[String] =
      if (args.contains("full")) Seq("build", "incremental", "history")
      else if (named.nonEmpty) named.toSeq
      else Seq("build")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = synthTables(spark, nIssues)
    stages.foreach { st =>
      println(s"== stage: $st")
      st match {
        case "explain"     => stageExplain(spark, tables)
        case "incremental" => stageIncremental(spark, tables, nIssues)
        case "history"     => stageHistory(spark, tables, nIssues)
        case "build"       => stageBuild(spark, tables, nIssues)
      }
    }
    spark.stop()
  }

  private def stageExplain(spark: SparkSession,
      tables: Map[String, DataFrame]): Unit =
    graft.etl.GcdSnapshot.build(spark, tables, "2026-8-12")
      .explain("formatted")

  private def stageIncremental(spark: SparkSession,
      tables: Map[String, DataFrame], nIssues: Long): Unit = {
      // Evidence stage for the SnapshotStore's at-scale cost model: a
      // small dump against a large bucketed base must read (and rewrite)
      // only the buckets it touches — carry I/O bounded by
      // base × touchedBuckets/nBuckets, NOT by base size (the full-scan
      // carry of the dataframe algebra reads 100% every maintain).
      val nBuckets = 256
      val touchedN = 24 // a small dump: 24 issues of `nIssues`
      val t0 = System.nanoTime()
      val base = graft.etl.GcdSnapshot.build(spark, tables, "2026-8-12")
      val store = new graft.etl.GcdIncremental.SnapshotStore(
        spark, nBuckets, collectMetrics = true)
      store.init(base)
      // tInit = build(all) + full bucketed write — exactly what a
      // non-incremental pipeline pays on EVERY dump (the reference's
      // recompute-everything model, Main.java:380-513), so it doubles
      // as the full-rebuild bar the maintain ratio is judged against.
      val tInit = (System.nanoTime() - t0) / 1e9
      val baseRows = store.view.count()
      val touched = spark.range(touchedN)
        .select((col("id") * (nIssues / touchedN)).as("issue_id"))
      store.maintain(tables, touched, "2026-8-12")
      val m = store.metrics.last
      val pct = 100.0 * m.carryRowsRead / baseRows
      val tMaintain = m.wallMs / 1000.0
      println(f"== incremental: base=$baseRows rows (rebuild+write $tInit%.1fs); " +
        f"dump of $touchedN issues -> ${m.touchedBuckets}/${m.nBuckets} " +
        f"buckets, carry read ${m.carryRowsRead} rows ($pct%.1f%% of " +
        f"base vs 100%% full-scan), wall ${m.wallMs} ms")
      println(f"== incremental: maintain/rebuild ratio = " +
        f"$tMaintain%.2fs / $tInit%.2fs = ${tMaintain / tInit}%.2f " +
        f"(must be < 1: the store pays off vs recompute-per-dump)")
      assert(tMaintain < tInit,
        f"maintain ($tMaintain%.2fs) not cheaper than full rebuild ($tInit%.2fs)")
      val afterRows = store.view.count()
      println(s"== incremental: rows after maintain $afterRows (expect $baseRows)")
      assert(afterRows == baseRows)
      assert(m.touchedBuckets <= touchedN,
        s"touched ${m.touchedBuckets} buckets for a $touchedN-issue dump")
      // the carry must be partition-pruned: ≲ k/n of base, never ~base
      assert(m.carryRowsRead <= baseRows * (m.touchedBuckets + 1) / nBuckets * 2,
        s"carry read ${m.carryRowsRead} of $baseRows rows — not bucket-pruned")
  }

  private def stageHistory(spark: SparkSession,
      tables: Map[String, DataFrame], nIssues: Long): Unit = {
      // Evidence stage for g05's at-scale cost model: retained dump
      // history must cost O(touched buckets × dumps) extra storage —
      // never a copy of the base per generation — while every retained
      // generation stays exactly readable, and pruning is metadata
      // work. 6 small dumps against a 200k-issue base: the duplicated
      // bucket versions are ≤ dumps × touchedBuckets of 256, asof(1)
      // fingerprints equal to the init view after all 6 maintains, and
      // pruneHistory reclaims only unreferenced versions.
      val nBuckets = 256
      val touchedN = 24
      val dumps = 6
      val base = graft.etl.GcdSnapshot.build(spark, tables, "2026-8-12")
      val store = new graft.etl.GcdIncremental.SnapshotStore(
        spark, nBuckets, collectMetrics = true, retainHistory = true)
      store.init(base)
      // order-independent content fingerprint: (rows, sum of row hash)
      def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          // modular sum: order-independent and ANSI-overflow-safe
          sum(pmod(xxhash64(col("issue_id"),
            coalesce(col("story_id"), lit(-1L))), lit(1000000007L))))
          .head()
        (r.getLong(0), r.getLong(1))
      }
      val fpInit = fp(store.view)
      (1 to dumps / 2).foreach { i =>
        // same source tables → rebuilt rows equal the originals: the
        // view's CONTENT is invariant while bucket versions turn over
        val touched = spark.range(touchedN)
          .select((col("id") * (nIssues / touchedN) + i).as("issue_id"))
        store.maintain(tables, touched, "2026-8-12")
      }
      // DRIVER LOSS mid-history: only the store root (bucket files +
      // committed manifests) survives; recovery must reattach the live
      // view, the column list, AND every retained generation — the
      // durable-manifest contract the driver-memory history lacked
      val rec = graft.etl.GcdIncremental.recover(spark, store.rootDir,
        nBuckets, collectMetrics = true, retainHistory = true)
      println(s"== history: killed after ${store.generations} " +
        s"generations, recovered ${rec.generations} from the manifest")
      assert(fp(rec.view) == fpInit, "recovered live view drifted")
      (dumps / 2 + 1 to dumps).foreach { i =>
        val touched = spark.range(touchedN)
          .select((col("id") * (nIssues / touchedN) + i).as("issue_id"))
        rec.maintain(tables, touched, "2026-8-12")
      }
      assert(rec.generations == dumps + 1,
        s"expected ${dumps + 1} generations, got ${rec.generations}")
      assert(rec.retainedGenerations == (1L to (dumps + 1)),
        s"generation numbering not stable across recovery: " +
          s"${rec.retainedGenerations}")
      val maxTouched = (store.metrics ++ rec.metrics)
        .map(_.touchedBuckets).max
      println(s"== history: ${rec.generations} retained generations " +
        s"(recovery mid-stream), per-dump touched buckets <= " +
        s"$maxTouched/$nBuckets")
      val tAsof = System.nanoTime()
      val fpAsof1 = fp(rec.snapshotAsOf(1))
      println(f"== history: asof(1) read+fingerprint " +
        f"${(System.nanoTime() - tAsof) / 1e9}%.1fs")
      assert(fpAsof1 == fpInit, s"asof(1) $fpAsof1 != init $fpInit")
      assert(fp(rec.view) == fpInit,
        "view content drifted across identity dumps")
      val tPrune = System.nanoTime()
      val deleted = rec.pruneHistory(keep = 2)
      println(f"== history: prune to newest 2 deleted $deleted bucket " +
        f"versions in ${(System.nanoTime() - tPrune) / 1e9}%.2fs " +
        "(metadata + deletes only)")
      assert(deleted > 0 && rec.generations == 2)
      // STABLE numbering: the survivors keep their original numbers
      val survivors = rec.retainedGenerations
      assert(survivors == Seq(dumps.toLong, dumps + 1L),
        s"prune renumbered generations: $survivors")
      assert(fp(rec.snapshotAsOf(survivors.last)) == fpInit,
        "surviving newest generation corrupted by prune")
  }

  private def stageBuild(spark: SparkSession,
      tables: Map[String, DataFrame], nIssues: Long): Unit = {
    val out = java.nio.file.Files.createTempDirectory("gcd_soak").toString
    val t0 = System.nanoTime()
    val snap = graft.etl.GcdSnapshot.build(spark, tables, "2026-8-12")
    graft.etl.GcdSink.writeSnapshot(snap, "2026-8-12", out)
    val tWrite = (System.nanoTime() - t0) / 1e9

    val back = spark.read.parquet(out)
    val n = back.count()
    graft.etl.GcdSink.registerTable(spark, "gcd_soak_snap", out)
    val t1 = System.nanoTime()
    val top = spark.sql(
      """SELECT publisher_name, count(*) AS n, count(DISTINCT issue_id) AS issues
        |FROM gcd_soak_snap WHERE snapshot = 20260812
        |GROUP BY publisher_name ORDER BY n DESC LIMIT 5""".stripMargin)
      .collect()
    val tQuery = (System.nanoTime() - t1) / 1e9
    println(f"== soak: issues=$nIssues rows=$n write=$tWrite%.1fs query=$tQuery%.1fs")
    top.foreach(r => println(s"==   ${r.mkString(" | ")}"))
    // invariants: every issue appears; fan-out plus story-less issues
    val issueCount = back.select(countDistinct(col("issue_id"))).head().getLong(0)
    println(s"== distinct issues in snapshot: $issueCount (expect $nIssues)")
    assert(issueCount == nIssues)
    val nullStories = back.filter(col("story_id").isNull).count()
    println(s"== story-less rows: $nullStories (expect ${nIssues / 10})")
  }
}
