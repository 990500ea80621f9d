package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import graft.etl.GcdSchemas

/**
 * One-shot generator for the checked-in GCD fixture dump at
 * `fixtures/gcd/<table>.parquet` — the input of the driver-gated
 * end-to-end snapshot query (g01_gcd_snapshot).
 *
 * The dump is the soak generator's deterministic 2k-issue synthetic corpus
 * (every fan-out/credit/dictionary shape at volume) PLUS a hand-written
 * edge block (ids ≥ 9_000_000) covering the branches volume data never
 * hits: junk/overflow/signed issue numbers, 00-month and non-matching
 * dates, missing dictionary ids, dangling indicia-publisher and creator
 * references, all-separator splits, and the curated-vs-legacy credit
 * provenance fork (reference Main.java:380-513 branch census).
 *
 * Output is one flat parquet FILE per table (not a directory) so both
 * Spark and the driver's DuckDB oracle read the identical bytes by path.
 * Run once and commit: `sbt "runMain graft.tools.GcdFixtureGen"`.
 */
object GcdFixtureGen {

  /** noon UTC, away from day boundaries (same reasoning as the spec). */
  private val ts = Timestamp.valueOf("2020-01-02 12:00:00")

  def edgeRows: Map[String, Seq[Row]] = Map(
    "gcd_issue" -> Seq(
      // E1: fully-populated issue, 00-month key_date, multi-price, flags on
      Row(9000001L, "12", "1962-00-00", "0.10 USD; 0.12 CAD",
        Integer.valueOf(32), "monthly", "isbn-1", "variant", 9L, "bar-1",
        "Issue One", "1962-01-15", "T", Integer.valueOf(1), "Stan ; Jack",
        "n1", ts, ts, 9000200L, 9000300L, 9000400L),
      // E2: everything optional null; partial date; missing-dict series
      Row(9000002L, "Annual 1", "1962", null, null, null, null, null, null,
        null, null, null, null, null, null, null, null, null, 9000201L,
        null, null),
      // E3: signed zero-padded number, junk date, all-separator price,
      // leading-empty editing, DANGLING indicia_publisher_id
      Row(9000003L, "+0012", "junk", ";", null, null, null, null, null,
        null, null, null, null, Integer.valueOf(0), "; x", null, ts, ts,
        9000200L, 9999999L, 9000400L),
      // E4: int-overflow number, regex-valid-but-impossible date, "" price
      Row(9000004L, "99999999999999999999", "1962-13-99", "", null, null,
        null, null, null, null, null, null, null, null, ";", null, ts, ts,
        9000200L, null, null),
      // E5: negative number, null key_date, all-zero on_sale date
      Row(9000005L, "-7", null, "0.25 USD", Integer.valueOf(0), null, null,
        null, 0L, null, null, "0000-00-00", null, null, null, null, ts, ts,
        9000200L, null, null)),
    "gcd_series" -> Seq(
      Row(9000200L, "Amazing", Integer.valueOf(1960), null,
        Integer.valueOf(1), Integer.valueOf(910), Integer.valueOf(920),
        Integer.valueOf(0), Integer.valueOf(1), "color", null, null,
        "hard ; soft", "ongoing", Integer.valueOf(930), Integer.valueOf(0),
        ts, ts, 9000100L),
      // dictionary misses: country 999 absent, language null
      Row(9000201L, "Obscure", null, null, null, Integer.valueOf(999), null,
        null, null, null, null, null, null, null, null, null, null, null,
        9000100L)),
    "gcd_publisher" -> Seq(
      Row(9000100L, "Best Comics", Integer.valueOf(910), "http://best", ts,
        ts)),
    "gcd_indicia_publisher" -> Seq(
      Row(9000300L, "IndiPub", Integer.valueOf(911), 9000100L,
        Integer.valueOf(1950), null, Integer.valueOf(1), null, ts, ts)),
    "gcd_brand" -> Seq(
      Row(9000400L, "BrandX", null, ts, ts)),
    "gcd_story" -> Seq(
      // curated credits + legacy script both present → curated wins
      Row(9001000L, 9000001L, "S1", "F1", Integer.valueOf(1),
        Integer.valueOf(10), "Legacy Writer", null, null, null, null, null,
        "horror; sci-fi", "; X", Integer.valueOf(940), "J1", "It was...",
        ts, ts),
      // legacy-only credits, empty/trailing split shapes, null numerics
      Row(9001001L, 9000001L, "S2", null, null, null, "A ; B", "C", null,
        "", "L1;L2 ;", null, null, null, Integer.valueOf(941), null, null,
        ts, ts),
      // all-null story with a missing story_type id
      Row(9001002L, 9000001L, null, null, null, null, null, null, null,
        null, null, null, null, null, Integer.valueOf(99999), null, null,
        null, null),
      // curated credits exist but ALL dangle (creator has no name_detail)
      // → inner join drops them → legacy fallback with provenance
      Row(9001003L, 9000003L, "S3", null, null, null, "Fallback ; Guy",
        null, null, null, null, null, null, null, Integer.valueOf(940),
        null, null, ts, ts)),
    "gcd_story_credit" -> Seq(
      Row(9001000L, Integer.valueOf(10), 9000500L), // SCRIPT_PENCILS_INKS
      Row(9001000L, Integer.valueOf(4), 9000501L),  // COLORS
      Row(9001000L, Integer.valueOf(9), 9000500L),  // PAINTING
      Row(9001000L, Integer.valueOf(5), 9000502L),  // LETTERS via variant
      Row(9001003L, Integer.valueOf(1), 9999999L)), // dangling creator
    "gcd_creator_name_detail" -> Seq(
      Row(9000500L, 9000600L), Row(9000501L, 9000601L),
      Row(9000502L, 9000600L)), // 502 is a name VARIANT of creator 600
    "gcd_creator" -> Seq(
      Row(9000600L, "Jack K"), Row(9000601L, "Steve D")),
    "stddata_country" -> Seq(
      Row(Integer.valueOf(910), "us"), Row(Integer.valueOf(911), "ca")),
    "stddata_language" -> Seq(Row(Integer.valueOf(920), "en")),
    "gcd_series_publication_type" -> Seq(Row(Integer.valueOf(930),
      "magazine")),
    "gcd_story_type" -> Seq(Row(Integer.valueOf(940), "story"),
      Row(Integer.valueOf(941), "cover")))

  /** Synth corpus ∪ edge block, conforming to the declared source schemas. */
  def tables(spark: SparkSession, nIssues: Long = 2000L)
      : Map[String, DataFrame] =
    GcdSoak.synthTables(spark, nIssues).map { case (name, synth) =>
      val extra = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(
            edgeRows.getOrElse(name, Seq.empty)).asJava),
        GcdSchemas.sourceSchemas(name))
      name -> synth.unionByName(extra)
    }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "fixtures/gcd"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(base)
    tables(spark).foreach { case (name, df) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"fix_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = base.resolve(s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"== $name -> $dest (${java.nio.file.Files.size(dest)} bytes)")
    }
    spark.stop()
  }
}
