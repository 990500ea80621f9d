package graft.etl

import org.apache.spark.sql.SparkSession
import GcdSchemas.GcdFlags

/**
 * CLI parity with the reference (`Main.java:54-57`:
 * `configFile date indexName outputType`) re-shaped for the Spark engine:
 *
 *   GcdEtlMain <tablesDir> <date y-M-d> <outPath> [flags]
 *
 * `tablesDir` holds one parquet per source table (FIXTURES.md §1) — the
 * engine's contract starts at "dump restored / tables available as files"
 * (SURVEY.md §3 E3). `flags` is a comma list of capability toggles to
 * disable for older dumps, e.g. `no-publication-type,no-story-credit`
 * (GcdSchema.java:8-59 parity). There is no FLAMDEX output type: Spark SQL
 * over the written table replaces the Imhotep index (SURVEY.md §7.4).
 */
object GcdEtlMain {

  def parseFlags(spec: String): GcdFlags = {
    val off = spec.split(",").map(_.trim).filter(_.nonEmpty).toSet
    GcdFlags(
      publicationType = !off("no-publication-type"),
      volumeNotPrinted = !off("no-volume-not-printed"),
      seriesIsSingleton = !off("no-series-is-singleton"),
      storyFirstLine = !off("no-story-first-line"),
      storyCredit = !off("no-story-credit"))
  }

  /** Full pipeline on an existing session: load sources → build → write →
   * register. Separated from main() so tests can drive it end-to-end. */
  def run(spark: SparkSession, tablesDir: String, date: String,
      outPath: String, flags: GcdFlags = GcdFlags(),
      tableName: String = "gcdissuesnapshot"): Unit = {
    // S1 parity: `tablesDir` may be a parquet directory or a jdbc: URL
    // (the reference's MySQL source, Main.java:128-132) — with JDBC,
    // Catalyst pushes filters/projections into the database the same way
    // the reference shipped its hand-written SQL there.
    val tables: Map[String, org.apache.spark.sql.DataFrame] =
      if (tablesDir.startsWith("jdbc:")) {
        GcdSnapshot.sourceTables.map { t =>
          t -> spark.read.format("jdbc")
            .option("url", tablesDir)
            .option("dbtable", t)
            .load()
        }.toMap
      } else {
        // per table: parquet preferred, CSV fallback (explicit schema —
        // inference would mis-type nullable ints/datetimes in dumps)
        GcdSnapshot.sourceTables.flatMap { t =>
          val pq = new java.io.File(s"$tablesDir/$t.parquet")
          val csv = new java.io.File(s"$tablesDir/$t.csv")
          if (pq.exists) Some(t -> spark.read.parquet(pq.getPath))
          else if (csv.exists) Some(t -> spark.read
            .schema(GcdSchemas.sourceSchemas(t))
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
            .csv(csv.getPath))
          else None
        }.toMap
      }
    val snap = GcdSnapshot.build(spark, tables, date, flags)
    GcdSink.writeSnapshot(snap, date, outPath)
    GcdSink.registerTable(spark, tableName, outPath)
  }

  def main(args: Array[String]): Unit = {
    val Array(tablesDir, date, outPath) = args.take(3)
    val flags = if (args.length > 3) parseFlags(args(3)) else GcdFlags()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("gcd-snapshot-etl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    run(spark, tablesDir, date, outPath, flags)
    spark.stop()
  }
}
