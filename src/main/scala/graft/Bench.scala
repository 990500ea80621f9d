package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/**
 * Round benchmark: runs every registered query against
 * `SPARK_GRAFT_SF_DIR` (default sf0.1) on local[32].
 *
 * Output contract (the driver records only a bounded ~2000-char TAIL of
 * stdout, and the per-query map for 100+ queries is ~3 kB — round 5's
 * single-line form overflowed it and the round lost its bench artifact):
 * the per-query detail line is printed FIRST, and the LAST line is a
 * short (≪200-char) summary `{"metric":"total","value":…,"unit":"sec",
 * "n":…,"sf":…}` that always lands inside any tail window.
 *
 * Each query is forced through a full-column hash aggregate (not
 * count(), which lets Catalyst prune every column the query computed —
 * projection-heavy queries would time the scan, not the work). The hash
 * collapses to one row on the driver, so nothing is collected.
 */
object Bench {

  /** Execute df end-to-end with all output columns materialized.
   * The row hashes combine via bit_xor, NOT sum: under ANSI mode the
   * sum of uniform 64-bit hashes overflows a long after a handful of
   * rows and throws — xor is closed over Long and order-independent.
   * (Also used by the BenchOne dev tool so single-query timings share
   * the same no-pruning contract as the round bench.) */
  private[graft] def force(df: DataFrame): Unit = {
    try df.select(xxhash64(struct(df.columns.map(col): _*)).as("__h"))
      .agg(expr("bit_xor(__h)")).head()
    catch {
      // map-typed or otherwise unhashable output: fall back to count()
      // — loudly, because count() lets Catalyst prune the projection
      // and the query's number stops being comparable to the others
      case e: org.apache.spark.sql.AnalysisException =>
        System.err.println(s"[bench] count()-forcing fallback (${e.getErrorClass})")
        df.count()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-index paths once so per-query numbers
    // reflect steady state, not first-query session initialization.
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }
    // Per-query MEDIAN over SPARK_GRAFT_BENCH_REPS runs — default 3.
    // The round-7 driver artifact was single-pass and noise-dominated
    // (3-5× spikes on queries whose code hadn't changed, while the local
    // median-of-3 matched the prior round), so the authoritative number
    // is now a median by default; set reps=1 only for quick dev loops.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.registry.map { q =>
      // A rep in which the query THROWS is excluded from the median —
      // folding its (typically short) failure latency in would report a
      // misleadingly fast number for an intermittently-failing query. A
      // query with zero successful reps gets the -1.0 sentinel, which no
      // real timing can produce, and is listed in the `failed` field.
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(q.run(spark, sfDir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
            false
        }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      (q.name, if (times.nonEmpty) median(times) else -1.0, reps - times.size)
    }
    val failed = results.filter(_._3 > 0)
    if (failed.nonEmpty) System.err.println(
      s"[bench] reps failed: ${failed.map(r => s"${r._1}×${r._3}").mkString(", ")}")
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // total = sum of per-query medians (the "median run" the judge diffs
    // round-over-round); fully-failed queries contribute 0, not -1
    val total = results.map(r => math.max(r._2, 0.0)).sum
    val failedJson = failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val sfName = new java.io.File(sfDir).getName
    spark.stop()
    // SPARK_GRAFT_BENCH_DETAIL=<path>: also write the full per-query map
    // as a repo-committable artifact — the driver's bounded stdout tail
    // keeps only the total + the last ~75 query timings, so round-over-
    // round per-query regression diffs need a file in git.
    // `stages`: per-stage walls for multi-stage persisted-artifact gates
    // (StageTimer) — attributes a moved number to init vs maintain
    sys.env.get("SPARK_GRAFT_BENCH_DETAIL").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        s"""{"metric":"queries","reps":$reps,"sf":"$sfName",""" +
          s""""total":${f3(total)},"n":${results.size},""" +
          s""""failed":$failedJson,"stages":${StageTimer.json},""" +
          s""""queries":$qs}""" + "\n")
    }
    // Detail first (may exceed the driver's tail window), short summary
    // LAST so the parseable total always survives the bounded capture.
    // `failed` = queries with ZERO successful reps (the -1.0 sentinel):
    // the total silently sums only successes, so without this count a
    // red query family can hide inside a green-looking total.
    val nFailed = results.count(_._2 < 0)
    println(s"""{"metric":"queries","reps":$reps,"queries":$qs,"sf":"$sfName"}""")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":${results.size},"failed":$nFailed,"reps":$reps,"sf":"$sfName"}""")
  }
}
