package graft.operators

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/**
 * The persisted sketch store's three contracts:
 *   1. the SERVE plan reads the artifact alone (one scan, the sketch
 *      table — never the raw events);
 *   2. maintain(build(days<mid), days>=mid) ≡ build(all) on every
 *      deterministic column (exact counts per (type, day); HLL
 *      register state — hence estimates — depend only on the value
 *      set, so they match too; KLL is randomized and gates as a band);
 *   3. maintain is a pure partition APPEND — existing day files stay
 *      byte-identical (the k03 generation contract).
 */
class SketchStoreSpec extends SparkSpec {

  private def events(n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("t"), col("id") % 3).as("event_type"),
      (col("id") % 500).as("user_id"),
      ((col("id") % 1000).cast("double") / 4.0).as("value"),
      to_timestamp(from_unixtime(lit(1700000000L) +
        (col("id") % 7) * 86400 + col("id") % 3600)).as("ts"))

  test("serve plan scans only the sketch artifact") {
    val root = SketchStore.build(events(5000))
    val p = SketchStore.serve(spark, root).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"serve should scan exactly the sketch table:\n$p")
    assert(p.contains("sketch_store"),
      s"serve's one scan should be the store artifact:\n$p")
  }

  test("maintain == rebuild on deterministic columns; base files byte-untouched") {
    val all = events(20000)
    val mid = to_date(to_timestamp(from_unixtime(lit(1700000000L) +
      4 * 86400)))
    val base = all.filter(to_date(col("ts")) < mid)
    val fresh = all.filter(to_date(col("ts")) >= mid)

    val fullRoot = SketchStore.build(all)
    // snapshot full-store rows BEFORE the second build retires roots
    val fullRows = SketchStore.table(spark, fullRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    val fullServe = SketchStore.serve(spark, fullRoot)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet

    val incRoot = SketchStore.build(base)
    // record every base day file before the append
    def filesUnder(p: Path): Map[String, Array[Byte]] = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.readAllBytes(f)).toMap
      finally walk.close()
    }
    val before = filesUnder(Path.of(incRoot, "days"))
    SketchStore.maintain(incRoot, fresh)
    val after = filesUnder(Path.of(incRoot, "days"))
    before.foreach { case (f, bytes) =>
      assert(after.contains(f), s"maintain deleted base file $f")
      assert(java.util.Arrays.equals(after(f), bytes),
        s"maintain rewrote base file $f")
    }
    assert(after.size > before.size, "maintain appended no new day files")

    val incRows = SketchStore.table(spark, incRoot)
      .select(col("event_type"), col("day"), col("n_rows"),
        hll_sketch_estimate(col("sk_hll")).as("est"))
      .collect().map(r => (r.get(0), r.get(1), r.get(2), r.get(3))).toSet
    assert(incRows == fullRows,
      "maintained artifact rows differ from full rebuild")
    val incServe = SketchStore.serve(spark, incRoot)
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("est_users"))
      .collect().map(_.toSeq).toSet
    assert(incServe == fullServe,
      "maintained serve rollup differs from full rebuild")
  }
}
