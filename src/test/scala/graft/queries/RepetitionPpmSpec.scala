package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins t22's exact-integer HALF_UP ppm arithmetic on the one input
 * class that broke its first driver outing (round 16): ratios of small
 * integers that land exactly on a dyadic 6dp half. 1/128 · 10⁶ =
 * 7812.5 — `round(DOUBLE, 6)` resolves the tie by whatever half-mode
 * the engine build ships (HALF_EVEN would say 7812), so the gate now
 * states HALF_UP in pure integer arithmetic, (2a·10⁶ + b) div (2b),
 * which both Spark and DuckDB evaluate identically. This spec
 * hand-pins the tie constant 7813: a formula regression to floor or
 * half-even division fails it by one. */
class RepetitionPpmSpec extends SparkSpec {

  test("t22 ppm fractions are HALF_UP at dyadic 6dp ties, raw counts " +
      "cross the gate") {
    import spark.implicits._
    // doc 1: 129 distinct tokens → n2=128, m2=1 → top2 = 1/128, the
    //   7812.5 tie; all 3-grams distinct → dup3_ppm = 0.
    // doc 2: 130 tokens, the last 3 repeating the first 3 → n3=128,
    //   d3=127 → dup3 = 1/128, the same tie from the other signal;
    //   "a b" and "b c" each appear twice → m2=2, n2=129.
    val doc1 = (1 to 129).map(i => s"w$i").mkString(" ")
    val doc2 = (Seq("a", "b", "c") ++ (4 to 127).map(i => s"t$i") ++
      Seq("a", "b", "c")).mkString(" ")
    val dir = Files.createTempDirectory("t22ppm").toString
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("t22_repetition_filter")(
      spark, dir).collect().sortBy(_.getLong(0))
    assert(out.length == 2)
    val Seq(r1, r2) = out.toSeq
    def row(r: org.apache.spark.sql.Row) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))
    // (n2, m2, n3, d3, dup3_ppm, top2_ppm)
    assert(row(r1) == ((128L, 1L, 127L, 127L, 0L, 7813L)),
      s"doc1 ${row(r1)} — top2 must be HALF_UP(7812.5) = 7813")
    assert(row(r2) == ((129L, 2L, 128L, 127L, 7813L, 15504L)),
      s"doc2 ${row(r2)} — dup3 must be HALF_UP(7812.5) = 7813")
    // kept = ppm·count ≤ Σppm, integers end to end: doc1 fails the
    // top2 cut (7813·2 > 7813+15504 is false → …) — compute exactly:
    val sd = 0L + 7813L; val st = 7813L + 15504L; val c = 2L
    assert(r1.getBoolean(7) == (0L * c <= sd && 7813L * c <= st))
    assert(r2.getBoolean(7) == (7813L * c <= sd && 15504L * c <= st))
  }
}
