package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Index generation + compaction contract (the k03 lifecycle): appending
 * a generation leaves prior generations' files untouched, a multi-root
 * read serves both, and compaction into one artifact preserves exactly
 * the posting rows a from-scratch rebuild would produce.
 */
class IndexCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, Seq[String])*) =
    rows.toDF("doc_id", "tags")

  test("compacted generations equal a from-scratch rebuild, file count shrinks") {
    val g0 = docs(1L -> Seq("alpha", "beta"), 2L -> Seq("beta"))
    val g1 = docs(3L -> Seq("alpha", "gamma"), 4L -> Seq("beta", "gamma"))
    val base = java.nio.file.Files.createTempDirectory("idx_gens").toString
    InvertedIndex.write(g0, "doc_id", Seq("tags"), s"$base/gen=0")
    val gen0Files = filesUnder(s"$base/gen=0")
    InvertedIndex.write(g1, "doc_id", Seq("tags"), s"$base/gen=1")
    // gen-0 files are byte-identical after the gen-1 append
    assert(filesUnder(s"$base/gen=0") == gen0Files,
      "appending a generation must not touch prior generations")

    val compacted = java.nio.file.Files
      .createTempDirectory("idx_compact").toString
    InvertedIndex.writePostings(
      spark.read.parquet(base).drop("gen"), compacted)

    val rebuilt = InvertedIndex.postings(
      g0.unionByName(g1), "doc_id", Seq("tags"))
      .orderBy(col("field"), col("term_str"), col("doc_id"))
      .collect().toSeq
    val served = spark.read.parquet(compacted)
      .select(col("field"), col("term_str"), col("term_int"), col("doc_id"))
      .orderBy(col("field"), col("term_str"), col("doc_id"))
      .collect().toSeq
    assert(served == rebuilt)

    // compaction must not multiply files: one artifact's parquet count
    // is bounded by the sum of the generations'
    val genCount = countParquet(base)
    assert(countParquet(compacted) <= genCount,
      s"compaction grew the file count past the generations' $genCount")
  }

  test("multi-root generation read discovers the gen partition column") {
    val base = java.nio.file.Files.createTempDirectory("idx_gens2").toString
    InvertedIndex.write(docs(1L -> Seq("x")), "doc_id", Seq("tags"),
      s"$base/gen=0")
    InvertedIndex.write(docs(2L -> Seq("x")), "doc_id", Seq("tags"),
      s"$base/gen=1")
    val all = spark.read.parquet(base)
    assert(all.columns.contains("gen"))
    val byGen = all.groupBy(col("gen")).agg(count(lit(1)).as("n"))
      .orderBy(col("gen")).collect().map(_.getLong(1)).toSeq
    assert(byGen == Seq(1L, 1L))
  }

  private def filesUnder(dir: String): Map[String, Long] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  private def countParquet(dir: String): Int = filesUnder(dir).size
}
