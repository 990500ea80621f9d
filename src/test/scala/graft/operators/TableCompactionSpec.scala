package graft.operators

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins TableCompaction's layout contract — the parts the q90 hash gate
 * can't see: file-count collapse to the size-derived target, clean
 * partitions byte-untouched (not even re-listed into new files), and
 * idempotence (a second compact plans zero work). */
class TableCompactionSpec extends SparkSpec {

  private def dataFiles(dir: File): Seq[File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  private def partDirs(root: String): Map[String, File] =
    new File(root).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> d).toMap

  test("compaction collapses debt partitions, leaves clean ones byte-identical") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("tc_spec") + "/t"
    // partition a: heavy debt (8 files); partition b: already compact
    (1 to 400).map(i => (i.toLong, s"v$i", "a")).toDF("id", "s", "p")
      .repartition(8).write.partitionBy("p").parquet(root)
    (1 to 50).map(i => (i + 1000L, s"w$i", "b")).toDF("id", "s", "p")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(root)

    val before = spark.read.parquet(root)
      .orderBy("id").collect().toSeq
    val bFilesBefore = dataFiles(partDirs(root)("p=b"))
      .map(f => (f.getName, f.length, f.lastModified)).sorted

    val report = TableCompaction.compact(spark, root, "p",
      targetBytes = 64L * 1024 * 1024)
    assert(report.touched.map(_.partValue) == Seq("a"))
    assert(report.skipped == 1)

    // debt partition collapsed to its target (64 MB target, tiny data
    // -> 1 file); clean partition's files untouched byte-for-byte
    assert(dataFiles(partDirs(root)("p=a")).size == 1)
    val bFilesAfter = dataFiles(partDirs(root)("p=b"))
      .map(f => (f.getName, f.length, f.lastModified)).sorted
    assert(bFilesAfter == bFilesBefore, "clean partition was rewritten")

    // content identical
    val after = spark.read.parquet(root).orderBy("id").collect().toSeq
    assert(after == before)

    // second compact: nothing in debt, zero touched
    val again = TableCompaction.compact(spark, root, "p",
      targetBytes = 64L * 1024 * 1024)
    assert(again.touched.isEmpty && again.skipped == 2)
  }

  test("target file count follows partition bytes, not a fixed constant") {
    import spark.implicits._
    val root = graft.sources.Scratch.dir("tc_spec2") + "/t"
    (1 to 2000).map(i => (i.toLong, "x" * 200, "a")).toDF("id", "s", "p")
      .repartition(16).write.partitionBy("p").parquet(root)
    val bytes = TableCompaction.plan(spark, root, "p", 1L)
      .head.bytes
    // pick a target that demands 3-5 files and check the rewrite obeys it
    val target = bytes / 4
    val report = TableCompaction.compact(spark, root, "p", target)
    val want = report.touched.head.targetFiles
    assert(want >= 3 && want <= 5, s"unexpected target $want")
    val got = dataFiles(partDirs(root)("p=a")).size
    assert(got <= want, s"wrote $got files for target $want")
    assert(got > 1, "multi-file target collapsed to one file")
    assert(spark.read.parquet(root).count() == 2000)
  }
}
