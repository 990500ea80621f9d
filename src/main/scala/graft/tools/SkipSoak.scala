package graft.tools

import org.apache.spark.sql.{GraftExpressionBridge => B, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/**
 * File-count soak for [[graft.operators.SkippingIndex]] — the q94 gate
 * at the sidecar scale the operator exists for. The real cost of a
 * point lookup over a 100 TB table is the PRUNING pass over the
 * file-count-sized sidecar (one Bloom filter per data file); this soak
 * fabricates sidecars at 1k / 4k / 16k entries (each a REAL
 * `BloomFilterAggregate` sketch over that "file's" key set, produced by
 * one Spark job — no 16k physical parquet files needed to exercise the
 * pruning plan) with hash-scattered keys so min/max pruning is useless
 * and the Bloom filters do ALL the work, then measures:
 *
 *  - candidateFiles wall vs sidecar size — the executor-side plan
 *    (`bloom_contains_any` inside a Filter) should scale like a tiny
 *    distributed scan, not like a driver loop deserializing every
 *    filter (16× the files must cost far less than 16× the wall);
 *  - pruning quality: each probed key's true file is always a
 *    candidate (no false negatives), and candidates stay a small
 *    fraction of the sidecar (Bloom fpp, not table size).
 *
 * Usage: runMain graft.tools.SkipSoak [keysPerFile]
 */
object SkipSoak {

  def main(args: Array[String]): Unit = {
    val keysPerFile = if (args.nonEmpty) args(0).toInt else 1000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // all probes must exist in the SMALLEST sidecar's key range
    // (sizes.head * keysPerFile) so the no-false-negative check holds
    val probes = Seq(17L, 123456L, 424243L, 777777L, 999999L)

    def mkSidecar(nFiles: Int): String = {
      val root = graft.sources.Scratch.dir(s"skip_soak_$nFiles") + "/t"
      val n = nFiles.toLong * keysPerFile
      // hash-scatter keys across files: every file's [mn,mx] spans
      // nearly the full key range, so range pruning passes everything
      // and the Bloom filters are the only thing standing between a
      // probe and a full scan — the worst case the sidecar serves
      val agg = new BloomFilterAggregate(
        B.toExpression(xxhash64(col("k"))), keysPerFile.toLong)
      spark.range(n).select(col("id").as("k"),
          pmod(xxhash64(col("id")), lit(nFiles)).as("fid"))
        .groupBy(col("fid"))
        .agg(B.toColumn(agg.toAggregateExpression()).as("bloom"),
          min(col("k")).as("mn"), max(col("k")).as("mx"),
          count(lit(1)).as("rows"))
        .select(concat(lit("file_"), col("fid")).as("file"),
          col("bloom"), col("mn"), col("mx"), col("rows"),
          lit(0L).as("gen"))
        .write.parquet(s"$root/_skip_k")
      root
    }

    def trueFile(nFiles: Int, k: Long): String = {
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(k)))
        .eval(null).asInstanceOf[Long]
      s"file_${((h % nFiles) + nFiles) % nFiles}"
    }

    val sizes = Seq(1000, 4000, 16000)
    val walls = sizes.map { nFiles =>
      val root = mkSidecar(nFiles)
      // warm once (parquet footer cache, codegen) then time 5 lookups
      graft.operators.SkippingIndex.candidateFiles(spark, root, "k",
        probes)
      val t0 = System.nanoTime()
      var cand: Seq[String] = Nil
      (1 to 5).foreach { _ =>
        cand = graft.operators.SkippingIndex.candidateFiles(spark, root,
          "k", probes)
      }
      val wall = (System.nanoTime() - t0) / 1e9 / 5
      val must = probes.map(trueFile(nFiles, _)).toSet
      assert(must.subsetOf(cand.toSet),
        s"false negative at $nFiles files: ${must -- cand.toSet}")
      assert(cand.size < nFiles / 10,
        s"no pruning at $nFiles files: ${cand.size} candidates")
      println(f"== skip: $nFiles%6d files  candidates ${cand.size}%5d " +
        f"(${100.0 * cand.size / nFiles}%.1f%%)  lookup $wall%.3fs")
      wall
    }
    val blowup = walls.last / walls.head
    println(f"== skip: ${sizes.last / sizes.head}x files -> " +
      f"$blowup%.1fx wall (executor-side pruning; driver sees file " +
      "names only)")
    assert(blowup < 6.0,
      f"pruning wall scaled like a driver loop: $blowup%.1fx for 16x files")
    spark.stop()
  }
}
