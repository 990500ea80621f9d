package graft.queries

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The shared arrival-staging harness every streamed-ingest build
 * rides (21 call sites): batch K must carry exactly slice K (the as-of
 * gates' arrival-order contract), one staged file per slice, and an
 * EMPTY slice must still stream an empty batch without shifting the
 * numbering — including when the empty slice follows non-empty ones
 * whose files have already moved out of the staging dir (the r18
 * ADVICE crash: the fallback's schema inference read a staging dir the
 * moves had already emptied). */
class StreamSlicedSpec extends SparkSpec {

  private def runSliced(ids: Seq[Long]): Seq[(Long, Seq[Long])] = {
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map(Tuple1(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, false))))
    val seen = new ConcurrentLinkedQueue[(Long, Seq[Long])]()
    StreamingQueries.streamSliced(spark, rows, "id",
      s"sliced_spec_${ids.hashCode.abs}") { (b, id) =>
      seen.add((id, b.select(col("id")).collect().map(_.getLong(0))
        .toSeq.sorted))
      ()
    }
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq.sortBy(_._1)
  }

  test("batch K carries exactly slice K (pmod arrival order), one " +
    "file per slice") {
    val got = runSliced(0L to 19L)
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    got.foreach { case (k, rows) =>
      assert(rows == (0L to 19L).filter(_ % 4 == k),
        s"batch $k carried $rows")
    }
  }

  test("an empty TRAILING slice still streams an empty batch with " +
    "unshifted numbering (schema from rows, not the emptied staging dir)") {
    // ids cover slices 0..2 only; slice 3's fallback runs AFTER slices
    // 0-2 moved out of the staging dir — exactly the crash case
    val got = runSliced(Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L))
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.last._2.isEmpty, "trailing empty slice must stream empty")
    assert(got.flatMap(_._2).sorted == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L))
  }

  test("an entirely empty input still streams nSlices empty batches") {
    val got = runSliced(Seq.empty)
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(got.forall(_._2.isEmpty))
  }
}
