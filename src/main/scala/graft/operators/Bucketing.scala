package graft.operators

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}

/**
 * Bucketed-table co-located joins — the storage-layout answer to the
 * shuffle. The reference re-joins the same tables every snapshot run
 * (the 5-way join shipped to MySQL, /root/reference/src/main/java/org/gcd/etl/Main.java:134-216);
 * at 100 TB the recurring fact-fact join (orders ⋈ lineitem here,
 * issue ⋈ story there) is the dominant exchange. Writing BOTH sides
 * pre-hashed into the same number of buckets on the join key means every
 * subsequent join reads bucket i against bucket i with NO Exchange in
 * the plan — the shuffle is paid once at write time and amortized over
 * every downstream run, and a groupBy on the same key rides the same
 * layout for free.
 *
 * Scale notes:
 *  - bucket count is chosen at write time for the TARGET scale (buckets ≈
 *    table size / healthy-partition size), not the test scale; both sides
 *    must agree on count and key for the co-located read;
 *  - `sortBy` within buckets additionally gives sort-merge joins
 *    pre-sorted runs (no per-task sort) and row-group pruning on the key;
 *  - this is Spark's native datasource bucketing (hash(key) mod n with
 *    Murmur3), readable by any Spark deployment via the catalog.
 */
object Bucketing {

  /**
   * Write `df` as a bucketed parquet table (datasource bucketing) at
   * `path`, registered as `table` in the session catalog. Any existing
   * table of that name is replaced.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, key: String, sortCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val w: DataFrameWriter[Row] = df.write.mode(SaveMode.Overwrite)
      .format("parquet").option("path", path)
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }
}
