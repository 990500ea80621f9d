package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Advanced, Analytics, DedupQueries, GcdQueries,
  MultimodalQueries, Q, Relational, SimilarityQueries, StreamingQueries,
  TextQueries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every verifiable query the engine ships (SURVEY.md §2 inventory +
   * training-data-pipeline operators), name → (impl, optional DuckDB oracle). */
  def registry: Seq[Q] =
    Relational.all ++ Advanced.all ++ Analytics.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ TextQueries.all ++ MultimodalQueries.all ++
      GcdQueries.all ++ StreamingQueries.all

  /**
   * Flagship: the reference's denormalizing snapshot shape (SURVEY.md §2.2
   * J1-J6 — fact ⋈ dims with broadcast dictionaries, left-outer fan-out to
   * children, scalar date transforms) on sf0.001.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    val l = Tables.load(spark, dir, "lineitem")
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "inner")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
      .join(l, o("o_orderkey") === l("l_orderkey"), "left_outer")
      .select(
        col("o_orderkey"), col("c_custkey"), col("n_name"), col("r_name"),
        col("l_linenumber"), col("l_quantity"),
        graft.functions.Transforms
          .epochToYmdInt(unix_timestamp(col("o_orderdate"))).as("odate_ymd"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
