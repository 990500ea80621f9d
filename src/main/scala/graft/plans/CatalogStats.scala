package graft.plans

import org.apache.spark.sql.SparkSession

/**
 * Session-catalog registration with table + column statistics — the lever
 * that turns Catalyst's cost-based optimizer on for the query layer.
 *
 * Temp views over `spark.read.parquet` (what [[graft.sources.Tables]]
 * registers) carry only a file-size estimate, so join ORDER is planned
 * from the text of the query. Registering the same parquet as catalog
 * tables and running `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS`
 * records rowCount + per-column NDV/min/max/null-count histograms, which
 * `CostBasedJoinReorder` (enabled via [[withCbo]]) uses to re-order
 * multi-way joins by estimated intermediate size — the decision that
 * matters at 100 TB, where joining the two small/filtered sides first is
 * the difference between a terabyte-scale and a gigabyte-scale shuffle.
 * At cluster scale the ANALYZE pass is run once per ingest (it is a scan
 * + aggregate, itself distributed) and amortized over every later query.
 */
object CatalogStats {

  /**
   * Register `tables` from `dir` as external parquet catalog tables named
   * `<prefix><table>` and compute full statistics for each. Idempotent
   * (drops any previous registration of the same name; the parquet files
   * are external and never touched).
   *
   * Note: `events.parquet` needs the nanos read path in
   * [[graft.sources.Tables.load]] and cannot be registered through a bare
   * catalog table — pass analytic tables only.
   */
  def register(spark: SparkSession, dir: String, tables: Seq[String],
      prefix: String = ""): Unit =
    tables.foreach { t =>
      val name = s"$prefix$t"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** Run `body` with cost-based optimization (and its join reorder) on,
   * restoring the session's previous settings afterwards. */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val conf = spark.conf
    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.cbo.enabled", "true")
    conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body
    finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
