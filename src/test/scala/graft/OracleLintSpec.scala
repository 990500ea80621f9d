package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Wires `tools/oracle_lint.py` into `sbt test` (r17 verdict #4): the
 * r17 round closed the local-green/driver-red comparator asymmetry
 * structurally — the driver compares PANDAS frames, where a DuckDB
 * HUGEINT (any bare SUM/COUNT-derived wide int) renders float64 while
 * Spark's parquet reads back int64 — and the lint DESCRIBEs every
 * registered oracle against the portable output-type set to keep it
 * closed. Running it inside the test suite means a future oracle edit
 * that reintroduces a non-portable type (an uncast SUM, an odd-scale
 * DECIMAL) fails the build the moment it lands, instead of two rounds
 * later on the driver.
 *
 * The registry's SQL is dumped in-JVM through [[Verify.oracleJson]]
 * (the exact bytes `graft.Verify` writes for the driver), so no Spark
 * query runs here and the lint's DESCRIBE is plan-only — the whole
 * spec is seconds, not a sweep.
 */
class OracleLintSpec extends AnyFunSuite {

  private val repoRoot = new java.io.File(".").getCanonicalFile
  private val lint = new java.io.File(repoRoot, "tools/oracle_lint.py")

  private def run(args: String*): Int =
    sys.process.Process("python3" +: lint.getPath +: args,
      repoRoot).!

  /** An environment without python3+duckdb is a gap to SKIP (assume),
   * not a lint regression to red — matches the spec's fixture guards. */
  private lazy val duckdbAvailable: Boolean =
    try sys.process.Process(
      Seq("python3", "-c", "import duckdb"), repoRoot).! == 0
    catch { case _: Throwable => false }

  test("oracle_lint --selftest: the lint still red-flags the HUGEINT " +
      "and odd-decimal classes and passes the portable shapes") {
    assume(lint.isFile, s"missing $lint")
    assume(duckdbAvailable, "python3/duckdb unavailable on this box")
    assert(run("--selftest") == 0, "oracle_lint --selftest failed")
  }

  test("EVERY registered oracle DESCRIBEs to portable output types " +
      "against the sf0.001 tables") {
    assume(lint.isFile, s"missing $lint")
    assume(duckdbAvailable, "python3/duckdb unavailable on this box")
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "no sf0.001 fixture on this box")
    val out = java.nio.file.Files
      .createTempDirectory("oracle_lint_spec")
    java.nio.file.Files.writeString(
      out.resolve("oracle_sql.json"), Verify.oracleJson(None))
    assert(run("/root/testdata/sf0.001", out.toString) == 0,
      "oracle_lint flagged a non-portable oracle output type — see " +
        "the lint's stdout in the test log")
  }
}
