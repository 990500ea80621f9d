package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** The ns→µs conversion must be exact integer division at ANY nanos value:
 * double division has a 256 ns ULP at 1.7e18 (today's epoch ns), so
 * `(ns / 1000.0).toLong` truncates to a different microsecond for values
 * near the rounding boundary. Pins the `ts_ns div 1000` path in
 * Tables.load against exact JVM integer division at adversarial inputs. */
class NanosDivisionSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  test("ts_ns div 1000 is exact where double division provably is not") {
    val nowNs = 1765000000000000000L // ~2025-12 in epoch ns
    val adversarial: Seq[Long] =
      // scan a window for values where the double path actually diverges,
      // plus fixed extremes (harness boundaries, max representable µs)
      (0L until 4000L).map(nowNs + _) ++
        Seq(Long.MaxValue - 1025, 9223372036854775000L, 1L, 999L, 1000L,
          2L << 53, (2L << 53) + 1)

    val df = adversarial.toDF("ts_ns")
      .withColumn("micros_div", expr("ts_ns div 1000"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))

    var doubleDiverged = 0
    df.foreach { case (ns, got) =>
      assert(got == ns / 1000L, s"div path wrong at $ns")
      if ((ns / 1000.0).toLong != ns / 1000L) doubleDiverged += 1
    }
    // the test only proves something if the double path really differs
    // somewhere in the scanned window
    assert(doubleDiverged > 0,
      "adversarial set never triggered double-rounding divergence")
  }
}
