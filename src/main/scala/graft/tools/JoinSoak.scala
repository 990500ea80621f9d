package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Volume soak for the temporal join operators: 2M synthetic events over
 * 20k users, then (a) the bucketed range join (events in the 5 minutes
 * before each error) and (b) the generic as-of join (latest click before
 * each purchase) at a volume where a per-key nested loop or an unsplit
 * hot key would dominate the wall clock. Prints wall times and asserts
 * structural invariants (as-of yields exactly one row per left row;
 * range-join output stays linear-ish in the event count).
 *
 * Usage: runMain graft.tools.JoinSoak [nEvents]
 */
object JoinSoak {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = 1700000000000000L // epoch µs
    // 20k users, each emitting ~one event/minute (with sub-minute jitter)
    // so a 5-minute window really holds neighbors; deterministic type mix
    val events = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % 20000).as("user_id"),
      (lit(base) + (col("id") / 20000).cast("long") * 60000000L +
        pmod(col("id") * 2654435761L, lit(59000L)) * 1000L).as("ts_us"),
      element_at(
        array(lit("click"), lit("view"), lit("click"), lit("purchase"),
          lit("error")),
        (pmod(col("id") * 40503L, lit(5)) + 1).cast("int")).as("event_type"))
      .cache()
    events.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts_us").as("err_ts"))
    val nErrors = errors.count()
    val rj = timed("range join (5 min before each error)")(
      graft.operators.RangeJoin.timeWindowJoin(errors,
        events.select(col("event_id").as("prior_id"), col("user_id"),
          col("ts_us").as("prior_ts")),
        Seq("user_id"), "err_ts", "prior_ts", -300000000L, 0L).count())
    println(s"==   errors=$nErrors range pairs=$rj")
    // each 5-min window holds ~300s/1000s-per-user-event ≈ 0.3 events/user
    // → output must stay linear in errors, never user-quadratic
    assert(rj < nErrors * 50, s"range-join blowup: $rj")

    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("click_us"))
    val nPurch = purchases.count()
    val aj = timed("as-of join (latest click before each purchase)")(
      graft.operators.AsofJoin.asofJoin(purchases, clicks, Seq("user_id"),
        "ts_us", "click_us", tieBreak = "click_id").count())
    println(s"==   purchases=$nPurch asof rows=$aj")
    assert(aj == nPurch, "as-of must emit exactly one row per left row")

    spark.stop()
  }
}
