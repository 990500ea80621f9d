package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, u: Long, tp: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), u, tp, v, "{}")

  test("streaming hourly stats aggregate per window and type") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.hourlyStats(in.toDF())
      .writeStream.format("memory").queryName("hs").outputMode("complete")
      .start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:45:00", 1, "click", 2.0),
        ev(3, "2024-01-01 11:05:00", 2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hs").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 11:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming hourly uniques: sketch merges across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.hourlyUsers(in.toDF())
      .writeStream.format("memory").queryName("hu").outputMode("complete")
      .start()
    try {
      // same window fed from TWO micro-batches with overlapping users:
      // the per-(window, type) sketch state must merge, not reset
      in.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 2, "click", 1.0))
      q.processAllAvailable()
      in.addData(
        ev(3, "2024-01-01 10:20:00", 2, "click", 1.0), // dup user
        ev(4, "2024-01-01 10:30:00", 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hu").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      // HLL++ at rsd 0.02 is exact at this cardinality
      assert(rows == Set(("2024-01-01 10:00:00.0", "click", 4L, 3L)))
    } finally q.stop()
  }

  test("streaming hourly quantiles: KLL sketch state merges across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.hourlyQuantiles(in.toDF())
      .writeStream.format("memory").queryName("hq").outputMode("complete")
      .start()
    try {
      // one window fed from TWO micro-batches: the per-(window, type)
      // sketch must merge — the median of the UNION (1,2,3,4,5 dollars
      // = 300 cents) is reachable only if batch-2 values landed in the
      // same sketch as batch-1's
      in.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 2, "click", 2.0))
      q.processAllAvailable()
      in.addData(
        ev(3, "2024-01-01 10:20:00", 3, "click", 3.0),
        ev(4, "2024-01-01 10:30:00", 4, "click", 4.0),
        ev(5, "2024-01-01 10:40:00", 5, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hq").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      // 5 values < k: the sketch is exact, p50 = 3.00 = 300 cents
      assert(rows == Set(("2024-01-01 10:00:00.0", "click", 5L, 300L)))
    } finally q.stop()
  }

  test("streaming dedup forwards each event_id once within the watermark") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.dedupe(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append")
      .start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:01:00", 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(ev(1, "2024-01-01 10:02:00", 1, "click", 1.0)) // dup, later batch
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dd").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("session windows close on gap (same plan works in batch)") {
    val batch = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 2.0), // same session (<30m gap)
      ev(3, "2024-01-01 11:30:00", 1, "view", 3.0),  // new session
      ev(4, "2024-01-01 10:00:00", 2, "view", 4.0)
    ).toDF()
    val got = EventStream.sessions(batch)
      .select($"user_id", $"n_events", $"sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
  }

  test("stream-stream attribution joins purchases to prior clicks in horizon") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.attribution(in.toDF(), "click", "purchase",
        horizon = "1 hour")
      .writeStream.format("memory").queryName("attr").outputMode("append")
      .start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
        ev(2, "2024-01-01 10:30:00", 1, "purchase", 9.5), // 30m after → match
        ev(3, "2024-01-01 12:00:00", 1, "purchase", 3.0), // 2h after → out
        ev(4, "2024-01-01 09:00:00", 1, "purchase", 1.0), // before → out
        ev(5, "2024-01-01 10:10:00", 2, "purchase", 7.0)) // other user → out
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4))).toSet
      assert(rows == Set((1L, 1L, 2L, 1800000000L, 9.5)))
    } finally q.stop()
  }

  test("custom state emits a user summary on event-time timeout only") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStream.inactiveUserSummary(in.toDF(),
        inactivityMs = 30L * 60 * 1000, watermark = "1 hour")
      .toDF()
      .writeStream.format("memory").queryName("ius").outputMode("append")
      .start()
    try {
      // batch 1: user 1 active early, user 2 late (keeps watermark moving)
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.25),
        ev(2, "2024-01-01 10:10:00", 1, "view", 2.5))
      q.processAllAvailable()
      // batch 2: watermark → 13:00-1h = 12:00 > 10:10+30m → user 1 fires;
      // user 3's own timeout (12:30) is not passed → stays in state
      in.addData(ev(3, "2024-01-01 13:00:00", 3, "click", 7.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM ius").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      assert(rows == Set((1L, 2L, 3.75, 1704103800L)))
    } finally q.stop()
  }
}
