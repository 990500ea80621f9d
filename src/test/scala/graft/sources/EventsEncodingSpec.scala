package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.SparkSpec
import graft.tools.EventsEncodingFixture

/**
 * Pins the events timestamp-encoding contract (round-8 regression: the
 * driver's testdata moved from INT64 nanos to µs TIMESTAMP_NTZ and 16
 * queries crashed because `Tables.load` asserted one encoding instead
 * of normalizing). From ANY of the three encodings a producer has
 * shipped — INT64 nanos, TIMESTAMP, TIMESTAMP_NTZ — `Tables.load` must
 * yield the same `ts_ns` + watermarkable-`ts` contract, and both a
 * streaming consumer (watermark on `ts`) and a `ts_ns` consumer must
 * run green. Removing either normalization branch fails this spec.
 */
class EventsEncodingSpec extends SparkSpec {

  private lazy val dirs: Map[String, String] =
    EventsEncodingFixture.write(spark, Scratch.dir("enc_fixture"))

  test("all encodings normalize to the same ts_ns/ts contract") {
    val loaded = dirs.map { case (enc, dir) =>
      enc -> Tables.load(spark, dir, "events")
    }
    // identical schema: ts_ns long in the source ts slot, µs ts last
    loaded.foreach { case (enc, df) =>
      assert(df.schema("ts_ns").dataType == LongType, enc)
      assert(df.schema("ts").dataType == TimestampType, enc)
      assert(df.columns.toSeq == Seq("event_id", "ts_ns", "user_id",
        "event_type", "value", "props", "ts"), enc)
    }
    // identical µs-domain values across encodings, and ts ≡ ts_ns div 1000
    val us: Map[String, Seq[Row]] = loaded.map { case (enc, df) =>
      enc -> df.select(col("event_id"), expr("ts_ns div 1000"),
          unix_micros(col("ts")), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .orderBy(col("event_id")).collect().toSeq
    }
    us.values.foreach(r => assert(r.size == EventsEncodingFixture.rows.size))
    assert(us("nanos") == us("micros"), "nanos vs micros µs-domain")
    assert(us("nanos") == us("ntz"), "nanos vs ntz µs-domain")
    us.foreach { case (enc, rs) =>
      rs.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"$enc: ts != ts_ns div 1000"))
    }
    // only the nanos encoding can (and must) carry sub-µs precision
    val subUs = loaded("nanos").filter(expr("ts_ns % 1000 != 0")).count()
    assert(subUs == 7, "nanos fixture keeps its sub-µs tail exactly")
    val expected = EventsEncodingFixture.rows.map(r => r._1 -> r._2).toMap
    loaded("nanos").select("event_id", "ts_ns").collect().foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0)), "raw ns preserved")
    }
  }

  test("a ts_ns consumer (q34 as-of join) runs green on every encoding") {
    val results = dirs.toSeq.sortBy(_._1).map { case (enc, dir) =>
      val out = graft.SparkEntry.queries("q34_asof_join")(spark, dir)
        .collect().toSeq
      assert(out.nonEmpty, s"$enc: as-of join returned no rows")
      enc -> out
    }
    assert(results.map(_._2).distinct.size == 1,
      "as-of join results differ across encodings")
  }

  test("a streaming consumer (q30 watermarked hourly) runs green on every encoding") {
    val results = dirs.toSeq.sortBy(_._1).map { case (enc, dir) =>
      val out = graft.SparkEntry.queries("q30_stream_hourly")(spark, dir)
        .collect().toSeq
      assert(out.nonEmpty, s"$enc: no closed windows emitted")
      enc -> out
    }
    assert(results.map(_._2).distinct.size == 1,
      "streaming results differ across encodings")
  }
}
