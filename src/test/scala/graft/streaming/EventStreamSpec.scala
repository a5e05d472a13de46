package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming operators driven through MemoryStream micro-batches,
  * checked against their batch twins.
  */
class EventStreamSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  test("windowed counts aggregate a micro-batched stream like the batch plan") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long, String, Double)]
    val events = src.toDF()
      .toDF("user_id", "event_id", "ts_ns", "event_type", "value")
    val q = EventStream.windowedCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000 * 1000 * 1000
      // two full hours of data, then a third hour to advance the watermark
      src.addData((1L, 1L, h + 1, "click", 1.0),
        (1L, 2L, h + 2, "click", 2.0), (2L, 3L, h + 3, "view", 3.0))
      q.processAllAvailable()
      src.addData((1L, 4L, 2 * h + 1, "click", 4.0))
      q.processAllAvailable()
      src.addData((1L, 5L, 5 * h, "click", 0.0)) // watermark push
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("event_type", "n_events", "sum_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 3.0)))
      assert(rows.contains(("click", 1L, 4.0)))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[EventStream.Ev]
    val q = EventStream.sessionize(src.toDS(),
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val gap = EventOps.SessionGapNs
      // user 1: two sessions separated by > gap, delivered in one batch
      src.addData(EventStream.Ev(1L, 1L, 1000L, 1.0),
        EventStream.Ev(1L, 2L, 2000L, 2.0),
        EventStream.Ev(1L, 3L, gap + 5000L, 3.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[EventStream.SessionOut]
        .collect()
      // first session closed by the arrival of the third event
      assert(closed.length === 1)
      assert(closed.head.n_events === 2L)
      assert(closed.head.sum_value === 3.0)
      assert(closed.head.start_ns === 1000L && closed.head.end_ns === 2000L)
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per event id") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long, String, Double)]
    val events = src.toDF()
      .toDF("user_id", "event_id", "ts_ns", "event_type", "value")
    val q = EventStream.dedupEvents(events)
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").start()
    try {
      src.addData((1L, 10L, 1000L, "click", 1.0),
        (1L, 10L, 2000L, "click", 9.0), // same id, same batch
        (2L, 11L, 3000L, "view", 2.0))
      q.processAllAvailable()
      src.addData((1L, 10L, 4000L, "click", 5.0)) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_events").select("event_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(ids === Set((10L, 1.0), (11L, 2.0)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long, String, Double)]
    val events = src.toDF()
      .toDF("user_id", "event_id", "ts_ns", "event_type", "value")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrichEvents(events, dim)
      .writeStream.format("memory").queryName("enriched_events")
      .outputMode("append").start()
    try {
      src.addData((1L, 1L, 1000L, "click", 1.0),
        (3L, 2L, 2000L, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched_events")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows === Set((1L, Some("gold")), (2L, None)))
    } finally q.stop()
  }
}
