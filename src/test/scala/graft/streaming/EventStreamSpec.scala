package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._
  import EventStream._

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00"), user, typ, v)

  private val fixture = Seq(
    ev(0, 5, 1, "click", 1.0), ev(1, 20, 2, "click", 2.0), ev(2, 59, 1, "error", 3.0),
    ev(3, 65, 1, "click", 4.0), ev(4, 90, 2, "click", 5.0))

  test("streaming tumbling counts equal the batch twin (one definition, two runners)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(fixture)
    val q = runToMemory(stream.toDF(), "evt_counts")
    try {
      q.processAllAvailable()
      val streamed = spark.table("evt_counts")
        .orderBy("window_start", "event_type")
        .select("window_start", "event_type", "n", "sum_value")
        .collect().toSeq
      val batch = tumblingCounts(fixture.toDF())
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      // hand-check: hour 0 has 2 clicks + 1 error; hour 1 has 2 clicks
      assert(batch.map(r => (r.getString(1), r.getLong(2))) ==
        Seq(("click", 2L), ("error", 1L), ("click", 2L)))
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user totals across triggers") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = userTotals(stream.toDS()).writeStream
      .format("memory").queryName("user_totals").outputMode("update").start()
    try {
      stream.addData(fixture.take(3))
      q.processAllAvailable()
      stream.addData(fixture.drop(3)) // second trigger updates state
      q.processAllAvailable()
      val rows = spark.table("user_totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("t"))
        .orderBy("user_id").as[(Long, Long, Double)].collect().toSeq
      assert(rows == Seq((1L, 3L, 8.0), (2L, 2L, 7.0)))
    } finally q.stop()
  }

  test("watermarked file-source stream plan builds (readStream surface)") {
    val src = readEventStream(spark, "/root/testdata/sf0.001")
    assert(src.isStreaming)
    val agg = tumblingCounts(src)
    assert(agg.schema.fieldNames.toSeq ==
      Seq("window_start", "event_type", "n", "sum_value"))
  }
}
