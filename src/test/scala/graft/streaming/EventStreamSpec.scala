package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

case class Ev(ts: java.sql.Timestamp, user_id: Long, event_type: String,
    value: Double)

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect()

    val stream = MemoryStream[Ev]
    stream.addData(events.toSeq)
    val out = EventStream.hourlyAgg(stream.toDF())
    val q = out.writeStream
      .format("memory").queryName("hourly_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("hourly_out")
      .select("hour_ts", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    val batch = EventStream.hourlyAgg(
        Tables.load(spark, sfDir, "events"))
      .select("hour_ts", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(streamed.length === batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s._1 === b._1); assert(s._2 === b._2); assert(s._3 === b._3)
      assert(math.abs(s._4 - b._4) < 1e-6, s"$s vs $b")
    }
  }

  test("watermark drops events later than the bound") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    def ev(offsetMin: Int) = Ev(
      new java.sql.Timestamp(base.getTime + offsetMin * 60000L),
      1L, "click", 1.0)
    val stream = MemoryStream[Ev]
    val out = EventStream.hourlyAgg(stream.toDF(), watermark = "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("wm_out")
      .outputMode("append")
      .start()
    // batch 1 advances event time to 12:00; watermark → 11:30
    stream.addData(ev(0), ev(120))
    q.processAllAvailable()
    // batch 2: an event at 10:05 is far behind the watermark → dropped
    stream.addData(ev(5))
    q.processAllAvailable()
    // batch 3: advance far enough to close and emit all open windows
    stream.addData(ev(300))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_out")
      .select("hour_ts", "n").as[(Long, Long)].collect().toMap
    val hour10 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
      .getTime / 1000
    // the 10:00 window emitted exactly 1 event: the late ev(5) was dropped
    assert(rows(hour10) === 1L, rows.toString)
  }
}
