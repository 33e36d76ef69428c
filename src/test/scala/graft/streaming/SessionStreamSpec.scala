package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.SessionStream.SessionEvent

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Min = 60L * 1000000L // one minute in µs
  private val T0 = 1700000000000000L

  test("flatMapGroupsWithState sessionization: gap splits, timeout closes") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = SessionStream.sessionize(stream.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()

    // user 1: two bursts 90 minutes apart → two sessions
    stream.addData(
      SessionEvent(1L, T0, 1), SessionEvent(1L, T0 + 5 * Min, 2),
      SessionEvent(1L, T0 + 10 * Min, 3))
    q.processAllAvailable()
    stream.addData(
      SessionEvent(1L, T0 + 100 * Min, 4), SessionEvent(1L, T0 + 101 * Min, 5),
      SessionEvent(2L, T0 + 100 * Min, 6))
    q.processAllAvailable()
    // watermark pusher: far-future event closes all open sessions by timeout
    stream.addData(SessionEvent(99L, T0 + 1000 * Min, 7))
    q.processAllAvailable()
    stream.addData(SessionEvent(99L, T0 + 2000 * Min, 8))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_out")
      .as[SessionStream.SessionOut].collect()
      .filter(_.user_id != 99L)
      .sortBy(r => (r.user_id, r.session_start_us))
    assert(rows.length === 3, rows.mkString("\n"))
    // user 1 session 1: 3 events over 10 minutes
    assert(rows(0) === SessionStream.SessionOut(1L, T0, 3, 10 * Min))
    // user 1 session 2: 2 events over 1 minute
    assert(rows(1) ===
      SessionStream.SessionOut(1L, T0 + 100 * Min, 2, 1 * Min))
    // user 2: singleton session
    assert(rows(2) ===
      SessionStream.SessionOut(2L, T0 + 100 * Min, 1, 0L))
  }
}
