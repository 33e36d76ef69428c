package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state (SURVEY T3/T7 — the
  * flatMapGroupsWithState twin of [[graft.operators.EventOps.sessionize]]).
  *
  * State per user = the open session (bounds + count). An event within
  * `gapMinutes` of the session end extends it; a later event closes and
  * emits the session and opens a new one; an event-time timeout (no
  * events past the gap, watermark advanced) closes the session too.
  *
  * Scale: state is O(active users), keyed and shuffled once per batch by
  * user_id — the streaming analogue of the per-user window partitioning
  * in the batch operator (where a single hot user bounds the task; here
  * a hot user bounds one state entry's update rate instead).
  */
object SessionStream {

  case class SessionEvent(user_id: Long, tus: Long, event_id: Long)
  /** Internal: event + its watermark column (must survive into the
    * stateful operator — a `.map` would re-serialize it away).
    */
  case class SessionEventW(user_id: Long, tus: Long, event_id: Long,
      ts: java.sql.Timestamp)
  case class OpenSession(start: Long, end: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      n_events: Long, duration_us: Long)

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int = 30)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(userId: Long, evs: Iterator[SessionEventW],
        state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(SessionOut(userId, s.start, s.n, s.end - s.start))
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.tus, e.event_id))
        var open = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          open match {
            case Some(s) if e.tus - s.end <= gapUs =>
              // a late cross-batch event may predate the open session —
              // the window extends on both ends
              open = Some(OpenSession(math.min(s.start, e.tus),
                math.max(s.end, e.tus), s.n + 1))
            case Some(s) =>
              closed += SessionOut(userId, s.start, s.n, s.end - s.start)
              open = Some(OpenSession(e.tus, e.tus, 1))
            case None =>
              open = Some(OpenSession(e.tus, e.tus, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end / 1000L + gapMinutes * 60000L)
        }
        closed.result().iterator
      }
    }

    events
      .withColumn("ts", timestamp_micros(col("tus")))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[SessionEventW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
