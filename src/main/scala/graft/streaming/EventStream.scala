package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the batch event analytics (SURVEY T7): the same
  * windowed aggregations under Structured Streaming with event-time
  * watermarks. `groupBy(window(...))` is streaming-compatible by
  * construction — these helpers pin down watermark and output columns so
  * batch and stream produce the same relation on the same data.
  *
  * Late data: rows later than the watermark are dropped (reference has no
  * event-time semantics — its ordering is arrival epoch; the watermark is
  * the Spark-native upgrade, SURVEY T6).
  */
object EventStream {

  /** Hourly tumbling counts per event_type over a (possibly streaming)
    * events frame. Output matches [[graft.operators.EventOps.hourlyAgg]]
    * column-for-column minus the distinct-users count
    * (`count_distinct` is not incrementally computable without state —
    * streaming uses `approx_count_distinct` instead).
    */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        approx_count_distinct(col("user_id")).as("n_users_approx"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"),
        col("n_users_approx"))
}
