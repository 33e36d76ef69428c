package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` table (SURVEY §2.7 T7 workloads).
  * The same transforms run under Structured Streaming (see
  * graft.streaming.IngestPipeline) — groupBy(window(...)) is
  * streaming-compatible by construction.
  */
object EventOps {

  /** Hourly tumbling-window aggregate per event_type. Window start emitted
    * as epoch seconds (bigint) for timezone-proof oracle parity.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        count_distinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("h")).as("hour_ts"), col("event_type"),
        col("n"), round(col("sum_value"), 4).as("sum_value"), col("n_users"))

  /** Per-hour top-k event types by count (T7 + Q9 composition): rank over
    * the hourly aggregate. The aggregate bounds the ranked input to
    * (hours × types) rows, so the window sorts a tiny relation no matter
    * the raw event volume — the raw scan never reaches a window.
    */
  def topTypesHourly(events: DataFrame, k: Int = 3): DataFrame = {
    val hourly = events
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("h"))
      .orderBy(col("n").desc, col("event_type").asc)
    hourly.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(unix_timestamp(col("h")).as("hour_ts"), col("event_type"),
        col("n").cast("long").as("n"), col("rnk").cast("long").as("rnk"))
  }

  /** Sessionization: per user, a new session starts when the gap from the
    * previous event exceeds `gapMinutes`. Output: one row per session with
    * bounds and counts. Window-function shape (lag + running sum) — the
    * streaming twin is [[graft.streaming.SessionStream]]
    * (flatMapGroupsWithState).
    *
    * Skew: the per-user window means one pathological user bounds one
    * task. Salting cannot apply (sessions need the user's total event
    * order); at 100 TB the mitigation is the streaming form, where a hot
    * user bounds one state entry's update rate instead of a sort.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    // microsecond precision on both sides (oracle: epoch_us) — second-level
    // truncation would disagree with the oracle at gap boundaries
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tus").asc,
      col("event_id").asc)
    val gap = lit(gapMinutes * 60L * 1000000L)
    events
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_tus").isNull || col("tus") - col("prev_tus") > gap)
          .cast("int"))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("duration_us"))
  }

  /** JSON property extraction (`props` is a JSON string, FIXTURES.md):
    * deterministic regex extraction of the integer `k` field, distribution
    * by k % 10. Integer sums → exact in any aggregation order.
    */
  def propsKDistribution(events: DataFrame): DataFrame =
    events
      .select(regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
        .cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
}
