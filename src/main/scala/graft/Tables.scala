package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Normalize `events.ts` to a session-timezone microsecond
    * TimestampType regardless of how the driver generated the parquet —
    * the physical type has changed between rounds:
    *  - TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp;
    *    sessions set `spark.sql.legacy.parquet.nanosAsLong`, it arrives
    *    as a LongType of nanos, and `div 1000` rebuilds micros (the same
    *    floor DuckDB applies, so oracle comparisons stay exact);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; a plain cast re-tags the same wall-clock instant
    *    (sessions run in UTC, so the instant is unchanged and DuckDB's
    *    naive reading agrees);
    *  - already TimestampType: pass through.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    } else df
  }
}
