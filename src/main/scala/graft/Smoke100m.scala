package graft

import org.apache.spark.sql.SparkSession

/** Standalone driver for the 100M stable-tier bench section (dev
  * harness): `GRAFT_100M_ROWS`/`GRAFT_100M_DIR` scale/place the store,
  * so the full pipeline smoke-tests at 2M rows in minutes before the
  * real 100M build runs.
  */
object Smoke100m {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // the driver-resident serving tiers collect budget-bounded packed
      // lists (up to ~10 GB of byte codes at the 100M geometry) — the
      // 1 GiB default result cap is below the tier's own byte budget
      .config("spark.driver.maxResultSize", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val extras = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Bench.bench100m(spark, cpus.toInt, extras)
    extras.foreach { case (k, v) => println(s"$k=$v") }
    spark.stop()
  }
}
