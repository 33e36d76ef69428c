package graft
package dev

import org.apache.spark.sql.SparkSession

/** Dev harness: time individual SparkEntry queries under the Bench session
  * config. Usage: runMain graft.dev.QTime <sfDir> <query> [query...]
  * Each query runs twice; both times print (cold includes codegen/JIT).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name%-24s cold=${times(0)}%7.3f warm=${times(1)}%7.3f")
    }
    spark.stop()
  }
}
