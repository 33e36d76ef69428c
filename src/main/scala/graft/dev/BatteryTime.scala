package graft
package dev

import org.apache.spark.sql.SparkSession

/** Dev harness: run the FULL query battery exactly as Bench.main does
  * (same session config, untimed warmStoredTree, sorted order, best of
  * two runs per query) and write the per-query seconds as one JSON line
  * to stdout plus a file (arg 2, default /tmp/battery.json). The
  * optimization rounds' fast iteration loop: battery-only, no 100M /
  * ingest / latency sections. Usage:
  *   runMain graft.dev.BatteryTime [sfDir] [outPath]
  */
object BatteryTime {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/battery.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.maxResultSize", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.warmStoredTree(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[battery] stored-tree warmup FAILED: ${e.getMessage}")
    }
    // per-query job/stage/task counters — where the fixed costs are
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val stats = (0 until 2).flatMap { _ =>
        val (j0, s0, t0c) = (jobs.get, stages.get, tasks.get)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          Some(((System.nanoTime() - t0) / 1e9,
            jobs.get - j0, stages.get - s0, tasks.get - t0c))
        }
        catch { case e: Throwable =>
          System.err.println(s"[battery] $name FAILED: ${e.getMessage}")
          None
        }
      }
      val best = if (stats.nonEmpty) stats.minBy(_._1) else (-1.0, 0, 0, 0)
      System.err.println(f"[battery] $name%-28s ${best._1}%8.3f  " +
        f"jobs=${best._2}%3d stages=${best._3}%3d tasks=${best._4}%5d")
      name -> best._1
    }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{\"total\":" + f"$total%.3f" + ",\"queries\":{", ",", "}}")
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
