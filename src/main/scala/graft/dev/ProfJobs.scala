package graft
package dev

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev harness: run one SparkEntry query (twice — cold then warm) and dump
  * every Spark job's wall time, task count, and description, plus the gaps
  * BETWEEN jobs (driver-side planning/collect time). The job-level view of
  * where a battery entry's seconds go. Usage:
  *   runMain graft.dev.ProfJobs <sfDir> <query> [query...]
  */
object ProfJobs {
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
      .config("spark.driver.maxResultSize", "32g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.warmStoredTree(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[profjobs] warmup FAILED: ${e.getMessage}")
    }
    case class J(id: Int, start: Long, var end: Long = 0L,
      var tasks: Int = 0, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time)
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse(""))
        jobs.put(e.jobId, j); order.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until 2).foreach { run =>
        order.clear(); jobs.clear()
        val t0 = System.currentTimeMillis()
        fn(spark, sfDir).count()
        val t1 = System.currentTimeMillis()
        println(f"== $name run$run total=${(t1 - t0) / 1000.0}%.3f s")
        var prevEnd = t0
        val it = order.iterator()
        while (it.hasNext) {
          val j = it.next()
          val gap = j.start - prevEnd
          println(f"   gap=${gap}%5d ms | job ${j.id}%3d ${j.end - j.start}%5d ms " +
            f"tasks=${j.tasks}%4d  ${j.desc.take(90)}")
          prevEnd = math.max(prevEnd, j.end)
        }
        println(f"   tail gap=${t1 - prevEnd} ms")
      }
    }
    spark.stop()
  }
}
