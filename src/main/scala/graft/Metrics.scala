package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A5: metrics export (reference Prometheus set,
  * configs/woved-default.yaml:145-161 — query latency, rows, shuffle and
  * scan volume). Spark-first: a task-metrics listener scoped around each
  * measured action, emitted as a DataFrame a metrics pipeline can sink
  * anywhere.
  */
object Metrics {

  final case class QueryMetrics(
      name: String,
      rows: Long,
      wall_ms: Long,
      tasks: Long,
      shuffle_read_bytes: Long,
      shuffle_write_bytes: Long,
      input_bytes: Long,
      spill_bytes: Long)

  /** Run `df.count()` under a scoped listener and report what the cluster
    * actually did — the difference between "fast" and "fast but shuffled
    * everything" is visible here, not in wall time.
    *
    * The listener sees the whole SparkContext: concurrent jobs (another
    * thread, a running streaming query) are attributed to this
    * measurement. Measure on a quiet session.
    */
  def measure(name: String, df: DataFrame): QueryMetrics = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    var tasks = 0L
    var shuffleRead = 0L
    var shuffleWrite = 0L
    var input = 0L
    var spill = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) synchronized {
          tasks += 1
          shuffleRead += m.shuffleReadMetrics.totalBytesRead
          shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          input += m.inputMetrics.bytesRead
          spill += m.diskBytesSpilled
        }
      }
    }
    sc.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows =
      try df.count()
      finally {
        // listener events are posted async; drain before detaching
        org.apache.spark.GraftSparkBridge.drainListeners(sc, 30000)
        sc.removeSparkListener(listener)
      }
    QueryMetrics(name, rows, (System.nanoTime() - t0) / 1000000L,
      tasks, shuffleRead, shuffleWrite, input, spill)
  }

  def toDf(spark: SparkSession, ms: Seq[QueryMetrics]): DataFrame = {
    import spark.implicits._
    ms.toDF()
  }
}
