package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the bench's ingest→visible freshness probe in isolation
  * (round 8, VERDICT item 5) — measures where a wave's latency goes at a
  * 100 ms flush trigger so the flush path can be tuned without a full
  * bench run. Prints per-wave latency plus the p50/p99 summary line.
  */
object ProfFresh {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fDir = java.nio.file.Files.createTempDirectory("graft-fresh-prof-")
      .toString
    val fSrc = s"$fDir/src"; val fTree = s"$fDir/tree"
    val fCkpt = s"$fDir/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(fSrc))
    import org.apache.spark.sql.streaming.Trigger
    val fq = graft.streaming.IngestPipeline.start(spark, fSrc, fTree,
      fCkpt, Trigger.ProcessingTime("100 milliseconds"))
    try {
      val waves = 25
      val waveRows = 500
      val lat = scala.collection.mutable.ArrayBuffer.empty[Double]
      var w = 0
      while (w < waves) {
        val epoch0 = (w * waveRows + 1).toLong
        val wave = spark.range(waveRows).select(
          lit("UPSERT").as("op"),
          (col("id") + epoch0).as("vec_id"),
          concat(lit("f-"), (col("id") + epoch0).cast("string")).as("id"),
          (col("id") + epoch0).as("id_hash"),
          (col("id") + epoch0).as("epoch"),
          lit(false).as("deleted"),
          (col("id") % 4).as("centroid_id"),
          array(lit(0.1), lit(0.2), lit(0.3), lit(0.4))
            .cast("array<double>").as("vec"))
        wave.coalesce(1).write.mode("append").parquet(fSrc)
        val wantEpoch = epoch0 + waveRows - 1
        val t0 = System.nanoTime()
        val deadline = t0 + 60L * 1000000000L
        var visible = false
        while (!visible && System.nanoTime() < deadline) {
          val descs = graft.segments.Segments
            .catalogDescriptors(spark, fTree)
          visible = descs.nonEmpty && descs.map(_.max_epoch).max >= wantEpoch
          if (!visible) Thread.sleep(2)
        }
        val ms = (System.nanoTime() - t0) / 1e6
        if (visible) { lat += ms; System.err.println(f"[fresh] wave $w: $ms%.1f ms") }
        else { System.err.println(s"[fresh] wave $w TIMED OUT"); w = waves }
        w += 1
      }
      val sorted = lat.sorted.toIndexedSeq
      def p(q: Int) =
        sorted(math.min(sorted.length - 1, sorted.length * q / 100))
      // decomposition: Spark's own per-trigger durations
      fq.recentProgress.takeRight(8).foreach { pr =>
        System.err.println(s"[fresh] progress rows=${pr.numInputRows} " +
          s"durations=${pr.durationMs}")
      }
      println(f"""{"waves":${lat.length},"p50_ms":${p(50)}%.1f,"p99_ms":${p(99)}%.1f}""")
    } finally {
      fq.stop()
      try graft.segments.Segments.deleteDir(fDir)
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
