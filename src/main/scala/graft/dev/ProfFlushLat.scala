package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (round 8): steady-state LATENCY of one micro-batch
  * flush — the exact flushBatch shape over a 500-row parquet batch,
  * looped with fresh inputs, timed per iteration. Separates "the flush
  * job costs X" from the streaming engine's own trigger bookkeeping.
  */
object ProfFlushLat {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-flushlat-").toString
    (0 until 12).foreach { w =>
      val epoch0 = (w * 500 + 1).toLong
      val wave = spark.range(500).select(
        lit("UPSERT").as("op"),
        (col("id") + epoch0).as("vec_id"),
        concat(lit("f-"), (col("id") + epoch0).cast("string")).as("id"),
        (col("id") + epoch0).as("id_hash"),
        (col("id") + epoch0).as("epoch"),
        lit(false).as("deleted"),
        (col("id") % 4).as("centroid_id"),
        array(lit(0.1), lit(0.2), lit(0.3), lit(0.4))
          .cast("array<double>").as("vec"))
      wave.coalesce(1).write.mode("overwrite").parquet(s"$tmp/src$w")
      val batch = spark.read.parquet(s"$tmp/src$w")
      val t0 = System.nanoTime()
      graft.streaming.IngestPipeline.flushBatch(batch, s"$tmp/tree", w.toLong)
      val tF = (System.nanoTime() - t0) / 1e6
      // variant: AQE off + narrow shuffle, scoped
      val tV0 = System.nanoTime()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try graft.streaming.IngestPipeline.flushBatch(batch,
        s"$tmp/treeV", w.toLong)
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      val tV = (System.nanoTime() - tV0) / 1e6
      print(f"[flushlat] variantAqeOff=$tV%.0f ms  ")
      // components, measured separately on the same batch
      val t1 = System.nanoTime()
      graft.operators.Lww.latestBy(batch, "id_hash", "epoch").count()
      val tD = (System.nanoTime() - t1) / 1e6
      val t2 = System.nanoTime()
      batch.write.mode("overwrite").parquet(s"$tmp/raw$w")
      val tP = (System.nanoTime() - t2) / 1e6
      println(f"[flushlat] w=$w flush=$tF%.0f ms dedupeCount=$tD%.0f ms plainWrite=$tP%.0f ms")
    }
    graft.segments.Segments.deleteDir(tmp)
    spark.stop()
  }
}
