package graft
package dev

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch adjudicator (round 9): the r8 record's ingest throughput
  * fell 159.8k → 48.2k ops/s in the same round the single-pass flush
  * landed, under a run-long sick dispatch floor — this isolates the
  * two candidate causes with the bench's exact ingest workload (1M
  * replicated ops through `IngestPipeline` streaming) run per flush
  * variant in one JVM:
  *
  *  - `auto`     — current code: exchange decided by Catalyst's size
  *                 estimate (bulk batches keep it);
  *  - `noex`     — the r8-record behavior: exchange skipped
  *                 unconditionally (`repartitionForWrite=false`), the
  *                 suspected small-files explosion;
  *  - `precount` — the r7 shape: an extra count job per batch, then
  *                 the exchange-carrying write.
  *
  * Each variant: fresh tree+checkpoint, best of 2 passes, dispatch
  * floor bracketed, and the written tree's parquet file count reported
  * (the mechanism check: noex at bulk volume should explode it).
  */
object ProfIngestAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")

    // the bench ingest section's exact source build (Bench.scala)
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = graft.index.Ivf.deterministicCentroids(e, 50)
    val base0 = graft.ingest.MutationLog.deterministicLog(e)
    val n0 = base0.count()
    val reps = math.max(1L, 1000000L / math.max(1L, n0)).toInt
    val replicated = base0
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select(col("op"),
        (col("vec_id") + col("rep").cast("long") * lit(1000000L))
          .as("vec_id"),
        concat(col("id"), lit("-"), col("rep")).as("id"),
        (col("epoch") + col("rep").cast("long") * lit(10000L)).as("epoch"),
        col("vec"))
    val log = graft.index.Ivf.assign(
        replicated
          .withColumn("id_hash",
            graft.functions.VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("op", "vec_id", "id", "id_hash", "epoch", "deleted",
        "centroid_id", "vec")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-ingest-ab-").toString
    val src = s"$tmp/src"
    log.repartition(8).write.parquet(src)
    val nOps = spark.read.parquet(src).count()
    System.err.println(s"[ab] source ready: $nOps ops")

    def floor(): Double = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(0 until 32, 32).map(_ => 1).count()
      (System.nanoTime() - t0) / 1e6
    }.min

    def parquetFiles(dir: String): Long = {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) -1L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(f => f.toString.endsWith(".parquet")).count()
        finally s.close()
      }
    }

    def runVariant(name: String,
        flush: (DataFrame, String, Long) => Unit): Unit = {
      val times = (0 until 2).map { p =>
        val tree = s"$tmp/$name-tree$p"; val ckpt = s"$tmp/$name-ckpt$p"
        val fB = floor()
        val t0 = System.nanoTime()
        val q = spark.readStream
          .schema(graft.streaming.IngestPipeline.mutationSchema)
          .parquet(src)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, bid: Long) => flush(b, tree, bid) }
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val fA = floor()
        println(f"[ab] $name pass$p: ${sec}%.2f s " +
          f"(${nOps / sec}%.0f ops/s) floors ${fB}%.1f/${fA}%.1f ms " +
          s"files=${parquetFiles(tree)}")
        sec
      }
      println(f"[ab] $name BEST: ${times.min}%.2f s " +
        f"= ${nOps / times.min}%.0f ops/s")
    }

    runVariant("auto", (b, tree, bid) =>
      graft.streaming.IngestPipeline.flushBatch(b, tree, bid))
    runVariant("noex", (b, tree, bid) =>
      graft.streaming.IngestPipeline.flushBatch(b, tree, bid,
        repartitionOverride = Some(false)))
    runVariant("precount", (b, tree, bid) => {
      // the r7 shape: a whole extra job to count the deduped batch
      // before the exchange-carrying write
      graft.operators.Lww.latestBy(b, "id_hash", "epoch").count()
      graft.streaming.IngestPipeline.flushBatch(b, tree, bid,
        repartitionOverride = Some(true))
    })

    graft.segments.Segments.deleteDir(tmp)
    spark.stop()
  }
}
