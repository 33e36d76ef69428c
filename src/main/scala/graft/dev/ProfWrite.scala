package graft
package dev

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment: where does a segment write's ~1 s go at bench scale?
  * Writes the same 2000-row assigned frame with bloom ndv variants,
  * with/without partitionBy, with/without the repartition — timing each.
  */
object ProfWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions._
    import graft.index.Ivf
    import graft.ingest.MutationLog
    val e = Tables.load(spark, sfDir, "embeddings")
    val cents = Ivf.deterministicCentroids(e, 50)
    val rows = Ivf.assign(
        MutationLog.deterministicLog(e)
          .withColumn("id_hash", hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
      .cache()
    rows.count()
    def time(tag: String)(f: => Unit): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[profwrite] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val base = java.nio.file.Files.createTempDirectory("profwrite-").toString
    var n = 0
    def dir(): String = { n += 1; s"$base/w$n" }
    time("bloom100k+part+repart") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .parquet(dir())
    }
    time("bloom2k+part+repart") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "2000")
        .parquet(dir())
    }
    time("nobloom+part+repart") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .parquet(dir())
    }
    time("bloom100k+part+norepart") {
      rows.write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .parquet(dir())
    }
    time("bloom100k+nopart") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .parquet(dir())
    }
    time("nobloom+nopart") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .parquet(dir())
    }
    time("bloom100k+part+repart+v2") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(dir())
    }
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "64")
    time("bloom100k+part+repart+concwriters") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .parquet(dir())
    }
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    time("part+repart+uncompressed") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("compression", "none")
        .parquet(dir())
    }
    time("part+repart+nosummary") {
      rows.repartition(col("centroid_id")).write.mode(SaveMode.Overwrite)
        .partitionBy("centroid_id")
        .option("parquet.summary.metadata.level", "NONE")
        .option("parquet.bloom.filter.enabled#id_hash", "true")
        .option("parquet.bloom.filter.expected.ndv#id_hash", "100000")
        .parquet(dir())
    }
    spark.stop()
  }
}
