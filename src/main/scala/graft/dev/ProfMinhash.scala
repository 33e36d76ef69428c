package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: isolate the dedup-bench minhash thunk — per-attempt
  * times in a clean JVM, to adjudicate in-bench attempt variance
  * (codegen fallback vs leftover heap/cache pressure).
  */
object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
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
    val docs = Tables.load(spark, sfDir, "documents")
    val nd0 = docs.count()
    val repsD = math.max(1L, 200000L / math.max(1L, nd0)).toInt
    val bigDocs = docs
      .withColumn("rep", explode(sequence(lit(0), lit(repsD - 1))))
      .select((col("doc_id") * lit(repsD.toLong) + col("rep")).as("doc_id"),
        concat(lit("r"), col("rep").cast("string"), lit(" "), col("text"))
          .as("text"))
      .repartition(cpus.toInt)
      .cache()
    val nDocs = bigDocs.count()
    println(s"docs=$nDocs")
    (0 until 6).foreach { a =>
      val t0 = System.nanoTime()
      val sigs = graft.operators.DedupOps.minhashSignatures(bigDocs)
      val banded = sigs.select(
        posexplode(transform(sequence(lit(0), lit(15)),
          b => hash(slice(col("minhash"), b * 4 + 1, lit(4)))))
          .as(Seq("band_id", "band_hash")))
      banded.groupBy(col("band_id"), col("band_hash")).count()
        .select(count(lit(1))).head().getLong(0)
      println(f"attempt $a: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
