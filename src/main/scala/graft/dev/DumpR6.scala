package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DumpR6 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = SparkEntry.storedTreePath(spark, dir)
    val probed = graft.segments.Segments.readSegments(spark, base)
      .filter(col("centroid_id").isin(0L, 100L))
      .select("vec_id", "epoch", "centroid_id", "segment_id")
    println("=== readSegments one-tree probe ===")
    println(probed.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    val e = Tables.load(spark, dir, "embeddings")
    // reference-geometry encode: show ONE pq_encode expression
    val gen = spark.range(100).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(767)),
        t => (pmod(xxhash64(col("id"), t), lit(1000L)).cast("double")
          / 500.0 - 1.0).cast("float")).as("embedding"))
    val rnd = new scala.util.Random(42)
    val cb = graft.index.Pq.Codebook(96, 8,
      Array.tabulate(256)(_.toLong),
      Array.fill(96)(Array.fill(256)(Array.fill(8)(rnd.nextGaussian()))))
    println("=== pq_encode m=96 projection ===")
    println(gen.select(col("vec_id"),
        graft.index.Pq.codesColumn(cb).as("codes"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
