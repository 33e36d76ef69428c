package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler: declarative exact batch KNN (BNLJ × codegen score ×
  * heap aggregate) vs the bulk kernel (one scan, 4-query interleave,
  * per-query bounded heaps) at 1M×64-d×80 queries, best-of-3 each on a
  * quiet machine.
  */
object ProfExact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")
    val n0 = e.count()
    val reps = math.max(1L, 1000000L / math.max(1L, n0)).toInt
    val big = e
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("vec_id") * lit(reps.toLong) + col("rep")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("rep").cast("float") * 1e-6f)
            .otherwise(x)).as("embedding"))
      .repartition(32).cache()
    val nBig = big.count()
    val qs = graft.operators.Knn.defaultQueries(e).cache()
    val nQs = qs.count()
    def best3(f: => Long): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    System.gc()
    val declSec = best3(
      graft.operators.Knn.exactBatch(qs, big, "ip", 10).count())
    val bulkSec = best3(
      graft.operators.Knn.exactBatchBulk(qs, big, "ip", 10).count())
    println(f"exact_1m: decl ${nQs / declSec}%.1f qps (${declSec}%.2f s)  " +
      f"bulk ${nQs / bulkSec}%.1f qps (${bulkSec}%.2f s)  rows=$nBig")
    spark.stop()
  }
}
