package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the exact-KNN heap aggregation at corpus scale
  * (dev harness): 1M jittered vectors x 80 queries, best-of-3 wall time.
  */
object ProfAgg {
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
      .repartition(32)
      .cache()
    big.count()
    val qs = graft.operators.Knn.defaultQueries(e).cache()
    val nQs = qs.count()
    (0 until 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.operators.Knn.exactBatch(qs, big, "ip", 10).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"exact pass $i: ${sec}%6.2f s  (${nQs / sec}%5.1f qps)")
    }
    spark.stop()
  }
}
