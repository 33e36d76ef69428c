package graft
package dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the exact-KNN heap aggregation at corpus scale
  * (dev harness): 1M vectors x 80 queries, best-of-3 wall time, for BOTH
  * replica shapes — bit-identical copies (the r2 bench corpus) and
  * jittered copies (the r3+ corpus, one coordinate offset per replica) —
  * to attribute the knn_1m_exact_qps delta between rounds: jitter defeats
  * the top-k aggregator's tie-cheap rejects (equal scores lose the id
  * tie-break once the heap holds the low ids, so a tied candidate is a
  * single compare; distinct scores force real sift-down inserts until the
  * heap floor rises).
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
    def corpus(jitter: Boolean): DataFrame = e
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("vec_id") * lit(reps.toLong) + col("rep")).as("vec_id"),
        (if (jitter)
          transform(col("embedding"),
            (x, i) => when(i === 0, x + col("rep").cast("float") * 1e-6f)
              .otherwise(x))
        else col("embedding")).as("embedding"))
      .repartition(32)
    val qs = graft.operators.Knn.defaultQueries(e).cache()
    val nQs = qs.count()
    Seq(false, true).foreach { jitter =>
      val big = corpus(jitter).cache()
      big.count() // materialize, untimed
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.operators.Knn.exactBatch(qs, big, "ip", 10).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"exact jitter=$jitter pass $i: ${sec}%6.2f s  (${nQs / sec}%5.1f qps)")
      }
      big.unpersist()
    }
    spark.stop()
  }
}
