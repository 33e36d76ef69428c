package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for IVF assignment throughput (dev harness): the two
  * geometries the bench measures — 1M×64-d×64 centroids (L1-resident
  * matrix, latency-bound) and 50k×768-d×4096 centroids (the reference
  * stable-tier shape, config.h:19,84 — a 25 MB matrix that makes the
  * row-at-a-time kernel memory-bound). Compares the codegen expression
  * path ([[graft.index.Ivf.assign]]) against the chunked bulk path
  * ([[graft.index.Ivf.assignBulk]]), best-of-3 each.
  */
object ProfAssign {
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
    import graft.index.Ivf

    def best3(f: => Long): Double =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // --- 1M x 64d x nlist 64 (the bench's ivf_assign_1m shape) ---------
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
    val cents = Ivf.deterministicCentroids(e, (n0 / 64).toInt.max(1))
    System.gc()
    val exprSec = best3(
      Ivf.assign(big, cents).select(count(col("centroid_id"))).head()
        .getLong(0))
    val bulkSec = best3(
      Ivf.assignBulk(big, cents).select(count(col("centroid_id"))).head()
        .getLong(0))
    println(f"assign_1m_64d: expr ${nBig / exprSec}%.0f rows/s " +
      f"(${exprSec}%.2f s)  bulk ${nBig / bulkSec}%.0f rows/s " +
      f"(${bulkSec}%.2f s)")
    big.unpersist()

    // --- 50k x 768d x nlist 4096 (the bench's stress768 shape) ---------
    val d = 768; val nlist = 4096
    val n = 50000L
    val gen = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(d - 1)),
        t => (pmod(xxhash64(col("id"), t), lit(1000L)).cast("double")
          / 500.0 - 1.0).cast("float")).as("embedding"))
    val big768 = gen.repartition(32).cache()
    big768.count()
    val rnd = new scala.util.Random(42)
    val cents768 = {
      import spark.implicits._
      Array.fill(nlist)(Array.fill(d)(rnd.nextGaussian()))
        .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toSeq.toDF("cid", "cv")
    }
    System.gc()
    val exprSec768 = best3(
      Ivf.assign(big768, cents768).select(count(col("centroid_id"))).head()
        .getLong(0))
    val bulkSec768 = best3(
      Ivf.assignBulk(big768, cents768).select(count(col("centroid_id")))
        .head().getLong(0))
    println(f"assign_768d_4096c: expr ${n / exprSec768}%.0f rows/s " +
      f"(${exprSec768}%.2f s)  bulk ${n / bulkSec768}%.0f rows/s " +
      f"(${bulkSec768}%.2f s)")
    spark.stop()
  }
}
