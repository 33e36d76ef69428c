package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: the bench's correlated-corpus PQ recall experiment in
  * isolation (iterate on the corpus geometry without a full bench run).
  */
object ProfPqCorr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 768; val latent = 32
    val nCorr = 20000L
    val nClusters = 2000L
    val rnd = new scala.util.Random(11)
    val mix = Array.fill(d)(Array.fill(latent)(rnd.nextGaussian()))
    val mixDf = {
      import spark.implicits._
      mix.zipWithIndex.map { case (row, i) => (i, row.toSeq) }
        .toSeq.toDF("dim_id", "mix")
    }
    val corr = spark.range(nCorr).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(latent - 1)),
          j => (pmod(xxhash64(col("id") % nClusters, j), lit(2000L))
              .cast("double") / 1000.0 - 1.0) +
            lit(0.15) * (pmod(xxhash64(col("id"), j + 100), lit(2000L))
              .cast("double") / 1000.0 - 1.0)).as("z"))
      .crossJoin(broadcast(mixDf))
      .select(col("vec_id"), col("dim_id"),
        aggregate(zip_with(col("mix"), col("z"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x).as("v"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim_id"),
          col("v")))), s => s("v").cast("float")).as("embedding"))
      .repartition(cpus.toInt)
      .cache()
    println("rows=" + corr.count())
    val qs = corr.filter(col("vec_id") % (nCorr / 40) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exactC = graft.operators.Knn.exactBatch(qs, corr, "ip", 10)
      .select("query_id", "vec_id").cache()
    val nExactC = exactC.count()
    val t0 = System.nanoTime()
    val cbC = graft.index.Pq.trainCodebook(
      corr.filter(col("vec_id") % 8 === 0), 96, 8, 256, maxIter = 3)
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Seq(4, 8, 16).foreach { rr =>
      val r = graft.index.Pq
        .twoPhaseSearch(corr, graft.index.Pq.encode(corr, cbC), cbC,
          qs, 10, rr)
        .select("query_id", "vec_id")
        .intersect(exactC).count().toDouble / nExactC
      println(f"recall@rerank$rr: $r%.4f")
    }
    spark.stop()
  }
}
