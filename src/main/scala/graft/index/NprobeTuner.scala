package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Q13: nprobe auto-tune — offline calibration replacing the reference's
  * runtime feedback loop (config.h:138-147: adapt nprobe within bounds to
  * hit recall target 0.95 over decision windows).
  *
  * Batch engines don't need the control loop: sweep nprobe over a query
  * sample, measure recall@k against the exact oracle, pick the smallest
  * nprobe meeting target. The sweep shares one exact top-k and one
  * centroid ranking; each candidate nprobe is a prefix of the same probe
  * list, so the whole calibration is queries×nlist scored rows + one scan
  * per candidate.
  */
object NprobeTuner {

  /** recall@k per candidate nprobe. Output: (nprobe, recall). */
  def sweep(spark: SparkSession, data: DataFrame, queries: DataFrame,
      centroids: DataFrame, metric: String, k: Int,
      candidates: Seq[Int]): DataFrame = {
    import spark.implicits._
    val assigned = Ivf.assign(data, centroids).cache()
    val exact = Knn.exactBatch(queries, data, metric, k)
      .select("query_id", "vec_id").cache()
    val nQueries = queries.count().toDouble
    val rows = candidates.map { np =>
      val ivf = Ivf.search(assigned, queries, centroids, metric, k, np)
        .select("query_id", "vec_id")
      val hits = exact.join(ivf, Seq("query_id", "vec_id")).count()
      (np, hits / (nQueries * k))
    }
    rows.toDF("nprobe", "recall")
  }

  /** Smallest candidate nprobe whose recall meets `target`; falls back to
    * the largest candidate (reference clamps to its upper bound).
    */
  def pick(swept: DataFrame, target: Double): Int = {
    val rows = swept.orderBy(col("nprobe")).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    rows.find(_._2 >= target).map(_._1).getOrElse(rows.last._1)
  }
}
