package graft
package dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Ivf, Opq, Pq}

/** Dev harness: OPQ-vs-PQ recall at bench settings, across rotation
  * variants — chasing the r02 regression (recall_pq_opq 0.804 < plain
  * 0.829 at sf0.1). Not part of the battery.
  */
object ProfOpq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings").cache()
    val qb = graft.operators.Knn.defaultQueries(e).cache()
    val exact = graft.operators.Knn.exactBatch(qb, e, "ip", 10)
      .select("query_id", "vec_id").cache()
    val nExact = exact.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id").intersect(exact).count().toDouble / nExact

    val (m, dsub, k) = (8, 8, 256)
    // plain PQ baseline
    val cb = Pq.trainCodebook(e, m, dsub, k)
    println(f"plain_pq    rerank4: ${recallOf(Pq.twoPhaseSearch(e, Pq.encode(e, cb), cb, qb, 10, 4))}%.4f")

    // current OPQ (eigenvalue allocation)
    val (rot, ocb) = Opq.trainCodebookOpq(e, m, dsub, k)
    println(f"opq_alloc   rerank4: ${recallOf(Opq.twoPhaseSearch(e, Opq.encode(e, rot, ocb), rot, ocb, qb, 10, 4))}%.4f")

    // natural PCA order (no allocation): consecutive slices
    val rotNat = {
      val r = Opq.trainRotationNatural(e, m, dsub)
      r
    }
    val cbNat = Pq.trainCodebook(
      e.withColumn("__rv", Opq.rotate(rotNat, col("embedding"))).cache(),
      m, dsub, k, vecCol = "__rv")
    println(f"opq_natural rerank4: ${recallOf(Opq.twoPhaseSearch(e, Opq.encode(e, rotNat, cbNat), rotNat, cbNat, qb, 10, 4))}%.4f")

    // iterative non-parametric OPQ (identity start, distortion best-pick)
    val (rotIt, cbIt) = Opq.trainCodebookOpqIterative(e, m, dsub, k)
    println(f"opq_iter    rerank4: ${recallOf(Opq.twoPhaseSearch(e, Opq.encode(e, rotIt, cbIt), rotIt, cbIt, qb, 10, 4))}%.4f")

    // iterative OPQ selected against the serving workload (NprobeTuner
    // pattern — what the bench measures)
    val (rotW, cbW) = Opq.trainCodebookOpqIterative(e, m, dsub, k,
      valQueries = Some(qb))
    println(f"opq_iter_wl rerank4: ${recallOf(Opq.twoPhaseSearch(e, Opq.encode(e, rotW, cbW), rotW, cbW, qb, 10, 4))}%.4f")

    spark.stop()
  }
}
