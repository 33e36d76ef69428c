package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end smoke drive of the library surface (scratch). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val docs = Tables.load(spark, dir, "documents")

    println("== S1 dot / S2 l2 (codegen expressions) ==")
    import graft.functions.VectorFunctions._
    emb.select(col("vec_id"), dotD(col("embedding"), col("embedding")).as("norm_sq"),
        l2SqD(col("embedding"), col("embedding")).as("self_l2"))
      .orderBy("vec_id").show(3)

    println("== S5 xxhash64 seed 0 vs builtin(seed42) ==")
    emb.select(hashId(concat(lit("vec-"), col("vec_id"))).as("h0"),
      xxhash64(concat(lit("vec-"), col("vec_id"))).as("h42")).show(3)

    println("== KNN exact ip top-3 for 2 queries ==")
    val qs = graft.operators.Knn.defaultQueries(emb).limit(2)
    graft.operators.Knn.exactBatch(qs, emb, "ip", 3).orderBy("query_id", "score").show()

    println("== Dedup: exact groups ==")
    graft.operators.DedupOps.exactGroups(docs).orderBy(desc("n_dups")).show(3)

    println("== Dedup: jaccard pairs within source ==")
    graft.operators.DedupOps.jaccardPairsWithin(docs, "source", 5).show()

    println("== Dedup: minhash near-dups ==")
    graft.operators.DedupOps.minhashNearDups(docs, threshold = 0.2).orderBy("a", "b").show(5)

    println("== Dedup: simhash near-dups (maxHamming=10) ==")
    graft.operators.DedupOps.simhashNearDups(docs, maxHamming = 10).orderBy("a", "b").show(5)

    println("== entry() driver contract: rows>0 ==")
    val er = SparkEntry.entry(spark)
    println(s"entry rows = ${er.count}")
    er.show(5)

    println("== knn_ivf plan: assignment must be map-side (no crossJoin/Window before topk) ==")
    val cents = graft.index.Ivf.deterministicCentroids(emb, 50)
    graft.index.Ivf.assign(emb, cents).explain("formatted")

    println("== probe: dimension mismatch must throw ==")
    try {
      emb.select(dotD(col("embedding"), slice(col("embedding"), 1, 8))).collect()
      println("NO-THROW: BUG")
    } catch {
      case e: Throwable =>
        println(s"threw as expected: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
    }
    spark.stop()
  }
}
