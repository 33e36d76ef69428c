package graft.index

import graft.SparkSpec
import graft.operators.Knn

class PqTrainSpec extends SparkSpec {
  import spark.implicits._

  test("KMeans-trained codebook beats the deterministic toy codebook on recall") {
    val qs = Knn.defaultQueries(emb)
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(cb: Pq.Codebook): Double = {
      val approx = Pq.twoPhaseSearch(emb, Pq.encode(emb, cb), cb, qs, 10, 4)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (approx & exact).size.toDouble / exact.size
    }
    val toy = recall(Pq.deterministicCodebook(emb, 8, 8, 50))
    val trained = recall(Pq.trainCodebook(emb, 8, 8, k = 32, maxIter = 5))
    assert(trained > toy, s"trained=$trained toy=$toy")
    assert(trained > 0.7, s"trained recall $trained")
  }

  test("PqEncode is bit-identical to per-subspace NearestIndex over slices") {
    // codesColumn switched from array(m × NearestIndex(slice)) to the
    // single looped PqEncode for generated-code size (the m=96 form
    // trips janino's 64 KB method limit and silently drops to
    // interpreted execution); the arithmetic contract — sequential dots,
    // expanded-form L2, strict-< lowest-index tie-break — must be
    // unchanged, element for element
    import org.apache.spark.sql.functions._
    val cb = Pq.trainCodebook(emb, 8, 8, k = 32, maxIter = 5)
    val legacy = array((0 until cb.m).map { j =>
      graft.functions.expr.IndexExpressions.nearestIndex(
        slice(col("embedding"), j * cb.dsub + 1, cb.dsub), cb.codebooks(j))
    }: _*)
    val mismatches = emb
      .select(Pq.codesColumn(cb).as("a"), legacy.as("b"))
      .filter(col("a") =!= col("b"))
      .count()
    assert(mismatches === 0L)
    // and the interpreted path equals codegen (Knn-spec style dual-mode
    // check): evaluate via a collected comparison on a sample
    val sample = emb.limit(64)
      .select(Pq.codesColumn(cb).as("a"), legacy.as("b"))
      .as[(Seq[Int], Seq[Int])].collect()
    sample.foreach { case (a, b) => assert(a === b) }
  }
}
