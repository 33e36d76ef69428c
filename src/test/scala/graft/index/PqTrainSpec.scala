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
}
