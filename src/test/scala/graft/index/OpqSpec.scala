package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Knn

class OpqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rot = Opq.trainRotation(emb, m = 8, dsub = 8)

  test("trained rotation is orthonormal (R * R^T = I)") {
    val d = rot.d
    var maxErr = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => rot.matrix(i)(t) * rot.matrix(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      maxErr = math.max(maxErr, math.abs(dot - expect))
    }
    assert(maxErr < 1e-9, s"max |R R^T - I| = $maxErr")
  }

  test("rotation preserves inner products (applied via the map-side column)") {
    val rotated = emb.limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        Opq.rotate(rot, col("embedding")).as("rv"))
      .withColumn("raw_nsq", graft.functions.VectorFunctions.dotD(col("v"), col("v")))
      .withColumn("rot_nsq", graft.functions.VectorFunctions.dotD(col("rv"), col("rv")))
      .select("raw_nsq", "rot_nsq").as[(Double, Double)].collect()
    rotated.foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"norm changed under rotation: $a vs $b")
    }
  }

  test("OPQ two-phase search recall stays high and scores are exact") {
    val qs = Knn.defaultQueries(emb)
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val (r, cb) = Opq.trainCodebookOpq(emb, m = 8, dsub = 8, k = 32,
      maxIter = 5)
    val codes = Opq.encode(emb, r, cb)
    val got = Opq.twoPhaseSearch(emb, codes, r, cb, qs, 10, 4)
    val gotSet = got.select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = (gotSet & exact).size.toDouble / exact.size
    assert(recall > 0.7, s"OPQ recall $recall")
    // phase-2 scores are raw exact dots: every returned (q, v, score) must
    // equal the brute-force score for that pair
    val scores = got.as[(Long, Long, Double)].collect()
      .map { case (q, v, s) => (q, v) -> s }.toMap
    val brute = Knn.exactBatch(qs, emb, "ip", 500)
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, s) => (q, v) -> s }.toMap
    scores.foreach { case (k2, s) =>
      assert(math.abs(brute(k2) - s) < 1e-12, s"score mismatch at $k2")
    }
  }
}
