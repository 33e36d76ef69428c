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

  test("iterative OPQ never loses to plain PQ on the serving workload") {
    // bench settings at test-corpus scale: same m/dsub, k scaled down
    val (m, dsub, k) = (8, 8, 32)
    val qs = Knn.defaultQueries(emb).cache()
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").cache()
    val nExact = exact.count().toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "vec_id").intersect(exact).count() / nExact
    val cb = Pq.trainCodebook(emb, m, dsub, k, maxIter = 5)
    val plain = recallOf(Pq.twoPhaseSearch(emb, Pq.encode(emb, cb), cb, qs, 10, 4))
    val (r, ocb) = Opq.trainCodebookOpqIterative(emb, m, dsub, k,
      iters = 2, maxIter = 5, valQueries = Some(qs))
    val opq = recallOf(
      Opq.twoPhaseSearch(emb, Opq.encode(emb, r, ocb), r, ocb, qs, 10, 4))
    assert(opq >= plain, s"OPQ $opq < plain PQ $plain")
  }

  test("iterative OPQ strictly beats plain PQ when dims are cross-subspace correlated") {
    // adversarial-for-PQ corpus: dim 16 vectors where the second 8-dim
    // subspace duplicates the first (perfect cross-subspace correlation).
    // Plain PQ with m=2 quantizes the two identical halves independently,
    // wasting half the bits; a good rotation compacts the signal so the
    // pair (rotation, codebooks) reconstructs better. The iterative
    // trainer must find distortion strictly below plain PQ's.
    val n = 2000
    val rnd = new scala.util.Random(7)
    val rows = (0 until n).map { i =>
      val half = Array.fill(8)(rnd.nextGaussian().toFloat)
      (i.toLong, half ++ half)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (m, dsub, k) = (2, 8, 16)
    val cb = Pq.trainCodebook(df, m, dsub, k, maxIter = 5)
    val qs = df.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Knn.exactBatch(qs, df, "ip", 10)
      .select("query_id", "vec_id").cache()
    val nExact = exact.count().toDouble
    val plain = Pq.twoPhaseSearch(df, Pq.encode(df, cb), cb, qs, 10, 2)
      .select("query_id", "vec_id").intersect(exact).count() / nExact
    val (r, ocb) = Opq.trainCodebookOpqIterative(df, m, dsub, k,
      iters = 3, maxIter = 5, valQueries = Some(qs))
    val opq = Opq.twoPhaseSearch(df, Opq.encode(df, r, ocb), r, ocb, qs, 10, 2)
      .select("query_id", "vec_id").intersect(exact).count() / nExact
    assert(opq > plain,
      s"rotation should win on correlated dims: OPQ $opq vs plain $plain")
    // and the learned rotation is far from identity (it actually rotated)
    val offDiag = (0 until 16).map(i => math.abs(r.matrix(i)(i))).min
    assert(offDiag < 0.999, "rotation stayed at identity on correlated data")
  }
}
