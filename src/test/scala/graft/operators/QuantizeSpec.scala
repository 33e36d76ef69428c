package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 codes stay in [-127,127] and dequantize within scale/2") {
    val codes = Quantize.int8Codes(emb).cache()
    val flat = codes.select(col("vec_id"), col("scale"),
      explode(col("codes")).as("c"))
    assert(flat.filter(col("c") > 127 || col("c") < -127).count() === 0)
    // error bound from the stats view: max_err ≤ scale/2 everywhere
    val stats = Quantize.int8Stats(emb)
    assert(stats.filter(col("max_err") > col("scale") / 2).count() === 0)
    // non-degenerate: real vectors quantize to non-trivial codes
    assert(flat.filter(col("c") =!= 0).count() > 0)
    codes.unpersist()
  }

  test("driver-side replay matches the distributed arithmetic bit for bit") {
    val rows = emb.select(col("vec_id"),
        col("embedding").cast("array<double>")).limit(20)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Quantize.int8Stats(emb.filter(col("vec_id").isin(
        rows.keys.toSeq: _*)))
      .select("vec_id", "scale", "sum_code", "max_err")
      .as[(Long, Double, Long, Double)].collect()
    got.foreach { case (id, scale, sumCode, maxErr) =>
      val e = rows(id)
      val s = e.foldLeft(0.0)((a, x) => math.max(a, math.abs(x))) / 127.0
      val c = if (s == 0) e.map(_ => 0)
        else e.map(x => math.floor(x / s + 0.5).toInt)
      assert(scale === s, s"id=$id")
      assert(sumCode === c.foldLeft(0L)(_ + _), s"id=$id")
      val err = e.zip(c).foldLeft(0.0) { case (a, (x, ci)) =>
        math.max(a, math.abs(x - ci.toDouble * s))
      }
      assert(maxErr === err, s"id=$id")
    }
  }

  test("int8 two-phase recall is near-exact (quantization is near-lossless for search)") {
    import graft.operators.Knn
    val qs = Knn.defaultQueries(emb)
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").cache()
    val nExact = exact.count()
    val got = Quantize.int8TwoPhase(emb, qs, 10, 4)
      .select("query_id", "vec_id")
    val recall = got.intersect(exact).count().toDouble / nExact
    assert(recall >= 0.95, s"int8 recall $recall")
    // exact-rerank scores equal the exact path's scores on the hits
    val scores = Quantize.int8TwoPhase(emb, qs, 10, 4)
      .join(Knn.exactBatch(qs, emb, "ip", 10)
        .withColumnRenamed("score", "exact_score"),
        Seq("query_id", "vec_id"))
    assert(scores.filter(col("score") =!= col("exact_score")).count() === 0)
    exact.unpersist()
  }

  test("zero vectors quantize to scale 0 / zero codes, no NaNs") {
    val z = Seq((1L, Seq(0.0f, 0.0f, 0.0f)), (2L, Seq(1.0f, -2.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = Quantize.int8Stats(z)
      .as[(Long, Double, Long, Double)].collect().sortBy(_._1)
    assert(got(0) === ((1L, 0.0, 0L, 0.0)))
    assert(!got(1)._2.isNaN && got(1)._4 <= got(1)._2 / 2)
    // -2.0 is the max-abs coordinate → its code is exactly -127
    val c2 = Quantize.int8Codes(z).filter(col("vec_id") === 2)
      .select("codes").as[Seq[Int]].head()
    assert(c2(1) === -127)
  }
}
