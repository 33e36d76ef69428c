package graft.functions

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df2(a: Seq[Double], b: Seq[Double]) =
    Seq((a, b)).toDF("a", "b")

  test("dotD matches sequential scalar sum") {
    val a = Seq(1.0, 2.0, 3.0); val b = Seq(4.0, 5.0, 6.0)
    val got = df2(a, b)
      .select(VectorFunctions.dotD(col("a"), col("b"))).as[Double].head()
    assert(got === 32.0)
  }

  test("l2SqD matches sequential scalar sum") {
    val got = df2(Seq(1.0, 2.0), Seq(4.0, 6.0))
      .select(VectorFunctions.l2SqD(col("a"), col("b"))).as[Double].head()
    assert(got === 25.0)
  }

  test("dot/l2 expanded-form identity holds to float tolerance") {
    val rows = emb.limit(50)
      .select(col("embedding").cast("array<double>").as("a"))
      .crossJoin(emb.limit(5)
        .select(col("embedding").cast("array<double>").as("b")))
    val deltas = rows.select(
      abs(VectorFunctions.l2SqD(col("a"), col("b")) -
        VectorFunctions.l2SqExpanded(col("a"), col("b"))).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(deltas < 1e-9)
  }

  test("dimension mismatch throws, not truncates") {
    val ex = intercept[Throwable] {
      df2(Seq(1.0, 2.0, 3.0), Seq(1.0))
        .select(VectorFunctions.dotD(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("dimensions differ")), ex.toString)
  }

  test("l2Normalize produces unit vectors") {
    val n = emb.limit(20)
      .select(VectorFunctions.l2Norm(
        VectorFunctions.l2Normalize(col("embedding"))).as("n"))
      .agg(max(abs(col("n") - 1.0))).as[Double].head()
    assert(n < 1e-12)
  }

  test("float inputs read in place are bit-identical to cast-to-double") {
    import graft.functions.expr.IndexExpressions
    val f = emb.limit(100).select(col("vec_id"), col("embedding").as("v"))
    val d = f.select(col("vec_id"), col("v").cast("array<double>").as("v"))
    val q = emb.limit(1).select(col("embedding")).head().getSeq[Float](0)
    val qd = lit(q.map(_.toDouble).toArray)
    def scores(src: org.apache.spark.sql.DataFrame) = src.select(
      col("vec_id"),
      VectorFunctions.dotD(col("v"), qd).as("dot"),
      VectorFunctions.l2SqD(col("v"), qd).as("l2"))
      .orderBy("vec_id").as[(Long, Double, Double)].collect()
    assert(scores(f) === scores(d))

    val mat = Array(q.map(_.toDouble * 0.5).toArray, q.map(_.toDouble).toArray)
    def nm(src: org.apache.spark.sql.DataFrame) = src.select(
      col("vec_id"),
      IndexExpressions.nearestIndex(col("v"), mat).as("ni"),
      IndexExpressions.matVec(col("v"), mat).as("mv"))
      .orderBy("vec_id").as[(Long, Int, Seq[Double])].collect()
    assert(nm(f) === nm(d))
  }

  test("nearestIndex interleaved kernel matches a naive argmin, incl. ties") {
    import graft.functions.expr.IndexExpressions
    val rnd = new scala.util.Random(1234)
    // centroid counts straddling the 4-way interleave boundary (remainder
    // 0..3) plus a tiny set below one full interleave block
    for (nlist <- Seq(1, 3, 4, 5, 6, 7, 8, 9, 31); dim <- Seq(1, 7, 16)) {
      val mat = Array.fill(nlist)(Array.fill(dim)(rnd.nextGaussian()))
      // force exact ties: duplicate some centroids verbatim — the argmin
      // must keep the LOWEST index (strict-< contract)
      if (nlist >= 4) { mat(nlist - 1) = mat(1).clone(); mat(2) = mat(0).clone() }
      val rows = (0 until 64).map(i =>
        (i.toLong,
          if (i < nlist) mat(i).toSeq // exact centroid hits (d = 0 ties)
          else Seq.fill(dim)(rnd.nextGaussian())))
      val df = rows.toDF("vec_id", "v")
      def naive(v: Seq[Double]): Int = {
        var best = -1; var bestD = Double.PositiveInfinity
        for (c <- 0 until nlist) {
          var vv = 0.0; var vc = 0.0; var cc = 0.0
          for (i <- 0 until dim) {
            vv += v(i) * v(i); vc += v(i) * mat(c)(i)
            cc += mat(c)(i) * mat(c)(i)
          }
          val d = vv - 2 * vc + cc
          if (d < bestD) { bestD = d; best = c }
        }
        best
      }
      val got = df.select(col("vec_id"),
          IndexExpressions.nearestIndex(col("v"), mat).as("ni"))
        .orderBy("vec_id").as[(Long, Int)].collect()
      rows.zip(got).foreach { case ((id, v), (gid, ni)) =>
        assert(id === gid)
        assert(ni === naive(v), s"nlist=$nlist dim=$dim vec_id=$id")
      }
    }
  }

  test("hashId is seed-0 xxhash64: differs from builtin seed-42, stable") {
    val r = Seq("vec-1", "vec-1").toDF("s")
      .select(VectorFunctions.hashId(col("s")).as("h0"),
        xxhash64(col("s")).as("h42"))
      .as[(Long, Long)].collect()
    assert(r(0)._1 === r(1)._1)
    assert(r(0)._1 !== r(0)._2)
  }
}
