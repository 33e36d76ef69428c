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

  test("hashId is seed-0 xxhash64: differs from builtin seed-42, stable") {
    val r = Seq("vec-1", "vec-1").toDF("s")
      .select(VectorFunctions.hashId(col("s")).as("h0"),
        xxhash64(col("s")).as("h42"))
      .as[(Long, Long)].collect()
    assert(r(0)._1 === r(1)._1)
    assert(r(0)._1 !== r(0)._2)
  }
}
