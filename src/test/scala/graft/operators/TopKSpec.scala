package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def randomScored(n: Int, groups: Int, tieEvery: Int) = {
    val rnd = new Random(7)
    (0 until n).map { i =>
      val score =
        if (i % tieEvery == 0) 0.5 else rnd.nextDouble() // force ties
      (rnd.nextInt(groups).toLong, i.toLong, score)
    }.toDF("g", "id", "score")
  }

  test("aggregator top-k == window top-k, including ties") {
    val df = randomScored(5000, 7, 10).cache()
    for (k <- Seq(1, 3, 10, 100)) {
      val w = TopK.viaWindow(df, "g", "id", "score", k)
        .select("g", "id", "score").as[(Long, Long, Double)]
        .collect().sortBy(r => (r._1, -r._3, r._2))
      val a = TopK.viaAggregator(df, "g", "id", "score", k)
        .select("g", "id", "score").as[(Long, Long, Double)]
        .collect().sortBy(r => (r._1, -r._3, r._2))
      assert(a.toSeq === w.toSeq, s"k=$k")
    }
  }

  test("k larger than group size returns whole group ranked") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 2.0)).toDF("g", "id", "score")
    val out = TopK.viaAggregator(df, "g", "id", "score", 5)
      .orderBy(desc("score")).as[(Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 11L, 2.0), (1L, 10L, 1.0)))
  }

  test("exact ties broken by id ascending in both strategies") {
    val df = Seq((1L, 5L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0))
      .toDF("g", "id", "score")
    val a = TopK.viaAggregator(df, "g", "id", "score", 2)
      .select("id").as[Long].collect().sorted
    val w = TopK.viaWindow(df, "g", "id", "score", 2)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === Seq(3L, 4L))
    assert(w.toSeq === Seq(3L, 4L))
  }
}
