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

  test("selectTopN == full reference sort, random inputs with ties, both directions") {
    val rnd = new Random(11)
    for (trial <- 0 until 20; asc <- Seq(true, false)) {
      val total = 1 + rnd.nextInt(3000)
      val n = rnd.nextInt(total + 50) // sometimes > total
      // coarse score grid forces plenty of exact ties
      val pairs = Array.tabulate(total)(i =>
        (rnd.nextInt(1000000).toLong, rnd.nextInt(40).toDouble / 7.0))
      val ids = pairs.map(_._1)
      val scores = pairs.map(_._2)
      val want = pairs.toSeq
        .sortBy { case (id, s) => (if (asc) s else -s, id) }
        .take(n).map { case (id, s) => (id, s) }
      val len = TopK.selectTopN(ids, scores, total, n, asc)
      val got = (0 until len).map(i => (ids(i), scores(i)))
      assert(got === want, s"trial=$trial asc=$asc total=$total n=$n")
    }
  }

  test("selectTopN edge cases: n=0, n=total, single element, all-equal scores") {
    assert(TopK.selectTopN(Array.empty[Long], Array.empty[Double],
      0, 5, asc = false) === 0)
    val ids1 = Array(9L); val s1 = Array(1.0)
    assert(TopK.selectTopN(ids1, s1, 1, 0, asc = false) === 0)
    assert(TopK.selectTopN(ids1, s1, 1, 1, asc = false) === 1)
    // all-equal scores: pure id-ascending order
    val ids = Array(5L, 1L, 9L, 3L, 7L)
    val ss = Array.fill(5)(2.0)
    val len = TopK.selectTopN(ids, ss, 5, 3, asc = false)
    assert(len === 3)
    assert(ids.take(3).toSeq === Seq(1L, 3L, 5L))
  }

  test("selectTopN adversarial patterns: pre-sorted both ways, constant, two-value, organ-pipe") {
    // quickselect's classic worst cases — median-of-three must keep the
    // partition balanced and the result identical to the reference sort
    val n = 5000
    val patterns: Seq[(String, Array[Double])] = Seq(
      ("ascending", Array.tabulate(n)(_.toDouble)),
      ("descending", Array.tabulate(n)(i => (n - i).toDouble)),
      ("constant", Array.fill(n)(3.14)),
      ("two-value", Array.tabulate(n)(i => (i % 2).toDouble)),
      ("organ-pipe", Array.tabulate(n)(i => math.min(i, n - i).toDouble)))
    for ((label, scores0) <- patterns; asc <- Seq(true, false);
         want <- Seq(1, 37, 1000, n)) {
      val ids = Array.tabulate(n)(i => ((i * 7919) % n).toLong)
      val scores = scores0.clone()
      val ref = (ids zip scores).toSeq
        .sortBy { case (id, s) => (if (asc) s else -s, id) }.take(want)
      val len = TopK.selectTopN(ids, scores, n, want, asc)
      val got = (0 until len).map(i => (ids(i), scores(i)))
      assert(got === ref, s"$label asc=$asc n=$want")
    }
  }

  test("selectTopN matches Bounded on the same stream (shared contract)") {
    val rnd = new Random(23)
    for (asc <- Seq(true, false)) {
      val total = 2000
      val pairs = Array.tabulate(total)(_ =>
        (rnd.nextInt(100000).toLong, rnd.nextInt(50).toDouble))
      val b = new TopK.Bounded(37, asc)
      pairs.foreach { case (id, s) => b.insert(s, id) }
      val ids = pairs.map(_._1); val scores = pairs.map(_._2)
      val len = TopK.selectTopN(ids, scores, total, 37, asc)
      val got = (0 until len).map(i => (ids(i), scores(i)))
      assert(got === b.result().toSeq, s"asc=$asc")
    }
  }
}
