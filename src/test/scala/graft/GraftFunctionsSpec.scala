package graft

import org.apache.spark.sql.functions._

/** The SQL function surface: every registered `graft_*` function must run
  * the same native kernel as its DataFrame/Column twin (value parity
  * checked here), and the config-time [[GraftExtensions]] must inject the
  * identical builders.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("graft_dot / graft_l2sq: SQL runs the codegen kernels, values match the Column API") {
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
      .toDF("a", "b").createOrReplaceTempView("gf_v")
    val r = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_l2sq(a, b) AS l FROM gf_v")
      .as[(Double, Double)].head()
    assert(r === ((32.0, 27.0)))
    // float arrays are read in place too (no cast requirement)
    Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("gf_vf")
    assert(spark.sql("SELECT graft_dot(a, b) FROM gf_vf")
      .as[Double].head() === 11.0)
  }

  test("graft_xxhash64_0 is seed-0 (reference hash), not the builtin's seed 42") {
    val df = Seq("vec-1", "vec-2").toDF("id")
    df.createOrReplaceTempView("gf_ids")
    val sql = spark.sql(
      "SELECT graft_xxhash64_0(id) AS h, xxhash64(id) AS h42 FROM gf_ids")
      .as[(Long, Long)].collect()
    val twin = df.select(
      graft.functions.expr.VectorExpressions.xxhash64Seed(0L, col("id")))
      .as[Long].collect()
    assert(sql.map(_._1).toSeq === twin.toSeq)
    assert(sql.forall { case (h0, h42) => h0 != h42 })
  }

  test("sketch functions (md5hash28, sorted_intersect_count, minhash, simhash) match Column twins") {
    val df = Seq(("alpha", Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("s", "ta", "tb")
    df.createOrReplaceTempView("gf_sk")
    val sql = spark.sql(
      """SELECT graft_md5hash28(s) AS h,
        |  graft_sorted_intersect_count(ta, tb) AS ic,
        |  graft_minhash_sigs(transform(ta, x -> graft_md5hash28(x)), 16)
        |    AS mh,
        |  graft_simhash(transform(ta, x -> graft_md5hash28(x)), 28) AS sh
        |FROM gf_sk""".stripMargin)
      .as[(Long, Int, Seq[Long], Long)].head()
    val e = graft.functions.expr.SketchExpressions
    val th = transform(col("ta"), x => e.md5Hash28(x))
    val tw = df.select(e.md5Hash28(col("s")),
        e.sortedIntersectCount(col("ta"), col("tb")),
        e.minhashSigs(th, 16),
        e.simhashSig(th, 28))
      .as[(Long, Int, Seq[Long], Long)].head()
    assert(sql === tw)
  }

  test("graft_pq_adc: SQL LUT sum equals the Column API") {
    val df = Seq((Seq(1, 0), Seq(Seq(10.0, 20.0), Seq(30.0, 40.0))))
      .toDF("codes", "lut")
    df.createOrReplaceTempView("gf_pq")
    assert(spark.sql("SELECT graft_pq_adc(codes, lut) FROM gf_pq")
      .as[Double].head() === 50.0) // lut[0][1] + lut[1][0]
  }

  test("graft_topk aggregate in GROUP BY equals TopK.viaAggregator") {
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.8), (1L, 13L, 0.7),
      (2L, 20L, 0.5), (2L, 21L, 0.6))
      .toDF("g", "id", "score")
    scored.createOrReplaceTempView("gf_topk")
    val sql = spark.sql(
      """SELECT g, s.id, s.score
        |FROM (SELECT g, graft_topk(id, score, 2) AS tk
        |      FROM gf_topk GROUP BY g)
        |LATERAL VIEW explode(tk) AS s""".stripMargin)
      .as[(Long, Long, Double)].collect().toSet
    val api = operators.TopK.viaAggregator(scored, "g", "id", "score", 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(sql === api)
    assert(sql === Set((1L, 10L, 0.9), (1L, 12L, 0.8), (2L, 21L, 0.6),
      (2L, 20L, 0.5)))
  }

  test("udf-backed functions: crc32c parity, uuid_v7 format") {
    Seq("graft wal frame").toDF("s").createOrReplaceTempView("gf_u")
    val sqlCrc = spark.sql(
      "SELECT graft_crc32c(CAST(s AS BINARY)) FROM gf_u").as[Long].head()
    val colCrc = Seq("graft wal frame").toDF("s")
      .select(graft.functions.IdFunctions.crc32c(col("s").cast("binary")))
      .as[Long].head()
    assert(sqlCrc === colCrc)
    val uuid = spark.sql("SELECT graft_uuid_v7()").as[String].head()
    assert(uuid.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }

  test("non-literal or wrong-arity arguments fail analysis with a clear message") {
    Seq((Seq("a"), 3)).toDF("ta", "n").createOrReplaceTempView("gf_bad")
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_minhash_sigs(ta, n) FROM gf_bad").collect())
    assert(e1.getMessage.contains("literal INT"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_dot(ta) FROM gf_bad").collect())
    assert(e2.getMessage.contains("2 arguments"))
  }

  test("GraftExtensions injects every builder without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // same builder list as register()
    assert(GraftFunctions.injections.map(_._1.funcName).toSet.size ===
      GraftFunctions.builders.size)
  }
}
