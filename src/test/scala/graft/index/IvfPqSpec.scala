package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Knn

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("nearestIndex assignment equals brute-force argmin") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    val assigned = Ivf.assign(emb, cents)
      .select("vec_id", "centroid_id").as[(Long, Long)]
      .collect().toMap
    // brute force on the driver
    val cm = cents.select(col("cid"), col("cv"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]) = {
      val vv = a.zip(a).map { case (x, y) => x * y }.sum
      val vc = a.zip(b).map { case (x, y) => x * y }.sum
      val cc = b.zip(b).map { case (x, y) => x * y }.sum
      vv - 2 * vc + cc
    }
    vecs.foreach { case (id, v) =>
      val expect = cm.minBy { case (cid, cv) => (l2(v, cv), cid) }._1
      assert(assigned(id) === expect, s"vec $id")
    }
  }

  test("two-level quantizer: assignment IS the exact flat argmin; probe-all search over its layout is exact") {
    val tl = Ivf.trainTwoLevel(emb, k1 = 4, k2 = 4)
    assert(tl.nlist === 16)
    val flat = tl.flatCentroids(spark)
    assert(flat.count() === 16)
    val assigned = Ivf.assignTwoLevelBulk(emb, tl)
    val got = assigned.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Long)].collect().toMap
    // the triangle-pruned hierarchical kernel must equal the brute
    // flat argmin over ALL k1·k2 children (driver recompute) — probing
    // ranks lists flat, so any assignment/probe disagreement turns
    // into silent recall loss (the r8 100M self-recall find)
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val flatAll = for {
      c1 <- tl.fine.indices; c2 <- tl.fine(c1).indices
    } yield (c1.toLong * 4 + c2, tl.fine(c1)(c2))
    vecs.take(100).foreach { case (id, v) =>
      val want = flatAll.minBy { case (cid, cv) => (l2(v, cv), cid) }._1
      assert(got(id) === want, s"vec $id")
    }
    // cid domain
    assert(got.values.forall(c => c >= 0 && c < 16))
    // probe-ALL over the two-level layout is EXACT: assignment places
    // rows, probing ranks all lists, so approximation in the hierarchy
    // cannot lose a row when every list is probed
    val qs = graft.operators.Knn.defaultQueries(emb).limit(5)
    val viaLayout = Ivf.search(assigned, qs, flat, "ip", 10, nprobe = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = graft.operators.Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(viaLayout === exact)
    // null vector → null cid (tombstone convention of assign/assignBulk)
    val withNull = emb.limit(3)
      .withColumn("embedding",
        when(col("vec_id") % 3 === 0,
          lit(null).cast("array<float>")).otherwise(col("embedding")))
    val nulls = Ivf.assignTwoLevelBulk(withNull, tl)
      .filter(col("embedding").isNull)
    assert(nulls.count() > 0 &&
      nulls.filter(col("centroid_id").isNotNull).count() === 0)
  }

  test("assignBulk is bit-identical to the codegen assign (float and double, nulls)") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    // float source with injected nulls, odd row counts vs the 256 chunk
    val src = emb.withColumn("embedding",
      when(col("vec_id") % 97 === 0, lit(null)).otherwise(col("embedding")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("centroid_id"))
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(pairs(Ivf.assignBulk(src, cents)) === pairs(Ivf.assign(src, cents)))
    // double source (segment-style vec columns take this path)
    val srcD = src.withColumn("embedding",
      col("embedding").cast("array<double>"))
    assert(pairs(Ivf.assignBulk(srcD, cents)) === pairs(Ivf.assign(srcD, cents)))
    // non-vec columns pass through untouched and the schema gains only
    // centroid_id
    val out = Ivf.assignBulk(emb, cents)
    assert(out.columns.toSeq === emb.columns.toSeq :+ "centroid_id")
    assert(out.select("vec_id").as[Long].collect().sorted ===
      emb.select("vec_id").as[Long].collect().sorted)
  }

  test("assignBulkGemm (the r9 bulk/rebuild path) assigns identically to the codegen assign") {
    // GEMM dots differ from the codegen kernel only in FP summation
    // order — assignment-level equality is the contract (distances are
    // equal to rounding, not bit-identical like assignBulk's)
    val cents = Ivf.deterministicCentroids(emb, 50)
    val src = emb.withColumn("embedding",
      when(col("vec_id") % 97 === 0, lit(null)).otherwise(col("embedding")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("centroid_id"))
        .as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(pairs(Ivf.assignBulkGemm(src, cents)) ===
      pairs(Ivf.assign(src, cents)))
    // non-dense cids must map back through the caller's id space
    val sparseCents = cents.withColumn("cid", col("cid") * 7 + 3)
    assert(pairs(Ivf.assignBulkGemm(src, sparseCents)) ===
      pairs(Ivf.assign(src, sparseCents)))
  }

  test("reference-scale dims: assignment and PQ encode correct at dim 768 / m=96") {
    // synthesized corpus at the reference's dimensionality (config.h:19) —
    // the bench measures throughput here; this gates correctness
    val d = 768
    val n = 120
    val gen = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(d - 1)),
        t => (pmod(xxhash64(col("id"), t), lit(1000L)).cast("double")
          / 500.0 - 1.0).cast("float")).as("embedding"))
    val cents = gen.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
    val assigned = Ivf.assign(gen, cents)
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val cm = cents.as[(Long, Seq[Double])].collect().sortBy(_._1)
    val vecs = gen.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (id, v) =>
      val expect = cm.minBy { case (cid, cv) => (l2(v, cv), cid) }._1
      assert(assigned(id) === expect, s"vec $id")
    }
    // PQ m=96: every code a valid index, reconstruction beats random
    val cb = Pq.deterministicCodebook(gen, 96, 8, 10)
    val codes = Pq.encode(gen, cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes.length === n)
    codes.foreach { case (_, cs) =>
      assert(cs.length === 96)
      assert(cs.forall(c => c >= 0 && c < cb.codeIds.length))
    }
    // every vector that IS a codeword row must encode to itself exactly
    val selfIds = cb.codeIds.toSet
    val codeIdx = cb.codeIds.zipWithIndex.toMap
    codes.filter(c => selfIds(c._1)).foreach { case (id, cs) =>
      assert(cs.forall(_ == codeIdx(id)), s"codeword row $id")
    }
  }

  test("searchPoint serving path equals the batch IVF search per query") {
    val cents = Ivf.deterministicCentroids(emb, 50)
    val assigned = Ivf.assign(emb, cents)
    val cmat = Ivf.collectCentroids(cents)
    val qs = Knn.defaultQueries(emb)
    for (metric <- Seq("ip", "l2")) {
      val batch = Ivf.search(assigned, qs, cents, metric, 5, nprobe = 3)
        .select("query_id", "vec_id", "score")
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
      qs.select(col("query_id"), col("qv")).as[(Long, Seq[Float])]
        .collect().foreach { case (qid, qv) =>
          val point = Ivf.searchPoint(assigned, qv.toArray, cmat, metric, 5,
              nprobe = 3)
            .as[(Long, Double)].collect().sortBy(_._1).toSeq
          assert(point === batch(qid), s"metric=$metric query=$qid")
        }
    }
  }

  test("two-phase PQ search hits decent recall vs exact on sf0.001") {
    val qs = Knn.defaultQueries(emb)
    val cb = Pq.deterministicCodebook(emb, 8, 8, 50)
    val approx = Pq.twoPhaseSearch(emb, Pq.encode(emb, cb), cb, qs, 10, 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall > 0.3, s"recall $recall") // toy codebook: sanity bound
  }

  test("kmeans-trained IVF reaches higher recall than nprobe fraction") {
    val qs = Knn.defaultQueries(emb)
    val model = Ivf.trainKMeans(emb, nlist = 16, maxIter = 5)
    val cents = Ivf.kmeansCentroids(spark, model)
    val assigned = Ivf.assign(emb, cents)
    val ivf = Ivf.search(assigned, qs, cents, "ip", 10, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Knn.exactBatch(qs, emb, "ip", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    // scanning 4/16 of the data blindly would give ~0.25; the index must beat it
    assert(recall > 0.5, s"recall $recall")
  }

  test("PQ codes are valid indices and encode respects tie-break") {
    val cb = Pq.deterministicCodebook(emb, 8, 8, 50)
    val k = cb.codeIds.length
    val bad = Pq.encode(emb, cb)
      .select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= k).count()
    assert(bad === 0)
  }
}
