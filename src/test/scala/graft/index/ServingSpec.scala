package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cents = Ivf.deterministicCentroids(emb, 50)
  private lazy val assigned = Ivf.assign(emb, cents).cache()
  private lazy val cmat = Ivf.collectCentroids(cents)
  private lazy val queries = graft.operators.Knn.defaultQueries(emb)
    .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  private def viaSearchPoint(qv: Array[Float], metric: String, k: Int,
      nprobe: Int): Seq[(Long, Double)] =
    Ivf.searchPoint(assigned, qv, cmat, metric, k, nprobe)
      .as[(Long, Double)].collect().toSeq

  test("serving index matches searchPoint exactly for every metric") {
    for (metric <- Seq("ip", "l2", "cosine")) {
      val idx = ServingIndex.build(assigned, cents, metric)
      for ((_, qv) <- queries.take(4)) {
        val got = idx.search(qv, 10, nprobe = 3).toSeq
        val want = viaSearchPoint(qv, metric, 10, 3)
        assert(got === want, s"metric=$metric")
      }
      idx.unpersist()
    }
  }

  test("probe pick matches searchPoint's probe set and order tie-break") {
    val idx = ServingIndex.build(assigned, cents, "ip")
    for ((_, qv) <- queries.take(4)) {
      // same code path by construction; assert the contract anyway
      assert(idx.probe(qv, 3) === Ivf.probePick(qv, cmat._1, cmat._2, 3))
      assert(idx.probe(qv, 1000).length === cmat._1.length)
    }
    idx.unpersist()
  }

  test("bounded top-k insertion handles ties by id and k larger than list") {
    // 3 vectors with identical scores → tie-break by id ascending
    val tied = Seq(
      (7L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)),
      (5L, Array(1.0f, 0.0f)), (9L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("centroid_id", lit(0L))
    val c = Seq((0L, Seq(0.5, 0.5))).toDF("cid", "cv")
    val idx = ServingIndex.build(tied, c, "ip")
    val got = idx.search(Array(1.0f, 0.0f), 10, 1)
    assert(got.map(_._1).toSeq === Seq(3L, 5L, 7L, 9L))
    assert(got.take(3).forall(_._2 === 1.0))
    // k smaller than the list truncates after tie-break
    assert(idx.search(Array(1.0f, 0.0f), 2, 1).map(_._1).toSeq
      === Seq(3L, 5L))
    idx.unpersist()
  }

  test("searchAllDF equals the knn_point union across the battery queries") {
    val idx = ServingIndex.build(assigned, cents, "ip")
    val reqs = queries.sortBy(_._1).take(10).toSeq
    val got = idx.searchAllDF(spark, reqs, 10, 3)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, -r._3, r._2))
    val want = reqs.flatMap { case (qid, qv) =>
      viaSearchPoint(qv, "ip", 10, 3).map { case (id, s) => (qid, id, s) }
    }.sortBy(r => (r._1, -r._3, r._2)).toArray
    assert(got === want)
    idx.unpersist()
  }

  test("filtered serving matches searchPoint under tenant/tags/sample predicates") {
    import graft.ingest.VectorEntries
    val entries = Ivf.assign(VectorEntries.fromEmbeddings(emb), cents).cache()
    val idx = ServingIndex.build(entries, cents, "ip",
      tenantCol = Some("tenant"), tagsCol = Some("tags"))
    def viaPoint(qv: Array[Float], f: org.apache.spark.sql.Column) =
      Ivf.searchPoint(entries, qv, cmat, "ip", 10, 3, filter = f)
        .as[(Long, Double)].collect().toSeq
    for ((_, qv) <- queries.take(3)) {
      // tenant + tags (the composite QueryRequest gate)
      assert(idx.search(qv, 10, 3, ServingFilter(tenant = Some("t1"),
          tagsAny = Some(Seq(3L, 11L)))).toSeq
        === viaPoint(qv, col("tenant") === "t1" &&
          VectorEntries.tagsAny(Seq(3, 11))))
      // sample_p gate
      assert(idx.search(qv, 10, 3, ServingFilter(sampleP = Some(25))).toSeq
        === viaPoint(qv, graft.operators.Knn.sampleFilter(25)))
      // no filter → same as unfiltered
      assert(idx.search(qv, 10, 3, ServingFilter.none).toSeq
        === viaPoint(qv, lit(true)))
    }
    idx.unpersist(); entries.unpersist()
  }

  test("overlay: buffered upserts shadow stored rows, deletes mask, inserts appear") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-serving-overlay-").toString
    try {
      import graft.segments.Segments
      // stored tier: ids 1..3 pointing along x
      val stored = Seq(
        (1L, 11L, 100L, false, 0L, Seq(1.0, 0.0)),
        (2L, 12L, 100L, false, 0L, Seq(0.9, 0.1)),
        (3L, 13L, 100L, false, 0L, Seq(0.8, 0.2)))
        .toDF("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
      Segments.writeSegment(stored, dir, "delta-000", isStable = false)
      val c = Seq((0L, Seq(0.5, 0.5))).toDF("cid", "cv")
      val idx = ServingIndex.buildStored(spark, dir, c, "ip")
      // buffer: id 1 re-upserted with a WORSE vector (must shadow the
      // stored one), id 2 deleted (must vanish), id 9 newly inserted
      val buffer = Seq(
        (1L, 11L, 200L, false, 0L, Seq(0.0, 1.0)),
        (2L, 12L, 200L, true, 0L, null.asInstanceOf[Seq[Double]]),
        (9L, 19L, 200L, false, 0L, Seq(1.0, 0.0)))
        .toDF("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
      val overlay = ServingOverlay.fromDataFrame(buffer)
      val got = idx.searchWithOverlay(Array(1.0f, 0.0f), 10, 1, overlay)
      // id 9 (buffer insert, score 1.0) first; id 3 stored 0.8; id 1's
      // BUFFERED version scores 0.0 (not the stored 1.0); id 2 gone
      assert(got.map(_._1).toSeq === Seq(9L, 3L, 1L))
      assert(got.head._2 === 1.0)
      assert(got.find(_._1 == 1L).get._2 === 0.0)
      // same request without the overlay sees the stored world
      val plain = idx.search(Array(1.0f, 0.0f), 10, 1)
      assert(plain.map(_._1).toSeq === Seq(1L, 2L, 3L))
      idx.unpersist()
    } finally graft.segments.Segments.deleteDir(dir)
  }

  test("overlay fuzz: random flush/buffer splits match the live-set brute force") {
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft-overlay-fuzz-").toString
    import graft.segments.Segments
    val log = graft.ingest.MutationLog.deterministicLog(emb)
    val entries = Ivf.assign(
        log.withColumn("id_hash",
            graft.functions.VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
      .cache()
    val all = entries.collect().map(r => (r.getLong(0), r.getLong(2),
      r.getBoolean(3), r.getLong(4),
      if (r.isNullAt(5)) null else r.getSeq[Double](5).toArray))
    def dotFD(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7)
      // random epoch cut: older rows flushed, newer rows still buffered
      val cut = 1500 + rnd.nextInt(2000)
      val dir = s"$dir0/t$seed"
      Segments.writeSegment(entries.filter(col("epoch") < cut), dir,
        "delta-000", isStable = false)
      val idx = ServingIndex.buildStored(spark, dir, cents, "ip")
      val overlay = ServingOverlay.fromDataFrame(
        entries.filter(col("epoch") >= cut))
      val k = 5 + rnd.nextInt(20)
      val (qid, qv) = queries(rnd.nextInt(queries.length))
      val got = idx.searchWithOverlay(qv, k, Int.MaxValue, overlay).toSeq
      // brute force: LWW per id over the WHOLE log, live only
      val live = all.groupBy(_._1).values.map(_.maxBy(_._2))
        .filter(v => !v._3 && v._5 != null)
      val expect = live.map(v => (v._1, dotFD(qv, v._5)))
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
      assert(got === expect, s"seed=$seed cut=$cut k=$k q=$qid")
      idx.unpersist()
    }
    entries.unpersist()
    graft.segments.Segments.deleteDir(dir0)
  }

  test("rebuild -> refresh: serving index follows the re-clustered layout end to end") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-serving-rebuild-").toString
    try {
      import graft.segments.Segments
      val log = graft.ingest.MutationLog.deterministicLog(emb)
      val entries = Ivf.assign(
          log.withColumn("id_hash",
              graft.functions.VectorFunctions.hashId(col("id")))
            .withColumn("deleted", col("op") === "DELETE"),
          cents, vecCol = "vec")
        .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
        .select("vec_id", "id_hash", "epoch", "deleted", "centroid_id",
          "vec")
      Segments.writeSegment(entries, dir, "delta-000", isStable = false)
      val idxBefore = ServingIndex.buildStored(spark, dir, cents, "ip")
      val qv = queries.head._2
      val before = idxBefore.search(qv, 10, nprobe = 1000).toSeq
      idxBefore.unpersist()
      // the 24 h job: re-cluster under a finer centroid set, then refresh
      val cents25 = Ivf.deterministicCentroids(emb, 25)
      Segments.rebuildLayout(spark, dir,
        df => Ivf.assign(df, cents25, vecCol = "vec"), "stable-gen2")
      val idxAfter = ServingIndex.buildStored(spark, dir, cents25, "ip")
      // full-probe results are layout-independent: same live rows, same
      // scores — the layout only changes WHICH lists hold them
      val after = idxAfter.search(qv, 10, nprobe = 1000).toSeq
      assert(after === before)
      // the refreshed index really is on the finer layout: more lists,
      // and a partial probe touches smaller lists than before
      assert(idxAfter.cids.length > cents.count())
      idxAfter.unpersist()
    } finally graft.segments.Segments.deleteDir(dir)
  }

  test("buildStored serves latest-live versions only") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-serving-stored-").toString
    try {
      import graft.segments.Segments
      val log = graft.ingest.MutationLog.deterministicLog(emb)
      val entries = Ivf.assign(
        log.withColumn("id_hash",
            graft.functions.VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
        .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      Segments.writeSegment(entries, dir, "delta-000", isStable = false)
      val idx = ServingIndex.buildStored(spark, dir, cents, "ip")
      // authority: the tiered read path (LWW + tombstone mask) at high k
      val stored = Segments.readSegments(spark, dir)
      val live = graft.operators.Lww.latestBy(
          stored.select(col("id_hash"), col("epoch"), col("deleted"),
            col("vec_id")),
          "id_hash", "epoch")
        .filter(!col("deleted"))
      val qv = queries.head._2
      val got = idx.search(qv, 50, nprobe = 1000).map(_._1).toSet
      val liveIds = live.select("vec_id").as[Long].collect().toSet
      assert(got.subsetOf(liveIds))
      assert(got.nonEmpty)
      idx.unpersist()
    } finally graft.segments.Segments.deleteDir(dir)
  }
}
