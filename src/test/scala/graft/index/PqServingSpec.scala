package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed PQ serving tier: bit-identity with the driver tier (the
  * two must be interchangeable cache levels of the same contract) and
  * with the declarative ADC path, at shallow AND deep fetch.
  */
class PqServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cents = Ivf.deterministicCentroids(emb, 50)
  private lazy val cb = Pq.deterministicCodebook(emb, 8, 8, 50)
  private lazy val codes = Ivf.assign(emb, cents).select(col("vec_id"),
    col("centroid_id"), Pq.codesColumn(cb).as("codes")).cache()
  private lazy val queries = graft.operators.Knn.defaultQueries(emb).cache()
  private lazy val qRows = queries.collect()
    .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
  private lazy val nlist = cents.count().toInt
  private lazy val wide =
    ServingLimits(maxK = 4096, maxCandidates = 100000)

  test("distributed ADC == driver-tier ADC, shallow and deep fetch, probed and probe-all") {
    val dist = PqServingIndex.build(codes, cents, cb, wide)
    val local = LocalPqIndex.build(codes, cents, cb, limits = wide)
    try {
      assert(dist.cachedLists === nlist)
      qRows.take(5).foreach { case (qid, qv) =>
        for ((k, np) <- Seq((20, 3), (20, nlist), (300, 4), (300, nlist))) {
          val d = dist.searchAdc(qv, k, np).toSeq
          val l = local.searchAdc(qv, k, np).toSeq
          assert(d === l, s"q=$qid k=$k nprobe=$np")
        }
      }
    } finally dist.unpersist()
  }

  test("probe pruning schedules only the probed lists' partitions (values equal the restricted declarative path)") {
    val dist = PqServingIndex.build(codes, cents, cb, wide)
    try {
      qRows.take(3).foreach { case (qid, qv) =>
        val probed = dist.probe(qv, 4)
        val restricted = codes
          .filter(col("centroid_id").isin(probed: _*))
          .select("vec_id", "codes")
        val oneQ = queries.filter(col("query_id") === qid)
        val want = graft.operators.TopK.viaAggregator(
            Pq.adcScores(restricted, cb, oneQ),
            "query_id", "vec_id", "approx_score", 10)
          .collect().map(r => (r.getLong(1), r.getDouble(2)))
          .sortBy { case (id, s) => (-s, id) }.toSeq
        assert(dist.searchAdc(qv, 10, 4).toSeq === want, s"q=$qid")
      }
    } finally dist.unpersist()
  }

  test("buildFromPacked (range-read of the packed tier file) serves identically to the shuffle build; stamp mismatch refuses") {
    val local = LocalPqIndex.build(codes, cents, cb, limits = wide)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pqsrv-").toString
    val path = s"$dir/tier.bin"
    val stamp = "v1 test-stamp"
    LocalPqIndex.savePacked(local, path, stamp)
    val fromFile = PqServingIndex.buildFromPacked(spark, path, stamp,
      cents, cb, wide)
    assert(fromFile.isDefined, "valid file must load")
    val shuffled = PqServingIndex.build(codes, cents, cb, wide)
    try {
      qRows.take(4).foreach { case (qid, qv) =>
        for ((k, np) <- Seq((20, 3), (300, nlist))) {
          assert(fromFile.get.searchAdc(qv, k, np).toSeq ===
            shuffled.searchAdc(qv, k, np).toSeq, s"q=$qid k=$k np=$np")
        }
      }
      assert(PqServingIndex.buildFromPacked(spark, path, "other stamp",
        cents, cb, wide).isEmpty, "stamp mismatch must refuse")
    } finally { fromFile.foreach(_.unpersist()); shuffled.unpersist() }
  }

  test("fuzz: random (k, nprobe) draws — distributed == driver tier on every one") {
    // spans both ranking regimes (k crosses the 256 quickselect switch)
    // and every probe width; the two cache levels must be
    // interchangeable on inputs nobody hand-picked
    val dist = PqServingIndex.build(codes, cents, cb, wide)
    val local = LocalPqIndex.build(codes, cents, cb, limits = wide)
    val rnd = new scala.util.Random(77)
    try {
      (0 until 30).foreach { i =>
        val (qid, qv) = qRows(rnd.nextInt(qRows.length))
        val k = 1 + rnd.nextInt(600)
        val np = 1 + rnd.nextInt(nlist)
        assert(dist.searchAdc(qv, k, np).toSeq ===
          local.searchAdc(qv, k, np).toSeq, s"draw=$i q=$qid k=$k np=$np")
      }
    } finally dist.unpersist()
  }

  test("binary byte-packed codes build identically to array<int> codes") {
    val binCodes = Ivf.assign(emb, cents).select(col("vec_id"),
      col("centroid_id"), Pq.codesBinaryColumn(cb).as("codes"))
    val distBin = PqServingIndex.build(binCodes, cents, cb, wide)
    val distInt = PqServingIndex.build(codes, cents, cb, wide)
    try {
      qRows.take(3).foreach { case (qid, qv) =>
        assert(distBin.searchAdc(qv, 20, 5).toSeq ===
          distInt.searchAdc(qv, 20, 5).toSeq, s"q=$qid")
      }
    } finally { distBin.unpersist(); distInt.unpersist() }
  }
}
