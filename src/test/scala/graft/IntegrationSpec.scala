package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.Ivf
import graft.ingest.MutationLog
import graft.operators.{Knn, TieredScan, TopK}
import graft.segments.Segments
import graft.streaming.IngestPipeline

/** The full reference lifecycle in one flow — what "a user of the
  * reference could switch" means concretely: stream mutations in, flush
  * delta segments, compact to a stable IVF-layout segment, then run a
  * filtered tiered top-k query whose answer matches the logical oracle.
  */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("every registered query is oracle-gated or explicitly exempted") {
    // the correctness gate only bites for queries with an oracle — this
    // guards against silently registering un-gated queries. The one
    // exemption is by design: xxhash64 is not expressible in DuckDB and
    // the md5 twin (dedup_minhash) carries the hash gate.
    val exempt = Set("dedup_minhash_prod")
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert((queries -- oracles) === exempt,
      s"un-gated queries: ${(queries -- oracles -- exempt).toSeq.sorted}")
    assert((oracles -- queries).isEmpty,
      s"orphan oracles: ${(oracles -- queries).toSeq.sorted}")
  }

  test("ingest → flush → compact → tiered filtered KNN, end to end") {
    val src = java.nio.file.Files.createTempDirectory("graft-e2e-src-").toString
    val base = java.nio.file.Files.createTempDirectory("graft-e2e-base-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-ckpt-").toString

    val cents = Ivf.deterministicCentroids(emb, 50)
    val rows = Ivf.assign(
        MutationLog.deterministicLog(emb)
          .withColumn("id_hash", VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("op", "vec_id", "id", "id_hash", "epoch", "deleted",
        "centroid_id", "vec").cache()

    // 1. stream in two waves (insert; then upsert+delete), restart between
    rows.filter(col("epoch") < 2000).coalesce(1).write.mode("append").parquet(src)
    IngestPipeline.runOnce(spark, src, base, ckpt)
    rows.filter(col("epoch") >= 2000).coalesce(1).write.mode("append").parquet(src)
    IngestPipeline.runOnce(spark, src, base, ckpt)

    // 2. compact deltas → one stable IVF-partitioned segment
    Segments.compact(spark, base, "stable-000")
    val stable = Segments.readSegments(spark, base, Some(true))
    assert(stable.count() === 450)

    // 3. query: tiered live view (stable only now) + filtered top-k
    val live = TieredScan.liveView(Seq(stable))
    val queries = Knn.defaultQueries(emb)
    val scored = live.filter(col("vec_id") % 3 === 0) // tenant-style filter
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.dotD(col("qv"), col("vec")).as("score"))
    val got = TopK.viaAggregator(scored, "query_id", "vec_id", "score", 5)
      .as[(Long, Long, Double)].collect().toSet

    // oracle: same query straight off the logical mutation log
    val oracleLive = MutationLog.live(MutationLog.deterministicLog(emb))
    val oracleScored = oracleLive.filter(col("vec_id") % 3 === 0)
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        VectorFunctions.dotD(col("qv"), col("vec")).as("score"))
    val expect = TopK.viaWindow(oracleScored, "query_id", "vec_id", "score", 5)
      .as[(Long, Long, Double)].collect().toSet

    assert(got === expect)

    // 4. the stored-layout IVF entry point returns top-k from the pruned
    // partitions only, consistent with a full-scan restriction to the
    // same probe set
    val ivfGot = Ivf.searchStored(spark, base, queries, cents, "ip", 5,
        nprobe = 3)
      .as[(Long, Long, Double)].collect().toSet
    val probeCids = Ivf.probes(queries, cents, 3)
      .select("query_id", "centroid_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val assignedLive = Ivf.assign(
      MutationLog.live(MutationLog.deterministicLog(emb)), cents,
      vecCol = "vec")
    val restricted = assignedLive
      .crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), col("centroid_id"),
        VectorFunctions.dotD(col("qv"), col("vec")).as("score"))
      .as[(Long, Long, Long, Double)].collect()
      .filter { case (q, _, cid, _) => probeCids(q).contains(cid) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(5)
      }
      .map(r => (r._1, r._2, r._4)).toSet
    assert(ivfGot === restricted)
    Seq(src, base, ckpt).foreach(Segments.deleteDir)
  }

  test("searchStored masks stale versions and tombstones on an un-compacted store") {
    val base = java.nio.file.Files.createTempDirectory("graft-mask-").toString
    val cents = Ivf.deterministicCentroids(emb, 50)
    val rows = Ivf.assign(
        MutationLog.deterministicLog(emb)
          .withColumn("id_hash", VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("vec_id", "id_hash", "epoch", "deleted", "centroid_id", "vec")
    // two deltas, NOT compacted: stale inserts + tombstones still on disk
    Segments.writeSegment(rows.filter(col("epoch") < 2000), base, "d0", false)
    Segments.writeSegment(rows.filter(col("epoch") >= 2000), base, "d1", false)

    val queries = Knn.defaultQueries(emb)
    val got = Ivf.searchStored(spark, base, queries, cents, "ip", 10,
        nprobe = 10) // all lists → equals exact over the live set
      .as[(Long, Long, Double)].collect().toSet
    val live = MutationLog.live(MutationLog.deterministicLog(emb))
      .select(col("vec_id").as("vid"), col("vec"))
    val expect = TopK.viaWindow(
        live.crossJoin(broadcast(queries))
          .select(col("query_id"), col("vid").as("vec_id"),
            VectorFunctions.dotD(col("qv"), col("vec")).as("score")),
        "query_id", "vec_id", "score", 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expect)
    // deleted ids (vec_id % 10 == 0) never surface
    assert(!got.exists(_._2 % 10 == 0))
    Segments.deleteDir(base)
  }

  test("SQL users get the kernel library via graft_* functions") {
    graft.GraftFunctions.register(spark)
    emb.createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS nsq,
        |       graft_xxhash64_0(CAST(vec_id AS STRING)) AS h
        |FROM emb_sql ORDER BY vec_id LIMIT 1""".stripMargin)
      .as[(Double, Long)].head()
    assert(math.abs(r._1 - 1.0) < 1e-5) // embeddings are unit-norm
    assert(r._2 !== 0L)

    // embeddings can also be passed raw (float arrays read in place)
    val rf = spark.sql(
      """SELECT graft_dot(embedding, embedding) AS nsq
        |FROM emb_sql ORDER BY vec_id LIMIT 1""".stripMargin)
      .as[Double].head()
    assert(rf === r._1)

    val ids = spark.sql(
      """SELECT graft_uuid_v7() AS u,
        |       graft_crc32c(CAST('graft' AS BINARY)) AS c,
        |       graft_sorted_intersect_count(array('a','b','c'),
        |                                    array('b','c','d')) AS si
        |""".stripMargin).as[(String, Long, Int)].head()
    assert(ids._1.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
    // CRC32C("graft") cross-checked against java.util.zip.CRC32C directly
    val crc = new java.util.zip.CRC32C()
    crc.update("graft".getBytes("UTF-8"))
    assert(ids._2 === crc.getValue)
    assert(ids._3 === 2)
  }
}
