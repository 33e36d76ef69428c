package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end smoke drive of the library surface (scratch). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, dir, "embeddings")
    val docs = Tables.load(spark, dir, "documents")

    println("== S1 dot / S2 l2 (codegen expressions) ==")
    import graft.functions.VectorFunctions._
    emb.select(col("vec_id"), dotD(col("embedding"), col("embedding")).as("norm_sq"),
        l2SqD(col("embedding"), col("embedding")).as("self_l2"))
      .orderBy("vec_id").show(3)

    println("== S5 xxhash64 seed 0 vs builtin(seed42) ==")
    emb.select(hashId(concat(lit("vec-"), col("vec_id"))).as("h0"),
      xxhash64(concat(lit("vec-"), col("vec_id"))).as("h42")).show(3)

    println("== KNN exact ip top-3 for 2 queries ==")
    val qs = graft.operators.Knn.defaultQueries(emb).limit(2)
    graft.operators.Knn.exactBatch(qs, emb, "ip", 3).orderBy("query_id", "score").show()

    println("== Dedup: exact groups ==")
    graft.operators.DedupOps.exactGroups(docs).orderBy(desc("n_dups")).show(3)

    println("== Dedup: jaccard pairs within source ==")
    graft.operators.DedupOps.jaccardPairsWithin(docs, "source", 5).show()

    println("== Dedup: minhash near-dups ==")
    graft.operators.DedupOps.minhashNearDups(docs, threshold = 0.2).orderBy("a", "b").show(5)

    println("== Dedup: simhash near-dups (maxHamming=10) ==")
    graft.operators.DedupOps.simhashNearDups(docs, maxHamming = 10).orderBy("a", "b").show(5)

    println("== entry() driver contract: rows>0 ==")
    val er = SparkEntry.entry(spark)
    println(s"entry rows = ${er.count()}")
    er.show(5)

    println("== knn_ivf plan: assignment must be map-side (no crossJoin/Window before topk) ==")
    val cents = graft.index.Ivf.deterministicCentroids(emb, 50)
    graft.index.Ivf.assign(emb, cents).explain("formatted")

    println("== streaming ingest roundtrip (T1-T5, T8) ==")
    locally {
      import graft.index.Ivf
      import graft.ingest.MutationLog
      import graft.functions.VectorFunctions
      import graft.segments.Segments
      import graft.streaming.IngestPipeline
      val cents = Ivf.deterministicCentroids(emb, 50)
      val rows = Ivf.assign(
          MutationLog.deterministicLog(emb)
            .withColumn("id_hash", VectorFunctions.hashId(col("id")))
            .withColumn("deleted", col("op") === "DELETE"),
          cents, vecCol = "vec")
        .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
        .select("op", "vec_id", "id", "id_hash", "epoch", "deleted",
          "centroid_id", "vec").cache()
      val src = java.nio.file.Files.createTempDirectory("smoke-src-").toString
      val base = java.nio.file.Files.createTempDirectory("smoke-base-").toString
      val ckpt = java.nio.file.Files.createTempDirectory("smoke-ckpt-").toString
      rows.filter(col("epoch") < 2000).coalesce(1).write.mode("append").parquet(src)
      IngestPipeline.runOnce(spark, src, base, ckpt)
      println(s"after wave1: live=${IngestPipeline.liveView(spark, base).count()}")
      rows.filter(col("epoch") >= 2000).coalesce(1).write.mode("append").parquet(src)
      IngestPipeline.runOnce(spark, src, base, ckpt)
      println(s"after wave2: live=${IngestPipeline.liveView(spark, base).count()} " +
        s"segments=${Segments.catalog(spark, base).count()}")
      // crash-replay probe: re-flush an already-committed batch id
      IngestPipeline.flushBatch(rows.filter(col("epoch") < 2000), base, 0L)
      println(s"after replay: rows=${Segments.readSegments(spark, base).count()} " +
        s"segments=${Segments.catalog(spark, base).count()}")
      Seq(src, base, ckpt).foreach(Segments.deleteDir)
    }

    println("== A5 metrics export: task-level observability ==")
    locally {
      val m1 = Metrics.measure("knn_exact_ip",
        graft.operators.Knn.exactBatch(
          graft.operators.Knn.defaultQueries(emb), emb, "ip", 10))
      val m2 = Metrics.measure("dedup_exact",
        graft.operators.DedupOps.exactGroups(docs))
      Metrics.toDf(spark, Seq(m1, m2)).show(truncate = false)
    }

    println("== W1-W3 WAL framing: append, torn-tail recovery ==")
    locally {
      import graft.streaming.Wal
      val p = java.nio.file.Files.createTempDirectory("smoke-wal-")
        .resolve("wal.log").toString
      Wal.append(p, (1L to 10L).map(e => (e, s"""{"op":"INSERT","id":$e}""")))
      val raf = new java.io.RandomAccessFile(p, "rw")
      raf.setLength(raf.length() - 3) // crash mid-frame
      raf.close()
      println(s"replayed after torn tail: ${Wal.replay(p).size} of 10 frames")
    }

    println("== IVF search over the stored segment layout ==")
    locally {
      import graft.index.Ivf
      import graft.ingest.MutationLog
      import graft.functions.VectorFunctions
      import graft.segments.Segments
      val cents = Ivf.deterministicCentroids(emb, 50)
      val rows = Ivf.assign(
          MutationLog.live(MutationLog.deterministicLog(emb))
            .withColumn("id_hash", VectorFunctions.hashId(col("id"))),
          cents, vecCol = "vec")
        .withColumn("deleted", lit(false))
      val base = java.nio.file.Files.createTempDirectory("smoke-ivf-").toString
      Segments.writeSegment(rows, base, "s0", isStable = true)
      val hits = Ivf.searchStored(spark, base,
        graft.operators.Knn.defaultQueries(emb).limit(3), cents, "ip", 5, 3)
      println(s"searchStored rows = ${hits.count()} (expect 15 = 3 queries x top-5)")
      hits.orderBy("query_id", "score").show(5)
      Segments.deleteDir(base)
    }

    println("== probe: dimension mismatch must throw ==")
    try {
      emb.select(dotD(col("embedding"), slice(col("embedding"), 1, 8))).collect()
      println("NO-THROW: BUG")
    } catch {
      case e: Throwable =>
        println(s"threw as expected: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
    }
    spark.stop()
  }
}
