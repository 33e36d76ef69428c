package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.index.Ivf
import graft.ingest.MutationLog
import graft.segments.Segments

class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mutationRows = {
    val cents = Ivf.deterministicCentroids(emb, 50)
    Ivf.assign(
        MutationLog.deterministicLog(emb)
          .withColumn("id_hash", VectorFunctions.hashId(col("id")))
          .withColumn("deleted", col("op") === "DELETE"),
        cents, vecCol = "vec")
      .withColumn("centroid_id", coalesce(col("centroid_id"), lit(-1L)))
      .select("op", "vec_id", "id", "id_hash", "epoch", "deleted",
        "centroid_id", "vec")
  }

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("streamed ingest + restart processes new files exactly once (T1-T4, T8)") {
    val src = tmp("graft-stream-src-")
    val base = tmp("graft-stream-base-")
    val ckpt = tmp("graft-stream-ckpt-")
    val rows = mutationRows.cache()

    // wave 1: inserts arrive, stream drains them
    rows.filter(col("epoch") < 2000).coalesce(1).write.mode("append")
      .parquet(src)
    IngestPipeline.runOnce(spark, src, base, ckpt)
    val afterWave1 = IngestPipeline.liveView(spark, base).count()
    assert(afterWave1 === 500)

    // wave 2: upserts + deletes arrive; restart from the same checkpoint
    rows.filter(col("epoch") >= 2000).coalesce(1).write.mode("append")
      .parquet(src)
    IngestPipeline.runOnce(spark, src, base, ckpt)

    val live = IngestPipeline.liveView(spark, base)
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    val oracle = MutationLog.live(MutationLog.deterministicLog(emb))
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    assert(live.toSeq === oracle.toSeq)

    // exactly-once: wave 1 rows were NOT reprocessed into a new segment
    val segs = Segments.catalog(spark, base)
      .select("segment_id").as[String].collect().sorted
    assert(segs.length === 2, segs.mkString(","))

    Seq(src, base, ckpt).foreach(Segments.deleteDir)
  }

  test("crash replay of the same batch is idempotent (T8 fault-inject analogue)") {
    val base = tmp("graft-replay-base-")
    val batch = mutationRows.filter(col("epoch") < 2000)

    IngestPipeline.flushBatch(batch, base, 0L)
    val once = Segments.readSegments(spark, base).count()
    // the crash: the batch commits to storage but the checkpoint doesn't —
    // on restart the SAME batchId is delivered again
    IngestPipeline.flushBatch(batch, base, 0L)
    val twice = Segments.readSegments(spark, base).count()
    assert(once === twice)
    val cat = Segments.catalog(spark, base).count()
    assert(cat === 1)
    Segments.deleteDir(base)
  }

  test("read-your-writes: unflushed buffer visible through liveView (T5)") {
    val base = tmp("graft-ryw-base-")
    val rows = mutationRows.cache()
    IngestPipeline.flushBatch(rows.filter(col("epoch") < 2000), base, 0L)
    // upsert of vec 5 is still only in the in-flight buffer
    val buffer = rows.filter(col("epoch") === 2005)
    val live = IngestPipeline.liveView(spark, base, Some(buffer))
    val got = live.filter(col("vec_id") === 5)
      .select("epoch", "segment_id").as[(Long, String)].head()
    assert(got === ((2005L, "buffer")))
    // a vector untouched by the buffer still resolves to the segment
    val seg = live.filter(col("vec_id") === 1)
      .select("epoch", "segment_id").as[(Long, String)].head()
    assert(seg === ((1001L, "delta-00000")))
    Segments.deleteDir(base)
  }
}
