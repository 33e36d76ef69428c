package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.index.Ivf
import graft.ingest.MutationLog
import graft.segments.Segments

/** The driver-resident buffer overlay (reference visibility shape:
  * the message buffer serves reads the moment group commit acks,
  * msg-buf.h:116-166) — LWW semantics, capacity fallback, prune-on-
  * publish, and end-to-end parity when merged under the segment tiers.
  */
class BufferOverlaySpec extends SparkSpec {
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

  test("publishBatch is LWW per id_hash; merged buffer view equals the flushed oracle") {
    val o = new BufferOverlay()
    val rows = mutationRows.cache()
    // publish the WHOLE history (every version, both waves) in two
    // batches — the overlay must resolve to exactly the live winners
    val wave1 = rows.filter(col("epoch") < 2000)
    val wave2 = rows.filter(col("epoch") >= 2000)
    assert(o.publishBatch(wave1) === wave1.agg(max("epoch")).as[Long].head())
    assert(o.publishBatch(wave2) === wave2.agg(max("epoch")).as[Long].head())
    val buf = o.asBuffer(spark).get
    // merge through the SAME tiered read the segment path uses — over
    // an empty store the overlay alone must reproduce the oracle
    val base = tmp("graft-ovl-base-")
    val live = IngestPipeline.liveView(spark, base, Some(buf))
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    val oracle = MutationLog.live(MutationLog.deterministicLog(emb))
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    assert(live.toSeq === oracle.toSeq)
    Segments.deleteDir(base)
    rows.unpersist()
  }

  test("capacity overflow skips the batch (fallback to file visibility), never truncates") {
    val o = new BufferOverlay(maxRows = 100)
    val rows = mutationRows
    assert(o.publishBatch(rows) === Long.MinValue)
    assert(o.skippedBatches === 1L)
    assert(o.size === 0)
    assert(o.maxEpoch === Long.MinValue)
  }

  test("prune drops only epochs at-or-below the flushed frontier") {
    val o = new BufferOverlay()
    val rows = mutationRows
    o.publishBatch(rows)
    val n0 = o.size
    o.prune(1500L)
    assert(o.size < n0)
    assert(o.asBuffer(spark).get.agg(min("epoch")).as[Long].head() > 1500L)
    o.prune(Long.MaxValue)
    assert(o.size === 0)
    assert(o.asBuffer(spark).isEmpty)
  }

  test("streamed ingest publishes to the overlay before flush and prunes after (T5 via overlay)") {
    val src = tmp("graft-ovl-src-")
    val base = tmp("graft-ovl-tree-")
    val ckpt = tmp("graft-ovl-ckpt-")
    val o = new BufferOverlay()
    val rows = mutationRows.cache()
    rows.coalesce(1).write.mode("append").parquet(src)
    val q = IngestPipeline.start(spark, src, base, ckpt, overlay = Some(o))
    try q.awaitTermination() finally q.stop()
    // AvailableNow drained everything: the flush published the catalog,
    // so the prune emptied the overlay — and the segment view now holds
    // exactly the oracle
    assert(o.maxEpoch === rows.agg(max("epoch")).as[Long].head())
    assert(o.size === 0)
    val live = IngestPipeline.liveView(spark, base)
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    val oracle = MutationLog.live(MutationLog.deterministicLog(emb))
      .select("vec_id", "epoch").as[(Long, Long)].collect().sortBy(_._1)
    assert(live.toSeq === oracle.toSeq)
    rows.unpersist()
    Seq(src, base, ckpt).foreach(Segments.deleteDir)
  }
}
