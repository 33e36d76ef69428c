package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = MultimodalOps.syntheticMedia(docs).cache()

  test("decodeMeta parses headers for every blob and stays in-plan") {
    val m = MultimodalOps.decodeMeta(media)
    assert(m.filter(!col("meta.valid")).count() === 0)
    assert(m.count() === docs.count())
    val kinds = m.select("meta.kind").distinct().as[Int].collect().sorted
    assert(kinds.toSeq === Seq(0, 1, 2))
    // no RDD hop: the decode is a projection over the source plan, never
    // an ExistingRDD scan (which would cost a serialization round-trip)
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), plan)
  }

  test("corrupt blobs surface as invalid, not crashes") {
    val corrupt = media.withColumn("data",
      when(col("media_id") % 2 === 0, lit(Array[Byte](1, 2, 3)))
        .otherwise(col("data")))
    val m = MultimodalOps.decodeMeta(corrupt)
    assert(m.filter(!col("meta.valid")).count() === media.count() / 2)
  }

  test("resize clamps dimensions and keeps payload size") {
    val before = MultimodalOps.decodeMeta(media)
      .select(sum("meta.payload_bytes")).as[Long].head()
    val resized = MultimodalOps.decodeMeta(
      MultimodalOps.resize(media, 64, 48))
    assert(resized.filter(col("meta.width") > 64 || col("meta.height") > 48)
      .count() === 0)
    val after = resized.select(sum("meta.payload_bytes")).as[Long].head()
    assert(after === before)
  }

  test("video frame sampling yields stride-spaced frame rows") {
    val frames = MultimodalOps.sampleFrames(media, stride = 4)
    val perVid = frames.groupBy("media_id").count()
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    // videos have 8-15 frames → 2-4 sampled each
    assert(perVid.filter(col("count") < 2 || col("count") > 4).count() === 0)
  }

  test("extracted features feed the ANN/dedup path end to end") {
    val feats = MultimodalOps.extractFeatures(media)
      .withColumn("vec_id", col("media_id"))
    // exact duplicate texts produce identical payloads → cosine 1 pairs
    val pairs = DedupOps.cosineTopPairs(
      feats.select(col("vec_id"), col("embedding")), 5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.head._3 > 0.999)
  }
}
