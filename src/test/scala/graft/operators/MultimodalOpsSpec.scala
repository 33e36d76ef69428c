package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = MultimodalOps.syntheticMedia(docs).cache()

  test("image blobs are REAL PNG: ImageIO round-trips the md5(text) geometry") {
    val rows = media.filter(col("kind") === "image")
      .join(docs.select(col("doc_id").as("media_id"), col("text")),
        Seq("media_id"))
      .select("media_id", "data", "text").limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val data = r.getAs[Array[Byte]]("data")
      // real PNG container magic
      assert((data(0) & 0xff) == 0x89 && data(1) == 'P')
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(data))
      val h = MultimodalOps.h28(r.getString(2))
      assert(img.getWidth === MultimodalOps.imgW(h))
      assert(img.getHeight === MultimodalOps.imgH(h))
      // pixel content round-trips losslessly: first pixel = first text
      // bytes tiled as RGB
      val content = r.getString(2).getBytes("UTF-8").take(256)
      if (content.length >= 3) {
        val exp = ((content(0) & 0xff) << 16) | ((content(1) & 0xff) << 8) |
          (content(2) & 0xff)
        assert((img.getRGB(0, 0) & 0xffffff) === exp)
      }
    }
  }

  test("audio blobs are REAL WAV: the JDK sound stack parses the sample count") {
    val rows = media.filter(col("kind") === "audio")
      .join(docs.select(col("doc_id").as("media_id"), col("text")),
        Seq("media_id"))
      .select("data", "text").limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(r.getAs[Array[Byte]]("data")))
      val h = MultimodalOps.h28(r.getString(1))
      assert(ais.getFrameLength === MultimodalOps.audioSamples(h))
      assert(ais.getFormat.getSampleRate === 8000.0f)
      ais.close()
    }
  }

  test("decodeMeta really decodes (PNG dims, WAV frames) and stays in-plan") {
    val m = MultimodalOps.decodeMeta(media)
    assert(m.filter(!col("meta.valid")).count() === 0)
    assert(m.count() === docs.count())
    val kinds = m.select("meta.kind").distinct().as[Int].collect().sorted
    assert(kinds.toSeq === Seq(0, 1, 2))
    // audio has no spatial dims; images/video do
    assert(m.filter(col("kind") === "audio" && col("meta.width") =!= 0)
      .count() === 0)
    assert(m.filter(col("kind") =!= "audio" && col("meta.width") < 64)
      .count() === 0)
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
    // a PNG magic with garbage body is also invalid, not a crash
    val fakePng = media.withColumn("data",
      lit(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0, 0,
        0, 1)))
    assert(MultimodalOps.decodeMeta(fakePng).filter(col("meta.valid"))
      .count() === 0)
  }

  test("resize really resamples: dims clamp to the box, nearest-neighbor pixels verify") {
    val resized = MultimodalOps.resize(media, 64, 48)
    val m = MultimodalOps.decodeMeta(resized)
    assert(m.filter(!col("meta.valid")).count() === 0)
    assert(m.filter(col("kind") === "image" &&
      (col("meta.width") > 64 || col("meta.height") > 48)).count() === 0)
    // pixel-level check on one image: out(x,y) == in(x*W/w, y*H/h)
    val before = media.filter(col("kind") === "image")
      .select("media_id", "data").limit(1).collect().head
    val after = resized.filter(col("media_id") === before.getLong(0))
      .select("data").head().getAs[Array[Byte]](0)
    val src = javax.imageio.ImageIO.read(
      new ByteArrayInputStream(before.getAs[Array[Byte]]("data")))
    val dst = javax.imageio.ImageIO.read(new ByteArrayInputStream(after))
    for (x <- Seq(0, dst.getWidth - 1); y <- Seq(0, dst.getHeight - 1)) {
      val sx = x * src.getWidth / dst.getWidth
      val sy = y * src.getHeight / dst.getHeight
      assert(dst.getRGB(x, y) === src.getRGB(sx, sy), s"($x,$y)")
    }
    // audio/video payloads pass through untouched
    val beforeBytes = media.filter(col("kind") =!= "image")
      .select(sum(length(col("data")))).as[Long].head()
    val afterBytes = resized.join(media.select(col("media_id"),
        col("kind").as("k")), Seq("media_id"))
      .filter(col("k") =!= "image")
      .select(sum(length(col("data")))).as[Long].head()
    assert(afterBytes === beforeBytes)
  }

  test("video blobs are REAL AVI/MJPEG: RIFF parse + ImageIO JPEG frame decode") {
    val rows = media.filter(col("kind") === "video")
      .join(docs.select(col("doc_id").as("media_id"), col("text")),
        Seq("media_id"))
      .select("data", "text").limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val data = r.getAs[Array[Byte]]("data")
      // real RIFF/AVI container magic
      assert(data(0) == 'R' && data(1) == 'I' && data(8) == 'A' &&
        data(9) == 'V' && data(10) == 'I')
      val h = MultimodalOps.h28(r.getString(1))
      // avih header round-trips the md5(text) geometry
      val Some((w, ht, n)) = MultimodalOps.Codec.aviMeta(data)
      assert(w === MultimodalOps.imgW(h))
      assert(ht === MultimodalOps.imgH(h))
      assert(n === MultimodalOps.videoFrames(h))
      // every frame chunk is a real JPEG the JDK codec can decode, at
      // the container's declared dimensions
      val chunks = MultimodalOps.Codec.aviFrameChunks(data)
      assert(chunks.length === n)
      chunks.foreach { jb =>
        assert((jb(0) & 0xff) == 0xff && (jb(1) & 0xff) == 0xd8) // JPEG SOI
        val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(jb))
        assert(img.getWidth === w && img.getHeight === ht)
      }
      // successive frames carry different content (the frame-shifted
      // raster), so this is a video, not one repeated still
      val f0 = MultimodalOps.Codec.aviFrame(data, 0)
      val f1 = MultimodalOps.Codec.aviFrame(data, 1)
      val diff = (0 until math.min(64, w)).exists(x =>
        f0.getRGB(x, 0) != f1.getRGB(x, 0))
      assert(diff)
    }
  }

  test("video frame sampling decodes stride-spaced frames with real pixel stats") {
    val frames = MultimodalOps.sampleFrames(media, stride = 4).cache()
    val perVid = frames.groupBy("media_id").count()
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    // videos have 8-15 frames → 2-4 sampled each
    assert(perVid.filter(col("count") < 2 || col("count") > 4).count() === 0)
    // decoded geometry matches the container header for every sampled row
    val meta = MultimodalOps.decodeMeta(media)
      .filter(col("kind") === "video")
      .select(col("media_id"), col("meta.width").as("w"),
        col("meta.height").as("h"))
    assert(frames.join(meta, Seq("media_id"))
      .filter(col("frame_w") =!= col("w") || col("frame_h") =!= col("h"))
      .count() === 0)
    // mean luminance is a real pixel statistic: strictly inside (0, 1)
    // for text-derived rasters (never the 0.0 a header-only path yields)
    assert(frames.filter(col("mean_lum") <= 0.0 || col("mean_lum") >= 1.0)
      .count() === 0)
  }

  test("extracted features come from decoded content and feed the ANN/dedup path") {
    val feats = MultimodalOps.extractFeatures(media)
      .withColumn("vec_id", col("media_id"))
    // exact duplicate texts of the same kind produce identical decoded
    // content → identical grid/RMS features → cosine 1 pairs
    val pairs = DedupOps.cosineTopPairs(
      feats.select(col("vec_id"), col("embedding")), 5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.head._3 > 0.999)
    // image features are real luminance means in [0,1], not byte folds
    val img = feats.filter(col("kind") === "image")
      .select("embedding").as[Seq[Float]].head()
    assert(img.length === MultimodalOps.FeatureDim)
    assert(img.forall(v => v >= 0.0f && v <= 1.0f))
  }
}
