package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode / feature-extract
  * / resize / frame-sample stages.
  *
  * Image and audio use REAL codecs — the JDK's own: `javax.imageio`
  * (PNG encode/decode, lossless pixel round-trip) and
  * `javax.sound.sampled` (RIFF/WAVE PCM). No external codec library is
  * needed or used. Video remains the one documented stub (the JDK ships
  * no video codec): a `GRFT`-magic header carrying real plan shapes.
  *
  * Determinism contract for the oracle: blob CONTENT (pixels, samples)
  * derives from the document text, and blob GEOMETRY (width, height,
  * frames, sample count) derives from the first 28 bits of `md5(text)` —
  * both exactly replicable in SQL (`md5` + integer arithmetic), so the
  * gated `media_stats` values are independent of encoder byte output
  * (PNG sizes may vary across encoders; decoded pixels never do).
  */
object MultimodalOps {

  val MAGIC: Int = 0x47524654 // "GRFT" — video-stub magic
  val HeaderLen = 20
  val FeatureDim = 16

  /** First 28 bits of md5(text) as a non-negative Long — the same value
    * DuckDB computes as `CAST(('0x' || substr(md5(text), 1, 7)) AS BIGINT)`.
    */
  def h28(text: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(text.getBytes("UTF-8"))
    val hex = f"${d(0) & 0xff}%02x${d(1) & 0xff}%02x${d(2) & 0xff}%02x${d(3) & 0xff}%02x"
    java.lang.Long.parseLong(hex.substring(0, 7), 16)
  }

  // geometry formulas shared by the generator, the decoder's expected
  // values, and the DuckDB oracle
  def imgW(h: Long): Int = (64 + h % 64).toInt
  def imgH(h: Long): Int = (48 + (h / 64) % 48).toInt
  def videoFrames(h: Long): Int = (8 + (h / 4096) % 8).toInt
  def audioSamples(h: Long): Int = (800 + (h % 64) * 16).toInt

  private object Codec {
    // headless + no ImageIO disk cache: decodes must never touch /tmp
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)

    /** Deterministic RGB image: text bytes tiled across the pixel grid. */
    def pngBytes(w: Int, h: Int, content: Array[Byte]): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val n = math.max(1, content.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          val r = content(i % n) & 0xff
          val g = content((i + 1) % n) & 0xff
          val b = content((i + 2) % n) & 0xff
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def readImage(data: Array[Byte]): BufferedImage =
      javax.imageio.ImageIO.read(new ByteArrayInputStream(data))

    /** Deterministic 16-bit mono PCM WAV at 8 kHz: samples from text
      * bytes (centered, scaled to exercise the full range).
      */
    def wavBytes(nSamples: Int, content: Array[Byte]): Array[Byte] = {
      val n = math.max(1, content.length)
      val dataLen = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        bb.putShort((((content(i % n) & 0xff) - 128) * 256).toShort)
        i += 1
      }
      bb.array()
    }

    def isPng(d: Array[Byte]): Boolean =
      d.length > 8 && (d(0) & 0xff) == 0x89 && d(1) == 'P' && d(2) == 'N' &&
        d(3) == 'G'

    def isWav(d: Array[Byte]): Boolean =
      d.length > 12 && d(0) == 'R' && d(1) == 'I' && d(2) == 'F' &&
        d(3) == 'F' && d(8) == 'W' && d(9) == 'A' && d(10) == 'V' &&
        d(11) == 'E'

    def isGrft(d: Array[Byte]): Boolean =
      d.length >= HeaderLen &&
        java.nio.ByteBuffer.wrap(d, 0, 4).getInt == MAGIC

    /** Real WAV parse via the JDK sound stack → (sampleFrames). */
    def wavFrames(data: Array[Byte]): Int = {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(data))
      try ais.getFrameLength.toInt finally ais.close()
    }
  }

  /** Deterministic fixture: one real media blob per doc; kind cycles
    * image (PNG) / audio (WAV) / video (GRFT stub). Content from the
    * text, geometry from md5(text) — see the object doc.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, text: String) =>
      val kind = (docId % 3).toInt
      val h = h28(text)
      val content = {
        val b = text.getBytes("UTF-8").take(256)
        if (b.isEmpty) Array[Byte](0) else b
      }
      kind match {
        case 0 => Codec.pngBytes(imgW(h), imgH(h), content)
        case 1 => Codec.wavBytes(audioSamples(h), content)
        case _ =>
          val bb = java.nio.ByteBuffer.allocate(HeaderLen + content.length)
          bb.putInt(MAGIC).putInt(2).putInt(imgW(h)).putInt(imgH(h))
            .putInt(videoFrames(h))
          bb.put(content)
          bb.array()
      }
    }
    docs.select(col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      mk(col("doc_id"), col("text")).as("data"))
  }

  case class MediaMeta(valid: Boolean, kind: Int, width: Int, height: Int,
      frames: Int, payload_bytes: Int)

  /** Format sniff + REAL decode: PNG via ImageIO (decoded dimensions),
    * WAV via AudioSystem (real frame count), GRFT video stub header.
    * Unknown/corrupt bytes → invalid, never a crash.
    */
  private def decodeBlob(data: Array[Byte]): MediaMeta = {
    if (data == null || data.length < 12) MediaMeta(false, -1, 0, 0, 0, 0)
    else try {
      if (Codec.isPng(data)) {
        val img = Codec.readImage(data)
        if (img == null) MediaMeta(false, -1, 0, 0, 0, 0)
        else MediaMeta(true, 0, img.getWidth, img.getHeight, 1, data.length)
      } else if (Codec.isWav(data)) {
        MediaMeta(true, 1, 0, 0, Codec.wavFrames(data), data.length)
      } else if (Codec.isGrft(data)) {
        val bb = java.nio.ByteBuffer.wrap(data)
        bb.getInt() // magic
        MediaMeta(true, bb.getInt(), bb.getInt(), bb.getInt(), bb.getInt(),
          data.length - HeaderLen)
      } else MediaMeta(false, -1, 0, 0, 0, 0)
    } catch { case _: Exception => MediaMeta(false, -1, 0, 0, 0, 0) }
  }

  /** Metadata extraction: binary → typed struct column via a
    * struct-returning UDF — stays IN-PLAN (columnar scan → project → agg,
    * no RDD hop, no serialization round-trip). The codec work happens
    * inside the projection, exactly where a vectorized Arrow codec batch
    * stage would sit, without touching downstream plan shape.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val dec = udf { data: Array[Byte] => decodeBlob(data) }
    media.withColumn("meta", dec(col("data")))
  }

  /** Feature extraction from DECODED content (not container bytes):
    * images → 4×4 grid of mean luminance over the real pixel raster;
    * audio → RMS energy over 16 equal windows of the real PCM samples;
    * video (stub) → payload byte fold. All 16-dim, deterministic (codec
    * round-trips are lossless), feeding the ANN/dedup path unchanged.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val feats = udf { data: Array[Byte] =>
      val v = new Array[Float](FeatureDim)
      if (data != null && data.length >= 12) try {
        if (Codec.isPng(data)) {
          val img = Codec.readImage(data)
          if (img != null) {
            val w = img.getWidth; val h = img.getHeight
            val cnt = new Array[Int](FeatureDim)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
                val rgb = img.getRGB(x, y)
                val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)
                v(cell) += lum / 765.0f
                cnt(cell) += 1
                x += 1
              }
              y += 1
            }
            var c = 0
            while (c < FeatureDim) {
              if (cnt(c) > 0) v(c) /= cnt(c); c += 1
            }
          }
        } else if (Codec.isWav(data)) {
          val bb = java.nio.ByteBuffer.wrap(data)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = (data.length - 44) / 2
          var i = 0
          while (i < n) {
            val s = bb.getShort(44 + 2 * i) / 32768.0
            val wdw = math.min(FeatureDim - 1, i * FeatureDim / math.max(1, n))
            v(wdw) += (s * s).toFloat
            i += 1
          }
          var c = 0
          while (c < FeatureDim) { v(c) = math.sqrt(v(c)).toFloat; c += 1 }
        } else {
          var i = HeaderLen
          while (i < data.length) {
            v(i % FeatureDim) += (data(i) & 0xFF) / 255.0f
            i += 1
          }
        }
      } catch { case _: Exception => () }
      v
    }
    media.select(col("media_id"), col("kind"), feats(col("data")).as("embedding"))
  }

  /** REAL image resize: decode → nearest-neighbor downscale into the
    * (maxW, maxH) box preserving aspect → re-encode PNG. Deterministic
    * (integer source-pixel mapping, no interpolation). Audio/video pass
    * through unchanged (time-domain resampling is a different operator).
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val rs = udf { data: Array[Byte] =>
      if (data != null && Codec.isPng(data)) try {
        val img = Codec.readImage(data)
        val scale = math.min(1.0,
          math.min(maxW.toDouble / img.getWidth,
            maxH.toDouble / img.getHeight))
        if (scale >= 1.0) data
        else {
          val w = math.max(1, (img.getWidth * scale).toInt)
          val h = math.max(1, (img.getHeight * scale).toInt)
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              out.setRGB(x, y, img.getRGB(x * img.getWidth / w,
                y * img.getHeight / h))
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
        }
      } catch { case _: Exception => data }
      else data
    }
    media.withColumn("data", rs(col("data")))
  }

  /** Frame-sample for video (stride sampling over the stub header's frame
    * count — the explode shape of real frame extraction; the JDK has no
    * video codec, so this is the one remaining decode stub).
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    decodeMeta(media)
      .filter(col("kind") === "video" && col("meta.valid"))
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Per-kind corpus stats over DECODED metadata (the query a curator
    * runs before a training job). Every value is decoder output and
    * simultaneously md5(text)-formula-replicable in SQL — the gate that
    * proves the real codec path end to end: n, width extremes, total
    * frames (image 1 / audio sample count / video frame count), total
    * decoded pixels.
    */
  def mediaStats(media: DataFrame): DataFrame =
    decodeMeta(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        min(col("meta.width")).cast("long").as("min_w"),
        max(col("meta.width")).cast("long").as("max_w"),
        sum(col("meta.frames")).cast("long").as("total_frames"),
        sum(col("meta.width").cast("long") * col("meta.height"))
          .cast("long").as("total_px"))
}
