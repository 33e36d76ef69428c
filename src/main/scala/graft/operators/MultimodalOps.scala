package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` payloads + typed metadata, with decode / feature-extract
  * / resize / frame-sample stages.
  *
  * The Spark-side plumbing is real — schemas, per-partition batch
  * processing (mapPartitions with bounded batches, the JVM analogue of a
  * pandas-batch UDF), partitioning by media kind, and the handoff into the
  * ANN path (binary → embedding → [[DedupOps.cosineLshPairs]]).
  *
  * The codec step is a STUB: this container ships no image/audio
  * libraries, so "decode" parses a deterministic fake header
  * (`GRFT` magic | kind | width | height | frames) that the fixture
  * generator writes, and "features" are a deterministic fold of payload
  * bytes. Swap `decodeHeader`/`extractFeatures` for a real codec (JavaCV,
  * TwelveMonkeys, ffmpeg pipe) without touching any plan shape.
  */
object MultimodalOps {

  val MAGIC: Int = 0x47524654 // "GRFT"
  val HeaderLen = 20
  val FeatureDim = 16

  /** Deterministic fixture: fake media blobs derived from the documents
    * table (payload bytes from the text, header from doc stats). One blob
    * per doc; kind cycles image/audio/video.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, text: String) =>
      val kind = (docId % 3).toInt // 0=image 1=audio 2=video
      val w = 64 + (docId % 64).toInt
      val h = 48 + (docId % 48).toInt
      val frames = if (kind == 2) 8 + (docId % 8).toInt else 1
      val payload = text.getBytes("UTF-8").take(256)
      val bb = java.nio.ByteBuffer.allocate(HeaderLen + payload.length)
      bb.putInt(MAGIC).putInt(kind).putInt(w).putInt(h).putInt(frames)
      bb.put(payload)
      bb.array()
    }
    docs.select(col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      mk(col("doc_id"), col("text")).as("data"))
  }

  case class MediaMeta(valid: Boolean, kind: Int, width: Int, height: Int,
      frames: Int, payload_bytes: Int)

  /** Decode STUB: binary → typed metadata struct. Real codecs plug in here. */
  private def decodeHeader(data: Array[Byte]): MediaMeta = {
    if (data == null || data.length < HeaderLen) MediaMeta(false, -1, 0, 0, 0, 0)
    else {
      val bb = java.nio.ByteBuffer.wrap(data)
      val magic = bb.getInt()
      if (magic != MAGIC) MediaMeta(false, -1, 0, 0, 0, 0)
      else MediaMeta(true, bb.getInt(), bb.getInt(), bb.getInt(), bb.getInt(),
        data.length - HeaderLen)
    }
  }

  /** Metadata extraction: binary → typed struct column via a
    * struct-returning UDF — stays IN-PLAN (columnar scan → project → agg,
    * no RDD hop, no serialization round-trip; the former mapPartitions
    * variant cost a full InternalRow↔Row conversion for a header parse a
    * UDF expresses directly). A real vectorized codec swaps in as an
    * `mapInPandas`/Arrow batch stage at the same position without touching
    * downstream plan shape.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val dec = udf { data: Array[Byte] => decodeHeader(data) }
    media.withColumn("meta", dec(col("data")))
  }

  /** Feature-extraction STUB: binary → dense embedding (deterministic byte
    * fold). Output feeds the ANN/dedup path unchanged.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val feats = udf { data: Array[Byte] =>
      val v = new Array[Float](FeatureDim)
      if (data != null) {
        var i = HeaderLen
        while (i < data.length) {
          v(i % FeatureDim) += (data(i) & 0xFF) / 255.0f
          i += 1
        }
      }
      v
    }
    media.select(col("media_id"), col("kind"), feats(col("data")).as("embedding"))
  }

  /** Resize STUB: rewrites the fake header to the target box, keeps the
    * payload. Plan shape (map-side binary transform) is the real thing.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val rs = udf { data: Array[Byte] =>
      val m = decodeHeader(data)
      if (!m.valid) data
      else {
        val scale = math.min(1.0,
          math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
        val bb = java.nio.ByteBuffer.wrap(data.clone())
        bb.putInt(MAGIC).putInt(m.kind)
          .putInt(math.max(1, (m.width * scale).toInt))
          .putInt(math.max(1, (m.height * scale).toInt))
          .putInt(m.frames)
        bb.array()
      }
    }
    media.withColumn("data", rs(col("data")))
  }

  /** Frame-sample STUB for video: one synthetic frame row per sampled
    * index (stride sampling) — the explode shape of real frame extraction.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    decodeMeta(media)
      .filter(col("kind") === "video" && col("meta.valid"))
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Per-kind corpus stats over decoded metadata (the query a curator runs
    * before a training job).
    */
  def mediaStats(media: DataFrame): DataFrame =
    decodeMeta(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("meta.payload_bytes")).cast("long").as("total_bytes"),
        min(col("meta.width")).cast("long").as("min_w"),
        max(col("meta.width")).cast("long").as("max_w"),
        sum(col("meta.frames")).cast("long").as("total_frames"))
}
