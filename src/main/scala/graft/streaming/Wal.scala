package graft.streaming

import java.io.{DataInputStream, DataOutputStream, EOFException, File,
  FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WAL payload compression (config.h:51 `compression = "none" // none,
  * lz4, zstd`; configs/woved-default.yaml:52). Codecs are the STANDARD
  * self-describing frame formats (zstd magic 28 B5 2F FD, LZ4 frame
  * magic 04 22 4D 18), so replay auto-detects per payload and a log may
  * mix codecs across its lifetime (a config change never invalidates
  * old segments). The WAL frame contract is unchanged — `[len u32]
  * [crc32c u32][epoch u64][payload]` with the CRC over [epoch‖payload]
  * as STORED — so torn-tail recovery, reclamation's header-only scans,
  * and `none`-codec bit-compat with reference logs are untouched;
  * decompression happens strictly after a frame passes its CRC.
  *
  * Magic-collision safety: an uncompressed payload would be
  * misdetected only if its first four bytes equal a codec magic. Our
  * payloads are FlatBuffers `WALRecord`s (leading u32 = root offset, in
  * practice ≪ 2^24 — the magics are ≥ 0x18000000) or JSON (leading
  * byte `{`/`[`); neither can collide.
  */
sealed abstract class WalCodec(val name: String) extends Serializable {
  def compress(payload: Array[Byte]): Array[Byte]
}

object WalCodec {

  /** Identity: reference-bit-compat frames. */
  case object None extends WalCodec("none") {
    def compress(payload: Array[Byte]): Array[Byte] = payload
  }

  /** LZ4 frame format via lz4-java (on Spark's classpath). */
  case object Lz4 extends WalCodec("lz4") {
    def compress(payload: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      try out.write(payload) finally out.close()
      bos.toByteArray
    }
  }

  /** Zstandard frame via zstd-jni (on Spark's classpath); level 3 — the
    * usual streaming-durability tradeoff (zstd's own default).
    */
  case object Zstd extends WalCodec("zstd") {
    def compress(payload: Array[Byte]): Array[Byte] =
      com.github.luben.zstd.Zstd.compress(payload, 3)
  }

  def of(name: String): WalCodec = name match {
    case "none" => None
    case "lz4"  => Lz4
    case "zstd" => Zstd
    case other  => throw new IllegalArgumentException(
      s"unknown WAL codec '$other' (none, lz4, zstd — config.h:51)")
  }

  private def magic4(p: Array[Byte], a: Int, b: Int, c: Int, d: Int) =
    p.length >= 4 && (p(0) & 0xFF) == a && (p(1) & 0xFF) == b &&
      (p(2) & 0xFF) == c && (p(3) & 0xFF) == d

  /** True iff the payload begins with a codec frame magic — the one
    * byte shape a `none`-codec append must refuse (it would be
    * misdetected as compressed on replay; wrap such a blob in an
    * explicit codec instead, which round-trips any bytes).
    */
  def looksCompressed(payload: Array[Byte]): Boolean =
    magic4(payload, 0x28, 0xB5, 0x2F, 0xFD) ||
      magic4(payload, 0x04, 0x22, 0x4D, 0x18)

  /** Decompress a stored payload if it carries a codec magic; identity
    * otherwise. Replay-side — codec choice never needs to be configured
    * for reads.
    */
  /** Decoded-payload byte ceiling — a DECOMPRESSION-BOMB guard, not the
    * ingest limit: 1 GiB, 10× the reference's `max_request_size_bytes`
    * (100 MiB, config.h:179). Deliberately decoupled from
    * [[graft.ingest.IngestLimits]]: request-size limits are enforced at
    * ADMISSION (the guard can be raised via GraftConfig), and a replay
    * must accept every frame any legal configuration of the write path
    * could have carried — tying the decode cap to one config's ingest
    * limit would turn a raised-limit deployment's legal log into a
    * recovery failure. Nothing legitimate approaches 1 GiB; a zstd
    * frame declaring more is corruption or an attack, and rejecting it
    * bounds replay memory.
    */
  val MaxDecodedBytes: Long = 1L << 30

  def decode(payload: Array[Byte]): Array[Byte] =
    if (magic4(payload, 0x28, 0xB5, 0x2F, 0xFD)) { // zstd frame
      val size = com.github.luben.zstd.Zstd.getFrameContentSize(payload)
      if (size >= 0) {
        require(size <= MaxDecodedBytes,
          s"zstd WAL payload declares content size $size > " +
            s"decode safety bound $MaxDecodedBytes")
        com.github.luben.zstd.Zstd.decompress(payload, size.toInt)
      } else {
        // streamed frames (reference-interchange logs written by a
        // streaming encoder) legally omit the content size — fall back
        // to streaming decompression, cap-enforced as bytes arrive
        val in = new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(payload))
        val bos = new java.io.ByteArrayOutputStream(payload.length * 4 + 64)
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) {
            bos.write(buf, 0, n)
            require(bos.size() <= MaxDecodedBytes,
              s"zstd WAL payload exceeds max_request_size_bytes " +
                s"$MaxDecodedBytes while streaming")
            n = in.read(buf)
          }
        } finally in.close()
        bos.toByteArray
      }
    } else if (magic4(payload, 0x04, 0x22, 0x4D, 0x18)) { // lz4 frame
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(payload))
      val bos = new java.io.ByteArrayOutputStream(payload.length * 2 + 64)
      try {
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      bos.toByteArray
    } else payload
}

/** Framed write-ahead log, bit-compatible with the reference's frame
  * contract: `[len u32][crc32c u32][epoch u64][payload]`
  * (include/woved/types.h:85-91; configs/woved-default.yaml:42-44
  * `frame_header: [len_u32, crc32c_u32, epoch_u64]`, checksum crc32c).
  *
  * Payloads: UTF-8 JSON for the engine's own logs, or the reference's
  * FlatBuffers `WALRecord` (wal-record.fbs:21-58) via
  * [[appendRecords]]/[[replayRecords]] + [[WalRecordFb]] for bit-compat
  * interchange with reference-written logs.
  *
  * Recovery (W3): [[read]] verifies each frame's CRC over
  * [epoch‖payload] and stops cleanly at the first torn/corrupt frame —
  * the tail written during a crash is discarded, everything fsync'd
  * before it survives. That is exactly the `wal_append` kill-point
  * contract (scripts/fault-inject.sh:9).
  *
  * In the Spark engine the streaming checkpoint plays the WAL role for
  * ingest; this codec exists for interchange with reference-format logs
  * and for the crash-recovery property itself.
  *
  * Payload compression: every append path takes a [[WalCodec]]
  * (`none`/`lz4`/`zstd`, config.h:51); replay auto-detects the codec
  * per payload from the standard frame magics, so mixed-codec logs and
  * mid-life config changes replay correctly with zero read-side
  * configuration.
  */
object Wal {

  def crc(epoch: Long, payload: Array[Byte]): Long = {
    val c = new CRC32C()
    val eb = java.nio.ByteBuffer.allocate(8).putLong(epoch).array()
    c.update(eb)
    c.update(payload)
    c.getValue
  }

  /** Append binary-payload frames to a local WAL file (driver-side; one
    * log per writer — the reference is single-node, group-commit batches
    * arrive in order). `codec` compresses each payload before framing
    * (config.h:51); the CRC covers the stored bytes, so durability
    * verification never depends on a successful decompression.
    */
  def appendBinary(path: String, records: Seq[(Long, Array[Byte])],
      codec: WalCodec = WalCodec.None): Unit = {
    val fos = new FileOutputStream(path, true)
    val out = new DataOutputStream(fos)
    try {
      records.foreach { case (epoch, raw) =>
        // a raw payload that happens to start with a codec frame magic
        // would be misdetected on replay — refuse it HERE, at write
        // time, where the caller can still choose an explicit codec
        // (compressing an already-compressed blob round-trips any bytes)
        require(codec != WalCodec.None || !WalCodec.looksCompressed(raw),
          "none-codec payload begins with a compression frame magic; " +
            "append it under an explicit WalCodec instead")
        val payload = codec.compress(raw)
        out.writeInt(payload.length)
        out.writeInt(crc(epoch, payload).toInt)
        out.writeLong(epoch)
        out.write(payload)
      }
      out.flush()
      fos.getFD.sync() // the group commit IS the durability point
    } finally out.close()
  }

  /** JSON-payload convenience (UTF-8 through the binary frame). */
  def append(path: String, records: Seq[(Long, String)]): Unit =
    appendBinary(path, records.map { case (e, j) =>
      (e, j.getBytes(StandardCharsets.UTF_8))
    })

  /** Bit-compatible reference-format append: the FlatBuffers `WALRecord`
    * payload (wal-record.fbs:21-58, [[WalRecordFb]]) inside the same
    * `[len][crc32c][epoch]` frame. Frame epoch = record epoch.
    */
  def appendRecords(path: String, records: Seq[WalRecord],
      codec: WalCodec = WalCodec.None): Unit =
    appendBinary(path, records.map(r => (r.epoch, WalRecordFb.encode(r))),
      codec)

  /** Replay a WAL file's frames WITHOUT decoding payloads: every frame
    * up to (not including) the first torn or checksum-failing frame, as
    * (epoch, storedPayload). The rotated-replay damage checks need the
    * stored (possibly compressed) lengths to reconcile against the
    * file's byte length.
    */
  private[streaming] def replayStored(
      path: String): Seq[(Long, Array[Byte])] = {
    val f = new File(path)
    if (!f.exists()) return Seq.empty
    val in = new DataInputStream(new FileInputStream(f))
    val out = Seq.newBuilder[(Long, Array[Byte])]
    try {
      var ok = true
      while (ok) {
        try {
          val len = in.readInt()
          if (len < 0 || len > (1 << 26)) ok = false // insane frame → torn
          else {
            val storedCrc = in.readInt()
            val epoch = in.readLong()
            val payload = new Array[Byte](len)
            in.readFully(payload)
            if (crc(epoch, payload).toInt == storedCrc)
              out += ((epoch, payload))
            else ok = false // corrupt → stop (recovery semantics)
          }
        } catch { case _: EOFException => ok = false }
      }
    } finally in.close()
    out.result()
  }

  /** Replay a WAL file: every frame up to (not including) the first torn
    * or checksum-failing frame, payloads decompressed when they carry a
    * codec magic ([[WalCodec.decode]]). Returns (epoch, payload) pairs.
    */
  def replayBinary(path: String): Seq[(Long, Array[Byte])] =
    replayStored(path).map { case (e, p) => (e, WalCodec.decode(p)) }

  def replay(path: String): Seq[(Long, String)] =
    replayBinary(path).map { case (e, p) =>
      (e, new String(p, StandardCharsets.UTF_8))
    }

  /** Replay a reference-format (FlatBuffers-payload) WAL. */
  def replayRecords(path: String): Seq[WalRecord] =
    replayBinary(path).map { case (_, p) => WalRecordFb.decode(p) }

  // ---- rotation (reference cadence: rotate at 3 GiB,
  // configs/woved-default.yaml:50, config.h:50) ------------------------

  /** Reference rotation threshold: 3 GiB. */
  val defaultRotateBytes: Long = 3L * 1024 * 1024 * 1024

  /** Reference absolute rotated-file bound (`max_files = 10`,
    * config.h:50) — the disk-full backstop when checkpoints stall:
    * rotation past the cap first reclaims fully-flushed segments, and
    * refuses the append outright when every segment is still unflushed
    * (losing an unflushed segment would lose acknowledged writes; the
    * reference would rather reject new ingest).
    *
    * This is the CONFIG default (`GraftConfig.wal.maxFiles`), wired by
    * deployments that also wire a real flushed frontier. It is NOT the
    * API default of [[appendBinaryRotating]]: a finite cap with the
    * default `flushedEpoch = Long.MinValue` frontier can never reclaim
    * anything, so a caller who asked for neither would deadlock at
    * 10 segments (30 GiB) — the backstop is opt-in, taken together
    * with the frontier that makes it reclaimable.
    */
  val defaultMaxFiles: Int = 10

  /** Rotation refused: `maxFiles` segments exist and none is
    * reclaimable at the caller's flushed frontier.
    */
  final class WalAtCapacity(files: Int, cap: Int)
    extends RuntimeException(
      s"WAL at max_files capacity ($files of $cap segments, none " +
        "flushed past the reclaim frontier) — flush before appending " +
        "(config.h:50 disk-full backstop)")

  private def segName(n: Long): String = f"wal-$n%05d.log"

  private def segNumber(name: String): Long =
    name.stripPrefix("wal-").stripSuffix(".log").toLong

  /** WAL segment files of a log directory in NUMERIC order (names are
    * zero-padded to 5 digits but may grow wider — past wal-99999 an
    * alphabetical sort would order 100000 before 99999).
    */
  def segments(dir: String): Seq[File] = {
    val d = new File(dir)
    if (!d.exists()) return Seq.empty
    require(d.isDirectory,
      s"$dir is not a WAL log directory (single-file logs replay via " +
        "replayBinary)")
    // listFiles is null on I/O failure even for a directory
    Option(d.listFiles((_, name) => name.matches("wal-\\d{5,}\\.log")))
      .getOrElse(Array.empty[File])
      .sortBy(f => segNumber(f.getName)).toSeq
  }

  /** Append to a ROTATING log: frames go to the highest-numbered
    * `wal-NNNNN.log`; when the current segment would exceed
    * `rotateBytes` a new segment starts (the reference's 3 GiB rotate
    * cadence). A group-commit batch is never split across segments —
    * rotation happens between batches, so each segment is independently
    * replayable and old segments can be reclaimed wholesale once their
    * epochs are flushed (the reason the reference rotates at all).
    */
  def appendBinaryRotating(dir: String, records: Seq[(Long, Array[Byte])],
      rotateBytes: Long = defaultRotateBytes,
      codec: WalCodec = WalCodec.None,
      maxFiles: Int = Int.MaxValue,
      flushedEpoch: Long = Long.MinValue): Unit = {
    val d = new File(dir)
    if (!d.exists()) d.mkdirs()
    val segs = segments(dir)
    val cur = segs.lastOption.getOrElse(new File(d, segName(0)))
    val target =
      if (cur.exists() && cur.length() >= rotateBytes) {
        // max_files backstop (config.h:50): a NEW segment may only be
        // cut when the file count stays within the cap — reclaim
        // oldest-first at the caller's flushed frontier, and reject the
        // append when nothing is reclaimable (all segments unflushed)
        if (segs.length >= maxFiles) {
          reclaim(dir, flushedEpoch)
          val after = segments(dir).length
          if (after >= maxFiles) throw new WalAtCapacity(after, maxFiles)
        }
        // next number = last + 1 (NOT the count: reclamation deletes
        // old segments, so count and numbering diverge)
        new File(d, segName(segNumber(cur.getName) + 1))
      } else cur
    appendBinary(target.getPath, records, codec)
  }

  /** Replay a rotated log directory in segment order. Torn/corrupt
    * frames are tolerated ONLY in the final segment (the crash tail —
    * same contract as single-file replay); a short or corrupt NON-final
    * segment means real damage, not a crash, and raises instead of
    * silently dropping the segments after it.
    */
  def replayBinaryRotated(dir: String): Seq[(Long, Array[Byte])] = {
    val segs = segments(dir)
    val out = Seq.newBuilder[(Long, Array[Byte])]
    segs.zipWithIndex.foreach { case (f, i) =>
      val frames = replayStored(f.getPath)
      if (i < segs.length - 1) {
        // a non-final segment must replay to its exact byte length —
        // every frame intact (4+4+8 header + payload per frame); the
        // check reconciles STORED (possibly compressed) lengths
        val framedBytes = frames.map(16L + _._2.length).sum
        require(framedBytes == f.length(),
          s"WAL segment ${f.getName} is damaged mid-log " +
            s"(replayable $framedBytes of ${f.length()} bytes); " +
            "refusing to silently drop later segments")
      }
      out ++= frames.map { case (e, p) => (e, WalCodec.decode(p)) }
    }
    out.result()
  }

  /** Header-only segment scan: walks `[len][crc][epoch]` headers and
    * SKIPS payloads, so inspecting a 3 GiB segment costs O(frames)
    * 16-byte reads, not a 3 GiB materialization. Returns
    * (frameCount, maxEpoch, cleanToEnd) — CRCs are not verified here
    * (replay still verifies them); `cleanToEnd` means every frame's
    * bytes are present through the file's full length.
    */
  private def epochScan(f: File): (Long, Long, Boolean) = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(new FileInputStream(f)))
    var n = 0L
    var maxEpoch = Long.MinValue
    var read = 0L
    val total = f.length()
    var ok = true
    try {
      while (ok && read < total) {
        try {
          val len = in.readInt()
          if (len < 0 || len > (1 << 26)) ok = false
          else {
            in.readInt() // crc — not verified on this path
            val epoch = in.readLong()
            var toSkip = len
            while (toSkip > 0) {
              val s = in.skipBytes(toSkip)
              if (s <= 0) throw new EOFException()
              toSkip -= s
            }
            n += 1
            if (epoch > maxEpoch) maxEpoch = epoch
            read += 16L + len
          }
        } catch { case _: EOFException => ok = false }
      }
    } finally in.close()
    (n, maxEpoch, ok && read == total)
  }

  /** Drop rotated segments whose every epoch is ≤ `flushedEpoch` —
    * reclamation after a flush makes them redundant. The active (last)
    * segment is never reclaimed, and neither is a segment that does not
    * parse cleanly to its end (damage is for recovery to surface, not
    * reclamation to bury). O(frames) per segment — payloads are
    * skipped, never loaded.
    */
  def reclaim(dir: String, flushedEpoch: Long): Seq[String] = {
    val segs = segments(dir)
    if (segs.length <= 1) return Seq.empty
    segs.dropRight(1).flatMap { f =>
      val (n, maxEpoch, clean) = epochScan(f)
      if (clean && n > 0 && maxEpoch <= flushedEpoch) {
        f.delete()
        Some(f.getName)
      } else None
    }
  }

  /** Schema of a replayed reference-format WAL: the FlatBuffers
    * `WALRecord` fields (wal-record.fbs:21-58) as columns.
    */
  val walRecordSchema: StructType = StructType(Seq(
    StructField("op", ByteType, nullable = false),
    StructField("id", StringType, nullable = true),
    StructField("id_hash", LongType, nullable = false),
    StructField("tenant_ns_hash", LongType, nullable = false),
    StructField("timestamp_nanos", LongType, nullable = false),
    StructField("dim", IntegerType, nullable = false),
    StructField("vector", ArrayType(FloatType, containsNull = false),
      nullable = true),
    StructField("tags", ArrayType(IntegerType, containsNull = false),
      nullable = true),
    StructField("flags", IntegerType, nullable = false),
    StructField("epoch", LongType, nullable = false),
    StructField("centroid_id", IntegerType, nullable = false),
    StructField("tenant", StringType, nullable = true),
    StructField("namespace", StringType, nullable = true)))

  /** DISTRIBUTED replay of a rotated reference-format WAL: one task per
    * segment, each replaying (CRC-verified) and FlatBuffers-decoding its
    * own file — recovery parallelism scales with the rotate cadence
    * instead of a single driver thread walking the whole log. At the
    * reference envelope (50k ops/s ingest × 60 s checkpoint cadence =
    * a 3M-op tail) a serial replay+decode (~40k ops/s measured) blows
    * the 30 s recovery budget on its own; per-segment tasks bound it by
    * the largest segment. Same torn-tail contract as
    * [[replayBinaryRotated]]: the FINAL segment tolerates a torn/corrupt
    * tail (crash), a damaged NON-final segment raises from its task
    * rather than silently dropping frames. Requires the log directory to
    * be visible to executors (shared storage on a cluster; trivially
    * true in local mode and for the reference's single-node layout).
    */
  def replayRecordsDfRotated(spark: SparkSession, dir: String): DataFrame = {
    val segs = segments(dir)
    if (segs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], walRecordSchema)
    val paths = segs.map(_.getPath)
    val lastPath = paths.last
    val rows = spark.sparkContext
      .parallelize(paths, paths.length)
      .flatMap { p =>
        val frames = replayStored(p)
        if (p != lastPath) {
          // stored (possibly compressed) lengths reconcile the file size
          val framedBytes = frames.map(16L + _._2.length).sum
          val total = new File(p).length()
          require(framedBytes == total,
            s"WAL segment $p is damaged mid-log (replayable " +
              s"$framedBytes of $total bytes); refusing to silently " +
              "drop frames in a non-final segment")
        }
        frames.iterator.map { case (_, stored) =>
          val r = WalRecordFb.decode(WalCodec.decode(stored))
          Row(r.op, r.id, r.idHash, r.tenantNsHash, r.timestampNanos,
            r.dim, if (r.vector == null) null else r.vector.toSeq,
            if (r.tags == null) null else r.tags.toSeq, r.flags, r.epoch,
            r.centroidId, r.tenant, r.namespace)
        }
      }
    spark.createDataFrame(rows, walRecordSchema)
  }

  /** Replayed WAL as a DataFrame of (epoch, payload). */
  def replayDf(spark: SparkSession, path: String): DataFrame = {
    val rows = replay(path).map { case (e, p) => Row(e, p) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)),
      StructType(Seq(StructField("epoch", LongType, nullable = false),
        StructField("payload", StringType, nullable = false))))
  }
}
