package graft.streaming

import java.io.{FileOutputStream, RandomAccessFile}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class WalSpec extends AnyFunSuite {

  private def tmpWal() =
    Files.createTempDirectory("graft-wal-").resolve("wal.log").toString

  private val records = (1L to 100L).map(e => (e, s"""{"op":"INSERT","id":$e}"""))

  test("append + replay roundtrip preserves every frame in order") {
    val p = tmpWal()
    Wal.append(p, records)
    assert(Wal.replay(p) === records)
  }

  test("group-commit appends accumulate") {
    val p = tmpWal()
    Wal.append(p, records.take(50))
    Wal.append(p, records.drop(50))
    assert(Wal.replay(p) === records)
  }

  test("torn tail (crash mid-frame) recovers everything before it") {
    val p = tmpWal()
    Wal.append(p, records)
    // crash: truncate the file mid-way through the last frame
    val raf = new RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 5)
    raf.close()
    val replayed = Wal.replay(p)
    assert(replayed === records.dropRight(1))
  }

  test("corrupt frame (bit flip) stops replay at the corruption, keeps prefix") {
    val p = tmpWal()
    Wal.append(p, records.take(10))
    val raf = new RandomAccessFile(p, "rw")
    // flip one payload byte of the 6th frame: frames are fixed-size here
    val frameLen = 4 + 4 + 8 + records.head._2.getBytes("UTF-8").length
    raf.seek(5L * frameLen + 20)
    val b = raf.read()
    raf.seek(5L * frameLen + 20)
    raf.write(b ^ 0xFF)
    raf.close()
    val replayed = Wal.replay(p)
    assert(replayed.size === 5)
    assert(replayed === records.take(5))
  }

  test("replay of missing file is empty, not an error") {
    assert(Wal.replay("/tmp/does-not-exist-graft.wal") === Seq.empty)
  }

  private val binRecords =
    (1L to 100L).map(e => (e, s"""{"op":"INSERT","id":$e}""".getBytes("UTF-8")))
  private def sameFrames(a: Seq[(Long, Array[Byte])],
      b: Seq[(Long, Array[Byte])]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((e1, p1), (e2, p2)) =>
      e1 == e2 && java.util.Arrays.equals(p1, p2)
    }

  test("rotation: segments roll at the size threshold, replay spans them in order (yaml rotate cadence)") {
    val dir = Files.createTempDirectory("graft-wal-rot-").toString
    // tiny threshold so every batch after the first rolls a new segment;
    // a batch never splits across segments
    binRecords.grouped(10).foreach(b =>
      Wal.appendBinaryRotating(dir, b.toSeq, rotateBytes = 200L))
    val segs = Wal.segments(dir)
    assert(segs.length > 1, "threshold should have forced rotation")
    assert(segs.map(_.getName) === segs.map(_.getName).sorted)
    assert(sameFrames(Wal.replayBinaryRotated(dir), binRecords))
  }

  test("rotation: torn tail tolerated in the FINAL segment only; damaged middle segment raises") {
    val dir = Files.createTempDirectory("graft-wal-rot-torn-").toString
    binRecords.grouped(25).foreach(b =>
      Wal.appendBinaryRotating(dir, b.toSeq, rotateBytes = 100L))
    val segs = Wal.segments(dir)
    assert(segs.length >= 3)
    // crash tail: truncate the LAST segment mid-frame → clean recovery
    val last = new RandomAccessFile(segs.last.getPath, "rw")
    last.setLength(last.length() - 5)
    last.close()
    assert(sameFrames(Wal.replayBinaryRotated(dir),
      binRecords.dropRight(1)))
    // real damage: truncate a MIDDLE segment → refuse, don't silently
    // drop the segments after it
    val mid = new RandomAccessFile(segs.head.getPath, "rw")
    mid.setLength(mid.length() - 5)
    mid.close()
    intercept[IllegalArgumentException] {
      Wal.replayBinaryRotated(dir)
    }
  }

  test("rotation: max_files cap reclaims-or-rejects the 11th segment (config.h:50)") {
    val dir = Files.createTempDirectory("graft-wal-maxfiles-").toString
    // rotateBytes=1 → every batch cuts a new segment; 10 batches fill
    // the reference cap exactly (no flush frontier → nothing reclaimable)
    val recs = (1L to 110L).map(e =>
      (e, s"""{"op":"INSERT","id":$e}""".getBytes("UTF-8")))
    val batches = recs.grouped(10).toSeq // epochs 1-10, 11-20, …
    // the cap is OPT-IN (the API default is unbounded — a finite cap
    // with no flushed frontier could deadlock default callers at
    // 30 GiB); config-wired deployments pass GraftConfig.wal.maxFiles
    batches.take(10).foreach(b =>
      Wal.appendBinaryRotating(dir, b.toSeq, rotateBytes = 1L,
        maxFiles = Wal.defaultMaxFiles))
    assert(Wal.segments(dir).length === 10)
    // 11th segment with nothing flushed → disk-full backstop: reject,
    // and the log is untouched (no segment lost, no partial append)
    intercept[Wal.WalAtCapacity] {
      Wal.appendBinaryRotating(dir, batches(10).toSeq, rotateBytes = 1L,
        maxFiles = Wal.defaultMaxFiles)
    }
    assert(Wal.segments(dir).length === 10)
    assert(sameFrames(Wal.replayBinaryRotated(dir), recs.take(100)))
    // same append with epochs 1-30 flushed → the three oldest segments
    // reclaim and the append lands; replay is exactly the unflushed
    // suffix plus the new frames
    Wal.appendBinaryRotating(dir, batches(10).toSeq, rotateBytes = 1L,
      maxFiles = Wal.defaultMaxFiles, flushedEpoch = 30L)
    assert(Wal.segments(dir).length === 8) // 10 - 3 reclaimed + 1 new
    assert(sameFrames(Wal.replayBinaryRotated(dir),
      recs.slice(30, 100) ++ batches(10)))
  }

  test("zstd: streamed frames (no declared content size) replay via the streaming fallback") {
    // a streaming zstd encoder legally omits the frame content size —
    // reference-interchange logs written that way must still decode
    val raw = ("streamed-frame " * 500).getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(raw); z.close()
    val framed = bos.toByteArray
    assert(com.github.luben.zstd.Zstd.getFrameContentSize(framed) <= 0,
      "fixture must exercise the undeclared-content-size path")
    assert(java.util.Arrays.equals(WalCodec.decode(framed), raw))
  }

  test("rotation: reclaim drops only fully-flushed non-final segments") {
    val dir = Files.createTempDirectory("graft-wal-reclaim-").toString
    binRecords.grouped(25).foreach(b =>
      Wal.appendBinaryRotating(dir, b.toSeq, rotateBytes = 100L))
    val before = Wal.segments(dir).length
    assert(before === 4)
    // epochs 1..25 in seg 0, 26..50 in seg 1, ... reclaim through 50
    val dropped = Wal.reclaim(dir, flushedEpoch = 50L)
    assert(dropped === Seq("wal-00000.log", "wal-00001.log"))
    // the remaining log still replays the unflushed suffix intact
    assert(sameFrames(Wal.replayBinaryRotated(dir), binRecords.drop(50)))
    // nothing else is reclaimable below epoch 51; the active segment
    // survives even when fully flushed
    assert(Wal.reclaim(dir, flushedEpoch = 50L) === Seq.empty)
    assert(Wal.reclaim(dir, flushedEpoch = 1000L) === Seq("wal-00002.log"))
    assert(Wal.segments(dir).map(_.getName) === Seq("wal-00003.log"))
  }

  private def sampleRecord(e: Long) = WalRecord(
    op = (e % 3).toByte,
    id = f"0190-$e%04d-uuid",
    idHash = e * 0x9E3779B97F4A7C15L, // exercises the sign bit (u64)
    tenantNsHash = -e,
    timestampNanos = 1700000000000000000L + e,
    dim = 4,
    vector = Array(e.toFloat, -e.toFloat, 0.5f, Float.MinPositiveValue),
    tags = Array(3, 11, Int.MaxValue),
    flags = 0x80000001, // u32 high bit
    epoch = e,
    centroidId = 65535, // u16 max
    tenant = s"t${e % 3}",
    namespace = "ns0")

  test("FlatBuffers WALRecord: encode/decode roundtrip over every field incl. unsigned extremes") {
    val recs = (1L to 20L).map(sampleRecord) :+
      WalRecord(2, "", 0L, 0L, 0L, 0, Array.empty, Array.empty, 0, 7L, 0,
        "", "") // FENCE with everything empty/default
    recs.foreach { r =>
      assert(WalRecordFb.decode(WalRecordFb.encode(r)) === r, r.id)
    }
  }

  test("FlatBuffers WALRecord: canonical layout invariants (golden header bytes)") {
    // spot-check the writer against the format spec, not against itself:
    // root uoffset -> table at 40, vtable of 13 slots (30 bytes) at 4,
    // table soffset back-references it, epoch inline at table+8
    val bytes = WalRecordFb.encode(sampleRecord(9L))
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(0) === 40) // root uoffset
    assert(bb.getShort(4) === 30) // vtable length: 4 + 13*2
    assert(bb.getShort(6) === 69) // table length
    assert(bb.getInt(40) === 36) // soffset: table 40 - vtable 4
    assert(bb.getLong(48) === 9L) // epoch at table+8 (slot 9 -> offset 8)
    assert((bb.getShort(4 + 4 + 2 * 9) & 0xffff) === 8) // vtable slot 9
  }

  test("FlatBuffers WALRecord: general reader decodes a FOREIGN layout (vtable after table, defaults omitted)") {
    // hand-built conforming buffer in a layout the encoder never emits:
    // table first (soffset negative), vtable after it, children at the
    // end, and all defaultable scalars OMITTED (slot offset 0) — the
    // shape a back-to-front flatc builder produces. Fields present:
    // id="ab" (slot 1), epoch=5 (slot 9); everything else default.
    val bb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val tPos = 8
    bb.putInt(0, tPos) // root
    bb.putInt(tPos, -(24 - tPos)) // soffset: vtable at 24, AFTER the table
    bb.putInt(tPos + 4, 48 - (tPos + 4)) // slot 1 (id) uoffset -> 48
    bb.putLong(tPos + 8, 5L) // epoch inline
    // vtable at 24: covers slots 0..9 only (len 4 + 10*2 = 24, spans
    // 24..47); unset in-range slots are zero = absent
    bb.putShort(24, 24.toShort)
    bb.putShort(26, 16.toShort) // table length
    bb.putShort(24 + 4 + 2 * 1, 4.toShort) // id at table+4
    bb.putShort(24 + 4 + 2 * 9, 8.toShort) // epoch at table+8
    // id string at 48 (past the vtable)
    bb.putInt(48, 2)
    bb.put(52, 'a'.toByte); bb.put(53, 'b'.toByte); bb.put(54, 0.toByte)
    val r = WalRecordFb.decode(bb.array())
    assert(r.id === "ab" && r.epoch === 5L)
    // omitted slots fall back to defaults, including those past vtable end
    assert(r.op === 0 && r.idHash === 0L && r.dim === 0 &&
      r.vector.isEmpty && r.tags.isEmpty && r.flags === 0 &&
      r.centroidId === 0 && r.tenant === "" && r.namespace === "")
  }

  test("compression: lz4/zstd roundtrip JSON and FlatBuffers payloads; compressible logs shrink on disk") {
    // payloads must clear the codec frame overhead (~15 B for an LZ4
    // frame) for the shrink assertion to be meaningful — per-frame
    // compression only pays above a payload size, exactly why the
    // reference defaults `compression: none` (yaml:52)
    val padded = records.map { case (e, j) =>
      (e, j.dropRight(1) + s""","pad":"${"abc123" * 30}"}""")
    }
    for (codec <- Seq(WalCodec.Lz4, WalCodec.Zstd)) {
      val p = tmpWal()
      Wal.append(s"$p-ref", padded) // uncompressed twin for the size bar
      Wal.appendBinary(p, padded.map { case (e, j) =>
        (e, j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }, codec)
      assert(Wal.replay(p) === padded, codec.name)
      // JSON is compressible; the framed log must actually shrink
      assert(new java.io.File(p).length() <
        new java.io.File(s"$p-ref").length(), codec.name)
      val pFb = tmpWal()
      val recs = (1L to 30L).map(sampleRecord)
      Wal.appendRecords(pFb, recs, codec)
      assert(Wal.replayRecords(pFb) === recs, codec.name)
    }
  }

  test("compression: mixed-codec rotated log replays in order; damage check reconciles stored lengths") {
    val dir = Files.createTempDirectory("graft-wal-codec-").toString
    val codecs = Array[WalCodec](WalCodec.None, WalCodec.Lz4, WalCodec.Zstd)
    val all = (1L to 90L).map(e => (e,
      s"""{"op":"INSERT","id":$e,"pad":"${"x" * 50}"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    // tiny rotate threshold → many segments, codec varies per batch (a
    // mid-life config change must never invalidate old segments)
    all.grouped(10).zipWithIndex.foreach { case (g, i) =>
      Wal.appendBinaryRotating(dir, g.toSeq, rotateBytes = 400L,
        codec = codecs(i % 3))
    }
    assert(Wal.segments(dir).length > 2, "fixture must rotate")
    val replayed = Wal.replayBinaryRotated(dir)
    assert(replayed.map(_._1) === all.map(_._1))
    replayed.zip(all).foreach { case ((_, got), (_, want)) =>
      assert(java.util.Arrays.equals(got, want))
    }
  }

  test("compression: torn tail on a compressed log keeps the intact prefix; bit flip stops at CRC") {
    val p = tmpWal()
    Wal.appendBinary(p, records.map { case (e, j) =>
      (e, j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }, WalCodec.Zstd)
    val raf = new RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 4)
    raf.close()
    assert(Wal.replay(p) === records.dropRight(1))
    // bit-flip INSIDE a compressed payload: CRC fails before any
    // decompression is attempted — corruption can never surface as a
    // codec exception
    val p2 = tmpWal()
    Wal.appendBinary(p2, records.map { case (e, j) =>
      (e, j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }, WalCodec.Lz4)
    val raf2 = new RandomAccessFile(p2, "rw")
    val mid = raf2.length() / 2
    raf2.seek(mid); val b = raf2.read(); raf2.seek(mid)
    raf2.write(b ^ 0x40)
    raf2.close()
    val kept = Wal.replay(p2)
    assert(kept.length < records.length)
    assert(kept === records.take(kept.length))
  }

  test("randomized crash-replay: any truncation point recovers exactly the fsynced prefix (fault-inject loop, 10 iterations)") {
    // the reference drives each kill point 10 times at random moments
    // (scripts/fault-inject.sh ITERATIONS=10); the WAL analogue: crash =
    // truncate the log at ANY byte offset — replay must return exactly
    // the frames wholly before the cut, never raise, never resequence.
    // Seeded; codec varies per iteration (none/lz4/zstd).
    val codecs = Array[WalCodec](WalCodec.None, WalCodec.Lz4, WalCodec.Zstd)
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(7000 + seed)
      val codec = codecs(seed % 3)
      val p = tmpWal()
      val recs = (1L to 60L).map { e =>
        (e, s"""{"op":"INSERT","id":$e,"pad":"${"x" * rnd.nextInt(40)}"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      // frame boundaries BEFORE compression are unknowable from here;
      // reconstruct stored frame sizes by appending one batch and
      // measuring, so the expected-prefix oracle is exact
      var bound = Seq.newBuilder[Long]
      var acc = 0L
      recs.foreach { r =>
        Wal.appendBinary(p, Seq(r), codec)
        acc = new java.io.File(p).length()
        bound += acc
      }
      val boundaries = bound.result()
      val total = boundaries.last
      val cut = 1L + math.abs(rnd.nextLong()) % total // 1..total
      val raf = new RandomAccessFile(p, "rw")
      raf.setLength(cut)
      raf.close()
      val survivors = boundaries.count(_ <= cut)
      val replayed = Wal.replayBinary(p)
      assert(replayed.length === survivors,
        s"seed=$seed codec=${codec.name} cut=$cut/$total")
      replayed.zip(recs.take(survivors)).foreach { case ((e, got), (we, want)) =>
        assert(e === we)
        assert(java.util.Arrays.equals(got, want), s"seed=$seed epoch=$e")
      }
    }
  }

  test("compression: no uncompressed payload shape can collide with a codec magic") {
    // the auto-detect contract rests on this: FlatBuffers payloads lead
    // with a root uoffset32 far below any codec magic, JSON with '{'/'['.
    // Prove it on the encoder's real output across varied shapes.
    val zstdMagic = Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte)
    val lz4Magic = Array(0x04, 0x22, 0x4D, 0x18).map(_.toByte)
    def collides(p: Array[Byte]) =
      p.take(4).sameElements(zstdMagic) || p.take(4).sameElements(lz4Magic)
    val shapes = (1L to 50L).map(sampleRecord) ++ Seq(
      WalRecord(2, "", 0L, 0L, 0L, 0, Array.empty, Array.empty, 0, 7L, 0,
        "", ""),
      WalRecord(0, "x" * 10000, -1L, -1L, -1L, 4,
        Array.fill(4)(Float.MaxValue), Array.fill(16)(Int.MaxValue),
        Int.MaxValue, Long.MaxValue, 65535, "t" * 1000, "n" * 1000))
    shapes.foreach { r =>
      val p = WalRecordFb.encode(r)
      assert(!collides(p), s"FlatBuffers payload for ${r.id} collides")
      // and decode() is the identity on it
      assert(WalCodec.decode(p) eq p)
    }
    assert(!collides("""{"op":"INSERT"}""".getBytes("UTF-8")))
  }

  test("FlatBuffers payloads ride the crc32c frame with the same recovery semantics") {
    val p = tmpWal()
    val recs = (1L to 30L).map(sampleRecord)
    Wal.appendRecords(p, recs)
    assert(Wal.replayRecords(p) === recs)
    // torn tail mid-frame: the prefix survives, the tail is discarded
    val raf = new RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 3)
    raf.close()
    assert(Wal.replayRecords(p) === recs.dropRight(1))
  }
}
