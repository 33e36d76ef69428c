package graft.streaming

import java.io.FileOutputStream
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed (per-segment-task) replay of a rotated reference-format
  * WAL — the recovery path whose parallelism scales with the rotate
  * cadence. Contract: identical records to the serial
  * [[Wal.replayBinaryRotated]]+decode, torn FINAL tail tolerated,
  * damaged NON-final segment raises.
  */
class WalDistributedSpec extends SparkSpec {

  private def rec(e: Long) = WalRecord(
    op = (e % 2).toByte,
    id = s"vec-$e",
    idHash = e * 0x9E3779B97F4A7C15L,
    tenantNsHash = -e,
    timestampNanos = 1700000000000000000L + e,
    dim = 4,
    vector = Array(e.toFloat, -e.toFloat, 0.5f, 1.0f),
    tags = Array(3, 11),
    flags = 1,
    epoch = e,
    centroidId = (e % 7).toInt,
    tenant = s"t${e % 3}",
    namespace = "default")

  test("distributed rotated replay equals serial replay+decode, tolerates a torn final tail") {
    val dir = Files.createTempDirectory("graft-wal-dist-").toString
    (1L to 200L).grouped(20).foreach { g =>
      Wal.appendBinaryRotating(dir,
        g.map(e => (e, WalRecordFb.encode(rec(e)))), rotateBytes = 2000L)
    }
    assert(Wal.segments(dir).length > 2, "fixture must actually rotate")
    // crash: half a frame at the end of the active segment
    val torn = new FileOutputStream(Wal.segments(dir).last, true)
    try torn.write(Array[Byte](0, 0, 2, 1, 99)) finally torn.close()
    val serial = Wal.replayBinaryRotated(dir)
      .map { case (_, p) => WalRecordFb.decode(p) }
    assert(serial.length === 200) // torn tail dropped, every frame kept
    val df = Wal.replayRecordsDfRotated(spark, dir)
    val got = df.select("epoch", "id", "op", "id_hash", "vector",
        "centroid_id", "tenant")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getByte(2),
        r.getLong(3), r.getSeq[Float](4), r.getInt(5), r.getString(6)))
      .sortBy(_._1)
    assert(got.length === serial.length)
    serial.sortBy(_.epoch).zip(got).foreach { case (w, g) =>
      assert(g === ((w.epoch, w.id, w.op, w.idHash, w.vector.toSeq,
        w.centroidId, w.tenant)))
    }
  }

  test("distributed rotated replay decodes a zstd-compressed log (stored-length damage check holds)") {
    val dir = Files.createTempDirectory("graft-wal-dist-zstd-").toString
    (1L to 120L).grouped(12).foreach { g =>
      Wal.appendBinaryRotating(dir,
        g.map(e => (e, WalRecordFb.encode(rec(e)))), rotateBytes = 1200L,
        codec = WalCodec.Zstd)
    }
    assert(Wal.segments(dir).length > 2, "fixture must rotate")
    // every non-final segment is fully compressed frames; the damage
    // check must reconcile STORED lengths (decoded lengths would raise)
    val df = Wal.replayRecordsDfRotated(spark, dir)
    val got = df.select("epoch", "id").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.length === 120)
    assert(got === (1L to 120L).map(e => (e, s"vec-$e")).toArray)
  }

  test("distributed rotated replay raises on a damaged NON-final segment") {
    val dir = Files.createTempDirectory("graft-wal-dist-dmg-").toString
    (1L to 100L).grouped(10).foreach { g =>
      Wal.appendBinaryRotating(dir,
        g.map(e => (e, WalRecordFb.encode(rec(e)))), rotateBytes = 1500L)
    }
    val segs = Wal.segments(dir)
    assert(segs.length > 2)
    // truncate a MIDDLE segment — real damage, not a crash tail
    val mid = segs(segs.length / 2)
    val raf = new java.io.RandomAccessFile(mid, "rw")
    try raf.setLength(mid.length() - 3) finally raf.close()
    val ex = intercept[Throwable] {
      Wal.replayRecordsDfRotated(spark, dir).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("damaged mid-log")), ex.toString)
  }
}
