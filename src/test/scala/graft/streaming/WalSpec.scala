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
}
