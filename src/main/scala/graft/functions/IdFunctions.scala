package graft.functions

import java.security.SecureRandom
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Id-generation and checksum functions (SURVEY §2.5 S6/S7).
  *
  * UUIDv7 semantics follow the reference generator
  * `src/cpp/util/uuid-v7.cpp:15-69`: 48-bit unix-epoch milliseconds, version
  * nibble 7, 12-bit monotonic sequence within the millisecond, RFC-4122
  * variant bits, 62 random bits; formatted 8-4-4-4-12 lowercase hex.
  * Time-ordered ids are load-bearing for last-writer-wins dedupe ordering.
  */
object IdFunctions {

  private val rng = new ThreadLocal[SecureRandom] {
    override def initialValue(): SecureRandom = new SecureRandom()
  }
  // packed state: (lastMillis << 12) | seq — CAS-free per-thread monotonicity
  private val state = new ThreadLocal[AtomicLong] {
    override def initialValue(): AtomicLong = new AtomicLong(0L)
  }

  private[graft] def uuidV7String(): String = {
    val st = state.get()
    var millis = System.currentTimeMillis()
    val prev = st.get()
    val prevMillis = prev >>> 12
    var seq = 0L
    if (millis < prevMillis) millis = prevMillis // clock went backwards: hold
    if (millis == prevMillis) {
      seq = (prev & 0xFFF) + 1
      if (seq > 0xFFF) { millis += 1; seq = 0L } // seq overflow: borrow a ms
    }
    st.set((millis << 12) | seq)
    val r = rng.get()
    val randB = r.nextLong() & 0x3FFFFFFFFFFFFFFFL // 62 random bits
    val hi = (millis << 16) | 0x7000L | seq // 48-bit ts | ver 7 | 12-bit seq
    val lo = 0x8000000000000000L | randB // variant 10 | 62 random bits
    f"${hi >>> 32}%08x-${(hi >>> 16) & 0xFFFF}%04x-${hi & 0xFFFF}%04x-" +
      f"${lo >>> 48}%04x-${lo & 0xFFFFFFFFFFFFL}%012x"
  }

  /** S6: nondeterministic UUIDv7 generator column. */
  def uuidV7(): Column = udf(() => uuidV7String()).asNondeterministic()()

  /** S7: CRC32C checksum of a binary column (WAL frame checksum,
    * reference types.h:87, configs/woved-default.yaml:44).
    */
  private[graft] def crc32cLong(bytes: Array[Byte]): java.lang.Long =
    if (bytes == null) null
    else {
      val crc = new java.util.zip.CRC32C()
      crc.update(bytes)
      java.lang.Long.valueOf(crc.getValue)
    }

  def crc32c(c: Column): Column = {
    val f = udf((bytes: Array[Byte]) => crc32cLong(bytes))
    f(c)
  }
}
