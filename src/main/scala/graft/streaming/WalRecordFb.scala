package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** One WAL mutation record — field-for-field the reference's FlatBuffers
  * `WALRecord` table (/root/reference/schemas/wal-record.fbs:21-58).
  * Unsigned 64-bit values ride Longs bit-preserved; `dim`/`centroid_id`
  * are uint16 (0..65535), `op` the Operation enum byte
  * (0=UPSERT, 1=DELETE, 2=FENCE).
  */
final case class WalRecord(
    op: Byte,
    id: String,
    idHash: Long,
    tenantNsHash: Long,
    timestampNanos: Long,
    dim: Int,
    vector: Array[Float],
    tags: Array[Int],
    flags: Int,
    epoch: Long,
    centroidId: Int,
    tenant: String,
    namespace: String) {
  override def equals(o: Any): Boolean = o match {
    case r: WalRecord =>
      op == r.op && id == r.id && idHash == r.idHash &&
      tenantNsHash == r.tenantNsHash &&
      timestampNanos == r.timestampNanos && dim == r.dim &&
      java.util.Arrays.equals(vector, r.vector) &&
      java.util.Arrays.equals(tags, r.tags) && flags == r.flags &&
      epoch == r.epoch && centroidId == r.centroidId &&
      tenant == r.tenant && namespace == r.namespace
    case _ => false
  }
  override def hashCode: Int = id.hashCode ^ epoch.hashCode
}

/** Minimal FlatBuffers codec for [[WalRecord]], written against the
  * PUBLIC FlatBuffers binary format (little-endian; root uoffset32;
  * tables = soffset32 to a vtable of u16 slots in field-declaration
  * order; strings = u32 length + bytes + NUL; vectors = u32 count +
  * elements; structs inline). No FlatBuffers library exists on this
  * classpath, so the encoder emits one fixed canonical layout (every
  * field present, vtable before table, children after) and the decoder
  * implements the GENERAL vtable walk — it reads any conforming
  * `WALRecord` buffer regardless of layout choices (vtable position,
  * field order, omitted-default fields), which is what bit-compat
  * interchange with reference-written logs requires.
  *
  * Field slots (fbs declaration order): 0 op, 1 id, 2 id_hash,
  * 3 tenant_ns_hash, 4 timestamp, 5 dim, 6 vector, 7 tags, 8 flags,
  * 9 epoch, 10 centroid_id, 11 tenant, 12 namespace.
  */
object WalRecordFb {

  private val NumSlots = 13
  private val VtableLen = 4 + 2 * NumSlots // 30

  // canonical encoder layout, offsets within the table (u64s end at +40,
  // then the five uoffset32s, then the narrow scalars):
  //   +0 soffset32 | +8 epoch u64 | +16 id_hash | +24 tenant_ns_hash |
  //   +32 timestamp | +40 id uoff | +44 vector uoff | +48 tags uoff |
  //   +52 tenant uoff | +56 namespace uoff | +60 flags u32 | +64 dim u16 |
  //   +66 centroid_id u16 | +68 op i8  → table length 69
  private val TableLen = 69
  private val SlotOffsets: Array[Int] =
    Array(68, 40, 16, 24, 32, 64, 44, 48, 60, 8, 66, 52, 56)

  def encode(r: WalRecord): Array[Byte] = {
    require(r.vector == null || r.vector.length == r.dim,
      s"dim ${r.dim} != vector length ${r.vector.length}")
    val idB = r.id.getBytes(StandardCharsets.UTF_8)
    val tenB = r.tenant.getBytes(StandardCharsets.UTF_8)
    val nsB = r.namespace.getBytes(StandardCharsets.UTF_8)
    val vec = if (r.vector == null) Array.empty[Float] else r.vector
    val tags = if (r.tags == null) Array.empty[Int] else r.tags
    def align4(x: Int): Int = (x + 3) & ~3
    // forward layout: [root u32][vtable 30B][pad][table 65B][children...]
    val vtPos = 4
    val tPos = 40 // first 8-aligned position past the vtable (34 → 40)
    var cur = align4(tPos + TableLen) // children region cursor
    val idPos = cur; cur = align4(cur + 4 + idB.length + 1)
    val vecPos = cur; cur += 4 + 4 * vec.length
    val tagsPos = cur; cur += 4 + 4 * tags.length
    val tenPos = cur; cur = align4(cur + 4 + tenB.length + 1)
    val nsPos = cur; cur = align4(cur + 4 + nsB.length + 1)
    val buf = ByteBuffer.allocate(cur).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0, tPos) // root uoffset
    // vtable
    buf.putShort(vtPos, VtableLen.toShort)
    buf.putShort(vtPos + 2, TableLen.toShort)
    var s = 0
    while (s < NumSlots) {
      buf.putShort(vtPos + 4 + 2 * s, SlotOffsets(s).toShort); s += 1
    }
    // table
    buf.putInt(tPos, tPos - vtPos) // soffset: vtable is BEFORE the table
    buf.putLong(tPos + 8, r.epoch)
    buf.putLong(tPos + 16, r.idHash)
    buf.putLong(tPos + 24, r.tenantNsHash)
    buf.putLong(tPos + 32, r.timestampNanos)
    buf.putInt(tPos + 40, idPos - (tPos + 40))
    buf.putInt(tPos + 44, vecPos - (tPos + 44))
    buf.putInt(tPos + 48, tagsPos - (tPos + 48))
    buf.putInt(tPos + 52, tenPos - (tPos + 52))
    buf.putInt(tPos + 56, nsPos - (tPos + 56))
    buf.putInt(tPos + 60, r.flags)
    buf.putShort(tPos + 64, r.dim.toShort)
    buf.putShort(tPos + 66, r.centroidId.toShort)
    buf.put(tPos + 68, r.op)
    // children
    def putString(pos: Int, b: Array[Byte]): Unit = {
      buf.putInt(pos, b.length)
      var i = 0
      while (i < b.length) { buf.put(pos + 4 + i, b(i)); i += 1 }
      buf.put(pos + 4 + b.length, 0.toByte) // NUL terminator
    }
    putString(idPos, idB)
    buf.putInt(vecPos, vec.length)
    var i = 0
    while (i < vec.length) { buf.putFloat(vecPos + 4 + 4 * i, vec(i)); i += 1 }
    buf.putInt(tagsPos, tags.length)
    i = 0
    while (i < tags.length) { buf.putInt(tagsPos + 4 + 4 * i, tags(i)); i += 1 }
    putString(tenPos, tenB)
    putString(nsPos, nsB)
    buf.array()
  }

  def decode(bytes: Array[Byte]): WalRecord = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val tPos = buf.getInt(0)
    val vtPos = tPos - buf.getInt(tPos) // soffset is signed — any layout
    val vtLen = buf.getShort(vtPos) & 0xffff
    // general vtable walk: absent slots (beyond vtLen or stored 0) → default
    def field(slot: Int): Int = {
      val e = 4 + 2 * slot
      if (e + 2 > vtLen) 0
      else buf.getShort(vtPos + e) & 0xffff
    }
    def indirect(off: Int): Int = tPos + off + buf.getInt(tPos + off)
    def str(slot: Int): String = {
      val off = field(slot)
      if (off == 0) ""
      else {
        val p = indirect(off)
        val len = buf.getInt(p)
        new String(bytes, p + 4, len, StandardCharsets.UTF_8)
      }
    }
    def floats(slot: Int): Array[Float] = {
      val off = field(slot)
      if (off == 0) Array.empty
      else {
        val p = indirect(off)
        val n = buf.getInt(p)
        Array.tabulate(n)(i => buf.getFloat(p + 4 + 4 * i))
      }
    }
    def ints(slot: Int): Array[Int] = {
      val off = field(slot)
      if (off == 0) Array.empty
      else {
        val p = indirect(off)
        val n = buf.getInt(p)
        Array.tabulate(n)(i => buf.getInt(p + 4 + 4 * i))
      }
    }
    def i8(slot: Int): Byte = {
      val off = field(slot); if (off == 0) 0 else buf.get(tPos + off)
    }
    def u16(slot: Int): Int = {
      val off = field(slot)
      if (off == 0) 0 else buf.getShort(tPos + off) & 0xffff
    }
    def u32(slot: Int): Int = {
      val off = field(slot); if (off == 0) 0 else buf.getInt(tPos + off)
    }
    def u64(slot: Int): Long = {
      val off = field(slot); if (off == 0) 0L else buf.getLong(tPos + off)
    }
    WalRecord(op = i8(0), id = str(1), idHash = u64(2),
      tenantNsHash = u64(3), timestampNanos = u64(4), dim = u16(5),
      vector = floats(6), tags = ints(7), flags = u32(8), epoch = u64(9),
      centroidId = u16(10), tenant = str(11), namespace = str(12))
  }
}
