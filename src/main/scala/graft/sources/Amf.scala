package graft.sources

import java.io.ByteArrayOutputStream

/** AMF0 — Action Message Format, the encoding RTMP command and data
  * messages carry, written from the public Adobe "AMF 0" spec. A live
  * publish opens with an `onMetaData` DATA message (RTMP type 18)
  * whose payload is an AMF0 string + ECMA array of stream metadata —
  * the bytes libav parses for stream configuration when the reference
  * opens an `rtmp://` URL (media/container.py:38-116); [[Rtmp]]
  * carries the framing, this is the payload encoding.
  *
  * Implemented markers (spec §2): Number 0x00 (IEEE-754 double,
  * big-endian), Boolean 0x01, String 0x02 (u16 length + UTF-8),
  * Object 0x03 (key/value pairs, "" + 0x09 end), Null 0x05, ECMA
  * Array 0x08 (u32 associative count + object-style entries + end),
  * Strict Array 0x0A (u32 count + values), Long String 0x0C (u32
  * length). Keys preserve encounter order (insertion-ordered maps) so
  * encode∘decode is byte-identical.
  */
object Amf {

  sealed trait Value
  final case class AmfNumber(v: Double) extends Value
  final case class AmfBoolean(v: Boolean) extends Value
  final case class AmfString(v: String) extends Value
  final case class AmfObject(entries: Seq[(String, Value)]) extends Value
  case object AmfNull extends Value
  final case class AmfEcmaArray(entries: Seq[(String, Value)]) extends Value
  final case class AmfStrictArray(values: Seq[Value]) extends Value

  private def u16(out: ByteArrayOutputStream, v: Int): Unit = {
    require(v >= 0 && v <= 0xFFFF, s"u16 out of range: $v")
    out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
  }
  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }
  private def keyBytes(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    u16(out, b.length); out.write(b)
  }
  private def entries(out: ByteArrayOutputStream,
      es: Seq[(String, Value)]): Unit = {
    es.foreach { case (k, v) => keyBytes(out, k); write(out, v) }
    u16(out, 0); out.write(0x09) // "" key + object-end marker
  }

  private def write(out: ByteArrayOutputStream, v: Value): Unit = v match {
    case AmfNumber(d) =>
      out.write(0x00)
      val bits = java.lang.Double.doubleToLongBits(d)
      var i = 56
      while (i >= 0) { out.write(((bits >> i) & 0xFF).toInt); i -= 8 }
    case AmfBoolean(b) => out.write(0x01); out.write(if (b) 1 else 0)
    case AmfString(s) =>
      val b = s.getBytes("UTF-8")
      if (b.length <= 0xFFFF) { out.write(0x02); u16(out, b.length) }
      else { out.write(0x0C); u32(out, b.length.toLong) }
      out.write(b)
    case AmfObject(es) => out.write(0x03); entries(out, es)
    case AmfNull => out.write(0x05)
    case AmfEcmaArray(es) =>
      out.write(0x08); u32(out, es.size.toLong); entries(out, es)
    case AmfStrictArray(vs) =>
      out.write(0x0A); u32(out, vs.size.toLong); vs.foreach(write(out, _))
  }

  /** Encode a sequence of top-level AMF0 values (an RTMP message body
    * is a concatenation, e.g. String "onMetaData" + ECMA array). */
  def encode(values: Seq[Value]): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    values.foreach(write(out, _))
    out.toByteArray
  }

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      require(pos < b.length, s"truncated AMF at $pos")
      val v = b(pos) & 0xFF; pos += 1; v
    }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u8().toLong << 24) | (u8().toLong << 16) |
      (u8().toLong << 8) | u8().toLong)
    def bytes(n: Int): Array[Byte] = {
      require(pos + n <= b.length, s"truncated AMF at $pos (+$n)")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def done: Boolean = pos >= b.length
  }

  private def readEntries(r: Reader): Seq[(String, Value)] = {
    val es = Seq.newBuilder[(String, Value)]
    var end = false
    while (!end) {
      val klen = r.u16()
      val k = new String(r.bytes(klen), "UTF-8")
      if (klen == 0) {
        // "" key must be followed by the object-end marker (the
        // encoder never emits an empty-keyed entry)
        val m = r.u8()
        require(m == 0x09, f"expected object-end 0x09, got 0x$m%02x")
        end = true
      } else es += k -> read(r)
    }
    es.result()
  }

  private def read(r: Reader): Value = r.u8() match {
    case 0x00 =>
      var bits = 0L
      var i = 0
      while (i < 8) { bits = (bits << 8) | r.u8().toLong; i += 1 }
      AmfNumber(java.lang.Double.longBitsToDouble(bits))
    case 0x01 => AmfBoolean(r.u8() != 0)
    case 0x02 => AmfString(new String(r.bytes(r.u16()), "UTF-8"))
    case 0x03 => AmfObject(readEntries(r))
    case 0x05 => AmfNull
    case 0x08 =>
      r.u32() // associative count is advisory; the end marker is the truth
      AmfEcmaArray(readEntries(r))
    case 0x0A =>
      val n = r.u32()
      AmfStrictArray((0L until n).map(_ => read(r)))
    case 0x0C =>
      val n = r.u32()
      require(n <= Int.MaxValue, s"long string length $n")
      AmfString(new String(r.bytes(n.toInt), "UTF-8"))
    case m => sys.error(f"unsupported AMF0 marker 0x$m%02x")
  }

  /** Decode all top-level values from an RTMP message body. */
  def decode(bytes: Array[Byte]): Seq[Value] = {
    val r = new Reader(bytes)
    val vs = Seq.newBuilder[Value]
    while (!r.done) vs += read(r)
    vs.result()
  }
}
