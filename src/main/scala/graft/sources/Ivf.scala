package graft.sources

import java.io.ByteArrayOutputStream

/** IVF container + VP8 frame-tag parsing — the VP8 leg of the
  * real-bitstream indexing matrix (the reference runs vp8-in-webm
  * through libav, tests/media/test_containers.py:25; IVF is the
  * codec-development container every VP8/VP9 toolchain reads, and the
  * frame tag here is the in-WebM bitstream layout too, RFC 6386
  * §9.1):
  *
  *  - IVF (public libvpx format): 32-byte header "DKIF", version 0,
  *    header size, fourcc, u16le width/height, u32le timebase
  *    den/num, u32le frame count; then per frame a u32le payload
  *    size + u64le pts.
  *  - VP8 frame tag (RFC 6386 §9.1): 3 little-endian bytes — bit 0
  *    frame_type (0 = key), bits 1..3 version, bit 4 show_frame,
  *    bits 5..23 first-partition size; KEY frames continue with the
  *    start code 9D 01 2A and 14-bit width/height each with a 2-bit
  *    upscale code.
  *
  * Writers emit conformant headers around opaque payloads (this is
  * the INDEX layer — pixel reconstruction is the codec's job, and the
  * engine's own composed codec m36 covers those mechanics); parsers
  * validate magics, sizes and the keyframe start code loudly. */
object Ivf {

  final case class IvfHeader(fourcc: String, width: Int, height: Int,
      timebaseDen: Long, timebaseNum: Long, frameCount: Long)

  final case class IvfFrame(pts: Long, payload: Array[Byte])

  private def u16le(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def rd16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def rd64(b: Array[Byte], o: Int): Long =
    rd32(b, o) | (rd32(b, o + 4) << 32)

  def mux(hdr: IvfHeader, frames: Seq[IvfFrame]): Array[Byte] = {
    require(hdr.fourcc.length == 4, s"ivf fourcc '${hdr.fourcc}'")
    require(hdr.width > 0 && hdr.width <= 0xffff &&
      hdr.height > 0 && hdr.height <= 0xffff, s"ivf dims")
    require(hdr.frameCount == frames.size,
      s"ivf: header declares ${hdr.frameCount} frames, given ${frames.size}")
    require(hdr.timebaseDen >= 1 && hdr.timebaseDen <= 0xFFFFFFFFL &&
      hdr.timebaseNum >= 1 && hdr.timebaseNum <= 0xFFFFFFFFL,
      s"ivf: timebase ${hdr.timebaseDen}/${hdr.timebaseNum} outside u32 — " +
        "u32le would silently truncate")
    val out = new ByteArrayOutputStream()
    out.write('D'); out.write('K'); out.write('I'); out.write('F')
    u16le(out, 0); u16le(out, 32)
    hdr.fourcc.foreach(c => out.write(c))
    u16le(out, hdr.width); u16le(out, hdr.height)
    u32le(out, hdr.timebaseDen); u32le(out, hdr.timebaseNum)
    u32le(out, frames.size.toLong); u32le(out, 0L)
    frames.foreach { f =>
      u32le(out, f.payload.length.toLong)
      u32le(out, f.pts & 0xffffffffL); u32le(out, f.pts >>> 32)
      out.write(f.payload, 0, f.payload.length)
    }
    out.toByteArray
  }

  def demux(bytes: Array[Byte]): (IvfHeader, Seq[(Long, IvfFrame)]) = {
    require(bytes.length >= 32, "ivf: truncated header")
    require(bytes(0) == 'D' && bytes(1) == 'K' && bytes(2) == 'I' &&
      bytes(3) == 'F', "ivf: bad DKIF magic")
    require(rd16(bytes, 4) == 0, s"ivf: version ${rd16(bytes, 4)}")
    require(rd16(bytes, 6) == 32, s"ivf: header size ${rd16(bytes, 6)}")
    val hdr = IvfHeader(
      new String(bytes, 8, 4, java.nio.charset.StandardCharsets.US_ASCII),
      rd16(bytes, 12), rd16(bytes, 14), rd32(bytes, 16), rd32(bytes, 20),
      rd32(bytes, 24))
    val frames = Seq.newBuilder[(Long, IvfFrame)]
    var pos = 32
    var n = 0L
    while (pos < bytes.length) {
      require(pos + 12 <= bytes.length, s"ivf: truncated frame header at $pos")
      val size = rd32(bytes, pos)
      val pts = rd64(bytes, pos + 4)
      require(pos + 12 + size <= bytes.length,
        s"ivf: frame of $size B overruns the file at $pos")
      frames += ((pos.toLong, IvfFrame(pts,
        java.util.Arrays.copyOfRange(bytes, pos + 12, pos + 12 + size.toInt))))
      pos += 12 + size.toInt
      n += 1
    }
    require(n == hdr.frameCount,
      s"ivf: header declares ${hdr.frameCount} frames, walked $n")
    (hdr, frames.result())
  }

  // ---- VP8 frame tag (RFC 6386 §9.1) ----------------------------------------

  final case class Vp8Tag(keyframe: Boolean, version: Int,
      showFrame: Boolean, firstPartSize: Int, width: Int, height: Int,
      widthScale: Int, heightScale: Int)

  /** Build a frame payload with a conformant tag around opaque
    * partition bytes; key frames carry the start code + dimensions. */
  def vp8Frame(keyframe: Boolean, version: Int, showFrame: Boolean,
      width: Int, height: Int, body: Array[Byte],
      widthScale: Int = 0, heightScale: Int = 0): Array[Byte] = {
    require(version >= 0 && version <= 3, s"vp8 version $version")
    require(widthScale >= 0 && widthScale <= 3 &&
      heightScale >= 0 && heightScale <= 3,
      s"vp8 scale codes $widthScale/$heightScale beyond 2 bits")
    require(width > 0 && width <= 0x3fff && height > 0 && height <= 0x3fff,
      s"vp8 dims $width x $height")
    val out = new ByteArrayOutputStream()
    // RFC 6386 §9.1: the tag's size field counts the FIRST COMPRESSED
    // PARTITION only — the 3-byte tag and the 7-byte keyframe header
    // (start code + dimensions) are the uncompressed data chunk and
    // are NOT included
    val firstPart = body.length
    require(firstPart < (1 << 19), s"vp8 first partition $firstPart")
    val tag = (if (keyframe) 0 else 1) | (version << 1) |
      (if (showFrame) 1 << 4 else 0) | (firstPart << 5)
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    if (keyframe) {
      out.write(0x9d); out.write(0x01); out.write(0x2a)
      u16le(out, width | (widthScale << 14))  // 14-bit size, 2-bit upscale
      u16le(out, height | (heightScale << 14))
    }
    out.write(body, 0, body.length)
    out.toByteArray
  }

  def parseVp8Tag(payload: Array[Byte]): Vp8Tag = {
    require(payload.length >= 3, "vp8: truncated frame tag")
    val tag = (payload(0) & 0xff) | ((payload(1) & 0xff) << 8) |
      ((payload(2) & 0xff) << 16)
    val key = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val show = ((tag >> 4) & 1) == 1
    val part = tag >> 5
    if (!key) return Vp8Tag(key, version, show, part, 0, 0, 0, 0)
    require(payload.length >= 10, "vp8: truncated keyframe header")
    require((payload(3) & 0xff) == 0x9d && (payload(4) & 0xff) == 0x01 &&
      (payload(5) & 0xff) == 0x2a,
      f"vp8: bad keyframe start code ${payload(3) & 0xff}%02x" +
        f"${payload(4) & 0xff}%02x${payload(5) & 0xff}%02x")
    val w = rd16(payload, 6)
    val h = rd16(payload, 8)
    Vp8Tag(key, version, show, part,
      w & 0x3fff, h & 0x3fff, w >> 14, h >> 14)
  }
}
