package graft.functions

import graft.sources.Flac
import graft.sources.Flac.{BitReader, BitWriter}

/** GAC — the "graft audio codec": a COMPLETE lossy audio bitstream
  * composed from the engine's verified pieces in exactly the
  * arrangement the AAC/Vorbis/Opus-CELT family uses (the reference
  * transcodes those through libav codec contexts,
  * /root/reference/streamtasks/media/codec.py:50-135; its audio codec
  * matrix pins the inverse-transcode property,
  * tests/media/test_audio_codec.py:10-28):
  *
  *  - TRANSFORM: p11's lapped sine-window MDCT ([[Codec.Mdct]]'s
  *    forward/inverse — TDAC, so synthesis overlap-add is exact
  *    absent quantization);
  *  - QUANTIZER: per-BAND scalefactors (AAC's scalefactor-band idea,
  *    psychoacoustic-free: each band of coefficients gets the
  *    smallest power-of-two scale putting its peak inside int8, so
  *    quiet bands keep precision that p11's whole-block scale gives
  *    away);
  *  - ENTROPY: p13's Rice coder with a per-band optimal parameter
  *    over zigzagged quantized coefficients — near-silent bands cost
  *    ~1 bit/coefficient instead of the flat 8 of p11's layout;
  *  - FRAMING: ADTS-shaped self-contained frames — 12-bit sync
  *    0xFFF, flag bits, a 13-bit frame length, and a CRC-16
  *    (poly 0x8005, FLAC's frame CRC) over the coded body, so a
  *    receiver can resynchronize and detect corruption mid-stream.
  *
  * Packet layout: `"GACS"` + u32le sampleCount + u32le frameCount +
  * a CRC-8 (poly 0x07, FLAC's header CRC) over those 12 bytes — the
  * frames are individually CRC-16'd, so an unprotected stream header
  * would be the one place a bit flip could silently change the
  * decoded length — then one ADTS-shaped frame per MDCT block:
  * `FF F0 | len>>5 | (len&0x1F)<<3 | blk%8` (4 B header, len = total
  * frame bytes), CRC-16 (2 B, over the body), body = per band:
  * 5-bit scale, 3-bit Rice k, Rice codes of the zigzagged
  * coefficients; byte-aligned per frame.
  *
  * Lossy by the quantizer only, like every codec in the family; the
  * p14 query pins the inverse-transcode SNR and the entropy win
  * under the driver's oracle gate, CodecSpec pins frame validation
  * and adds GAC to the audio transcode matrix. */
final case class Gac(frameN: Int = 128, bandSize: Int = 8,
    qstep: Double = 12.0) extends Codec {
  require(frameN % bandSize == 0, s"frameN $frameN % bandSize $bandSize")
  val name = s"gac-$frameN-$bandSize"

  private val mdct = Codec.Mdct(frameN, qstep)
  private val nBands = frameN / bandSize

  @inline private def zigzag(r: Int): Long = if (r < 0) -2L * r - 1 else 2L * r
  @inline private def unzigzag(z: Long): Int =
    (if ((z & 1) == 1) -(z + 1) / 2 else z / 2).toInt

  private def bestK(zs: Array[Long]): Int = {
    var best = 0
    var bestCost = Long.MaxValue
    var k = 0
    while (k <= 7) {
      var c = 0L
      var i = 0
      while (i < zs.length) { c += (zs(i) >> k) + 1 + k; i += 1 }
      if (c < bestCost) { bestCost = c; best = k }
      k += 1
    }
    best
  }

  def encode(raw: Array[Byte]): Array[Byte] = {
    // same fail-loud contract as Wav.samples16: an odd byte count is a
    // malformed s16 stream, not a stream with a droppable tail
    require(raw.length % 2 == 0,
      s"gac: s16 input has odd byte length ${raw.length}")
    val n = raw.length / 2
    val mPad = ((n + frameN - 1) / frameN) * frameN
    val x = new Array[Double](mPad + 2 * frameN)
    var i = 0
    while (i < n) {
      x(i + frameN) =
        ((raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)).toShort.toDouble
      i += 1
    }
    val blocks = mPad / frameN + 1
    val out = new java.io.ByteArrayOutputStream()
    out.write('G'); out.write('A'); out.write('C'); out.write('S')
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    u32le(n); u32le(blocks)
    val hdr = out.toByteArray
    out.write(Flac.crc8(hdr, 0, 12))
    val block = new Array[Double](2 * frameN)
    var b = 0
    while (b < blocks) {
      System.arraycopy(x, b * frameN, block, 0, 2 * frameN)
      val c = mdct.forward(block)
      val bw = new BitWriter
      var band = 0
      while (band < nBands) {
        var m = 0.0
        var k = 0
        while (k < bandSize) {
          val a = math.abs(c(band * bandSize + k)); if (a > m) m = a; k += 1
        }
        var s = 0
        while (m / (qstep * (1L << s)) > 127.0 && s < 30) s += 1
        val step = qstep * (1L << s)
        val zs = new Array[Long](bandSize)
        k = 0
        while (k < bandSize) {
          val q = math.max(-127, math.min(127,
            math.round(c(band * bandSize + k) / step).toInt))
          zs(k) = zigzag(q); k += 1
        }
        val rk = bestK(zs)
        bw.writeBits(s.toLong, 5)
        bw.writeBits(rk.toLong, 3)
        k = 0
        while (k < bandSize) {
          bw.writeUnary(zs(k) >> rk)
          bw.writeBits(zs(k), rk)
          k += 1
        }
        band += 1
      }
      val body = bw.toBytes
      val len = 4 + 2 + body.length
      require(len < (1 << 13), s"gac: frame length $len exceeds 13 bits")
      out.write(0xFF); out.write(0xF0)
      out.write((len >> 5) & 0xff)
      out.write(((len & 0x1F) << 3) | (b % 8))
      val crc = Flac.crc16(body, 0, body.length)
      out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      out.write(body, 0, body.length)
      b += 1
    }
    out.toByteArray
  }

  def decode(packet: Array[Byte]): Array[Byte] = {
    require(packet.length >= 13 && packet(0) == 'G' && packet(1) == 'A' &&
      packet(2) == 'C' && packet(3) == 'S', "gac: bad stream marker")
    require((packet(12) & 0xff) == Flac.crc8(packet, 0, 12),
      "gac: stream header CRC-8 mismatch")
    def u32le(off: Int): Int =
      (packet(off) & 0xff) | ((packet(off + 1) & 0xff) << 8) |
        ((packet(off + 2) & 0xff) << 16) | ((packet(off + 3) & 0xff) << 24)
    val n = u32le(4)
    val blocks = u32le(8)
    require(n >= 0 && blocks >= 1, s"gac: header $n samples / $blocks frames")
    // the encoder's invariant: blocks = ceil(n/frameN) + 1 (the lapped
    // trailing block) — a header that disagrees is corrupt even when
    // its CRC was recomputed by an attacker of one field only
    require(blocks == (n + frameN - 1) / frameN + 1,
      s"gac: $blocks frames inconsistent with $n samples at frameN $frameN")
    // the overlap-add buffer holds (blocks+1)·frameN samples and the
    // readout reads y(i + frameN) for i < n — a corrupt header would
    // otherwise surface as a raw ArrayIndexOutOfBounds
    require(n <= blocks * frameN,
      s"gac: header claims $n samples but $blocks frames carry at most " +
        s"${blocks * frameN}")
    val mPad = (blocks - 1) * frameN
    val y = new Array[Double](mPad + 2 * frameN)
    val coef = new Array[Double](frameN)
    var off = 13
    var b = 0
    while (b < blocks) {
      require(off + 6 <= packet.length, s"gac: truncated frame $b header")
      require((packet(off) & 0xff) == 0xFF && (packet(off + 1) & 0xff) == 0xF0,
        f"gac: lost sync at frame $b (0x${packet(off) & 0xff}%02x" +
          f"${packet(off + 1) & 0xff}%02x)")
      val len = ((packet(off + 2) & 0xff) << 5) | ((packet(off + 3) & 0xff) >> 3)
      // a frame carries at least its own 6-byte header+CRC — without
      // this, len<6 would CRC an empty/negative range and then die
      // inside BitReader with a misleading eof error (len=0 would even
      // re-read the same bytes until the index tag mismatches)
      require(len >= 6,
        s"gac: frame $b length $len is shorter than the 6-byte header+CRC")
      require((packet(off + 3) & 0x07) == b % 8,
        s"gac: frame index tag mismatch at frame $b")
      require(off + len <= packet.length,
        s"gac: frame $b length $len overruns the packet")
      val crcStored = ((packet(off + 4) & 0xff) << 8) | (packet(off + 5) & 0xff)
      val crc = Flac.crc16(packet, off + 6, off + len)
      require(crc == crcStored,
        f"gac: CRC mismatch on frame $b (got $crc%04x want $crcStored%04x)")
      val br = new BitReader(packet, off + 6, off + len)
      var band = 0
      while (band < nBands) {
        val s = br.readBits(5).toInt
        val rk = br.readBits(3).toInt
        val step = qstep * (1L << s)
        var k = 0
        while (k < bandSize) {
          val z = (br.readUnary() << rk) | br.readBits(rk)
          coef(band * bandSize + k) = unzigzag(z).toDouble * step
          k += 1
        }
        band += 1
      }
      val inv = mdct.inverse(coef)
      val boff = b * frameN
      var k = 0
      while (k < 2 * frameN) { y(boff + k) += inv(k); k += 1 }
      off += len
      b += 1
    }
    require(off == packet.length,
      s"gac: ${packet.length - off} trailing bytes after the last frame")
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = math.max(-32768,
        math.min(32767, math.round(y(i + frameN)).toInt))
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
