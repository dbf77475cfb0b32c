package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII

/** FLAC — the lossless audio format in the reference's container
  * test matrix (`/root/reference/tests/media/test_containers.py:29`
  * `test_flac_audio_container`: AudioCodecInfo("flac", 1, 16000,
  * "s16") muxed and demuxed through libav). This module implements
  * the format itself from the public specification (RFC 9639): the
  * `fLaC` marker, a STREAMINFO metadata block carrying the MD5 of
  * the unencoded samples, and frames of fixed-predictor subframes
  * with Rice-coded residuals, CRC-8-protected headers and a
  * CRC-16-protected footer. It is the engine's entropy-coding leg:
  * μ-law (p07) is stateless companding, IMA-ADPCM (p10) adaptive
  * differential, MDCT (p11) transform+quantize — FLAC adds the
  * prediction + variable-length entropy-code structure every real
  * lossy/lossless codec family shares (the same Rice/exp-Golomb
  * machinery h264's CAVLC or Shorten/ALAC use).
  *
  * Encoder subset (all spec-conformant choices a real decoder
  * accepts): fixed block size, independent channels, 16-bit samples,
  * subframe types CONSTANT / FIXED order 0–2 chosen by minimal
  * sum-of-abs-residual (ties to the lower order), one Rice partition
  * (partition order 0) with parameter k ∈ [0,14] chosen by exact
  * minimal bit cost (ties to the smaller k). The decoder is wider
  * than the encoder — foreign files with LPC subframes, FIXED orders
  * 3–4, VERBATIM, stereo decorrelation (left/side, right/side,
  * mid/side), wasted bits, rice2 (5-bit parameter) and escaped
  * partitions, and multi-partition residuals all decode, with sync
  * codes and both CRCs verified.
  *
  * Scale: like [[Riff]]/[[Mkv]]/[[IsoBmff]], encode/decode are
  * per-group executor kernels over a `binary` column — one file's
  * bytes never span executors and never visit the driver.
  */
object Flac {

  // ---- bit IO (FLAC is big-endian, MSB-first) -----------------------------

  final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0

    /** Bits pending below the byte boundary (0..7). */
    def pendingBits: Int = nAcc

    def writeBits(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"bit run out of range: $n")
      acc = (acc << n) | (value & ((1L << n) - 1))
      nAcc += n
      while (nAcc >= 8) {
        nAcc -= 8
        buf.write(((acc >>> nAcc) & 0xff).toInt)
      }
    }

    /** FLAC unary: q zero bits then a one bit. */
    def writeUnary(q: Long): Unit = {
      var left = q
      while (left >= 32) { writeBits(0L, 32); left -= 32 }
      writeBits(1L, left.toInt + 1)
    }

    /** Signed two's-complement value in n bits. */
    def writeSigned(value: Long, n: Int): Unit = writeBits(value, n)

    def alignByte(): Unit = if (nAcc > 0) writeBits(0L, 8 - nAcc)

    def toBytes: Array[Byte] = { alignByte(); buf.toByteArray }

    def bitLength: Long = buf.size.toLong * 8 + nAcc
  }

  final class BitReader(bytes: Array[Byte], start: Int, val end: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var pos = start // byte position
    private var bit = 0     // bits consumed within bytes(pos)

    def bytePos: Int = pos
    /** Absolute bit position (byte·8 + intra-byte bits) — differences
      * give exact bits-consumed counts (Mp3's part2_3_length check). */
    def bitPos: Long = pos.toLong * 8 + bit
    def aligned: Boolean = bit == 0
    def atEnd: Boolean = pos >= end

    def readBit(): Int = {
      if (pos >= end) throw new IllegalArgumentException("flac: eof in bitstream")
      val v = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }

    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L
      else if ((v & (1L << (n - 1))) != 0) v - (1L << n)
      else v
    }

    def readUnary(): Long = {
      var q = 0L
      while (readBit() == 0) q += 1
      q
    }

    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005) ------

  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---- the extended-UTF-8 coded number (frame/sample number) --------------

  /** Number of bytes the coded number for n occupies (n ≥ 0, < 2^36). */
  def codedNumberLength(n: Long): Int =
    if (n < (1L << 7)) 1
    else if (n < (1L << 11)) 2
    else if (n < (1L << 16)) 3
    else if (n < (1L << 21)) 4
    else if (n < (1L << 26)) 5
    else if (n < (1L << 31)) 6
    else 7

  def writeCodedNumber(w: BitWriter, n: Long): Unit = {
    val len = codedNumberLength(n)
    if (len == 1) w.writeBits(n, 8)
    else {
      // first byte: len leading ones, a zero, then the top payload bits
      val payloadBits = 6 * (len - 1) // bits carried by continuation bytes
      val headBits = 7 - len          // payload bits in the first byte
      val head = ((0xff << (8 - len)) & 0xff) | ((n >>> payloadBits) & ((1 << headBits) - 1)).toInt
      w.writeBits(head.toLong, 8)
      var rem = payloadBits
      while (rem > 0) {
        rem -= 6
        w.writeBits(0x80L | ((n >>> rem) & 0x3f), 8)
      }
    }
  }

  def readCodedNumber(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var len = 0
      while (len < 8 && ((b0 << len) & 0x80) != 0) len += 1
      require(len >= 2 && len <= 7, s"flac: bad coded-number head $b0")
      var v = (b0 & (0x7f >> len)).toLong
      var i = 1
      while (i < len) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, "flac: bad coded-number continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // ---- stream-level structures ---------------------------------------------

  final case class StreamInfo(
      minBlockSize: Int,
      maxBlockSize: Int,
      minFrameSize: Int,
      maxFrameSize: Int,
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      totalSamples: Long,
      md5: Array[Byte])

  /** MD5 of the unencoded audio: interleaved little-endian samples
    * (16-bit here), the exact digest STREAMINFO carries. */
  def rawMd5(channels: Array[Array[Int]]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = if (channels.isEmpty) 0 else channels(0).length
    val one = new Array[Byte](2 * channels.length)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels.length) {
        val v = channels(c)(i)
        one(2 * c) = (v & 0xff).toByte
        one(2 * c + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      md.update(one)
      i += 1
    }
    md.digest()
  }

  /** Frame-header block-size code: (4-bit code, end-of-header escape
    * bytes 0/1/2). Covers every n ∈ [1, 65536]. */
  def blockSizeCode(n: Int): (Int, Int) = n match {
    case 192 => (1, 0)
    case 576 => (2, 0)
    case 1152 => (3, 0)
    case 2304 => (4, 0)
    case 4608 => (5, 0)
    case 256 => (8, 0)
    case 512 => (9, 0)
    case 1024 => (10, 0)
    case 2048 => (11, 0)
    case 4096 => (12, 0)
    case 8192 => (13, 0)
    case 16384 => (14, 0)
    case 32768 => (15, 0)
    case _ if n <= 256 => (6, 1)  // 8-bit (n-1) after the header
    case _ => (7, 2)              // 16-bit (n-1) after the header
  }

  /** Header sample-rate code; 0 defers to STREAMINFO (always valid). */
  def sampleRateCode(hz: Int): Int = hz match {
    case 88200 => 1
    case 176400 => 2
    case 192000 => 3
    case 8000 => 4
    case 16000 => 5
    case 22050 => 6
    case 24000 => 7
    case 32000 => 8
    case 44100 => 9
    case 48000 => 10
    case 96000 => 11
    case _ => 0
  }

  private val SampleRateByCode: Map[Int, Int] =
    (1 to 11).map(c => c -> Seq(88200, 176400, 192000, 8000, 16000, 22050,
      24000, 32000, 44100, 48000, 96000)(c - 1)).toMap

  private val BitsByCode: Map[Int, Int] =
    Map(1 -> 8, 2 -> 12, 4 -> 16, 5 -> 20, 6 -> 24, 7 -> 32)

  // ---- fixed predictors -----------------------------------------------------

  /** Residuals of fixed predictor `order` over x, for i ∈ [order, n).
    * Orders are the standard polynomial predictors (order 2 =
    * x[i] − 2x[i−1] + x[i−2], etc.). */
  def fixedResiduals(x: Array[Int], order: Int): Array[Long] = {
    val n = x.length
    val out = new Array[Long](n - order)
    var i = order
    while (i < n) {
      out(i - order) = order match {
        case 0 => x(i).toLong
        case 1 => x(i).toLong - x(i - 1)
        case 2 => x(i).toLong - 2L * x(i - 1) + x(i - 2)
        case 3 => x(i).toLong - 3L * x(i - 1) + 3L * x(i - 2) - x(i - 3)
        case 4 => x(i).toLong - 4L * x(i - 1) + 6L * x(i - 2) - 4L * x(i - 3) + x(i - 4)
        case _ => throw new IllegalArgumentException(s"fixed order $order")
      }
      i += 1
    }
    out
  }

  /** Invert `fixedResiduals`: warmup ++ residuals → samples. */
  def fixedReconstruct(warmup: Array[Long], res: Array[Long], order: Int): Array[Long] = {
    val n = warmup.length + res.length
    val x = new Array[Long](n)
    System.arraycopy(warmup, 0, x, 0, warmup.length)
    var i = order
    while (i < n) {
      val r = res(i - order)
      x(i) = order match {
        case 0 => r
        case 1 => r + x(i - 1)
        case 2 => r + 2L * x(i - 1) - x(i - 2)
        case 3 => r + 3L * x(i - 1) - 3L * x(i - 2) + x(i - 3)
        case 4 => r + 4L * x(i - 1) - 6L * x(i - 2) + 4L * x(i - 3) - x(i - 4)
        case _ => throw new IllegalArgumentException(s"fixed order $order")
      }
      i += 1
    }
    x
  }

  def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1
  def unzigzag(z: Long): Long = if ((z & 1) == 0) z >> 1 else -((z + 1) >> 1)

  /** Exact Rice bit cost of the residual set at parameter k. */
  def riceCost(zs: Array[Long], k: Int): Long = {
    var bits = 0L
    var i = 0
    while (i < zs.length) { bits += (zs(i) >>> k) + 1 + k; i += 1 }
    bits
  }

  /** Encoder's deterministic choices for one channel of one block:
    * (order, k). Order ∈ {0,1,2} ∩ [0, n), minimal Σ|residual| with
    * ties to the lower order; k ∈ [0,14], minimal exact bit cost with
    * ties to the smaller k. The p13 oracle re-derives both rules in
    * SQL — any drift breaks the hash. */
  def chooseFixed(x: Array[Int]): (Int, Int) = {
    val maxOrder = math.min(2, x.length - 1)
    var bestO = 0
    var bestCost = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResiduals(x, o)
      var c = 0L
      var i = 0
      while (i < res.length) { c += math.abs(res(i)); i += 1 }
      if (c < bestCost) { bestCost = c; bestO = o }
      o += 1
    }
    val zs = fixedResiduals(x, bestO).map(zigzag)
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val b = riceCost(zs, k)
      if (b < bestBits) { bestBits = b; bestK = k }
      k += 1
    }
    (bestO, bestK)
  }

  // ---- encode ---------------------------------------------------------------

  /** Encode one frame (all channels of one block) including header,
    * subframes, padding and CRC-16. `frameNumber` is the fixed-block
    * strategy frame index. */
  def encodeFrame(block: Array[Array[Int]], frameNumber: Long, sampleRate: Int,
      bps: Int): Array[Byte] = {
    require(bps == 16, "encoder subset: 16-bit samples")
    val n = block(0).length
    val w = new BitWriter
    val (bsCode, bsEsc) = blockSizeCode(n)
    w.writeBits(0x3ffe, 14)                   // sync
    w.writeBits(0, 1)                         // reserved
    w.writeBits(0, 1)                         // blocking strategy: fixed
    w.writeBits(bsCode.toLong, 4)
    w.writeBits(sampleRateCode(sampleRate).toLong, 4)
    w.writeBits((block.length - 1).toLong, 4) // independent channels
    w.writeBits(4, 3)                         // sample size: 16 bit
    w.writeBits(0, 1)                         // reserved
    writeCodedNumber(w, frameNumber)
    if (bsEsc == 1) w.writeBits((n - 1).toLong, 8)
    else if (bsEsc == 2) w.writeBits((n - 1).toLong, 16)
    val headerBytes = w.toBytes // header is whole bytes by construction
    val w2 = new BitWriter
    headerBytes.foreach(b => w2.writeBits(b & 0xffL, 8))
    w2.writeBits(crc8(headerBytes, 0, headerBytes.length).toLong, 8)

    block.foreach { x =>
      val constant = x.forall(_ == x(0))
      if (constant) {
        w2.writeBits(0, 1); w2.writeBits(0, 6); w2.writeBits(0, 1) // CONSTANT
        w2.writeSigned(x(0).toLong, bps)
      } else {
        val (order, k) = chooseFixed(x)
        w2.writeBits(0, 1)
        w2.writeBits(8L + order, 6) // FIXED, 001ooo
        w2.writeBits(0, 1)          // no wasted bits
        var i = 0
        while (i < order) { w2.writeSigned(x(i).toLong, bps); i += 1 }
        w2.writeBits(0, 2) // residual method: rice, 4-bit parameter
        w2.writeBits(0, 4) // partition order 0
        w2.writeBits(k.toLong, 4)
        val res = fixedResiduals(x, order)
        i = 0
        while (i < res.length) {
          val z = zigzag(res(i))
          w2.writeUnary(z >>> k)
          w2.writeBits(z, k)
          i += 1
        }
      }
    }
    val body = w2.toBytes // alignByte pads the frame to a byte boundary
    val out = new java.io.ByteArrayOutputStream(body.length + 2)
    out.write(body)
    val c = crc16(body, 0, body.length)
    out.write((c >> 8) & 0xff); out.write(c & 0xff)
    out.toByteArray
  }

  /** Encode a whole .flac file: fLaC marker + STREAMINFO (with the
    * raw-sample MD5) + frames. `channels` must be equal-length. */
  def encodeFile(channels: Array[Array[Int]], sampleRate: Int,
      blockSize: Int = 4096): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 8, "1..8 channels")
    val n = channels(0).length
    require(channels.forall(_.length == n), "channel length mismatch")
    require(blockSize >= 16 && blockSize <= 65535, s"block size $blockSize")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 0
    var fn = 0L
    while (off < n) {
      val len = math.min(blockSize, n - off)
      val block = channels.map(ch => java.util.Arrays.copyOfRange(ch, off, off + len))
      frames += encodeFrame(block, fn, sampleRate, 16)
      off += len
      fn += 1
    }
    val minF = if (frames.isEmpty) 0 else frames.map(_.length).min
    val maxF = if (frames.isEmpty) 0 else frames.map(_.length).max
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes(US_ASCII))
    // STREAMINFO: last-block flag set, type 0, length 34
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(blockSize.toLong, 16)
    si.writeBits(minF.toLong, 24)
    si.writeBits(maxF.toLong, 24)
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels.length - 1).toLong, 3)
    si.writeBits(15L, 5) // bps - 1 = 15
    si.writeBits(n.toLong, 36)
    out.write(si.toBytes)
    out.write(rawMd5(channels))
    frames.foreach(out.write)
    out.toByteArray
  }

  // ---- decode ---------------------------------------------------------------

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    require(r.readBit() == 0, "flac: subframe header padding bit set")
    val tpe = r.readBits(6).toInt
    val wastedFlag = r.readBit()
    val wasted =
      if (wastedFlag == 0) 0
      else { var w = 1; while (r.readBit() == 0) w += 1; w } // unary k-1
    val eb = bps - wasted
    val out: Array[Long] =
      if (tpe == 0) { // CONSTANT
        val v = r.readSigned(eb)
        Array.fill(n)(v)
      } else if (tpe == 1) { // VERBATIM
        Array.fill(n)(r.readSigned(eb))
      } else if ((tpe & 0x38) == 0x08) { // FIXED 001ooo
        val order = tpe & 0x07
        require(order <= 4, s"flac: fixed order $order")
        require(order <= n, "flac: fixed order exceeds block size")
        val warm = Array.fill(order)(r.readSigned(eb))
        val res = decodeResiduals(r, n, order)
        fixedReconstruct(warm, res, order)
      } else if ((tpe & 0x20) != 0) { // LPC 1ooooo
        val order = (tpe & 0x1f) + 1
        require(order <= n, "flac: lpc order exceeds block size")
        val warm = Array.fill(order)(r.readSigned(eb))
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "flac: lpc precision escape")
        val shift = r.readSigned(5).toInt
        require(shift >= 0, "flac: negative lpc shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = decodeResiduals(r, n, order)
        val x = new Array[Long](n)
        System.arraycopy(warm, 0, x, 0, order)
        var i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * x(i - 1 - j); j += 1 }
          x(i) = res(i - order) + (acc >> shift)
          i += 1
        }
        x
      } else throw new IllegalArgumentException(s"flac: reserved subframe type $tpe")
    if (wasted == 0) out else out.map(_ << wasted)
  }

  private def decodeResiduals(r: BitReader, blockSize: Int, order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    require(blockSize % parts == 0, "flac: partition order does not divide block")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      require(count >= 0, "flac: negative partition sample count")
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val prec = r.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.readSigned(prec); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val z = (q << param) | r.readBits(param)
          out(idx) = unzigzag(z)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  /** Decode one frame starting at `off`. Returns (channels-of-block,
    * byte length consumed). Verifies sync, CRC-8 and CRC-16. */
  def decodeFrame(bytes: Array[Byte], off: Int, si: StreamInfo): (Array[Array[Long]], Int) = {
    val r = new BitReader(bytes, off, bytes.length)
    require(r.readBits(14) == 0x3ffe, "flac: lost frame sync")
    require(r.readBit() == 0, "flac: reserved bit set")
    val blockingStrategy = r.readBit()
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chanCode = r.readBits(4).toInt
    val sizeCode = r.readBits(3).toInt
    require(r.readBit() == 0, "flac: reserved bit set")
    readCodedNumber(r) // frame/sample number (position-redundant here)
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("flac: reserved block size code")
      case 1 => 192
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case c => 256 << (c - 8)
    }
    srCode match {
      case 0 => ()
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case 15 => throw new IllegalArgumentException("flac: invalid sample rate code")
      case c => require(SampleRateByCode(c) == si.sampleRate,
        "flac: frame sample rate disagrees with STREAMINFO")
    }
    val headerEnd = r.bytePos
    require(r.aligned, "flac: header not byte aligned")
    val expectedCrc8 = crc8(bytes, off, headerEnd)
    require((r.readBits(8) & 0xff) == expectedCrc8, "flac: frame header CRC-8 mismatch")

    val bps = if (sizeCode == 0) si.bitsPerSample
      else BitsByCode.getOrElse(sizeCode,
        throw new IllegalArgumentException(s"flac: reserved sample size $sizeCode"))

    val (nCh, stereoMode) = chanCode match {
      case c if c <= 7 => (c + 1, -1)
      case 8 => (2, 0)  // left/side
      case 9 => (2, 1)  // right/side
      case 10 => (2, 2) // mid/side
      case c => throw new IllegalArgumentException(s"flac: reserved channels $c")
    }
    require(nCh == si.channels, "flac: frame channel count disagrees with STREAMINFO")

    val subs = Array.tabulate(nCh) { c =>
      // the side channel of a decorrelated pair carries one extra bit
      val extra = stereoMode match {
        case 0 if c == 1 => 1
        case 1 if c == 0 => 1
        case 2 if c == 1 => 1
        case _ => 0
      }
      decodeSubframe(r, blockSize, bps + extra)
    }
    val chans: Array[Array[Long]] = stereoMode match {
      case -1 => subs
      case 0 => // left/side: right = left - side
        Array(subs(0), Array.tabulate(blockSize)(i => subs(0)(i) - subs(1)(i)))
      case 1 => // right/side: left = right + side
        Array(Array.tabulate(blockSize)(i => subs(1)(i) + subs(0)(i)), subs(1))
      case 2 => // mid/side
        Array.tabulate(2) { c =>
          Array.tabulate(blockSize) { i =>
            val mid = (subs(0)(i) << 1) | (subs(1)(i) & 1)
            val side = subs(1)(i)
            if (c == 0) (mid + side) >> 1 else (mid - side) >> 1
          }
        }
    }
    r.alignByte()
    val bodyEnd = r.bytePos
    val expectedCrc16 = crc16(bytes, off, bodyEnd)
    val gotCrc16 = r.readBits(16).toInt
    require(gotCrc16 == expectedCrc16, "flac: frame CRC-16 mismatch")
    require(blockingStrategy == 0 || blockingStrategy == 1, "flac: blocking strategy")
    (chans, r.bytePos - off)
  }

  /** Parse a .flac file: STREAMINFO + all frames. Unknown metadata
    * blocks (padding, vorbis comments, seektables…) are skipped the
    * way real readers skip them. Returns the stream info and the
    * decoded channels. */
  def decodeFile(bytes: Array[Byte]): (StreamInfo, Array[Array[Int]]) = {
    require(bytes.length >= 42 && fourCC(bytes) == "fLaC", "flac: bad stream marker")
    var off = 4
    var si: StreamInfo = null
    var last = false
    while (!last) {
      require(off + 4 <= bytes.length, "flac: truncated metadata header")
      val h = bytes(off) & 0xff
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      require(off + 4 + len <= bytes.length, "flac: truncated metadata block")
      require(tpe != 127, "flac: forbidden metadata block type")
      if (tpe == 0) {
        require(len == 34, s"flac: STREAMINFO length $len")
        val r = new BitReader(bytes, off + 4, off + 4 + len)
        si = StreamInfo(
          minBlockSize = r.readBits(16).toInt,
          maxBlockSize = r.readBits(16).toInt,
          minFrameSize = r.readBits(24).toInt,
          maxFrameSize = r.readBits(24).toInt,
          sampleRate = r.readBits(20).toInt,
          channels = r.readBits(3).toInt + 1,
          bitsPerSample = r.readBits(5).toInt + 1,
          totalSamples = r.readBits(36),
          md5 = java.util.Arrays.copyOfRange(bytes, off + 4 + 18, off + 4 + 34))
      }
      off += 4 + len
    }
    require(si != null, "flac: missing STREAMINFO")
    // RFC 9639 §8.2: total_samples = 0 means UNKNOWN (a streaming-
    // style file), not zero samples — decode frames until the bytes
    // run out instead of silently returning an empty stream.
    val unknownTotal = si.totalSamples == 0L
    val chans = Array.fill(si.channels)(
      new scala.collection.mutable.ArrayBuffer[Int](
        if (unknownTotal) 16 else si.totalSamples.toInt))
    var got = 0L
    while (if (unknownTotal) off < bytes.length else got < si.totalSamples) {
      val (block, used) = decodeFrame(bytes, off, si)
      var c = 0
      while (c < si.channels) {
        block(c).foreach { v =>
          require(v >= Int.MinValue && v <= Int.MaxValue, "flac: sample overflow")
          chans(c) += v.toInt
        }
        c += 1
      }
      got += block(0).length
      off += used
    }
    require(unknownTotal || got == si.totalSamples,
      "flac: sample count overrun")
    (si, chans.map(_.toArray))
  }

  private def fourCC(b: Array[Byte]): String = new String(b, 0, 4, US_ASCII)
}
