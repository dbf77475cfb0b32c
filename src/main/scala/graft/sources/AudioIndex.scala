package graft.sources

import java.io.ByteArrayOutputStream

/** Frame-header indexers for the two dominant REAL audio bitstreams —
  * the audio counterpart of [[H264]]'s NAL indexing (the reference
  * decodes aac/mp3 through libav, media/codec.py:50-135; a 100 TB
  * audio-curation pipeline needs frame counts, durations, rates and
  * bitrate histograms from raw files far more often than PCM):
  *
  *  - ADTS (ISO/IEC 13818-7 §6.2): the framing real .aac files use —
  *    12-bit syncword 0xFFF, MPEG version, protection flag, AAC
  *    profile, sampling-frequency index (the spec's 13-entry table),
  *    channel configuration, the 13-bit frame length that makes the
  *    stream self-delimiting, buffer fullness, raw-data-block count,
  *    optional CRC-16. 1024 samples per raw data block.
  *  - MPEG audio frames (ISO/IEC 11172-3 §2.4.1.3, the .mp3 layout):
  *    11-bit syncword, version/layer bits, the Layer III bitrate and
  *    sampling-rate index TABLES, padding, channel mode; frame bytes
  *    = 144·bitrate/rate + padding for Layer III, 1152 samples per
  *    frame; a bitrate-index histogram is the standard VBR detector.
  *
  * Writers emit structurally conformant headers (payloads are opaque
  * here — the indexer's contract is the header layer; the optional
  * ADTS crc_check slot is filled with a deterministic 2-byte value,
  * NOT the 13818-7 coverage, so a strict decoder reading
  * protection_absent=0 frames would flag it), parsers validate sync,
  * tables and lengths loudly and never read past a declared frame.
  * All arithmetic is integer table lookups, so the m-family oracle
  * reproduces every field and offset in SQL. */
object AudioIndex {

  // ---- ADTS ------------------------------------------------------------------

  /** §6.2 sampling_frequency_index table. */
  val AdtsRates: Vector[Int] = Vector(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350)

  final case class AdtsFrame(profile: Int, rateIndex: Int, channels: Int,
      crcPresent: Boolean, payload: Array[Byte]) {
    def rate: Int = AdtsRates(rateIndex)
    def headerLen: Int = if (crcPresent) 9 else 7
    def frameLen: Int = headerLen + payload.length
  }

  def adtsMux(frames: Seq[AdtsFrame]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    frames.foreach { f =>
      require(f.profile >= 0 && f.profile <= 3, s"adts profile ${f.profile}")
      require(f.rateIndex >= 0 && f.rateIndex < AdtsRates.size,
        s"adts rate index ${f.rateIndex}")
      require(f.channels >= 1 && f.channels <= 7, s"adts channels ${f.channels}")
      val len = f.frameLen
      require(len < (1 << 13), s"adts frame length $len")
      out.write(0xFF)
      // sync(4) | ID=0 (MPEG-4) | layer=00 | protection_absent
      out.write(0xF0 | (if (f.crcPresent) 0 else 1))
      out.write((f.profile << 6) | (f.rateIndex << 2) |
        ((f.channels >> 2) & 1))
      out.write(((f.channels & 3) << 6) | ((len >> 11) & 3))
      out.write((len >> 3) & 0xff)
      // len low 3 bits | buffer fullness 0x7FF (VBR convention)
      out.write(((len & 7) << 5) | 0x1f)
      out.write(0xfc) // fullness low 6 | number_of_raw_data_blocks-1 = 0
      if (f.crcPresent) {
        // deterministic filler in the crc_check slot (see adtsDemux on
        // why the indexer does not define checksum coverage)
        val crc = Flac.crc16(f.payload, 0, f.payload.length)
        out.write((crc >> 8) & 0xff); out.write(crc & 0xff)
      }
      out.write(f.payload, 0, f.payload.length)
    }
    out.toByteArray
  }

  /** Walk an ADTS stream: returns frames + their byte offsets.
    * Validates sync, layer bits, tables and lengths; the crc_check
    * slot (when present) is length-accounted but NOT verified — see
    * the inline note on why an indexer must not guess the 13818-7
    * coverage. */
  def adtsDemux(bytes: Array[Byte]): Seq[(Long, AdtsFrame)] = {
    val out = Seq.newBuilder[(Long, AdtsFrame)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 7 <= bytes.length, s"adts: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xf0) == 0xF0, s"adts: lost sync at $pos")
      require((bytes(pos + 1) & 0x06) == 0, s"adts: layer bits set at $pos")
      val crcPresent = (bytes(pos + 1) & 1) == 0
      val profile = (bytes(pos + 2) >> 6) & 3
      val rateIdx = (bytes(pos + 2) >> 2) & 0xf
      require(rateIdx < AdtsRates.size, s"adts: rate index $rateIdx at $pos")
      val channels = ((bytes(pos + 2) & 1) << 2) |
        ((bytes(pos + 3) >> 6) & 3)
      val len = ((bytes(pos + 3) & 3) << 11) |
        ((bytes(pos + 4) & 0xff) << 3) | ((bytes(pos + 5) >> 5) & 7)
      require((bytes(pos + 6) & 3) == 0,
        s"adts: multiple raw data blocks unsupported at $pos")
      require(pos + len <= bytes.length,
        s"adts: frame length $len overruns the stream at $pos")
      val hdr = if (crcPresent) 9 else 7
      require(len >= hdr,
        s"adts: frame length $len at $pos is shorter than its " +
          s"$hdr-byte header")
      // crc_check's 2 bytes are length-accounted but NOT recomputed:
      // 13818-7 defines the covered bit ranges over header+side info
      // (via 11172-3 §2.4.3.1), and an indexer that guessed a simpler
      // coverage would reject valid foreign files. Structure stays
      // loud; checksum verification is the decoder's job.
      val payload = java.util.Arrays.copyOfRange(bytes, pos + hdr, pos + len)
      out += ((pos.toLong,
        AdtsFrame(profile, rateIdx, channels, crcPresent, payload)))
      pos += len
    }
    out.result()
  }

  // ---- MPEG-1 Layer III (.mp3) ------------------------------------------------

  /** §2.4.2.3 Layer III (MPEG-1) bitrate table, kbit/s; index 0 =
    * "free", 15 = forbidden. */
  val Mp3Bitrates: Vector[Int] = Vector(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sampling rates by the 2-bit index; 3 is reserved. */
  val Mp3Rates: Vector[Int] = Vector(44100, 48000, 32000)

  final case class Mp3Frame(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, channelMode: Int) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, s"bitrate index $bitrateIndex")
    require(rateIndex >= 0 && rateIndex <= 2, s"rate index $rateIndex")
    def bitrate: Int = Mp3Bitrates(bitrateIndex) * 1000
    def rate: Int = Mp3Rates(rateIndex)
    /** §2.4.3.1: Layer III frame bytes = 144·bitrate/rate + padding. */
    def frameLen: Int = 144 * bitrate / rate + (if (padding) 1 else 0)
    def samples: Int = 1152
  }

  def mp3Mux(frames: Seq[Mp3Frame]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    frames.foreach { f =>
      out.write(0xFF)
      // sync low 3 | version MPEG-1 (11) | layer III (01) | no CRC (1)
      out.write(0xFB)
      out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
        (if (f.padding) 2 else 0))
      out.write((f.channelMode & 3) << 6)
      // body: zero fill to the declared frame length (payload opaque)
      val body = new Array[Byte](f.frameLen - 4)
      out.write(body, 0, body.length)
    }
    out.toByteArray
  }

  // ---- Opus packets (RFC 6716 §3) ---------------------------------------------

  /** Parsed Opus packet index entry: the TOC byte's coding mode,
    * audio bandwidth and per-frame duration (µs), channel count,
    * frame count (after the code-0..3 rules) and the 48 kHz sample
    * total — the granule currency of opus-in-ogg. */
  final case class OpusPacket(config: Int, stereo: Boolean, code: Int,
      frames: Int, frameDurUs: Int, padded: Boolean) {
    def mode: String =
      if (config < 12) "silk" else if (config < 16) "hybrid" else "celt"
    def bandwidth: String =
      if (config < 12) Vector("nb", "mb", "wb")(config / 4)
      else if (config < 16) Vector("swb", "fb")((config - 12) / 2)
      else Vector("nb", "wb", "swb", "fb")((config - 16) / 4)
    def durUs: Long = frames.toLong * frameDurUs
    /** Samples at the RFC's 48 kHz reference rate (ogg granules). */
    def samples48k: Long = durUs * 48 / 1000
  }

  /** §3.1 frame-duration table, µs by config. */
  def opusFrameDurUs(config: Int): Int = {
    require(config >= 0 && config <= 31, s"opus config $config")
    if (config < 12) Vector(10000, 20000, 40000, 60000)(config % 4)
    else if (config < 16) Vector(10000, 20000)((config - 12) % 2)
    else Vector(2500, 5000, 10000, 20000)((config - 16) % 4)
  }

  /** Build a conformant packet: TOC byte, the code-specific frame
    * headers (code 1 = two equal CBR frames, code 2 = two frames with
    * the §3.2.1 length coding for the first, code 3 = CBR count
    * byte), then the opaque frame bytes. */
  def opusPacket(config: Int, stereo: Boolean, code: Int,
      frameBodies: Seq[Array[Byte]]): Array[Byte] = {
    val dur = opusFrameDurUs(config)
    // §3.2.1: no Opus frame may exceed 1275 bytes, whatever the code
    frameBodies.foreach(b => require(b.length <= 1275,
      s"opus frame length ${b.length} exceeds the 1275-byte maximum"))
    val out = new ByteArrayOutputStream()
    out.write((config << 3) | (if (stereo) 4 else 0) | code)
    code match {
      case 0 =>
        require(frameBodies.size == 1, "opus code 0 carries one frame")
      case 1 =>
        require(frameBodies.size == 2 &&
          frameBodies(0).length == frameBodies(1).length,
          "opus code 1 carries two EQUAL frames")
        require(2L * dur <= 120000L, "opus packet exceeds 120 ms")
      case 2 =>
        require(frameBodies.size == 2, "opus code 2 carries two frames")
        require(2L * dur <= 120000L, "opus packet exceeds 120 ms")
        val n1 = frameBodies(0).length
        if (n1 < 252) out.write(n1)
        else { out.write(252 + (n1 - 252) % 4); out.write((n1 - 252) / 4) }
      case 3 =>
        val m = frameBodies.size
        require(m >= 1 && m <= 48, s"opus code 3 frame count $m")
        require(m.toLong * dur <= 120000L, "opus packet exceeds 120 ms")
        require(frameBodies.map(_.length).distinct.size == 1,
          "opus code 3 CBR form needs equal frames")
        out.write(m) // v=0 (CBR), p=0 (no padding), count = m
      case other => sys.error(s"opus code $other")
    }
    frameBodies.foreach(b => out.write(b, 0, b.length))
    out.toByteArray
  }

  def opusParse(packet: Array[Byte]): OpusPacket = {
    require(packet.length >= 1, "opus: empty packet")
    val toc = packet(0) & 0xff
    val config = toc >> 3
    val stereo = (toc & 4) != 0
    val code = toc & 3
    val dur = opusFrameDurUs(config)
    var padded = false
    // structural validation per RFC 6716 §3.4's malformed-packet
    // rules — a corrupt packet must fail loud, not index as valid
    val frames = code match {
      case 0 =>
        require(packet.length - 1 <= 1275,
          s"opus: code 0 frame of ${packet.length - 1} B exceeds 1275")
        1
      case 1 =>
        // R3: an odd number of payload bytes cannot split into two
        // EQUAL frames
        require((packet.length - 1) % 2 == 0,
          s"opus: code 1 payload of ${packet.length - 1} B is not even")
        require((packet.length - 1) / 2 <= 1275,
          "opus: code 1 frames exceed 1275 B")
        2
      case 2 =>
        // R4: the first frame's length coding must be present and the
        // declared length must fit inside the packet
        require(packet.length >= 2, "opus: code 2 without a length byte")
        val b1 = packet(1) & 0xff
        var lenBytes = 1
        val n1 =
          if (b1 < 252) b1
          else {
            require(packet.length >= 3,
              "opus: code 2 with a truncated two-byte length")
            lenBytes = 2
            b1 + 4 * (packet(2) & 0xff)
          }
        require(n1 <= 1275, s"opus: code 2 first frame $n1 B exceeds 1275")
        val rest = packet.length - 1 - lenBytes
        require(n1 <= rest,
          s"opus: code 2 first frame $n1 B overruns the ${rest}-B payload")
        require(rest - n1 <= 1275, "opus: code 2 second frame exceeds 1275 B")
        2
      case _ =>
        require(packet.length >= 2, "opus: code 3 without a count byte")
        val fc = packet(1) & 0xff
        val m = fc & 0x3f
        require(m >= 1, "opus: code 3 with zero frames")
        padded = (fc & 0x40) != 0
        val vbr = (fc & 0x80) != 0
        // §3.2.5 header layout: count byte, then (if padded) the
        // padding amount in continuation coding (each 255 byte adds
        // 254, the terminator adds its own value), then (if VBR) M-1
        // length indicators coded like code 2's first-frame length.
        var off = 2
        var pad = 0
        if (padded) {
          var b = 255
          while (b == 255) {
            require(off < packet.length,
              "opus: code 3 truncated padding count")
            b = packet(off) & 0xff; off += 1
            pad += (if (b == 255) 254 else b)
          }
        }
        if (!vbr) {
          // R6: after the padding count and padding, the remainder
          // must split into M equal frames of at most 1275 B
          val r = packet.length - off - pad
          require(r >= 0,
            s"opus: code 3 padding $pad B overruns the packet")
          require(r % m == 0,
            s"opus: code 3 CBR remainder $r does not divide into $m frames")
          require(r / m <= 1275, "opus: code 3 frames exceed 1275 B")
        } else {
          // R6/R7: M-1 explicit lengths, each ≤ 1275 and inside the
          // packet; the last frame takes what remains after padding
          // and must itself fit in [0, 1275]
          var sum = 0
          var i = 0
          while (i < m - 1) {
            require(off < packet.length,
              s"opus: code 3 VBR length $i truncated")
            val b1 = packet(off) & 0xff; off += 1
            val n =
              if (b1 < 252) b1
              else {
                require(off < packet.length,
                  s"opus: code 3 VBR two-byte length $i truncated")
                val n2 = b1 + 4 * (packet(off) & 0xff); off += 1; n2
              }
            require(n <= 1275, s"opus: code 3 VBR frame $i is $n B > 1275")
            sum += n
            i += 1
          }
          val last = packet.length - off - pad - sum
          require(last >= 0,
            s"opus: code 3 VBR lengths+padding overrun the packet " +
              s"by ${-last} B")
          require(last <= 1275,
            s"opus: code 3 VBR last frame $last B > 1275")
        }
        m
    }
    require(frames.toLong * dur <= 120000L,
      s"opus: $frames × $dur µs exceeds the 120 ms packet bound")
    OpusPacket(config, stereo, code, frames, dur, padded)
  }

  def mp3Demux(bytes: Array[Byte]): Seq[(Long, Mp3Frame)] = {
    val out = Seq.newBuilder[(Long, Mp3Frame)]
    var pos = 0
    // real files open with an ID3v2 tag: "ID3" + version(2) + flags +
    // 4-byte SYNCSAFE size (7 bits per byte, id3v2.4 §3.1) — skip it
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      require(((bytes(6) & 0x80) | (bytes(7) & 0x80) | (bytes(8) & 0x80) |
          (bytes(9) & 0x80)) == 0, "mp3: ID3v2 size is not syncsafe")
      // id3v2.4 §3.1: the size counts neither the 10-byte header nor
      // the 10-byte FOOTER announced by flags bit 0x10
      val footer = (bytes(5) & 0x10) != 0
      pos = 10 + size + (if (footer) 10 else 0)
      require(pos <= bytes.length, s"mp3: ID3v2 tag ($size B) overruns the file")
    }
    while (pos < bytes.length) {
      // a 128-byte ID3v1 trailer ("TAG") legally follows the last frame
      if (bytes.length - pos == 128 && bytes(pos) == 'T' &&
          bytes(pos + 1) == 'A' && bytes(pos + 2) == 'G')
        return out.result()
      require(pos + 4 <= bytes.length, s"mp3: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xe0) == 0xE0, s"mp3: lost sync at $pos")
      require((bytes(pos + 1) & 0x18) == 0x18,
        s"mp3: not MPEG-1 at $pos (version bits)")
      require((bytes(pos + 1) & 0x06) == 0x02,
        s"mp3: not Layer III at $pos (layer bits)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp3: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp3: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      val mode = (bytes(pos + 3) >> 6) & 3
      val f = Mp3Frame(bi, ri, pad, mode)
      require(pos + f.frameLen <= bytes.length,
        s"mp3: frame length ${f.frameLen} overruns the stream at $pos")
      out += ((pos.toLong, f))
      pos += f.frameLen
    }
    out.result()
  }

  // ---- Ogg-Opus headers (RFC 7845 §5) ----------------------------------------

  /** RFC 7845 §5.1 identification header: the first packet of every
    * Ogg-Opus logical stream. pre_skip is the sample count (48 kHz) a
    * player discards from the decoder output before playback — the
    * field p18's continuity audit needs. */
  final case class OpusHead(channels: Int, preSkip: Int, inputRate: Long,
      gainQ8: Int)

  def opusHeadMux(h: OpusHead): Array[Byte] = {
    require(h.channels >= 1 && h.channels <= 8, s"opus: ${h.channels} ch")
    require(h.preSkip >= 0 && h.preSkip <= 0xffff, s"opus: preSkip")
    require(h.inputRate >= 0 && h.inputRate <= 0xffffffffL, "opus: rate")
    require(h.gainQ8 >= -32768 && h.gainQ8 <= 32767, "opus: gain")
    val out = new ByteArrayOutputStream()
    out.write("OpusHead".getBytes("US-ASCII"))
    out.write(1) // version
    out.write(h.channels)
    out.write(h.preSkip & 0xff); out.write((h.preSkip >> 8) & 0xff)
    var i = 0
    while (i < 4) { out.write(((h.inputRate >> (8 * i)) & 0xff).toInt); i += 1 }
    out.write(h.gainQ8 & 0xff); out.write((h.gainQ8 >> 8) & 0xff)
    out.write(0) // channel mapping family 0 (mono/stereo, no table)
    out.toByteArray
  }

  def opusHeadParse(b: Array[Byte]): OpusHead = {
    require(b.length >= 19, s"opus: OpusHead is ${b.length} B, spec min 19")
    require(new String(b, 0, 8, "US-ASCII") == "OpusHead",
      "opus: bad OpusHead magic")
    // §5.1: players must reject unknown MAJOR versions (top 4 bits)
    require(((b(8) & 0xff) >> 4) == 0, s"opus: ID header version ${b(8)}")
    val ch = b(9) & 0xff
    require(ch >= 1, "opus: zero channels")
    val preSkip = (b(10) & 0xff) | ((b(11) & 0xff) << 8)
    val rate = (b(12) & 0xffL) | ((b(13) & 0xffL) << 8) |
      ((b(14) & 0xffL) << 16) | ((b(15) & 0xffL) << 24)
    val gain = ((b(16) & 0xff) | ((b(17) & 0xff) << 8)).toShort.toInt
    require((b(18) & 0xff) != 0 || b.length == 19,
      "opus: mapping family 0 must end the header at 19 B")
    OpusHead(ch, preSkip, rate, gain)
  }

  /** RFC 7845 §5.2 comment header ("OpusTags"), second packet. */
  def opusTagsMux(vendor: String): Array[Byte] = {
    val vb = vendor.getBytes("UTF-8")
    val out = new ByteArrayOutputStream()
    out.write("OpusTags".getBytes("US-ASCII"))
    var i = 0
    while (i < 4) { out.write((vb.length >> (8 * i)) & 0xff); i += 1 }
    out.write(vb)
    i = 0
    while (i < 4) { out.write(0); i += 1 } // zero user comments
    out.toByteArray
  }

  def opusTagsParse(b: Array[Byte]): String = {
    require(b.length >= 16, s"opus: OpusTags is ${b.length} B, spec min 16")
    require(new String(b, 0, 8, "US-ASCII") == "OpusTags",
      "opus: bad OpusTags magic")
    val vlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8) |
      ((b(10) & 0xff) << 16) | ((b(11) & 0xff) << 24)
    require(vlen >= 0 && 12 + vlen + 4 <= b.length,
      s"opus: vendor string ($vlen B) overruns the OpusTags packet")
    new String(b, 12, vlen, "UTF-8")
  }
}
