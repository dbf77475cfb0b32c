package graft.sources

import graft.sources.Flac.{BitReader, BitWriter}

/** AC-3 (ATSC A/52) SYNCFRAME indexer + BSI codec — the structural
  * layer for the last audio codec the reference names without one
  * (its codec suite transcodes aac ↔ ac3,
  * /root/reference/tests/media/test_audio_codec.py:18-24, through
  * libav in media/codec.py:50-135): where p15 walks ADTS/MPEG
  * headers, this walks A/52 syncframes and round-trips the complete
  * Bit Stream Information layer.
  *
  * NORMATIVE here (A/52 section in brackets):
  *  - syncinfo [§5.4.1]: syncword 0x0B77, crc1(16), fscod(2),
  *    frmsizecod(6) — the stream is self-delimiting through the
  *    frame-size table;
  *  - BSI [§5.4.2]: bsid(5) ≤ 8, bsmod(3), acmod(3) with the
  *    acmod-CONDITIONED fields (cmixlev when a centre channel
  *    exists, surmixlev when surrounds exist, dsurmod in 2/0),
  *    lfeon(1), dialnorm(5), the five optional-field pairs
  *    (compr/langcod/audprodinfo, doubled for dual-mono acmod 0),
  *    copyrightb/origbs, the two 14-bit timecode halves behind their
  *    presence flags, and addbsi with its 6-bit length;
  *  - six audio blocks per syncframe [§5.1] — carried OPAQUE here
  *    (the exponent/mantissa machinery is below the indexing
  *    contract, exactly like ADTS payloads in [[AudioIndex]]).
  *
  * Documented STAND-INS/SEAMS:
  *  - the frame-size table (Table 5.18 maps frmsizecod × fscod →
  *    words; value data): stand-in [[frameWords]] — monotone in the
  *    code, the real 44.1 kHz odd-code +1 word mechanism kept as
  *    STRUCTURE; swap the values to walk foreign files;
  *  - crc1 is filled with CRC-16/0x8005 over the 5/8-frame region
  *    AFTER the crc field and VERIFIED on demux — the real §7.10
  *    arrangement makes the region check to zero including the crc
  *    field itself (the [[AudioIndex]] ADTS precedent: an indexer
  *    must not guess the exact coverage; deviation documented). */
object Ac3 {

  /** fscod sample rates [§5.4.1.3]. */
  val Rates: Vector[Int] = Vector(48000, 44100, 32000)

  /** STAND-IN Table 5.18: 16-bit words per syncframe. Real values
    * run 64..1920 words over 38 codes; the stand-in keeps the
    * structure — monotone in frmsizecod >> 1, the odd-code +1 word
    * at 44.1 kHz (fscod 1) only. */
  def frameWords(fscod: Int, frmsizecod: Int): Int = {
    require(fscod >= 0 && fscod <= 2, s"ac3: fscod $fscod")
    require(frmsizecod >= 0 && frmsizecod < 38,
      s"ac3: frmsizecod $frmsizecod")
    64 + 24 * (frmsizecod >> 1) +
      (if (fscod == 1) frmsizecod & 1 else 0)
  }

  /** Channels per acmod [§5.4.2.3]: 1+1, 1/0, 2/0, 3/0, 2/1, 3/1,
    * 2/2, 3/2. */
  def acmodChannels(acmod: Int): Int =
    Vector(2, 1, 2, 3, 3, 4, 4, 5)(acmod)

  final case class Bsi(bsmod: Int, acmod: Int, cmixlev: Int,
      surmixlev: Int, dsurmod: Int, lfeon: Boolean, dialnorm: Int,
      compr: Option[Int], langcod: Option[Int],
      audprod: Option[(Int, Int)], dialnorm2: Int,
      copyrightb: Boolean, origbs: Boolean,
      timecod1: Option[Int], timecod2: Option[Int],
      addbsi: Array[Byte]) {
    require(bsmod >= 0 && bsmod < 8, "ac3: bsmod")
    require(acmod >= 0 && acmod < 8, "ac3: acmod")
    require(dialnorm >= 0 && dialnorm < 32 &&
      dialnorm2 >= 0 && dialnorm2 < 32, "ac3: dialnorm is 5 bits")
    require(cmixlev >= 0 && cmixlev < 4 && surmixlev >= 0 &&
      surmixlev < 4 && dsurmod >= 0 && dsurmod < 4, "ac3: 2-bit fields")
    // conditioned fields carry no bits when their condition is off
    require(hasCentre || cmixlev == 0, "ac3: cmixlev without centre")
    require(hasSurround || surmixlev == 0, "ac3: surmixlev without surround")
    require(acmod == 2 || dsurmod == 0, "ac3: dsurmod is 2/0 only")
    require(acmod == 0 || dialnorm2 == 0,
      "ac3: dialnorm2 is dual-mono only")
    require(compr.forall(v => v >= 0 && v < 256), "ac3: compr")
    require(langcod.forall(v => v >= 0 && v < 256), "ac3: langcod")
    require(audprod.forall { case (m, r) =>
      m >= 0 && m < 32 && r >= 0 && r < 4 }, "ac3: mixlevel/roomtyp")
    require(timecod1.forall(v => v >= 0 && v < (1 << 14)) &&
      timecod2.forall(v => v >= 0 && v < (1 << 14)),
      "ac3: timecod halves are 14 bits")
    require(addbsi.length < 64, "ac3: addbsil is 6 bits")
    def hasCentre: Boolean = (acmod & 1) == 1 && acmod != 1
    def hasSurround: Boolean = acmod >= 4
  }

  final case class Ac3Frame(fscod: Int, frmsizecod: Int, bsi: Bsi,
      payload: Array[Byte]) {
    require(fscod >= 0 && fscod <= 2, "ac3: fscod")
    def frameLen: Int = 2 * frameWords(fscod, frmsizecod)
  }

  private def writeBsi(w: BitWriter, b: Bsi): Unit = {
    w.writeBits(8L, 5) // bsid = 8 (A/52 baseline)
    w.writeBits(b.bsmod.toLong, 3)
    w.writeBits(b.acmod.toLong, 3)
    if (b.hasCentre) w.writeBits(b.cmixlev.toLong, 2)
    if (b.hasSurround) w.writeBits(b.surmixlev.toLong, 2)
    if (b.acmod == 2) w.writeBits(b.dsurmod.toLong, 2)
    w.writeBits(if (b.lfeon) 1L else 0L, 1)
    def half(dialnorm: Int): Unit = {
      w.writeBits(dialnorm.toLong, 5)
      w.writeBits(if (b.compr.isDefined) 1L else 0L, 1)
      b.compr.foreach(v => w.writeBits(v.toLong, 8))
      w.writeBits(if (b.langcod.isDefined) 1L else 0L, 1)
      b.langcod.foreach(v => w.writeBits(v.toLong, 8))
      w.writeBits(if (b.audprod.isDefined) 1L else 0L, 1)
      b.audprod.foreach { case (m, r) =>
        w.writeBits(m.toLong, 5); w.writeBits(r.toLong, 2)
      }
    }
    half(b.dialnorm)
    if (b.acmod == 0) half(b.dialnorm2) // the full 1+1 second half
    w.writeBits(if (b.copyrightb) 1L else 0L, 1)
    w.writeBits(if (b.origbs) 1L else 0L, 1)
    w.writeBits(if (b.timecod1.isDefined) 1L else 0L, 1)
    b.timecod1.foreach(v => w.writeBits(v.toLong, 14))
    w.writeBits(if (b.timecod2.isDefined) 1L else 0L, 1)
    b.timecod2.foreach(v => w.writeBits(v.toLong, 14))
    w.writeBits(if (b.addbsi.nonEmpty) 1L else 0L, 1)
    if (b.addbsi.nonEmpty) {
      w.writeBits((b.addbsi.length - 1).toLong, 6)
      b.addbsi.foreach(v => w.writeBits(v & 0xffL, 8))
    }
  }

  private def readBsi(r: BitReader, pos: Int): Bsi = {
    val bsid = r.readBits(5).toInt
    require(bsid <= 8, s"ac3: bsid $bsid beyond A/52 at $pos (E-AC-3?)")
    val bsmod = r.readBits(3).toInt
    val acmod = r.readBits(3).toInt
    val hasC = (acmod & 1) == 1 && acmod != 1
    val hasS = acmod >= 4
    val cmix = if (hasC) r.readBits(2).toInt else 0
    val smix = if (hasS) r.readBits(2).toInt else 0
    val dsur = if (acmod == 2) r.readBits(2).toInt else 0
    val lfe = r.readBits(1) == 1L
    def half(): (Int, Option[Int], Option[Int], Option[(Int, Int)]) = {
      val dn = r.readBits(5).toInt
      val compr = if (r.readBits(1) == 1L) Some(r.readBits(8).toInt)
        else None
      val lang = if (r.readBits(1) == 1L) Some(r.readBits(8).toInt)
        else None
      val prod = if (r.readBits(1) == 1L)
        Some((r.readBits(5).toInt, r.readBits(2).toInt)) else None
      (dn, compr, lang, prod)
    }
    val (dn, compr, lang, prod) = half()
    val dn2 = if (acmod == 0) half()._1 else 0
    val copyb = r.readBits(1) == 1L
    val orig = r.readBits(1) == 1L
    val tc1 = if (r.readBits(1) == 1L) Some(r.readBits(14).toInt)
      else None
    val tc2 = if (r.readBits(1) == 1L) Some(r.readBits(14).toInt)
      else None
    val addbsi =
      if (r.readBits(1) == 1L) {
        val n = r.readBits(6).toInt + 1
        Array.fill(n)(r.readBits(8).toByte)
      } else Array.empty[Byte]
    Bsi(bsmod, acmod, cmix, smix, dsur, lfe, dn, compr, lang, prod,
      dn2, copyb, orig, tc1, tc2, addbsi)
  }

  /** Pack syncframes: syncinfo + BSI + the opaque audio-block
    * payload, zero-stuffed to the Table-5.18 frame length; crc1
    * covers the post-crc 5/8 region (see module doc). */
  def mux(frames: Seq[Ac3Frame]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      val w = new BitWriter
      w.writeBits(f.fscod.toLong, 2)
      w.writeBits(f.frmsizecod.toLong, 6)
      writeBsi(w, f.bsi)
      // the opaque audio-block region rides at byte granularity
      // (indexer contract; real audblks are bit-packed)
      w.alignByte()
      f.payload.foreach(v => w.writeBits(v & 0xffL, 8))
      val body = w.toBytes
      val len = f.frameLen
      require(4 + body.length <= len,
        s"ac3: BSI + ${f.payload.length} payload bytes overrun the " +
          s"$len-byte frame (frmsizecod ${f.frmsizecod})")
      val frame = new Array[Byte](len)
      frame(0) = 0x0B; frame(1) = 0x77
      System.arraycopy(body, 0, frame, 4, body.length)
      val five8 = (len * 5) / 8
      val crc = Flac.crc16(frame, 4, five8)
      frame(2) = ((crc >> 8) & 0xff).toByte
      frame(3) = (crc & 0xff).toByte
      out.write(frame, 0, len)
    }
    out.toByteArray
  }

  /** Walk an AC-3 stream back: offsets + syncinfo + the full BSI +
    * the payload region; sync, bsid, crc1 and lengths verified
    * loudly. The payload comes back as the whole post-BSI region
    * (zero stuffing included) — the indexing contract. */
  def demux(bytes: Array[Byte]): Seq[(Long, Ac3Frame)] = {
    val out = Seq.newBuilder[(Long, Ac3Frame)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 5 <= bytes.length, s"ac3: truncated syncinfo at $pos")
      require((bytes(pos) & 0xff) == 0x0B &&
        (bytes(pos + 1) & 0xff) == 0x77, s"ac3: lost sync at $pos")
      val b4 = bytes(pos + 4) & 0xff
      val fscod = (b4 >> 6) & 3
      require(fscod <= 2, s"ac3: reserved fscod at $pos")
      val frmsizecod = b4 & 0x3f
      require(frmsizecod < 38, s"ac3: frmsizecod $frmsizecod at $pos")
      val len = 2 * frameWords(fscod, frmsizecod)
      require(pos + len <= bytes.length,
        s"ac3: frame length $len overruns the stream at $pos")
      val five8 = (len * 5) / 8
      val wantCrc = Flac.crc16(bytes, pos + 4, pos + five8)
      val gotCrc = ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      require(gotCrc == wantCrc,
        s"ac3: crc1 mismatch at $pos ($gotCrc vs $wantCrc)")
      val r = new BitReader(bytes, pos + 4, pos + len)
      require(r.readBits(2).toInt == fscod && r.readBits(6).toInt
        == frmsizecod, s"ac3: syncinfo re-read drift at $pos")
      val bsi = readBsi(r, pos)
      // payload: from the BSI's next byte boundary to frame end
      // (bitPos is absolute)
      val payloadStart = ((r.bitPos + 7) / 8).toInt
      val payload = java.util.Arrays.copyOfRange(bytes,
        payloadStart, pos + len)
      out += ((pos.toLong,
        Ac3Frame(fscod, frmsizecod, bsi, payload)))
      pos += len
    }
    out.result()
  }
}
