package graft.sources

import java.io.ByteArrayOutputStream

/** Ogg container (RFC 3533) — the SEVENTH container family in the
  * transcode matrix and the transport real Opus/Vorbis streams ride
  * in (the reference's libav container list includes it via the same
  * mux/demux surface as mp4/mkv, media/container.py:38-116). Written
  * from the RFC alone:
  *
  *  - PAGES: capture pattern "OggS", version 0, header-type flags
  *    (0x01 continuation, 0x02 BOS, 0x04 EOS), 64-bit granule
  *    position, 32-bit stream serial, 32-bit page sequence number,
  *    CRC-32, segment count + lacing table (packet lengths in base
  *    255: a value < 255 ends a packet, 255 continues it — a final
  *    255 continues into the NEXT page, flagged 0x01).
  *  - CRC: polynomial 0x04c11db7, init 0, NO reflection, no final
  *    xor (Ogg's own variant — deliberately not zlib's), computed
  *    over the whole page with the CRC field zeroed (RFC 3533 §6).
  *  - Logical streams multiplex by serial: each begins with a BOS
  *    page carrying an identification packet and ends with an EOS
  *    page; data pages interleave in granule order.
  *
  * Granule position is codec-defined by the RFC; graft streams use
  * granule = the packet's timestamp in ms (documented convention,
  * mirroring the FLV/MKV legs' ms clocks).
  *
  * Scale: like the other six families — pure byte kernels called
  * per-group on executors; a file's bytes never span executors. */
object Ogg {

  val Version = 0
  val FlagContinuation = 0x01
  val FlagBos = 0x02
  val FlagEos = 0x04

  /** One logical stream: a serial, a kind tag (carried in the BOS
    * identification packet), and (granule, payload) data packets. */
  final case class OggStream(serial: Long, kind: String)
  final case class OggPacket(serial: Long, granule: Long,
      payload: Array[Byte])

  /** Ogg CRC-32: poly 0x04c11db7, init 0, unreflected, no final xor. */
  def crc32(bytes: Array[Byte]): Long = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc ^= (bytes(i) & 0xff) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
          else crc << 1
        k += 1
      }
      i += 1
    }
    crc & 0xffffffffL
  }

  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def u64le(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def rdU32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def rdU64le(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  /** Emit one page holding whole packet(s). `body` is the packet
    * data; `lacing` its segment table. */
  private def writePage(out: ByteArrayOutputStream, flags: Int,
      granule: Long, serial: Long, pageSeq: Long, lacing: Seq[Int],
      body: Array[Byte]): Unit = {
    require(lacing.size <= 255, s"ogg: ${lacing.size} segments on one page")
    val page = new ByteArrayOutputStream(27 + lacing.size + body.length)
    page.write('O'); page.write('g'); page.write('g'); page.write('S')
    page.write(Version)
    page.write(flags)
    u64le(page, granule)
    u32le(page, serial)
    u32le(page, pageSeq)
    u32le(page, 0L) // CRC placeholder
    page.write(lacing.size)
    lacing.foreach(page.write)
    page.write(body, 0, body.length)
    val bytes = page.toByteArray
    val crc = crc32(bytes)
    bytes(22) = (crc & 0xff).toByte
    bytes(23) = ((crc >> 8) & 0xff).toByte
    bytes(24) = ((crc >> 16) & 0xff).toByte
    bytes(25) = ((crc >> 24) & 0xff).toByte
    out.write(bytes, 0, bytes.length)
  }

  /** Lacing values for one whole packet (RFC 3533 §5: base-255, a
    * value < 255 terminates; an exact multiple appends a 0). */
  private def lacingOf(len: Int): Seq[Int] = {
    val full = Seq.fill(len / 255)(255)
    full :+ (len % 255)
  }

  /** Mux logical streams into one physical stream: per-stream BOS
    * pages first (page order = stream order), then one page per data
    * packet interleaved by (granule, serial), EOS flag on each
    * stream's last data page (an empty EOS page when a stream has no
    * packets). Packets up to 255·254 bytes fit one page — larger
    * payloads are rejected loudly (the matrix carries small frames;
    * foreign DEMUX still accepts spanning packets). */
  def mux(streams: Seq[OggStream], packets: Seq[OggPacket]): Array[Byte] = {
    require(streams.map(_.serial).distinct.size == streams.size,
      "ogg: duplicate stream serials")
    streams.foreach(s => require(s.serial >= 0 && s.serial <= 0xFFFFFFFFL,
      s"ogg: serial ${s.serial} outside u32 — u32le would silently " +
        "truncate and distinct serials could collide on the wire"))
    val bySerial = streams.map(s => s.serial -> s).toMap
    packets.foreach { p =>
      require(bySerial.contains(p.serial), s"ogg: packet for unknown serial ${p.serial}")
      require(p.payload.length <= 255 * 254,
        s"ogg: ${p.payload.length}B packet needs page spanning (unsupported in mux)")
    }
    val out = new ByteArrayOutputStream()
    val pageSeq = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    def nextSeq(serial: Long): Long = {
      val v = pageSeq(serial); pageSeq(serial) = v + 1; v
    }
    streams.foreach { s =>
      val id = s"graftid:${s.kind}".getBytes("UTF-8")
      writePage(out, FlagBos, 0L, s.serial, nextSeq(s.serial),
        lacingOf(id.length), id)
    }
    val ordered = packets.zipWithIndex
      .sortBy { case (p, i) => (p.granule, p.serial, i) }.map(_._1)
    val lastIdx: Map[Long, Int] = ordered.zipWithIndex
      .groupBy(_._1.serial).map { case (s, ps) => s -> ps.map(_._2).max }
    ordered.zipWithIndex.foreach { case (p, i) =>
      val eos = if (lastIdx(p.serial) == i) FlagEos else 0
      writePage(out, eos, p.granule, p.serial, nextSeq(p.serial),
        lacingOf(p.payload.length), p.payload)
    }
    // streams with no data packets still need their EOS — as a page
    // with an EMPTY segment table (nSegs = 0): a lacing value 0 would
    // instead terminate a zero-length packet (RFC 3533 §5) and demux
    // would fabricate a phantom empty packet
    streams.filterNot(s => ordered.exists(_.serial == s.serial)).foreach { s =>
      writePage(out, FlagEos, 0L, s.serial, nextSeq(s.serial), Seq.empty,
        Array.emptyByteArray)
    }
    out.toByteArray
  }

  /** Parse a physical stream: verify capture pattern, version and CRC
    * on every page, check per-stream page sequence continuity,
    * reassemble packets across pages (continuation flag + lacing),
    * and return (streams in BOS order, data packets in page order).
    * The BOS identification packet is consumed into the stream's
    * `kind`; EOS must be seen for every stream. */
  def demux(bytes: Array[Byte]): (Seq[OggStream], Seq[OggPacket]) = {
    val streams = Seq.newBuilder[OggStream]
    val packets = Seq.newBuilder[OggPacket]
    val seenBos = scala.collection.mutable.Set.empty[Long]
    val seenEos = scala.collection.mutable.Set.empty[Long]
    val expectSeq = scala.collection.mutable.Map.empty[Long, Long]
    // per-serial partial packet carried over a page boundary
    val partial = scala.collection.mutable.Map.empty[Long, ByteArrayOutputStream]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 27 <= bytes.length, s"ogg: truncated page header at $pos")
      require(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
        bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S',
        s"ogg: bad capture pattern at $pos")
      require(bytes(pos + 4) == Version, s"ogg: version ${bytes(pos + 4)}")
      val flags = bytes(pos + 5) & 0xff
      val granule = rdU64le(bytes, pos + 6)
      val serial = rdU32le(bytes, pos + 14)
      val seq = rdU32le(bytes, pos + 18)
      val crcStored = rdU32le(bytes, pos + 22)
      val nSegs = bytes(pos + 26) & 0xff
      require(pos + 27 + nSegs <= bytes.length, s"ogg: truncated lacing at $pos")
      val lacing = (0 until nSegs).map(i => bytes(pos + 27 + i) & 0xff)
      val bodyLen = lacing.sum
      val end = pos + 27 + nSegs + bodyLen
      require(end <= bytes.length, s"ogg: truncated page body at $pos")
      // CRC over the page with the CRC field zeroed
      val copy = java.util.Arrays.copyOfRange(bytes, pos, end)
      copy(22) = 0; copy(23) = 0; copy(24) = 0; copy(25) = 0
      require(crc32(copy) == crcStored,
        s"ogg: CRC mismatch on page seq $seq of serial $serial")
      val exp = expectSeq.getOrElse(serial, 0L)
      require(seq == exp,
        s"ogg: page sequence gap on serial $serial: got $seq want $exp")
      expectSeq(serial) = exp + 1
      val isBos = (flags & FlagBos) != 0
      val isEos = (flags & FlagEos) != 0
      val isCont = (flags & FlagContinuation) != 0
      require(!isBos || !seenBos.contains(serial),
        s"ogg: second BOS for serial $serial")
      require(isBos == !seenBos.contains(serial),
        s"ogg: first page of serial $serial lacks the BOS flag")
      require(isCont == partial.contains(serial),
        s"ogg: continuation flag/state mismatch on serial $serial")
      // walk the lacing table reassembling packets
      var bodyOff = pos + 27 + nSegs
      var acc = partial.remove(serial).getOrElse(new ByteArrayOutputStream())
      lacing.foreach { l =>
        acc.write(bytes, bodyOff, l)
        bodyOff += l
        if (l < 255) {
          val payload = acc.toByteArray
          if (isBos && !seenBos.contains(serial)) {
            val id = new String(payload, "UTF-8")
            require(id.startsWith("graftid:"),
              s"ogg: foreign identification packet on serial $serial")
            streams += OggStream(serial, id.stripPrefix("graftid:"))
            seenBos += serial
          } else {
            packets += OggPacket(serial, granule, payload)
          }
          acc = new ByteArrayOutputStream()
        }
      }
      if (acc.size() > 0 || (nSegs > 0 && lacing.last == 255))
        partial(serial) = acc
      if (isEos) seenEos += serial
      pos = end
    }
    require(partial.isEmpty,
      s"ogg: stream ended mid-packet on serials ${partial.keys.toSeq.sorted}")
    require(seenBos == seenEos,
      s"ogg: streams without EOS: ${(seenBos -- seenEos).toSeq.sorted}")
    (streams.result(), packets.result())
  }
}
