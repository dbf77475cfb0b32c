package graft.sources

import java.io.ByteArrayOutputStream

/** MPEG transport stream (ISO/IEC 13818-1) mux/demux — the engine's
  * FOURTH container family, and the one the reference's video viewer
  * ACTUALLY emits to its browser client
  * (`/root/reference/streamtasks/system/tasks/ui/videoviewer.py:63` —
  * `OutputContainer.open(buffer, format="mpegts")` feeding a
  * websocket). Written from the public specification: 188-byte
  * packets (sync 0x47, PID, payload-unit-start, per-PID continuity
  * counters), PSI sections (PAT → PMT with MPEG CRC-32), PES packets
  * with 33-bit 90 kHz PTS, PCR in the adaptation field on the video
  * PID, and adaptation-field stuffing to fill every packet.
  *
  * Same scale stance as [[Riff]]/[[Mkv]]/[[IsoBmff]]: mux/demux are
  * per-group executor kernels over binary columns; one container
  * never spans executors, bytes never touch the driver.
  */
object MpegTs {

  val PacketSize = 188
  val PatPid = 0
  val PmtPid = 0x1000
  val VideoPid = 0x100
  val AudioPid = 0x101
  /** H.264 / AAC-ADTS stream types — what the reference's
    * h264/aac-configured mpegts mux would register. */
  val VideoStreamType = 0x1B
  val AudioStreamType = 0x0F

  /** MPEG CRC-32 (poly 0x04C11DB7, init 0xFFFFFFFF, MSB-first, no
    * final XOR) over PSI sections — required by every PAT/PMT. */
  def crc32(data: Array[Byte], from: Int, until: Int): Long = {
    var crc = 0xffffffffL
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xffL) << 24
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04c11db7L)
          else crc << 1
        crc &= 0xffffffffL
        b += 1
      }
      i += 1
    }
    crc
  }

  /** One demuxed PES packet: 90 kHz PTS, the elementary payload, the
    * TS packet count it occupied, and the PCR base (video PES carry
    * one in their first packet's adaptation field). */
  final case class TsPes(pid: Int, streamType: Int, pts90: Long,
      payload: Array[Byte], nPackets: Int, pcrBase: Option[Long])

  /** Input sample for the mux: track "video" | "audio", PTS in 90 kHz
    * ticks. Samples must arrive in mux order. */
  final case class TsSample(track: String, pts90: Long,
      payload: Array[Byte])

  // ------------------------------------------------------------------ mux

  private def psiPacket(pid: Int, cc: Int, section: Array[Byte])
      : Array[Byte] = {
    val p = new Array[Byte](PacketSize)
    java.util.Arrays.fill(p, 0xff.toByte)
    p(0) = 0x47
    p(1) = (0x40 | ((pid >> 8) & 0x1f)).toByte // PUSI set
    p(2) = (pid & 0xff).toByte
    p(3) = (0x10 | (cc & 0xf)).toByte // payload only
    p(4) = 0 // pointer_field
    System.arraycopy(section, 0, p, 5, section.length)
    p
  }

  private def section(tableId: Int, body: Array[Byte]): Array[Byte] = {
    // section_length covers everything after it, incl. the CRC
    val len = body.length + 5 + 4
    val out = new ByteArrayOutputStream()
    out.write(tableId)
    out.write(0xb0 | ((len >> 8) & 0x0f)) // syntax=1, reserved
    out.write(len & 0xff)
    out.write(0); out.write(1) // transport_stream_id / program_number
    out.write(0xc1) // reserved, version 0, current_next 1
    out.write(0); out.write(0) // section_number, last_section_number
    out.write(body)
    val bytes = out.toByteArray
    val crc = crc32(bytes, 0, bytes.length)
    out.write(((crc >> 24) & 0xff).toInt); out.write(((crc >> 16) & 0xff).toInt)
    out.write(((crc >> 8) & 0xff).toInt); out.write((crc & 0xff).toInt)
    out.toByteArray
  }

  private def patSection: Array[Byte] = section(0x00, Array(
    0, 1, // program_number 1
    (0xe0 | ((PmtPid >> 8) & 0x1f)).toByte, (PmtPid & 0xff).toByte))

  private def pmtSection: Array[Byte] = {
    val b = new ByteArrayOutputStream()
    b.write(0xe0 | ((VideoPid >> 8) & 0x1f)); b.write(VideoPid & 0xff) // PCR_PID
    b.write(0xf0); b.write(0) // program_info_length 0
    for ((st, pid) <- Seq(VideoStreamType -> VideoPid,
        AudioStreamType -> AudioPid)) {
      b.write(st)
      b.write(0xe0 | ((pid >> 8) & 0x1f)); b.write(pid & 0xff)
      b.write(0xf0); b.write(0) // ES_info_length 0
    }
    section(0x02, b.toByteArray)
  }

  private def ptsBytes(pts: Long): Array[Byte] = Array(
    (0x21 | (((pts >> 30) & 0x7) << 1)).toByte, // '0010' + pts[32:30] + 1
    ((pts >> 22) & 0xff).toByte,
    (0x01 | (((pts >> 15) & 0x7f) << 1)).toByte,
    ((pts >> 7) & 0xff).toByte,
    (0x01 | ((pts & 0x7f) << 1)).toByte)

  /** PES = startcode + stream_id + length + '10' flags + PTS + payload. */
  private def pesBytes(streamId: Int, pts: Long, payload: Array[Byte])
      : Array[Byte] = {
    val out = new ByteArrayOutputStream(14 + payload.length)
    out.write(0); out.write(0); out.write(1); out.write(streamId)
    val len = 3 + 5 + payload.length // after the length field
    // the 16-bit field overflows on large frames: VIDEO PES may (and
    // real muxers do) declare length 0 = unbounded, ended by the next
    // PUSI — audio has no such escape hatch in the spec
    val video = (streamId & 0xf0) == 0xe0
    require(len <= 0xffff || video,
      s"audio PES payload too large for a sized packet: ${payload.length}")
    val field = if (len <= 0xffff) len else 0
    out.write((field >> 8) & 0xff); out.write(field & 0xff)
    out.write(0x80) // '10' + no scrambling/priority/...
    out.write(0x80) // PTS_DTS_flags = '10' (PTS only)
    out.write(5) // PES_header_data_length
    out.write(ptsBytes(pts))
    out.write(payload)
    out.toByteArray
  }

  private def pcrField(base: Long): Array[Byte] = Array(
    ((base >> 25) & 0xff).toByte, ((base >> 17) & 0xff).toByte,
    ((base >> 9) & 0xff).toByte, ((base >> 1) & 0xff).toByte,
    (((base & 1) << 7) | 0x7e).toByte, // reserved '111111' + ext[8]
    0x00.toByte) // extension

  /** Mux samples into a transport stream: PAT, PMT, then each sample
    * as one PES split over as many 188-byte packets as it needs —
    * video PES carry a PCR (= their PTS) in the first packet's
    * adaptation field; the final packet of every PES is stuffed full
    * via the adaptation field. */
  def mux(samples: Seq[TsSample]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val cc = scala.collection.mutable.Map(
      PatPid -> 0, PmtPid -> 0, VideoPid -> 0, AudioPid -> 0)
    def nextCc(pid: Int): Int = {
      val c = cc(pid); cc(pid) = (c + 1) & 0xf; c
    }
    out.write(psiPacket(PatPid, nextCc(PatPid), patSection))
    out.write(psiPacket(PmtPid, nextCc(PmtPid), pmtSection))
    samples.foreach { sm =>
      require(sm.track == "video" || sm.track == "audio",
        s"unknown track ${sm.track}")
      val video = sm.track == "video"
      val pid = if (video) VideoPid else AudioPid
      val pes = pesBytes(if (video) 0xe0 else 0xc0, sm.pts90, sm.payload)
      var off = 0
      var first = true
      while (off < pes.length) {
        val p = new Array[Byte](PacketSize)
        p(0) = 0x47
        p(1) = ((if (first) 0x40 else 0x00) | ((pid >> 8) & 0x1f)).toByte
        p(2) = (pid & 0xff).toByte
        var body = 4
        val pcr = if (first && video) pcrField(sm.pts90) else Array.empty[Byte]
        // PCR adaptation field costs len + flags + 6 PCR = 8 bytes
        val capacity = PacketSize - 4 - (if (pcr.nonEmpty) 8 else 0)
        val remaining = pes.length - off
        val take = math.min(remaining, capacity)
        val gap = capacity - take // bytes the adaptation field must absorb
        val ccv = nextCc(pid) & 0xf
        if (pcr.nonEmpty) {
          p(3) = (0x30 | ccv).toByte
          p(body) = (7 + gap).toByte; body += 1 // flags + PCR + stuffing
          p(body) = 0x10; body += 1 // PCR flag
          System.arraycopy(pcr, 0, p, body, 6); body += 6
          var s = 0
          while (s < gap) { p(body) = 0xff.toByte; body += 1; s += 1 }
        } else if (gap == 0) {
          p(3) = (0x10 | ccv).toByte // payload only
        } else if (gap == 1) {
          p(3) = (0x30 | ccv).toByte
          p(body) = 0; body += 1 // one-byte field: just the length byte
        } else {
          p(3) = (0x30 | ccv).toByte
          p(body) = (gap - 1).toByte; body += 1
          p(body) = 0x00; body += 1 // flags byte, nothing set
          var s = 0
          while (s < gap - 2) { p(body) = 0xff.toByte; body += 1; s += 1 }
        }
        System.arraycopy(pes, off, p, body, take)
        off += take
        first = false
        out.write(p)
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- demux

  /** Parse a transport stream back into PES packets. Validates sync
    * bytes, per-PID continuity counters, PAT/PMT CRC-32, PES start
    * codes and PTS marker bits; resolves each PID's stream type
    * through the PAT→PMT chain (no hardcoded PIDs). */
  def demux(bytes: Array[Byte]): Seq[TsPes] = {
    require(bytes.length % PacketSize == 0,
      s"not a packet-aligned transport stream (${bytes.length} bytes)")
    val nPkts = bytes.length / PacketSize
    var pmtPid = -1
    val streamType = scala.collection.mutable.Map.empty[Int, Int]
    val lastCc = scala.collection.mutable.Map.empty[Int, Int]
    // per-PID PES reassembly
    final case class Acc(buf: ByteArrayOutputStream, var n: Int,
      var pcr: Option[Long])
    val acc = scala.collection.mutable.Map.empty[Int, Acc]
    val outSeq = Seq.newBuilder[(Int, TsPes)] // keyed by first-packet idx
    val startIdx = scala.collection.mutable.Map.empty[Int, Int]

    def flush(pid: Int): Unit = acc.remove(pid).foreach { a =>
      val pes = a.buf.toByteArray
      require(pes.length >= 14 && pes(0) == 0 && pes(1) == 0 && pes(2) == 1,
        s"bad PES start code on pid $pid")
      val pesLen = ((pes(4) & 0xff) << 8) | (pes(5) & 0xff)
      val hdrLen = pes(8) & 0xff
      require((pes(7) & 0xc0) == 0x80, s"expected PTS-only flags on $pid")
      val p = pes.slice(9, 9 + 5)
      require((p(0) & 0xf1) == 0x21 && (p(2) & 1) == 1 && (p(4) & 1) == 1,
        s"bad PTS marker bits on pid $pid")
      val pts = (((p(0) >> 1) & 0x7L) << 30) | ((p(1) & 0xffL) << 22) |
        (((p(2) >> 1) & 0x7fL) << 15) | ((p(3) & 0xffL) << 7) |
        ((p(4) >> 1) & 0x7fL)
      val payloadStart = 9 + hdrLen
      // length counts bytes after the field; 0 = UNBOUNDED (the video
      // form real muxers emit) — the payload runs to the next PUSI,
      // i.e. the end of this accumulation
      val payloadEnd = if (pesLen == 0) pes.length else 6 + pesLen
      require(payloadStart <= payloadEnd && payloadEnd <= pes.length,
        s"PES truncated on pid $pid")
      outSeq += startIdx(pid) -> TsPes(pid, streamType.getOrElse(pid, -1),
        pts, java.util.Arrays.copyOfRange(pes, payloadStart, payloadEnd),
        a.n, a.pcr)
    }

    for (i <- 0 until nPkts) {
      val o = i * PacketSize
      require((bytes(o) & 0xff) == 0x47, s"lost sync at packet $i")
      val pusi = (bytes(o + 1) & 0x40) != 0
      val pid = ((bytes(o + 1) & 0x1f) << 8) | (bytes(o + 2) & 0xff)
      val afc = (bytes(o + 3) >> 4) & 0x3
      val cc = bytes(o + 3) & 0xf
      if ((afc & 1) != 0) { // has payload → counter must advance
        lastCc.get(pid).foreach(prev => require(cc == ((prev + 1) & 0xf),
          s"continuity error on pid $pid at packet $i"))
        lastCc(pid) = cc
      }
      var body = o + 4
      var pcr: Option[Long] = None
      if ((afc & 2) != 0) { // adaptation field
        val len = bytes(body) & 0xff
        if (len > 0 && (bytes(body + 1) & 0x10) != 0) { // PCR flag
          val b = body + 2
          val base = ((bytes(b) & 0xffL) << 25) | ((bytes(b + 1) & 0xffL) << 17) |
            ((bytes(b + 2) & 0xffL) << 9) | ((bytes(b + 3) & 0xffL) << 1) |
            ((bytes(b + 4) >> 7) & 1L)
          pcr = Some(base)
        }
        body += 1 + len
      }
      if ((afc & 1) == 0) { /* no payload */ }
      else if (pid == PatPid || pid == pmtPid) {
        val ptr = bytes(body) & 0xff
        val sec = body + 1 + ptr
        val tableId = bytes(sec) & 0xff
        val secLen = ((bytes(sec + 1) & 0x0f) << 8) | (bytes(sec + 2) & 0xff)
        // CRC-32/MPEG-2 property: the CRC over a section INCLUDING its
        // appended CRC bytes is zero iff the section is intact.
        require(crc32(bytes, sec, sec + 3 + secLen) == 0,
          s"PSI CRC mismatch on pid $pid")
        if (tableId == 0x00) { // PAT → find the PMT PID
          // walk ALL 4-byte program entries: program_number 0 maps the
          // NETWORK PID (a leading NIT entry is how real DVB PATs
          // start), so the PMT is the first non-zero program
          var e = sec + 8
          val end = sec + 3 + secLen - 4
          var found = -1
          while (e + 4 <= end && found < 0) {
            val progNum = ((bytes(e) & 0xff) << 8) | (bytes(e + 1) & 0xff)
            if (progNum != 0)
              found = ((bytes(e + 2) & 0x1f) << 8) | (bytes(e + 3) & 0xff)
            e += 4
          }
          require(found >= 0, "PAT carries no program (only NIT entries)")
          pmtPid = found
        } else if (tableId == 0x02) { // PMT → stream types
          val infoLen = ((bytes(sec + 10) & 0x0f) << 8) | (bytes(sec + 11) & 0xff)
          var e = sec + 12 + infoLen
          val end = sec + 3 + secLen - 4
          while (e < end) {
            val st = bytes(e) & 0xff
            val epid = ((bytes(e + 1) & 0x1f) << 8) | (bytes(e + 2) & 0xff)
            val esLen = ((bytes(e + 3) & 0x0f) << 8) | (bytes(e + 4) & 0xff)
            streamType(epid) = st
            e += 5 + esLen
          }
        }
      } else {
        if (pusi) {
          flush(pid)
          acc(pid) = Acc(new ByteArrayOutputStream(), 0, None)
          startIdx(pid) = i
        }
        acc.get(pid).foreach { a =>
          a.buf.write(bytes, body, o + PacketSize - body)
          a.n += 1
          if (pcr.isDefined && a.pcr.isEmpty) a.pcr = pcr
        }
      }
    }
    // end-of-stream: flush EVERY pid with an unfinished accumulation —
    // keying on the PMT's declared pids would silently drop the final
    // PES of any undeclared pid while emitting its earlier ones
    acc.keySet.toSeq.foreach(flush)
    outSeq.result().sortBy(_._1).map(_._2)
  }
}
