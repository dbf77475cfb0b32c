package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal-but-real Matroska (EBML) mux/demux — the engine's second
  * container family, and the one the reference actually streams
  * (mkv/webm through libav: `/root/reference/streamtasks/media/
  * container.py:38-116`, container round-trips
  * `tests/media/test_containers.py:20-29`). Written from the public
  * EBML/Matroska specification (RFC 8794 + matroska.org element IDs):
  * variable-length element IDs and sizes, master-element recursion,
  * Info/Tracks metadata, and Cluster/SimpleBlock packet framing with
  * int16 cluster-relative timestamps.
  *
  * Same scale stance as [[Riff]]: mux/demux are per-group executor
  * kernels over binary columns; one container never spans executors.
  */
object Ebml {

  /** Bytes needed for a vint holding `v` (the all-ones pattern is
    * reserved for "unknown size", so 2^(7n)−1 itself needs n+1). */
  def vintSize(v: Long): Int = {
    require(v >= 0, s"vint must be non-negative: $v")
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    n
  }

  def writeVint(out: ByteArrayOutputStream, v: Long): Unit = {
    val n = vintSize(v)
    val marked = v | (1L << (7 * n)) // length marker bit
    var i = n - 1
    while (i >= 0) { out.write(((marked >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** Read a size-vint at `off`: (value, bytesRead). The all-ones
    * payload is RFC 8794's reserved "unknown size" (live-streamed
    * Segments/Clusters use it) — parsing it as a literal would slice
    * a bogus body, so it fails loud instead. */
  def readVint(b: Array[Byte], off: Int): (Long, Int) = {
    val first = b(off) & 0xff
    require(first != 0, s"invalid vint lead byte 0 at $off")
    val n = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    var v = (first & ((1 << (8 - n)) - 1)).toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    require(v != (1L << (7 * n)) - 1,
      s"unknown-size vint at $off (all value bits set) is unsupported")
    (v, n)
  }

  /** Read an element ID at `off` — IDs keep their marker bit (the
    * spec's "as stored" convention): (id, bytesRead). */
  def readId(b: Array[Byte], off: Int): (Long, Int) = {
    val first = b(off) & 0xff
    require(first != 0, s"invalid EBML id lead byte 0 at $off")
    val n = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    var v = first.toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    (v, n)
  }

  private def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (0 until n).map(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  def writeElem(out: ByteArrayOutputStream, id: Long,
      data: Array[Byte]): Unit = {
    out.write(idBytes(id))
    writeVint(out, data.length.toLong)
    out.write(data)
  }

  /** Minimal big-endian unsigned int payload (≥ 1 byte). */
  def uintBytes(v: Long): Array[Byte] = {
    require(v >= 0)
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte).toArray
  }

  def readUint(b: Array[Byte]): Long = {
    var v = 0L
    b.foreach(x => v = (v << 8) | (x & 0xff))
    v
  }

  def floatBytes(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
  }

  def readFloat(b: Array[Byte]): Double = b.length match {
    case 4 => java.lang.Float.intBitsToFloat(readUint(b).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(readUint(b))
    case n => throw new IllegalArgumentException(s"EBML float of $n bytes")
  }

  final case class El(id: Long, data: Array[Byte])

  /** Children of a master element's body [from, until). Unknown
    * elements are returned for the caller to skip — EBML's forward-
    * compatibility rule. */
  def children(b: Array[Byte], from: Int, until: Int): Seq[El] = {
    val acc = Seq.newBuilder[El]
    var p = from
    while (p < until) {
      val (id, idLen) = readId(b, p)
      val (size, szLen) = readVint(b, p + idLen)
      val start = p + idLen + szLen
      require(start + size <= until,
        s"element 0x${id.toHexString} overruns container at $p")
      acc += El(id, java.util.Arrays.copyOfRange(b, start, start + size.toInt))
      p = start + size.toInt
    }
    acc.result()
  }
}

object Mkv {
  import Ebml._

  // Element IDs (as stored, marker bit included) — matroska.org spec.
  val IdEbml = 0x1A45DFA3L
  val IdDocType = 0x4282L
  val IdDocTypeVersion = 0x4287L
  val IdSegment = 0x18538067L
  val IdInfo = 0x1549A966L
  val IdTimestampScale = 0x2AD7B1L
  val IdTracks = 0x1654AE6BL
  val IdTrackEntry = 0xAEL
  val IdTrackNumber = 0xD7L
  val IdTrackType = 0x83L
  val IdCodecId = 0x86L
  val IdVideo = 0xE0L
  val IdPixelWidth = 0xB0L
  val IdPixelHeight = 0xBAL
  val IdAudio = 0xE1L
  val IdSamplingFrequency = 0xB5L
  val IdChannels = 0x9FL
  val IdCluster = 0x1F43B675L
  val IdClusterTs = 0xE7L
  val IdSimpleBlock = 0xA3L

  final case class MkvTrack(number: Int, kind: String, codecId: String,
      width: Int = 0, height: Int = 0, sampleRate: Double = 0,
      channels: Int = 0)

  /** One block; tsMs is the ABSOLUTE timestamp (TimestampScale fixed
    * at 1 ms per tick). */
  final case class MkvBlock(track: Int, tsMs: Long, keyframe: Boolean,
      payload: Array[Byte])

  /** Mux blocks (already in presentation order) into Segment >
    * Clusters. A cluster closes after `clusterMax` blocks or when the
    * next block's cluster-relative timestamp would overflow the
    * SimpleBlock's int16. */
  def mux(tracks: Seq[MkvTrack], blocks: Seq[MkvBlock],
      clusterMax: Int = 8): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    val byNum = tracks.map(_.number).toSet
    blocks.foreach(blk => require(byNum.contains(blk.track),
      s"block for unknown track ${blk.track}"))

    val ebml = new ByteArrayOutputStream()
    writeElem(ebml, IdDocType, "matroska".getBytes("US-ASCII"))
    writeElem(ebml, IdDocTypeVersion, uintBytes(4))

    val info = new ByteArrayOutputStream()
    writeElem(info, IdTimestampScale, uintBytes(1000000L)) // 1 ms ticks

    val trks = new ByteArrayOutputStream()
    tracks.foreach { t =>
      val te = new ByteArrayOutputStream()
      writeElem(te, IdTrackNumber, uintBytes(t.number.toLong))
      writeElem(te, IdTrackType, uintBytes(if (t.kind == "video") 1L else 2L))
      writeElem(te, IdCodecId, t.codecId.getBytes("US-ASCII"))
      if (t.kind == "video") {
        val v = new ByteArrayOutputStream()
        writeElem(v, IdPixelWidth, uintBytes(t.width.toLong))
        writeElem(v, IdPixelHeight, uintBytes(t.height.toLong))
        writeElem(te, IdVideo, v.toByteArray)
      } else {
        val a = new ByteArrayOutputStream()
        writeElem(a, IdSamplingFrequency, floatBytes(t.sampleRate))
        writeElem(a, IdChannels, uintBytes(t.channels.toLong))
        writeElem(te, IdAudio, a.toByteArray)
      }
      writeElem(trks, IdTrackEntry, te.toByteArray)
    }

    val seg = new ByteArrayOutputStream()
    writeElem(seg, IdInfo, info.toByteArray)
    writeElem(seg, IdTracks, trks.toByteArray)

    require(clusterMax > 0, s"clusterMax $clusterMax must be positive")
    var i = 0
    while (i < blocks.length) {
      val base = blocks(i).tsMs
      val cl = new ByteArrayOutputStream()
      writeElem(cl, IdClusterTs, uintBytes(base))
      var n = 0
      // BOTH int16 bounds: an out-of-order block more than 32768 ms
      // BEFORE the cluster base would truncate silently — it starts
      // its own cluster (whose base is its own timestamp) instead
      while (i < blocks.length && n < clusterMax &&
          blocks(i).tsMs - base <= 32767 &&
          blocks(i).tsMs - base >= -32768) {
        val blk = blocks(i)
        val sb = new ByteArrayOutputStream(blk.payload.length + 4)
        writeVint(sb, blk.track.toLong)
        val rel = (blk.tsMs - base).toInt
        sb.write((rel >> 8) & 0xff); sb.write(rel & 0xff)
        sb.write(if (blk.keyframe) 0x80 else 0x00)
        sb.write(blk.payload)
        writeElem(cl, IdSimpleBlock, sb.toByteArray)
        i += 1; n += 1
      }
      writeElem(seg, IdCluster, cl.toByteArray)
    }

    val out = new ByteArrayOutputStream()
    writeElem(out, IdEbml, ebml.toByteArray)
    writeElem(out, IdSegment, seg.toByteArray)
    out.toByteArray
  }

  def demux(bytes: Array[Byte]): (Seq[MkvTrack], Seq[MkvBlock]) = {
    val top = children(bytes, 0, bytes.length)
    val hdr = top.find(_.id == IdEbml)
      .getOrElse(throw new IllegalArgumentException("missing EBML header"))
    val doctype = children(hdr.data, 0, hdr.data.length)
      .find(_.id == IdDocType).map(e => new String(e.data, "US-ASCII"))
    require(doctype.forall(d => d == "matroska" || d == "webm"),
      s"unsupported doctype ${doctype.getOrElse("?")}")
    val seg = top.find(_.id == IdSegment)
      .getOrElse(throw new IllegalArgumentException("missing Segment"))
    val segEls = children(seg.data, 0, seg.data.length)

    val tracks = segEls.filter(_.id == IdTracks).flatMap(t =>
      children(t.data, 0, t.data.length).filter(_.id == IdTrackEntry)
        .map { te =>
          val els = children(te.data, 0, te.data.length)
          def u(id: Long): Long =
            els.find(_.id == id).map(e => readUint(e.data)).getOrElse(0L)
          val kind = if (u(IdTrackType) == 1L) "video" else "audio"
          val codec = els.find(_.id == IdCodecId)
            .map(e => new String(e.data, "US-ASCII")).getOrElse("")
          val video = els.find(_.id == IdVideo)
            .map(v => children(v.data, 0, v.data.length))
          val audio = els.find(_.id == IdAudio)
            .map(a => children(a.data, 0, a.data.length))
          def sub(m: Option[Seq[El]], id: Long): Option[El] =
            m.flatMap(_.find(_.id == id))
          MkvTrack(u(IdTrackNumber).toInt, kind, codec,
            width = sub(video, IdPixelWidth).map(e => readUint(e.data).toInt)
              .getOrElse(0),
            height = sub(video, IdPixelHeight).map(e => readUint(e.data).toInt)
              .getOrElse(0),
            sampleRate = sub(audio, IdSamplingFrequency)
              .map(e => readFloat(e.data)).getOrElse(0.0),
            channels = sub(audio, IdChannels).map(e => readUint(e.data).toInt)
              .getOrElse(0))
        })

    val blocks = segEls.filter(_.id == IdCluster).flatMap { cl =>
      val els = children(cl.data, 0, cl.data.length)
      val base = els.find(_.id == IdClusterTs).map(e => readUint(e.data))
        .getOrElse(0L)
      els.filter(_.id == IdSimpleBlock).map { sb =>
        val (track, tLen) = readVint(sb.data, 0)
        val rel = ((sb.data(tLen) & 0xff) << 8) | (sb.data(tLen + 1) & 0xff)
        val relSigned = if (rel >= 0x8000) rel - 0x10000 else rel
        val flags = sb.data(tLen + 2) & 0xff
        // lacing (flag bits 0x06) packs several frames behind lace
        // headers this parser would hand back as payload — fail loud
        require((flags & 0x06) == 0,
          "laced SimpleBlock (flags 0x" +
            Integer.toHexString(flags) + ") is unsupported")
        MkvBlock(track.toInt, base + relSigned, (flags & 0x80) != 0,
          java.util.Arrays.copyOfRange(sb.data, tLen + 3, sb.data.length))
      }
    }
    (tracks, blocks)
  }
}
