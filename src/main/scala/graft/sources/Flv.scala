package graft.sources

import java.io.ByteArrayOutputStream

/** FLV — the container RTMP live streams are delivered in, written
  * from the public Adobe "Video File Format Specification v10" (the
  * FLV body is byte-identical to the RTMP message stream, which is
  * why every RTMP ingest speaks it). The FIFTH container family next
  * to RIFF (Wav/Avi), EBML (Matroska), ISO-BMFF and MPEG-TS, and the
  * engine's stand-in for the reference's live-URL demux path: the
  * reference accepts `rtmp://` sources by handing the URL to libav
  * (media/container.py:38-116; inputcontainer.py:85-98 feeds
  * per-track topics from it) — here the FRAME LAYER of that transport
  * is a first-class format with a mux and a validating demux.
  *
  * Layout (spec §"The FLV File Format"):
  *  - header: "FLV", version 1, TypeFlags (bit2 audio, bit0 video),
  *    DataOffset u32 = 9;
  *  - body: PreviousTagSize0 = 0, then per tag: TagType u8 (8 audio /
  *    9 video / 18 script), DataSize u24, Timestamp u24 plus
  *    TimestampExtended u8 carrying bits 24..31 (the famous split
  *    field — streams longer than 2^24 ms overflow into the extended
  *    byte), StreamID u24 = 0, the data, then PreviousTagSize u32 =
  *    11 + DataSize — a back-pointer chain the demux validates.
  *  - audio data: SoundFormat(4b)|SoundRate(2b)|SoundSize(1b)|
  *    SoundType(1b) header byte, then sound payload;
  *  - video data: FrameType(4b: 1 key / 2 inter)|CodecID(4b) header
  *    byte, then video payload.
  */
object Flv {

  val TagAudio = 8
  val TagVideo = 9

  /** One mux/demux unit. `tagType` 8 = audio, 9 = video; `keyframe`
    * is meaningful for video only (audio tags always demux true). */
  final case class FlvTag(tagType: Int, tsMs: Long, keyframe: Boolean,
      payload: Array[Byte])

  /** Stream config carried in the per-tag data header bytes. */
  final case class FlvConfig(audioFormat: Int = 0, audioRate: Int = 3,
      audioSize: Int = 1, audioStereo: Boolean = false, videoCodec: Int = 2)

  private def u24(out: ByteArrayOutputStream, v: Long): Unit = {
    require(v >= 0 && v <= 0xFFFFFF, s"u24 out of range: $v")
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write((v & 0xFF).toInt)
  }
  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }
  def readU24(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 16) | ((b(off + 1) & 0xFFL) << 8) | (b(off + 2) & 0xFFL)
  def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  def mux(tags: Seq[FlvTag], cfg: FlvConfig = FlvConfig()): Array[Byte] = {
    val hasAudio = tags.exists(_.tagType == TagAudio)
    val hasVideo = tags.exists(_.tagType == TagVideo)
    val out = new ByteArrayOutputStream(16 + tags.map(_.payload.length + 16).sum)
    out.write('F'); out.write('L'); out.write('V'); out.write(1)
    out.write((if (hasAudio) 4 else 0) | (if (hasVideo) 1 else 0))
    u32(out, 9L) // DataOffset: header size
    u32(out, 0L) // PreviousTagSize0
    tags.foreach { t =>
      require(t.tagType == TagAudio || t.tagType == TagVideo,
        s"unsupported tag type ${t.tagType}")
      require(t.tsMs >= 0 && t.tsMs <= 0xFFFFFFFFL, s"timestamp ${t.tsMs}")
      val dataSize = t.payload.length + 1 // +1: the audio/video header byte
      out.write(t.tagType)
      u24(out, dataSize.toLong)
      u24(out, t.tsMs & 0xFFFFFF)       // low 24 bits…
      out.write(((t.tsMs >> 24) & 0xFF).toInt) // …extended byte = bits 24..31
      u24(out, 0L) // StreamID, always 0
      if (t.tagType == TagVideo)
        out.write(((if (t.keyframe) 1 else 2) << 4) | (cfg.videoCodec & 0xF))
      else
        out.write((cfg.audioFormat << 4) | ((cfg.audioRate & 3) << 2) |
          ((cfg.audioSize & 1) << 1) | (if (cfg.audioStereo) 1 else 0))
      out.write(t.payload)
      u32(out, 11L + dataSize) // PreviousTagSize back-pointer
    }
    out.toByteArray
  }

  /** Parse FLV bytes; validates the signature, version, DataOffset,
    * and the full PreviousTagSize chain. Returns (hasAudio, hasVideo,
    * tags) with timestamps rebuilt from the split 24+8-bit field. */
  def demux(bytes: Array[Byte]): (Boolean, Boolean, Seq[FlvTag]) = {
    require(bytes.length >= 13, "truncated FLV header")
    require(bytes(0) == 'F' && bytes(1) == 'L' && bytes(2) == 'V',
      "not an FLV file")
    require(bytes(3) == 1, s"unsupported FLV version ${bytes(3)}")
    val flags = bytes(4) & 0xFF
    val dataOffset = readU32(bytes, 5)
    require(dataOffset == 9, s"unexpected DataOffset $dataOffset")
    require(readU32(bytes, 9) == 0, "PreviousTagSize0 must be 0")
    val tags = Seq.newBuilder[FlvTag]
    var pos = 13
    while (pos < bytes.length) {
      require(pos + 11 <= bytes.length, s"truncated tag header at $pos")
      val tagType = bytes(pos) & 0xFF
      val dataSize = readU24(bytes, pos + 1).toInt
      val ts = readU24(bytes, pos + 4) | ((bytes(pos + 7) & 0xFFL) << 24)
      require(readU24(bytes, pos + 8) == 0, "StreamID must be 0")
      require(pos + 11 + dataSize + 4 <= bytes.length,
        s"truncated tag body at $pos")
      val prev = readU32(bytes, pos + 11 + dataSize)
      require(prev == 11L + dataSize,
        s"PreviousTagSize chain broken at $pos: $prev != ${11 + dataSize}")
      if (tagType == TagAudio || tagType == TagVideo) {
        // the A/V data header byte is mandatory — a zero DataSize
        // audio/video tag is malformed (fail loud, not copyOfRange)
        require(dataSize >= 1,
          s"zero-length ${if (tagType == TagAudio) "audio" else "video"} " +
            s"tag at $pos: the data header byte is mandatory")
        val hdr = bytes(pos + 11) & 0xFF
        val keyframe = tagType != TagVideo || (hdr >> 4) == 1
        val payload = java.util.Arrays.copyOfRange(bytes,
          pos + 12, pos + 11 + dataSize)
        tags += FlvTag(tagType, ts, keyframe, payload)
      } // other tag types (e.g. 18 = script data) are skipped whole
      pos += 11 + dataSize + 4
    }
    ((flags & 4) != 0, (flags & 1) != 0, tags.result())
  }
}
