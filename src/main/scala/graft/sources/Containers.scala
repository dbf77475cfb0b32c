package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Real pure-JVM container formats behind the input/output-container
  * seam (SURVEY §2.2 #29/#30).
  *
  * The reference demuxes/muxes real containers through libav
  * (`/root/reference/streamtasks/media/container.py:38-116`,
  * `media/inputcontainer.py:62-110`, `media/outputcontainer.py:280-291`)
  * and pins the behavior with mux→demux round-trip tests
  * (`/root/reference/tests/media/test_containers.py:20-29`). This module
  * gives the engine the same capability for the RIFF family — WAV
  * (audio) and AVI (interleaved multi-stream audio+video) — written
  * from the public format specification, so container bytes flowing
  * through a `binary` column are *actually parsed*, not stand-ins.
  *
  * Scale: mux/demux are per-group kernels invoked inside
  * `mapGroups`/`mapPartitions` — each container's bytes live on one
  * executor; nothing crosses the driver. A container is one row
  * (binary column); a corpus of a billion containers is a parquet
  * scan + a narrow map.
  */
object Riff {

  /** One chunk: 4-char id + payload (padding byte excluded). */
  final case class Chunk(id: String, data: Array[Byte])

  def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def readU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  def readU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, US_ASCII)

  /** Append one chunk with RIFF even-byte padding. */
  def writeChunk(out: ByteArrayOutputStream, id: String,
      data: Array[Byte]): Unit = {
    require(id.length == 4, s"fourcc must be 4 chars: $id")
    out.write(id.getBytes(US_ASCII))
    out.write(u32(data.length.toLong))
    out.write(data)
    if ((data.length & 1) == 1) out.write(0) // pad to even (RIFF rule)
  }

  /** A LIST chunk: 'LIST' + size + listType + children bytes. */
  def writeList(out: ByteArrayOutputStream, listType: String,
      body: Array[Byte]): Unit = {
    out.write("LIST".getBytes(US_ASCII))
    out.write(u32((body.length + 4).toLong))
    out.write(listType.getBytes(US_ASCII))
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
  }

  /** Wrap a full body as `RIFF <size> <formType> body`. */
  def writeRiff(formType: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 12)
    out.write("RIFF".getBytes(US_ASCII))
    out.write(u32((body.length + 4).toLong))
    out.write(formType.getBytes(US_ASCII))
    out.write(body)
    out.toByteArray
  }

  /** Iterate the top-level chunks of a chunk sequence [from, until).
    * Unknown chunks are returned too — callers skip what they don't
    * know (the robustness rule real RIFF readers follow: JUNK, INFO
    * lists, third-party chunks must not break parsing). LIST chunks
    * come back with id "LIST:<type>" and data = child bytes. */
  def chunks(b: Array[Byte], from: Int, until: Int): Seq[Chunk] = {
    val acc = Seq.newBuilder[Chunk]
    var p = from
    while (p + 8 <= until) {
      val id = fourCC(b, p)
      // LONG arithmetic: a 32-bit length >= 2^31 (or the 0xFFFFFFFF
      // streaming-WAV convention) would go negative through .toInt and
      // start+len could wrap past the guard — validate first
      val lenL = readU32(b, p + 4)
      require((p + 8).toLong + lenL <= until,
        s"chunk $id at $p overruns container (len=$lenL, until=$until)")
      val len = lenL.toInt
      val start = p + 8
      if (id == "LIST" && len >= 4) {
        val listType = fourCC(b, start)
        acc += Chunk(s"LIST:$listType",
          java.util.Arrays.copyOfRange(b, start + 4, start + len))
      } else {
        acc += Chunk(id, java.util.Arrays.copyOfRange(b, start, start + len))
      }
      p = start + len + (len & 1) // skip pad byte
    }
    acc.result()
  }

  /** Parse a RIFF file: returns (formType, top-level chunks). */
  def parse(b: Array[Byte]): (String, Seq[Chunk]) = {
    require(b.length >= 12 && fourCC(b, 0) == "RIFF",
      "not a RIFF container")
    val size = readU32(b, 4).toInt
    require(size + 8 <= b.length, "RIFF size overruns buffer")
    (fourCC(b, 8), chunks(b, 12, 8 + size))
  }
}

/** WAV (RIFF/WAVE, PCM) muxer + demuxer.
  *
  * Layout written: RIFF('WAVE', fmt␣(16-byte PCM header), data).
  * The demuxer accepts any chunk order, skips unknown chunks (JUNK,
  * LIST INFO, fact, …) and honors the RIFF odd-length padding rule.
  */
object Wav {

  final case class WavData(sampleRate: Int, channels: Int,
      bitsPerSample: Int, data: Array[Byte]) {
    def blockAlign: Int = channels * bitsPerSample / 8
    def nSamples: Int = if (blockAlign == 0) 0 else data.length / blockAlign
  }

  def mux(w: WavData): Array[Byte] = {
    val body = new ByteArrayOutputStream(w.data.length + 64)
    val fmt = new ByteArrayOutputStream(16)
    fmt.write(Riff.u16(1)) // wFormatTag = PCM
    fmt.write(Riff.u16(w.channels))
    fmt.write(Riff.u32(w.sampleRate.toLong))
    fmt.write(Riff.u32(w.sampleRate.toLong * w.blockAlign)) // byte rate
    fmt.write(Riff.u16(w.blockAlign))
    fmt.write(Riff.u16(w.bitsPerSample))
    Riff.writeChunk(body, "fmt ", fmt.toByteArray)
    Riff.writeChunk(body, "data", w.data)
    Riff.writeRiff("WAVE", body.toByteArray)
  }

  def demux(bytes: Array[Byte]): WavData = {
    val (form, cs) = Riff.parse(bytes)
    require(form == "WAVE", s"not a WAVE file: form=$form")
    val fmt = cs.find(_.id == "fmt ")
      .getOrElse(throw new IllegalArgumentException("WAVE missing fmt chunk"))
    require(fmt.data.length >= 16, "fmt chunk too short")
    val tag = Riff.readU16(fmt.data, 0)
    require(tag == 1, s"only PCM supported, wFormatTag=$tag")
    val channels = Riff.readU16(fmt.data, 2)
    val rate = Riff.readU32(fmt.data, 4).toInt
    val bits = Riff.readU16(fmt.data, 14)
    val data = cs.find(_.id == "data")
      .getOrElse(throw new IllegalArgumentException("WAVE missing data chunk"))
    WavData(rate, channels, bits, data.data)
  }

  /** int16 LE helpers for PCM16 payloads. */
  def pcm16(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def samples16(data: Array[Byte]): Array[Int] = {
    // fed by arbitrary demuxed payloads (e.g. the RunDeployment .mp4
    // bind) — an odd byte count is a malformed s16 stream, and
    // silently dropping the trailing byte would contradict the bind
    // path's fail-loudly contract
    require(data.length % 2 == 0,
      s"s16 payload has odd byte length ${data.length}")
    val out = new Array[Int](data.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))
      i += 1
    }
    out
  }
}

/** AVI (RIFF 'AVI ') muxer + demuxer — the multi-stream interleaved
  * container: hdrl LIST (avih + one strl LIST per stream with
  * strh/strf), movi LIST of `##db`/`##wb` packet chunks in mux order,
  * and an idx1 index. Packet file order IS the interleave — the
  * output-container synchronizer's emit order becomes the chunk order
  * here, and the demuxer hands packets back in that same order, which
  * is what lets a query hash-verify the interleaving rule end to end.
  */
object Avi {

  /** kind: "vids" or "auds". rate/scale give the stream clock
    * (fps = rate/scale for video; samples/s for audio). */
  final case class AviStream(kind: String, scale: Int, rate: Int,
      width: Int = 0, height: Int = 0, channels: Int = 0,
      bitsPerSample: Int = 0)

  /** One packet, in file (interleave) order. */
  final case class AviPacket(stream: Int, keyframe: Boolean,
      payload: Array[Byte])

  private val AVIF_HASINDEX = 0x10L
  private val AVIIF_KEYFRAME = 0x10L

  private def twoCC(i: Int): String = f"$i%02d"

  private def chunkId(streams: Seq[AviStream], p: AviPacket): String =
    twoCC(p.stream) + (if (streams(p.stream).kind == "vids") "db" else "wb")

  private def strh(s: AviStream, nPackets: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(56)
    out.write(s.kind.getBytes(US_ASCII)) // fccType
    out.write((if (s.kind == "vids") "GRFT" else "    ")
      .getBytes(US_ASCII)) // fccHandler
    out.write(Riff.u32(0)) // dwFlags
    out.write(Riff.u16(0)); out.write(Riff.u16(0)) // priority, language
    out.write(Riff.u32(0)) // initial frames
    out.write(Riff.u32(s.scale.toLong))
    out.write(Riff.u32(s.rate.toLong))
    out.write(Riff.u32(0)) // start
    out.write(Riff.u32(nPackets.toLong)) // length (packets)
    out.write(Riff.u32(0)) // suggested buffer size
    out.write(Riff.u32(0xffffffffL)) // quality (-1 = default)
    out.write(Riff.u32(0)) // sample size (0 = varying)
    out.write(Riff.u16(0)); out.write(Riff.u16(0)) // rcFrame l,t
    out.write(Riff.u16(s.width)); out.write(Riff.u16(s.height)) // r,b
    out.toByteArray
  }

  private def strf(s: AviStream): Array[Byte] =
    if (s.kind == "vids") {
      val out = new ByteArrayOutputStream(40) // BITMAPINFOHEADER
      out.write(Riff.u32(40))
      out.write(Riff.u32(s.width.toLong)); out.write(Riff.u32(s.height.toLong))
      out.write(Riff.u16(1)) // planes
      out.write(Riff.u16(32)) // bpp (RGBA frames)
      out.write(Riff.u32(0)) // compression BI_RGB
      out.write(Riff.u32(s.width.toLong * s.height * 4)) // image size
      out.write(Riff.u32(0)); out.write(Riff.u32(0)) // ppm x,y
      out.write(Riff.u32(0)); out.write(Riff.u32(0)) // clr used, important
      out.toByteArray
    } else {
      val out = new ByteArrayOutputStream(16) // WAVEFORMAT (PCM)
      val blockAlign = s.channels * s.bitsPerSample / 8
      out.write(Riff.u16(1)) // PCM
      out.write(Riff.u16(s.channels))
      out.write(Riff.u32(s.rate.toLong / math.max(1, s.scale)))
      out.write(Riff.u32(s.rate.toLong / math.max(1, s.scale) * blockAlign))
      out.write(Riff.u16(blockAlign))
      out.write(Riff.u16(s.bitsPerSample))
      out.toByteArray
    }

  def mux(streams: Seq[AviStream], packets: Seq[AviPacket]): Array[Byte] = {
    require(streams.nonEmpty && streams.length <= 100, "1..100 streams")
    packets.foreach(p => require(p.stream >= 0 && p.stream < streams.length,
      s"packet for unknown stream ${p.stream}"))
    val perStream = packets.groupBy(_.stream).map { case (k, v) => k -> v.size }

    // hdrl: avih + strl per stream
    val avih = new ByteArrayOutputStream(56)
    val vid = streams.find(_.kind == "vids")
    val usPerFrame = vid.map(v => 1000000L * v.scale / math.max(1, v.rate))
      .getOrElse(0L)
    avih.write(Riff.u32(usPerFrame))
    avih.write(Riff.u32(0)) // max bytes/s
    avih.write(Riff.u32(0)) // padding granularity
    avih.write(Riff.u32(AVIF_HASINDEX))
    avih.write(Riff.u32(vid.map(_ => packets.count(p =>
      streams(p.stream).kind == "vids").toLong).getOrElse(0L))) // total frames
    avih.write(Riff.u32(0)) // initial frames
    avih.write(Riff.u32(streams.length.toLong))
    avih.write(Riff.u32(0)) // suggested buffer
    avih.write(Riff.u32(vid.map(_.width.toLong).getOrElse(0L)))
    avih.write(Riff.u32(vid.map(_.height.toLong).getOrElse(0L)))
    (0 until 4).foreach(_ => avih.write(Riff.u32(0))) // reserved

    val hdrl = new ByteArrayOutputStream()
    Riff.writeChunk(hdrl, "avih", avih.toByteArray)
    streams.zipWithIndex.foreach { case (s, i) =>
      val strl = new ByteArrayOutputStream()
      Riff.writeChunk(strl, "strh", strh(s, perStream.getOrElse(i, 0)))
      Riff.writeChunk(strl, "strf", strf(s))
      Riff.writeList(hdrl, "strl", strl.toByteArray)
    }

    // movi: packets in given order; idx1 offsets are relative to the
    // 'movi' fourcc position (the de-facto standard base).
    val movi = new ByteArrayOutputStream()
    val idx = new ByteArrayOutputStream(16 * packets.length)
    packets.foreach { p =>
      val off = movi.size() + 4 // +4: offset counted from 'movi' fourcc
      Riff.writeChunk(movi, chunkId(streams, p), p.payload)
      idx.write(chunkId(streams, p).getBytes(US_ASCII))
      idx.write(Riff.u32(if (p.keyframe) AVIIF_KEYFRAME else 0L))
      idx.write(Riff.u32(off.toLong))
      idx.write(Riff.u32(p.payload.length.toLong))
    }

    val body = new ByteArrayOutputStream()
    Riff.writeList(body, "hdrl", hdrl.toByteArray)
    Riff.writeList(body, "movi", movi.toByteArray)
    Riff.writeChunk(body, "idx1", idx.toByteArray)
    Riff.writeRiff("AVI ", body.toByteArray)
  }

  def demux(bytes: Array[Byte]): (Seq[AviStream], Seq[AviPacket]) = {
    val (form, top) = Riff.parse(bytes)
    require(form == "AVI ", s"not an AVI file: form=$form")
    val hdrl = top.find(_.id == "LIST:hdrl")
      .getOrElse(throw new IllegalArgumentException("AVI missing hdrl"))
    val streams = Riff.chunks(hdrl.data, 0, hdrl.data.length)
      .filter(_.id == "LIST:strl").map { strl =>
        val cs = Riff.chunks(strl.data, 0, strl.data.length)
        val h = cs.find(_.id == "strh")
          .getOrElse(throw new IllegalArgumentException("strl missing strh"))
        val f = cs.find(_.id == "strf")
          .getOrElse(throw new IllegalArgumentException("strl missing strf"))
        val kind = Riff.fourCC(h.data, 0)
        val scale = Riff.readU32(h.data, 20).toInt
        val rate = Riff.readU32(h.data, 24).toInt
        if (kind == "vids")
          AviStream(kind, scale, rate,
            width = Riff.readU32(f.data, 4).toInt,
            height = Riff.readU32(f.data, 8).toInt)
        else
          AviStream(kind, scale, rate,
            channels = Riff.readU16(f.data, 2),
            bitsPerSample = Riff.readU16(f.data, 14))
      }
    val movi = top.find(_.id == "LIST:movi")
      .getOrElse(throw new IllegalArgumentException("AVI missing movi"))
    // idx1 keyframe flags by occurrence order (fall back: all keyframes)
    val idxFlags: Map[Int, Boolean] = top.find(_.id == "idx1").map { ix =>
      (0 until ix.data.length / 16)
        .map(i => i -> ((Riff.readU32(ix.data, i * 16 + 4) & AVIIF_KEYFRAME) != 0))
        .toMap
    }.getOrElse(Map.empty)
    // media packets are '##db/dc/wb' — the suffix check excludes
    // non-media '##pc' palette chunks, and the keyframe index i is
    // taken AFTER filtering so idx1 entries (which count only media
    // packets) line up even when JUNK/'rec ' chunks pad movi
    val packets = Riff.chunks(movi.data, 0, movi.data.length)
      .filter(c => c.id.length == 4 &&
        c.id(0).isDigit && c.id(1).isDigit &&
        Set("db", "dc", "wb")(c.id.substring(2)))
      .zipWithIndex
      .map { case (c, i) =>
        AviPacket(c.id.substring(0, 2).toInt,
          idxFlags.getOrElse(i, true), c.data)
      }
    (streams, packets)
  }
}
