package graft

import graft.sources.Flv
import graft.sources.Flv.{FlvConfig, FlvTag}
import org.scalatest.funsuite.AnyFunSuite

/** FLV container unit tests ([[graft.sources.Flv]] — Adobe Video File
  * Format Specification v10): byte-level framing, the split 24+8-bit
  * timestamp, the PreviousTagSize chain, and mux→demux identity —
  * the m30 oracle's local counterpart (mirroring the reference's
  * container round-trip tests, tests/media/test_containers.py:20-29).
  */
class FlvSpec extends AnyFunSuite {

  private def tag(t: Int, ts: Long, key: Boolean, s: String) =
    FlvTag(t, ts, key, s.getBytes("US-ASCII"))

  test("mux → demux is identity on tags, keyframes and timestamps") {
    val tags = Seq(
      tag(Flv.TagVideo, 0, key = true, "I-frame"),
      tag(Flv.TagAudio, 0, key = true, "pcm0"),
      tag(Flv.TagVideo, 33, key = false, "P-frame"),
      tag(Flv.TagAudio, 32, key = true, ""))
    val (a, v, dec) = Flv.demux(Flv.mux(tags))
    assert(a && v)
    assert(dec.map(t => (t.tagType, t.tsMs, t.keyframe)) ==
      tags.map(t => (t.tagType, t.tsMs, t.keyframe)))
    assert(dec.map(_.payload.toSeq) == tags.map(_.payload.toSeq))
  }

  test("header bytes: signature, version 1, flags from present tracks, " +
      "DataOffset 9, PreviousTagSize0 = 0") {
    val bytes = Flv.mux(Seq(tag(Flv.TagVideo, 0, key = true, "x")))
    assert(new String(bytes.take(3), "US-ASCII") == "FLV")
    assert(bytes(3) == 1)
    assert(bytes(4) == 1) // video only: bit 0
    assert(Flv.readU32(bytes, 5) == 9)
    assert(Flv.readU32(bytes, 9) == 0)
    val audioOnly = Flv.mux(Seq(tag(Flv.TagAudio, 0, key = true, "x")))
    assert(audioOnly(4) == 4) // audio: bit 2
  }

  test("timestamps past 2^24 ms split into Timestamp + " +
      "TimestampExtended and reassemble exactly") {
    val big = 0x1234567L * 3 // 57 652 533 ms > 16 777 216
    val bytes = Flv.mux(Seq(tag(Flv.TagVideo, big, key = true, "x")))
    // low 24 bits in the u24 field, bits 24..31 in the extended byte
    assert(Flv.readU24(bytes, 13 + 4) == (big & 0xFFFFFF))
    assert((bytes(13 + 7) & 0xFF) == (big >> 24))
    val (_, _, dec) = Flv.demux(bytes)
    assert(dec.head.tsMs == big)
  }

  test("video FrameType nibble carries the keyframe bit; audio header " +
      "byte carries the configured format bits") {
    val cfg = FlvConfig(audioFormat = 0, audioRate = 3, audioSize = 1,
      audioStereo = false, videoCodec = 2)
    val bytes = Flv.mux(Seq(
      tag(Flv.TagVideo, 0, key = true, "k"),
      tag(Flv.TagVideo, 33, key = false, "p"),
      tag(Flv.TagAudio, 64, key = true, "a")), cfg)
    val (_, _, dec) = Flv.demux(bytes)
    assert(dec.map(_.keyframe) == Seq(true, false, true))
    // first video data byte: FrameType 1 (key) | CodecID 2
    assert((bytes(13 + 11) & 0xFF) == 0x12)
    // audio data byte: fmt 0 | rate 3 << 2 | size 1 << 1 | mono
    val audioOff = bytes.length - (11 + 2 + 4) // last tag: 1 hdr + 1 payload
    assert((bytes(audioOff + 11) & 0xFF) == 0x0E)
  }

  test("demux validates the PreviousTagSize chain and rejects " +
      "corruption loudly") {
    val bytes = Flv.mux(Seq(tag(Flv.TagVideo, 0, key = true, "payload")))
    val broken = bytes.clone()
    broken(bytes.length - 1) = (broken(bytes.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Flv.demux(broken))
    assert(e.getMessage.contains("PreviousTagSize"))
    val notFlv = "GIF89a".getBytes("US-ASCII") ++ new Array[Byte](16)
    assert(intercept[IllegalArgumentException](Flv.demux(notFlv))
      .getMessage.contains("not an FLV"))
  }

  test("demux rejects a zero-length audio/video tag loudly (the data " +
      "header byte is mandatory) and skips foreign tag types whole") {
    // hand-build: header + one DataSize=0 video tag
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('F', 'L', 'V', 1, 1)) // video-only flags
    out.write(Array[Byte](0, 0, 0, 9, 0, 0, 0, 0)) // DataOffset, prev0
    out.write(9) // video tag
    out.write(Array[Byte](0, 0, 0)) // DataSize = 0
    out.write(Array[Byte](0, 0, 0, 0)) // ts + ext
    out.write(Array[Byte](0, 0, 0)) // StreamID
    out.write(Array[Byte](0, 0, 0, 11)) // PreviousTagSize = 11
    val e = intercept[IllegalArgumentException](Flv.demux(out.toByteArray))
    assert(e.getMessage.contains("zero-length video tag"))
    // a script-data tag (type 18) is skipped, not decoded
    val withScript = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array[Byte]('F', 'L', 'V', 1, 1))
      o.write(Array[Byte](0, 0, 0, 9, 0, 0, 0, 0))
      o.write(18) // script data, DataSize 2
      o.write(Array[Byte](0, 0, 2))
      o.write(Array[Byte](0, 0, 0, 0))
      o.write(Array[Byte](0, 0, 0))
      o.write(Array[Byte](42, 42))
      o.write(Array[Byte](0, 0, 0, 13)) // 11 + 2
      o.toByteArray
    }
    val (_, _, tags) = Flv.demux(withScript)
    assert(tags.isEmpty)
  }
}
