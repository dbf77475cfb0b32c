package graft

import graft.sources.AudioIndex
import graft.sources.AudioIndex.{AdtsFrame, Mp3Frame}
import org.scalatest.funsuite.AnyFunSuite

/** ADTS (ISO 13818-7 §6.2) and MPEG-1 Layer III (ISO 11172-3 §2.4)
  * frame-header conformance for the audio indexers. */
class AudioIndexSpec extends AnyFunSuite {

  test("ADTS round trip: profiles, the 13-entry rate table, channel " +
      "configs split across header bytes, CRC/no-CRC header lengths, " +
      "offsets from the self-delimiting length field") {
    val frames = (0 until 20).map { i =>
      AdtsFrame(i % 4, i % 13, 1 + i % 7, crcPresent = i % 2 == 0,
        Array.tabulate(10 + i * 3)(j => (i + j).toByte))
    }
    val bytes = AudioIndex.adtsMux(frames)
    val got = AudioIndex.adtsDemux(bytes)
    assert(got.size == frames.size)
    var expOff = 0L
    got.zip(frames).foreach { case ((off, g), w) =>
      assert(off == expOff, s"offset drift at frame") // length accounting
      assert(g.profile == w.profile && g.rateIndex == w.rateIndex &&
        g.channels == w.channels && g.crcPresent == w.crcPresent)
      assert(g.rate == AudioIndex.AdtsRates(w.rateIndex))
      assert(g.payload.toSeq == w.payload.toSeq)
      assert(g.frameLen == (if (w.crcPresent) 9 else 7) + w.payload.length)
      expOff += g.frameLen
    }
    assert(expOff == bytes.length)
  }

  test("ADTS guards: lost sync, layer bits, reserved rate index, " +
      "overrunning length all fail loud") {
    val ok = AudioIndex.adtsMux(Seq(AdtsFrame(1, 4, 2, crcPresent = false,
      Array.fill(30)(7.toByte))))
    val syncFlip = ok.clone(); syncFlip(0) = 0x7f
    intercept[IllegalArgumentException] { AudioIndex.adtsDemux(syncFlip) }
    val layer = ok.clone(); layer(1) = (layer(1) | 0x02).toByte
    intercept[IllegalArgumentException] { AudioIndex.adtsDemux(layer) }
    val rate = ok.clone(); rate(2) = ((rate(2) & 0xc3) | (14 << 2)).toByte
    intercept[IllegalArgumentException] { AudioIndex.adtsDemux(rate) }
    intercept[IllegalArgumentException] {
      AudioIndex.adtsDemux(ok.dropRight(3))
    }
  }

  test("MP3 frame arithmetic matches the spec's published example " +
      "sizes: 128 kbps at 44100 Hz is 417/418 bytes with padding, " +
      "320 kbps at 44100 is 1044, and offsets accumulate exactly") {
    assert(Mp3Frame(9, 0, padding = false, 0).frameLen == 417)
    assert(Mp3Frame(9, 0, padding = true, 0).frameLen == 418)
    assert(Mp3Frame(14, 0, padding = false, 0).frameLen == 1044)
    assert(Mp3Frame(9, 1, padding = false, 0).frameLen == 384) // 48 kHz
    val frames = (0 until 15).map(i =>
      Mp3Frame(1 + i % 14, i % 3, i % 2 == 0, i % 4))
    val bytes = AudioIndex.mp3Mux(frames)
    val got = AudioIndex.mp3Demux(bytes)
    assert(got.size == frames.size)
    var off = 0L
    got.zip(frames).foreach { case ((o, g), w) =>
      assert(o == off)
      assert(g == w)
      off += g.frameLen
    }
    assert(off == bytes.length)
    // VBR detection = bitrate-index histogram has > 1 distinct entry
    assert(got.map(_._2.bitrateIndex).distinct.size > 1)
  }

  test("real-file MP3 shape: a leading ID3v2 tag (syncsafe size) is " +
      "skipped and a trailing 128-byte ID3v1 'TAG' block ends the " +
      "index cleanly") {
    val frames = Seq(Mp3Frame(9, 0, padding = false, 0),
      Mp3Frame(11, 1, padding = true, 1))
    val audio = AudioIndex.mp3Mux(frames)
    // ID3v2 header: size 0x0203 encoded syncsafe = (4 << 7) | 3 - use
    // a 517-byte tag: syncsafe bytes 0x04 0x05 -> (4<<7)|5 = 517
    val tagBody = new Array[Byte](517)
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 4, 5) ++ tagBody
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val file = id3v2 ++ audio ++ id3v1
    val got = AudioIndex.mp3Demux(file)
    assert(got.size == 2)
    assert(got.head._1 == id3v2.length.toLong, "first frame offset must sit after ID3v2")
    assert(got.map(_._2) == frames)
    // a non-syncsafe size byte fails loud instead of misparsing
    val bad = file.clone(); bad(8) = 0x84.toByte
    intercept[IllegalArgumentException] { AudioIndex.mp3Demux(bad) }
    // id3v2.4 footer flag (0x10): size counts neither header nor the
    // 10-byte footer — a conformant footer'd tag must not lose sync
    val footer = Array[Byte]('3', 'D', 'I', 4, 0, 0, 0, 0, 4, 5)
    val id3v2f = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 4, 5) ++
      tagBody ++ footer
    val gotF = AudioIndex.mp3Demux(id3v2f ++ audio)
    assert(gotF.size == 2 && gotF.head._1 == id3v2f.length.toLong)
  }

  test("MP3 guards: free-format (index 0) and forbidden (15) bitrates, " +
      "reserved sampling rate, MPEG-2 version bits, Layer I all rejected") {
    intercept[IllegalArgumentException] { Mp3Frame(0, 0, false, 0) }
    intercept[IllegalArgumentException] { Mp3Frame(15, 0, false, 0) }
    intercept[IllegalArgumentException] { Mp3Frame(9, 3, false, 0) }
    val ok = AudioIndex.mp3Mux(Seq(Mp3Frame(9, 0, padding = false, 0)))
    val v2 = ok.clone(); v2(1) = (v2(1) & 0xef).toByte // version -> MPEG-2
    intercept[IllegalArgumentException] { AudioIndex.mp3Demux(v2) }
    val l1 = ok.clone(); l1(1) = (l1(1) | 0x06).toByte // layer -> I
    intercept[IllegalArgumentException] { AudioIndex.mp3Demux(l1) }
  }
}
