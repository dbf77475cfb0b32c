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

  test("Opus TOC (RFC 6716 sect 3.1): all 32 configs map to the right " +
      "mode/bandwidth/duration, the four frame-count codes parse, and " +
      "the 120 ms packet bound is enforced") {
    // spot-pin the table corners: config 0 = SILK NB 10 ms, 11 = SILK
    // WB 60 ms, 12 = hybrid SWB 10 ms, 15 = hybrid FB 20 ms, 16 =
    // CELT NB 2.5 ms, 31 = CELT FB 20 ms
    def one(config: Int, code: Int, nf: Int) = AudioIndex.opusParse(
      AudioIndex.opusPacket(config, stereo = false, code,
        Seq.fill(nf)(Array[Byte](1, 2, 3))))
    assert(one(0, 0, 1).mode == "silk" && one(0, 0, 1).bandwidth == "nb" &&
      one(0, 0, 1).frameDurUs == 10000)
    assert(one(11, 0, 1).bandwidth == "wb" && one(11, 0, 1).frameDurUs == 60000)
    assert(one(12, 0, 1).mode == "hybrid" && one(12, 0, 1).bandwidth == "swb")
    assert(one(15, 0, 1).bandwidth == "fb" && one(15, 0, 1).frameDurUs == 20000)
    assert(one(16, 0, 1).mode == "celt" && one(16, 0, 1).frameDurUs == 2500)
    assert(one(31, 0, 1).bandwidth == "fb" && one(31, 0, 1).frameDurUs == 20000)
    // frame-count codes: 0 -> 1, 1 -> 2 equal, 2 -> 2 different
    // (sect 3.2.1 length coding), 3 -> count byte
    assert(one(0, 0, 1).frames == 1)
    assert(one(0, 1, 2).frames == 2)
    assert(one(0, 2, 2).frames == 2)
    assert(one(16, 3, 4).frames == 4)
    // 48 kHz granule currency: 20 ms stereo CELT = 960 samples
    assert(one(31, 0, 1).samples48k == 960)
    // 120 ms bound: 3 x 60 ms rejected at build AND at parse
    intercept[IllegalArgumentException] {
      AudioIndex.opusPacket(3, stereo = false, 3,
        Seq.fill(3)(Array[Byte](1)))
    }
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array(((3 << 3) | 3).toByte, 3.toByte))
    }
    // sect 3.2.1 two-byte length coding for frames >= 252 bytes
    val long1 = AudioIndex.opusPacket(0, stereo = true, 2,
      Seq(new Array[Byte](300), new Array[Byte](5)))
    val parsed = AudioIndex.opusParse(long1)
    assert(parsed.stereo && parsed.frames == 2)
  }

  test("Opus malformed packets fail loud per RFC 6716 sect 3.4: " +
      "code 2 without its length byte, odd code-1 payload, CBR code 3 " +
      "with a non-dividing remainder, over-1275 frames") {
    // R4: 1-byte code-2 packet — no length byte, no frames
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array(((0 << 3) | 2).toByte))
    }
    // R4: declared first-frame length overruns the payload
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array(((0 << 3) | 2).toByte, 50.toByte, 1, 2, 3))
    }
    // R3: odd payload cannot split into two equal frames
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array(((0 << 3) | 1).toByte, 1, 2, 3))
    }
    // R6: CBR code 3 remainder must divide by the frame count
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array(((16 << 3) | 3).toByte, 3.toByte, 1, 2, 3, 4))
    }
    // sect 3.2.1: no frame may exceed 1275 bytes — enforced at build
    intercept[IllegalArgumentException] {
      AudioIndex.opusPacket(16, stereo = false, 3,
        Seq.fill(2)(new Array[Byte](2000)))
    }
    // and a valid even code-1 still parses
    assert(AudioIndex.opusParse(
      Array(((0 << 3) | 1).toByte, 1, 2, 3, 4)).frames == 2)
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

  test("Opus code 3 VBR and padded forms parse per RFC 6716 R6/R7; " +
      "overruns fail loud") {
    val toc3 = ((16 << 3) | 3).toByte // config 16: celt 2.5 ms
    // VBR: fc = 0x80|3, two explicit lengths (2, 4), last frame = rest
    val vbr = Array[Byte](toc3, (0x80 | 3).toByte, 2, 4,
      1, 2, /* f0 */ 3, 4, 5, 6, /* f1 */ 7, 8, 9 /* f2: 3 B */ )
    assert(AudioIndex.opusParse(vbr).frames == 3)
    // padded CBR: fc = 0x40|2, padding count 3, 2x2 B frames + 3 pad
    val pad = Array[Byte](toc3, (0x40 | 2).toByte, 3,
      1, 2, 3, 4, 0, 0, 0)
    val pp = AudioIndex.opusParse(pad)
    assert(pp.frames == 2 && pp.padded)
    // VBR whose explicit lengths overrun the payload (R7)
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array[Byte](toc3, (0x80 | 3).toByte, 9, 9, 1, 2))
    }
    // padding count overruns the packet (R6)
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array[Byte](toc3, (0x40 | 2).toByte, 50, 1, 2))
    }
    // truncated 255-continued padding count
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array[Byte](toc3, (0x40 | 1).toByte, 255.toByte))
    }
    // padded CBR remainder must still divide (R6)
    intercept[IllegalArgumentException] {
      AudioIndex.opusParse(Array[Byte](toc3, (0x40 | 2).toByte, 1,
        1, 2, 3, 0))
    }
  }

  test("OpusHead/OpusTags (RFC 7845 sect 5) round-trip every field; " +
      "bad magic, major version and truncation fail loud") {
    for (preSkip <- Seq(0, 312, 3840, 0xffff); gain <- Seq(-1024, 0, 256)) {
      val h = AudioIndex.OpusHead(2, preSkip, 48000L, gain)
      val got = AudioIndex.opusHeadParse(AudioIndex.opusHeadMux(h))
      assert(got == h, s"preSkip $preSkip gain $gain")
    }
    assert(AudioIndex.opusTagsParse(
      AudioIndex.opusTagsMux("graft vendor")) == "graft vendor")
    val ok = AudioIndex.opusHeadMux(AudioIndex.OpusHead(1, 312, 48000L, 0))
    val badMagic = ok.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException] { AudioIndex.opusHeadParse(badMagic) }
    val badVer = ok.clone(); badVer(8) = 0x10 // major version 1
    intercept[IllegalArgumentException] { AudioIndex.opusHeadParse(badVer) }
    intercept[IllegalArgumentException] {
      AudioIndex.opusHeadParse(ok.take(18))
    }
    val tags = AudioIndex.opusTagsMux("v")
    val badTagLen = tags.clone(); badTagLen(8) = 100 // vendor overrun
    intercept[IllegalArgumentException] { AudioIndex.opusTagsParse(badTagLen) }
  }

  test("granule ledger property (p18's arithmetic): for random streams " +
      "with injected gaps and a final trim, the per-packet delta " +
      "decomposition recovers exactly the injected values") {
    val rnd = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      val n = 1 + rnd.nextInt(20)
      val pkts = (0 until n).map { i =>
        AudioIndex.opusPacket(16 + rnd.nextInt(16), rnd.nextBoolean(),
          0, Seq(Array.tabulate(3 + rnd.nextInt(9))(_.toByte)))
      }
      val gaps = (0 until n).map(i =>
        if (i < n - 1 && rnd.nextInt(3) == 0) 120L + rnd.nextInt(5000) else 0L)
      val samples = pkts.map(p => AudioIndex.opusParse(p).samples48k)
      val trim = 1L + rnd.nextInt(samples.last.toInt) // < last packet
      var cum = 0L
      val granules = (0 until n).map { i =>
        cum += samples(i) + gaps(i)
        if (i == n - 1) cum - trim else cum
      }
      var prev = 0L
      (0 until n).foreach { i =>
        val delta = granules(i) - prev - samples(i)
        prev = granules(i)
        if (i < n - 1)
          assert(delta == gaps(i), s"trial $trial packet $i gap")
        else assert(-delta == trim - gaps(i), s"trial $trial trim")
      }
    }
  }
}
