package graft

import graft.sources.Ogg
import graft.sources.Ogg.{OggPacket, OggStream}
import org.scalatest.funsuite.AnyFunSuite

/** RFC 3533 conformance for the Ogg container: page structure, the
  * unreflected CRC-32 variant, lacing, BOS/EOS lifecycle, granule
  * interleave, and loud rejection of corrupt pages. */
class OggSpec extends AnyFunSuite {

  private val streams = Seq(OggStream(101L, "video"), OggStream(202L, "audio"))

  private def pkt(serial: Long, granule: Long, tag: String) =
    OggPacket(serial, granule, tag.getBytes("UTF-8"))

  private val packets = Seq(
    pkt(101L, 0L, "v0"), pkt(202L, 0L, "a0-longer-payload"),
    pkt(202L, 32L, "a1"), pkt(101L, 33L, "v1"),
    pkt(101L, 66L, "v2!"), pkt(202L, 64L, "a2"))

  test("mux -> demux identity: streams in BOS order, packets with " +
      "granules and payloads intact") {
    val bytes = Ogg.mux(streams, packets)
    val (gotS, gotP) = Ogg.demux(bytes)
    assert(gotS == streams)
    val want = packets.zipWithIndex
      .sortBy { case (p, i) => (p.granule, p.serial, i) }.map(_._1)
    assert(gotP.map(_.serial) == want.map(_.serial))
    assert(gotP.map(_.granule) == want.map(_.granule))
    gotP.zip(want).foreach { case (g, w) =>
      assert(g.payload.toSeq == w.payload.toSeq)
    }
  }

  test("page layout: capture pattern on every page, one BOS per " +
      "stream first, EOS on each stream's last page, granule-order " +
      "interleave") {
    val bytes = Ogg.mux(streams, packets)
    // walk raw pages
    var pos = 0
    var pages = Vector.empty[(Int, Long)] // (flags, serial)
    while (pos < bytes.length) {
      assert(new String(bytes.slice(pos, pos + 4), "US-ASCII") == "OggS")
      val flags = bytes(pos + 5) & 0xff
      val serial = (bytes(pos + 14) & 0xffL) |
        ((bytes(pos + 15) & 0xffL) << 8) |
        ((bytes(pos + 16) & 0xffL) << 16) |
        ((bytes(pos + 17) & 0xffL) << 24)
      val nSegs = bytes(pos + 26) & 0xff
      val bodyLen = (0 until nSegs).map(i => bytes(pos + 27 + i) & 0xff).sum
      pages :+= ((flags, serial))
      pos += 27 + nSegs + bodyLen
    }
    assert(pages.take(2).map(_._1) == Vector(Ogg.FlagBos, Ogg.FlagBos))
    assert(pages.count { case (f, _) => (f & Ogg.FlagBos) != 0 } == 2)
    assert(pages.count { case (f, _) => (f & Ogg.FlagEos) != 0 } == 2)
    // last page of each serial carries EOS
    streams.foreach { s =>
      val mine = pages.filter(_._2 == s.serial)
      assert((mine.last._1 & Ogg.FlagEos) != 0, s"serial ${s.serial}")
    }
  }

  test("CRC is the RFC 3533 variant (0x04c11db7, unreflected, init 0) " +
      "and corruption of any byte is detected") {
    // published property: this variant of CRC over '123456789' differs
    // from zlib's 0xCBF43926 (reflection off) — pin the exact value of
    // the pure-polynomial form
    assert(Ogg.crc32("123456789".getBytes("US-ASCII")) == 0x89A1897FL)
    val bytes = Ogg.mux(streams, packets)
    val bad = bytes.clone()
    bad(bytes.length / 2) = (bad(bytes.length / 2) ^ 0x40).toByte
    val ex = intercept[IllegalArgumentException] { Ogg.demux(bad) }
    assert(ex.getMessage.contains("CRC") || ex.getMessage.contains("ogg"))
  }

  test("packets spanning the 255-byte lacing boundary round trip " +
      "(exact multiples get the 0 terminator)") {
    val sizes = Seq(0, 1, 254, 255, 256, 510, 4000)
    val ps = sizes.zipWithIndex.map { case (n, i) =>
      OggPacket(101L, i.toLong, Array.tabulate(n)(j => (i * 31 + j).toByte))
    }
    val (_, got) = Ogg.demux(Ogg.mux(streams.take(1), ps))
    assert(got.map(_.payload.length) == sizes)
    got.zip(ps).foreach { case (g, w) =>
      assert(g.payload.toSeq == w.payload.toSeq)
    }
  }

  test("a stream with ZERO data packets closes with an EMPTY page " +
      "(nSegs = 0), not a phantom zero-length packet") {
    val onlyAudio = Seq(pkt(202L, 0L, "a0"))
    val (gotS, gotP) = Ogg.demux(Ogg.mux(streams, onlyAudio))
    assert(gotS == streams)
    assert(gotP.size == 1 && gotP.head.serial == 202L,
      s"video stream fabricated a packet: ${gotP.map(_.serial)}")
    // a genuine zero-length packet is still representable and distinct
    val withEmpty = Seq(pkt(101L, 0L, ""), pkt(202L, 0L, "a0"))
    val (_, gotP2) = Ogg.demux(Ogg.mux(streams, withEmpty))
    assert(gotP2.size == 2 && gotP2.exists(p =>
      p.serial == 101L && p.payload.isEmpty))
  }

  test("out-of-u32 serials are rejected at mux instead of silently " +
      "truncating on the wire") {
    val ex = intercept[IllegalArgumentException] {
      Ogg.mux(Seq(OggStream(0x100000005L, "a")), Seq.empty)
    }
    assert(ex.getMessage.contains("u32"))
  }

  test("FOREIGN spanning packets reassemble across pages: a hand-built " +
      "continuation page (flag 0x01, lacing 255 continuing into the " +
      "next page) yields one packet with the page-of-completion " +
      "granule, and a mismatched continuation flag fails loud") {
    // hand-build: BOS, then a 300-byte packet split 255 + 45 across
    // two pages (our mux never spans, so this is the demux-only path
    // real files exercise)
    def page(flags: Int, granule: Long, seq: Long, lacing: Seq[Int],
        body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write('O'); out.write('g'); out.write('g'); out.write('S')
      out.write(0); out.write(flags)
      (0 until 8).foreach(i => out.write(((granule >> (8 * i)) & 0xff).toInt))
      Seq(7L, seq, 0L).foreach(v =>
        (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt)))
      out.write(lacing.size); lacing.foreach(out.write)
      out.write(body, 0, body.length)
      val bytes = out.toByteArray
      val crc = Ogg.crc32(bytes)
      bytes(22) = (crc & 0xff).toByte
      bytes(23) = ((crc >> 8) & 0xff).toByte
      bytes(24) = ((crc >> 16) & 0xff).toByte
      bytes(25) = ((crc >> 24) & 0xff).toByte
      bytes
    }
    val id = "graftid:audio".getBytes("UTF-8")
    val payload = Array.tabulate(300)(i => (i * 3).toByte)
    val file =
      page(Ogg.FlagBos, 0L, 0L, Seq(id.length), id) ++
      page(0, -1L, 1L, Seq(255), payload.take(255)) ++
      page(Ogg.FlagContinuation | Ogg.FlagEos, 777L, 2L, Seq(45),
        payload.drop(255))
    val (ss, ps) = Ogg.demux(file)
    assert(ss == Seq(OggStream(7L, "audio")))
    assert(ps.size == 1 && ps.head.granule == 777L,
      "spanning packet must carry the completion page's granule")
    assert(ps.head.payload.toSeq == payload.toSeq)
    // continuation flag without carried state fails loud
    val orphan =
      page(Ogg.FlagBos, 0L, 0L, Seq(id.length), id) ++
      page(Ogg.FlagContinuation | Ogg.FlagEos, 1L, 1L, Seq(4),
        Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException] { Ogg.demux(orphan) }
  }

  test("property: random multi-stream muxes round trip — packet sizes " +
      "across every lacing regime, duplicate granules, streams with " +
      "and without data") {
    import org.scalacheck.Gen
    var seed = org.scalacheck.rng.Seed(1911L)
    def next[A](g: Gen[A]): A = {
      val v = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
    (0 until 40).foreach { trial =>
      val nStreams = next(Gen.choose(1, 4))
      val streams = (0 until nStreams).map(i =>
        OggStream(100L * (i + 1), s"k$i"))
      val nPkts = next(Gen.choose(0, 12))
      val packets = (0 until nPkts).map { j =>
        val serial = streams(next(Gen.choose(0, nStreams - 1))).serial
        val len = next(Gen.oneOf(Gen.choose(0, 8), Gen.choose(250, 260),
          Gen.choose(500, 520), Gen.const(255), Gen.const(510)))
        OggPacket(serial, next(Gen.choose(0L, 3L)) * 32L,
          Array.tabulate(len)(x => ((j * 31 + x) & 0xff).toByte))
      }
      val (gotS, gotP) = Ogg.demux(Ogg.mux(streams, packets))
      assert(gotS == streams, s"trial $trial streams")
      val want = packets.zipWithIndex
        .sortBy { case (p, i) => (p.granule, p.serial, i) }.map(_._1)
      assert(gotP.size == want.size, s"trial $trial count")
      gotP.zip(want).foreach { case (g, w) =>
        assert(g.serial == w.serial && g.granule == w.granule &&
          g.payload.toSeq == w.payload.toSeq, s"trial $trial payload")
      }
    }
  }

  test("lifecycle violations fail loud: missing EOS, page sequence " +
      "gap, second BOS") {
    val bytes = Ogg.mux(streams, packets)
    // truncate the final page (drops an EOS)
    var pos = 0
    var starts = Vector.empty[Int]
    while (pos < bytes.length) {
      starts :+= pos
      val nSegs = bytes(pos + 26) & 0xff
      val bodyLen = (0 until nSegs).map(i => bytes(pos + 27 + i) & 0xff).sum
      pos += 27 + nSegs + bodyLen
    }
    intercept[IllegalArgumentException] {
      Ogg.demux(bytes.take(starts.last))
    }
    // drop a middle data page: sequence gap on its serial
    val cut = bytes.take(starts(3)) ++ bytes.drop(starts(4))
    intercept[IllegalArgumentException] { Ogg.demux(cut) }
    // duplicate the first BOS page: second BOS for the serial
    val dup = bytes.take(starts(1)) ++ bytes.take(starts(1)) ++
      bytes.drop(starts(1))
    intercept[IllegalArgumentException] { Ogg.demux(dup) }
  }
}
