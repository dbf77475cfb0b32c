package graft

import graft.sources.{Ebml, Mkv}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** EBML primitives and the Matroska mux/demux subset: vint round
  * trips at every width boundary, element tree walking with
  * unknown-element tolerance, cluster segmentation (count cap and
  * int16 relative-timestamp overflow), and full mux→demux identity —
  * the second container family mirroring the reference's round-trip
  * matrix (test_containers.py:20-29). */
class MkvSpec extends AnyFunSuite {

  test("vint round trip across width boundaries") {
    val cases = Seq(0L, 1L, 126L, 127L, 128L, 16382L, 16383L, 16384L,
      (1L << 21) - 2, (1L << 21) - 1, 1L << 21, (1L << 28) - 2, 1L << 28,
      123456789L)
    cases.foreach { v =>
      val out = new ByteArrayOutputStream()
      Ebml.writeVint(out, v)
      val b = out.toByteArray
      assert(b.length == Ebml.vintSize(v))
      val (got, n) = Ebml.readVint(b, 0)
      assert(got == v && n == b.length, s"v=$v")
    }
    // the all-ones value of each width must widen (reserved pattern)
    assert(Ebml.vintSize(127) == 2 && Ebml.vintSize(126) == 1)
    assert(Ebml.vintSize(16383) == 3 && Ebml.vintSize(16382) == 2)
  }

  test("uint payloads are minimal big-endian and round trip") {
    Seq(0L, 1L, 255L, 256L, 65535L, 65536L, 1000000L,
      0x123456789abL).foreach { v =>
      val b = Ebml.uintBytes(v)
      assert(Ebml.readUint(b) == v, s"v=$v")
      if (v > 0) assert(b(0) != 0, s"non-minimal encoding for $v")
    }
    assert(Ebml.uintBytes(0L).length == 1)
  }

  test("float payloads: 8-byte write, 4- and 8-byte reads") {
    val d = 16000.0
    assert(Ebml.readFloat(Ebml.floatBytes(d)) == d)
    val f4 = java.lang.Float.floatToIntBits(16000.0f)
    val b4 = (0 until 4).map(i => ((f4 >> (8 * (3 - i))) & 0xff).toByte).toArray
    assert(Ebml.readFloat(b4) == 16000.0)
    intercept[IllegalArgumentException](Ebml.readFloat(new Array[Byte](3)))
  }

  private def tracks = Seq(
    Mkv.MkvTrack(1, "video", "V_GRAFT", width = 64, height = 48),
    Mkv.MkvTrack(2, "audio", "A_PCM/INT/LIT", sampleRate = 16000.0,
      channels = 1))

  private def mkBlocks(n: Int, seed: Long): Seq[Mkv.MkvBlock] = {
    val r = new scala.util.Random(seed)
    var ts = 0L
    (0 until n).map { _ =>
      ts += r.nextInt(40)
      Mkv.MkvBlock(1 + r.nextInt(2), ts, r.nextInt(3) == 0,
        Array.fill[Byte](1 + r.nextInt(64))((r.nextInt(256) - 128).toByte))
    }
  }

  test("mkv mux→demux identity: tracks, block order, timestamps, " +
      "keyframes, payloads") {
    for (n <- Seq(0, 1, 7, 8, 9, 100)) {
      val blocks = mkBlocks(n, 1000 + n)
      val (bt, bb) = Mkv.demux(Mkv.mux(tracks, blocks))
      assert(bt == tracks, s"n=$n tracks")
      assert(bb.size == n)
      bb.zip(blocks).zipWithIndex.foreach { case ((got, want), i) =>
        assert(got.track == want.track && got.tsMs == want.tsMs &&
          got.keyframe == want.keyframe, s"n=$n block $i")
        assert(got.payload.sameElements(want.payload), s"n=$n payload $i")
      }
    }
  }

  test("cluster segmentation: closes at clusterMax blocks and on " +
      "int16 relative-timestamp overflow") {
    // 20 blocks 1 ms apart → clusters of 8/8/4
    val even = (0 until 20).map(i =>
      Mkv.MkvBlock(1, i.toLong, true, Array[Byte](i.toByte)))
    val b1 = Mkv.mux(tracks, even)
    val seg1 = Ebml.children(b1, 0, b1.length).find(_.id == Mkv.IdSegment).get
    val clusters1 = Ebml.children(seg1.data, 0, seg1.data.length)
      .filter(_.id == Mkv.IdCluster)
    assert(clusters1.size == 3)
    // a >32767 ms jump inside what would be one cluster forces a split
    val jump = Seq(
      Mkv.MkvBlock(1, 0L, true, Array[Byte](1)),
      Mkv.MkvBlock(1, 40000L, true, Array[Byte](2)),
      Mkv.MkvBlock(1, 40010L, true, Array[Byte](3)))
    val b2 = Mkv.mux(tracks, jump)
    val seg2 = Ebml.children(b2, 0, b2.length).find(_.id == Mkv.IdSegment).get
    val clusters2 = Ebml.children(seg2.data, 0, seg2.data.length)
      .filter(_.id == Mkv.IdCluster)
    assert(clusters2.size == 2)
    val (_, bb) = Mkv.demux(b2)
    assert(bb.map(_.tsMs) == Seq(0L, 40000L, 40010L)) // abs ts survive
  }

  test("demux skips unknown elements (EBML forward compatibility) " +
      "and accepts webm doctype") {
    val blocks = mkBlocks(5, 7L)
    val full = Mkv.mux(tracks, blocks)
    // rebuild with an unknown element injected at segment level and a
    // webm doctype
    val top = Ebml.children(full, 0, full.length)
    val out = new ByteArrayOutputStream()
    val ebmlHdr = new ByteArrayOutputStream()
    Ebml.writeElem(ebmlHdr, Mkv.IdDocType, "webm".getBytes("US-ASCII"))
    Ebml.writeElem(out, Mkv.IdEbml, ebmlHdr.toByteArray)
    val seg = top.find(_.id == Mkv.IdSegment).get
    val segOut = new ByteArrayOutputStream()
    Ebml.writeElem(segOut, 0xEC, Array.fill[Byte](11)(0)) // Void element
    segOut.write(seg.data)
    Ebml.writeElem(out, Mkv.IdSegment, segOut.toByteArray)
    val (bt, bb) = Mkv.demux(out.toByteArray)
    assert(bt == tracks && bb.size == 5)
  }

  test("demux rejects wrong doctype and truncated input") {
    val bad = new ByteArrayOutputStream()
    val hdr = new ByteArrayOutputStream()
    Ebml.writeElem(hdr, Mkv.IdDocType, "ogg".getBytes("US-ASCII"))
    Ebml.writeElem(bad, Mkv.IdEbml, hdr.toByteArray)
    Ebml.writeElem(bad, Mkv.IdSegment, Array[Byte]())
    intercept[IllegalArgumentException](Mkv.demux(bad.toByteArray))
    val ok = Mkv.mux(tracks, mkBlocks(3, 9L))
    intercept[IllegalArgumentException](Mkv.demux(ok.take(ok.length - 3)))
  }

  test("guards from the foreign-file review: an out-of-order block " +
      "below the int16 lower bound starts its own cluster and " +
      "round-trips exactly; lacing, unknown-size vints and " +
      "clusterMax <= 0 fail loud") {
    // rel = -100000 would truncate into two bytes and come back
    // positive; the lower-bound split keeps the timestamp exact
    val wild = Seq(
      Mkv.MkvBlock(1, 100000L, keyframe = true, Array[Byte](1)),
      Mkv.MkvBlock(1, 0L, keyframe = true, Array[Byte](2)))
    val (_, got) = Mkv.demux(Mkv.mux(tracks, wild))
    assert(got.map(_.tsMs) == Seq(100000L, 0L))
    intercept[IllegalArgumentException] {
      Mkv.mux(tracks, mkBlocks(3, 7L), clusterMax = 0)
    }
    // laced SimpleBlock: set a lacing bit in the flags byte
    val ok = Mkv.mux(tracks, Seq(
      Mkv.MkvBlock(1, 0L, keyframe = true, Array[Byte](1, 2, 3))))
    // flags byte = 3 bytes before the payload start; find the payload
    val pi = {
      var i = -1
      var j = 0
      while (j <= ok.length - 3 && i < 0) {
        if (ok(j) == 1 && ok(j + 1) == 2 && ok(j + 2) == 3) i = j
        j += 1
      }
      i
    }
    assert(pi > 0)
    val laced = ok.clone(); laced(pi - 1) = (laced(pi - 1) | 0x02).toByte
    val e = intercept[IllegalArgumentException] { Mkv.demux(laced) }
    assert(e.getMessage.contains("laced"))
    // unknown-size vint: an all-ones 1-byte size (0xFF)
    intercept[IllegalArgumentException] {
      graft.sources.Ebml.readVint(Array[Byte](0xff.toByte), 0)
    }
  }
}
