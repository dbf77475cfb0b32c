package graft

import graft.sources.Ivf
import org.scalatest.funsuite.AnyFunSuite

/** IVF container + RFC 6386 §9.1 VP8 frame-tag conformance. */
class IvfSpec extends AnyFunSuite {

  test("IVF round trip: DKIF header fields, per-frame pts and " +
      "payloads, offsets from the 12-byte frame headers") {
    val frames = (0 until 9).map { t =>
      Ivf.IvfFrame(100L + t, Array.tabulate(5 + t * 3)(j => (t * 7 + j).toByte))
    }
    val hdr = Ivf.IvfHeader("VP80", 640, 360, 30000, 1001, 9L)
    val bytes = Ivf.mux(hdr, frames)
    val (gotH, got) = Ivf.demux(bytes)
    assert(gotH == hdr)
    var off = 32L
    got.zip(frames).foreach { case ((o, g), w) =>
      assert(o == off)
      assert(g.pts == w.pts && g.payload.toSeq == w.payload.toSeq)
      off += 12 + w.payload.length
    }
    assert(off == bytes.length)
    // 64-bit pts survives
    val big = Ivf.IvfFrame(0x1_0000_0001L, Array[Byte](1))
    val (_, got2) = Ivf.demux(Ivf.mux(hdr.copy(frameCount = 1), Seq(big)))
    assert(got2.head._2.pts == 0x1_0000_0001L)
    // header/frame-count disagreement and out-of-u32 timebases are
    // rejected at mux instead of writing silently wrong headers
    intercept[IllegalArgumentException] {
      Ivf.mux(hdr.copy(frameCount = 5), Seq(big))
    }
    intercept[IllegalArgumentException] {
      Ivf.mux(hdr.copy(frameCount = 1, timebaseDen = 0x100000000L), Seq(big))
    }
  }

  test("VP8 frame tag: keyframe start code 9D 01 2A, 14-bit dims with " +
      "upscale bits, version/show/partition fields, interframes carry " +
      "no dimensions") {
    val key = Ivf.parseVp8Tag(Ivf.vp8Frame(keyframe = true, version = 2,
      showFrame = true, width = 1920, height = 1080, new Array[Byte](33)))
    assert(key.keyframe && key.version == 2 && key.showFrame)
    assert(key.width == 1920 && key.height == 1080)
    assert(key.widthScale == 0 && key.heightScale == 0)
    assert(key.firstPartSize == 33, "RFC 6386: the size field counts only " +
      "the first COMPRESSED partition — the 7-byte key header is the " +
      "uncompressed data chunk and stays outside it")
    val inter = Ivf.parseVp8Tag(Ivf.vp8Frame(keyframe = false, version = 0,
      showFrame = false, width = 1920, height = 1080, new Array[Byte](12)))
    assert(!inter.keyframe && !inter.showFrame && inter.firstPartSize == 12)
    assert(inter.width == 0 && inter.height == 0)
  }

  test("guards: bad magic, corrupt keyframe start code, frame-count " +
      "mismatch, overrunning frame all fail loud") {
    val frames = Seq(Ivf.IvfFrame(0L, Ivf.vp8Frame(keyframe = true,
      version = 0, showFrame = true, width = 320, height = 180,
      new Array[Byte](10))))
    val hdr = Ivf.IvfHeader("VP80", 320, 180, 30, 1, 1L)
    val ok = Ivf.mux(hdr, frames)
    val magic = ok.clone(); magic(0) = 'X'
    intercept[IllegalArgumentException] { Ivf.demux(magic) }
    val sc = ok.clone(); sc(32 + 12 + 3) = 0x77 // keyframe start code
    val (_, rec) = Ivf.demux(sc)
    intercept[IllegalArgumentException] { Ivf.parseVp8Tag(rec.head._2.payload) }
    val fc = ok.clone(); fc(24) = 5 // declared frame count
    intercept[IllegalArgumentException] { Ivf.demux(fc) }
    intercept[IllegalArgumentException] { Ivf.demux(ok.dropRight(2)) }
  }
}
