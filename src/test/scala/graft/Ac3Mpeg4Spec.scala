package graft

import graft.sources.{Ac3, Mpeg4P2}
import org.scalatest.funsuite.AnyFunSuite

/** The two codecs that completed the reference's named set (its A/V
  * test pairs mpeg4 + AAC and transcodes aac ↔ ac3): AC-3 syncframe
  * + BSI structure (A/52 §5.4) and the MPEG-4 part 2 start-code /
  * VOL / VOP layer (14496-2 §6.2) — conditioned fields, marker
  * bits, stuffing duals, derived field widths, and the loud subset
  * boundaries, beyond what the p34/m70 oracles hash. */
class Ac3Mpeg4Spec extends AnyFunSuite {

  private def bsi(acmod: Int): Ac3.Bsi = {
    val hasC = (acmod & 1) == 1 && acmod != 1
    val hasS = acmod >= 4
    Ac3.Bsi(3, acmod, if (hasC) 2 else 0, if (hasS) 1 else 0,
      if (acmod == 2) 2 else 0, lfeon = true, 24,
      Some(200), None, Some((17, 2)),
      if (acmod == 0) 9 else 0, copyrightb = true, origbs = false,
      Some(12345), None, Array[Byte](7, 8, 9))
  }

  test("AC-3 [A/52 §5.4]: every acmod layout round-trips its " +
      "conditioned BSI fields, the frame is self-delimiting through " +
      "the size-table seam, crc1 is verified, and malformed " +
      "conditions are loud") {
    val frames = (0 until 8).map(a => Ac3.Ac3Frame(a % 3, 10 + a,
      bsi(a), Array.tabulate(20 + a)(k => ((a * 7 + k) % 251).toByte)))
    val bytes = Ac3.mux(frames)
    val rec = Ac3.demux(bytes)
    assert(rec.size == 8)
    rec.map(_._2).zip(frames).foreach { case (got, want) =>
      assert(got.fscod == want.fscod &&
        got.frmsizecod == want.frmsizecod)
      val (g, w) = (got.bsi, want.bsi)
      assert(g.acmod == w.acmod && g.cmixlev == w.cmixlev &&
        g.surmixlev == w.surmixlev && g.dsurmod == w.dsurmod &&
        g.lfeon == w.lfeon && g.dialnorm == w.dialnorm &&
        g.compr == w.compr && g.audprod == w.audprod &&
        g.dialnorm2 == w.dialnorm2 && g.timecod1 == w.timecod1 &&
        g.addbsi.toSeq == w.addbsi.toSeq)
      // the demuxed payload region is the input payload + stuffing
      assert(got.payload.take(want.payload.length).toSeq ==
        want.payload.toSeq)
      assert(got.payload.drop(want.payload.length).forall(_ == 0))
    }
    // offsets self-delimit through the size table
    assert(rec.map(_._1) == frames.map(_.frameLen.toLong)
      .scanLeft(0L)(_ + _).init)
    // crc1 catches corruption in the covered 5/8 region
    val bad = bytes.clone()
    bad(8) = (bad(8) ^ 0x40).toByte
    intercept[IllegalArgumentException](Ac3.demux(bad))
    // conditioned-field misuse is loud at construction
    intercept[IllegalArgumentException] {
      Ac3.Bsi(0, 2, 1, 0, 0, lfeon = false, 0, None, None, None, 0,
        copyrightb = false, origbs = false, None, None, Array.empty)
    } // cmixlev without a centre channel
    intercept[IllegalArgumentException] {
      Ac3.Bsi(0, 1, 0, 0, 0, lfeon = false, 0, None, None, None, 5,
        copyrightb = false, origbs = false, None, None, Array.empty)
    } // dialnorm2 outside dual-mono
    assert(Ac3.acmodChannels(7) == 5 && Ac3.acmodChannels(0) == 2)
  }

  test("MPEG-4 p2 [14496-2 §6.2]: the VOS→VO→VOL→VOP walk " +
      "round-trips extended aspect / control / fixed-rate branches, " +
      "the time-increment width derives from the resolution, " +
      "stuffing and markers are verified, and subset walls are loud") {
    val vol = Mpeg4P2.Vol(3, 5, 0x22, randomAccessible = true, 1,
      15, Some((4, 3)), Some((1, true)), 30, Some(25), 320, 240,
      quantType = true)
    assert(vol.incBits == 5) // ceil(log2(30))
    val vops = Seq(
      Mpeg4P2.Vop(0, 0, 7, 3, 12, 0, Array[Byte](40, 41, 42)),
      Mpeg4P2.Vop(1, 2, 29, 0, 31, 7, Array[Byte](50, 51)),
      Mpeg4P2.Vop(1, 1, 0, 7, 1, 1, Array.tabulate(9)(k =>
        (60 + k).toByte)))
    val bytes = Mpeg4P2.mux(vol, vops)
    val (gotVol, gotVops) = Mpeg4P2.demux(bytes)
    assert(gotVol == vol)
    assert(gotVops.size == 3)
    gotVops.map(_._2).zip(vops).foreach { case (g, w) =>
      assert(g.codingType == w.codingType && g.moduloBase == w.moduloBase
        && g.timeIncrement == w.timeIncrement && g.quant == w.quant &&
        g.fcodeForward == w.fcodeForward &&
        g.payload.toSeq == w.payload.toSeq)
    }
    // minimal VOL (no optional branches), 1-bit increment width
    val lean = Mpeg4P2.Vol(1, 0, 0x20, randomAccessible = false, 1,
      1, None, None, 2, None, 16, 16, quantType = false)
    assert(lean.incBits == 1)
    val (gotLean, lv) = Mpeg4P2.demux(Mpeg4P2.mux(lean,
      Seq(Mpeg4P2.Vop(0, 0, 1, 0, 5, 0, Array[Byte](99)))))
    assert(gotLean == lean && lv.head._2.timeIncrement == 1)
    // loud walls
    intercept[IllegalArgumentException] {
      Mpeg4P2.Vop(2, 0, 0, 0, 5, 1, Array.empty) // B VOP
    }
    intercept[IllegalArgumentException] {
      Mpeg4P2.Vop(1, 0, 0, 0, 5, 0, Array.empty) // P without fcode
    }
    intercept[IllegalArgumentException] { // payload start-code emulation
      Mpeg4P2.mux(lean, Seq(Mpeg4P2.Vop(0, 0, 1, 0, 5, 0,
        Array[Byte](0, 0, 1))))
    }
    intercept[IllegalArgumentException] { // time inc beyond resolution
      Mpeg4P2.mux(lean, Seq(Mpeg4P2.Vop(0, 0, 2, 0, 5, 0,
        Array[Byte](99))))
    }
    // a corrupted start-code prefix is loud (bytes 14..17 are the
    // VOL start code in the fixed-size prefix)
    val bad = bytes.clone()
    bad(16) = 5
    intercept[IllegalArgumentException](Mpeg4P2.demux(bad))
    // and a cleared marker bit desyncs loudly: the marker before
    // vop_time_increment_resolution sits right after shape(2) —
    // find it by brute force: SOME single-bit flip in the VOL header
    // region must trip a named require
    val anyLoud = (18 until 28).exists { byteIdx =>
      (0 until 8).exists { bit =>
        val b2 = bytes.clone()
        b2(byteIdx) = (b2(byteIdx) ^ (1 << bit)).toByte
        try { Mpeg4P2.demux(b2); false }
        catch { case _: IllegalArgumentException => true }
      }
    }
    assert(anyLoud, "VOL header flips must be able to trip a require")
  }
}
