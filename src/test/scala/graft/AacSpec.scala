package graft

import graft.sources.{Aac, AudioIndex}
import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC structural codec (ISO/IEC 13818-7 §6.3): raw_data_block
  * element loop, ics_info with the short-window grouping bits,
  * section run-lengths with the escape repetition, DPCM scalefactor
  * accumulation, TNS syntax, Table 7.1 codebook structure with the
  * cb 11 escape, CPE common_window + ms_used, the §9.2 requant
  * arithmetic, and the ADTS integration. */
class AacSpec extends AnyFunSuite {

  private def mags(cb: Int): Array[Int] =
    if (cb >= 11) Array(0, 1, 8, 27)
    else if (cb >= 9) Array(0, 1, 8)
    else Array(0, 1)

  /** Deterministic SCE; long (ws 0/1/3, TNS on even i) or short
    * (ws 2, grouping). */
  private def sce(i: Int): Aac.AacIcs = {
    val ws = Array(0, 2, 1, 3)(i % 4)
    val short = ws == 2
    val maxSfb = if (short) 4 else 6 + i % 3
    val grouping = if (short) (i * 37) % 128 else 0
    val info = Aac.IcsInfo(ws, i % 2, maxSfb, grouping)
    val cycleL = Array(1, 3, 5, 7, 9, 11, 6, 0)
    val cycleS = Array(3, 9, 11, 5)
    def cb(w: Int): Int =
      if (short) cycleS((i + w) % 4) else cycleL((i + w) % 8)
    val groups = info.groupLens
    val sections = groups.indices.toVector.map(_ =>
      (0 until maxSfb).toVector.map(w => Aac.Section(cb(w), w, w + 1)))
    def dpcmOf(w: Int): Int =
      if (short) (if (w % 2 == 0) 4 else -4)
      else 4 * (((i + w) % 3) - 1)
    val dpcm = groups.indices.toVector.map(_ =>
      (0 until maxSfb).toVector.filter(cb(_) != 0).map(dpcmOf))
    // per-sfb running counters across groups keep the value multiset
    // independent of the grouping draw
    val counters = scala.collection.mutable.Map[Int, Int]()
    val spectral = groups.indices.toVector.map { gi =>
      (0 until maxSfb).toVector.map { w =>
        if (cb(w) == 0) Vector.empty[Int]
        else Vector.fill(info.sfbWidth(w, groups(gi))) {
          val t = counters.getOrElse(w, 0); counters(w) = t + 1
          val a = mags(cb(w))
          var m = a((i * 5 + w * 11 + t * 7) % a.length)
          if (Aac.cbSigned(cb(w))) m = math.min(m, Aac.cbLav(cb(w)))
          if (m != 0 && (t + i) % 2 == 1) -m else m
        }
      }
    }
    val tns = if (!short && i % 2 == 0) Some(Vector(
      Aac.TnsFilter((i / 2) % 2, (i * 7) % 20, i % 4, i % 2, 0,
        Vector.tabulate(i % 4)(j => (i + j * 3) % (1 << ((i / 2) % 2 + 3))))))
    else None
    Aac.AacIcs(132 + 4 * (i % 5), info, sections, dpcm, tns, spectral)
  }

  test("SCE round-trip [§6.3]: ics_info (all four window sequences, " +
      "grouping bits), single-sfb sections, DPCM scalefactors from " +
      "global_gain, TNS filters, and the Table 7.1 tuple structure " +
      "with sign bits and the cb 11 escape") {
    (0 until 8).foreach { i =>
      val ics = sce(i)
      val (tag, got) = Aac.demuxSce(Aac.muxSce(ics, tag = i % 16))
      assert(tag == i % 16)
      assert(got.globalGain == ics.globalGain, s"i=$i gg")
      assert(got.info == ics.info, s"i=$i info")
      assert(got.sections == ics.sections, s"i=$i sections")
      assert(got.dpcm == ics.dpcm, s"i=$i dpcm")
      assert(got.tns == ics.tns, s"i=$i tns")
      assert(got.spectral == ics.spectral, s"i=$i spectral")
    }
  }

  test("grouping [§6.3.2]: scale_factor_grouping bits fuse windows — " +
      "group lengths sum to 8 and match the bit pattern") {
    val info = Aac.IcsInfo(2, 0, 4, Integer.parseInt("1100101", 2))
    // windows: 0 | 1,2 fused into 0 via bits 6,5? bit k fuses window
    // k+1: bits MSB-first 1,1,0,0,1,0,1 → groups {0,1,2},{3},{4,5},{6},{7}?
    // bit0(MSB)=1 fuses w1; bit1=1 fuses w2; bit2=0 new at w3;
    // bit3=0 new at w4; bit4=1 fuses w5; bit5=0 new at w6; bit6=1 fuses w7
    assert(info.groupLens == Vector(3, 1, 2, 2))
    assert(info.groupLens.sum == 8)
    assert(Aac.IcsInfo(2, 0, 4, 0).groupLens == Vector.fill(8)(1))
    assert(Aac.IcsInfo(2, 0, 4, 127).groupLens == Vector(8))
    assert(Aac.IcsInfo(0, 0, 6, 0).groupLens == Vector(1))
  }

  test("section escape [§6.3.2]: a run of max_sfb ZERO sfbs longer " +
      "than the 5-bit escape repeats the all-ones increment") {
    val maxSfb = 12 // stand-in table bound
    val info = Aac.IcsInfo(0, 0, maxSfb, 0)
    val ics = Aac.AacIcs(132, info,
      Vector(Vector(Aac.Section(0, 0, maxSfb))),
      Vector(Vector.empty), None,
      Vector(Vector.fill(maxSfb)(Vector.empty[Int])))
    val (_, got) = Aac.demuxSce(Aac.muxSce(ics))
    assert(got.sections == ics.sections)
    // 12 < 31: no escape yet — force one via the short form (esc 7)
    val infoS = Aac.IcsInfo(2, 0, 7, 127) // one group of 8 windows
    val icsS = Aac.AacIcs(132, infoS,
      Vector(Vector(Aac.Section(0, 0, 7))),
      Vector(Vector.empty), None,
      Vector(Vector.fill(7)(Vector.empty[Int])))
    val (_, gotS) = Aac.demuxSce(Aac.muxSce(icsS))
    assert(gotS.sections == icsS.sections,
      "7 = the 3-bit escape: written as 7+0, read back as one section")
  }

  test("cb 11 escape [§9.3]: magnitudes ≥ 16 ride N ones + 0 + an " +
      "(N+4)-bit word; values round-trip across the escape boundary") {
    import graft.sources.Flac.{BitReader, BitWriter}
    Seq(Seq(16, -27), Seq(255, 0), Seq(-4095, 16)).foreach { vs =>
      val w = new BitWriter
      Aac.CbSeam.writeTuple(w, 11, vs)
      val b = w.toBytes
      val got = Aac.CbSeam.readTuple(new BitReader(b, 0, b.length), 11)
      assert(got == vs.toVector, s"cb11 $vs")
    }
    intercept[IllegalArgumentException] {
      val w = new BitWriter
      Aac.CbSeam.writeTuple(w, 11, Seq(1 << 13, 0)) // beyond §9.3
    }
    intercept[IllegalArgumentException] {
      val w = new BitWriter
      Aac.CbSeam.writeTuple(w, 9, Seq(13, 0)) // beyond LAV 12, no escape
    }
  }

  test("scalefactors accumulate DPCM from global_gain in scan order; " +
      "requant is exact on the cube/4e grid") {
    val ics = sce(0) // long, maxSfb 6, cb cycle starts at 1
    val sfs = ics.scalefactors
    var run = ics.globalGain
    ics.info.groupLens.indices.foreach { gi =>
      var d = 0
      (0 until ics.info.maxSfb).foreach { w =>
        if (ics.cbOf(gi, w) != 0) {
          run += ics.dpcm(gi)(d); d += 1
          assert(sfs(gi)(w).contains(run), s"g$gi sfb$w")
        } else assert(sfs(gi)(w).isEmpty)
      }
    }
    assert(Aac.requantExact(8, 108) == 64) // 2⁴·2²
    assert(Aac.requantExact(-27, 100) == -81)
    intercept[IllegalArgumentException] { Aac.requantExact(7, 100) }
    intercept[IllegalArgumentException] { Aac.requantExact(8, 102) }
  }

  test("CPE [§6.3.1/§11]: common_window shares ics_info, ms_used " +
      "rides per (group, sfb), both channels round-trip, and the " +
      "13818-7 M/S matrix is integer-exact") {
    val l = sce(0); val r = sce(12) // i ≡ 0 (mod 12) → same info
    assert(l.info == r.info)
    val ms = l.info.groupLens.indices.toVector.map(_ =>
      Vector.tabulate(l.info.maxSfb)(w => w % 2 == 0))
    val bytes = Aac.muxCpe(l, r, ms, msMaskPresent = 1, tag = 3)
    val (tag, gl, gr, msp, gms) = Aac.demuxCpe(bytes)
    assert(tag == 3 && msp == 1 && gms == ms)
    assert(gl.spectral == l.spectral && gr.spectral == r.spectral)
    assert(gl.globalGain == l.globalGain && gr.globalGain == r.globalGain)
    // mask 2 (all) and 0 (none) carry no bits
    val (_, _, _, msp2, gms2) =
      Aac.demuxCpe(Aac.muxCpe(l, r, Vector.empty, msMaskPresent = 2))
    assert(msp2 == 2 && gms2.isEmpty)
    assert(Aac.msReconstruct(5, 3) == ((8L, 2L)))
    assert(Aac.msReconstruct(-4, 7) == ((3L, -11L)))
  }

  test("ADTS integration: raw_data_blocks ride adtsMux payloads and " +
      "come back through adtsDemux + demuxSce with offsets") {
    val frames = (0 until 6).map { i =>
      AudioIndex.AdtsFrame(1, 4, 1, crcPresent = i % 3 == 0,
        Aac.muxSce(sce(i)))
    }
    val rec = AudioIndex.adtsDemux(AudioIndex.adtsMux(frames))
    assert(rec.size == 6)
    rec.zipWithIndex.foreach { case ((_, f), i) =>
      val (_, ics) = Aac.demuxSce(f.payload)
      assert(ics.spectral == sce(i).spectral, s"frame $i spectral")
      assert(ics.globalGain == sce(i).globalGain)
    }
  }

  test("intensity stereo [§12.2/§12.3]: codebooks 14/15 in the CPE " +
      "right channel carry dpcm is_position in the scalefactor slot " +
      "and NO spectral data; reconstruction scales the left spectrum " +
      "by 0.5^(is_pos/4) with the phase sign, inverted by ms_used") {
    val info = Aac.IcsInfo(0, 0, 6, 0)
    def mkLeft: Aac.AacIcs = {
      val sections = Vector(Vector.tabulate(6)(w =>
        Aac.Section(Seq(1, 3, 5, 7, 9, 11)(w), w, w + 1)))
      val spectral = Vector(Vector.tabulate(6)(w =>
        Vector.tabulate(info.sfbWidth(w, 1))(k =>
          if (k % 3 == 0) (if ((w + k) % 2 == 0) 1 else -1) else 0)))
      Aac.AacIcs(132, info, sections,
        Vector(Vector.fill(6)(4)), None, spectral)
    }
    // right: even sfbs spectral, odd sfbs intensity (15 then 14)
    val rSections = Vector(Vector.tabulate(6)(w =>
      Aac.Section(if (w % 2 == 0) 3 else (if (w == 1) 15 else 14),
        w, w + 1)))
    val rSpectral = Vector(Vector.tabulate(6)(w =>
      if (w % 2 == 0) Vector.fill(info.sfbWidth(w, 1))(0)
      else Vector.empty[Int]))
    // dpcm scan: w0 sf+4, w1 is+4, w2 sf−4, w3 is−4, w4 sf+4, w5 is+8
    val right = Aac.AacIcs(140, info, rSections,
      Vector(Vector(4, 4, -4, -4, 4, 8)), None, rSpectral)
    val sfs = right.scalefactors
    assert(sfs(0)(0).contains(144) && sfs(0)(2).contains(140) &&
      sfs(0)(4).contains(144), "spectral accumulator from global_gain")
    assert(sfs(0)(1).contains(4) && sfs(0)(3).contains(0) &&
      sfs(0)(5).contains(8), "is_position accumulator from 0")
    // round trip through a CPE
    val bytes = Aac.muxCpe(mkLeft, right, Vector.empty, msMaskPresent = 0)
    val (_, gl, gr, _, _) = Aac.demuxCpe(bytes)
    assert(gl.spectral == mkLeft.spectral)
    assert(gr.sections == rSections && gr.dpcm == right.dpcm)
    assert(gr.spectral(0)(1).isEmpty && gr.spectral(0)(3).isEmpty)
    assert(gr.scalefactors == sfs)
    // exact reconstruction: is_pos 4 halves, −4 doubles, phase signs
    assert(Aac.intensityExact(16, 4, inPhase = true, invert = false) == 8)
    assert(Aac.intensityExact(16, -4, inPhase = true, invert = false) == 32)
    assert(Aac.intensityExact(16, 0, inPhase = false, invert = false) == -16)
    assert(Aac.intensityExact(16, 0, inPhase = false, invert = true) == 16)
    assert(Aac.intensityExact(-24, 4, inPhase = true, invert = false) == -12)
    intercept[IllegalArgumentException] {
      Aac.intensityExact(16, 2, inPhase = true, invert = false)
    }
    intercept[IllegalArgumentException] { // 15 not divisible by 2
      Aac.intensityExact(15, 4, inPhase = true, invert = false)
    }
    // intensity is right-channel only, loud at both ends
    intercept[IllegalArgumentException] { Aac.muxSce(right) }
    intercept[IllegalArgumentException] {
      Aac.muxCpe(right, right, Vector.empty, msMaskPresent = 0)
    }
  }

  test("PNS [14496-3 §4.6.13]: codebook 13 sfbs carry dpcm noise " +
      "energy in the scalefactor slot (accumulating from " +
      "global_gain − 90) and no spectral data; the stand-in noise " +
      "vector is exact on the 4e energy grid") {
    val info = Aac.IcsInfo(0, 0, 6, 0)
    // sfbs: spectral, noise, spectral, noise, noise, spectral
    val cbs = Vector(3, 13, 9, 13, 13, 3)
    val sections = Vector(cbs.zipWithIndex.map { case (cb, w) =>
      Aac.Section(cb, w, w + 1) })
    val spectral = Vector(Vector.tabulate(6)(w =>
      if (cbs(w) == 13) Vector.empty[Int]
      else Vector.fill(info.sfbWidth(w, 1))(0)))
    // dpcm scan: sf+4, nrg+8, sf−4, nrg−4, nrg+4, sf+4
    val ics = Aac.AacIcs(160, info, sections,
      Vector(Vector(4, 8, -4, -4, 4, 4)), None, spectral)
    val sfs = ics.scalefactors
    assert(sfs(0)(0).contains(164) && sfs(0)(2).contains(160) &&
      sfs(0)(5).contains(164), "spectral accumulator")
    assert(sfs(0)(1).contains(160 - 90 + 8), "noise from gg − 90")
    assert(sfs(0)(3).contains(160 - 90 + 4) &&
      sfs(0)(4).contains(160 - 90 + 8), "noise accumulation")
    // PNS is legal in an SCE and round-trips
    val (_, got) = Aac.demuxSce(Aac.muxSce(ics))
    assert(got.sections == sections && got.dpcm == ics.dpcm)
    assert(got.spectral(0)(1).isEmpty && got.scalefactors == sfs)
    // the stand-in noise vector: alternating ±2^e, exact
    assert(Aac.pnsStandIn(4, 108) == Vector(4L, -4L, 4L, -4L))
    assert(Aac.pnsStandIn(3, 100) == Vector(1L, -1L, 1L))
    intercept[IllegalArgumentException] { Aac.pnsStandIn(4, 102) }
    intercept[IllegalArgumentException] { Aac.pnsStandIn(4, 96) }
  }

  test("short-window TNS [§6.3.2]: EIGHT_SHORT frames carry the " +
      "1-bit n_filt / 4-bit length / 3-bit order form per window, " +
      "round-tripping next to grouping and spectral data") {
    val base = sce(1) // ws 2, maxSfb 4, grouping (1·37)%128
    assert(base.info.short)
    val wins = Vector.tabulate(8)(wd =>
      if (wd % 3 == 0) Some(Aac.TnsFilter(wd / 4, (wd * 5) % 16,
        wd % 4, wd % 2, 0,
        Vector.tabulate(wd % 4)(j => (wd + j) % (1 << (wd / 4 + 3)))))
      else None)
    val ics = base.copy(tnsShort = Some(wins))
    val (_, got) = Aac.demuxSce(Aac.muxSce(ics))
    assert(got.tnsShort.contains(wins))
    assert(got.tns.isEmpty && got.spectral == ics.spectral)
    // the field gates: long TNS on a short frame and vice versa
    intercept[IllegalArgumentException] {
      base.copy(tns = Some(Vector(Aac.TnsFilter(0, 1, 0, 0, 0,
        Vector.empty))))
    }
    intercept[IllegalArgumentException] {
      sce(0).copy(tnsShort = Some(Vector.fill(8)(None)))
    }
    intercept[IllegalArgumentException] { // short length is 4 bits
      base.copy(tnsShort = Some(Vector.tabulate(8)(wd =>
        if (wd == 0) Some(Aac.TnsFilter(0, 16, 0, 0, 0, Vector.empty))
        else None)))
    }
  }

  test("element loop [§6.3.1]: a raw_data_block carries a SEQUENCE " +
      "of SCE/CPE elements closed by END — the multi-program shape — " +
      "and unknown element ids are loud") {
    val l = sce(0); val r = sce(12)
    val ms = l.info.groupLens.indices.toVector.map(_ =>
      Vector.tabulate(l.info.maxSfb)(w => w % 2 == 0))
    val els = Seq(
      Aac.SceEl(2, sce(4)),
      Aac.CpeEl(5, l, r, 1, ms),
      Aac.SceEl(9, sce(8)))
    val got = Aac.demuxElements(Aac.muxElements(els))
    assert(got.length == 3)
    (got zip els).foreach {
      case (Aac.SceEl(t1, i1), Aac.SceEl(t2, i2)) =>
        assert(t1 == t2 && i1.spectral == i2.spectral &&
          i1.globalGain == i2.globalGain)
      case (Aac.CpeEl(t1, l1, r1, m1, u1),
            Aac.CpeEl(t2, l2, r2, m2, u2)) =>
        assert(t1 == t2 && m1 == m2 && u1 == u2)
        assert(l1.spectral == l2.spectral && r1.spectral == r2.spectral)
      case other => fail(s"element shape drift: $other")
    }
    // the single-element forms are the same bytes as the loop's
    assert(Aac.muxElements(Seq(Aac.SceEl(3, sce(1)))).toSeq ==
      Aac.muxSce(sce(1), tag = 3).toSeq)
    intercept[IllegalArgumentException] {
      Aac.demuxElements(Array(0x40.toByte, 0, 0)) // id 2 = CCE
    }
    intercept[IllegalArgumentException] {
      Aac.muxElements(Seq.empty)
    }
  }

  test("loud boundaries: predictor bit, pulse data, gain control, " +
      "PNS codebooks, reserved ms_mask, signed values beyond LAV") {
    intercept[IllegalArgumentException] { // cb 13 is PNS
      Aac.Section(12, 0, 1) // 12 is reserved (13/14/15 are in now)
    }
    intercept[IllegalArgumentException] { // signed LAV
      val w = new graft.sources.Flac.BitWriter
      Aac.CbSeam.writeTuple(w, 1, Seq(2, 0, 0, 0))
    }
    intercept[IllegalArgumentException] { // wrong tuple arity
      val w = new graft.sources.Flac.BitWriter
      Aac.CbSeam.writeTuple(w, 1, Seq(1, 0))
    }
    intercept[IllegalArgumentException] { // grouping on a long window
      Aac.IcsInfo(0, 0, 6, 1)
    }
    intercept[IllegalArgumentException] { // max_sfb beyond its field
      Aac.IcsInfo(0, 0, 64, 0)
    }
    intercept[IllegalArgumentException] { // beyond the ACTIVE swb table
      Aac.IcsInfo(0, 0, 13, 0).validate(Aac.Profile.StandIn)
    }
    // a CPE whose channels disagree on ics_info is rejected at mux
    intercept[IllegalArgumentException] {
      Aac.muxCpe(sce(0), sce(1), Vector.empty, msMaskPresent = 0)
    }
  }

  // ---- filterbank (§4.6.11, AacPcm) ----------------------------------------

  test("filterbank: window-sequence support — EIGHT_SHORT columns only " +
      "touch their 256-sample landing zone, LONG_START is zero past " +
      "1600, LONG_STOP before 448, and the lattice is nonzero where " +
      "the shapes say so") {
    import graft.sources.AacPcm
    val short = AacPcm.wm(2)
    (0 until 8).foreach { w =>
      val col = 128 * w + 3
      (0 until 2048).foreach { i =>
        val in = i >= 448 + 128 * w && i < 448 + 128 * w + 256
        if (!in) assert(short(i)(col) == 0,
          s"short window $w leaked to row $i")
      }
      assert((448 + 128 * w until 448 + 128 * w + 256)
        .exists(i => short(i)(col) != 0))
    }
    (1600 until 2048).foreach(i => assert(AacPcm.wm(1)(i)(5) == 0))
    (0 until 448).foreach(i => assert(AacPcm.wm(3)(i)(5) == 0))
    assert(AacPcm.wm(0)(100)(5) != 0)
  }

  test("filterbank: Overlap.frame equals the two-kernel decomposition " +
      "(first half of this frame's lattice + the stored tail), a " +
      "following zero frame rings the tail alone, and the boundary " +
      "requires are loud (grouped shorts, KBD, intensity)") {
    import graft.sources.{Aac, AacPcm}
    val x1 = new Array[Long](1024); x1(3) = 81; x1(40) = -16
    val x2 = new Array[Long](1024); x2(130) = 16; x2(200) = 1
    val ov = new AacPcm.Overlap()
    val out1 = ov.frame(x1, 0)
    val out2 = ov.frame(x2, 1)
    def z(seq: Int, x: Array[Long], i: Int): Long =
      (0 until 1024).map(k => AacPcm.wm(seq)(i)(k).toLong * x(k)).sum
    (0 until 1024 by 97).foreach { i =>
      assert(out1(i) == z(0, x1, i))
      assert(out2(i) == z(0, x1, 1024 + i) + z(1, x2, i),
        s"overlap decomposition at $i")
    }
    val out3 = new AacPcm.Overlap() // fresh: tail only
    out3.load(ov.flat)
    val ring = out3.frame(new Array[Long](1024), 3)
    assert(ring.exists(_ != 0L), "the tail must ring through")
    assert(ring.toSeq == (0 until 1024).map(i => z(1, x2, 1024 + i)))
    // loud boundaries
    val grouped = Aac.AacIcs(108, Aac.IcsInfo(2, 0, 1, 64),
      Vector.fill(7)(Vector(Aac.Section(1, 0, 1))),
      Vector.fill(7)(Vector(0)),
      None,
      Vector.tabulate(7)(gi => Vector(Vector.fill(
        Aac.IcsInfo(2, 0, 1, 64).sfbWidth(0,
          Aac.IcsInfo(2, 0, 1, 64).groupLens(gi)))(0))))
    intercept[IllegalArgumentException](AacPcm.dequantIcs(grouped))
    val kbd = Aac.AacIcs(108, Aac.IcsInfo(0, 1, 1, 0),
      Vector(Vector(Aac.Section(1, 0, 1))), Vector(Vector(0)), None,
      Vector(Vector(Vector.fill(4)(0))))
    intercept[IllegalArgumentException](AacPcm.dequantIcs(kbd))
  }

  test("filterbank: dequantIcs places long lines at swb(b)+l and " +
      "ungrouped short lines at 128·window + swbShort(b)+l on the " +
      "§9.2 exact grid under the running DPCM scalefactors") {
    import graft.sources.{Aac, AacPcm}
    val info = Aac.IcsInfo(0, 0, 2, 0)
    val ics = Aac.AacIcs(104, info,
      Vector(Vector(Aac.Section(11, 0, 2))),
      Vector(Vector(0, 4)), None,
      Vector(Vector(
        Vector.tabulate(info.sfbWidth(0, 1))(l => if (l == 1) 8 else 0),
        Vector.tabulate(info.sfbWidth(1, 1))(l =>
          if (l == 0) -27 else 0))))
    val lines = AacPcm.dequantIcs(ics)
    assert(lines(1) == 16L << 1)      // sf 104 → e 1
    assert(lines(Aac.SwbLong(1)) == -(81L << 2)) // sf 108 → e 2
    assert(lines.count(_ != 0) == 2)
    val infoS = Aac.IcsInfo(2, 0, 2, 0)
    val icsS = Aac.AacIcs(100, infoS,
      Vector.fill(8)(Vector(Aac.Section(11, 0, 2))),
      Vector.tabulate(8)(gi => Vector(if (gi == 3) 4 else 0, 0)),
      None,
      Vector.tabulate(8)(gi => Vector(
        Vector.tabulate(infoS.sfbWidth(0, 1))(l =>
          if (gi == 3 && l == 2) 1 else 0),
        Vector.fill(infoS.sfbWidth(1, 1))(0))))
    val linesS = AacPcm.dequantIcs(icsS)
    // group 3's delta walk: slots 0..6 all 0 except slot 6 (+4) → sf 104
    assert(linesS(128 * 3 + 2) == 2L)
    assert(linesS.count(_ != 0) == 1)
  }
}
