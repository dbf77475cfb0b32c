package graft

import graft.sources.Mp2
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Layer II subband codec properties: the bitstream layer is a
  * bijection (mux ∘ demux = id over random allocations, scfsi
  * patterns, scalefactors and codes — including every grouped
  * quantizer), the bit budget matches the §2.4.2.4 accounting the p17
  * oracle replays, corruption fails loudly, and the synthesis
  * matrixing is the exact integer cosine bank (impulse responses and
  * linearity against independently computed values). */
class Mp2Spec extends AnyFunSuite {

  private def check[A](gen: Gen[A], trials: Int)(p: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(11172L)
    (0 until trials).foreach { _ =>
      p(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val subGen: Gen[Mp2.Mp2Sub] = for {
    q <- Gen.frequency((1, Gen.const(0)), (4, Gen.choose(1, 12)))
    scfsi <- Gen.choose(0, 3)
    sf <- Gen.listOfN(3, Gen.choose(0, 62))
    codes <- Gen.listOfN(36, Gen.choose(0, Int.MaxValue))
  } yield {
    if (q == 0) Mp2.Mp2Sub(0, 0, Array.empty, Array.empty)
    else Mp2.Mp2Sub(q, scfsi, sf.take(Mp2.nsfStored(scfsi)).toArray,
      codes.map(_ % Mp2.Levels(q)).toArray)
  }

  private val frameGen: Gen[Mp2.Mp2FrameData] = for {
    bi <- Gen.choose(10, 14)
    ri <- Gen.choose(0, 2)
    pad <- Gen.oneOf(true, false)
    subs <- Gen.listOfN(Mp2.Sblimit, subGen)
  } yield {
    val f = Mp2.Mp2FrameData(bi, ri, pad, subs.toArray)
    // a random heavy allocation can outgrow a random small frame — a
    // real encoder picks the bitrate for its allocation, so fall back
    // to the largest frame (384 kbps @ 32 kHz fits the worst case)
    if (4 + (f.bodyBits + 7) / 8 <= f.frameLen) f
    else Mp2.Mp2FrameData(14, 2, pad, subs.toArray)
  }

  test("mux ∘ demux = id over random frames: every allocation, scfsi " +
      "pattern, scalefactor and code (grouped 3/5/9 included) recovers " +
      "exactly, with the arithmetic frame offsets") {
    check(Gen.listOfN(4, frameGen), 25) { frames =>
      val bytes = Mp2.mux(frames)
      val rec = Mp2.demux(bytes)
      assert(rec.size == frames.size)
      var off = 0L
      rec.zip(frames).zipWithIndex.foreach { case (((gotOff, got), want), i) =>
        assert(gotOff == off, s"frame $i offset")
        off += want.frameLen
        assert(got.bitrateIndex == want.bitrateIndex &&
          got.rateIndex == want.rateIndex && got.padding == want.padding)
        got.subs.zip(want.subs).zipWithIndex.foreach { case ((g, w), sb) =>
          assert(g.q == w.q, s"frame $i sb $sb alloc")
          if (w.q > 0) {
            assert(g.scfsi == w.scfsi, s"frame $i sb $sb scfsi")
            assert(g.sf.sameElements(w.sf), s"frame $i sb $sb sf")
            assert(g.samples.sameElements(w.samples), s"frame $i sb $sb codes")
          }
        }
      }
      assert(bytes.length == off, "stream length == summed frame lengths")
    }
  }

  test("bit budget matches the oracle's accounting: grouped quantizers " +
      "cost 5/7/10 bits per triplet, midrise 3·log2(L+1)") {
    assert(Mp2.granuleBits(1) == 5)   // L=3
    assert(Mp2.granuleBits(2) == 7)   // L=5
    assert(Mp2.granuleBits(4) == 10)  // L=9
    assert(Mp2.granuleBits(3) == 9)   // L=7: 3x3
    assert(Mp2.granuleBits(5) == 12)  // L=15: 3x4
    assert(Mp2.granuleBits(12) == 33) // L=2047: 3x11
    // body must always fit the declared frame at the fixture bitrate
    val worst = Mp2.Mp2FrameData(14, 2, padding = false,
      Array.fill(Mp2.Sblimit)(Mp2.Mp2Sub(12, 0,
        Array(62, 62, 62), Array.fill(36)(2046))))
    assert(4 + (worst.bodyBits + 7) / 8 <= worst.frameLen)
    assert(Mp2.demux(Mp2.mux(Seq(worst))).head._2.subs(29).samples(35) == 2046)
  }

  test("corruption fails loudly: lost sync, stereo mode bits, grouped " +
      "code beyond L^3, reserved rate, truncation") {
    val f = Mp2.Mp2FrameData(14, 2, padding = false,
      Array.tabulate(Mp2.Sblimit)(sb =>
        if (sb % 3 == 0) Mp2.Mp2Sub(0, 0, Array.empty, Array.empty)
        else Mp2.Mp2Sub(1 + sb % 12, sb % 4,
          Array.fill(Mp2.nsfStored(sb % 4))(sb % 63),
          Array.tabulate(36)(g => g % Mp2.Levels(1 + sb % 12)))))
    val ok = Mp2.mux(Seq(f))
    assert(Mp2.demux(ok).size == 1)
    val sync = ok.clone(); sync(0) = 0x7F
    intercept[IllegalArgumentException] { Mp2.demux(sync) }
    val mode = ok.clone(); mode(3) = 0x00 // stereo
    intercept[IllegalArgumentException] { Mp2.demux(mode) }
    val rate = ok.clone(); rate(2) = (rate(2) | 0x0c).toByte // reserved
    intercept[IllegalArgumentException] { Mp2.demux(rate) }
    intercept[IllegalArgumentException] { Mp2.demux(ok.take(100)) }
    // a grouped code >= L^3: subband with q=1 (L=3, max triplet 26);
    // find the first allocated subband's first granule and force 31
    intercept[IllegalArgumentException] {
      val g = Mp2.Mp2FrameData(14, 2, padding = false,
        Array.tabulate(Mp2.Sblimit)(sb =>
          if (sb == 0) Mp2.Mp2Sub(1, 2, Array(5), Array.fill(36)(2))
          else Mp2.Mp2Sub(0, 0, Array.empty, Array.empty)))
      val bytes = Mp2.mux(Seq(g))
      // body starts at byte 4: 30x4 alloc bits = 15 B, scfsi 2 + sf 6
      // = 1 B -> granule codes start at byte 4+16; first 5-bit code
      // sits in the top bits: force 11111
      bytes(20) = (bytes(20) | 0xf8).toByte
      Mp2.demux(bytes)
    }
  }

  test("synthesis matrixing is the exact integer cosine bank: impulse " +
      "response equals the Q14 coefficient column, and the map is linear") {
    for (k0 <- Seq(0, 7, 31); amp <- Seq(1, -3, 1000)) {
      val s = new Array[Int](32); s(k0) = amp
      val v = Mp2.matrixing(s)
      (0 until 64).foreach { i =>
        val want = math.round(16384.0 *
          math.cos((16 + i) * (2 * k0 + 1) * math.Pi / 64)) * amp
        assert(v(i) == want, s"V($i) impulse k=$k0 amp=$amp")
      }
    }
    val rnd = new scala.util.Random(3)
    val a = Array.fill(32)(rnd.nextInt(4001) - 2000)
    val b = Array.fill(32)(rnd.nextInt(4001) - 2000)
    val sum = a.zip(b).map { case (x, y) => x + y }
    val va = Mp2.matrixing(a); val vb = Mp2.matrixing(b)
    Mp2.matrixing(sum).zipWithIndex.foreach { case (v, i) =>
      assert(v == va(i) + vb(i), s"linearity V($i)")
    }
  }

  test("dequant convention: midrise codes map symmetrically into " +
      "(-1, 1) and the extremes straddle zero") {
    for (l <- Seq(3, 5, 9, 15, 2047)) {
      assert(math.abs(Mp2.dequant(l / 2, l)) < 1e-12, s"center of $l")
      assert(Mp2.dequant(0, l) < 0 && Mp2.dequant(l - 1, l) > 0)
      assert(Mp2.dequant(0, l) == -Mp2.dequant(l - 1, l), s"symmetry $l")
      assert(Mp2.dequant(l - 1, l) < 1.0)
    }
  }

  test("Layer I: muxL1 ∘ demuxL1 = id over random frames (allocations, " +
      "scalefactors, every sample code), 4-byte slot lengths exact") {
    val rnd = new scala.util.Random(31)
    val frames = (0 until 8).map { i =>
      val subs = Array.tabulate(32) { sb =>
        val a = rnd.nextInt(15)
        if (a == 0) Mp2.Mp1Sub(0, 0, Array.empty)
        else {
          val lv = (1 << (a + 1)) - 1
          Mp2.Mp1Sub(a, rnd.nextInt(63),
            Array.fill(12)(rnd.nextInt(lv)))
        }
      }
      Mp2.Mp1FrameData(14, 2, padding = i % 2 == 1, subs)
    }
    val bytes = Mp2.muxL1(frames)
    val rec = Mp2.demuxL1(bytes)
    assert(rec.size == 8)
    var expectOff = 0L
    rec.zip(frames).zipWithIndex.foreach { case (((off, got), want), i) =>
      assert(off == expectOff, s"frame $i offset")
      assert(got.frameLen == 672 + (if (want.padding) 4 else 0))
      expectOff += got.frameLen
      assert(got.bitrateIndex == 14 && got.rateIndex == 2 &&
        got.padding == want.padding)
      got.subs.zip(want.subs).zipWithIndex.foreach { case ((g, w), sb) =>
        assert(g.a == w.a && g.sf == w.sf, s"frame $i subband $sb")
        assert(g.samples.sameElements(w.samples), s"frame $i sb $sb codes")
      }
    }
  }

  test("Layer I guards fail loudly: forbidden allocation 15, all-ones " +
      "code word, Layer II sync mistaken for Layer I, body overrun") {
    intercept[IllegalArgumentException] { Mp2.Mp1Sub(15, 0, Array.empty) }
    intercept[IllegalArgumentException] {
      // all-ones word for a=1 (2-bit code, 3 levels): code 3 forbidden
      Mp2.Mp1Sub(1, 0, Array.fill(12)(3))
    }
    // a Layer II stream (second sync byte 0xFD) must not demux as Layer I
    val l2 = Mp2.mux(Seq(Mp2.Mp2FrameData(14, 2, padding = false,
      Array.fill(Mp2.Sblimit)(Mp2.Mp2Sub(0, 0, Array.empty, Array.empty)))))
    val ex = intercept[IllegalArgumentException] { Mp2.demuxL1(l2) }
    assert(ex.getMessage.contains("sync"))
    // body overrun: all 32 subbands at a=14 is 128 + 32*(6+180) = 6080
    // bits = 760 B > the 668 B body of a 672 B frame
    val fat = Array.fill(32)(Mp2.Mp1Sub(14, 0,
      Array.fill(12)(1)))
    val ex2 = intercept[IllegalArgumentException] {
      Mp2.muxL1(Seq(Mp2.Mp1FrameData(14, 2, padding = false, fat)))
    }
    assert(ex2.getMessage.contains("overruns"))
  }

  test("synthesis filterbank [§2.4.3.2]: Synth matches a brute " +
      "reference that recomputes V/U/W from the full input history at " +
      "every step, over dense random inputs") {
    val rnd = new scala.util.Random(11)
    val steps = Vector.fill(40)(Array.fill(32)(rnd.nextInt(31) - 15))
    val synth = new Mp2.Synth()
    // brute reference: Vreg[64a + b] = matrixing(steps(g - a))(b)
    def brute(g: Int): Array[Long] = {
      val vreg = new Array[Long](1024)
      for (a <- 0 to 15; if g - a >= 0) {
        val m = Mp2.matrixing(steps(g - a))
        System.arraycopy(m, 0, vreg, 64 * a, 64)
      }
      val u = new Array[Long](512)
      for (i <- 0 until 8; j <- 0 until 32) {
        u(64 * i + j) = vreg(128 * i + j)
        u(64 * i + 32 + j) = vreg(128 * i + 96 + j)
      }
      Array.tabulate(32)(j =>
        (0 until 16).map(q => u(j + 32 * q) * Mp2.Window(j + 32 * q)).sum)
    }
    steps.indices.foreach { g =>
      val got = synth.step(steps(g))
      assert(got.sameElements(brute(g)), s"step $g")
    }
    // zero input leaves a zeroed register invariant
    assert(new Mp2.Synth().step(new Array[Int](32)).forall(_ == 0L))
    intercept[IllegalArgumentException] {
      new Mp2.Synth(new Array[Int](5))
    }
  }

  test("impulse kernels: the 2x16 convolution constants the p20 oracle " +
      "embeds equal Mp2.impulseKernels AND reproduce a real Synth run " +
      "over an impulse train on subband 0") {
    val (kSum, k0) = Mp2.impulseKernels()
    assert(kSum.toSeq == Seq(-1558035L, 270971L, 2046024L, -1509363L,
      -1375811L, 457184L, 1668559L, -1128332L, -451780L, -830438L,
      556399L, -765335L, -258888L, -610951L, 254753L, -456567L),
      "pcm-sum kernel drift vs the p20 SQL literals")
    assert(k0.toSeq == Seq(-648760L, -544495L, 266455L, 11585L,
      -289625L, 567665L, 625590L, -347550L, 69510L, 208530L, -486570L,
      -706685L, 428645L, -150605L, -127435L, 405475L),
      "sample-0 kernel drift vs the p20 SQL literals")
    val xs = Vector.tabulate(50)(g => (g * 7 + 3) % 15)
    val synth = new Mp2.Synth()
    val sVec = new Array[Int](32)
    xs.indices.foreach { g =>
      sVec(0) = xs(g)
      val out = synth.step(sVec)
      val wantPcm = (0 to 15).map(a =>
        if (g - a >= 0) xs(g - a).toLong * kSum(a) else 0L).sum
      val want0 = (0 to 15).map(a =>
        if (g - a >= 0) xs(g - a).toLong * k0(a) else 0L).sum
      assert(out.sum == wantPcm, s"step $g pcm sum")
      assert(out(0) == want0, s"step $g sample 0")
    }
  }

  test("Layer II stereo [§2.4.1.5/§2.4.1.6]: the joint bound " +
      "4 + 4·mode_extension splits per-channel from shared subbands — " +
      "ONE allocation and ONE set of codes above it, per-channel " +
      "scalefactors throughout — and every mode round-trips") {
    def mkSub(q: Int, salt: Int): Mp2.Mp2Sub =
      if (q == 0) Mp2.Mp2Sub(0, 0, Array.empty, Array.empty)
      else {
        val scfsi = salt % 4
        Mp2.Mp2Sub(q, scfsi,
          Array.tabulate(Mp2.nsfStored(scfsi))(j => (salt * 5 + j) % 63),
          Array.tabulate(36)(j => (salt * 7 + j * 3) % Mp2.Levels(q)))
      }
    def frame(mode: Int, ext: Int): Mp2.Mp2StereoFrame = {
      val bound = if (mode == 1) 4 + 4 * ext else Mp2.Sblimit
      val subs = Array.tabulate(2, Mp2.Sblimit) { (ch, sb) =>
        val q = if ((sb + ch) % 5 == 4 && sb < bound) 0
          else 1 + (sb * 3 + ch * (if (sb < bound) 7 else 0)) % 12
        mkSub(q, sb * 2 + (if (sb < bound) ch else 0) * 31 + mode)
      }
      // shared subbands: same q + samples, per-channel scalefactors
      (bound until Mp2.Sblimit).foreach { sb =>
        val s0 = subs(0)(sb)
        subs(1)(sb) = s0.copy(sf =
          Array.tabulate(Mp2.nsfStored(s0.scfsi))(j => (sb * 11 + j) % 63))
      }
      Mp2.Mp2StereoFrame(14, 2, padding = mode % 2 == 1, mode, ext, subs)
    }
    Seq((0, 0), (2, 0), (1, 0), (1, 1), (1, 2), (1, 3)).foreach {
      case (mode, ext) =>
        val f = frame(mode, ext)
        val rec = Mp2.demuxStereo(Mp2.muxStereo(Seq(f)))
        assert(rec.size == 1)
        val got = rec.head._2
        assert(got.mode == mode && got.modeExt == ext &&
          got.bound == f.bound, s"mode $mode ext $ext header")
        (0 until 2).foreach(ch => (0 until Mp2.Sblimit).foreach { sb =>
          assert(got.subs(ch)(sb).q == f.subs(ch)(sb).q,
            s"mode $mode ch $ch sb $sb q")
          assert(got.subs(ch)(sb).sf.toSeq == f.subs(ch)(sb).sf.toSeq,
            s"mode $mode ch $ch sb $sb sf")
          assert(got.subs(ch)(sb).samples.toSeq ==
            f.subs(ch)(sb).samples.toSeq,
            s"mode $mode ch $ch sb $sb samples")
        })
    }
    // loud: joint subbands must agree on allocation and codes
    intercept[IllegalArgumentException] {
      val f = frame(1, 0)
      val bad = f.subs.map(_.clone())
      bad(1)(10) = mkSub(3, 99)
      Mp2.Mp2StereoFrame(14, 2, padding = false, 1, 0, bad)
    }
    intercept[IllegalArgumentException] { // mono header rejected
      Mp2.demuxStereo(Mp2.mux(Seq(Mp2.Mp2FrameData(14, 2, false,
        Array.fill(Mp2.Sblimit)(
          Mp2.Mp2Sub(0, 0, Array.empty, Array.empty))))))
    }
  }
}
