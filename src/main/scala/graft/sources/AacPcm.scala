package graft.sources

/** AAC FILTERBANK to samples (ISO/IEC 14496-3 §4.6.11 / 13818-7 §14)
  * — the time-domain leg p25–p28's structural decoder stopped short
  * of, matching the reference's decoded-samples test surface
  * (/root/reference/tests/media/test_audio_codec.py:10-16, decode
  * through libav in media/codec.py:50-135): requantized spectra →
  * IMDCT (N = 2048 long / 256 short ×8) → the SINE window per
  * window_sequence → overlap-add of each frame's first half with the
  * previous frame's tail → 1024 output samples per frame.
  *
  * Everything here is normative SPEC-BODY structure — no appendix
  * tables:
  *  - the IMDCT kernel cos(2π/N (n + n₀)(k + ½)), n₀ = (N/2 + 1)/2
  *    (§4.6.11.1; the 2/N gain is a fixed scale folded into the
  *    engine's integer convention, identical on both oracle sides);
  *  - the sine window w(n) = sin(π/N (n + ½)) (§4.6.11.3;
  *    window_shape = 1's Kaiser-Bessel window is OUT of this leg —
  *    loud, documented boundary);
  *  - the four window SEQUENCES (§4.6.11.2): ONLY_LONG (0),
  *    LONG_START (1, long rise / flat / short fall / zero tail),
  *    EIGHT_SHORT (2, eight 256-point windows at 128-sample strides
  *    from offset 448), LONG_STOP (3, LONG_START mirrored);
  *  - the 50%-overlap-add: out_f(i) = z_{f−1}(1024 + i) + z_f(i).
  *
  * INTEGER-EXACT convention (the Mp3Pcm/Mp2.Matrix quantized-twiddle
  * pattern): window·cosine products quantize ONCE to Q10
  * ([[wm]]), spectra ride [[Aac.requantExact]]'s exact grid, and the
  * p32 oracle replays per-frame linear functionals (summed,
  * alternating-sign and first-sample kernels) from the SAME
  * constants. Headroom: a frame's spectral L1 must stay ≤ 2^32
  * (|z| ≤ 2·2^10·L1 ≤ 2^43 with the overlap — far inside Long). */
object AacPcm {

  /** Q10 lattice scale (shared convention with [[Mp3Pcm]]). */
  val Q = 1024

  private def sinWin(n: Int, big: Int): Double =
    math.sin(math.Pi / big * (n + 0.5))

  /** Window value at output position i (0..2047) for sequence seq —
    * §4.6.11.2's shapes over the sine window. EIGHT_SHORT is handled
    * per short window in [[wm]], not here. */
  private def winLong(seq: Int, i: Int): Double = seq match {
    case 0 => // ONLY_LONG: long rise, long fall
      if (i < 1024) sinWin(i, 2048) else sinWin(2047 - i, 2048)
    case 1 => // LONG_START: long rise, flat, short fall, zero
      if (i < 1024) sinWin(i, 2048)
      else if (i < 1472) 1.0
      else if (i < 1600) sinWin(1599 - i, 256)
      else 0.0
    case 3 => // LONG_STOP: zero, short rise, flat, long fall
      if (i < 448) 0.0
      else if (i < 576) sinWin(i - 448, 256)
      else if (i < 1024) 1.0
      else sinWin(2047 - i, 2048)
    case other => throw new IllegalArgumentException(
      s"aac pcm: window sequence $other is not a long shape")
  }

  private def imdctLong(i: Int, k: Int): Double =
    math.cos(2 * math.Pi / 2048 * (i + 0.5 + 512) * (k + 0.5))
  private def imdctShort(i: Int, k: Int): Double =
    math.cos(2 * math.Pi / 256 * (i + 0.5 + 64) * (k + 0.5))

  /** The windowed-IMDCT lattice per sequence, Q10: `wm(seq)(i)(k)`
    * maps spectral line k (long: 0..1023; EIGHT_SHORT: 128·w + kk)
    * to output position i (0..2047). Short windows land at offsets
    * 448 + 128·w (§4.6.11.2's layout — adjacent shorts overlap over
    * 128 samples). ~8 MB per sequence, built once per JVM. */
  lazy val wm: Array[Array[Array[Int]]] = Array.tabulate(4) { seq =>
    val m = Array.fill(2048, 1024)(0.0)
    if (seq == 2) {
      for (w <- 0 until 8; i <- 0 until 256; kk <- 0 until 128) {
        val win = if (i < 128) sinWin(i, 256) else sinWin(255 - i, 256)
        m(448 + 128 * w + i)(128 * w + kk) += win * imdctShort(i, kk)
      }
    } else {
      for (i <- 0 until 2048; k <- 0 until 1024)
        m(i)(k) = winLong(seq, i) * imdctLong(i, k)
    }
    m.map(_.map(v => math.round(Q * v).toInt))
  }

  /** Requantize one SCE/channel ICS into its 1024 spectral lines
    * ([[Aac.requantExact]] under the decoded scalefactors, §9.2's
    * x^(4/3)·2^((sf−100)/4) grid). Long windows and ungrouped
    * EIGHT_SHORT (scale_factor_grouping = 0 → window w is group w,
    * lines 128·w + swbShort(b) + l); grouped short frames, PNS and
    * intensity sections are OUT of this leg — loud (they ride
    * p27/p28's spectral legs; a CPE's M/S composes upstream). */
  def dequantIcs(ics: Aac.AacIcs,
      p: Aac.Profile = Aac.Profile.StandIn): Array[Long] = {
    val info = ics.info
    require(!info.short || info.scaleFactorGrouping == 0,
      "aac pcm: grouped EIGHT_SHORT frames are out of this leg " +
        "(scale_factor_grouping != 0)")
    require(info.windowShape == 0,
      "aac pcm: window_shape 1 (KBD) is out of this leg")
    val sfs = ics.scalefactors
    val swb = info.swbWith(p)
    val out = new Array[Long](1024)
    ics.sections.zipWithIndex.foreach { case (ss, gi) =>
      ss.foreach { sec =>
        require(!sec.intensity && !sec.noise,
          "aac pcm: intensity/PNS bands decode via p27/p28's exact " +
            "legs, not the filterbank fixture")
        if (sec.cb != 0) (sec.start until sec.end).foreach { b =>
          val sf = sfs(gi)(b).get
          val vals = ics.spectral(gi)(b)
          vals.zipWithIndex.foreach { case (v, l) =>
            val k =
              if (info.short) 128 * gi + swb(b) + l
              else swb(b) + l
            out(k) = Aac.requantExact(v, sf)
          }
        }
      }
    }
    out
  }

  /** One channel's overlap-add state (the previous frame's windowed
    * tail): frames in, 1024 samples out per frame (scale Q ×
    * requant grid). */
  final class Overlap {
    private val prev = new Array[Long](1024)

    /** Flat state (streaming twin form): the 1024-Long tail. */
    def flat: Array[Long] = prev.clone()
    def load(a: Array[Long]): Unit = {
      require(a.length == 1024, "aac pcm: overlap state is 1024 Longs")
      System.arraycopy(a, 0, prev, 0, 1024)
    }

    /** Windowed IMDCT of `lines` under `seq`, overlap-added with the
      * stored tail. */
    def frame(lines: Array[Long], seq: Int): Array[Long] = {
      require(lines.length == 1024, "aac pcm: 1024 spectral lines")
      val l1 = lines.iterator.map(math.abs).sum
      require(l1 <= (1L << 32),
        s"aac pcm: spectral L1 mass $l1 beyond the 2^32 headroom")
      val m = wm(seq)
      val z = new Array[Long](2048)
      var k = 0
      while (k < 1024) {
        val x = lines(k)
        if (x != 0L) {
          var i = 0
          while (i < 2048) { z(i) += m(i)(k).toLong * x; i += 1 }
        }
        k += 1
      }
      val out = new Array[Long](1024)
      var i = 0
      while (i < 1024) {
        out(i) = prev(i) + z(i)
        prev(i) = z(1024 + i)
        i += 1
      }
      out
    }
  }
}
