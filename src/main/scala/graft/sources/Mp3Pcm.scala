package graft.sources

/** MPEG-1 Layer III HYBRID FILTERBANK (ISO/IEC 11172-3 §2.4.3.4) —
  * the time-domain leg the structural decoder (p21–p24) stopped
  * short of: requantized spectral lines → alias reduction → IMDCT
  * 36/12 with the block-type window shapes → overlap-add →
  * frequency inversion → the EXISTING Layer II polyphase synthesis
  * ([[Mp2.Synth]]), emitting PCM like the reference's audio decoder
  * (streamtasks/media/audiodecoder.py:43-59, decode through libav in
  * media/codec.py:50-135).
  *
  * Everything here is normative SPEC-BODY structure — no appendix
  * tables:
  *  - the eight alias-reduction coefficients are the §2.4.3.4.10.1
  *    FORMULAS cs_i = 1/√(1+c_i²), ca_i = c_i·cs_i over the printed
  *    c_i list; butterflies act on the 8 lines each side of every
  *    long-subband boundary (31 boundaries for long granules, only
  *    the lowest for mixed, none for pure short — §2.4.3.4.10.1);
  *  - the IMDCT x_i = Σ_k X_k cos(π/2n (2i+1+n/2)(2k+1)) with n = 36
  *    (one block per subband) or n = 12 (three short blocks,
  *    overlapped at 6-sample offsets into the same 36-slot frame) —
  *    §2.4.3.4.12;
  *  - the window SHAPES per block_type (§2.4.3.4.10.3): normal
  *    sin(π/36 (i+½)); start = first half normal, 6 flat, 6 short
  *    tail, 6 zero; stop mirrored; short sin(π/12 (i+½)) per block;
  *  - overlap-add of each 36-sample block with the previous
  *    granule's tail (§2.4.3.4.10.2), frequency inversion of odd
  *    time samples in odd subbands (§2.4.3.4.16), then one
  *    [[Mp2.Synth]] step per time slot (18 per granule).
  *
  * INTEGER-EXACT convention (p05's quantized-twiddle trick, the same
  * one [[Mp2.Matrix]] rides): the irrational window·cosine products
  * are quantized ONCE to Q10 integers ([[imdctWin]], [[CsQ]]/[[CaQ]])
  * and everything downstream is Long arithmetic — the p31 oracle
  * replays the identical lattice in SQL from the same constants.
  * Layer III's scalefactor application stays out of the exact regime
  * (as in p21–p24: global_gain and subblock_gain ride
  * [[Mp3.requantExact]]; stored scalefactors are pinned separately).
  *
  * Headroom bound, enforced loudly: a granule's spectral L1 mass
  * Σ|xr| must stay ≤ 2^16. Worst-case growth through the lattice —
  * alias L1 ×2·2^10, per-line IMDCT ≤ 2^10·L1, overlap ×2,
  * matrixing ≤ 2^14·Σ_sb|S|, windowing ×16·63 — then tops out near
  * 2^62, inside Long range. */
object Mp3Pcm {

  /** Q10 quantization scale shared by the alias and IMDCT lattices. */
  val Q = 1024

  /** §2.4.3.4.10.1's printed c_i list (spec body, not appendix). */
  val Ci: Array[Double] = Array(-0.6, -0.535, -0.33, -0.185, -0.095,
    -0.041, -0.0142, -0.0037)
  /** cs_i = 1/√(1+c_i²), Q10. */
  val CsQ: Array[Int] = Ci.map(c =>
    math.round(Q / math.sqrt(1 + c * c)).toInt)
  /** ca_i = c_i/√(1+c_i²), Q10. */
  val CaQ: Array[Int] = Ci.map(c =>
    math.round(Q * c / math.sqrt(1 + c * c)).toInt)

  private def winNormal(i: Int): Double = math.sin(math.Pi / 36 * (i + 0.5))
  private def winShort(i: Int): Double = math.sin(math.Pi / 12 * (i + 0.5))
  private def winStart(i: Int): Double =
    if (i < 18) winNormal(i)
    else if (i < 24) 1.0
    else if (i < 30) winShort(i - 18)
    else 0.0
  private def winStop(i: Int): Double =
    if (i < 6) 0.0
    else if (i < 12) winShort(i - 6)
    else if (i < 18) 1.0
    else winNormal(i)

  private def imdct36(i: Int, k: Int): Double =
    math.cos(math.Pi / 72 * (2 * i + 1 + 18) * (2 * k + 1))
  private def imdct12(i: Int, k: Int): Double =
    math.cos(math.Pi / 24 * (2 * i + 1 + 6) * (2 * k + 1))

  /** The combined IMDCT×window 36×18 lattice per block type, Q10.
    * Long types (0 normal, 1 start, 3 stop): column k is spectral
    * line k of the subband. Short (2): column k = 6·w + kk is line kk
    * of window w; the three windowed 12-blocks land at offsets
    * 6 + 6w of the 36-slot frame (§2.4.3.4.10.2's short layout). */
  val imdctWin: Array[Array[Array[Int]]] = Array.tabulate(4) { bt =>
    val m = Array.fill(36, 18)(0.0)
    if (bt == 2) {
      for (w <- 0 until 3; i <- 0 until 12; kk <- 0 until 6)
        m(6 + 6 * w + i)(6 * w + kk) += winShort(i) * imdct12(i, kk)
    } else {
      val win: Int => Double = bt match {
        case 0 => winNormal
        case 1 => winStart
        case _ => winStop
      }
      for (i <- 0 until 36; k <- 0 until 18)
        m(i)(k) = win(i) * imdct36(i, k)
    }
    m.map(_.map(v => math.round(Q * v).toInt))
  }

  /** §2.4.3.4.10.1 alias-reduction butterflies over a (32 × 18)
    * subband-layout spectrum; `boundaries` = 31 (long), 1 (mixed),
    * 0 (pure short). Output scale ×Q. */
  def aliasReduce(xs: Array[Array[Long]], boundaries: Int)
      : Array[Array[Long]] = {
    require(xs.length == 32 && xs.forall(_.length == 18),
      "mp3 pcm: spectrum is 32 subbands x 18 lines")
    require(boundaries >= 0 && boundaries <= 31,
      s"mp3 pcm: $boundaries butterfly boundaries")
    val out = xs.map(_.map(_ * Q))
    var sb = 1
    while (sb <= boundaries) {
      var i = 0
      while (i < 8) {
        val lo = xs(sb - 1)(17 - i)
        val hi = xs(sb)(i)
        out(sb - 1)(17 - i) = CsQ(i) * lo - CaQ(i) * hi
        out(sb)(i) = CaQ(i) * lo + CsQ(i) * hi
        i += 1
      }
      sb += 1
    }
    out
  }

  /** Requantize + REORDER one granule into the hybrid's (32 × 18)
    * subband layout ([[Mp3.requantExact]] with §2.4.3.4.7.1 subblock
    * gain; §2.4.3.4.5 reorder for short regions — coded order is
    * sfb-major with the three windows consecutive per band, spectral
    * order per window is line-major: coded (band b, window w, i) →
    * window line l = off(b)+i → subband l/6, slot 6w + l%6). */
  def dequantGranule(g: Mp3.Granule,
      p: Mp3.Profile = Mp3.Profile.StandIn): Array[Array[Long]] = {
    val xs = Array.fill(32, 18)(0L)
    val values = g.bigValues.flatMap(t => Seq(t._1, t._2)) ++
      g.count1.flatMap(q => Seq(q._1, q._2, q._3, q._4))
    // short regions start at line 0 (pure short) or at the mixed
    // split 3·short_sfb[3] (the two long subbands) — §2.4.3.4.5
    val longCut = g.blockSplit match {
      case Some(bs) if bs.blockType == 2 =>
        if (bs.mixed) 3 * p.sfbShort(3) else 0
      case _ => 576
    }
    values.zipWithIndex.foreach { case (v, j) =>
      require(j < 576, s"mp3 pcm: coded line $j beyond the granule")
      if (j < longCut) { // long region (full long granule or the
        // two mixed subbands)
        xs(j / 18)(j % 18) = Mp3.requantExact(v, g.globalGain)
      } else {
        val bs = g.blockSplit.get
        val w = Mp3.shortWindowWith(j, bs.mixed, p.sfbShort)
        val b = (0 until 12).find(b =>
          j < 3 * p.sfbShort(b + 1)).getOrElse(
          throw new IllegalArgumentException(
            s"mp3 pcm: line $j beyond the short sfb table"))
        val width = p.sfbShort(b + 1) - p.sfbShort(b)
        val i = j - 3 * p.sfbShort(b) - w * width
        val l = p.sfbShort(b) + i
        val gain = g.globalGain - 8 * bs.sbg(w)
        xs(l / 6)(6 * w + l % 6) = Mp3.requantExact(v, gain)
      }
    }
    xs
  }

  /** Headroom bound (see module doc). */
  private def checkHeadroom(xs: Array[Array[Long]]): Unit = {
    val l1 = xs.iterator.flatten.map(math.abs).sum
    require(l1 <= (1L << 16),
      s"mp3 pcm: granule L1 mass $l1 beyond the 2^16 exact-lattice " +
        "headroom")
  }

  /** One channel's hybrid + polyphase state: the 32 × 18 overlap
    * store (§2.4.3.4.10.2) and the polyphase V register
    * ([[Mp2.Synth]]). One granule in → 576 PCM samples out
    * (scale Q² · 2^14 · window). */
  final class Hybrid(window: Array[Int] = Mp2.Window) {
    private val prev = Array.fill(32, 18)(0L)
    private val synth = new Mp2.Synth(window)

    /** Flat cross-granule state (overlap store ++ V register, 576 +
      * 1024 Longs) — the state-store form for the streaming twin
      * ([[graft.streaming.Mp3Machine.PcmDecoder]]): ≈ 12.5 KB per
      * key, CONSTANT by construction. */
    def flat: Array[Long] = {
      val out = new Array[Long](576 + 1024)
      var sb = 0
      while (sb < 32) {
        System.arraycopy(prev(sb), 0, out, 18 * sb, 18); sb += 1
      }
      System.arraycopy(synth.vFlat, 0, out, 576, 1024)
      out
    }
    def load(a: Array[Long]): Unit = {
      require(a.length == 576 + 1024,
        s"mp3 pcm: hybrid state is 1600 Longs, got ${a.length}")
      var sb = 0
      while (sb < 32) {
        System.arraycopy(a, 18 * sb, prev(sb), 0, 18); sb += 1
      }
      synth.loadV(java.util.Arrays.copyOfRange(a, 576, 1600))
    }

    /** Decode one granule to PCM. `blockSplit` drives the window
      * shapes; alias boundaries and per-subband block types follow
      * §2.4.3.4.10.1/.3 (mixed: subbands 0–1 long-normal, rest
      * short). */
    def granule(g: Mp3.Granule,
        p: Mp3.Profile = Mp3.Profile.StandIn): Array[Long] =
      granuleSpectrum(dequantGranule(g, p), g.blockSplit)

    /** [[granule]] from a PRE-BUILT (32 × 18) spectrum — the stereo
      * entry point: §2.4.3.4.9's MS/intensity reconstruction composes
      * per-channel spectra BEFORE the filterbank, so each channel's
      * Hybrid consumes combined lines, not a coded Granule. */
    def granuleSpectrum(xs: Array[Array[Long]],
        blockSplit: Option[Mp3.BlockSplit]): Array[Long] = {
      checkHeadroom(xs)
      val boundaries = blockSplit match {
        case Some(bs) if bs.blockType == 2 => if (bs.mixed) 1 else 0
        case _ => 31
      }
      val xa = aliasReduce(xs, boundaries)
      val slots = Array.fill(18, 32)(0L)
      var sb = 0
      while (sb < 32) {
        val bt = blockSplit match {
          case Some(bs) =>
            if (bs.blockType == 2 && bs.mixed && sb < 2) 0
            else bs.blockType
          case None => 0
        }
        val m = imdctWin(bt)
        var j = 0
        while (j < 36) {
          var acc = 0L
          var k = 0
          while (k < 18) { acc += m(j)(k).toLong * xa(sb)(k); k += 1 }
          if (j < 18) {
            // overlap-add with the previous granule's tail, then
            // §2.4.3.4.16 frequency inversion
            val v = prev(sb)(j) + acc
            slots(j)(sb) =
              if (sb % 2 == 1 && j % 2 == 1) -v else v
          } else prev(sb)(j - 18) = acc
          j += 1
        }
        sb += 1
      }
      val out = new Array[Long](576)
      var t = 0
      while (t < 18) {
        val pcm = synth.stepL(slots(t))
        System.arraycopy(pcm, 0, out, 32 * t, 32)
        t += 1
      }
      out
    }
  }
}
