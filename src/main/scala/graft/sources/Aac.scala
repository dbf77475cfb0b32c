package graft.sources

import graft.sources.Flac.{BitReader, BitWriter}

/** MPEG-2 AAC-LC STRUCTURAL codec (ISO/IEC 13818-7 §6.3) — the
  * raw_data_block layer under p15's ADTS framing
  * ([[AudioIndex.adtsMux]]): AAC is the reference's DEFAULT audio
  * codec (every container test pairs it,
  * /root/reference/tests/media/test_containers.py:20, and the codec
  * tests open with it, tests/media/test_audio_codec.py:11, decoded
  * through libav in streamtasks/media/codec.py:50-135).
  *
  * NORMATIVE here (spec text, not appendix data):
  *  - the raw_data_block element loop (§6.3.1): id_syn_ele 3 bits,
  *    SCE = 0 carrying element_instance_tag(4) + an
  *    individual_channel_stream, END = 7, then byte alignment;
  *  - ics_info (§6.3.2): ics_reserved_bit, window_sequence(2),
  *    window_shape(1); EIGHT_SHORT_SEQUENCE carries max_sfb(4) +
  *    scale_factor_grouping(7) — bit k set fuses window k+1 into the
  *    previous group; long sequences carry max_sfb(6) +
  *    predictor_data_present(1) (must be 0 for LC, loud);
  *  - section_data (§6.3.2): per group, runs of a shared codebook:
  *    sect_cb(4) + sect_len_incr in 5-bit (long) / 3-bit (short)
  *    fields with the all-ones ESCAPE repetition, sections covering
  *    exactly [0, max_sfb);
  *  - scale_factor_data (§6.3.2): one DPCM value per coded sfb in
  *    group-major scan order, accumulating from global_gain (the
  *    Huffman codewords of Table A.1 are appendix data — the seam
  *    stores the signed delta in 8 bits two's complement; the real
  *    table's index-minus-60 mechanics collapse to the same delta);
  *  - the codebook PROPERTIES of Table 7.1: dimension 4 (cb 1–4) or
  *    2 (cb 5–11), signed (1,2,5,6) vs unsigned-with-sign-bits, LAV
  *    per codebook, and cb 11's escape mechanism (§9.3): magnitude
  *    16 marks an escape; N leading ones, a zero, then an (N+4)-bit
  *    word encode 2^(N+4) + word;
  *  - tns_data (§6.3.2): n_filt(2/1), coef_res(1), length(6/4),
  *    order(5/3), direction(1), coef_compress(1), then order
  *    coefficients of coef_res + 3 − compress bits;
  *  - the §9.2 requantization x^(4/3) · 2^((sf − 100)/4) on the
  *    integer-exact regime (cube magnitudes, scalefactors on the
  *    100 + 4e grid), like [[Mp3.requantExact]].
  *
  * Documented STAND-INS/SEAMS (appendix DATA — a value swap, not a
  * code change), INJECTABLE via [[Profile]] (JSON:
  * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
  * the spectral Huffman codeWORDS of Tables A.2–A.12 ([[CbSeam]]
  * fixed-width fields shaped by Table 7.1's properties; an injected
  * table flips that codebook to the spec's real tuple-codeword bit
  * order), the scalefactor codebook (8-bit signed delta — the real
  * Table A.1 collapses to the same delta), and the scalefactor-band
  * offset tables of §8.9 ([[SwbLong]]/[[SwbShort]] 2(i²+i) as the
  * stand-ins).
  *
  * Subset boundaries, loud: LC profile only (no predictor, no gain
  * control), no pulse data. PNS (cb 13, §4.6.13) and intensity
  * stereo (cb 14/15, §12.2) ARE implemented (p27/p28), as are
  * channel pairs ([[muxCpe]]/[[demuxCpe]], M/S per §12.1; p26/m67) —
  * cb 12 stays reserved and fails loudly. */
object Aac {

  /** Table 7.1 codebook properties — dimension, signedness, LAV. */
  def cbDim(cb: Int): Int = if (cb <= 4) 4 else 2
  def cbSigned(cb: Int): Boolean =
    cb == 1 || cb == 2 || cb == 5 || cb == 6
  def cbLav(cb: Int): Int = cb match {
    case 1 | 2 => 1
    case 3 | 4 => 2
    case 5 | 6 => 4
    case 7 | 8 => 7
    case 9 | 10 => 12
    case 11 => 16
    case _ => throw new IllegalArgumentException(s"aac: codebook $cb")
  }

  /** STAND-IN scalefactor-band offsets (§8.9's per-rate tables are
    * appendix data): long window, 13 entries, width 4i+4. */
  val SwbLong: Array[Int] = Array.tabulate(13)(i => 2 * (i * i + i))
  /** STAND-IN short-window sfb offsets: 8 entries within the 128
    * coefficients of one short window. */
  val SwbShort: Array[Int] = Array.tabulate(8)(i => 2 * (i * i + i))

  /** The INJECTABLE table set behind AAC's appendix-data seams (same
    * class as [[graft.functions.Vp8.Profile]]; JSON:
    * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
    *
    *  - `swbLong`/`swbShort` — the §8.9 scalefactor-band offset
    *    tables for the chosen sample rate (any length; the real
    *    44.1 kHz long table has 50 entries);
    *  - `cb` — the spectral codeword tables A.2–A.12: slot i holds
    *    codebook i's [[Vlc]] over the TUPLE INDEX (packing below);
    *    `None` keeps that codebook's stand-in fixed-width fields;
    *    `Some` switches it to the spec's real bit order — codeword,
    *    then (unsigned books) one sign bit per nonzero in value
    *    order, then cb 11's §9.3 escapes in value order.
    *
    * Tuple-index packing (the JSON document's value column):
    * signed books (1,2,5,6): idx = Σ (v_i + LAV)·(2·LAV+1)^(d−1−i);
    * unsigned books: idx = Σ m_i·B^(d−1−i) with B = LAV+1 and
    * m_i = |v_i| (cb 11: B = 17, m_i = min(|v_i|, 16) — 16 is the
    * escape marker). */
  final case class Profile(swbLong: Array[Int], swbShort: Array[Int],
      cb: Vector[Option[Vlc]]) {
    require(swbLong.length >= 2 && swbLong(0) == 0 &&
      swbLong.sliding(2).forall(w => w(0) < w(1)),
      "aac profile: swbLong must strictly increase from 0")
    require(swbShort.length >= 2 && swbShort(0) == 0 &&
      swbShort.sliding(2).forall(w => w(0) < w(1)),
      "aac profile: swbShort must strictly increase from 0")
    require(cb.length == 12 && cb(0).isEmpty,
      "aac profile: 12 codebook slots, slot 0 (ZERO) has no codewords")
    (1 to 11).foreach { b =>
      cb(b).foreach { vlc =>
        val dim = cbDim(b)
        val base = if (cbSigned(b)) 2 * cbLav(b) + 1
          else if (b == 11) 17 else cbLav(b) + 1
        val size = math.pow(base.toDouble, dim.toDouble).toInt
        require(vlc.values.forall(v => v >= 0 && v < size),
          s"aac profile: codebook $b tuple indices are [0, $size)")
      }
    }
    def swb(short: Boolean): Array[Int] =
      if (short) swbShort else swbLong
  }
  object Profile {
    /** The stand-in tables — bit-identical to the historic layout. */
    val StandIn: Profile =
      Profile(SwbLong, SwbShort, Vector.fill(12)(None))
  }

  /** The spectral-codeword seam: Tables A.2–A.12 are appendix data;
    * what's coded here is Table 7.1's STRUCTURE — dim-sized tuples,
    * two's-complement fields for the signed codebooks, magnitude
    * fields + trailing per-nonzero sign bits for the unsigned ones,
    * and cb 11's §9.3 escape (magnitude 16 marks it; N ones + '0' +
    * an (N+4)-bit word encode 2^(N+4) + word, 16 ≤ value < 2^13). */
  object CbSeam {
    def fieldBits(cb: Int): Int = {
      val lav = cbLav(cb)
      var b = 1
      if (cbSigned(cb)) { while ((1 << (b - 1)) <= lav) b += 1 }
      else { while ((1 << b) <= lav) b += 1; b += 0 }
      b
    }
    /** Bits one value costs (field + sign + escape extension). */
    def valueBits(cb: Int, v: Int): Int = {
      val m = math.abs(v)
      if (cbSigned(cb)) fieldBits(cb)
      else {
        val esc = if (cb == 11 && m >= 16) {
          var n = 0; while ((1 << (n + 5)) <= m) n += 1
          n + 1 + (n + 4)
        } else 0
        fieldBits(cb) + (if (m != 0) 1 else 0) + esc
      }
    }
    def writeTuple(w: BitWriter, cb: Int, vs: Seq[Int]): Unit = {
      require(vs.length == cbDim(cb),
        s"aac: codebook $cb codes ${cbDim(cb)}-tuples, got ${vs.length}")
      val lav = cbLav(cb)
      if (cbSigned(cb)) vs.foreach { v =>
        require(v >= -lav && v <= lav, s"aac: $v beyond signed LAV $lav")
        val b = fieldBits(cb)
        w.writeBits((v & ((1 << b) - 1)).toLong, b)
      } else {
        vs.foreach { v =>
          val m = math.abs(v)
          require(m <= lav || cb == 11 && m < (1 << 13),
            s"aac: magnitude $m beyond LAV $lav of codebook $cb")
          w.writeBits(math.min(m, if (cb == 11) 16 else lav).toLong,
            fieldBits(cb))
        }
        // §6.3: sign bits trail the codeword, one per nonzero value
        vs.filter(_ != 0).foreach(v =>
          w.writeBits(if (v < 0) 1L else 0L, 1))
        // cb 11 escapes trail the signs, in value order
        if (cb == 11) vs.map(math.abs).filter(_ >= 16).foreach { m =>
          var n = 0; while ((1 << (n + 5)) <= m) n += 1
          (0 until n).foreach(_ => w.writeBits(1L, 1))
          w.writeBits(0L, 1)
          w.writeBits((m - (1 << (n + 4))).toLong, n + 4)
        }
      }
    }
    def readTuple(r: BitReader, cb: Int): Vector[Int] = {
      val d = cbDim(cb)
      if (cbSigned(cb)) {
        val b = fieldBits(cb)
        Vector.fill(d) {
          val raw = r.readBits(b).toInt
          val v = if ((raw & (1 << (b - 1))) != 0) raw - (1 << b) else raw
          require(math.abs(v) <= cbLav(cb),
            s"aac: signed field $v beyond LAV of codebook $cb")
          v
        }
      } else {
        val mags = Vector.fill(d)(r.readBits(fieldBits(cb)).toInt)
        val signs = mags.map(m => m != 0 && r.readBits(1) == 1L)
        val full = if (cb == 11) mags.map { m =>
          if (m < 16) m
          else {
            var n = 0; while (r.readBits(1) == 1L) n += 1
            (1 << (n + 4)) + r.readBits(n + 4).toInt
          }
        } else mags
        full.zip(signs).map { case (m, neg) => if (neg) -m else m }
      }
    }

    /** The [[Profile]] tuple-index packing (see its doc). */
    def tupleIndex(cb: Int, vs: Seq[Int]): Int = {
      val lav = cbLav(cb)
      if (cbSigned(cb))
        vs.foldLeft(0)((a, v) => a * (2 * lav + 1) + (v + lav))
      else {
        val base = if (cb == 11) 17 else lav + 1
        vs.foldLeft(0)((a, v) =>
          a * base + math.min(math.abs(v), if (cb == 11) 16 else lav))
      }
    }

    /** [[writeTuple]] under profile p: an injected table codes the
      * tuple as ONE codeword in the spec's real order. */
    def writeTupleWith(w: BitWriter, cb: Int, vs: Seq[Int],
        p: Profile): Unit = p.cb(cb) match {
      case None => writeTuple(w, cb, vs)
      case Some(vlc) =>
        require(vs.length == cbDim(cb),
          s"aac: codebook $cb codes ${cbDim(cb)}-tuples")
        val lav = cbLav(cb)
        if (cbSigned(cb)) {
          vs.foreach(v => require(v >= -lav && v <= lav,
            s"aac: $v beyond signed LAV $lav"))
          vlc.write(w.writeBits, tupleIndex(cb, vs))
        } else {
          vs.foreach { v =>
            val m = math.abs(v)
            require(m <= lav || cb == 11 && m < (1 << 13),
              s"aac: magnitude $m beyond LAV $lav of codebook $cb")
          }
          vlc.write(w.writeBits, tupleIndex(cb, vs))
          vs.filter(_ != 0).foreach(v =>
            w.writeBits(if (v < 0) 1L else 0L, 1))
          if (cb == 11) vs.map(math.abs).filter(_ >= 16).foreach { m =>
            var n = 0; while ((1 << (n + 5)) <= m) n += 1
            (0 until n).foreach(_ => w.writeBits(1L, 1))
            w.writeBits(0L, 1)
            w.writeBits((m - (1 << (n + 4))).toLong, n + 4)
          }
        }
    }

    /** [[readTuple]] under profile p (inverse of
      * [[writeTupleWith]]). */
    def readTupleWith(r: BitReader, cb: Int, p: Profile): Vector[Int] =
      p.cb(cb) match {
        case None => readTuple(r, cb)
        case Some(vlc) =>
          val d = cbDim(cb)
          val lav = cbLav(cb)
          val idx = vlc.read(r.readBits)
          if (cbSigned(cb)) {
            val base = 2 * lav + 1
            var rest = idx
            val rev = Vector.fill(d) {
              val v = rest % base - lav; rest /= base; v
            }
            rev.reverse
          } else {
            val base = if (cb == 11) 17 else lav + 1
            var rest = idx
            val rev = Vector.fill(d) { val m = rest % base; rest /= base; m }
            val mags = rev.reverse
            val signs = mags.map(m => m != 0 && r.readBits(1) == 1L)
            val full = if (cb == 11) mags.map { m =>
              if (m < 16) m
              else {
                var n = 0; while (r.readBits(1) == 1L) n += 1
                (1 << (n + 4)) + r.readBits(n + 4).toInt
              }
            } else mags
            full.zip(signs).map { case (m, neg) => if (neg) -m else m }
          }
      }
  }

  /** §6.3.2 ics_info. windowSequence: 0 ONLY_LONG, 1 LONG_START,
    * 2 EIGHT_SHORT, 3 LONG_STOP. */
  final case class IcsInfo(windowSequence: Int, windowShape: Int,
      maxSfb: Int, scaleFactorGrouping: Int) {
    require(windowSequence >= 0 && windowSequence <= 3,
      "aac: window_sequence")
    require(windowShape == 0 || windowShape == 1, "aac: window_shape")
    def short: Boolean = windowSequence == 2
    require(scaleFactorGrouping >= 0 && scaleFactorGrouping < 128 &&
      (short || scaleFactorGrouping == 0),
      "aac: scale_factor_grouping is EIGHT_SHORT only (7 bits)")
    // the FIELD bound; the active swb table's bound (profile-
    // dependent) is checked by validate() at mux/demux
    require(maxSfb >= 0 && maxSfb < (if (short) 16 else 64),
      s"aac: max_sfb $maxSfb beyond its field width")
    /** Window-group lengths: grouping bit k (MSB first) fuses window
      * k+1 into the previous group. */
    def groupLens: Vector[Int] =
      if (!short) Vector(1)
      else (0 until 7).foldLeft(Vector(1)) { (acc, k) =>
        if (((scaleFactorGrouping >> (6 - k)) & 1) == 1)
          acc.init :+ (acc.last + 1)
        else acc :+ 1
      }
    def swb: Array[Int] = if (short) SwbShort else SwbLong
    def swbWith(p: Profile): Array[Int] = p.swb(short)
    /** Coefficients one group contributes for sfb w. */
    def sfbWidth(w: Int, groupLen: Int): Int =
      sfbWidthWith(w, groupLen, Profile.StandIn)
    def sfbWidthWith(w: Int, groupLen: Int, p: Profile): Int = {
      val t = swbWith(p)
      (t(w + 1) - t(w)) * (if (short) groupLen else 1)
    }
    /** The active-table bound (mux/demux call this with their
      * profile). */
    def validate(p: Profile): Unit =
      require(maxSfb < p.swb(short).length,
        s"aac: max_sfb $maxSfb beyond the active swb table " +
          s"(${p.swb(short).length - 1} bands)")
  }

  /** One section: codebook over sfbs [start, end) of one group.
    * 0 = ZERO, 1–11 spectral, 13 = NOISE (PNS, ISO/IEC 14496-3
    * §4.6.13 — MPEG-4 AAC, which is what ADTS ID = 0 frames carry: no
    * spectral data, the scalefactor slot holds dpcm noise energy
    * accumulating from global_gain − 90), 14/15 = INTENSITY
    * (out-of-phase / in-phase, §12.2 — CPE right channel only, the
    * slot holds dpcm is_position from 0); 12 stays reserved, loud. */
  final case class Section(cb: Int, start: Int, end: Int) {
    require(cb >= 0 && cb <= 11 || cb >= 13 && cb <= 15,
      s"aac: codebook $cb out of scope (12 is reserved)")
    require(start < end, "aac: empty section")
    def intensity: Boolean = cb >= 14
    def noise: Boolean = cb == 13
  }

  final case class TnsFilter(coefRes: Int, length: Int, order: Int,
      direction: Int, compress: Int, coefs: Vector[Int]) {
    require(coefRes == 0 || coefRes == 1, "aac: coef_res is 1 bit")
    require(coefs.length == order, "aac: one coefficient per order")
    val coefBits: Int = coefRes + 3 - compress
    require(order == 0 || coefs.forall(c =>
      c >= 0 && c < (1 << coefBits)), "aac: tns coef width")
  }

  /** §6.3.2 individual_channel_stream, SCE shape. `sections`,
    * `dpcm` (per coded sfb, scan order) and `spectral` (per sfb;
    * empty for ZERO sections) are per group. `tns` is the LONG-window
    * filter list (one window); EIGHT_SHORT frames carry `tnsShort`
    * instead — per short window 0..1 filters (the 1-bit short-form
    * n_filt) with the 4-bit length / 3-bit order fields. */
  final case class AacIcs(globalGain: Int, info: IcsInfo,
      sections: Vector[Vector[Section]],
      dpcm: Vector[Vector[Int]],
      tns: Option[Vector[TnsFilter]],
      spectral: Vector[Vector[Vector[Int]]],
      tnsShort: Option[Vector[Option[TnsFilter]]] = None) {
    require(tns.isEmpty || !info.short,
      "aac: long-form TNS on an EIGHT_SHORT frame (use tnsShort)")
    require(tnsShort.isEmpty || info.short,
      "aac: short-form TNS on a long frame (use tns)")
    require(tnsShort.forall(_.length == 8),
      "aac: short TNS carries one slot per window")
    require(tnsShort.forall(_.flatten.forall(f =>
      f.length < 16 && f.order < 8)),
      "aac: short TNS length is 4 bits, order 3 bits")
    require(globalGain >= 0 && globalGain < 256, "aac: global_gain")
    private val g = info.groupLens
    require(sections.length == g.length && dpcm.length == g.length &&
      spectral.length == g.length, "aac: per-group shapes")
    sections.foreach { ss =>
      ss.foldLeft(0) { (k, s) =>
        require(s.start == k, s"aac: section gap at sfb $k")
        s.end
      } match {
        case e => require(e == info.maxSfb,
          s"aac: sections end at $e, max_sfb is ${info.maxSfb}")
      }
    }
    /** cb per (group, sfb). */
    def cbOf(gi: Int, w: Int): Int =
      sections(gi).find(s => w >= s.start && w < s.end).get.cb
    g.indices.foreach { gi =>
      val coded = (0 until info.maxSfb).count(w => cbOf(gi, w) != 0)
      require(dpcm(gi).length == coded,
        s"aac: group $gi has $coded coded sfbs, " +
          s"${dpcm(gi).length} dpcm values")
      require(spectral(gi).length == info.maxSfb, "aac: spectral shape")
    }
    /** Per-sfb coefficient-count check against the ACTIVE swb table
      * (profile-dependent — mux and demux both run it). */
    def validateShapes(p: Profile = Profile.StandIn): Unit = {
      info.validate(p)
      g.indices.foreach { gi =>
        (0 until info.maxSfb).foreach { w =>
          val cb = cbOf(gi, w)
          val want = if (cb == 0 || cb >= 13) 0
            else info.sfbWidthWith(w, g(gi), p)
          require(spectral(gi)(w).length == want,
            s"aac: group $gi sfb $w wants $want coefficients, " +
              s"has ${spectral(gi)(w).length}")
        }
      }
    }
    require(tns.forall(_.nonEmpty), "aac: present TNS needs filters")
    def hasIntensity: Boolean =
      sections.exists(_.exists(_.intensity))
    /** Scalefactors per (group, sfb) in scan order — THREE
      * accumulators over one dpcm stream (§6.3.2 decode_scale_factors
      * / 14496-3 §4.6.2.3.3): spectral sfbs accumulate from
      * global_gain; INTENSITY sfbs into their own accumulator from 0
      * (the value is the is_position); NOISE sfbs into theirs from
      * global_gain − 90 (the value is the noise energy); None for
      * ZERO sections. */
    def scalefactors: Vector[Vector[Option[Int]]] = {
      var run = globalGain
      var isRun = 0
      var nrgRun = globalGain - 90
      g.indices.toVector.map { gi =>
        var d = 0
        (0 until info.maxSfb).toVector.map { w =>
          val cb = cbOf(gi, w)
          if (cb == 0) None
          else if (cb >= 14) {
            isRun += dpcm(gi)(d); d += 1; Some(isRun)
          } else if (cb == 13) {
            nrgRun += dpcm(gi)(d); d += 1; Some(nrgRun)
          } else { run += dpcm(gi)(d); d += 1; Some(run) }
        }
      }
    }
  }

  /** STAND-IN noise vector for a PNS band (14496-3 §4.6.13 mandates
    * only the TARGET ENERGY 2^(nrg/4-ish) — the generator itself is
    * implementation-defined, libav uses its own LCG): alternating
    * ±2^e with e = (nrg − 100)/4 on the exact grid, so |value| and
    * the band's absolute sum are integer-exact and oracle-pinnable
    * while the spec's real degree of freedom stays visible. */
  def pnsStandIn(width: Int, nrg: Int): Vector[Long] = {
    val e = nrg - 100
    require(e >= 0 && e % 4 == 0,
      s"aac: noise energy $nrg off the 100 + 4e exact grid")
    Vector.tabulate(width)(k =>
      (if (k % 2 == 0) 1L else -1L) << (e / 4))
  }

  /** §12.2 intensity reconstruction on the exact-integer grid:
    * right = left · sign · 0.5^(is_position/4) with sign = +1 for
    * codebook 15 (in-phase), −1 for 14 (out-of-phase), INVERTED by
    * ms_used when ms_mask_present = 1 (§12.3). Exact regime:
    * is_position on the 4e grid; downward scaling requires
    * divisibility (loud otherwise). */
  def intensityExact(left: Long, isPos: Int, inPhase: Boolean,
      invert: Boolean): Long = {
    require(isPos % 4 == 0,
      s"aac: is_position $isPos off the 4e exact grid")
    val e = -isPos / 4
    val mag =
      if (e >= 0) left << e
      else {
        val d = 1L << -e
        require(left % d == 0,
          s"aac: $left not divisible by 2^${-e} (off the exact grid)")
        left / d
      }
    val s = (if (inPhase) 1 else -1) * (if (invert) -1 else 1)
    s * mag
  }

  /** §9.2 requantization on the integer-exact regime: |q| = c³ and
    * sf = 100 + 4e → x = sign·c⁴·2^e. */
  def requantExact(q: Int, sf: Int): Long = {
    val m = math.abs(q)
    val c = math.round(math.cbrt(m.toDouble)).toInt
    require(c * c * c == m,
      s"aac: $q is not a perfect cube (the exact-integer regime)")
    val e = sf - 100
    require(e >= 0 && e % 4 == 0,
      s"aac: scalefactor $sf off the 100 + 4e exact grid")
    val mag = c.toLong * c * c * c << (e / 4)
    if (q < 0) -mag else mag
  }

  private def writeIcsInfo(w: BitWriter, info: IcsInfo): Unit = {
    w.writeBits(0L, 1) // ics_reserved_bit
    w.writeBits(info.windowSequence.toLong, 2)
    w.writeBits(info.windowShape.toLong, 1)
    if (info.short) {
      w.writeBits(info.maxSfb.toLong, 4)
      w.writeBits(info.scaleFactorGrouping.toLong, 7)
    } else {
      w.writeBits(info.maxSfb.toLong, 6)
      w.writeBits(0L, 1) // predictor_data_present (LC: none)
    }
  }

  private def readIcsInfo(r: BitReader): IcsInfo = {
    require(r.readBits(1) == 0L, "aac: ics_reserved_bit set")
    val ws = r.readBits(2).toInt
    val shape = r.readBits(1).toInt
    if (ws == 2) {
      val maxSfb = r.readBits(4).toInt
      val grouping = r.readBits(7).toInt
      IcsInfo(ws, shape, maxSfb, grouping)
    } else {
      val maxSfb = r.readBits(6).toInt
      require(r.readBits(1) == 0L,
        "aac: predictor_data_present out of the LC profile (loud)")
      IcsInfo(ws, shape, maxSfb, 0)
    }
  }

  private def writeIcs(w: BitWriter, ics: AacIcs, p: Profile): Unit =
    writeIcsParts(w, ics, withInfo = true, p)

  private def readIcs(r: BitReader, p: Profile): AacIcs =
    readIcsParts(r, None, p)

  /** §6.3.1 raw_data_block elements: the block is a SEQUENCE of
    * syntactic elements closed by END — one SCE for mono, one CPE for
    * stereo, and MIXES of them for multi-program layouts (5.1 ships
    * SCE + CPE + CPE + LFE; this leg covers the SCE/CPE loop). */
  sealed trait Element extends Serializable
  final case class SceEl(tag: Int, ics: AacIcs) extends Element
  final case class CpeEl(tag: Int, left: AacIcs, right: AacIcs,
      msMaskPresent: Int, msUsed: Vector[Vector[Boolean]]) extends Element

  /** Mux an arbitrary §6.3.1 element sequence + END + alignment. */
  def muxElements(els: Seq[Element],
      p: Profile = Profile.StandIn): Array[Byte] = {
    require(els.nonEmpty, "aac: empty raw_data_block")
    val w = new BitWriter
    els.foreach {
      case SceEl(tag, ics) =>
        require(tag >= 0 && tag < 16, "aac: element_instance_tag")
        require(!ics.hasIntensity,
          "aac: intensity codebooks live in a CPE's right channel")
        w.writeBits(0L, 3)
        w.writeBits(tag.toLong, 4)
        writeIcs(w, ics, p)
      case CpeEl(tag, left, right, msp, ms) =>
        require(tag >= 0 && tag < 16, "aac: element_instance_tag")
        require(left.info == right.info,
          "aac: common_window CPE shares one ics_info")
        require(!left.hasIntensity,
          "aac: intensity codebooks are right-channel only")
        require(msp >= 0 && msp <= 2, "aac: ms_mask_present")
        w.writeBits(1L, 3)
        w.writeBits(tag.toLong, 4)
        w.writeBits(1L, 1) // common_window
        writeIcsInfo(w, left.info)
        w.writeBits(msp.toLong, 2)
        if (msp == 1) {
          require(ms.length == left.info.groupLens.length &&
            ms.forall(_.length == left.info.maxSfb),
            "aac: ms_used is per (group, sfb)")
          ms.foreach(_.foreach(b => w.writeBits(if (b) 1L else 0L, 1)))
        }
        writeIcsBody(w, left, p); writeIcsBody(w, right, p)
    }
    w.writeBits(7L, 3) // END
    w.toBytes
  }

  /** Walk a raw_data_block's element loop back until END. */
  def demuxElements(payload: Array[Byte],
      p: Profile = Profile.StandIn): Seq[Element] = {
    val r = new BitReader(payload, 0, payload.length)
    val out = Seq.newBuilder[Element]
    var done = false
    while (!done) {
      r.readBits(3) match {
        case 0L =>
          val tag = r.readBits(4).toInt
          val ics = readIcs(r, p)
          require(!ics.hasIntensity,
            "aac: intensity codebooks live in a CPE's right channel")
          out += SceEl(tag, ics)
        case 1L =>
          val tag = r.readBits(4).toInt
          require(r.readBits(1) == 1L,
            "aac: this leg reads common_window CPEs")
          val info = readIcsInfo(r)
          val msp = r.readBits(2).toInt
          require(msp <= 2, "aac: ms_mask_present 3 is reserved")
          val msUsed =
            if (msp == 1) info.groupLens.indices.toVector.map(_ =>
              Vector.fill(info.maxSfb)(r.readBits(1) == 1L))
            else Vector.empty[Vector[Boolean]]
          val left = readIcsBody(r, info, p)
          val right = readIcsBody(r, info, p)
          require(!left.hasIntensity,
            "aac: intensity codebooks are right-channel only")
          out += CpeEl(tag, left, right, msp, msUsed)
        case 7L => done = true
        case other => throw new IllegalArgumentException(
          s"aac: element id $other out of this leg's scope " +
            "(CCE/LFE/DSE/PCE/FIL)")
      }
    }
    out.result()
  }

  /** One raw_data_block carrying a single_channel_element + END,
    * byte-aligned (§6.3.1) — the payload of one ADTS frame. */
  def muxSce(ics: AacIcs, tag: Int = 0,
      p: Profile = Profile.StandIn): Array[Byte] = {
    require(tag >= 0 && tag < 16, "aac: element_instance_tag")
    require(!ics.hasIntensity,
      "aac: intensity codebooks live in a CPE's right channel (§12.2)")
    val w = new BitWriter
    w.writeBits(0L, 3) // id_syn_ele = SCE
    w.writeBits(tag.toLong, 4)
    writeIcs(w, ics, p)
    w.writeBits(7L, 3) // id_syn_ele = END
    w.toBytes // BitWriter zero-pads to the byte boundary
  }

  def demuxSce(payload: Array[Byte],
      p: Profile = Profile.StandIn): (Int, AacIcs) = {
    val r = new BitReader(payload, 0, payload.length)
    require(r.readBits(3) == 0L, "aac: expected a single_channel_element")
    val tag = r.readBits(4).toInt
    val ics = readIcs(r, p)
    require(!ics.hasIntensity,
      "aac: intensity codebooks live in a CPE's right channel (§12.2)")
    require(r.readBits(3) == 7L, "aac: expected the END element")
    (tag, ics)
  }

  /** A channel_pair_element raw_data_block (§6.3.1, id 1):
    * common_window = 1 shares one ics_info and carries the §6.3.2
    * ms_mask_present(2) + per-(group, sfb) ms_used bits — the M/S
    * matrix of §11 (x_l = (m+s)/2... the 13818-7 form is mid =
    * (l+r)/2, side = (l−r)/2; reconstruction l = m+s, r = m−s is
    * integer-EXACT, unlike MP3's √2 convention). Both channels'
    * individual_channel_streams follow. */
  def muxCpe(left: AacIcs, right: AacIcs, msUsed: Vector[Vector[Boolean]],
      msMaskPresent: Int, tag: Int = 0,
      p: Profile = Profile.StandIn): Array[Byte] = {
    require(tag >= 0 && tag < 16, "aac: element_instance_tag")
    require(left.info == right.info,
      "aac: common_window CPE shares one ics_info")
    require(!left.hasIntensity,
      "aac: intensity codebooks are right-channel only (§12.2)")
    require(msMaskPresent >= 0 && msMaskPresent <= 2,
      "aac: ms_mask_present is 0 (none), 1 (per-band), 2 (all)")
    val w = new BitWriter
    w.writeBits(1L, 3) // id_syn_ele = CPE
    w.writeBits(tag.toLong, 4)
    w.writeBits(1L, 1) // common_window
    writeIcsInfo(w, left.info)
    w.writeBits(msMaskPresent.toLong, 2)
    if (msMaskPresent == 1) {
      val g = left.info.groupLens
      require(msUsed.length == g.length &&
        msUsed.forall(_.length == left.info.maxSfb),
        "aac: ms_used is per (group, sfb)")
      msUsed.foreach(_.foreach(b => w.writeBits(if (b) 1L else 0L, 1)))
    }
    writeIcsBody(w, left, p); writeIcsBody(w, right, p)
    w.writeBits(7L, 3)
    w.toBytes
  }

  def demuxCpe(payload: Array[Byte],
      p: Profile = Profile.StandIn)
      : (Int, AacIcs, AacIcs, Int, Vector[Vector[Boolean]]) = {
    val r = new BitReader(payload, 0, payload.length)
    require(r.readBits(3) == 1L, "aac: expected a channel_pair_element")
    val tag = r.readBits(4).toInt
    require(r.readBits(1) == 1L,
      "aac: this leg reads common_window CPEs")
    val info = readIcsInfo(r)
    val msp = r.readBits(2).toInt
    require(msp <= 2, "aac: ms_mask_present 3 is reserved")
    val msUsed =
      if (msp == 1) info.groupLens.indices.toVector.map(_ =>
        Vector.fill(info.maxSfb)(r.readBits(1) == 1L))
      else Vector.empty
    val left = readIcsBody(r, info, p)
    val right = readIcsBody(r, info, p)
    require(!left.hasIntensity,
      "aac: intensity codebooks are right-channel only (§12.2)")
    require(r.readBits(3) == 7L, "aac: expected the END element")
    (tag, left, right, msp, msUsed)
  }

  /** §11.3 M/S reconstruction — 13818-7's matrix is integer-exact:
    * l = m + s, r = m − s (mid/side were (l±r)/2). */
  def msReconstruct(m: Long, s: Long): (Long, Long) = (m + s, m - s)

  // ICS without the leading ics_info (CPE shares the info; each
  // channel still carries its own global_gain + section data)
  private def writeIcsBody(w: BitWriter, ics: AacIcs,
      p: Profile): Unit =
    writeIcsParts(w, ics, withInfo = false, p)
  private def readIcsBody(r: BitReader, info: IcsInfo,
      p: Profile): AacIcs =
    readIcsParts(r, Some(info), p)

  private def writeIcsParts(w: BitWriter, ics: AacIcs,
      withInfo: Boolean, p: Profile): Unit = {
    ics.validateShapes(p)
    w.writeBits(ics.globalGain.toLong, 8)
    if (withInfo) writeIcsInfo(w, ics.info)
    writeIcsAfterInfo(w, ics, p)
  }
  private def readIcsParts(r: BitReader,
      shared: Option[IcsInfo], p: Profile): AacIcs = {
    val gg = r.readBits(8).toInt
    val info = shared.getOrElse(readIcsInfo(r))
    readIcsAfterInfo(r, gg, info, p)
  }

  private def writeIcsAfterInfo(w: BitWriter, ics: AacIcs,
      p: Profile): Unit = {
    val lenBits = if (ics.info.short) 3 else 5
    val esc = (1 << lenBits) - 1
    ics.sections.foreach(_.foreach { s =>
      w.writeBits(s.cb.toLong, 4)
      var len = s.end - s.start
      while (len >= esc) { w.writeBits(esc.toLong, lenBits); len -= esc }
      w.writeBits(len.toLong, lenBits)
    })
    ics.dpcm.foreach(_.foreach { d =>
      require(d >= -128 && d <= 127, s"aac: dpcm_sf $d beyond 8 bits")
      w.writeBits((d & 0xff).toLong, 8)
    })
    w.writeBits(0L, 1) // pulse_data_present
    if (ics.info.short) ics.tnsShort match {
      case Some(wins) =>
        // short form [§6.3.2]: per window n_filt is ONE bit, then
        // coef_res(1), length(4), order(3) for the present filter
        w.writeBits(1L, 1)
        wins.foreach {
          case Some(f) =>
            w.writeBits(1L, 1)
            w.writeBits(f.coefRes.toLong, 1)
            w.writeBits(f.length.toLong, 4)
            w.writeBits(f.order.toLong, 3)
            if (f.order > 0) {
              w.writeBits(f.direction.toLong, 1)
              w.writeBits(f.compress.toLong, 1)
              f.coefs.foreach(c => w.writeBits(c.toLong, f.coefBits))
            }
          case None => w.writeBits(0L, 1)
        }
      case None => w.writeBits(0L, 1)
    } else ics.tns match {
      case Some(filters) =>
        w.writeBits(1L, 1)
        w.writeBits(filters.length.toLong, 2)
        if (filters.nonEmpty) w.writeBits(filters.head.coefRes.toLong, 1)
        filters.foreach { f =>
          w.writeBits(f.length.toLong, 6)
          w.writeBits(f.order.toLong, 5)
          if (f.order > 0) {
            w.writeBits(f.direction.toLong, 1)
            w.writeBits(f.compress.toLong, 1)
            f.coefs.foreach(c => w.writeBits(c.toLong, f.coefBits))
          }
        }
      case None => w.writeBits(0L, 1)
    }
    w.writeBits(0L, 1) // gain_control_data_present
    // spectral data: ZERO, NOISE and INTENSITY sections carry none
    ics.sections.zipWithIndex.foreach { case (ss, gi) =>
      ss.withFilter(s => s.cb != 0 && !s.intensity && !s.noise)
        .foreach { s =>
        (s.start until s.end).foreach { sfb =>
          ics.spectral(gi)(sfb).grouped(cbDim(s.cb))
            .foreach(t => CbSeam.writeTupleWith(w, s.cb, t, p))
        }
      }
    }
  }

  private def readIcsAfterInfo(r: BitReader, gg: Int,
      info: IcsInfo, p: Profile): AacIcs = {
    info.validate(p)
    val lenBits = if (info.short) 3 else 5
    val esc = (1 << lenBits) - 1
    val groups = info.groupLens
    val sections = groups.indices.toVector.map { _ =>
      val ss = Vector.newBuilder[Section]
      var k = 0
      while (k < info.maxSfb) {
        val cb = r.readBits(4).toInt
        var len = 0
        var incr = r.readBits(lenBits).toInt
        while (incr == esc) { len += esc; incr = r.readBits(lenBits).toInt }
        len += incr
        require(len > 0 && k + len <= info.maxSfb,
          s"aac: section [$k, ${k + len}) overruns max_sfb ${info.maxSfb}")
        ss += Section(cb, k, k + len)
        k += len
      }
      ss.result()
    }
    def cbOf(gi: Int, w: Int): Int =
      sections(gi).find(s => w >= s.start && w < s.end).get.cb
    val dpcm = groups.indices.toVector.map { gi =>
      (0 until info.maxSfb).toVector.withFilter(cbOf(gi, _) != 0)
        .map { _ =>
          val raw = r.readBits(8).toInt
          if (raw >= 128) raw - 256 else raw
        }
    }
    require(r.readBits(1) == 0L,
      "aac: pulse_data out of this leg's scope (loud)")
    val (tns, tnsShort) =
      if (r.readBits(1) != 1L) (None, None)
      else if (info.short) {
        val wins = Vector.fill(8) {
          if (r.readBits(1) == 1L) { // n_filt (1 bit, short form)
            val coefRes = r.readBits(1).toInt
            val length = r.readBits(4).toInt
            val order = r.readBits(3).toInt
            Some(if (order > 0) {
              val dir = r.readBits(1).toInt
              val comp = r.readBits(1).toInt
              val coefs = Vector.fill(order)(
                r.readBits(coefRes + 3 - comp).toInt)
              TnsFilter(coefRes, length, order, dir, comp, coefs)
            } else TnsFilter(coefRes, length, 0, 0, 0, Vector.empty))
          } else None
        }
        (None, Some(wins))
      } else {
        val nFilt = r.readBits(2).toInt
        val coefRes = if (nFilt > 0) r.readBits(1).toInt else 0
        (Some(Vector.fill(nFilt) {
          val length = r.readBits(6).toInt
          val order = r.readBits(5).toInt
          if (order > 0) {
            val dir = r.readBits(1).toInt
            val comp = r.readBits(1).toInt
            val coefs = Vector.fill(order)(
              r.readBits(coefRes + 3 - comp).toInt)
            TnsFilter(coefRes, length, order, dir, comp, coefs)
          } else TnsFilter(coefRes, length, 0, 0, 0, Vector.empty)
        }), None)
      }
    require(r.readBits(1) == 0L,
      "aac: gain_control_data out of the LC profile (loud)")
    val spectral = groups.indices.toVector.map { gi =>
      (0 until info.maxSfb).toVector.map { sfb =>
        val cb = cbOf(gi, sfb)
        if (cb == 0 || cb >= 13) Vector.empty[Int]
        else {
          val want = info.sfbWidthWith(sfb, groups(gi), p)
          require(want % cbDim(cb) == 0,
            s"aac: sfb width $want not a multiple of dim ${cbDim(cb)}")
          (0 until want / cbDim(cb))
            .flatMap(_ => CbSeam.readTupleWith(r, cb, p)).toVector
        }
      }
    }
    AacIcs(gg, info, sections, dpcm, tns, spectral, tnsShort)
  }
}
