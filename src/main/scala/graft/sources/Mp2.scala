package graft.sources

import graft.sources.Flac.{BitReader, BitWriter}

/** MPEG-1 Audio Layer II frame codec at the SUBBAND level (ISO/IEC
  * 11172-3 §2.4; the reference decodes mp2/mp3 through libav,
  * streamtasks/media/codec.py:50-135) — the decode leg under p15's
  * frame INDEX: where p15 walks headers, this packs and recovers the
  * actual subband payload (bit allocation, scfsi scalefactor sharing,
  * the 6-bit scalefactor indices, and the quantized subband codes
  * with Layer II's distinctive GROUPING — 3 samples of a 3/5/9-level
  * quantizer packed radix-style into one 5/7/10-bit code), plus the
  * 32-subband synthesis MATRIXING stage, integer-exact through p05's
  * quantized-twiddle trick.
  *
  * NORMATIVE here (section in brackets): the header layout with the
  * Layer II bitrate table {32..384} and frame arithmetic
  * 144·bitrate/rate + padding [§2.4.2.3, Table 3-B.1]; the body
  * ORDER — allocation for every subband, then scfsi per allocated
  * subband, then scalefactors, then GRANULE-MAJOR sample codes
  * [§2.4.1.6/§2.4.2.4]; scfsi semantics (0→3 stored scalefactors,
  * 1 and 3→2 shared across the 12-granule thirds, 2→1) [§2.4.2.4];
  * the 2^n−1 quantization ladder and the radix grouping
  * c = s0 + L·(s1 + L·s2) for L ∈ {3,5,9} [§2.4.3.3, Table 3-B.4];
  * the synthesis matrixing V(i) = Σ_k cos((16+i)(2k+1)π/64)·S(k)
  * [§2.4.3.2].
  *
  * Documented STAND-INS/SEAMS (appendix DATA the zero-egress sandbox
  * has no copy of — the same seam class as Vp8's probability tables),
  * INJECTABLE via [[Profile]] (JSON:
  * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
  * the per-subband allocation TABLES (3-B.2a..d: which quantizers each
  * subband may use at each bitrate, with 2/3/4-bit allocation fields)
  * default to a uniform 4-bit allocation field over sblimit = 30
  * subbands — an injected profile supplies the real per-subband
  * widths, sblimit and quantizer rows; the dequantization C/D
  * constants use the midrise formula (2c + 1 − L)/(L + 1) instead of
  * Table 3-B.4's values; the 512-tap synthesis WINDOW values (Table
  * 3-B.3) are a deterministic stand-in ([[Window]]), swappable
  * through the same profile. The synthesis STRUCTURE past matrixing —
  * §2.4.3.2's V shift register, the V→U map, W = U·D windowing and
  * the 16-term output sum — is fully implemented ([[Synth]],
  * integer-exact, the p20 oracle and Mp2Spec pin it). */
object Mp2 {

  val Sblimit = 30
  /** Layer II bitrate table, kbps (Table 3-B.1 column II). */
  val BitratesL2: Vector[Int] = Vector(0, 32, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 384)
  val Rates: Vector[Int] = Vector(44100, 48000, 32000)
  /** Quantization ladder: allocation index q → step count. The 3/5/9
    * entries are the GROUPED quantizers; the rest are 2^n−1 midrise.
    * (Capped at 2047 so any all-subbands allocation still fits a
    * 384 kbps frame — a fixture bound, not a spec one.) */
  val Levels: Vector[Int] = Vector(0, 3, 5, 7, 9, 15, 31, 63, 127, 255,
    511, 1023, 2047)

  /** Stored-scalefactor count per scfsi pattern [§2.4.2.4]. */
  def nsfStored(scfsi: Int): Int = scfsi match {
    case 0 => 3
    case 2 => 1
    case 1 | 3 => 2
    case other => throw new IllegalArgumentException(s"mp2: scfsi $other")
  }

  /** Bits for one GRANULE (3 samples) of a q-allocated subband:
    * grouped 5/7/10 for L ∈ {3,5,9}, else 3·log2(L+1). */
  def granuleBits(q: Int): Int = granuleBitsOf(Levels(q))
  /** [[granuleBits]] by step COUNT — the profile-injectable form
    * (real Table 3-B.4 rows are 2^n−1 plus the grouped 3/5/9). */
  def granuleBitsOf(l: Int): Int = l match {
    case 0 => 0
    case 3 => 5
    case 5 => 7
    case 9 => 10
    case _ =>
      require(Integer.bitCount(l + 1) == 1 && l > 1,
        s"mp2: ungrouped quantizer needs 2^n - 1 steps, got $l")
      3 * (31 - Integer.numberOfLeadingZeros(l + 1))
  }

  /** One subband's coded content: allocation index q (0 = silent),
    * scfsi, the STORED scalefactor indices (length nsfStored(scfsi)),
    * and 36 sample codes in [0, Levels(q)) — all empty when q == 0. */
  final case class Mp2Sub(q: Int, scfsi: Int, sf: Array[Int],
      samples: Array[Int]) {
    require(q >= 0 && q < 16, s"mp2: allocation $q beyond 4 bits")
    if (q == 0) require(sf.isEmpty && samples.isEmpty,
      "mp2: silent subband with payload")
    else {
      require(scfsi >= 0 && scfsi <= 3, s"mp2: scfsi $scfsi")
      require(sf.length == nsfStored(scfsi),
        s"mp2: ${sf.length} scalefactors for scfsi $scfsi")
      require(sf.forall(v => v >= 0 && v < 63), "mp2: scalefactor index")
      require(samples.length == 36, s"mp2: ${samples.length} samples")
      // the exact level bound is the ACTIVE quantizer table's
      // (ladder or injected Profile) — enforced at mux/demux, where
      // the table is known; here only the structural 16-bit bound
      require(samples.forall(s => s >= 0 && s < 65536),
        "mp2: sample code beyond 16 bits")
    }
  }

  final case class Mp2FrameData(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, subs: Array[Mp2Sub]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp2: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp2: rate index")
    require(subs.length == Sblimit, s"mp2: ${subs.length} subbands")
    def frameLen: Int =
      144 * BitratesL2(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0)
    def bodyBits: Int = subs.map(s => 4 + (if (s.q == 0) 0
      else 2 + 6 * nsfStored(s.scfsi) + 12 * granuleBits(s.q))).sum
    /** [[bodyBits]] under an injected allocation/quantizer table set:
      * per-subband field widths, table-row step counts. */
    def bodyBitsWith(p: Profile): Int =
      subs.take(p.sblimit).zipWithIndex.map { case (su, sb) =>
        p.allocBits(sb) + (if (su.q == 0) 0
        else 2 + 6 * nsfStored(su.scfsi) +
          12 * granuleBitsOf(p.levels(sb, su.q)))
      }.sum
  }

  /** The INJECTABLE table set behind Layer II's appendix-data seams
    * (same class as [[graft.functions.Vp8.Profile]]; JSON:
    * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
    *
    *  - `window` — the 512-tap synthesis window of Table 3-B.3
    *    ([[Synth]]/[[impulseKernels]] already take it by value);
    *  - `allocBits` — per-subband allocation FIELD WIDTHS (the real
    *    Tables 3-B.2a–d use 4/3/2-bit fields by subband; the table's
    *    length IS sblimit ≤ 30 — subbands past it carry no bits);
    *  - `quantLevels` — per-subband rows mapping allocation index →
    *    quantizer step count (Table 3-B.2's cell values out of Table
    *    3-B.4: the grouped 3/5/9 plus 2^n − 1 midrise), index 0 =
    *    silent.
    *
    * The MONO mux/demux pair and the synthesis path honor an injected
    * profile; the stereo/L1 legs keep the stand-in uniform-4-bit
    * tables (the seam there is the identical value swap). */
  final case class Profile(window: Array[Int], allocBits: Array[Int],
      quantLevels: Array[Array[Int]]) {
    require(window.length == 512,
      s"mp2 profile: 512 window taps, got ${window.length}")
    val sblimit: Int = allocBits.length
    require(sblimit >= 1 && sblimit <= Sblimit,
      s"mp2 profile: sblimit $sblimit beyond $Sblimit")
    require(allocBits.forall(b => b >= 2 && b <= 4),
      "mp2 profile: allocation fields are 2-4 bits (Tables 3-B.2)")
    require(quantLevels.length == sblimit,
      "mp2 profile: one quantizer row per subband")
    quantLevels.zipWithIndex.foreach { case (row, sb) =>
      require(row.nonEmpty && row(0) == 0 &&
        row.length <= (1 << allocBits(sb)),
        s"mp2 profile: subband $sb row must start silent and fit " +
          s"the ${allocBits(sb)}-bit field")
      require(row.drop(1).forall(l => l >= 2),
        s"mp2 profile: subband $sb quantizer steps must be >= 2")
      row.drop(1).foreach(granuleBitsOf) // validates 3/5/9 or 2^n-1
    }
    def levels(sb: Int, q: Int): Int = {
      require(q < quantLevels(sb).length,
        s"mp2: allocation $q beyond subband $sb's quantizer row")
      quantLevels(sb)(q)
    }
  }
  object Profile {
    /** The stand-in: uniform 4-bit allocation over all 30 subbands,
      * every subband on the [[Levels]] ladder, [[Window]] taps —
      * bit-identical to the historic layout. */
    val StandIn: Profile = Profile(Window,
      Array.fill(Sblimit)(4), Array.fill(Sblimit)(Levels.toArray))
  }

  def mux(frames: Seq[Mp2FrameData],
      p: Profile = Profile.StandIn): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + (f.bodyBitsWith(p) + 7) / 8 <= f.frameLen,
        s"mp2: body ${f.bodyBitsWith(p)} bits overruns the " +
          s"${f.frameLen}-byte " +
          "frame — lower the allocations or raise the bitrate index")
      f.subs.drop(p.sblimit).foreach(s => require(s.q == 0,
        s"mp2: subband beyond the profile's sblimit ${p.sblimit} " +
          "must be silent"))
      // header: sync(11) version 11 layer 10 protection 1 |
      // bitrate(4) rate(2) pad(1) priv(1) | mode 11 (mono) + zeros
      out.write(0xFF); out.write(0xFD)
      out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
        (if (f.padding) 2 else 0))
      out.write(0xC0)
      val w = new BitWriter
      val active = f.subs.take(p.sblimit)
      active.zipWithIndex.foreach { case (su, sb) =>
        require(su.q < (1 << p.allocBits(sb)) &&
          su.q < p.quantLevels(sb).length,
          s"mp2: allocation ${su.q} beyond subband $sb's table")
        w.writeBits(su.q.toLong, p.allocBits(sb))
      }
      active.foreach(s => if (s.q > 0) w.writeBits(s.scfsi.toLong, 2))
      active.foreach(s => if (s.q > 0)
        s.sf.foreach(v => w.writeBits(v.toLong, 6)))
      var g = 0
      while (g < 12) { // granule-major, §2.4.2.4's sample order
        active.zipWithIndex.foreach { case (su, sb) =>
          if (su.q > 0) {
            val l = p.levels(sb, su.q)
            val (s0, s1, s2) =
              (su.samples(3 * g), su.samples(3 * g + 1),
                su.samples(3 * g + 2))
            require(s0 < l && s1 < l && s2 < l,
              s"mp2: sample code beyond $l levels in subband $sb")
            if (l == 3 || l == 5 || l == 9)
              w.writeBits((s0 + l * (s1 + l * s2)).toLong,
                granuleBitsOf(l))
            else {
              val nb = granuleBitsOf(l) / 3
              w.writeBits(s0.toLong, nb)
              w.writeBits(s1.toLong, nb)
              w.writeBits(s2.toLong, nb)
            }
          }
        }
        g += 1
      }
      val body = w.toBytes
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      while (stuff > 0) { out.write(0); stuff -= 1 } // byte stuffing
    }
    out.toByteArray
  }

  /** Walk a Layer II stream back: offsets + full subband recovery.
    * Every header field, allocation, code range and frame boundary is
    * validated loudly. */
  def demux(bytes: Array[Byte],
      p: Profile = Profile.StandIn): Seq[(Long, Mp2FrameData)] = {
    val out = Seq.newBuilder[(Long, Mp2FrameData)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp2: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFD,
        s"mp2: lost sync at $pos (MPEG-1 Layer II no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp2: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp2: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      require((bytes(pos + 3) & 0xc0) == 0xc0, s"mp2: not mono at $pos")
      val fl = 144 * BitratesL2(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
      require(pos + fl <= bytes.length,
        s"mp2: frame length $fl overruns the stream at $pos")
      val r = new BitReader(bytes, pos + 4, pos + fl)
      val qs = Array.tabulate(Sblimit)(sb =>
        if (sb < p.sblimit) r.readBits(p.allocBits(sb)).toInt else 0)
      qs.zipWithIndex.foreach { case (q, sb) =>
        require(sb >= p.sblimit || q < p.quantLevels(sb).length,
          s"mp2: allocation $q beyond subband $sb's table at $pos")
      }
      val scfsis = qs.map(q => if (q > 0) r.readBits(2).toInt else 0)
      val sfs = qs.indices.map { sb =>
        if (qs(sb) > 0)
          Array.fill(nsfStored(scfsis(sb)))(r.readBits(6).toInt)
        else Array.empty[Int]
      }
      val samples = qs.map(q => if (q > 0) new Array[Int](36)
        else Array.empty[Int])
      var g = 0
      while (g < 12) {
        var sb = 0
        while (sb < p.sblimit) {
          val q = qs(sb)
          if (q > 0) {
            val l = p.levels(sb, q)
            if (l == 3 || l == 5 || l == 9) {
              var c = r.readBits(granuleBitsOf(l)).toInt
              require(c < l * l * l,
                s"mp2: grouped code $c beyond $l^3 at $pos")
              samples(sb)(3 * g) = c % l; c /= l
              samples(sb)(3 * g + 1) = c % l
              samples(sb)(3 * g + 2) = c / l
            } else {
              val nb = granuleBitsOf(l) / 3
              var x = 0
              while (x < 3) {
                val c = r.readBits(nb).toInt
                require(c < l, s"mp2: code $c beyond $l levels at $pos")
                samples(sb)(3 * g + x) = c
                x += 1
              }
            }
          }
          sb += 1
        }
        g += 1
      }
      val subs = qs.indices.map(sb => Mp2Sub(qs(sb),
        if (qs(sb) > 0) scfsis(sb) else 0, sfs(sb), samples(sb))).toArray
      out += ((pos.toLong, Mp2FrameData(bi, ri, pad, subs)))
      pos += fl
    }
    out.result()
  }

  // ---- Layer II STEREO [§2.4.1.5/§2.4.1.6] -------------------------------------

  /** A two-channel Layer II frame: mode 0 = stereo, 1 = joint stereo
    * (Layer II's INTENSITY form), 2 = dual channel (3 = mono rides
    * [[Mp2FrameData]]). In joint mode the §2.4.1.6 BOUND =
    * 4 + 4·mode_extension splits the subbands: below it everything is
    * per-channel; at/above it ONE allocation and ONE set of sample
    * codes are shared while each channel keeps its OWN scalefactors —
    * the intensity mechanism. `subs(ch)(sb)`; joint subbands must
    * agree on q/samples across channels (the mux writes them once,
    * the demux duplicates them back). */
  final case class Mp2StereoFrame(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, mode: Int, modeExt: Int,
      subs: Array[Array[Mp2Sub]]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp2: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp2: rate index")
    require(mode >= 0 && mode <= 2,
      "mp2: stereo modes are 0/1/2 (mono rides Mp2FrameData)")
    require(modeExt >= 0 && modeExt <= 3 && (mode == 1 || modeExt == 0),
      "mp2: mode_extension is joint-stereo only")
    require(subs.length == 2 && subs.forall(_.length == Sblimit),
      "mp2: 2 × sblimit subbands")
    /** First shared subband: §2.4.1.6's bound (sblimit when the
      * channels are fully independent). */
    def bound: Int = if (mode == 1) 4 + 4 * modeExt else Sblimit
    (bound until Sblimit).foreach { sb =>
      require(subs(0)(sb).q == subs(1)(sb).q,
        s"mp2: joint subband $sb disagrees on allocation")
      require(subs(0)(sb).samples.sameElements(subs(1)(sb).samples),
        s"mp2: joint subband $sb disagrees on shared sample codes")
    }
    def frameLen: Int =
      144 * BitratesL2(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0)
    def bodyBits: Int = {
      val alloc = 4 * (2 * bound + (Sblimit - bound))
      val perCh = (0 until Sblimit).map { sb =>
        (0 until 2).map { ch =>
          val s = subs(ch)(sb)
          if (s.q == 0) 0 else 2 + 6 * nsfStored(s.scfsi)
        }.sum
      }.sum
      val codes = (0 until Sblimit).map { sb =>
        val q = subs(0)(sb).q
        val qq1 = subs(1)(sb).q
        if (sb < bound) 12 * ((if (q > 0) granuleBits(q) else 0) +
          (if (qq1 > 0) granuleBits(qq1) else 0))
        else if (q > 0) 12 * granuleBits(q) else 0
      }.sum
      alloc + perCh + codes
    }
  }

  /** Pack two-channel Layer II frames (§2.4.1.6 field order:
    * per-channel allocation below the bound, shared at/above it;
    * scfsi and scalefactors per (subband, channel); granule-major
    * codes, shared above the bound). */
  def muxStereo(frames: Seq[Mp2StereoFrame]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + (f.bodyBits + 7) / 8 <= f.frameLen,
        s"mp2: stereo body ${f.bodyBits} bits overruns the " +
          s"${f.frameLen}-byte frame")
      out.write(0xFF); out.write(0xFD)
      out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
        (if (f.padding) 2 else 0))
      out.write((f.mode << 6) | (f.modeExt << 4))
      val w = new BitWriter
      val bound = f.bound
      (0 until bound).foreach(sb => (0 until 2).foreach(ch =>
        w.writeBits(f.subs(ch)(sb).q.toLong, 4)))
      (bound until Sblimit).foreach(sb =>
        w.writeBits(f.subs(0)(sb).q.toLong, 4))
      (0 until Sblimit).foreach(sb => (0 until 2).foreach { ch =>
        if (f.subs(ch)(sb).q > 0)
          w.writeBits(f.subs(ch)(sb).scfsi.toLong, 2)
      })
      (0 until Sblimit).foreach(sb => (0 until 2).foreach { ch =>
        if (f.subs(ch)(sb).q > 0)
          f.subs(ch)(sb).sf.foreach(v => w.writeBits(v.toLong, 6))
      })
      def code(w2: BitWriter, s: Mp2Sub, g: Int): Unit = {
        require(s.q < Levels.size,
          s"mp2: stereo allocation ${s.q} beyond the ladder")
        val l = Levels(s.q)
        val (s0, s1, s2) =
          (s.samples(3 * g), s.samples(3 * g + 1), s.samples(3 * g + 2))
        require(s0 < l && s1 < l && s2 < l,
          s"mp2: stereo sample code beyond $l levels")
        if (l == 3 || l == 5 || l == 9)
          w2.writeBits((s0 + l * (s1 + l * s2)).toLong, granuleBits(s.q))
        else {
          val nb = granuleBits(s.q) / 3
          w2.writeBits(s0.toLong, nb)
          w2.writeBits(s1.toLong, nb)
          w2.writeBits(s2.toLong, nb)
        }
      }
      var g = 0
      while (g < 12) {
        (0 until Sblimit).foreach { sb =>
          if (sb < bound)
            (0 until 2).foreach { ch =>
              if (f.subs(ch)(sb).q > 0) code(w, f.subs(ch)(sb), g)
            }
          else if (f.subs(0)(sb).q > 0) code(w, f.subs(0)(sb), g)
        }
        g += 1
      }
      val body = w.toBytes
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      while (stuff > 0) { out.write(0); stuff -= 1 }
    }
    out.toByteArray
  }

  /** Walk a two-channel Layer II stream back; joint subbands read the
    * shared codes once and duplicate them into both channels, each
    * with its own scalefactors. */
  def demuxStereo(bytes: Array[Byte]): Seq[(Long, Mp2StereoFrame)] = {
    val out = Seq.newBuilder[(Long, Mp2StereoFrame)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp2: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFD,
        s"mp2: lost sync at $pos (MPEG-1 Layer II no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp2: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp2: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      val mode = (bytes(pos + 3) >> 6) & 3
      require(mode != 3,
        s"mp2: mono frame at $pos — use demux, not demuxStereo")
      val modeExt = (bytes(pos + 3) >> 4) & 3
      val fl = 144 * BitratesL2(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
      require(pos + fl <= bytes.length,
        s"mp2: frame length $fl overruns the stream at $pos")
      val bound = if (mode == 1) 4 + 4 * modeExt else Sblimit
      val r = new BitReader(bytes, pos + 4, pos + fl)
      val qs = Array.fill(2, Sblimit)(0)
      (0 until bound).foreach(sb => (0 until 2).foreach { ch =>
        qs(ch)(sb) = r.readBits(4).toInt
      })
      (bound until Sblimit).foreach { sb =>
        val q = r.readBits(4).toInt
        qs(0)(sb) = q; qs(1)(sb) = q
      }
      qs.foreach(_.foreach(q => require(q < Levels.size,
        s"mp2: allocation $q beyond the ladder at $pos")))
      val scfsis = Array.tabulate(2, Sblimit)((_, _) => 0)
      (0 until Sblimit).foreach(sb => (0 until 2).foreach { ch =>
        if (qs(ch)(sb) > 0) scfsis(ch)(sb) = r.readBits(2).toInt
      })
      // scalefactors interleave per (subband, channel) like scfsi
      val sfs = Array.fill(2, Sblimit)(Array.empty[Int])
      (0 until Sblimit).foreach(sb => (0 until 2).foreach { ch =>
        if (qs(ch)(sb) > 0)
          sfs(ch)(sb) =
            Array.fill(nsfStored(scfsis(ch)(sb)))(r.readBits(6).toInt)
      })
      val samples = Array.tabulate(2, Sblimit) { (ch, sb) =>
        if (qs(ch)(sb) > 0) new Array[Int](36) else Array.empty[Int]
      }
      def readCode(q: Int, into: Array[Int], g: Int): Unit = {
        val l = Levels(q)
        if (l == 3 || l == 5 || l == 9) {
          var c = r.readBits(granuleBits(q)).toInt
          require(c < l * l * l,
            s"mp2: grouped code $c beyond $l^3 at $pos")
          into(3 * g) = c % l; c /= l
          into(3 * g + 1) = c % l
          into(3 * g + 2) = c / l
        } else {
          val nb = granuleBits(q) / 3
          var x = 0
          while (x < 3) {
            val c = r.readBits(nb).toInt
            require(c < l, s"mp2: code $c beyond $l levels at $pos")
            into(3 * g + x) = c
            x += 1
          }
        }
      }
      var g = 0
      while (g < 12) {
        var sb = 0
        while (sb < Sblimit) {
          if (sb < bound) {
            (0 until 2).foreach { ch =>
              if (qs(ch)(sb) > 0) readCode(qs(ch)(sb), samples(ch)(sb), g)
            }
          } else if (qs(0)(sb) > 0) {
            readCode(qs(0)(sb), samples(0)(sb), g)
            // shared codes: duplicate into the second channel [§2.4.1.6]
            System.arraycopy(samples(0)(sb), 3 * g, samples(1)(sb),
              3 * g, 3)
          }
          sb += 1
        }
        g += 1
      }
      val subs = Array.tabulate(2, Sblimit) { (ch, sb) =>
        Mp2Sub(qs(ch)(sb), if (qs(ch)(sb) > 0) scfsis(ch)(sb) else 0,
          sfs(ch)(sb), samples(ch)(sb))
      }
      out += ((pos.toLong,
        Mp2StereoFrame(bi, ri, pad, mode, modeExt, subs)))
      pos += fl
    }
    out.result()
  }

  // ---- Layer I [§2.4.1.5 / §2.4.2.4] -----------------------------------------
  //
  // Layer I's bitstream layer is FULLY conformant here — unlike Layer
  // II it has no appendix allocation tables: every one of the 32
  // subbands carries a plain 4-bit allocation (0 = silent, a ∈ 1..14 →
  // an (a+1)-bit code with 2^(a+1)−1 levels, 15 forbidden), one 6-bit
  // scalefactor per allocated subband, and 12 samples in sample-major
  // order. Frames are 4-byte slots: len = 4·(12·bitrate/rate + pad).

  /** Layer I bitrate table, kbps (Table 3-B.1 column I). */
  val BitratesL1: Vector[Int] = Vector(0, 32, 64, 96, 128, 160, 192,
    224, 256, 288, 320, 352, 384, 416, 448)

  /** One Layer I subband: allocation a (0 = silent), its scalefactor
    * index and 12 sample codes in [0, 2^(a+1)−1). */
  final case class Mp1Sub(a: Int, sf: Int, samples: Array[Int]) {
    require(a >= 0 && a <= 14, s"mp1: allocation $a (15 is forbidden)")
    if (a == 0) require(sf == 0 && samples.isEmpty,
      "mp1: silent subband with payload")
    else {
      require(sf >= 0 && sf < 63, s"mp1: scalefactor index $sf")
      require(samples.length == 12, s"mp1: ${samples.length} samples")
      val lv = (1 << (a + 1)) - 1
      require(samples.forall(s => s >= 0 && s < lv),
        s"mp1: sample code beyond $lv levels (the all-ones word is " +
          "excluded)")
    }
  }

  final case class Mp1FrameData(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, subs: Array[Mp1Sub]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp1: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp1: rate index")
    require(subs.length == 32, s"mp1: ${subs.length} subbands")
    def frameLen: Int =
      4 * (12 * BitratesL1(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0))
    def bodyBits: Int = 32 * 4 +
      subs.filter(_.a > 0).map(s => 6 + 12 * (s.a + 1)).sum
  }

  /** A two-channel Layer I frame (§2.4.1.5): same modes and joint
    * BOUND = 4 + 4·mode_extension as Layer II — below it everything
    * is per-channel, at/above it ONE allocation and ONE set of 12
    * sample codes are shared while each channel keeps its OWN
    * scalefactor. */
  final case class Mp1StereoFrame(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, mode: Int, modeExt: Int,
      subs: Array[Array[Mp1Sub]]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp1: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp1: rate index")
    require(mode >= 0 && mode <= 2,
      "mp1: stereo modes are 0/1/2 (mono rides Mp1FrameData)")
    require(modeExt >= 0 && modeExt <= 3 && (mode == 1 || modeExt == 0),
      "mp1: mode_extension is joint-stereo only")
    require(subs.length == 2 && subs.forall(_.length == 32),
      "mp1: 2 × 32 subbands")
    def bound: Int = if (mode == 1) 4 + 4 * modeExt else 32
    (bound until 32).foreach { sb =>
      require(subs(0)(sb).a == subs(1)(sb).a,
        s"mp1: joint subband $sb disagrees on allocation")
      require(subs(0)(sb).samples.sameElements(subs(1)(sb).samples),
        s"mp1: joint subband $sb disagrees on shared sample codes")
    }
    def frameLen: Int =
      4 * (12 * BitratesL1(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0))
    def bodyBits: Int =
      4 * (2 * bound + (32 - bound)) +
        subs.map(_.count(_.a > 0) * 6).sum +
        (0 until 32).map { sb =>
          val a0 = subs(0)(sb).a; val a1 = subs(1)(sb).a
          if (sb < bound)
            12 * ((if (a0 > 0) a0 + 1 else 0) +
              (if (a1 > 0) a1 + 1 else 0))
          else if (a0 > 0) 12 * (a0 + 1) else 0
        }.sum
  }

  def muxL1Stereo(frames: Seq[Mp1StereoFrame]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + (f.bodyBits + 7) / 8 <= f.frameLen,
        s"mp1: stereo body ${f.bodyBits} bits overruns the " +
          s"${f.frameLen}-byte frame")
      out.write(0xFF); out.write(0xFF)
      out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
        (if (f.padding) 2 else 0))
      out.write((f.mode << 6) | (f.modeExt << 4))
      val w = new BitWriter
      val bound = f.bound
      (0 until bound).foreach(sb => (0 until 2).foreach(ch =>
        w.writeBits(f.subs(ch)(sb).a.toLong, 4)))
      (bound until 32).foreach(sb =>
        w.writeBits(f.subs(0)(sb).a.toLong, 4))
      (0 until 32).foreach(sb => (0 until 2).foreach { ch =>
        if (f.subs(ch)(sb).a > 0)
          w.writeBits(f.subs(ch)(sb).sf.toLong, 6)
      })
      var s = 0
      while (s < 12) { // sample-major [§2.4.2.4]
        (0 until 32).foreach { sb =>
          if (sb < bound)
            (0 until 2).foreach { ch =>
              val su = f.subs(ch)(sb)
              if (su.a > 0) w.writeBits(su.samples(s).toLong, su.a + 1)
            }
          else {
            val su = f.subs(0)(sb)
            if (su.a > 0) w.writeBits(su.samples(s).toLong, su.a + 1)
          }
        }
        s += 1
      }
      val body = w.toBytes
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      while (stuff > 0) { out.write(0); stuff -= 1 }
    }
    out.toByteArray
  }

  def demuxL1Stereo(bytes: Array[Byte]): Seq[(Long, Mp1StereoFrame)] = {
    val out = Seq.newBuilder[(Long, Mp1StereoFrame)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp1: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFF,
        s"mp1: lost sync at $pos (MPEG-1 Layer I no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp1: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp1: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      val mode = (bytes(pos + 3) >> 6) & 3
      require(mode != 3,
        s"mp1: mono frame at $pos — use demuxL1, not demuxL1Stereo")
      val modeExt = (bytes(pos + 3) >> 4) & 3
      val fl = 4 * (12 * BitratesL1(bi) * 1000 / Rates(ri) +
        (if (pad) 1 else 0))
      require(pos + fl <= bytes.length,
        s"mp1: frame length $fl overruns the stream at $pos")
      val bound = if (mode == 1) 4 + 4 * modeExt else 32
      val r = new BitReader(bytes, pos + 4, pos + fl)
      val as = Array.fill(2, 32)(0)
      (0 until bound).foreach(sb => (0 until 2).foreach { ch =>
        as(ch)(sb) = r.readBits(4).toInt
      })
      (bound until 32).foreach { sb =>
        val a = r.readBits(4).toInt
        as(0)(sb) = a; as(1)(sb) = a
      }
      as.foreach(_.foreach(a => require(a <= 14,
        s"mp1: forbidden allocation 15 at $pos")))
      val sfs = Array.fill(2, 32)(0)
      (0 until 32).foreach(sb => (0 until 2).foreach { ch =>
        if (as(ch)(sb) > 0) sfs(ch)(sb) = r.readBits(6).toInt
      })
      val samples = Array.tabulate(2, 32) { (ch, sb) =>
        if (as(ch)(sb) > 0) new Array[Int](12) else Array.empty[Int]
      }
      var s = 0
      while (s < 12) {
        (0 until 32).foreach { sb =>
          if (sb < bound)
            (0 until 2).foreach { ch =>
              val a = as(ch)(sb)
              if (a > 0) {
                val c = r.readBits(a + 1).toInt
                require(c < (1 << (a + 1)) - 1,
                  s"mp1: all-ones code word at $pos")
                samples(ch)(sb)(s) = c
              }
            }
          else {
            val a = as(0)(sb)
            if (a > 0) {
              val c = r.readBits(a + 1).toInt
              require(c < (1 << (a + 1)) - 1,
                s"mp1: all-ones code word at $pos")
              samples(0)(sb)(s) = c
              samples(1)(sb)(s) = c
            }
          }
        }
        s += 1
      }
      val subs = Array.tabulate(2, 32) { (ch, sb) =>
        Mp1Sub(as(ch)(sb), if (as(ch)(sb) > 0) sfs(ch)(sb) else 0,
          samples(ch)(sb))
      }
      out += ((pos.toLong,
        Mp1StereoFrame(bi, ri, pad, mode, modeExt, subs)))
      pos += fl
    }
    out.result()
  }

  def muxL1(frames: Seq[Mp1FrameData]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + (f.bodyBits + 7) / 8 <= f.frameLen,
        s"mp1: body ${f.bodyBits} bits overruns the ${f.frameLen}-byte " +
          "frame — lower the allocations or raise the bitrate index")
      // header: sync(11) version 11 LAYER 11 protection 1 → 0xFF 0xFF
      out.write(0xFF); out.write(0xFF)
      out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
        (if (f.padding) 2 else 0))
      out.write(0xC0) // mono
      val w = new BitWriter
      f.subs.foreach(s => w.writeBits(s.a.toLong, 4))
      f.subs.foreach(s => if (s.a > 0) w.writeBits(s.sf.toLong, 6))
      var g = 0
      while (g < 12) { // sample-major [§2.4.2.4 Layer I]
        f.subs.foreach(s =>
          if (s.a > 0) w.writeBits(s.samples(g).toLong, s.a + 1))
        g += 1
      }
      val body = w.toBytes
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      while (stuff > 0) { out.write(0); stuff -= 1 }
    }
    out.toByteArray
  }

  def demuxL1(bytes: Array[Byte]): Seq[(Long, Mp1FrameData)] = {
    val out = Seq.newBuilder[(Long, Mp1FrameData)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp1: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFF,
        s"mp1: lost sync at $pos (MPEG-1 Layer I no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp1: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp1: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      require((bytes(pos + 3) & 0xc0) == 0xc0, s"mp1: not mono at $pos")
      val fl = 4 * (12 * BitratesL1(bi) * 1000 / Rates(ri) +
        (if (pad) 1 else 0))
      require(pos + fl <= bytes.length,
        s"mp1: frame length $fl overruns the stream at $pos")
      val r = new BitReader(bytes, pos + 4, pos + fl)
      val as = Array.fill(32)(r.readBits(4).toInt)
      as.foreach(a => require(a < 15, s"mp1: forbidden allocation at $pos"))
      val sfs = as.map(a => if (a > 0) r.readBits(6).toInt else 0)
      val samples = as.map(a => if (a > 0) new Array[Int](12)
        else Array.empty[Int])
      var g = 0
      while (g < 12) {
        var sb = 0
        while (sb < 32) {
          val a = as(sb)
          if (a > 0) {
            val c = r.readBits(a + 1).toInt
            require(c < (1 << (a + 1)) - 1,
              s"mp1: all-ones code word at $pos (forbidden)")
            samples(sb)(g) = c
          }
          sb += 1
        }
        g += 1
      }
      val subs = as.indices.map(sb =>
        Mp1Sub(as(sb), sfs(sb), samples(sb))).toArray
      out += ((pos.toLong, Mp1FrameData(bi, ri, pad, subs)))
      pos += fl
    }
    out.result()
  }

  // ---- synthesis matrixing [§2.4.3.2] ----------------------------------------

  /** Q14-quantized matrixing coefficients (p05's quantized-twiddle
    * trick: the cosine bank becomes integer-exact and replayable). */
  val Matrix: Array[Array[Int]] = Array.tabulate(64, 32)((i, k) =>
    math.round(16384.0 *
      math.cos((16 + i) * (2 * k + 1) * math.Pi / 64)).toInt)

  /** V(i) = Σ_k N(i,k)·S(k): 32 subband samples → the 64-entry V
    * vector (the windowing stage needs Table 3-B.3, see module doc). */
  def matrixing(s: Array[Int]): Array[Long] =
    matrixingL(s.map(_.toLong))
  /** [[matrixing]] over Long inputs (the hybrid filterbank's scale). */
  def matrixingL(s: Array[Long]): Array[Long] = {
    require(s.length == 32, s"mp2: ${s.length} subband samples")
    Array.tabulate(64) { i =>
      var acc = 0L
      var k = 0
      while (k < 32) { acc += Matrix(i)(k).toLong * s(k); k += 1 }
      acc
    }
  }

  /** Midrise code→fraction convention (the spec's C/D constants are
    * Table 3-B.4 data — see module doc): (2c + 1 − L)/(L + 1). */
  def dequant(code: Int, levels: Int): Double =
    (2.0 * code + 1.0 - levels) / (levels + 1.0)

  // ---- synthesis windowing [§2.4.3.2] ------------------------------------------

  /** STAND-IN 512-tap synthesis window (Table 3-B.3 is appendix DATA —
    * the same seam class as the allocation tables; swap in the real
    * coefficients to decode foreign files). Deterministic and
    * SQL-expressible so the p20 oracle can derive its convolution
    * constants from the same values. */
  val Window: Array[Int] = Array.tabulate(512)(p => ((p * 31 + 7) % 127) - 63)

  /** The §2.4.3.2 synthesis FILTERBANK STRUCTURE, which IS normative:
    * a 1024-entry V shift register (shifted by 64 per step, the new
    * matrixing output entering at the front), the V→U index map
    * (U[64i+j] = V[128i+j], U[64i+32+j] = V[128i+96+j] for i in 0..7,
    * j in 0..31), the per-tap windowing W = U·D, and the 16-term
    * output sum S[j] = Σ_i W[j+32i]. Integer-exact end to end: V is
    * Q14 (the [[matrixing]] bank) times raw subband codes, the window
    * is integer, so samples are exact Longs both sides of an oracle.
    * One step consumes ONE sample per subband (a granule is three
    * consecutive steps). */
  final class Synth(window: Array[Int] = Window) {
    require(window.length == 512,
      s"mp2: synthesis window needs 512 taps, got ${window.length}")
    private val v = new Array[Long](1024)
    /** The V shift register as a flat copy (streaming state-store
      * form — [[graft.streaming.Mp3Machine]]). */
    def vFlat: Array[Long] = v.clone()
    def loadV(a: Array[Long]): Unit = {
      require(a.length == 1024, s"mp2: V register is 1024, got ${a.length}")
      System.arraycopy(a, 0, v, 0, 1024)
    }
    /** One filterbank step: 32 subband samples → 32 PCM samples. */
    def step(s: Array[Int]): Array[Long] =
      stepL(s.map(_.toLong))
    /** [[step]] over Long subband samples — the MP3 hybrid
      * filterbank's output scale (Q10 · Q10) rides through here
      * ([[Mp3Pcm.Hybrid]]); same §2.4.3.2 structure, wider input. */
    def stepL(s: Array[Long]): Array[Long] = {
      System.arraycopy(v, 0, v, 64, 960) // V shift by 64 [§2.4.3.2]
      val m = matrixingL(s)
      System.arraycopy(m, 0, v, 0, 64)
      val u = new Array[Long](512)
      var i = 0
      while (i < 8) {
        var j = 0
        while (j < 32) {
          u(64 * i + j) = v(128 * i + j)
          u(64 * i + 32 + j) = v(128 * i + 96 + j)
          j += 1
        }
        i += 1
      }
      val out = new Array[Long](32)
      var jo = 0
      while (jo < 32) {
        var acc = 0L
        var q = 0
        while (q < 16) {
          acc += u(jo + 32 * q) * window(jo + 32 * q); q += 1
        }
        out(jo) = acc
        jo += 1
      }
      out
    }
  }

  /** The p20 oracle's closed form: with an IMPULSE input (only subband
    * 0 nonzero, value x per step), V_g(b) = x_g·M0(b), so the summed
    * PCM output at step g is Σ_{a=0..15} x_{g−a}·KSum(a) and sample 0
    * is Σ_a x_{g−a}·K0(a). Derived here from [[Matrix]] and the
    * window — Mp2Spec pins these against a brute [[Synth]] run, and
    * the p20 SQL embeds the same 2×16 constants. */
  /** Per-SUBBAND summed output kernels: K(sb)(a) = the contribution
    * of ONE unit input in subband sb, a steps ago, to the SUM of the
    * current step's 32 PCM outputs — the p31 oracle composes the MP3
    * hybrid's subband series with these (input at step s contributes
    * Σ_a K(sb)(a) over the steps that exist). Generalizes
    * [[impulseKernels]]'s kSum beyond subband 0. */
  def subbandKernels(window: Array[Int] = Window): Array[Array[Long]] =
    Array.tabulate(32) { sb =>
      Array.tabulate(16) { a =>
        var acc = 0L
        var j = 0
        while (j < 32) {
          val b = if (a % 2 == 0) j else 32 + j
          acc += Matrix(b)(sb).toLong * window(32 * a + j)
          j += 1
        }
        acc
      }
    }

  def impulseKernels(window: Array[Int] = Window): (Array[Long], Array[Long]) = {
    val kSum = Array.tabulate(16) { a =>
      var acc = 0L
      var j = 0
      while (j < 32) {
        val b = if (a % 2 == 0) j else 32 + j
        acc += Matrix(b)(0).toLong * window(32 * a + j)
        j += 1
      }
      acc
    }
    val k0 = Array.tabulate(16) { a =>
      val b = if (a % 2 == 0) 0 else 32
      Matrix(b)(0).toLong * window(32 * a)
    }
    (kSum, k0)
  }
}
