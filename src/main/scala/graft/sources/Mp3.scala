package graft.sources

import graft.sources.Flac.{BitReader, BitWriter}

/** MPEG-1 Audio Layer III STRUCTURAL codec (ISO/IEC 11172-3 §2.4.1.7 /
  * §2.4.2.7; the reference decodes .mp3 through libav,
  * streamtasks/media/codec.py:50-135) — the decode leg under p15's
  * frame index for the most common real-world audio format: where p15
  * walks Layer III headers, this packs and recovers the actual frame
  * payload structure.
  *
  * NORMATIVE here (spec text, not appendix data):
  *  - the header layout with the Layer III bitrate column
  *    {32..320} and the 144·bitrate/rate + padding frame arithmetic;
  *  - the MONO side-info layout (17 bytes): main_data_begin(9),
  *    private_bits(5), scfsi(4 × 1), then per granule
  *    part2_3_length(12), big_values(9), global_gain(8),
  *    scalefac_compress(4), window_switching_flag(1), table_select(3×5),
  *    region0_count(4), region1_count(3), preflag(1),
  *    scalefac_scale(1), count1table_select(1);
  *  - the slen1/slen2 table of §2.4.2.7 (scalefac_compress → stored
  *    scalefactor widths, bands 0–10 at slen1 and 11–20 at slen2 for
  *    long blocks) and the scfsi sharing of granule-0 scalefactors
  *    into granule 1 per 4 scfsi bands (0–5, 6–10, 11–15, 16–20);
  *  - the REGION partitioning of the big_values area: samples
  *    [0, sfbOffset(region0_count+1)) are region 0,
  *    up to sfbOffset(region0_count+region1_count+2) region 1, the
  *    rest of the 2·big_values samples region 2, each with its own
  *    table_select; then the count1 area of (v,w,x,y) quadruples,
  *    consumed until part2_3_length is exhausted (verified EXACTLY);
  *  - per-value SIGN bits following each nonzero decoded magnitude,
  *    and the ESC mechanism (magnitude 15 + linbits extension) for
  *    tables ≥ 16;
  *  - the requantization rule xr = sign·|ix|^(4/3)·2^((global_gain −
  *    210)/4) — [[requantExact]] keeps it integer-exact on
  *    perfect-cube magnitudes and 4-divisible gains, the regime the
  *    p21 oracle pins (the general float path is the same formula).
  *
  * Documented STAND-INS/SEAMS (appendix DATA, same class as Vp8's
  * Profile and Mp2's Window — a value swap, not a code change), ALL
  * INJECTABLE via [[Profile]] (JSON:
  * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
  *  - the HUFFMAN code tables (Tables B.5–B.7): stand-in = fixed
  *    4-bit magnitude fields per value with the real sign/ESC/linbits
  *    STRUCTURE around them ([[HuffSeam]]); an injected table flips
  *    that table to the spec's real PAIR-codeword bit order;
  *  - the scalefactor-band offset table (Table B.8, per sample rate):
  *    stand-in [[SfbOffsets]] i²+i (even, strictly increasing);
  *  - the count1 quadruple code: count1table_select = 1 is the
  *    4-bit-FLC Table B shape (stand-in value mapping); select = 0
  *    takes the injected Table A VLC when present.
  *
  * The BIT RESERVOIR is implemented ([[muxReservoir]] /
  * [[demuxReservoir]]): main_data_begin lets a frame's main data
  * start up to 511 bytes before its own header inside earlier
  * frames' unused slot space — every real encoder's layout; the
  * plain [[demux]] keeps requiring main_data_begin = 0 (use the
  * reservoir walk otherwise, loudly).
  *
  * WINDOW SWITCHING is implemented ([[BlockSplit]]): block_type
  * 1/2/3 with mixed_block_flag and subblock_gain, the short/mixed
  * scalefactor layouts (12 bands × 3 windows / 8 long + 27 short),
  * the FIXED region boundaries of the switching form (region 2
  * empty), and the §2.4.3.4.5 reorder-window map [[shortWindow]]
  * under which subblock_gain shifts the requant gain by 8·sbg
  * (§2.4.3.4.7.1) — still on the exact-integer regime.
  *
  * Subset boundary, loud: [[Mp3FrameData]] is the mono layout;
  * two-channel frames ride [[Mp3StereoFrame]] /
  * [[muxStereo]]/[[demuxStereo]] (p24). */
object Mp3 {

  /** Layer III bitrate table, kbps (Table 3-B.1 column III). */
  val BitratesL3: Vector[Int] = Vector(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  import Mp2.Rates

  /** §2.4.2.7 slen table: scalefac_compress → (slen1, slen2). */
  val Slen: Vector[(Int, Int)] = Vector(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** STAND-IN scalefactor-band offsets (Table B.8 is per-rate appendix
    * data): 23 entries, even, strictly increasing. Region boundaries
    * index this. */
  val SfbOffsets: Array[Int] = Array.tabulate(23)(i => i * i + i)

  /** STAND-IN SHORT-block scalefactor-band offsets (Table B.8's short
    * columns are appendix data too): 13 entries per window, even,
    * strictly increasing; offset 3 = 12 matches the real 44.1 kHz
    * column's sfb[3] so the spec's 36-sample boundaries (the short
    * region-1 start AND the mixed-block long/short split, both
    * 3·short[3]) carry over exactly. */
  val SfbOffsetsShort: Array[Int] = Array.tabulate(13)(i => i * i + i)

  /** §2.4.1.7 window-switching side info (window_switching_flag = 1):
    * block_type 1 = start, 2 = three short windows, 3 = stop (0 is
    * forbidden when the flag is set); mixed_block_flag keeps the two
    * lowest subbands long (block_type 2 only); subblock_gain is one
    * 3-bit gain offset per short window (gain drops 8·sbg per step,
    * §2.4.3.4.7.1). region0/region1_count are NOT transmitted in this
    * form — the region boundaries are fixed by the spec. */
  final case class BlockSplit(blockType: Int, mixed: Boolean,
      subblockGain: (Int, Int, Int)) {
    require(blockType >= 1 && blockType <= 3,
      s"mp3: block_type $blockType with window_switching_flag set")
    require(!mixed || blockType == 2,
      "mp3: mixed_block_flag is only meaningful for short blocks")
    require(Seq(subblockGain._1, subblockGain._2, subblockGain._3)
      .forall(g => g >= 0 && g <= 7), "mp3: subblock_gain is 3 bits")
    def sbg(w: Int): Int = w match {
      case 0 => subblockGain._1
      case 1 => subblockGain._2
      case _ => subblockGain._3
    }
  }

  /** The §2.4.3.4.5 REORDER structure: short-block samples are coded
    * scalefactor-band-major, the three windows interleaved per band —
    * this maps a coded sample index to its window. For mixed blocks
    * the first 36 samples (= 3·short_sfb[3], the two long subbands)
    * carry no window (ask with j ≥ 36 only). */
  def shortWindow(j: Int, mixed: Boolean): Int =
    shortWindowWith(j, mixed, SfbOffsetsShort)
  /** [[shortWindow]] under an injected short sfb table. */
  def shortWindowWith(j: Int, mixed: Boolean,
      sfbShort: Array[Int]): Int = {
    val start = if (mixed) 3 * sfbShort(3) else 0
    require(j >= start,
      s"mp3: sample $j is in the mixed block's LONG region")
    require(j < 3 * sfbShort(12),
      s"mp3: sample $j beyond the short sfb table")
    val b = (0 until 12).find(b => j < 3 * sfbShort(b + 1)).get
    (j - 3 * sfbShort(b)) / (sfbShort(b + 1) - sfbShort(b))
  }

  /** The Huffman-table seam: the real Tables B.5–B.7 are appendix
    * DATA; the structural contract per table id t is what's coded
    * here — magnitudes 0..15 (4-bit stand-in fields), ESC = 15 +
    * linbits(t) extension bits for t ≥ 16, and a sign bit after every
    * nonzero value. */
  object HuffSeam {
    def linbits(t: Int): Int = if (t < 16) 0 else (t % 4) + 2
    def maxMag(t: Int): Int = 15 + (if (t < 16) 0 else (1 << linbits(t)) - 1)
    /** Bits one VALUE of magnitude m costs under table t (4-bit field
      * + linbits when ESC + sign when nonzero). */
    def valueBits(t: Int, m: Int): Int = {
      val esc = if (t >= 16 && m >= 15) linbits(t) else 0
      4 + esc + (if (m != 0) 1 else 0)
    }
    def write(w: BitWriter, t: Int, v: Int): Unit = {
      val m = math.abs(v)
      require(m <= maxMag(t), s"mp3: magnitude $m beyond table $t")
      if (t >= 16 && m >= 15) {
        w.writeBits(15L, 4)
        w.writeBits((m - 15).toLong, linbits(t))
      } else {
        require(m < 15 || t >= 16, s"mp3: magnitude 15 needs an ESC table")
        w.writeBits(m.toLong, 4)
      }
      if (m != 0) w.writeBits(if (v < 0) 1L else 0L, 1)
    }
    def read(r: BitReader, t: Int): Int = {
      var m = r.readBits(4).toInt
      if (t >= 16 && m == 15) m += r.readBits(linbits(t)).toInt
      if (m != 0 && r.readBits(1) == 1L) -m else m
    }

    // ---- pair level (the [[Profile]] seam's unit of injection) ----

    /** Bits one PAIR (x, y) costs under table t: the injected VLC's
      * codeword + linbits/sign extras in spec order, or 2× the
      * stand-in per-value cost. */
    def pairBits(t: Int, x: Int, y: Int, p: Profile): Int =
      p.huff(t) match {
        case None =>
          // stand-in per-value fields under the PROFILE's linbits
          def vb(v: Int): Int = {
            val m = math.abs(v)
            val esc = if (t >= 16 && m >= 15) p.linbits(t) else 0
            4 + esc + (if (m != 0) 1 else 0)
          }
          vb(x) + vb(y)
        case Some(vlc) =>
          def extras(v: Int): Int = {
            val m = math.abs(v)
            (if (t >= 16 && m >= 15 && p.linbits(t) > 0) p.linbits(t)
             else 0) + (if (m != 0) 1 else 0)
          }
          val (mx, my) = (math.min(math.abs(x), 15),
            math.min(math.abs(y), 15))
          vlc.bits(16 * mx + my) + extras(x) + extras(y)
      }

    /** Write one pair under profile p: injected tables use the spec's
      * §2.4.3.4.6 order — hcod(|x|,|y|), linbits_x, sign_x,
      * linbits_y, sign_y; absent tables keep the stand-in per-value
      * layout. */
    def writePair(w: BitWriter, t: Int, x: Int, y: Int,
        p: Profile): Unit = p.huff(t) match {
      case None =>
        def one(v: Int): Unit = {
          val m = math.abs(v)
          require(m <= p.maxMag(t), s"mp3: magnitude $m beyond table $t")
          if (t >= 16 && m >= 15) {
            w.writeBits(15L, 4)
            w.writeBits((m - 15).toLong, p.linbits(t))
          } else {
            require(m < 15 || t >= 16,
              "mp3: magnitude 15 needs an ESC table")
            w.writeBits(m.toLong, 4)
          }
          if (m != 0) w.writeBits(if (v < 0) 1L else 0L, 1)
        }
        one(x); one(y)
      case Some(vlc) =>
        val (mx, my) = (math.min(math.abs(x), 15),
          math.min(math.abs(y), 15))
        require(math.abs(x) <= p.maxMag(t) &&
          math.abs(y) <= p.maxMag(t),
          s"mp3: pair ($x, $y) beyond table $t under the profile")
        vlc.write(w.writeBits, 16 * mx + my)
        def tail(v: Int, cap: Int): Unit = {
          val m = math.abs(v)
          if (t >= 16 && cap == 15 && p.linbits(t) > 0)
            w.writeBits((m - 15).toLong, p.linbits(t))
          if (m != 0) w.writeBits(if (v < 0) 1L else 0L, 1)
        }
        tail(x, mx); tail(y, my)
    }

    /** Read one pair under profile p (inverse of [[writePair]]). */
    def readPair(r: BitReader, t: Int, p: Profile): (Int, Int) =
      p.huff(t) match {
        case None =>
          def one(): Int = {
            var m = r.readBits(4).toInt
            if (t >= 16 && m == 15) m += r.readBits(p.linbits(t)).toInt
            if (m != 0 && r.readBits(1) == 1L) -m else m
          }
          (one(), one())
        case Some(vlc) =>
          val idx = vlc.read(r.readBits)
          def one(cap: Int): Int = {
            var m = cap
            if (t >= 16 && cap == 15 && p.linbits(t) > 0)
              m += r.readBits(p.linbits(t)).toInt
            if (m != 0 && r.readBits(1) == 1L) -m else m
          }
          val x = one(idx >> 4)
          val y = one(idx & 15)
          (x, y)
      }
  }

  /** The INJECTABLE table set behind Layer III's appendix-data seams
    * (same class as [[graft.functions.Vp8.Profile]] — a value swap,
    * not a code change; JSON path:
    * [[graft.functions.CodecProfileJson]], CLI: [[graft.RunDecode]]):
    *
    *  - `sfbLong`/`sfbShort` — Table B.8's scalefactor-band offsets
    *    (23 long / 13 short entries for the chosen sample rate);
    *  - `linbits` — the per-table ESC extension widths of Tables
    *    B.5–B.7 (32 entries; 0 for tables 0–15);
    *  - `huff` — the PAIR codeword tables B.5–B.7 themselves: table t
    *    codes (|x|, |y|) jointly as one [[Vlc]] codeword over value
    *    16·|x| + |y| (magnitudes capped at 15; ESC tables extend with
    *    linbits). `None` keeps the stand-in PER-VALUE layout (4-bit
    *    magnitude fields, [[HuffSeam]]); `Some` switches that table
    *    to the spec's real bit order — hcod(|x|,|y|), linbits_x,
    *    sign_x, linbits_y, sign_y (§2.4.3.4.6);
    *  - `count1A` — count1 Table A (a real VLC over the 4-bit
    *    nonzero pattern v·8+w·4+x·2+y, signs trailing in v,w,x,y
    *    order). count1table_select = 1 always selects the 4-bit FLC
    *    shape (the REAL Table B is exactly a 4-bit fixed-length code,
    *    so the stand-in's field is table B with a remapped value
    *    column); select = 0 uses `count1A` when present, else the
    *    same FLC — which keeps every stand-in stream bit-identical. */
  final case class Profile(sfbLong: Array[Int], sfbShort: Array[Int],
      linbits: Array[Int], huff: Vector[Option[Vlc]],
      count1A: Option[Vlc]) {
    require(sfbLong.length == 23 && sfbLong(0) == 0 &&
      sfbLong.sliding(2).forall(w => w(0) < w(1)) &&
      sfbLong.forall(_ % 2 == 0),
      "mp3 profile: sfbLong needs 23 strictly-increasing even " +
        "offsets from 0 (Table B.8 long column)")
    require(sfbShort.length == 13 && sfbShort(0) == 0 &&
      sfbShort.sliding(2).forall(w => w(0) < w(1)) &&
      sfbShort.forall(_ % 2 == 0),
      "mp3 profile: sfbShort needs 13 strictly-increasing even " +
        "offsets from 0 (Table B.8 short column)")
    require(linbits.length == 32 &&
      linbits.forall(v => v >= 0 && v <= 13) &&
      (0 until 16).forall(linbits(_) == 0),
      "mp3 profile: linbits is per-table (32), 0 for tables 0-15")
    require(huff.length == 32, "mp3 profile: 32 pair tables")
    huff.zipWithIndex.foreach { case (v, t) =>
      v.foreach(vlc => require(vlc.values.forall(i =>
        i >= 0 && i < 256),
        s"mp3 profile: table $t pair values must be 16|x|+|y| < 256"))
    }
    count1A.foreach(vlc => require(vlc.values.forall(v =>
      v >= 0 && v < 16),
      "mp3 profile: count1 table A codes the 4-bit nonzero pattern"))
    /** ESC ceiling of table t under this profile's linbits. */
    def maxMag(t: Int): Int =
      15 + (if (t < 16) 0 else (1 << linbits(t)) - 1)
  }
  object Profile {
    /** The stand-in tables — bit-identical to the historic fixed-field
      * layout (every p21–p24/e56 stream decodes unchanged). */
    val StandIn: Profile = Profile(
      sfbLong = SfbOffsets,
      sfbShort = SfbOffsetsShort,
      linbits = Array.tabulate(32)(t => if (t < 16) 0 else (t % 4) + 2),
      huff = Vector.fill(32)(None),
      count1A = None)
  }

  /** One granule's coded content (long blocks). `bigValues` pairs of
    * signed samples ride the three regions; `count1` quadruples of
    * ±1/0 values follow. Scalefactors: granule 0 stores all 21;
    * granule 1 stores only the scfsi-0 bands. */
  final case class Granule(bigValues: Vector[(Int, Int)],
      count1: Vector[(Int, Int, Int, Int)],
      globalGain: Int, scalefacCompress: Int,
      tableSelect: (Int, Int, Int),
      region0Count: Int, region1Count: Int,
      preflag: Boolean, scalefacScale: Boolean,
      scalefacs: Vector[Int],
      blockSplit: Option[BlockSplit] = None) {
    require(bigValues.length <= 288, s"mp3: ${bigValues.length} pairs")
    require(globalGain >= 0 && globalGain < 256, "mp3: global_gain")
    require(scalefacCompress >= 0 && scalefacCompress < 16,
      "mp3: scalefac_compress")
    require(Seq(tableSelect._1, tableSelect._2, tableSelect._3)
      .forall(t => t >= 0 && t < 32), "mp3: table_select")
    require(region0Count >= 0 && region0Count <= 7 &&
      region1Count >= 0 && region1Count <= 7,
      "mp3: region counts (0..7 keeps the offsets in the 23-entry table)")
    require(count1.forall { case (v, w, x, y) =>
      Seq(v, w, x, y).forall(q => q >= -1 && q <= 1) },
      "mp3: count1 values are in {-1, 0, 1}")
    // untransmitted fields are pinned when window switching: region
    // counts and table_select[2] carry no bits in that side-info form
    require(blockSplit.isEmpty ||
      (region0Count == 0 && region1Count == 0 && tableSelect._3 == 0),
      "mp3: window-switching granules don't transmit region counts " +
        "or table_select[2] — pin them to 0")
    /** Stored scalefactor count + slen selector per slot (true →
      * slen1) [§2.4.2.7]: long blocks (incl. start/stop) store 21
      * band values, bands 0–10 at slen1; SHORT blocks store 12 bands
      * × 3 windows band-major (36 slots, bands 0–5 at slen1); MIXED
      * blocks store 8 long bands then short bands 3–11 × 3 windows
      * (35 slots, the first 17 at slen1). */
    def sfSlots: Vector[Boolean] = blockSplit match {
      case Some(bs) if bs.blockType == 2 && !bs.mixed =>
        Vector.tabulate(36)(_ < 18)
      case Some(bs) if bs.blockType == 2 =>
        Vector.tabulate(35)(_ < 17)
      case _ => Vector.tabulate(21)(_ < 11)
    }
    require(scalefacs.length == sfSlots.length &&
      scalefacs.forall(v => v >= 0 && v < 16),
      s"mp3: ${scalefacs.length} scalefactors, layout wants " +
        s"${sfSlots.length}")
    /** The three region sizes in PAIRS [§2.4.2.7]: long blocks take
      * the boundaries from the sfb offsets via the region counts;
      * window-switching granules have FIXED boundaries — region 1
      * starts at 36 samples for pure short blocks (3·short_sfb[3]) or
      * at long_sfb[8] otherwise, and region 2 is always empty. */
    def regionPairs: (Int, Int, Int) = regionPairsWith(Profile.StandIn)
    /** [[regionPairs]] under an injected sfb table set. */
    def regionPairsWith(prof: Profile): (Int, Int, Int) = {
      val bv = bigValues.length
      blockSplit match {
        case Some(bs) =>
          val boundary =
            if (bs.blockType == 2 && !bs.mixed) 3 * prof.sfbShort(3) / 2
            else prof.sfbLong(8) / 2
          val r0 = math.min(bv, boundary)
          (r0, bv - r0, 0)
        case None =>
          val r0 = math.min(bv, prof.sfbLong(region0Count + 1) / 2)
          val r1 = math.min(bv,
            prof.sfbLong(region0Count + region1Count + 2) / 2) - r0
          (r0, r1, bv - r0 - r1)
      }
    }
    /** Which table codes pair index p. */
    def tableOf(p: Int): Int = tableOfWith(p, Profile.StandIn)
    def tableOfWith(p: Int, prof: Profile): Int = {
      val (r0, r1, _) = regionPairsWith(prof)
      if (p < r0) tableSelect._1
      else if (p < r0 + r1) tableSelect._2
      else tableSelect._3
    }
    /** Stored scalefactor bits (part2); `isGr1` enables scfsi sharing
      * (long layouts only). */
    def part2BitsOf(scfsi: Vector[Boolean], isGr1: Boolean): Int = {
      val (s1, s2) = Slen(scalefacCompress)
      sfSlots.zipWithIndex.map { case (isS1, band) =>
        val shared = isGr1 && sfSlots.length == 21 &&
          scfsi(ScfsiBands.indexWhere(_.contains(band)))
        if (shared) 0 else if (isS1) s1 else s2
      }.sum
    }
    /** Huffman-area bits (part3). */
    def part3Bits: Int = part3BitsWith(Profile.StandIn)
    /** [[part3Bits]] under an injected table set: pair codewords via
      * the profile's VLCs, count1 via table A when present. */
    def part3BitsWith(prof: Profile): Int =
      bigValues.zipWithIndex.map { case ((x, y), p) =>
        HuffSeam.pairBits(tableOfWith(p, prof), x, y, prof)
      }.sum + count1.map { case (v, w, x, y) =>
        val quad = Seq(v, w, x, y)
        val pattern = quad.map(q => if (q != 0) 1 else 0)
          .foldLeft(0)((a, b) => (a << 1) | b)
        val codeBits = prof.count1A match {
          case Some(vlc) => vlc.bits(pattern)
          case None => 4
        }
        codeBits + quad.count(_ != 0)
      }.sum
  }

  /** The scfsi bands of §2.4.2.7: scalefactor bands 0-5, 6-10, 11-15,
    * 16-20. */
  val ScfsiBands: Vector[Range] =
    Vector(0 until 6, 6 until 11, 11 until 16, 16 until 21)

  final case class Mp3FrameData(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, scfsi: Vector[Boolean],
      granules: Vector[Granule]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp3: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp3: rate index")
    require(scfsi.length == 4, "mp3: four scfsi bands")
    require(granules.length == 2, "mp3: two granules per MPEG-1 frame")
    // §2.4.2.7: scfsi is defined over the 21 LONG bands — with a
    // short granule in the frame all scalefactors are transmitted
    require(!granules.exists(_.blockSplit.exists(_.blockType == 2)) ||
      scfsi.forall(!_),
      "mp3: scfsi must be all-zero when a granule uses short blocks")
    def frameLen: Int =
      144 * BitratesL3(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0)
    /** Stored scalefactor bits for granule gr (part2): granule 1 skips
      * scfsi-shared LONG bands; short/mixed granules store every slot
      * of their layout. */
    def part2Bits(gr: Int): Int =
      granules(gr).part2BitsOf(scfsi, isGr1 = gr == 1)
    def part23Length(gr: Int): Int = part23LengthWith(gr, Profile.StandIn)
    def part23LengthWith(gr: Int, p: Profile): Int =
      part2Bits(gr) + granules(gr).part3BitsWith(p)
    def bodyBits: Int = bodyBitsWith(Profile.StandIn)
    def bodyBitsWith(p: Profile): Int =
      part23LengthWith(0, p) + part23LengthWith(1, p)
  }

  /** Exact requantization on the integer-exact regime: |ix| a perfect
    * cube c³ and global_gain = 210 + 4e → xr = sign·c⁴·2^e
    * [§2.4.3.4's x^(4/3)·2^((gain−210)/4) rule]. */
  def requantExact(ix: Int, globalGain: Int): Long = {
    val m = math.abs(ix)
    val c = math.round(math.cbrt(m.toDouble)).toInt
    require(c * c * c == m,
      s"mp3: $ix is not a perfect cube (the exact-integer regime)")
    val e = globalGain - 210
    require(e >= 0 && e % 4 == 0,
      s"mp3: global_gain $globalGain off the 210 + 4e exact grid")
    val mag = c.toLong * c * c * c << (e / 4)
    if (ix < 0) -mag else mag
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream,
      f: Mp3FrameData): Unit = {
    // header: sync(11) version 11 LAYER 01 protection 1 -> 0xFF 0xFB
    out.write(0xFF); out.write(0xFB)
    out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
      (if (f.padding) 2 else 0))
    out.write(0xC0) // mono
  }

  private def writeSideInfo(w: BitWriter, f: Mp3FrameData,
      mainDataBegin: Int, p: Profile): Unit = {
    require(mainDataBegin >= 0 && mainDataBegin <= 511,
      s"mp3: main_data_begin $mainDataBegin outside the 9-bit field")
    w.writeBits(mainDataBegin.toLong, 9)
    w.writeBits(0L, 5) // private_bits
    f.scfsi.foreach(b => w.writeBits(if (b) 1L else 0L, 1))
    (0 until 2).foreach { gr =>
      val g = f.granules(gr)
      writeGranuleSide(w, g, f.part23LengthWith(gr, p))
    }
  }

  /** The 59-bit per-granule side-info blob (shared by the mono and
    * stereo layouts — §2.4.1.7 transmits it once per granule per
    * channel). */
  private def writeGranuleSide(w: BitWriter, g: Granule,
      p23: Int): Unit = {
    w.writeBits(p23.toLong, 12)
    w.writeBits(g.bigValues.length.toLong, 9)
    w.writeBits(g.globalGain.toLong, 8)
    w.writeBits(g.scalefacCompress.toLong, 4)
    g.blockSplit match {
      case Some(bs) =>
        // §2.4.1.7 window-switching form: same 22 bits as the
        // normal form (2+1+2·5+3·3), region counts untransmitted
        w.writeBits(1L, 1)
        w.writeBits(bs.blockType.toLong, 2)
        w.writeBits(if (bs.mixed) 1L else 0L, 1)
        Seq(g.tableSelect._1, g.tableSelect._2)
          .foreach(t => w.writeBits(t.toLong, 5))
        Seq(bs.subblockGain._1, bs.subblockGain._2, bs.subblockGain._3)
          .foreach(v => w.writeBits(v.toLong, 3))
      case None =>
        w.writeBits(0L, 1) // window_switching_flag: long blocks
        Seq(g.tableSelect._1, g.tableSelect._2, g.tableSelect._3)
          .foreach(t => w.writeBits(t.toLong, 5))
        w.writeBits(g.region0Count.toLong, 4)
        w.writeBits(g.region1Count.toLong, 3)
    }
    w.writeBits(if (g.preflag) 1L else 0L, 1)
    w.writeBits(if (g.scalefacScale) 1L else 0L, 1)
    w.writeBits(0L, 1) // count1table_select (stand-in mapping)
  }

  private def writeMainData(w: BitWriter, f: Mp3FrameData,
      p: Profile): Unit =
    (0 until 2).foreach { gr =>
      writeGranuleMain(w, f.granules(gr),
        if (gr == 1) Some(f.granules(0)) else None, f.scfsi, p)
    }

  /** part2 (scalefactors) + part3 (Huffman area) for ONE granule —
    * shared by the mono and stereo main-data layouts. `sharedFrom`
    * carries the same CHANNEL's granule 0 when scfsi sharing can
    * apply (granule 1, long layout only). */
  private def writeGranuleMain(w: BitWriter, g: Granule,
      sharedFrom: Option[Granule], scfsi: Vector[Boolean],
      p: Profile): Unit = {
    val (s1, s2) = Slen(g.scalefacCompress)
    g.sfSlots.indices.foreach { band =>
      val shared = sharedFrom.isDefined && g.sfSlots.length == 21 &&
        scfsi(ScfsiBands.indexWhere(_.contains(band)))
      if (shared) {
        // a scfsi-shared band carries NO bits for granule 1 — the
        // caller must have set it equal to granule 0's value or the
        // round trip would silently swap it
        require(g.scalefacs(band) == sharedFrom.get.scalefacs(band),
          s"mp3: scfsi-shared band $band differs between granules " +
            s"(${sharedFrom.get.scalefacs(band)} vs ${g.scalefacs(band)})")
      }
      if (!shared) {
        val len = if (g.sfSlots(band)) s1 else s2
        if (len > 0) {
          require(g.scalefacs(band) < (1 << len),
            s"mp3: scalefactor ${g.scalefacs(band)} beyond slen $len")
          w.writeBits(g.scalefacs(band).toLong, len)
        } else require(g.scalefacs(band) == 0,
          "mp3: nonzero scalefactor in a zero-width slen slot")
      }
    }
    g.bigValues.zipWithIndex.foreach { case ((x, y), pi) =>
      HuffSeam.writePair(w, g.tableOfWith(pi, p), x, y, p)
    }
    g.count1.foreach { case (v, w4, x, y) =>
      val quad = Seq(v, w4, x, y)
      val pattern = quad.map(q => if (q != 0) 1 else 0)
        .foldLeft(0)((a, b) => (a << 1) | b)
      p.count1A match {
        case Some(vlc) => vlc.write(w.writeBits, pattern)
        case None => w.writeBits(pattern.toLong, 4)
      }
      quad.filter(_ != 0).foreach(q =>
        w.writeBits(if (q < 0) 1L else 0L, 1))
    }
  }

  def mux(frames: Seq[Mp3FrameData],
      p: Profile = Profile.StandIn): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + 17 + (f.bodyBitsWith(p) + 7) / 8 <= f.frameLen,
        s"mp3: ${f.bodyBitsWith(p)} main-data bits overrun the " +
          s"${f.frameLen}-byte frame")
      writeHeader(out, f)
      val w = new BitWriter
      writeSideInfo(w, f, mainDataBegin = 0, p)
      writeMainData(w, f, p)
      val body = w.toBytes
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      require(stuff >= 0, "mp3: body overran the frame")
      while (stuff > 0) { out.write(0); stuff -= 1 }
    }
    out.toByteArray
  }

  /** The BIT RESERVOIR [§2.4.2.7 main_data_begin]: every real encoder
    * lets a frame's main data start up to 511 bytes BEFORE its own
    * header, inside earlier frames' unused main-data space. This mux
    * packs each frame's (byte-aligned) main data sequentially through
    * the stream's slot space (slot i = the frameLen − 21 bytes after
    * frame i's header + side info), clamped so no frame lags more
    * than the field's 511 bytes (the clamp gap is ancillary data, as
    * in real encoders); main_data_begin(i) = slotStart(i) −
    * dataStart(i). A frame's data may therefore live entirely inside
    * PREVIOUS frames' physical slots. */
  def muxReservoir(frames: Seq[Mp3FrameData],
      p: Profile = Profile.StandIn): Array[Byte] = {
    val mains = frames.map { f =>
      val w = new BitWriter
      writeMainData(w, f, p)
      w.toBytes
    }
    val slotBytes = frames.map(_.frameLen - 4 - 17)
    val slotStart = slotBytes.scanLeft(0)(_ + _)
    // sequential packing with the 511-byte lag clamp
    val dataStart = new Array[Int](frames.length)
    var end = 0
    frames.indices.foreach { i =>
      dataStart(i) = math.max(end, slotStart(i) - 511)
      end = dataStart(i) + mains(i).length
      require(end <= slotStart(i) + slotBytes(i),
        s"mp3: frame $i's ${mains(i).length} main-data bytes outrun " +
          "the reservoir (raise the bitrate)")
    }
    // physical slot space: mains at their offsets, gaps are ancillary
    val space = new Array[Byte](slotStart.last)
    frames.indices.foreach(i =>
      System.arraycopy(mains(i), 0, space, dataStart(i), mains(i).length))
    val out = new java.io.ByteArrayOutputStream()
    frames.indices.foreach { i =>
      val f = frames(i)
      writeHeader(out, f)
      val w = new BitWriter
      writeSideInfo(w, f, mainDataBegin = slotStart(i) - dataStart(i), p)
      val side = w.toBytes
      require(side.length == 17, s"mp3: side info ${side.length} B")
      out.write(side, 0, 17)
      out.write(space, slotStart(i), slotBytes(i))
    }
    out.toByteArray
  }

  private final case class Side(p23: Int, bv: Int, gain: Int, sfc: Int,
      ts: (Int, Int, Int), rc0: Int, rc1: Int, pre: Boolean,
      sfs: Boolean, split: Option[BlockSplit], c1Sel: Boolean)

  private def readSideInfo(r: BitReader, pos: Int)
      : (Int, Vector[Boolean], Vector[Side]) = {
    val mdb = r.readBits(9).toInt
    r.readBits(5) // private_bits
    val scfsi = Vector.fill(4)(r.readBits(1) == 1L)
    val sides = Vector.fill(2)(readGranuleSide(r, pos))
    (mdb, scfsi, sides)
  }

  private def readGranuleSide(r: BitReader, pos: Int): Side = {
    val p23 = r.readBits(12).toInt
    val bv = r.readBits(9).toInt
    require(bv <= 288, s"mp3: big_values $bv beyond 288 at $pos")
    val gain = r.readBits(8).toInt
    val sfc = r.readBits(4).toInt
    val (ts, rc0, rc1, split) =
      if (r.readBits(1) == 1L) { // window_switching_flag
        val bt = r.readBits(2).toInt
        require(bt != 0,
          s"mp3: block_type 0 with window_switching_flag set at $pos")
        val mixed = r.readBits(1) == 1L
        val t = (r.readBits(5).toInt, r.readBits(5).toInt, 0)
        val sbg = (r.readBits(3).toInt, r.readBits(3).toInt,
          r.readBits(3).toInt)
        (t, 0, 0, Some(BlockSplit(bt, mixed, sbg)))
      } else {
        val t = (r.readBits(5).toInt, r.readBits(5).toInt,
          r.readBits(5).toInt)
        val rc0 = r.readBits(4).toInt
        val rc1 = r.readBits(3).toInt
        require(rc0 <= 7, s"mp3: region0_count $rc0 beyond the " +
          "23-entry offset table with region1")
        (t, rc0, rc1, None)
      }
    val pre = r.readBits(1) == 1L
    val sfs = r.readBits(1) == 1L
    // count1table_select: 1 always means the 4-bit FLC shape (real
    // Table B IS a 4-bit FLC); 0 selects Profile.count1A when present
    val c1Sel = r.readBits(1) == 1L
    Side(p23, bv, gain, sfc, ts, rc0, rc1, pre, sfs, split, c1Sel)
  }

  private def readGranules(r: BitReader, scfsi: Vector[Boolean],
      sides: Vector[Side], pos: Int, p: Profile): Vector[Granule] = {
    var prev: Option[Granule] = None
    (0 until 2).map { gr =>
      val g = readGranuleMain(r, sides(gr), scfsi, prev, pos, gr, p)
      prev = Some(g)
      g
    }.toVector
  }

  /** One granule's main data (part2 + part3) — shared by the mono and
    * stereo layouts. `prev` is the same channel's granule 0 for scfsi
    * sharing (granule 1, long layout only). */
  private def readGranuleMain(r: BitReader, s: Side,
      scfsi: Vector[Boolean], prev: Option[Granule], pos: Int,
      gr: Int, p: Profile): Granule = {
    val bitsBefore = r.bitPos
    val (s1, s2) = Slen(s.sfc)
    // slot layout per block regime (same shapes as Granule.sfSlots)
    val slots: Vector[Boolean] = s.split match {
      case Some(bs) if bs.blockType == 2 && !bs.mixed =>
        Vector.tabulate(36)(_ < 18)
      case Some(bs) if bs.blockType == 2 =>
        Vector.tabulate(35)(_ < 17)
      case _ => Vector.tabulate(21)(_ < 11)
    }
    val sfs = slots.indices.map { band =>
      val shared = gr == 1 && slots.length == 21 &&
        scfsi(ScfsiBands.indexWhere(_.contains(band)))
      if (shared) prev.get.scalefacs(band)
      else {
        val len = if (slots(band)) s1 else s2
        if (len > 0) r.readBits(len).toInt else 0
      }
    }.toVector
    // region partitioning: fixed boundaries under window switching
    // (region 2 empty), else from the side-info region counts
    val (r0, r1) = s.split match {
      case Some(bs) =>
        val boundary =
          if (bs.blockType == 2 && !bs.mixed) 3 * p.sfbShort(3) / 2
          else p.sfbLong(8) / 2
        val rr0 = math.min(s.bv, boundary)
        (rr0, s.bv - rr0)
      case None =>
        val rr0 = math.min(s.bv, p.sfbLong(s.rc0 + 1) / 2)
        (rr0, math.min(s.bv,
          p.sfbLong(s.rc0 + s.rc1 + 2) / 2) - rr0)
    }
    val bvs = (0 until s.bv).map { pi =>
      val t = if (pi < r0) s.ts._1
        else if (pi < r0 + r1) s.ts._2 else s.ts._3
      HuffSeam.readPair(r, t, p)
    }.toVector
    // count1: quadruples until part2_3_length is exhausted
    val c1 = Vector.newBuilder[(Int, Int, Int, Int)]
    while (r.bitPos - bitsBefore < s.p23) {
      val mask = p.count1A match {
        case Some(vlc) if !s.c1Sel => vlc.read(r.readBits)
        case _ => r.readBits(4).toInt
      }
      val quad = (3 to 0 by -1).map { b =>
        if ((mask & (1 << b)) != 0) {
          if (r.readBits(1) == 1L) -1 else 1
        } else 0
      }
      c1 += ((quad(0), quad(1), quad(2), quad(3)))
    }
    require(r.bitPos - bitsBefore == s.p23,
      s"mp3: granule $gr consumed ${r.bitPos - bitsBefore} bits, " +
        s"part2_3_length says ${s.p23} at $pos")
    Granule(bvs, c1.result(), s.gain, s.sfc, s.ts, s.rc0, s.rc1,
      s.pre, s.sfs, sfs, s.split)
  }

  /** Walk a reservoir stream back: frames recovered with their
    * main_data_begin offsets honored — each frame's granules read
    * from slotStart(i) − mdb(i) in the concatenated slot space
    * (require: starts are monotone and never before the stream). A
    * streaming decoder needs only a 511-byte window plus the current
    * slot; this walk buffers the whole (small, fixture-sized) space.
    * Returns (frame offset, main_data_begin, frame). */
  def demuxReservoir(bytes: Array[Byte],
      p: Profile = Profile.StandIn): Seq[(Long, Int, Mp3FrameData)] = {
    // pass 1: headers + side infos + the slot space
    final case class Hdr(pos: Int, bi: Int, ri: Int, pad: Boolean,
        mdb: Int, scfsi: Vector[Boolean], sides: Vector[Side],
        slotStart: Int)
    val hdrs = Seq.newBuilder[Hdr]
    val space = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 21 <= bytes.length, s"mp3: truncated frame at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFB,
        s"mp3: lost sync at $pos (MPEG-1 Layer III no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp3: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp3: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      require((bytes(pos + 3) & 0xc0) == 0xc0, s"mp3: not mono at $pos")
      val fl = 144 * BitratesL3(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
      require(pos + fl <= bytes.length,
        s"mp3: frame length $fl overruns the stream at $pos")
      val r = new BitReader(bytes, pos + 4, pos + 21)
      val (mdb, scfsi, sides) = readSideInfo(r, pos)
      hdrs += Hdr(pos, bi, ri, pad, mdb, scfsi, sides, space.size)
      space.write(bytes, pos + 21, fl - 21)
      pos += fl
    }
    // pass 2: granules at slotStart - main_data_begin
    val sp = space.toByteArray
    var prevStart = -1
    hdrs.result().map { h =>
      val start = h.slotStart - h.mdb
      require(start >= 0,
        s"mp3: main_data_begin ${h.mdb} reaches before the stream " +
          s"at ${h.pos}")
      // non-decreasing, not strictly increasing: a frame whose two
      // granules carry zero main-data bits legally repeats the start
      require(start >= prevStart || prevStart < 0,
        s"mp3: reservoir starts must not seek backward at ${h.pos}")
      prevStart = start
      val r = new BitReader(sp, start, sp.length)
      val granules = readGranules(r, h.scfsi, h.sides, h.pos, p)
      (h.pos.toLong, h.mdb,
        Mp3FrameData(h.bi, h.ri, h.pad, h.scfsi, granules))
    }
  }

  /** ONE streaming reservoir step (§2.4.2.7): decode a single
    * complete frame given `window` = the trailing ≤ 511 bytes of slot
    * space that precede it — the COMPLETE cross-frame state a live
    * MP3 decoder needs (main_data_begin is a 9-bit field, so no frame
    * can reach further back). Returns (frame, main_data_begin, the
    * updated ≤ 511-byte window including this frame's slot). A fresh
    * stream starts with an empty window; a frame whose
    * main_data_begin outruns the accumulated window fails loudly. */
  def demuxReservoirStep(bytes: Array[Byte],
      window: Array[Byte],
      p: Profile = Profile.StandIn): (Mp3FrameData, Int, Array[Byte]) = {
    require(window.length <= 511, "mp3: window beyond the 9-bit reach")
    require(bytes.length >= 21, "mp3: truncated frame")
    require((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xFB,
      "mp3: lost sync (MPEG-1 Layer III no-CRC expected)")
    val bi = (bytes(2) >> 4) & 0xf
    require(bi >= 1 && bi <= 14, s"mp3: bitrate index $bi")
    val ri = (bytes(2) >> 2) & 3
    require(ri <= 2, "mp3: reserved rate index")
    val pad = (bytes(2) & 2) != 0
    require((bytes(3) & 0xc0) == 0xc0, "mp3: not mono")
    val fl = 144 * BitratesL3(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
    require(bytes.length == fl,
      s"mp3: frame length $fl, got ${bytes.length} bytes")
    val r = new BitReader(bytes, 4, 21)
    val (mdb, scfsi, sides) = readSideInfo(r, 0)
    require(mdb <= window.length,
      s"mp3: main_data_begin $mdb reaches past the " +
        s"${window.length}-byte accumulated window")
    val slot = java.util.Arrays.copyOfRange(bytes, 21, fl)
    val space = window ++ slot
    val mr = new BitReader(space, window.length - mdb, space.length)
    val granules = readGranules(mr, scfsi, sides, 0, p)
    val kept =
      if (space.length <= 511) space
      else java.util.Arrays.copyOfRange(space,
        space.length - 511, space.length)
    (Mp3FrameData(bi, ri, pad, scfsi, granules), mdb, kept)
  }

  /** Walk a Layer III stream back: offsets + full structural recovery.
    * part2_3_length is verified EXACTLY against the bits consumed —
    * the spec's own consistency invariant — and every subset boundary
    * fails loudly. */
  def demux(bytes: Array[Byte],
      p: Profile = Profile.StandIn): Seq[(Long, Mp3FrameData)] = {
    val out = Seq.newBuilder[(Long, Mp3FrameData)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp3: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFB,
        s"mp3: lost sync at $pos (MPEG-1 Layer III no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp3: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp3: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      require((bytes(pos + 3) & 0xc0) == 0xc0, s"mp3: not mono at $pos")
      val fl = 144 * BitratesL3(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
      require(pos + fl <= bytes.length,
        s"mp3: frame length $fl overruns the stream at $pos")
      val r = new BitReader(bytes, pos + 4, pos + fl)
      val (mdb, scfsi, sides) = readSideInfo(r, pos)
      require(mdb == 0,
        "mp3: main_data_begin != 0 needs the reservoir walk " +
          "(demuxReservoir)")
      val granules = readGranules(r, scfsi, sides, pos, p)
      out += ((pos.toLong, Mp3FrameData(bi, ri, pad, scfsi, granules)))
      pos += fl
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // STEREO (§2.4.1.3 mode/mode_extension, §2.4.1.7 two-channel side
  // info, §2.4.3.4.9 MS + intensity stereo processing)
  // ------------------------------------------------------------------

  /** A two-channel MPEG-1 Layer III frame: mode 0 = stereo, 1 = joint
    * stereo, 2 = dual channel (3 = mono rides [[Mp3FrameData]]).
    * mode_extension (joint only): bit 0 = intensity stereo, bit 1 =
    * MS stereo. The side info is the 32-byte two-channel layout —
    * main_data_begin(9), private_bits(3), scfsi 2ch × 4, then the
    * 59-bit granule blob for (gr0,ch0)(gr0,ch1)(gr1,ch0)(gr1,ch1);
    * main data runs gr-major, channel-minor. `granules(gr)(ch)`;
    * `scfsi(ch)` is per channel. */
  final case class Mp3StereoFrame(bitrateIndex: Int, rateIndex: Int,
      padding: Boolean, mode: Int, modeExt: Int,
      scfsi: Vector[Vector[Boolean]],
      granules: Vector[Vector[Granule]]) {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "mp3: bitrate index")
    require(rateIndex >= 0 && rateIndex <= 2, "mp3: rate index")
    require(mode >= 0 && mode <= 2,
      "mp3: stereo modes are 0/1/2 (mono rides Mp3FrameData)")
    require(modeExt >= 0 && modeExt <= 3 && (mode == 1 || modeExt == 0),
      "mp3: mode_extension is joint-stereo only")
    require(scfsi.length == 2 && scfsi.forall(_.length == 4),
      "mp3: scfsi is per channel × 4 bands")
    require(granules.length == 2 && granules.forall(_.length == 2),
      "mp3: 2 granules × 2 channels")
    require(granules.flatten.forall(g =>
      g.blockSplit.forall(_.blockType != 2)) ||
      scfsi.forall(_.forall(!_)),
      "mp3: scfsi must be all-zero when a granule uses short blocks")
    def frameLen: Int =
      144 * BitratesL3(bitrateIndex) * 1000 / Rates(rateIndex) +
        (if (padding) 1 else 0)
    def part23Length(gr: Int, ch: Int): Int =
      part23LengthWith(gr, ch, Profile.StandIn)
    def part23LengthWith(gr: Int, ch: Int, p: Profile): Int =
      granules(gr)(ch).part2BitsOf(scfsi(ch), isGr1 = gr == 1) +
        granules(gr)(ch).part3BitsWith(p)
    def bodyBits: Int = bodyBitsWith(Profile.StandIn)
    def bodyBitsWith(p: Profile): Int =
      (for (gr <- 0 until 2; ch <- 0 until 2)
        yield part23LengthWith(gr, ch, p)).sum
  }

  /** §2.4.3.4.9.2 MS reconstruction on the √2-SCALED exact-integer
    * form: the spec's li = (mi+si)/√2, ri = (mi−si)/√2 returned as
    * (li·√2, ri·√2) = (m+s, m−s) — exact integers whose energy
    * identity (l²+r² = m²+s² after the shared ÷2) holds exactly. */
  def msScaled(m: Long, s: Long): (Long, Long) = (m + s, m - s)

  /** §2.4.3.4.9.3 intensity-stereo reconstruction on the EXACT grid:
    * is_ratio = tan(is_pos·π/12) with left = xr·ratio/(1+ratio),
    * right = xr/(1+ratio). Exact positions: 0 (ratio 0 → all right),
    * 3 (ratio 1 → halves, xr must be even), 6 (ratio ∞ → all left);
    * is_pos 7 is the spec's illegal marker; the other positions are
    * irrational tangents — off the exact-integer regime, loud. */
  def intensityExact(xr: Long, isPos: Int): (Long, Long) = isPos match {
    case 0 => (0L, xr)
    case 3 =>
      require(xr % 2 == 0,
        s"mp3: is_pos 3 halves, $xr is odd (off the exact grid)")
      (xr / 2, xr / 2)
    case 6 => (xr, 0L)
    case 7 => throw new IllegalArgumentException(
      "mp3: is_pos 7 is illegal (§2.4.3.4.9.3)")
    case p => throw new IllegalArgumentException(
      s"mp3: is_pos $p has an irrational tangent — off the exact grid")
  }

  /** The intensity region's first LONG scalefactor band: the smallest
    * b with SfbOffsets(b) ≥ the right channel's zero_part start (one
    * past its last nonzero sample, big-values AND count1); 22 = no
    * region. Long blocks only (intensity-on-short is out of this
    * leg's scope — loud). */
  def intensityBound(right: Granule): Int = {
    require(right.blockSplit.isEmpty,
      "mp3: intensity bound is computed for long blocks here")
    val bvNz = right.bigValues.zipWithIndex.flatMap { case ((x, y), p) =>
      Seq(if (x != 0) Some(2 * p) else None,
        if (y != 0) Some(2 * p + 1) else None).flatten
    }
    val c1Start = 2 * right.bigValues.length
    val c1Nz = right.count1.zipWithIndex.flatMap { case (q, k) =>
      Seq(q._1, q._2, q._3, q._4).zipWithIndex.collect {
        case (v, j) if v != 0 => c1Start + 4 * k + j
      }
    }
    val nzEnd = (bvNz ++ c1Nz).maxOption.map(_ + 1).getOrElse(0)
    (0 to 21).find(b => SfbOffsets(b) >= nzEnd).getOrElse(22)
  }

  private def writeHeaderStereo(out: java.io.ByteArrayOutputStream,
      f: Mp3StereoFrame): Unit = {
    out.write(0xFF); out.write(0xFB)
    out.write((f.bitrateIndex << 4) | (f.rateIndex << 2) |
      (if (f.padding) 2 else 0))
    out.write((f.mode << 6) | (f.modeExt << 4))
  }

  /** Pack two-channel frames (main_data_begin = 0 — the reservoir
    * mechanics are the same as mono's and live in [[muxReservoir]]). */
  def muxStereo(frames: Seq[Mp3StereoFrame],
      p: Profile = Profile.StandIn): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      require(4 + 32 + (f.bodyBitsWith(p) + 7) / 8 <= f.frameLen,
        s"mp3: ${f.bodyBitsWith(p)} main-data bits overrun the " +
          s"${f.frameLen}-byte stereo frame")
      writeHeaderStereo(out, f)
      val w = new BitWriter
      w.writeBits(0L, 9) // main_data_begin
      w.writeBits(0L, 3) // private_bits (stereo: 3)
      f.scfsi.foreach(_.foreach(b => w.writeBits(if (b) 1L else 0L, 1)))
      for (gr <- 0 until 2; ch <- 0 until 2)
        writeGranuleSide(w, f.granules(gr)(ch),
          f.part23LengthWith(gr, ch, p))
      for (gr <- 0 until 2; ch <- 0 until 2)
        writeGranuleMain(w, f.granules(gr)(ch),
          if (gr == 1) Some(f.granules(0)(ch)) else None, f.scfsi(ch), p)
      val body = w.toBytes
      require(body.length >= 32, "mp3: stereo side info short")
      out.write(body, 0, body.length)
      var stuff = f.frameLen - 4 - body.length
      require(stuff >= 0, "mp3: stereo body overran the frame")
      while (stuff > 0) { out.write(0); stuff -= 1 }
    }
    out.toByteArray
  }

  /** Walk a two-channel Layer III stream back: mode/mode_extension
    * from the header, the 32-byte side info, gr-major channel-minor
    * main data, part2_3_length verified exactly per (gr, ch). */
  def demuxStereo(bytes: Array[Byte],
      p: Profile = Profile.StandIn): Seq[(Long, Mp3StereoFrame)] = {
    val out = Seq.newBuilder[(Long, Mp3StereoFrame)]
    var pos = 0
    while (pos < bytes.length) {
      require(pos + 4 <= bytes.length, s"mp3: truncated header at $pos")
      require((bytes(pos) & 0xff) == 0xFF &&
        (bytes(pos + 1) & 0xff) == 0xFB,
        s"mp3: lost sync at $pos (MPEG-1 Layer III no-CRC expected)")
      val bi = (bytes(pos + 2) >> 4) & 0xf
      require(bi >= 1 && bi <= 14, s"mp3: bitrate index $bi at $pos")
      val ri = (bytes(pos + 2) >> 2) & 3
      require(ri <= 2, s"mp3: reserved rate index at $pos")
      val pad = (bytes(pos + 2) & 2) != 0
      val mode = (bytes(pos + 3) >> 6) & 3
      require(mode != 3,
        s"mp3: mono frame at $pos — use demux, not demuxStereo")
      val modeExt = (bytes(pos + 3) >> 4) & 3
      val fl = 144 * BitratesL3(bi) * 1000 / Rates(ri) + (if (pad) 1 else 0)
      require(pos + fl <= bytes.length,
        s"mp3: frame length $fl overruns the stream at $pos")
      val r = new BitReader(bytes, pos + 4, pos + fl)
      require(r.readBits(9) == 0L,
        "mp3: main_data_begin != 0 needs the reservoir walk")
      r.readBits(3) // private_bits
      val scfsi = Vector.fill(2)(Vector.fill(4)(r.readBits(1) == 1L))
      val sides = Vector.fill(4)(readGranuleSide(r, pos))
      val granules = Vector.tabulate(2) { gr =>
        Vector.tabulate(2) { ch => (gr, ch) }
      }
      var prev: Vector[Option[Granule]] = Vector(None, None)
      val read = granules.map(_.map { case (gr, ch) =>
        val g = readGranuleMain(r, sides(gr * 2 + ch), scfsi(ch),
          prev(ch), pos, gr, p)
        prev = prev.updated(ch, Some(g))
        g
      })
      out += ((pos.toLong,
        Mp3StereoFrame(bi, ri, pad, mode, modeExt, scfsi, read)))
      pos += fl
    }
    out.result()
  }
}
