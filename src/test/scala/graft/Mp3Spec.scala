package graft

import graft.sources.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer III structural codec (ISO/IEC 11172-3 §2.4.2.7):
  * side-info layout, slen/scfsi scalefactor mechanics, region
  * partitioning, the part2_3_length exact-consumption invariant, the
  * ESC/sign structure around the Huffman seam, and the §2.4.3.4
  * requantization arithmetic on its integer-exact regime. Complements
  * the p21 oracle the way Mp2Spec complements p17/p20. */
class Mp3Spec extends AnyFunSuite {

  private def granule(i: Int, gr: Int, g0: Option[Mp3.Granule],
      scfsi: Vector[Boolean]): Mp3.Granule = {
    val bv = 10 + (i * 7 + gr * 3) % 30
    val rc0 = (i + gr) % 6
    val rc1 = (i * 3 + gr) % 6
    val t2 = 18 + (i + gr) % 2
    val r0 = math.min(bv, (rc0 + 1) * (rc0 + 2) / 2)
    val r1 = math.min(bv, (rc0 + rc1 + 2) * (rc0 + rc1 + 3) / 2) - r0
    val cubes = Array(0, 1, 8); val cubes2 = Array(0, 1, 8, 27)
    val pairs = Vector.tabulate(bv) { p =>
      def v(s2: Int): Int = {
        val idx = p * 2 + s2
        val m = if (p < r0 + r1) cubes((i * 5 + idx * 7 + gr * 11) % 3)
          else cubes2((i * 5 + idx * 7 + gr * 11) % 4)
        if (m != 0 && (idx + i) % 2 == 1) -m else m
      }
      (v(0), v(1))
    }
    val c1 = Vector.tabulate((i * 3 + gr) % 8) { q =>
      def cv(pos: Int): Int = ((i + q * 5 + pos * 3 + gr) % 3) - 1
      (cv(0), cv(1), cv(2), cv(3))
    }
    val sfc = (i + 2 * gr) % 16
    val (s1, s2) = Mp3.Slen(sfc)
    val sfs = Vector.tabulate(21) { band =>
      val shared = gr == 1 &&
        scfsi(Mp3.ScfsiBands.indexWhere(_.contains(band)))
      if (shared) g0.get.scalefacs(band)
      else {
        val len = if (band < 11) s1 else s2
        if (len > 0) (i * 3 + band * 5 + gr * 7) % (1 << len) else 0
      }
    }
    Mp3.Granule(pairs, c1, 210 + 4 * ((i + gr) % 10), sfc,
      ((i + gr) % 14, 1 + (i * 5 + gr) % 14, t2), rc0, rc1,
      preflag = (i + gr) % 2 == 0, scalefacScale = i % 2 == 1,
      scalefacs = sfs)
  }

  private def frame(i: Int): Mp3.Mp3FrameData = {
    val scfsi = Vector.tabulate(4)(b => (i + b) % 3 == 0)
    val g0 = granule(i, 0, None, scfsi)
    Mp3.Mp3FrameData(14, 2, padding = i % 2 == 1, scfsi,
      Vector(g0, granule(i, 1, Some(g0), scfsi)))
  }

  test("mux → demux round-trips every structural field: side info, " +
      "scalefactors with scfsi sharing, signed big-values across all " +
      "three regions incl. region 2's ESC+linbits, count1 quadruples, " +
      "and the 144·bitrate/rate + pad frame arithmetic") {
    val frames = (0 until 8).map(frame)
    val rec = Mp3.demux(Mp3.mux(frames))
    assert(rec.size == 8)
    var expOff = 0L
    rec.zip(frames).zipWithIndex.foreach { case (((off, got), want), i) =>
      assert(off == expOff, s"frame $i offset")
      expOff += want.frameLen
      assert(got.bitrateIndex == 14 && got.rateIndex == 2 &&
        got.padding == want.padding && got.scfsi == want.scfsi)
      got.granules.zip(want.granules).zipWithIndex.foreach {
        case ((g, w), gr) =>
          assert(g.bigValues == w.bigValues, s"frame $i gr $gr values")
          assert(g.count1 == w.count1, s"frame $i gr $gr count1")
          assert(g.globalGain == w.globalGain &&
            g.scalefacCompress == w.scalefacCompress &&
            g.tableSelect == w.tableSelect &&
            g.region0Count == w.region0Count &&
            g.region1Count == w.region1Count &&
            g.preflag == w.preflag &&
            g.scalefacScale == w.scalefacScale, s"frame $i gr $gr side")
          assert(g.scalefacs == w.scalefacs, s"frame $i gr $gr sfs")
      }
    }
  }

  test("scfsi sharing [§2.4.2.7]: granule 1's shared bands store NO " +
      "bits and read back granule 0's values; the part2 budget " +
      "reflects it exactly") {
    val f = frame(3) // scfsi = (3+b) % 3 == 0 → bands 0 and 3 shared
    assert(f.scfsi == Vector(true, false, false, true))
    val rec = Mp3.demux(Mp3.mux(Seq(f))).head._2
    val (g0, g1) = (rec.granules(0), rec.granules(1))
    Mp3.ScfsiBands.zipWithIndex.foreach { case (bands, b) =>
      if (f.scfsi(b))
        bands.foreach(band => assert(g1.scalefacs(band) ==
          g0.scalefacs(band), s"band $band must share"))
    }
    // the shared bands subtract their slen widths from part2
    val (s1, s2) = Mp3.Slen(f.granules(1).scalefacCompress)
    val sharedBits = (0 until 21).map { band =>
      val b = Mp3.ScfsiBands.indexWhere(_.contains(band))
      if (f.scfsi(b)) (if (band < 11) s1 else s2) else 0
    }.sum
    val allBits = (0 until 21).map(band =>
      if (band < 11) s1 else s2).sum
    assert(f.part2Bits(1) == allBits - sharedBits)
  }

  test("region partitioning: boundaries are the stand-in triangular " +
      "pair counts, clipped to big_values, and each pair's table " +
      "comes from its region") {
    val g = frame(2).granules(0)
    val (r0, r1, r2) = g.regionPairs
    assert(r0 == math.min(g.bigValues.length,
      (g.region0Count + 1) * (g.region0Count + 2) / 2))
    assert(r0 + r1 + r2 == g.bigValues.length)
    assert(g.tableOf(0) == g.tableSelect._1)
    if (r2 > 0) assert(g.tableOf(r0 + r1) == g.tableSelect._3)
  }

  test("part2_3_length is the exact bit consumption (the spec's own " +
      "invariant): a side-info length lie is caught loudly") {
    val f = frame(1)
    val bytes = Mp3.mux(Seq(f))
    // part2_3_length for granule 0 sits at bit 18 of the side info
    // (after main_data_begin 9 + private 5 + scfsi 4), i.e. bits
    // 18..29 of byte 4 onward: byte 6 holds its bits 2..9
    bytes(6) = (bytes(6) ^ 0x10).toByte
    val ex = intercept[IllegalArgumentException] { Mp3.demux(bytes) }
    assert(ex.getMessage.contains("part2_3_length") ||
      ex.getMessage.contains("consumed"))
  }

  test("subset boundaries are loud: nonzero main_data_begin (bit " +
      "reservoir), and malformed granules are rejected at " +
      "construction") {
    val bytes = Mp3.mux(Seq(frame(0)))
    bytes(4) = (bytes(4) | 0x80).toByte // main_data_begin high bit
    val ex = intercept[IllegalArgumentException] { Mp3.demux(bytes) }
    assert(ex.getMessage.contains("main_data_begin"))
    intercept[IllegalArgumentException] {
      frame(0).granules(0).copy(region0Count = 8)
    }
    intercept[IllegalArgumentException] {
      frame(0).granules(0).copy(count1 = Vector((2, 0, 0, 0)))
    }
  }

  test("HuffSeam: ESC + linbits on tables >= 16 round-trips the full " +
      "magnitude range with signs; overlong magnitudes are loud") {
    import graft.sources.Flac.{BitReader, BitWriter}
    val t = 19 // linbits 5 → magnitudes to 46
    val vals = Seq(0, 1, -1, 14, 15, -15, 27, -27, 46, -46)
    val w = new BitWriter
    vals.foreach(v => Mp3.HuffSeam.write(w, t, v))
    val bytes = w.toBytes
    val r = new BitReader(bytes, 0, bytes.length)
    vals.foreach(v => assert(Mp3.HuffSeam.read(r, t) == v, s"value $v"))
    intercept[IllegalArgumentException] {
      Mp3.HuffSeam.write(new BitWriter, 19, 47)
    }
    intercept[IllegalArgumentException] {
      Mp3.HuffSeam.write(new BitWriter, 3, 15) // 15 needs an ESC table
    }
  }

  test("requantExact [§2.4.3.4]: xr = sign·|ix|^(4/3)·2^((gain−210)/4) " +
      "on the integer-exact regime — cubes map to fourth powers, the " +
      "gain doubles per +4, and off-regime inputs are loud") {
    assert(Mp3.requantExact(0, 210) == 0L)
    assert(Mp3.requantExact(1, 210) == 1L)
    assert(Mp3.requantExact(8, 210) == 16L)
    assert(Mp3.requantExact(27, 210) == 81L)
    assert(Mp3.requantExact(-27, 210) == -81L)
    assert(Mp3.requantExact(8, 218) == 64L) // 16 · 2^2
    assert(Mp3.requantExact(1, 250) == 1024L)
    intercept[IllegalArgumentException] { Mp3.requantExact(9, 210) }
    intercept[IllegalArgumentException] { Mp3.requantExact(8, 212) }
    intercept[IllegalArgumentException] { Mp3.requantExact(8, 206) }
  }

  // ---- bit reservoir [main_data_begin] ------------------------------------

  /** Smaller frames so the reservoir mechanics actually engage:
    * 48 kbps @ 32 kHz -> 216-byte frames, 195-byte slots. */
  private def smallFrame(i: Int): Mp3.Mp3FrameData = {
    def granule(gr: Int, g0: Option[Mp3.Granule],
        scfsi: Vector[Boolean]): Mp3.Granule = {
      val bv = 5 + (i * 7 + gr * 3) % 15
      val rc0 = (i + gr) % 6
      val rc1 = (i * 3 + gr) % 6
      val r0 = math.min(bv, (rc0 + 1) * (rc0 + 2) / 2)
      val r1 = math.min(bv, (rc0 + rc1 + 2) * (rc0 + rc1 + 3) / 2) - r0
      val cubes = Array(0, 1, 8); val cubes2 = Array(0, 1, 8, 27)
      val pairs = Vector.tabulate(bv) { p =>
        def v(s2: Int): Int = {
          val idx = p * 2 + s2
          val m = if (p < r0 + r1) cubes((i * 5 + idx * 7 + gr * 11) % 3)
            else cubes2((i * 5 + idx * 7 + gr * 11) % 4)
          if (m != 0 && (idx + i) % 2 == 1) -m else m
        }
        (v(0), v(1))
      }
      val c1 = Vector.tabulate((i * 3 + gr) % 8) { q =>
        def cv(pos: Int): Int = ((i + q * 5 + pos * 3 + gr) % 3) - 1
        (cv(0), cv(1), cv(2), cv(3))
      }
      val sfc = (i + 2 * gr) % 16
      val (s1, s2) = Mp3.Slen(sfc)
      val sfs = Vector.tabulate(21) { band =>
        val shared = gr == 1 &&
          scfsi(Mp3.ScfsiBands.indexWhere(_.contains(band)))
        if (shared) g0.get.scalefacs(band)
        else {
          val len = if (band < 11) s1 else s2
          if (len > 0) (i * 3 + band * 5 + gr * 7) % (1 << len) else 0
        }
      }
      Mp3.Granule(pairs, c1, 210 + 4 * ((i + gr) % 10), sfc,
        ((i + gr) % 14, 1 + (i * 5 + gr) % 14, 18 + (i + gr) % 2),
        rc0, rc1, preflag = (i + gr) % 2 == 0,
        scalefacScale = i % 2 == 1, scalefacs = sfs)
    }
    val scfsi = Vector.tabulate(4)(b => (i + b) % 3 == 0)
    val g0 = granule(0, None, scfsi)
    Mp3.Mp3FrameData(3, 2, padding = i % 2 == 1, scfsi,
      Vector(g0, granule(1, Some(g0), scfsi)))
  }

  test("bit reservoir: main_data_begin grows with the slot/data gap, " +
      "clamps at 511, frames recover identically through the " +
      "reservoir walk, and the plain demux rejects the stream loudly") {
    val frames = (0 until 10).map(smallFrame)
    val bytes = Mp3.muxReservoir(frames)
    val rec = Mp3.demuxReservoir(bytes)
    assert(rec.size == 10)
    rec.zip(frames).zipWithIndex.foreach { case (((_, mdb, got), want), i) =>
      assert(got.scfsi == want.scfsi, s"frame $i scfsi")
      got.granules.zip(want.granules).foreach { case (g, w) =>
        assert(g.bigValues == w.bigValues && g.count1 == w.count1 &&
          g.scalefacs == w.scalefacs && g.globalGain == w.globalGain,
          s"frame $i granules")
      }
      // the expected lag: min(511, sum of (slot - main) so far)
      val mains = frames.take(i).map(f => (f.bodyBits + 7) / 8)
      val slots = frames.take(i).map(_.frameLen - 21)
      // dataStart follows the clamp recurrence; replay it directly
      var end = 0; var ds = 0
      (0 until i).foreach { j =>
        ds = math.max(end, slots.take(j).sum - 511)
        end = ds + mains(j)
      }
      val expect = math.min(511, slots.sum - end)
      assert(mdb == (if (i == 0) 0 else expect), s"frame $i mdb $mdb")
      if (i >= 4) assert(mdb == 511, s"frame $i should be clamped")
    }
    assert(rec.exists(r => r._2 > 0 && r._2 < 511),
      "the fixture must exercise the growing regime")
    // the plain walk refuses a reservoir stream by name
    val ex = intercept[IllegalArgumentException] { Mp3.demux(bytes) }
    assert(ex.getMessage.contains("demuxReservoir"))
    // plain streams round-trip through the reservoir walk too (mdb 0)
    val plain = Mp3.mux(frames.take(3))
    assert(Mp3.demuxReservoir(plain).forall(_._2 == 0))
  }

  /** A window-switching granule: bt 2 short (36 scalefactors), bt 2
    * mixed (35), or bt 1/3 start/stop (long 21-slot layout). */
  private def splitGranule(i: Int, gr: Int, bt: Int,
      mixed: Boolean): Mp3.Granule = {
    val bs = Mp3.BlockSplit(bt, mixed,
      ((i + gr) % 4, (i * 3 + gr) % 4, (i + 2 * gr) % 4))
    val bv = 10 + (i * 7 + gr * 3) % 30
    val boundary = if (bt == 2 && !mixed) 18 else 36
    val r0 = math.min(bv, boundary)
    val cubes = Array(0, 1, 8, 27)
    val pairs = Vector.tabulate(bv) { p =>
      def v(s2: Int): Int = {
        val idx = p * 2 + s2
        val m = cubes((i * 5 + idx * 7 + gr * 11) % (if (p < r0) 3 else 4))
        if (m != 0 && (idx + i) % 2 == 1) -m else m
      }
      (v(0), v(1))
    }
    val sfc = (i + 2 * gr) % 16
    val (s1, s2) = Mp3.Slen(sfc)
    val nSf = if (bt != 2) 21 else if (mixed) 35 else 36
    val sfs = Vector.tabulate(nSf) { slot =>
      val isS1 =
        if (bt != 2) slot < 11
        else if (mixed) slot < 17
        else slot < 18
      val len = if (isS1) s1 else s2
      if (len > 0) (i * 3 + slot * 5 + gr * 7) % (1 << len) else 0
    }
    Mp3.Granule(pairs, Vector.empty, 234 + 4 * ((i + gr) % 6), sfc,
      ((i + gr) % 14, 18 + (i * 5 + gr) % 2, 0), 0, 0,
      preflag = false, scalefacScale = i % 2 == 1,
      scalefacs = sfs, blockSplit = Some(bs))
  }

  test("window switching [§2.4.1.7]: block_type/mixed_block_flag/" +
      "subblock_gain round-trip in the 22-bit alternate side-info " +
      "form, short and mixed scalefactor layouts store 36/35 values, " +
      "region boundaries are FIXED (region 2 empty), and subblock " +
      "gain shifts the reorder-window requant by 8·sbg") {
    val regimes = Seq((2, false), (2, true), (1, false), (3, false))
    val frames = (0 until 8).map { i =>
      val (bt0, mx0) = regimes(i % 4)
      val (bt1, mx1) = regimes((i + 1) % 4)
      Mp3.Mp3FrameData(14, 2, padding = i % 2 == 1,
        Vector.fill(4)(false),
        Vector(splitGranule(i, 0, bt0, mx0),
          splitGranule(i, 1, bt1, mx1)))
    }
    val rec = Mp3.demux(Mp3.mux(frames))
    assert(rec.size == 8)
    rec.zip(frames).zipWithIndex.foreach { case (((_, got), want), i) =>
      got.granules.zip(want.granules).zipWithIndex.foreach {
        case ((g, w), gr) =>
          assert(g.blockSplit == w.blockSplit, s"frame $i gr $gr split")
          assert(g.scalefacs == w.scalefacs, s"frame $i gr $gr sfs")
          assert(g.bigValues == w.bigValues, s"frame $i gr $gr values")
          assert(g.tableSelect == w.tableSelect && g.region0Count == 0 &&
            g.region1Count == 0)
          // fixed boundaries: 18 pairs short non-mixed, 36 otherwise
          val bs = g.blockSplit.get
          val (r0, r1, r2) = g.regionPairs
          val want0 = math.min(g.bigValues.length,
            if (bs.blockType == 2 && !bs.mixed) 18 else 36)
          assert(r0 == want0 && r1 == g.bigValues.length - want0 &&
            r2 == 0, s"frame $i gr $gr regions")
      }
    }
    // reorder-window map: band-major triplets under the stand-in
    // short sfb table — band b spans [3(b²+b), 3((b+1)²+(b+1))) with
    // window width 2b+2
    assert(Mp3.shortWindow(0, mixed = false) == 0)
    assert(Mp3.shortWindow(1, mixed = false) == 0) // band 0 w0 = {0,1}
    assert(Mp3.shortWindow(2, mixed = false) == 1)
    assert(Mp3.shortWindow(5, mixed = false) == 2)
    assert(Mp3.shortWindow(6, mixed = false) == 0) // band 1 starts
    assert(Mp3.shortWindow(9, mixed = false) == 0) // width 4: {6..9}
    assert(Mp3.shortWindow(10, mixed = false) == 1)
    // mixed: the long region has no window; 36 is short band 3 w0
    assert(Mp3.shortWindow(36, mixed = true) == 0)
    intercept[IllegalArgumentException] {
      Mp3.shortWindow(35, mixed = true)
    }
    // subblock gain: gain − 8·sbg on the exact regime
    assert(Mp3.requantExact(8, 242 - 8 * 2) ==
      Mp3.requantExact(8, 226))
    val g = splitGranule(3, 0, 2, mixed = false)
    val bs = g.blockSplit.get
    val vals = g.bigValues.flatMap(p => Seq(p._1, p._2))
    val req = vals.zipWithIndex.map { case (v, j) =>
      val gain = g.globalGain - 8 * bs.sbg(Mp3.shortWindow(j, mixed = false))
      Mp3.requantExact(v, gain)
    }.sum
    assert(req != vals.map(Mp3.requantExact(_, g.globalGain)).sum,
      "the fixture must have nonzero subblock gains somewhere")
    // loud boundaries
    intercept[IllegalArgumentException] { // scfsi with a short granule
      Mp3.Mp3FrameData(14, 2, padding = false,
        Vector(true, false, false, false),
        Vector(splitGranule(0, 0, 2, mixed = false),
          splitGranule(0, 1, 2, mixed = false)))
    }
    intercept[IllegalArgumentException] { // block_type 0 forbidden
      Mp3.BlockSplit(0, mixed = false, (0, 0, 0))
    }
    intercept[IllegalArgumentException] { // mixed needs short blocks
      Mp3.BlockSplit(1, mixed = true, (0, 0, 0))
    }
    // start/stop blocks still share via scfsi (long layout)
    val f13 = Mp3.Mp3FrameData(14, 2, padding = false,
      Vector(true, false, false, false),
      Vector(splitGranule(0, 0, 1, mixed = false), {
        val base = splitGranule(0, 1, 3, mixed = false)
        val g0 = splitGranule(0, 0, 1, mixed = false)
        base.copy(scalefacs = base.scalefacs.zipWithIndex.map {
          case (v, b) => if (b < 6) g0.scalefacs(b) else v })
      }))
    val rt = Mp3.demux(Mp3.mux(Seq(f13)))
    assert(rt.head._2.granules(1).scalefacs.take(6) ==
      f13.granules(0).scalefacs.take(6), "scfsi band 0 shared")
  }

  test("streaming reservoir step: the ≤ 511-byte window is the whole " +
      "cross-frame state — the one-frame-at-a-time walk recovers " +
      "exactly what the whole-stream walk does, and a window-overrun " +
      "is loud") {
    // reuse the reservoir fixture family (48 kbps, small granules)
    def smallFrame(i: Int): Mp3.Mp3FrameData = {
      val base = frame(i)
      base.copy(bitrateIndex = 3,
        granules = base.granules.map(g => g.copy(
          bigValues = g.bigValues.take(8), count1 = g.count1.take(2))))
    }
    val frames = (0 until 8).map(smallFrame)
    val bytes = Mp3.muxReservoir(frames)
    val whole = Mp3.demuxReservoir(bytes)
    var window = Array.empty[Byte]
    var pos = 0
    frames.indices.foreach { i =>
      val fl = frames(i).frameLen
      val slice = java.util.Arrays.copyOfRange(bytes, pos, pos + fl)
      pos += fl
      val (f, mdb, kept) = Mp3.demuxReservoirStep(slice, window)
      window = kept
      assert(mdb == whole(i)._2, s"frame $i mdb")
      assert(f.granules.map(_.bigValues) ==
        whole(i)._3.granules.map(_.bigValues), s"frame $i values")
      assert(f.granules.map(_.scalefacs) ==
        whole(i)._3.granules.map(_.scalefacs), s"frame $i sfs")
      assert(window.length <= 511, s"frame $i window size")
    }
    assert(pos == bytes.length)
    // a reservoir frame decoded with NO history is loud
    val lastStart = bytes.length - frames.last.frameLen
    val ex = intercept[IllegalArgumentException] {
      Mp3.demuxReservoirStep(java.util.Arrays.copyOfRange(
        bytes, lastStart, bytes.length), Array.empty)
    }
    assert(ex.getMessage.contains("window"))
  }

  /** A long-block stereo granule; `zeroTail` truncates coded content
    * for intensity fixtures and forces the last sample nonzero. */
  private def stGranule(i: Int, gr: Int, ch: Int,
      bvOverride: Int = -1, isSfc: Boolean = false): Mp3.Granule = {
    val bv = if (bvOverride >= 0) bvOverride
      else 10 + (i * 7 + gr * 3 + ch * 5) % 30
    val rc0 = (i + gr + ch) % 6
    val rc1 = (i * 3 + gr + ch) % 6
    val r0 = math.min(bv, (rc0 + 1) * (rc0 + 2) / 2)
    val r1 = math.min(bv, (rc0 + rc1 + 2) * (rc0 + rc1 + 3) / 2) - r0
    val cubes = Array(0, 1, 8); val cubes2 = Array(0, 1, 8, 27)
    val pairs = Vector.tabulate(bv) { p =>
      def v(s2: Int): Int = {
        val idx = p * 2 + s2
        var m = if (p < r0 + r1)
          cubes((i * 5 + idx * 7 + gr * 11 + ch * 13) % 3)
        else cubes2((i * 5 + idx * 7 + gr * 11 + ch * 13) % 4)
        if (idx == 2 * bv - 1 && m == 0) m = 1 // pin the zero_part edge
        if (m != 0 && (idx + i + ch) % 2 == 1) -m else m
      }
      (v(0), v(1))
    }
    val sfc = if (isSfc) 13 else (i + 2 * gr + ch) % 16
    val (s1, s2) = Mp3.Slen(sfc)
    val sfs = Vector.tabulate(21) { band =>
      val len = if (band < 11) s1 else s2
      if (isSfc) Array(0, 3, 6)((i + band) % 3)
      else if (len > 0) (i * 3 + band * 5 + gr * 7 + ch) % (1 << len)
      else 0
    }
    Mp3.Granule(pairs, Vector.empty, 214 + 4 * ((i + gr + ch) % 7), sfc,
      ((i + gr + ch) % 14, 1 + (i * 5 + gr + ch) % 14,
        18 + (i + gr + ch) % 2), rc0, rc1,
      preflag = false, scalefacScale = false, scalefacs = sfs)
  }

  test("stereo [§2.4.1.3/§2.4.3.4.9]: the 32-byte two-channel side " +
      "info round-trips gr-major channel-minor, mode/mode_extension " +
      "ride the header, MS reconstruction is exact on the √2-scaled " +
      "form, and intensity positions decode on the {0,3,6} grid " +
      "above the right channel's zero part") {
    val modes = Seq((0, 0), (1, 2), (1, 1), (1, 3))
    val frames = (0 until 8).map { i =>
      val (mode, ext) = modes(i % 4)
      val gs = Vector.tabulate(2) { gr =>
        Vector.tabulate(2) { ch =>
          if (ch == 1 && (ext & 1) == 1)
            stGranule(i, gr, ch, bvOverride = 4 + (i * 5 + gr) % 8,
              isSfc = true)
          else stGranule(i, gr, ch)
        }
      }
      Mp3.Mp3StereoFrame(14, 2, padding = i % 2 == 1, mode, ext,
        Vector.fill(2)(Vector.fill(4)(false)), gs)
    }
    val rec = Mp3.demuxStereo(Mp3.muxStereo(frames))
    assert(rec.size == 8)
    rec.zip(frames).zipWithIndex.foreach { case (((_, got), want), i) =>
      assert(got.mode == want.mode && got.modeExt == want.modeExt,
        s"frame $i header mode bits")
      for (gr <- 0 until 2; ch <- 0 until 2) {
        val g = got.granules(gr)(ch); val w = want.granules(gr)(ch)
        assert(g.bigValues == w.bigValues, s"f$i gr$gr ch$ch values")
        assert(g.scalefacs == w.scalefacs, s"f$i gr$gr ch$ch sfs")
        assert(g.globalGain == w.globalGain &&
          g.tableSelect == w.tableSelect &&
          g.scalefacCompress == w.scalefacCompress)
        assert(got.part23Length(gr, ch) == want.part23Length(gr, ch))
      }
    }
    // MS: √2-scaled exactness + the energy identity
    assert(Mp3.msScaled(5, 3) == ((8L, 2L)))
    val (l, r) = Mp3.msScaled(16, -2)
    assert(l * l + r * r == 2 * (16 * 16 + 2 * 2),
      "(l√2)² + (r√2)² = 2(m² + s²)")
    // intensity: the exact grid
    assert(Mp3.intensityExact(16, 0) == ((0L, 16L)))
    assert(Mp3.intensityExact(16, 3) == ((8L, 8L)))
    assert(Mp3.intensityExact(16, 6) == ((16L, 0L)))
    intercept[IllegalArgumentException] { Mp3.intensityExact(16, 7) }
    intercept[IllegalArgumentException] { Mp3.intensityExact(15, 3) }
    intercept[IllegalArgumentException] { Mp3.intensityExact(16, 2) }
    // intensity bound: first long band at/after the zero_part start
    val right = rec(2)._2.granules(0)(1) // an IS frame's right channel
    val bound = Mp3.intensityBound(right)
    val lastNz = (0 until 2 * right.bigValues.length).reverse.find { j =>
      val p = right.bigValues(j / 2)
      (if (j % 2 == 0) p._1 else p._2) != 0
    }.get
    assert(Mp3.SfbOffsets(bound) >= lastNz + 1 &&
      (bound == 0 || Mp3.SfbOffsets(bound - 1) < lastNz + 1))
    // is_pos values in the region are on the exact grid by fixture
    ((bound until 21)).foreach { b =>
      assert(Seq(0, 3, 6).contains(right.scalefacs(b)),
        s"band $b is_pos")
    }
    // an all-zero granule's bound is 0 (whole spectrum intensity)
    assert(Mp3.intensityBound(stGranule(0, 0, 1, bvOverride = 0)
      .copy(bigValues = Vector.empty)) == 0)
    // loud boundaries
    intercept[IllegalArgumentException] { // mono header in demuxStereo
      Mp3.demuxStereo(Mp3.mux(Seq(frame(0))))
    }
    intercept[IllegalArgumentException] { // mode_extension needs joint
      Mp3.Mp3StereoFrame(14, 2, padding = false, 0, 2,
        Vector.fill(2)(Vector.fill(4)(false)),
        Vector.tabulate(2)(gr => Vector.tabulate(2)(ch =>
          stGranule(0, gr, ch))))
    }
  }

  // ---- hybrid filterbank (§2.4.3.4.10-16, Mp3Pcm) --------------------------

  test("hybrid filterbank: the polyphase kernel lemma — one impulse " +
      "in subband sb contributes exactly subbandKernels(sb) to the " +
      "next 16 steps' summed outputs (the p31 oracle's core identity)") {
    import graft.sources.Mp2
    val kernels = Mp2.subbandKernels()
    Seq(0, 1, 3, 7, 31).foreach { sb =>
      val synth = new Mp2.Synth()
      val imp = Array.tabulate(32)(s => if (s == sb) 5L else 0L)
      (0 until 16).foreach { a =>
        val out = synth.stepL(if (a == 0) imp else new Array[Long](32))
        assert(out.sum == 5L * kernels(sb)(a),
          s"sb $sb age $a kernel mismatch")
      }
      // and the sample-0 kernel (the pcm0 functional)
      val synth2 = new Mp2.Synth()
      (0 until 16).foreach { a =>
        val out = synth2.stepL(if (a == 0) imp else new Array[Long](32))
        val k0 = Mp2.Matrix(if (a % 2 == 0) 0 else 32)(sb).toLong *
          Mp2.Window(32 * a)
        assert(out(0) == 5L * k0, s"sb $sb age $a k0 mismatch")
      }
    }
  }

  test("hybrid filterbank: dequant+reorder places coded short lines at " +
      "(window-line/6, 6w + line%6), mixed blocks keep the first 36 " +
      "lines long, and the alias butterflies hit only the 8 lines " +
      "each side of active boundaries") {
    import graft.sources.Mp3Pcm
    // short granule: a single nonzero coded value at band 2, window 1,
    // in-band index 1 → window line l = off(2)+1 = 7 → sb 1, slot 6+1
    val bs = Mp3.BlockSplit(2, mixed = false, (0, 1, 0))
    val off2 = Mp3.SfbOffsetsShort(2) // 6
    val width2 = Mp3.SfbOffsetsShort(3) - off2
    val j = 3 * off2 + 1 * width2 + 1
    val pairs = Vector.tabulate((j + 2) / 2) { pi =>
      (if (2 * pi == j) 8 else 0, if (2 * pi + 1 == j) 8 else 0)
    }
    val g = Mp3.Granule(pairs, Vector.empty, 218, 0, (2, 18, 0),
      0, 0, preflag = false, scalefacScale = false,
      scalefacs = Vector.fill(36)(0), blockSplit = Some(bs))
    val xs = Mp3Pcm.dequantGranule(g)
    val l = off2 + 1
    // gain 218 − 8·sbg(1) = 210 → xr = 2^4 = 16
    assert(xs(l / 6)(6 * 1 + l % 6) == 16L)
    assert(xs.iterator.flatten.map(math.abs).sum == 16L)
    // mixed: line 5 is LONG (sb 0, k 5) at global gain
    val bsM = Mp3.BlockSplit(2, mixed = true, (0, 0, 0))
    val gM = g.copy(bigValues = Vector.tabulate(3)(pi =>
      (0, if (2 * pi + 1 == 5) 1 else 0)),
      globalGain = 214, blockSplit = Some(bsM),
      scalefacs = Vector.fill(35)(0))
    val xsM = Mp3Pcm.dequantGranule(gM)
    assert(xsM(0)(5) == 2L) // 1^(4/3)·2^((214−210)/4)
    // alias: impulse at sb1 line 0 spreads to sb0 line 17 iff the
    // boundary is active
    val one = Array.fill(32, 18)(0L); one(1)(0) = 100L
    val long = Mp3Pcm.aliasReduce(one, 31)
    assert(long(0)(17) == -Mp3Pcm.CaQ(0).toLong * 100 &&
      long(1)(0) == Mp3Pcm.CsQ(0).toLong * 100)
    val short = Mp3Pcm.aliasReduce(one, 0)
    assert(short(0)(17) == 0L &&
      short(1)(0) == Mp3Pcm.Q.toLong * 100)
    // cs² + ca² ≈ Q² (the §2.4.3.4.10.1 formulas are a rotation)
    (0 until 8).foreach { i =>
      val n = Mp3Pcm.CsQ(i).toLong * Mp3Pcm.CsQ(i) +
        Mp3Pcm.CaQ(i).toLong * Mp3Pcm.CaQ(i)
      assert(math.abs(n - Mp3Pcm.Q.toLong * Mp3Pcm.Q) <= 2 * Mp3Pcm.Q)
    }
  }

  test("hybrid filterbank: Hybrid.granule equals the explicit " +
      "alias → IMDCT-window → overlap-add → inversion → polyphase " +
      "composition (the exact formula the p31 oracle replays), " +
      "including the cross-granule overlap tail") {
    import graft.sources.{Mp2, Mp3Pcm}
    def granule(i: Int, gr: Int): Mp3.Granule = {
      val regime = (i + gr) % 5
      val split = regime match {
        case 1 => Some(Mp3.BlockSplit(1, mixed = false, (0, 0, 0)))
        case 2 => Some(Mp3.BlockSplit(2, mixed = false,
          (i % 2, gr, (i + gr) % 2)))
        case 3 => Some(Mp3.BlockSplit(2, mixed = true, (0, 1, 1)))
        case 4 => Some(Mp3.BlockSplit(3, mixed = false, (0, 0, 0)))
        case _ => None
      }
      val bv = 8 + (i * 7 + gr * 3) % 8
      val cubes = Array(0, 1, 8)
      val pairs = Vector.tabulate(bv) { pi =>
        def v(s2: Int): Int = {
          val idx = 2 * pi + s2
          val m = cubes((i * 5 + idx * 7 + gr * 11) % 3)
          if (m != 0 && (idx + i) % 2 == 1) -m else m
        }
        (v(0), v(1))
      }
      val gain = 218 + 4 * ((i + gr) % 2)
      val nSf = split match {
        case Some(bs) if bs.blockType == 2 && !bs.mixed => 36
        case Some(bs) if bs.blockType == 2 => 35
        case _ => 21
      }
      Mp3.Granule(pairs, Vector.empty, gain, 0,
        (2, 18, if (split.isEmpty) 19 else 0),
        if (split.isEmpty) 1 else 0, if (split.isEmpty) 2 else 0,
        preflag = false, scalefacScale = false,
        scalefacs = Vector.fill(nSf)(0), blockSplit = split)
    }
    val gs = for (i <- 0 until 3; gr <- 0 until 2) yield granule(i, gr)
    // reference composition, carried explicitly across granules
    val prev = Array.fill(32, 18)(0L)
    val synth = new Mp2.Synth()
    val hybrid = new Mp3Pcm.Hybrid()
    gs.foreach { g =>
      val boundaries = g.blockSplit match {
        case Some(bs) if bs.blockType == 2 => if (bs.mixed) 1 else 0
        case _ => 31
      }
      val xa = Mp3Pcm.aliasReduce(Mp3Pcm.dequantGranule(g), boundaries)
      val want = new Array[Long](576)
      val slots = Array.fill(18, 32)(0L)
      (0 until 32).foreach { sb =>
        val bt = g.blockSplit match {
          case Some(bs) =>
            if (bs.blockType == 2 && bs.mixed && sb < 2) 0
            else bs.blockType
          case None => 0
        }
        val cur = Array.tabulate(36)(j =>
          (0 until 18).map(k =>
            Mp3Pcm.imdctWin(bt)(j)(k).toLong * xa(sb)(k)).sum)
        (0 until 18).foreach { t =>
          val v = prev(sb)(t) + cur(t)
          slots(t)(sb) = if (sb % 2 == 1 && t % 2 == 1) -v else v
          prev(sb)(t) = cur(t + 18)
        }
      }
      (0 until 18).foreach { t =>
        val pcm = synth.stepL(slots(t))
        System.arraycopy(pcm, 0, want, 32 * t, 32)
      }
      val got = hybrid.granule(g)
      assert(got.toSeq == want.toSeq)
      assert(got.exists(_ != 0L), "a coded granule must reach PCM")
    }
    // a zero granule after content still rings the overlap tail +
    // the polyphase register
    val tail = hybrid.granule(granule(0, 0).copy(
      bigValues = Vector.empty, count1 = Vector.empty))
    assert(tail.exists(_ != 0L),
      "overlap-add and the V register must carry across granules")
  }
}
