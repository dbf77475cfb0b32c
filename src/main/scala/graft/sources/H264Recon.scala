package graft.sources

/** H.264 INTRA PIXEL RECONSTRUCTION (ITU-T H.264 (2003) §8.3/§8.5) —
  * the decode-to-pixels leg on top of the CAVLC slice parsers
  * (m62/m64 deliver every coefficient; only I_PCM reached planes
  * before this): §8.3.1's nine Intra_4x4 predictors with the
  * reference-sample availability and substitution rules, §8.3.2's
  * four Intra_16x16 predictors, §8.3.4's chroma predictors with the
  * per-4x4 DC neighbor selection, §8.5's scaling (the normAdjust
  * value matrix printed in the transform clause) + the 4×4 integer
  * inverse core transform with its (x+32)>>6 rounding, the §8.5.6
  * 4×4 Hadamard for I_16x16 luma DC and §8.5.7 2×2 Hadamard for
  * chroma DC (both with their low-QP rounding branches), the
  * macroblock QP chain (pic_init_qp + slice_qp_delta + cumulative
  * mb_qp_delta), and Clip1 reconstruction.
  *
  * Loud boundaries: chroma_qp_index_offset must keep qPc in the
  * identity region of Table 8-15 (qP < 30 — the mapped tail is a
  * printed value column this build treats as out of scope), and
  * deblocking (§8.7) is NOT applied (the reference's decode surface
  * without the loop filter; the follow-on leg). All arithmetic is
  * integer; the m68 oracle replays the closed-form fixture while
  * H264Spec pins each predictor/transform against hand values. */
object H264Recon {

  /** §8.5's scaling values (the normAdjust matrix in the transform
    * clause): row qP%6, column = position class (0: both even,
    * 1: both odd, 2: mixed). */
  val DequantV: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  def levelScale(m: Int, i: Int, j: Int): Int =
    if (i % 2 == 0 && j % 2 == 0) DequantV(m)(0)
    else if (i % 2 == 1 && j % 2 == 1) DequantV(m)(1)
    else DequantV(m)(2)

  def clip1(v: Long): Int = math.max(0L, math.min(255L, v)).toInt

  /** Scan-space 16 coefficients → raster 4×4 dequantized d
    * (§8.5.8's dij = cij · LS(qP%6, i, j) << (qP/6)); `skipDc`
    * leaves d(0,0) to the caller (I_16x16's Hadamard path). */
  def dequant4x4(scan: Array[Int], qP: Int,
      skipDc: Boolean = false): Array[Array[Long]] = {
    require(scan.length == 16, "h264 recon: 16 scan coefficients")
    require(qP >= 0 && qP <= 51, s"h264 recon: qP $qP")
    val d = Array.fill(4, 4)(0L)
    var s = 0
    while (s < 16) {
      val r = H264.ZigZag4x4(s)
      val (i, j) = (r % 4, r / 4) // (x, y)
      if (!(skipDc && r == 0))
        d(j)(i) = scan(s).toLong * levelScale(qP % 6, i, j) << (qP / 6)
      s += 1
    }
    d
  }

  /** §8.5.10's 4×4 inverse core transform (d raster, row y column x)
    * → residual with the (x + 32) >> 6 rounding. */
  def idct4x4(d: Array[Array[Long]]): Array[Array[Long]] = {
    val e = Array.fill(4, 4)(0L)
    var y = 0
    while (y < 4) { // horizontal
      val r = d(y)
      val e0 = r(0) + r(2); val e1 = r(0) - r(2)
      val e2 = (r(1) >> 1) - r(3); val e3 = r(1) + (r(3) >> 1)
      e(y)(0) = e0 + e3; e(y)(1) = e1 + e2
      e(y)(2) = e1 - e2; e(y)(3) = e0 - e3
      y += 1
    }
    val out = Array.fill(4, 4)(0L)
    var x = 0
    while (x < 4) { // vertical
      val c0 = e(0)(x); val c1 = e(1)(x); val c2 = e(2)(x); val c3 = e(3)(x)
      val g0 = c0 + c2; val g1 = c0 - c2
      val g2 = (c1 >> 1) - c3; val g3 = c1 + (c3 >> 1)
      out(0)(x) = (g0 + g3 + 32) >> 6; out(1)(x) = (g1 + g2 + 32) >> 6
      out(2)(x) = (g1 - g2 + 32) >> 6; out(3)(x) = (g0 - g3 + 32) >> 6
      x += 1
    }
    out
  }

  /** §8.5.6: I_16x16 luma DC — 4×4 inverse Hadamard then scaling
    * with the low-QP rounding branch. Input raster 4×4 of the
    * (zig-zag-delivered) DC levels; output the per-4x4-block DC
    * values d(0,0). */
  def lumaDcTransform(dc: Array[Array[Long]], qP: Int)
      : Array[Array[Long]] = {
    val f = hadamard4(dc)
    val ls = levelScale(qP % 6, 0, 0).toLong
    f.map(_.map { v =>
      if (qP >= 12) (v * ls) << (qP / 6 - 2)
      else (v * ls + (1L << (1 - qP / 6))) >> (2 - qP / 6)
    })
  }

  /** §8.5.7: chroma DC — 2×2 inverse Hadamard then scaling. */
  def chromaDcTransform(dc: Array[Long], qPc: Int): Array[Long] = {
    require(dc.length == 4, "h264 recon: 2x2 chroma DC")
    val f = Array(
      dc(0) + dc(1) + dc(2) + dc(3), dc(0) - dc(1) + dc(2) - dc(3),
      dc(0) + dc(1) - dc(2) - dc(3), dc(0) - dc(1) - dc(2) + dc(3))
    val ls = levelScale(qPc % 6, 0, 0).toLong
    f.map { v =>
      if (qPc >= 6) (v * ls) << (qPc / 6 - 1)
      else (v * ls) >> 1
    }
  }

  private def hadamard4(d: Array[Array[Long]]): Array[Array[Long]] = {
    val e = Array.fill(4, 4)(0L)
    var y = 0
    while (y < 4) {
      val r = d(y)
      val e0 = r(0) + r(2); val e1 = r(0) - r(2)
      val e2 = r(1) - r(3); val e3 = r(1) + r(3)
      e(y)(0) = e0 + e3; e(y)(1) = e1 + e2
      e(y)(2) = e1 - e2; e(y)(3) = e0 - e3
      y += 1
    }
    val out = Array.fill(4, 4)(0L)
    var x = 0
    while (x < 4) {
      val c0 = e(0)(x); val c1 = e(1)(x); val c2 = e(2)(x); val c3 = e(3)(x)
      val g0 = c0 + c2; val g1 = c0 - c2
      val g2 = c1 - c3; val g3 = c1 + c3
      out(0)(x) = g0 + g3; out(1)(x) = g1 + g2
      out(2)(x) = g1 - g2; out(3)(x) = g0 - g3
      x += 1
    }
    out
  }

  /** Table 8-15's identity region: qPc = qP for qP < 30 (the mapped
    * tail is printed value data — out of scope, loud). */
  def chromaQp(qP: Int): Int = {
    require(qP >= 0 && qP < 30,
      s"h264 recon: qP $qP reaches Table 8-15's mapped tail " +
        "(out of this leg's scope)")
    qP
  }

  /** Neighbor samples for one 4×4 intra block (§8.3.1.2's reference
    * layout): `left(4)` p(−1, 0..3), `top(4)` p(0..3, −1),
    * `topLeft` p(−1,−1), `topRight(4)` p(4..7, −1) AFTER the
    * §8.3.1.2 substitution (unavailable top-right replaced by
    * p(3,−1) when top is available). Availability flags gate DC and
    * the directional modes' legality. */
  final case class Nbr(left: Array[Int], top: Array[Int],
      topLeft: Int, topRight: Array[Int],
      leftAvail: Boolean, topAvail: Boolean, topLeftAvail: Boolean)

  /** §8.3.1.2.1–.9: the nine Intra_4x4 predictors. Output raster
    * pred(y)(x). Illegal mode/availability pairs are loud (a
    * conformant encoder never codes them). */
  def pred4x4(mode: Int, n: Nbr): Array[Array[Int]] = {
    val p = Array.fill(4, 4)(0)
    def L(y: Int) = n.left(y)
    def T(x: Int) = if (x < 4) n.top(x) else n.topRight(x - 4)
    mode match {
      case 0 => // Vertical
        require(n.topAvail, "h264 recon: Vertical needs the top row")
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = T(x)
      case 1 => // Horizontal
        require(n.leftAvail, "h264 recon: Horizontal needs the left column")
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = L(y)
      case 2 => // DC
        val v =
          if (n.leftAvail && n.topAvail)
            ((0 until 4).map(L).sum + (0 until 4).map(T).sum + 4) >> 3
          else if (n.leftAvail) ((0 until 4).map(L).sum + 2) >> 2
          else if (n.topAvail) ((0 until 4).map(T).sum + 2) >> 2
          else 128
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = v
      case 3 => // Diagonal Down-Left
        require(n.topAvail, "h264 recon: DDL needs the top row")
        for (y <- 0 until 4; x <- 0 until 4) {
          p(y)(x) =
            if (x == 3 && y == 3) (T(6) + 3 * T(7) + 2) >> 2
            else (T(x + y) + 2 * T(x + y + 1) + T(x + y + 2) + 2) >> 2
        }
      case 4 => // Diagonal Down-Right
        require(n.leftAvail && n.topAvail && n.topLeftAvail,
          "h264 recon: DDR needs left, top and top-left")
        for (y <- 0 until 4; x <- 0 until 4) {
          p(y)(x) =
            if (x > y) (tOrTl(n, x - y - 2) + 2 * tOrTl(n, x - y - 1) +
              tOrTl(n, x - y) + 2) >> 2
            else if (x < y) (lOrTl(n, y - x - 2) + 2 * lOrTl(n, y - x - 1) +
              lOrTl(n, y - x) + 2) >> 2
            else (T(0) + 2 * n.topLeft + L(0) + 2) >> 2
        }
      case 5 => // Vertical-Right
        require(n.leftAvail && n.topAvail && n.topLeftAvail,
          "h264 recon: VR needs left, top and top-left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * x - y
          p(y)(x) =
            if (z >= 0 && z % 2 == 0)
              (tOrTl(n, x - (y >> 1) - 1) + tOrTl(n, x - (y >> 1)) + 1) >> 1
            else if (z >= 0)
              (tOrTl(n, x - (y >> 1) - 2) + 2 * tOrTl(n, x - (y >> 1) - 1) +
                tOrTl(n, x - (y >> 1)) + 2) >> 2
            else if (z == -1) (L(0) + 2 * n.topLeft + T(0) + 2) >> 2
            else (lOrTl(n, y - 1) + 2 * lOrTl(n, y - 2) +
              lOrTl(n, y - 3) + 2) >> 2
        }
      case 6 => // Horizontal-Down
        require(n.leftAvail && n.topAvail && n.topLeftAvail,
          "h264 recon: HD needs left, top and top-left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * y - x
          p(y)(x) =
            if (z >= 0 && z % 2 == 0)
              (lOrTl(n, y - (x >> 1) - 1) + lOrTl(n, y - (x >> 1)) + 1) >> 1
            else if (z >= 0)
              (lOrTl(n, y - (x >> 1) - 2) + 2 * lOrTl(n, y - (x >> 1) - 1) +
                lOrTl(n, y - (x >> 1)) + 2) >> 2
            else if (z == -1) (T(0) + 2 * n.topLeft + L(0) + 2) >> 2
            else (tOrTl(n, x - 1) + 2 * tOrTl(n, x - 2) +
              tOrTl(n, x - 3) + 2) >> 2
        }
      case 7 => // Vertical-Left
        require(n.topAvail, "h264 recon: VL needs the top row")
        for (y <- 0 until 4; x <- 0 until 4) {
          p(y)(x) =
            if (y % 2 == 0) (T(x + (y >> 1)) + T(x + (y >> 1) + 1) + 1) >> 1
            else (T(x + (y >> 1)) + 2 * T(x + (y >> 1) + 1) +
              T(x + (y >> 1) + 2) + 2) >> 2
        }
      case 8 => // Horizontal-Up
        require(n.leftAvail, "h264 recon: HU needs the left column")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = x + 2 * y
          p(y)(x) =
            if (z < 5 && z % 2 == 0) (L(y + (x >> 1)) + L(y + (x >> 1) + 1) + 1) >> 1
            else if (z < 5)
              (L(y + (x >> 1)) + 2 * L(y + (x >> 1) + 1) +
                L(y + (x >> 1) + 2) + 2) >> 2
            else if (z == 5) (L(2) + 3 * L(3) + 2) >> 2
            else L(3)
        }
      case other => throw new IllegalArgumentException(
        s"h264 recon: Intra_4x4 mode $other")
    }
    p
  }
  // VR/HD's diagonal walks reach index −1 = the top-left sample
  private def tOrTl(n: Nbr, i: Int): Int =
    if (i < 0) n.topLeft
    else if (i < 4) n.top(i) else n.topRight(i - 4)
  private def lOrTl(n: Nbr, i: Int): Int =
    if (i < 0) n.topLeft else n.left(i)

  /** §8.3.2 / §8.3.4: the shared 16×16-luma / 8×8-chroma predictor
    * family over a `size`×`size` block — 0 Vertical, 1 Horizontal,
    * 2 DC, 3 Plane (the chroma MODE numbering swaps DC to 0; callers
    * map). For chroma DC the per-4x4 neighbor selection of §8.3.4.1
    * applies — [[predChromaDc]]. */
  def predBlock(mode: Int, size: Int, left: Array[Int],
      top: Array[Int], topLeft: Int, leftAvail: Boolean,
      topAvail: Boolean): Array[Array[Int]] = {
    val p = Array.fill(size, size)(0)
    mode match {
      case 0 =>
        require(topAvail, "h264 recon: Vertical needs the top row")
        for (y <- 0 until size; x <- 0 until size) p(y)(x) = top(x)
      case 1 =>
        require(leftAvail, "h264 recon: Horizontal needs the left column")
        for (y <- 0 until size; x <- 0 until size) p(y)(x) = left(y)
      case 2 =>
        val v =
          if (leftAvail && topAvail)
            (left.sum + top.sum + size) / (2 * size)
          else if (leftAvail) (left.sum + size / 2) / size
          else if (topAvail) (top.sum + size / 2) / size
          else 128
        for (y <- 0 until size; x <- 0 until size) p(y)(x) = v
      case 3 => // Plane [§8.3.2.4 / §8.3.4.4]
        require(leftAvail && topAvail,
          "h264 recon: Plane needs left and top")
        val half = size / 2
        var hAcc = 0L; var vAcc = 0L
        var i = 1
        while (i <= half) {
          val tR = top(half - 1 + i)
          val tL = if (half - 1 - i >= 0) top(half - 1 - i) else topLeft
          hAcc += i.toLong * (tR - tL)
          val lD = left(half - 1 + i)
          val lU = if (half - 1 - i >= 0) left(half - 1 - i) else topLeft
          vAcc += i.toLong * (lD - lU)
          i += 1
        }
        // 16x16: b = (5H+32)>>6, c = (5V+32)>>6; 8x8: (17H+16)>>5
        val (b, c) =
          if (size == 16) (((5 * hAcc + 32) >> 6), ((5 * vAcc + 32) >> 6))
          else (((17 * hAcc + 16) >> 5), ((17 * vAcc + 16) >> 5))
        val a = 16L * (left(size - 1) + top(size - 1))
        for (y <- 0 until size; x <- 0 until size)
          p(y)(x) = clip1((a + b * (x - (half - 1)) +
            c * (y - (half - 1)) + 16) >> 5)
      case other => throw new IllegalArgumentException(
        s"h264 recon: block predictor mode $other")
    }
    p
  }

  /** §8.3.4.1: chroma DC is PER 4×4 sub-block — corner blocks use
    * both/specified neighbors: (0,0) left+top, (4,0) top (else
    * left), (0,4) left (else top), (4,4) left+top — each falling
    * back per availability, 128 when nothing is available. */
  def predChromaDc(left: Array[Int], top: Array[Int],
      leftAvail: Boolean, topAvail: Boolean): Array[Array[Int]] = {
    val p = Array.fill(8, 8)(0)
    for (by <- 0 until 2; bx <- 0 until 2) {
      val ls = (0 until 4).map(i => left(4 * by + i)).sum
      val ts = (0 until 4).map(i => top(4 * bx + i)).sum
      val useTopFirst = bx == 1 && by == 0
      val useLeftFirst = bx == 0 && by == 1
      val v =
        if (useTopFirst)
          if (topAvail) (ts + 2) >> 2
          else if (leftAvail) (ls + 2) >> 2 else 128
        else if (useLeftFirst)
          if (leftAvail) (ls + 2) >> 2
          else if (topAvail) (ts + 2) >> 2 else 128
        else if (leftAvail && topAvail) (ls + ts + 4) >> 3
        else if (leftAvail) (ls + 2) >> 2
        else if (topAvail) (ts + 2) >> 2
        else 128
      for (y <- 0 until 4; x <- 0 until 4) p(4 * by + y)(4 * bx + x) = v
    }
    p
  }

  /** Decoded 4:2:0 planes (y: h×w, u/v: h/2 × w/2), row-major. */
  final case class Planes(width: Int, height: Int,
      y: Array[Array[Int]], u: Array[Array[Int]], v: Array[Array[Int]])

  // decode order of the 4x4 block at raster (bx, by) — inverse of
  // blk4x4Pos (§6.4.3)
  private val blkOrder: Array[Array[Int]] = {
    val o = Array.fill(4, 4)(0)
    (0 until 16).foreach { idx =>
      val (bx, by) = H264.blk4x4Pos(idx); o(by)(bx) = idx
    }
    o
  }

  /** Neighbor gather for luma 4×4 block (mr, mc, bx, by) over the
    * plane-so-far, §6.4.9 availability + the §8.3.1.2 top-right
    * substitution. */
  private def gather(plane: Array[Array[Int]], w: Int,
      mr: Int, mc: Int, bx: Int, by: Int, curIdx: Int): Nbr = {
    val gx = 16 * mc + 4 * bx
    val gy = 16 * mr + 4 * by
    val leftAvail = gx > 0
    val topAvail = gy > 0
    val tlAvail = leftAvail && topAvail
    val left = Array.tabulate(4)(i =>
      if (leftAvail) plane(gy + i)(gx - 1) else 0)
    val top = Array.tabulate(4)(i =>
      if (topAvail) plane(gy - 1)(gx + i) else 0)
    val topLeft = if (tlAvail) plane(gy - 1)(gx - 1) else 0
    // top-right: decoded iff inside the frame AND (in an earlier MB
    // by raster order, OR an earlier 4x4 block of this MB by §6.4.3
    // decode order)
    val trAvail = topAvail && gx + 4 < w && {
      if (by > 0) bx < 3 && blkOrder(by - 1)(bx + 1) < curIdx
      else true // the MB row above (above or above-right MB) is decoded
    }
    val topRight = Array.tabulate(4)(i =>
      if (trAvail) plane(gy - 1)(gx + 4 + i)
      else if (topAvail) top(3) // §8.3.1.2 substitution
      else 0)
    Nbr(left, top, topLeft, topRight, leftAvail, topAvail, tlAvail)
  }

  private def chromaNbr(plane: Array[Array[Int]], mr: Int, mc: Int)
      : (Array[Int], Array[Int], Int, Boolean, Boolean) = {
    val gx = 8 * mc; val gy = 8 * mr
    val la = gx > 0; val ta = gy > 0
    (Array.tabulate(8)(i => if (la) plane(gy + i)(gx - 1) else 0),
      Array.tabulate(8)(i => if (ta) plane(gy - 1)(gx + i) else 0),
      if (la && ta) plane(gy - 1)(gx - 1) else 0, la, ta)
  }

  /** One chroma component of one macroblock: DC levels (4, raster) +
    * per-4x4 AC (15 scan coefficients or empty), §8.5.7 + §8.5.8 +
    * §8.3.4 under `mode` (0 DC, 1 Horizontal, 2 Vertical, 3 Plane —
    * Table 7-16's numbering). */
  private def reconChroma(plane: Array[Array[Int]], mr: Int, mc: Int,
      mode: Int, dcIn: Array[Int], ac: Vector[Array[Int]],
      qPc: Int): Unit = {
    // cbpChroma = 0 parses to empty component arrays — zero levels
    val dc = if (dcIn.isEmpty) Array.fill(4)(0) else dcIn
    val (left, top, tl, la, ta) = chromaNbr(plane, mr, mc)
    val pred = mode match {
      case 0 => predChromaDc(left, top, la, ta)
      case 1 => predBlock(1, 8, left, top, tl, la, ta)
      case 2 => predBlock(0, 8, left, top, tl, la, ta)
      case 3 => predBlock(3, 8, left, top, tl, la, ta)
      case other => throw new IllegalArgumentException(
        s"h264 recon: intra_chroma_pred_mode $other")
    }
    val dcOut = chromaDcTransform(dc.map(_.toLong), qPc)
    for (cby <- 0 until 2; cbx <- 0 until 2) {
      val blk = 2 * cby + cbx
      val scan = new Array[Int](16)
      val acB = if (ac.nonEmpty) ac(blk) else Array.empty[Int]
      if (acB.nonEmpty) {
        require(acB.length == 15, "h264 recon: chroma AC is 15 coeffs")
        System.arraycopy(acB, 0, scan, 1, 15)
      }
      val d = dequant4x4(scan, qPc, skipDc = true)
      d(0)(0) = dcOut(blk)
      val r = idct4x4(d)
      for (y <- 0 until 4; x <- 0 until 4)
        plane(8 * mr + 4 * cby + y)(8 * mc + 4 * cbx + x) =
          clip1(pred(4 * cby + y)(4 * cbx + x) + r(y)(x))
    }
  }

  private def comp(v: Vector[Array[Int]], i: Int): Array[Int] =
    if (v.length > i) v(i) else Array.empty[Int]
  private def compAc(v: Vector[Vector[Array[Int]]], i: Int)
      : Vector[Array[Int]] =
    if (v.length > i) v(i) else Vector.empty

  /** Decode an all-Intra_4x4 CAVLC slice's parse result
    * ([[H264.parseIntraCodedSlice]]) to pixels. */
  def decodeI4Frame(info: H264.SliceInfo, mbs: Vector[H264.CodedMb],
      sps: H264.Sps, pps: H264.Pps): Planes = {
    val mbCols = sps.width / 16; val mbRows = sps.height / 16
    require(mbs.length == mbCols * mbRows,
      "h264 recon: one slice covering the whole picture")
    val y = Array.fill(sps.height, sps.width)(0)
    val u = Array.fill(sps.height / 2, sps.width / 2)(0)
    val v = Array.fill(sps.height / 2, sps.width / 2)(0)
    var qP = pps.picInitQp + info.qpDelta
    mbs.zipWithIndex.foreach { case (mb, mbi) =>
      val (mr, mc) = (mbi / mbCols, mbi % mbCols)
      if (mb.intra.cbp != 0) qP = qP + mb.qpDelta
      require(qP >= 0 && qP <= 51, s"h264 recon: qP $qP out of range")
      (0 until 16).foreach { idx =>
        val (bx, by) = H264.blk4x4Pos(idx)
        val n = gather(y, sps.width, mr, mc, bx, by, idx)
        val pred = pred4x4(mb.intra.lumaModes(idx), n)
        val coeff = mb.luma(idx)
        val r =
          if (coeff.isEmpty) Array.fill(4, 4)(0L)
          else idct4x4(dequant4x4(coeff, qP))
        for (py <- 0 until 4; px <- 0 until 4)
          y(16 * mr + 4 * by + py)(16 * mc + 4 * bx + px) =
            clip1(pred(py)(px) + r(py)(px))
      }
      val qPc = chromaQp(qP)
      reconChroma(u, mr, mc, mb.intra.chromaMode,
        comp(mb.chromaDc, 0), compAc(mb.chromaAc, 0), qPc)
      reconChroma(v, mr, mc, mb.intra.chromaMode,
        comp(mb.chromaDc, 1), compAc(mb.chromaAc, 1), qPc)
    }
    Planes(sps.width, sps.height, y, u, v)
  }

  /** Decode an all-I_16x16 CAVLC slice's parse result
    * ([[H264.parseI16Slice]]) to pixels. */
  def decodeI16Frame(info: H264.SliceInfo, mbs: Vector[H264.I16Mb],
      sps: H264.Sps, pps: H264.Pps): Planes = {
    val mbCols = sps.width / 16; val mbRows = sps.height / 16
    require(mbs.length == mbCols * mbRows,
      "h264 recon: one slice covering the whole picture")
    val y = Array.fill(sps.height, sps.width)(0)
    val u = Array.fill(sps.height / 2, sps.width / 2)(0)
    val v = Array.fill(sps.height / 2, sps.width / 2)(0)
    var qP = pps.picInitQp + info.qpDelta
    mbs.zipWithIndex.foreach { case (mb, mbi) =>
      val (mr, mc) = (mbi / mbCols, mbi % mbCols)
      qP = qP + mb.qpDelta // always present for I_16x16 [§7.3.5]
      require(qP >= 0 && qP <= 51, s"h264 recon: qP $qP out of range")
      val gx = 16 * mc; val gy = 16 * mr
      val la = gx > 0; val ta = gy > 0
      val left = Array.tabulate(16)(i => if (la) y(gy + i)(gx - 1) else 0)
      val top = Array.tabulate(16)(i => if (ta) y(gy - 1)(gx + i) else 0)
      val tl = if (la && ta) y(gy - 1)(gx - 1) else 0
      // Table 7-11 prediction modes: 0 V, 1 H, 2 DC, 3 Plane — the
      // same numbering predBlock uses with V/H swapped to 0/1
      val pred = mb.predMode match {
        case 0 => predBlock(0, 16, left, top, tl, la, ta)
        case 1 => predBlock(1, 16, left, top, tl, la, ta)
        case 2 => predBlock(2, 16, left, top, tl, la, ta)
        case 3 => predBlock(3, 16, left, top, tl, la, ta)
        case other => throw new IllegalArgumentException(
          s"h264 recon: I_16x16 pred mode $other")
      }
      // luma DC rides the 4×4 Hadamard (§8.5.6); its scan is the
      // zig-zag over the DC grid
      val dcRaster = Array.fill(4, 4)(0L)
      (0 until 16).foreach { sp =>
        val r = H264.ZigZag4x4(sp)
        dcRaster(r / 4)(r % 4) = mb.lumaDc(sp).toLong
      }
      val dcOut = lumaDcTransform(dcRaster, qP)
      (0 until 16).foreach { idx =>
        val (bx, by) = H264.blk4x4Pos(idx)
        val scan = new Array[Int](16)
        val acB = if (mb.lumaAc.nonEmpty) mb.lumaAc(idx)
          else Array.empty[Int]
        if (acB.nonEmpty) {
          require(acB.length == 15, "h264 recon: I16 AC is 15 coeffs")
          System.arraycopy(acB, 0, scan, 1, 15)
        }
        val d = dequant4x4(scan, qP, skipDc = true)
        d(0)(0) = dcOut(by)(bx)
        val r = idct4x4(d)
        for (py <- 0 until 4; px <- 0 until 4)
          y(gy + 4 * by + py)(gx + 4 * bx + px) =
            clip1(pred(4 * by + py)(4 * bx + px) + r(py)(px))
      }
      val qPc = chromaQp(qP)
      reconChroma(u, mr, mc, mb.chromaMode,
        comp(mb.chromaDc, 0), compAc(mb.chromaAc, 0), qPc)
      reconChroma(v, mr, mc, mb.chromaMode,
        comp(mb.chromaDc, 1), compAc(mb.chromaAc, 1), qPc)
    }
    Planes(sps.width, sps.height, y, u, v)
  }
  // ---- deblocking (§8.7) ----------------------------------------------------

  /** §8.7 in-loop deblocking for ALL-INTRA pictures: boundary
    * strength is 4 on macroblock edges and 3 on internal 4×4
    * transform edges (Table 8-18's intra rows); the α/β/tc0
    * threshold columns ride the [[H264.Profile]] seam
    * (Tables 8-16/8-17 are printed value data). Edge order is the
    * spec's — per macroblock in raster order, the four vertical
    * luma edges left to right, then the four horizontal edges top
    * to bottom, chroma edges at the mapped positions (luma edge 2×)
    * — each edge reading a SNAPSHOT of its samples and writing
    * before the next runs (the sequential dependency is normative:
    * a bS-4 strong filter reaches three samples per side, inside
    * the next edge's support). `qpOf(mb)` is the per-MB QP; edge
    * thresholds use (qPp + qPq + 1) >> 1 across MB boundaries,
    * chroma through [[chromaQp]]. Slice filter offsets are zero
    * (the PPS writer codes no deblocking control). */
  def deblock(pl: Planes, qpOf: Int => Int, sps: H264.Sps,
      prof: H264.Profile = H264.Profile.StandIn): Planes = {
    val mbCols = sps.width / 16; val mbRows = sps.height / 16
    val y = pl.y.map(_.clone())
    val u = pl.u.map(_.clone())
    val v = pl.v.map(_.clone())

    /** One edge of `n` lines. `get(line, o)`/`set(line, o, v)`
      * address the sample at signed offset o from the edge along
      * the filtered axis: q_i at o = i, p_i at o = −1 − i. */
    def filterEdge(bS: Int, qpAv: Int, luma: Boolean, n: Int,
        get: (Int, Int) => Int, set: (Int, Int, Int) => Unit): Unit = {
      val ia = math.max(0, math.min(51, qpAv))
      val alpha = prof.deblockAlpha(ia)
      val beta = prof.deblockBeta(ia)
      var line = 0
      while (line < n) {
        val p = Array.tabulate(4)(i => get(line, -1 - i))
        val q = Array.tabulate(4)(i => get(line, i))
        val filterOn = bS != 0 &&
          math.abs(p(0) - q(0)) < alpha &&
          math.abs(p(1) - p(0)) < beta &&
          math.abs(q(1) - q(0)) < beta
        if (filterOn) {
          val ap = math.abs(p(2) - p(0))
          val aq = math.abs(q(2) - q(0))
          if (bS < 4) { // §8.7.2.3
            val tc0 = prof.deblockTc0(bS - 1)(ia)
            val tc =
              if (luma) tc0 + (if (ap < beta) 1 else 0) +
                (if (aq < beta) 1 else 0)
              else tc0 + 1
            val delta = math.max(-tc, math.min(tc,
              (((q(0) - p(0)) << 2) + (p(1) - q(1)) + 4) >> 3))
            set(line, -1, clip1(p(0) + delta))
            set(line, 0, clip1(q(0) - delta))
            if (luma && ap < beta)
              set(line, -2, p(1) + math.max(-tc0, math.min(tc0,
                (p(2) + ((p(0) + q(0) + 1) >> 1) - 2 * p(1)) >> 1)))
            if (luma && aq < beta)
              set(line, 1, q(1) + math.max(-tc0, math.min(tc0,
                (q(2) + ((p(0) + q(0) + 1) >> 1) - 2 * q(1)) >> 1)))
          } else { // bS == 4 [§8.7.2.4]
            val close = math.abs(p(0) - q(0)) < (alpha >> 2) + 2
            if (luma && ap < beta && close) {
              set(line, -1,
                (p(2) + 2 * p(1) + 2 * p(0) + 2 * q(0) + q(1) + 4) >> 3)
              set(line, -2, (p(2) + p(1) + p(0) + q(0) + 2) >> 2)
              set(line, -3,
                (2 * p(3) + 3 * p(2) + p(1) + p(0) + q(0) + 4) >> 3)
            } else set(line, -1, (2 * p(1) + p(0) + q(1) + 2) >> 2)
            if (luma && aq < beta && close) {
              set(line, 0,
                (q(2) + 2 * q(1) + 2 * q(0) + 2 * p(0) + p(1) + 4) >> 3)
              set(line, 1, (q(2) + q(1) + q(0) + p(0) + 2) >> 2)
              set(line, 2,
                (2 * q(3) + 3 * q(2) + q(1) + q(0) + p(0) + 4) >> 3)
            } else set(line, 0, (2 * q(1) + q(0) + p(1) + 2) >> 2)
          }
        }
        line += 1
      }
    }

    def vertical(plane: Array[Array[Int]], gx: Int, gy: Int, n: Int,
        bS: Int, qpAv: Int, luma: Boolean): Unit =
      filterEdge(bS, qpAv, luma, n,
        (line, o) => plane(gy + line)(gx + o),
        (line, o, vv) => plane(gy + line)(gx + o) = vv)
    def horizontal(plane: Array[Array[Int]], gx: Int, gy: Int, n: Int,
        bS: Int, qpAv: Int, luma: Boolean): Unit =
      filterEdge(bS, qpAv, luma, n,
        (line, o) => plane(gy + o)(gx + line),
        (line, o, vv) => plane(gy + o)(gx + line) = vv)

    var mb = 0
    while (mb < mbCols * mbRows) {
      val (mr, mc) = (mb / mbCols, mb % mbCols)
      val qpCur = qpOf(mb)
      val qPcCur = chromaQp(qpCur)
      def avLuma(other: Int): Int = (qpOf(other) + qpCur + 1) >> 1
      def avChroma(other: Int): Int =
        (chromaQp(qpOf(other)) + qPcCur + 1) >> 1
      // vertical edges, left to right (luma 0/4/8/12, chroma 0/4)
      Seq(0, 4, 8, 12).foreach { e =>
        if (e != 0 || mc > 0) {
          val bS = if (e == 0) 4 else 3 // all-intra Table 8-18
          val qpAv = if (e == 0) avLuma(mb - 1) else qpCur
          vertical(y, 16 * mc + e, 16 * mr, 16, bS, qpAv, luma = true)
          if (e % 8 == 0) {
            val cAv = if (e == 0) avChroma(mb - 1) else qPcCur
            vertical(u, 8 * mc + e / 2, 8 * mr, 8, bS, cAv, luma = false)
            vertical(v, 8 * mc + e / 2, 8 * mr, 8, bS, cAv, luma = false)
          }
        }
      }
      // horizontal edges, top to bottom
      Seq(0, 4, 8, 12).foreach { e =>
        if (e != 0 || mr > 0) {
          val bS = if (e == 0) 4 else 3
          val qpAv = if (e == 0) avLuma(mb - mbCols) else qpCur
          horizontal(y, 16 * mc, 16 * mr + e, 16, bS, qpAv, luma = true)
          if (e % 8 == 0) {
            val cAv = if (e == 0) avChroma(mb - mbCols) else qPcCur
            horizontal(u, 8 * mc, 8 * mr + e / 2, 8, bS, cAv,
              luma = false)
            horizontal(v, 8 * mc, 8 * mr + e / 2, 8, bS, cAv,
              luma = false)
          }
        }
      }
      mb += 1
    }
    Planes(pl.width, pl.height, y, u, v)
  }
}
