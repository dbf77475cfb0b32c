package graft.sources

/** H.264 CABAC — the §9.3 ARITHMETIC CODING ENGINE (ITU-T H.264
  * (2003)), both directions, behind the established seam class: the
  * engine's STRUCTURE is normative spec text — initialization
  * (codIRange = 510, 9-bit offset read, §9.3.1.2), DecodeDecision's
  * range split + state transition + renormalization (§9.3.3.2.1),
  * DecodeBypass (§9.3.3.2.3), DecodeTerminate's range−2 test
  * (§9.3.3.2.4), the §9.3.4 encoder mirror (PutBit with outstanding
  * bits, EncodeFlush's two-bit tail whose final 1 doubles as the
  * rbsp stop bit), and the §9.3.1.1 context-variable derivation
  * preCtxState = Clip3(1, 126, ((m·Clip3(0,51,QP)) >> 4) + n) with
  * the 63/64 state/MPS split and the MPS flip at state 0 — while the
  * VALUE tables are appendix-class DATA carried by
  * [[H264.Profile]]: rangeTabLPS (Table 9-35, 64×4), transIdxLPS
  * (Table 9-36's LPS column; the MPS column collapses to
  * min(s+1, 62)), and the per-context (m, n) initialization pairs
  * (Tables 9-12…9-33). Stand-ins are deterministic and satisfy the
  * engine's invariants (2 ≤ rLPS ≤ 240, transLPS < 63), so
  * encode → decode round-trips EXACTLY through real arithmetic-coded
  * bytes; injecting the published tables is the same value swap as
  * every other profile field. */
object Cabac {

  /** Stand-in Table 9-35: LPS range by (state, range quartile) —
    * decreasing in state, increasing in quartile, within [2, 240]
    * (any such table yields a correct arithmetic coder as long as
    * both sides share it). */
  val RangeLpsStandIn: Array[Array[Int]] = Array.tabulate(64, 4) {
    (s, q) => math.min(240, math.max(2, ((64 - s) * (q + 2) * 6) / 10))
  }

  /** Stand-in Table 9-36 LPS column (the MPS column is the
    * min(s+1, 62) formula, [[transMps]]). */
  val TransLpsStandIn: Array[Int] = Array.tabulate(64)(s => (s * 3) / 4)

  def transMps(s: Int): Int = math.min(s + 1, 62)

  /** Stand-in (m, n) context-initialization pair for ctxIdx
    * (Tables 9-12…9-33 are per-context data). */
  def ctxInitStandIn(ctx: Int): (Int, Int) =
    (((ctx * 5) % 29) - 14, 50 + (ctx * 7) % 40)

  /** §9.3.1.1 context-variable initialization. */
  def initCtx(ctx: Int, qP: Int, prof: H264.Profile): (Int, Boolean) = {
    val (m, n) = prof.cabacCtxInit match {
      case Some(t) => (t(ctx)(0), t(ctx)(1))
      case None => ctxInitStandIn(ctx)
    }
    val pre = math.max(1, math.min(126,
      ((m * math.max(0, math.min(51, qP))) >> 4) + n))
    if (pre <= 63) (63 - pre, false) else (pre - 64, true)
  }

  /** Context-state store, lazily initialized per ctxIdx at the
    * slice's QP (both sides construct it identically). */
  final class Ctxs(qP: Int, prof: H264.Profile) {
    private val m = scala.collection.mutable.Map.empty[Int, (Int, Boolean)]
    def get(ctx: Int): (Int, Boolean) =
      m.getOrElseUpdate(ctx, initCtx(ctx, qP, prof))
    def put(ctx: Int, v: (Int, Boolean)): Unit = m(ctx) = v
  }

  /** §9.3.3.2 decoder over a [[H264.BitR]] (the slice's RBSP). */
  final class Dec(r: H264.BitR, prof: H264.Profile, ctxs: Ctxs) {
    private var range = 510
    private var offset = r.u(9).toInt
    require(offset < 510, "cabac: initial offset must be < 510")

    private def renorm(): Unit =
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | r.u(1).toInt
      }

    /** DecodeDecision (§9.3.3.2.1). */
    def decision(ctx: Int): Int = {
      val (state, mps) = ctxs.get(ctx)
      val q = (range >> 6) & 3
      val rLps = prof.cabacRangeLps(state)(q)
      range -= rLps
      val bin =
        if (offset >= range) { // LPS
          offset -= range
          range = rLps
          val nMps = if (state == 0) !mps else mps
          ctxs.put(ctx, (prof.cabacTransLps(state), nMps))
          if (mps) 0 else 1
        } else { // MPS
          ctxs.put(ctx, (transMps(state), mps))
          if (mps) 1 else 0
        }
      renorm()
      bin
    }

    /** DecodeBypass (§9.3.3.2.3). */
    def bypass(): Int = {
      offset = (offset << 1) | r.u(1).toInt
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** DecodeTerminate (§9.3.3.2.4): 1 ends the arithmetic stream
      * (no renorm); 0 renormalizes and continues. */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else { renorm(); 0 }
    }
  }

  /** §9.3.4 encoder mirror, emitting into a [[H264.BitW]]. */
  final class Enc(w: H264.BitW, prof: H264.Profile, ctxs: Ctxs) {
    private var low = 0
    private var range = 510
    private var firstBit = true
    private var outstanding = 0

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false
      else w.u(b.toLong, 1)
      while (outstanding > 0) { w.u((1 - b).toLong, 1); outstanding -= 1 }
    }

    private def renorm(): Unit =
      while (range < 256) {
        if (low >= 512) { putBit(1); low -= 512 }
        else if (low < 256) putBit(0)
        else { outstanding += 1; low -= 256 }
        range <<= 1
        low <<= 1
      }

    def decision(ctx: Int, bin: Int): Unit = {
      val (state, mps) = ctxs.get(ctx)
      val q = (range >> 6) & 3
      val rLps = prof.cabacRangeLps(state)(q)
      range -= rLps
      if ((bin == 1) != mps) { // LPS
        low += range
        range = rLps
        val nMps = if (state == 0) !mps else mps
        ctxs.put(ctx, (prof.cabacTransLps(state), nMps))
      } else ctxs.put(ctx, (transMps(state), mps))
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    /** EncodeTerminate (§9.3.4.1.2); bin = 1 flushes — the final
      * written 1 doubles as the rbsp stop bit. */
    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) {
        low += range
        range = 2
        // EncodeFlush
        renorm()
        putBit((low >> 9) & 1)
        w.u((((low >> 7) & 3) | 1).toLong, 2)
      } else renorm()
    }
  }
}
