package graft.streaming

import graft.sources.Mp3
import graft.streaming.StateMachines.{Ev, Machine, Out}

/** MP3 reservoir decode as a STATEFUL STREAMING OPERATOR — the audio
  * twin of [[Vp8Machine]]: Layer III frames arrive one micro-batch at
  * a time, and §2.4.2.7's bit reservoir makes each frame's main data
  * start up to 511 bytes BEFORE its own header inside earlier frames'
  * slot space. The decoder's whole cross-frame state is therefore the
  * trailing ≤ 511 bytes of slot space ([[Mp3.demuxReservoirStep]]) —
  * a state-store entry, bounded by the spec's own 9-bit field, that
  * must survive micro-batch boundaries: a frame arriving three
  * batches later still reads its granules out of bytes that crossed
  * the state store (any loss desyncs part2_3_length loudly).
  *
  * Payloads ride the envelope's `text` hex-encoded; emits carry the
  * frame's code sum (Σ|big values|) in `value` and
  * "main_data_begin,part23bits" in `text`. Purity gives
  * batch/streaming parity for free. */
object Mp3Machine {

  final case class ResState(window: Array[Byte])

  /** Cross-batch state for the PCM twin: the ≤ 511-byte reservoir
    * window PLUS the hybrid filterbank's overlap store and polyphase
    * V register (1600 Longs, [[graft.sources.Mp3Pcm.Hybrid.flat]]) —
    * every byte of it spec-bounded and CONSTANT per key. */
  final case class PcmState(window: Array[Byte], hybrid: Array[Long])

  final class ReservoirDecoder extends Machine[ResState] {
    def init: ResState = ResState(Array.empty)

    def step(s: ResState, e: Ev): (ResState, Seq[Out]) = {
      val payload = java.util.HexFormat.of().parseHex(e.text)
      val (f, mdb, kept) = Mp3.demuxReservoirStep(payload, s.window)
      val code = f.granules.iterator.flatMap(_.bigValues.iterator)
        .map { case (x, y) => math.abs(x).toLong + math.abs(y) }.sum
      (ResState(kept),
        Seq(Out(e.ts, code.toDouble, s"$mdb,${f.bodyBits}")))
    }
  }

  /** The DECODE-TO-PCM twin (p31's streaming mount): reservoir walk
    * + the §2.4.3.4 hybrid filterbank, whose overlap store and
    * polyphase register must survive micro-batch boundaries — a
    * granule's first 18 output slots ring with the PREVIOUS frame's
    * IMDCT tails, so dropping the state desyncs every later PCM sum.
    * Emits part2_3 totals in `value` and "pcmSum,pcm0" EXACTLY in
    * `text` (|Σpcm| exceeds 2^53 — a Double would silently round). */
  final class PcmDecoder extends Machine[PcmState] {
    import graft.sources.Mp3Pcm

    def init: PcmState =
      PcmState(Array.empty, new Mp3Pcm.Hybrid().flat)

    def step(s: PcmState, e: Ev): (PcmState, Seq[Out]) = {
      val payload = java.util.HexFormat.of().parseHex(e.text)
      val (f, _, kept) = Mp3.demuxReservoirStep(payload, s.window)
      val hybrid = new Mp3Pcm.Hybrid()
      hybrid.load(s.hybrid)
      var pcmSum = 0L
      var pcm0 = 0L
      (0 until 2).foreach { gr =>
        val pcm = hybrid.granule(f.granules(gr))
        pcmSum += pcm.sum
        if (gr == 0) pcm0 = pcm(0)
      }
      val p23 = f.part23Length(0) + f.part23Length(1)
      (PcmState(kept, hybrid.flat),
        Seq(Out(e.ts, p23.toDouble, s"$pcmSum,$pcm0")))
    }
  }
}
