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
}
